"""Training loops: Trainer + GridTrainer (coarse-to-fine).

Re-design of `grid_opt/trainer.py`.  The whole optimization step --
loss, gradients, NaN guard, masked Adam update -- is ONE jitted
function; training phases (per-level coordinate descent, joint
finetune, pose/feature locking) only change the runtime mask pytree, so
the step never recompiles (the reference instead builds one torch
optimizer per level, trainer.py:429-437).

Epoch semantics follow the reference: one epoch = one freshly sampled
mega-batch from the dataset (SURVEY.md section 2.7).
"""
from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from miso_tpu.losses.common import total_loss
from miso_tpu.models.base import relative_param_change, masked_select_tree, tree_full_mask
from miso_tpu.train.optim import (
    MaskedAdamState,
    masked_adam_init,
    masked_adam_update,
    masked_sgd_init,
    masked_sgd_update,
)


_STEP_CACHE: Dict = {}


def make_train_step(loss_fn: Callable, optimizer: str = "adam"):
    """Build (and cache) the jitted train step.

    loss_fn(model, batch, key) -> dict of scalar losses.
    Returned step(model, opt_state, batch, key, mask, lr) ->
    (model, opt_state, total, loss_dict).

    Steps are cached by (loss_fn, optimizer): SLAM constructs a fresh
    Trainer per tracking/mapping burst (reference tracker.py:99,
    mapper.py:83 do the same), and without the cache every burst would
    build a new jit wrapper and recompile.
    """
    cache_key = (loss_fn, optimizer)
    if cache_key in _STEP_CACHE:
        return _STEP_CACHE[cache_key]

    def step(model, opt_state, batch, key, mask, lr):
        def objective(m):
            d = loss_fn(m, batch, key)
            return total_loss(d), d

        (tl, loss_dict), grads = jax.value_and_grad(
            objective, has_aux=True, allow_int=True)(model)
        # NaN guard (reference trainer.py:215-219): suppress the update.
        bad = jnp.logical_not(jnp.isfinite(tl))
        guard = jnp.where(bad, 0.0, 1.0)
        grads = jax.tree_util.tree_map(
            lambda g: g if g.dtype == jax.dtypes.float0 else jnp.nan_to_num(g), grads)
        eff_mask = jax.tree_util.tree_map(lambda m_: m_ * guard, mask)
        if optimizer == "adam":
            new_model, new_opt = masked_adam_update(grads, opt_state, model, eff_mask, lr=lr)
        elif optimizer == "sgd":
            new_model, new_opt = masked_sgd_update(grads, opt_state, model, eff_mask, lr=lr)
        else:
            raise ValueError(f"Invalid optimizer: {optimizer}")
        return new_model, new_opt, tl, loss_dict

    # Donate only the optimizer state: model buffers may be shared with
    # other views (e.g. a GridNet extracted from a GridAtlas shares the
    # decoder / ignore_level buffers; donating them would invalidate the
    # atlas).  Optimizer state is never shared.
    jitted = jax.jit(step, donate_argnums=(1,))
    _STEP_CACHE[cache_key] = jitted
    return jitted


_SCAN_CACHE: Dict = {}


def make_train_scan(loss_fn: Callable, optimizer: str = "adam",
                    remat: bool = False):
    """Multi-step train burst: k optimization steps in ONE jitted scan.

    scan_fn(model, opt_state, batches, key, mask, lr) ->
    (model, opt_state, total_losses (k,)); ``batches`` holds (k, ...)
    stacked batch arrays.  Identical per-step math to make_train_step
    (NaN guard, masked update); the per-step RNG key is split inside the
    scan carry.  One device dispatch per burst -- on dispatch-expensive
    transports this is the difference between ~k x RTT and 1 x RTT per
    mapping/tracking burst (SURVEY.md section 7 hard-part 5).

    ``remat``: jax.checkpoint the loss so the backward recomputes the
    forward instead of storing per-iteration activations.  The TPU
    backend otherwise materializes scan-length x activation buffers for
    wide losses -- the atlas fusion loss (per-submap features, S x N x F
    per level per iteration) demanded 40 GB HBM at 30 x 2.6M points
    (16 GB v5e).  Costs ~1 extra forward per step; leave off for narrow
    per-submap losses (mapping/tracking).
    """
    cache_key = (loss_fn, optimizer, remat)
    if cache_key in _SCAN_CACHE:
        return _SCAN_CACHE[cache_key]

    def scan_fn(model, opt_state, batches, key, mask, lr):
        def body(carry, batch):
            model, opt_state, key = carry
            key, sub = jax.random.split(key)

            def objective(m):
                d = loss_fn(m, batch, sub)
                return total_loss(d), d

            if remat:
                objective = jax.checkpoint(objective)

            (tl, _), grads = jax.value_and_grad(
                objective, has_aux=True, allow_int=True)(model)
            bad = jnp.logical_not(jnp.isfinite(tl))
            guard = jnp.where(bad, 0.0, 1.0)
            grads = jax.tree_util.tree_map(
                lambda g: g if g.dtype == jax.dtypes.float0
                else jnp.nan_to_num(g), grads)
            eff = jax.tree_util.tree_map(lambda m_: m_ * guard, mask)
            if optimizer == "adam":
                new_m, new_o = masked_adam_update(grads, opt_state, model,
                                                  eff, lr=lr)
            elif optimizer == "sgd":
                new_m, new_o = masked_sgd_update(grads, opt_state, model,
                                                 eff, lr=lr)
            else:
                raise ValueError(f"Invalid optimizer: {optimizer}")
            return (new_m, new_o, key), tl

        (model, opt_state, _), tls = jax.lax.scan(
            body, (model, opt_state, key), batches)
        return model, opt_state, tls

    jitted = jax.jit(scan_fn, donate_argnums=(1,))
    _SCAN_CACHE[cache_key] = jitted
    return jitted


_POOL_SCAN_CACHE: Dict = {}


def _guarded_masked_update(loss_fn, optimizer, model, opt_state, batch,
                           key, mask, lr):
    """Shared step core: value+grad, NaN guard, masked optimizer update."""
    def objective(m):
        d = loss_fn(m, batch, key)
        return total_loss(d), d

    (tl, _), grads = jax.value_and_grad(
        objective, has_aux=True, allow_int=True)(model)
    bad = jnp.logical_not(jnp.isfinite(tl))
    guard = jnp.where(bad, 0.0, 1.0)
    grads = jax.tree_util.tree_map(
        lambda g: g if g.dtype == jax.dtypes.float0
        else jnp.nan_to_num(g), grads)
    eff = jax.tree_util.tree_map(lambda m_: m_ * guard, mask)
    if optimizer == "adam":
        return masked_adam_update(grads, opt_state, model, eff, lr=lr) + (tl,)
    if optimizer == "sgd":
        return masked_sgd_update(grads, opt_state, model, eff, lr=lr) + (tl,)
    raise ValueError(f"Invalid optimizer: {optimizer}")


def make_train_scan_pool(loss_fn: Callable, optimizer: str = "adam"):
    """Scanned train burst that SAMPLES ITS BATCHES ON DEVICE from the
    full-sequence resident pool.

    scan_pool_fn(model, opt_state, pool, sel, n_rows, key, mask, lr,
    steps, B) -> (model, opt_state, total_losses (steps,)).

    ``pool``: dict of (num_kfs, n_max, ...) device-resident sample
    pools (coords_frame, sdf, sdf_valid, sdf_signs), zero-padded per
    row (datasets.sequence.device_pool); ``sel``: (K,) int32 pool-row
    ids (global keyframe ids) of the burst's keyframe selection;
    ``n_rows``: (num_kfs,) int32 valid rows per kf (padding rows are
    never drawn); ``steps``/rows per kf ``B`` are static.  Each scan
    iteration draws (K, B) row indices with jax.random and row-gathers
    its batch from the flat pool inside the dispatch.

    Why: the host path re-samples + re-stacks + re-uploads every burst
    (measured ~150 ms/frame of the SLAM loop at quad scale).  With one
    full-size pool, per-frame host work is one row write when a
    keyframe first appears, and the executable's shapes are fixed for
    the whole run (pool size = num_kfs regardless of selection).
    Statistically identical sampling (uniform rows with replacement,
    like SubmapDataset.sample); the random stream differs (jax PRNG),
    so training is deterministic given the key but not bit-equal to
    the host path.
    """
    cache_key = (loss_fn, optimizer)
    if cache_key in _POOL_SCAN_CACHE:
        return _POOL_SCAN_CACHE[cache_key]

    def scan_pool_fn(model, opt_state, pool, sel, n_rows, key, mask, lr,
                     steps: int, B: int):
        K = sel.shape[0]
        sel = sel.astype(jnp.int32)
        n_max = next(iter(pool.values())).shape[1]
        flat = {name: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
                for name, a in pool.items()}
        ids = jnp.repeat(sel, B)
        weights = jnp.ones((K * B, 1), jnp.float32)
        nr_sel = n_rows[sel]                                        # (K,)

        def body(carry, _):
            model, opt_state, key = carry
            key, k_idx, sub = jax.random.split(key, 3)
            u = jax.random.uniform(k_idx, (K, B))
            idx = jnp.floor(u * nr_sel[:, None].astype(u.dtype)
                            ).astype(jnp.int32)
            rows = (sel[:, None] * n_max + idx).reshape(-1)         # (K*B,)
            batch = {name: jnp.take(a, rows, axis=0)
                     for name, a in flat.items()}
            batch["sample_frame_ids"] = ids
            batch["weights"] = weights
            new_m, new_o, tl = _guarded_masked_update(
                loss_fn, optimizer, model, opt_state, batch, sub, mask, lr)
            return (new_m, new_o, key), tl

        (model, opt_state, _), tls = jax.lax.scan(
            body, (model, opt_state, key), None, length=steps)
        return model, opt_state, tls

    jitted = jax.jit(scan_pool_fn, donate_argnums=(1,),
                     static_argnums=(8, 9))
    _POOL_SCAN_CACHE[cache_key] = jitted
    return jitted


_POOL_BURST_CACHE: Dict = {}


def make_train_burst_pool(loss_fn: Callable, optimizer: str = "adam"):
    """Whole multi-phase training burst in ONE dispatch: per-step masks
    ride the scan as xs, the optimizer state is initialized inside the
    jit, and batches are sampled on device from the resident pool.

    burst_fn(model, pool, sel, n_rows, key, masks, lr, B) ->
    (model, total_losses (steps,)).  ``masks`` is a mask pytree STACKED
    along a new leading (steps,) axis -- one mask per optimization step
    -- so a coarse-to-fine level schedule (level0 x5, level1 x5, joint
    x5: the reference's per-frame replay burst, system.py:190-196 +
    trainer.py:469-470) runs as a single executable instead of one
    dispatch per level segment plus single-step stragglers.  Step count
    is carried by the masks' leading dim, so one executable serves any
    schedule of the same length.

    Per-step math, sampling, and key chain are IDENTICAL to
    make_train_scan_pool's body: with a constant mask schedule the two
    are bit-equal given the same key (tests/test_train_scan.py).  The
    masked-Adam state starts at zeros inside the graph (the SLAM mapper
    re-inits the optimizer every burst, as the reference does by
    constructing a fresh torch optimizer per burst, mapper.py:83), which
    also removes the ~2x tree-size alloc dispatches per burst.
    """
    cache_key = (loss_fn, optimizer)
    if cache_key in _POOL_BURST_CACHE:
        return _POOL_BURST_CACHE[cache_key]

    def burst_fn(model, pool, sel, n_rows, key, masks, lr, B: int):
        K = sel.shape[0]
        sel = sel.astype(jnp.int32)
        n_max = next(iter(pool.values())).shape[1]
        flat = {name: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
                for name, a in pool.items()}
        ids = jnp.repeat(sel, B)
        weights = jnp.ones((K * B, 1), jnp.float32)
        nr_sel = n_rows[sel]                                        # (K,)
        opt_state = (masked_adam_init(model) if optimizer == "adam"
                     else masked_sgd_init(model))

        def body(carry, mask_t):
            model, opt_state, key = carry
            key, k_idx, sub = jax.random.split(key, 3)
            u = jax.random.uniform(k_idx, (K, B))
            idx = jnp.floor(u * nr_sel[:, None].astype(u.dtype)
                            ).astype(jnp.int32)
            rows = (sel[:, None] * n_max + idx).reshape(-1)         # (K*B,)
            batch = {name: jnp.take(a, rows, axis=0)
                     for name, a in flat.items()}
            batch["sample_frame_ids"] = ids
            batch["weights"] = weights
            new_m, new_o, tl = _guarded_masked_update(
                loss_fn, optimizer, model, opt_state, batch, sub, mask_t, lr)
            return (new_m, new_o, key), tl

        (model, _, _), tls = jax.lax.scan(
            body, (model, opt_state, key), masks)
        return model, tls

    jitted = jax.jit(burst_fn, static_argnums=(7,))
    _POOL_BURST_CACHE[cache_key] = jitted
    return jitted


def level_schedule(iterations: int, max_epochs_in_level: int,
                   num_levels: int, mode: str = "coordinate+joint"):
    """Per-epoch mask level ids exactly as GridTrainer.pre_epoch emits
    them with relchange_tol == 0 (deterministic max-epochs switching):
    level l trains for ``max_epochs_in_level`` epochs, then the next,
    then the finest ('coordinate') or the joint phase
    ('coordinate+joint' / reference trainer.py:469-470).  Returns a list
    of ints in [0, num_levels] where num_levels means the joint mask.
    """
    if mode == "joint":
        return [num_levels] * iterations
    out, active, in_level = [], 0, 0
    for _ in range(iterations):
        if in_level >= max_epochs_in_level and active < num_levels:
            active += 1
            in_level = 0
        in_level += 1
        if active >= num_levels:
            out.append(num_levels - 1 if mode == "coordinate"
                       else num_levels)
        else:
            out.append(active)
    return out


_POOL_STEP_CACHE: Dict = {}


def make_train_step_pool(loss_fn: Callable, optimizer: str = "adam"):
    """One jitted train step that samples its batch from the resident
    pool: N rows drawn uniformly over (kf < k_live, row < n_rows[kf]).

    step_pool_fn(params, opt_state, pool, n_rows, k_live, key, mask,
    lr, N) -> (params, opt_state, total_loss).  ``k_live`` is a traced
    int32 scalar (pool rows 0..k_live-1 are eligible), so one
    executable serves any keyframe count -- the Fuser can be prewarmed
    at init (CLAUDE.md rule 7) and reused as the run grows.  ``params``
    and ``opt_state`` are donated (the stacked atlas storage would
    otherwise be copied every step).
    """
    cache_key = (loss_fn, optimizer)
    if cache_key in _POOL_STEP_CACHE:
        return _POOL_STEP_CACHE[cache_key]

    def step_pool_fn(params, opt_state, pool, n_rows, k_live, key, mask,
                     lr, N: int):
        k_kf, k_row, sub = jax.random.split(key, 3)
        n_max = next(iter(pool.values())).shape[1]
        u = jax.random.uniform(k_kf, (N,))
        kf = jnp.floor(u * k_live.astype(u.dtype)).astype(jnp.int32)
        nr = n_rows[kf].astype(jnp.float32)                          # (N,)
        r = jnp.floor(jax.random.uniform(k_row, (N,)) * nr).astype(jnp.int32)
        rows = kf * n_max + r
        batch = {name: jnp.take(
            a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]), rows,
            axis=0) for name, a in pool.items()}
        batch["sample_frame_ids"] = kf
        batch["weights"] = jnp.ones((N, 1), jnp.float32)
        new_p, new_o, tl = _guarded_masked_update(
            loss_fn, optimizer, params, opt_state, batch, sub, mask, lr)
        return new_p, new_o, tl

    jitted = jax.jit(step_pool_fn, donate_argnums=(0, 1),
                     static_argnums=(8,))
    _POOL_STEP_CACHE[cache_key] = jitted
    return jitted


class Trainer:
    """Generic loop (reference trainer.py:15-362).

    Args:
      cfg: reference-style train cfg dict (epochs, learning_rate,
        optimizer, eval_every, ckpt_every, verbose, log_dir, ...).
      model: pytree model.
      loss_fn: (model, batch, key) -> dict.
      dataset: object with ``sample(rng) -> dict of numpy arrays``
        (one mega-batch per epoch).
      mask: trainability mask pytree; defaults to all-trainable.
    """

    def __init__(self, cfg: Dict, model, loss_fn, dataset, val_dataset=None,
                 mask=None, seed: int = 0):
        self.cfg = cfg
        self.model = model
        self.loss_fn = loss_fn
        self.dataset = dataset
        self.val_dataset = val_dataset
        self.verbose = cfg.get("verbose", False)
        self.lr = float(cfg.get("learning_rate", 1e-3))
        self.optimizer_name = cfg.get("optimizer", "adam")
        self.mask = mask if mask is not None else tree_full_mask(model)
        if self.optimizer_name == "adam":
            self.opt_state = masked_adam_init(model)
        else:
            self.opt_state = masked_sgd_init(model)
        self.step_fn = make_train_step(loss_fn, self.optimizer_name)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.eval_every = cfg.get("eval_every", -1)
        self.ckpt_every = cfg.get("ckpt_every", -1)
        self.log_dir = cfg.get("log_dir", None)
        # Optional TensorBoard scalars (reference trainer.py:130,296 uses
        # SummaryWriter); enabled when a log_dir is set and tensorboardX
        # is importable.
        self.writer = None
        if self.log_dir and cfg.get("tensorboard", True):
            try:
                from tensorboardX import SummaryWriter

                import os as _os
                self.writer = SummaryWriter(_os.path.join(self.log_dir,
                                                          "tensorboard"))
            except Exception:
                self.writer = None
        self.train_dict: Dict[str, List] = {"epochs": [], "elapsed_time": [],
                                            "epoch_time": [], "total_loss": []}
        self.val_dict: Dict[str, List] = {"epochs": [], "total_loss": []}
        self.custom_eval_funcs: Dict[str, Callable] = {}
        self.custom_eval_dict: Dict[str, List] = {"epochs": []}
        self._params_prev = None
        self.relchange = np.inf
        self.total_epoch_time = 0.0
        self.sample_time = 0.0   # host-side dataset.sample + stacking
        self.start_epoch = 0
        self._train_start = time.process_time()

    # -- hooks (overridable, reference trainer.py:141-168) -----------------
    def pre_epoch(self, epoch: int):
        if self.eval_every > 0 and epoch % self.eval_every == 0:
            self.run_eval(epoch)

    def post_epoch(self, epoch: int):
        if self.ckpt_every > 0 and epoch % self.ckpt_every == 0:
            self.save_model(epoch, f"ckpt_{epoch}")

    def current_mask(self):
        return self.mask

    # -- main loop ---------------------------------------------------------
    def train(self):
        epochs = int(self.cfg.get("epochs", 1))
        scan_cap = int(self.cfg.get("scan_steps", 1))
        epoch = self.start_epoch
        while epoch < epochs:
            self.pre_epoch(epoch)
            k = 1
            if scan_cap > 1 and self.eval_every <= 0 and self.ckpt_every <= 0:
                k = max(1, min(scan_cap, epochs - epoch,
                               self._scan_chunk_budget()))
                # Round down to a power of two: bounds the set of scan
                # executables (each distinct k compiles its own).
                while k & (k - 1):
                    k &= k - 1
            if k > 1:
                self._train_scan_chunk(epoch, k)
                self._note_scanned(k)
            else:
                self.train_epoch(epoch)
            self.post_epoch(epoch)
            epoch += k
        if self.eval_every > 0:
            self.run_eval(epochs)
        if self.ckpt_every > 0:
            self.save_model(epochs, "final")
        return self.model

    # Scanned multi-epoch bursts (cfg scan_steps > 1): how many epochs
    # may run in one dispatch after the pre_epoch that just executed,
    # without skipping per-epoch host logic.  Subclasses with per-epoch
    # decisions (GridTrainer level switching) override these.
    def _scan_chunk_budget(self) -> int:
        return 1 << 30

    def _note_scanned(self, k: int):
        pass

    def _train_scan_chunk(self, epoch: int, k: int):
        t0 = time.perf_counter()
        if self.cfg.get("device_sampling") and hasattr(self.dataset,
                                                       "device_pool"):
            # Device-resident pools: the burst samples its own batches
            # inside the dispatch (see make_train_scan_pool).  Host cost
            # is one pool upload per new keyframe, not per burst.
            pool, kfs, n_rows, B = self.dataset.device_pool()
            self.sample_time += time.perf_counter() - t0
            scan_fn = make_train_scan_pool(self.loss_fn, self.optimizer_name)
            self.key, sub = jax.random.split(self.key)
            self.model, self.opt_state, tls = scan_fn(
                self.model, self.opt_state, pool, kfs, n_rows, sub,
                self.current_mask(), jnp.asarray(self.lr, jnp.float32),
                k, int(B))
        else:
            batches = [self.dataset.sample(self.rng) for _ in range(k)]
            stacked = {name: jnp.asarray(np.stack([np.asarray(b[name])
                                                   for b in batches]))
                       for name in batches[0]}
            self.sample_time += time.perf_counter() - t0
            scan_fn = make_train_scan(self.loss_fn, self.optimizer_name)
            self.key, sub = jax.random.split(self.key)
            self.model, self.opt_state, tls = scan_fn(
                self.model, self.opt_state, stacked, sub, self.current_mask(),
                jnp.asarray(self.lr, jnp.float32))
        # Accumulate BEFORE the debug sync so timing semantics don't
        # change under the flag (debug still prints synchronous time).
        self.total_epoch_time += time.perf_counter() - t0
        if os.environ.get("MISO_DEBUG_BURST"):
            jax.block_until_ready(jax.tree_util.tree_leaves(self.model)[0])
            print(f"[burst] chunk k={k} epoch={epoch} "
                  f"{1e3 * (time.perf_counter() - t0):.0f}ms synced "
                  f"(sample {1e3 * self.sample_time:.0f}ms cum)", flush=True)
        if self.verbose:
            print(f"Train epochs {epoch}..{epoch + k - 1} (scanned) | "
                  f"train_loss={float(tls[-1]):.2e}")

    def _next_batch(self):
        t0 = time.perf_counter()
        batch = self.dataset.sample(self.rng)
        out = {k: jnp.asarray(v) for k, v in batch.items()}
        self.sample_time += time.perf_counter() - t0
        return out

    def train_epoch(self, epoch: int):
        t0 = time.perf_counter()
        batch = self._next_batch()
        self.key, sub = jax.random.split(self.key)
        self.model, self.opt_state, tl, loss_dict = self.step_fn(
            self.model, self.opt_state, batch, sub, self.current_mask(),
            jnp.asarray(self.lr, jnp.float32))
        self.total_epoch_time += time.perf_counter() - t0
        if os.environ.get("MISO_DEBUG_BURST"):
            jax.block_until_ready(jax.tree_util.tree_leaves(self.model)[0])
            print(f"[burst] single epoch={epoch} "
                  f"{1e3 * (time.perf_counter() - t0):.0f}ms synced",
                  flush=True)
        if self.verbose and epoch % 10 == 0:
            print(f"Train epoch {epoch} | train_loss={float(tl):.2e}")
        self._last_loss_dict = loss_dict

    # -- eval --------------------------------------------------------------
    def register_eval_func(self, name: str, func: Callable):
        self.custom_eval_funcs[name] = func
        self.custom_eval_dict[name] = []

    def run_eval(self, epoch: int):
        self.eval(epoch, "train")
        self.eval(epoch, "val")
        self.custom_eval_dict["epochs"].append(epoch)
        for name, func in self.custom_eval_funcs.items():
            self.custom_eval_dict[name].append(
                func(epoch, self.cfg, self.model, self.loss_fn,
                     self.dataset, self.val_dataset))

    def eval(self, epoch: int, mode: str = "train"):
        dataset = self.dataset if mode == "train" else self.val_dataset
        target = self.train_dict if mode == "train" else self.val_dict
        if dataset is None:
            return
        batch = {k: jnp.asarray(v) for k, v in dataset.sample(self.rng).items()}
        self.key, sub = jax.random.split(self.key)
        loss_dict = self.loss_fn(self.model, batch, sub)
        target["epochs"].append(epoch)
        tl = 0.0
        for name, val in loss_dict.items():
            v = float(jnp.mean(val))
            target.setdefault(name, []).append(v)
            tl += v
            if self.writer is not None:
                self.writer.add_scalar(f"{mode}/{name}", v, epoch)
        target["total_loss"].append(tl)
        if mode == "train":
            target["elapsed_time"].append(time.process_time() - self._train_start)
            target["epoch_time"].append(self.total_epoch_time)
        if self.verbose:
            print(f"Epoch {epoch} {mode} total loss: {tl:.2e}")

    def update_relchange(self, mask=None):
        """Relative change of (masked) params (reference trainer.py:231-242).

        Snapshots to host arrays: device buffers are donated by the
        next train step.
        """
        params = masked_select_tree(self.model, mask if mask is not None else self.mask)
        params = jax.tree_util.tree_map(np.asarray, params)
        if self._params_prev is None:
            self._params_prev = params
            self.relchange = np.inf
            return self.relchange
        self.relchange = float(relative_param_change(params, self._params_prev))
        self._params_prev = params
        return self.relchange

    def save_model(self, epoch: int, name: str):
        if self.log_dir is None:
            return
        import os

        path = os.path.join(self.log_dir, "ckpt", f"{name}.npz")
        self.save_checkpoint(path, epoch)

    # -- exact resume ------------------------------------------------------
    # The reference checkpoints optimizer state alongside the model and
    # resumes from it (trainer.py:92-95,319-332).  Here the FULL train
    # state is persisted -- model, optimizer moments, JAX key, numpy
    # sampler state, epoch, level/convergence state -- so an interrupted
    # run resumed from a per-epoch checkpoint is BIT-IDENTICAL to an
    # uninterrupted one (the deterministic per-epoch key/batch chains
    # make this exact; tests/test_resume.py).
    def _aux_state(self) -> Dict:
        return {}

    def _restore_aux_state(self, st: Dict):
        pass

    def save_checkpoint(self, path: str, epoch: int = 0):
        from miso_tpu.train.checkpoint import save_pytree

        tree = {"model": self.model, "opt_state": self.opt_state,
                "key": self.key}
        if self._params_prev is not None:
            tree["params_prev"] = self._params_prev
        meta = {"epoch": int(epoch),
                "rng_state": self.rng.bit_generator.state,
                "relchange": float(self.relchange),
                "has_params_prev": self._params_prev is not None,
                "total_epoch_time": float(self.total_epoch_time),
                "optimizer": self.optimizer_name,
                "aux": self._aux_state()}
        save_pytree(path, tree, meta=meta)

    def load_checkpoint(self, path: str) -> int:
        """Restore full train state; returns the epoch to resume from
        (also set as ``self.start_epoch`` consumed by train())."""
        from miso_tpu.train.checkpoint import load_meta, load_pytree

        meta = load_meta(path) or {}
        like = {"model": self.model, "opt_state": self.opt_state,
                "key": self.key}
        if meta.get("has_params_prev"):
            like["params_prev"] = jax.tree_util.tree_map(np.asarray,
                                                         self.model)
        tree = load_pytree(path, like)
        self.model = tree["model"]
        self.opt_state = tree["opt_state"]
        self.key = tree["key"]
        if "params_prev" in tree:
            self._params_prev = jax.tree_util.tree_map(np.asarray,
                                                       tree["params_prev"])
        if "rng_state" in meta:
            self.rng.bit_generator.state = meta["rng_state"]
        self.relchange = float(meta.get("relchange", np.inf))
        self.total_epoch_time = float(meta.get("total_epoch_time", 0.0))
        self._restore_aux_state(meta.get("aux") or {})
        self.start_epoch = int(meta.get("epoch", 0))
        return self.start_epoch


class GridTrainer(Trainer):
    """Coarse-to-fine trainer (reference trainer.py:370-491).

    Modes: 'coordinate' (level-by-level, stay at finest),
    'coordinate+joint' (then unlock everything), 'joint'.
    Level switching: relchange < tol or max_epochs_in_level reached.
    Only the mask changes between phases -- zero recompiles.
    """

    def __init__(self, cfg, model, loss_fn, dataset, val_dataset=None,
                 mask_for_level: Optional[Callable] = None, seed: int = 0):
        super().__init__(cfg, model, loss_fn, dataset, val_dataset, seed=seed)
        from miso_tpu.models.grid_net import grid_net_mask

        self.mask_for_level = mask_for_level or (
            lambda m, level: grid_net_mask(m, level=level))
        self.relchange_tol = float(cfg.get("relchange_tol", 0.0))
        self.max_epochs_in_level = int(cfg.get("max_epochs_in_level", 100))
        self.mode = cfg.get("grid_training_mode", "coordinate+joint")
        self.num_levels = model.num_levels
        self.active_level = self.num_levels if self.mode == "joint" else 0
        self.epochs_in_level = 0
        self.mask = self.mask_for_level(self.model, self.active_level)

    def reset_convergence_check(self):
        self._params_prev = None
        self.relchange = np.inf
        self.epochs_in_level = 0

    def _aux_state(self) -> Dict:
        return {"active_level": int(self.active_level),
                "epochs_in_level": int(self.epochs_in_level)}

    def _restore_aux_state(self, st: Dict):
        if not st:
            return
        self.active_level = int(st["active_level"])
        self.epochs_in_level = int(st["epochs_in_level"])
        if self.active_level >= self.num_levels:
            lvl = (self.num_levels - 1 if self.mode == "coordinate"
                   else self.num_levels)
        else:
            lvl = self.active_level
        self.mask = self.mask_for_level(self.model, lvl)

    def _scan_chunk_budget(self) -> int:
        # Convergence-based switching needs a relchange check per epoch;
        # pure max_epochs_in_level scheduling is deterministic, so the
        # rest of the current level segment can run in one dispatch
        # (pre_epoch already accounted 1 epoch).
        if self.relchange_tol > 0:
            return 1
        if self.active_level >= self.num_levels:
            # Final joint/finetune phase: no more switches, unbounded.
            return 1 << 30
        return self.max_epochs_in_level - self.epochs_in_level + 1

    def _note_scanned(self, k: int):
        self.epochs_in_level += k - 1

    def pre_epoch(self, epoch: int):
        super().pre_epoch(epoch)
        if self.relchange_tol > 0:
            self.update_relchange()
        if (self.relchange < self.relchange_tol
                or self.epochs_in_level >= self.max_epochs_in_level):
            if self.active_level < self.num_levels:
                self.train_dict[f"level{self.active_level}_last_epoch"] = epoch
                self.active_level += 1
                if self.active_level >= self.num_levels:
                    if self.mode == "coordinate":
                        # Keep training the finest level (trainer.py:469-470).
                        self.mask = self.mask_for_level(self.model, self.num_levels - 1)
                    else:
                        # Joint finetune over all levels.
                        self.mask = self.mask_for_level(self.model, self.num_levels)
                else:
                    self.mask = self.mask_for_level(self.model, self.active_level)
                self.reset_convergence_check()
        self.epochs_in_level += 1
