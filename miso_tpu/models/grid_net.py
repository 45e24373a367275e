"""GridNet: the multiresolution submap model as an immutable pytree.

TPU-native re-design of `grid_opt/models/grid_net.py` (352 LoC torch
Module).  Per level l the model holds a dense feature grid with
``cell_size = base / scale**l`` plus a parallel 1-channel "stability"
grid (grid_net.py:46-75); a shared MLP decoder over the concatenation
of per-level features (grid_net.py:112-127); and pose-correction
variables (K, 3) so(3) + (K, 3) translation applied as
``R @ Exp(dr), t + dt`` on top of buffered initial poses
(grid_net.py:135-157).

Differences by design:
  * lock/unlock & per-index pose freezing (grid_net.py:159-215) live in
    mask pytrees (see :func:`grid_net_mask`), not in the model;
  * `ignore_level` is a runtime (L,) float array, so toggling levels
    does not recompile;
  * keyframe poses are updated *batched* (one so3_exp over all K poses)
    instead of the reference's per-id accessor.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from miso_tpu.models import base as mbase
from miso_tpu.ops import interp, se3
from miso_tpu.ops.mlp import mlp_apply, mlp_init


@jax.jit
def _jit_updated_poses(rot_corr, trans_corr, Rwk, twk):
    R = se3.so3_exp(rot_corr)
    return (jnp.matmul(Rwk, R, precision=jax.lax.Precision.HIGHEST),
            twk + trans_corr)


@jax.jit
def _jit_set_kf_pose(Rwk, twk, rot_corr, trans_corr, kf_id, R, t):
    return (Rwk.at[kf_id].set(R), twk.at[kf_id].set(jnp.reshape(t, (3,))),
            rot_corr.at[kf_id].set(0.0), trans_corr.at[kf_id].set(0.0))


class GridNet(struct.PyTreeNode):
    # --- array leaves -----------------------------------------------------
    features: Tuple[Any, ...]                  # per level: (g0.., F) array
                                               # (regular) or VM factor dict
    stability: Tuple[jnp.ndarray, ...]         # per level (g0.., 1)
    decoder: Any                               # MLP params or None
    rot_corr: jnp.ndarray                      # (K, 3)
    trans_corr: jnp.ndarray                    # (K, 3)
    Rwk: jnp.ndarray                           # (K, 3, 3) initial poses (buffer)
    twk: jnp.ndarray                           # (K, 3)
    bound: jnp.ndarray                         # (d, 2)
    ignore_level: jnp.ndarray                  # (L,) float; 1 = ignored
    vm_bases: Any = None                       # per level basis dict (VM only)
    # anchor_kf is a LEAF, not static config: it is the submap's global
    # anchor keyframe id (3, 6, 9, ... in a SLAM run), used only in index
    # arithmetic (global kf id -> local pose row, losses/miso.py:24).  As
    # a static field it was baked into every executable's jit key, so
    # EVERY submap spawn recompiled the whole mapping/tracking set at
    # aged-process cost (measured 45 s/spawn on the quad run).  As an
    # int32 leaf the same executables serve every submap; integer leaves
    # are never touched by the masked optimizers (float0-grad guard,
    # train/optim.py:47).
    anchor_kf: Any = 0                         # () int32
    # --- static config ----------------------------------------------------
    d: int = struct.field(pytree_node=False, default=3)
    fdim: int = struct.field(pytree_node=False, default=4)
    num_levels: int = struct.field(pytree_node=False, default=2)
    cell_sizes: Tuple[float, ...] = struct.field(pytree_node=False, default=())
    pos_invariant: bool = struct.field(pytree_node=False, default=True)
    decoder_fixed: bool = struct.field(pytree_node=False, default=False)
    optimize_pose: bool = struct.field(pytree_node=False, default=False)
    grid_type: str = struct.field(pytree_node=False, default="regular")
    vm_bases_fixed: bool = struct.field(pytree_node=False, default=False)
    # 'xla' (default) or 'pallas': fused interp+concat+decode kernel
    # (ops/pallas_decode.fused_interp_decode).  Same math, same grads.
    decode_impl: str = struct.field(pytree_node=False, default="xla")

    # --- derived ----------------------------------------------------------
    @property
    def num_poses(self) -> int:
        return self.rot_corr.shape[0]

    def level_shape(self, level: int) -> Tuple[int, ...]:
        return self.features[level].shape[:-1]

    # --- queries (pure functions of the pytree) ---------------------------
    def query_feature(self, x: jnp.ndarray) -> jnp.ndarray:
        """Multi-level interp, concat (reference grid_net.py:288-297).

        grid_type 'VM' uses the TensoRF plane/line factorization with
        learned bases (grid_modules.py:125-251, utils.py:167-191).
        """
        if self.grid_type == "VM":
            feats = []
            for level in range(self.num_levels):
                fac = self.features[level]
                coeffs = interp.vm_interpolate(
                    {k: fac[k] for k in ("xy", "xz", "yz")},
                    {k: fac[k] for k in ("x", "y", "z")}, x, self.bound)
                basis = self.vm_bases[level]
                if self.vm_bases_fixed:
                    basis = jax.lax.stop_gradient(basis)
                f = interp.vm_basis_apply(basis, coeffs)
                f = f * (1.0 - self.ignore_level[level])
                feats.append(f)
            return jnp.concatenate(feats, axis=-1)
        return interp.multi_level_interpolate(self.features, x, self.bound,
                                              self.ignore_level)

    def query_stability(self, x: jnp.ndarray) -> jnp.ndarray:
        """Stability grids are never level-ignored (grid_net.py:299-304)."""
        return interp.multi_level_interpolate(self.stability, x, self.bound, None)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        decoder = self.decoder
        if decoder is not None and self.decoder_fixed:
            decoder = jax.lax.stop_gradient(decoder)
        if (self.decode_impl == "pallas" and self.grid_type == "regular"
                and decoder is not None and self.pos_invariant):
            from miso_tpu.ops.pallas_decode import fused_interp_decode
            return fused_interp_decode(self.features, x, self.bound, decoder,
                                       ignore_level=self.ignore_level)
        feats = self.query_feature(x)
        return interp.grid_decode(feats, x, decoder, self.pos_invariant)

    forward = __call__

    # --- poses ------------------------------------------------------------
    def updated_kf_poses(self, lock_mask: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """All K corrected poses, batched (grid_net.py:257-262).

        lock_mask: optional (K,) float; rows with 1 get stop_gradient
        (the reference's per-index pose locking, grid_net.py:209-215).
        """
        dr, dt = self.rot_corr, self.trans_corr
        if lock_mask is not None:
            m = lock_mask[:, None]
            dr = jax.lax.stop_gradient(dr) * m + dr * (1.0 - m)
            dt = jax.lax.stop_gradient(dt) * m + dt * (1.0 - m)
            R = se3.so3_exp(dr)
            return (jnp.matmul(self.Rwk, R,
                               precision=jax.lax.Precision.HIGHEST),
                    self.twk + dt)
        # No lock: route through one jitted call (the host-side SLAM
        # bookkeeping calls this eagerly every frame; unjitted it issues
        # ~30 tiny dispatches through the device tunnel).
        return _jit_updated_poses(dr, dt, self.Rwk, self.twk)

    def updated_kf_pose(self, kf_id) -> Tuple[jnp.ndarray, jnp.ndarray]:
        R, t = self.updated_kf_poses()
        return R[kf_id], t[kf_id]

    def initial_kf_pose(self, kf_id) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.Rwk[kf_id], self.twk[kf_id]

    def pose_key_to_id(self, kf_key: str) -> int:
        """'KF{global_id}' -> local pose index (grid_net.py:242-244)."""
        assert kf_key.startswith("KF"), kf_key
        return int(kf_key[2:]) - int(self.anchor_kf)

    # --- functional mutations --------------------------------------------
    def set_initial_kf_pose(self, kf_id: int, R, t) -> "GridNet":
        """Set initial pose & zero its corrections (grid_net.py:217-240)."""
        Rwk, twk, rc, tc = _jit_set_kf_pose(
            self.Rwk, self.twk, self.rot_corr, self.trans_corr,
            jnp.asarray(kf_id), jnp.asarray(R), jnp.asarray(t))
        return self.replace(Rwk=Rwk, twk=twk, rot_corr=rc, trans_corr=tc)

    def zero_features(self) -> "GridNet":
        return self.replace(features=tuple(jnp.zeros_like(f) for f in self.features))

    def randn_features(self, key, std) -> "GridNet":
        keys = jax.random.split(key, self.num_levels)
        return self.replace(features=tuple(
            jax.random.normal(k, f.shape, f.dtype) * std
            for k, f in zip(keys, self.features)))

    def with_ignore_level(self, levels: Sequence[int]) -> "GridNet":
        ig = np.zeros((self.num_levels,), np.float32)
        for l in levels:
            ig[l] = 1.0
        return self.replace(ignore_level=jnp.asarray(ig))


def create_grid_net(key, cfg_model: Dict, bound=None, num_poses: Optional[int] = None,
                    optimize_pose: Optional[bool] = None,
                    initial_features: Optional[Dict[int, jnp.ndarray]] = None,
                    anchor_kf: int = 0, dtype=jnp.float32) -> GridNet:
    """Build a GridNet from a reference-style model config dict.

    cfg_model mirrors the reference yaml (`configs/base.yaml`):
    {'spatial_dim', 'grid': {feature_dim, base_cell_size, per_level_scale,
    n_levels, bound, init_stddev}, 'decoder': {...}, 'pose': {...}}.
    """
    g = cfg_model["grid"]
    # Feature storage dtype.  The mapping/query hot path is
    # HBM-bandwidth-bound on the feature gathers; bfloat16 storage
    # halves that traffic (~1.5-2.5x step throughput measured on one
    # chip) and trains to the same SDF MAE -- the lerp and everything
    # downstream promote to float32.
    feat_dtype = jnp.dtype(g.get("feature_dtype", dtype))
    dcfg = cfg_model.get("decoder", {"type": "none"})
    pcfg = cfg_model.get("pose", {"num_poses": 1, "optimize": False})
    d = int(cfg_model.get("spatial_dim", 3))
    bound_np = np.asarray(bound if bound is not None else g["bound"], np.float32)
    n_levels = int(g["n_levels"])
    fdim = int(g["feature_dim"])
    base_cell = float(g["base_cell_size"])
    scale = float(g["per_level_scale"])
    init_std = float(g.get("init_stddev", 0.0))
    initial_features = initial_features or {}

    grid_type = g.get("type", "regular")
    vm_cfg = g.get("VM", {})
    rank = int(vm_cfg.get("rank", 10))
    features = []
    stability = []
    vm_bases = [] if grid_type == "VM" else None
    cell_sizes = []
    for level in range(n_levels):
        cell = base_cell / (scale**level)
        cell_sizes.append(cell)
        shape = interp.grid_shape_for_bound(bound_np, cell, d)
        if grid_type == "VM":
            # TensoRF plane+line factors (grid_modules.py:130-146).
            gx, gy, gz = shape
            def rnd(k, sh):
                return jax.random.normal(k, sh, feat_dtype) * max(init_std, 1e-2)
            key, k1, k2, k3, k4, k5, k6, k7, k8, k9 = jax.random.split(key, 10)
            features.append({
                "xy": rnd(k1, (gx, gy, rank)), "xz": rnd(k2, (gx, gz, rank)),
                "yz": rnd(k3, (gy, gz, rank)), "x": rnd(k4, (gx, rank)),
                "y": rnd(k5, (gy, rank)), "z": rnd(k6, (gz, rank)),
            })
            vm_bases.append({
                "xy_z": rnd(k7, (fdim, rank)), "xz_y": rnd(k8, (fdim, rank)),
                "yz_x": rnd(k9, (fdim, rank)),
            })
        elif level in initial_features:
            f = jnp.asarray(initial_features[level], feat_dtype)
            assert f.shape == (*shape, fdim), (f.shape, shape, fdim)
            features.append(f)
        elif init_std > 0:
            key, sub = jax.random.split(key)
            features.append((jax.random.normal(sub, (*shape, fdim), feat_dtype)
                             * init_std).astype(feat_dtype))
        else:
            features.append(jnp.zeros((*shape, fdim), feat_dtype))
        stability.append(jnp.zeros((*shape, 1), feat_dtype))

    decoder = None
    decoder_fixed = bool(dcfg.get("fix", False))
    pos_invariant = bool(dcfg.get("pos_invariant", True))
    if dcfg.get("type", "none") == "mlp":
        in_dim = n_levels * fdim + (0 if pos_invariant else d)
        key, sub = jax.random.split(key)
        decoder = mlp_init(sub, in_dim, int(dcfg["out_dim"]),
                           int(dcfg["hidden_dim"]), int(dcfg["hidden_layers"]),
                           bias=True, dtype=dtype)
        pretrained = dcfg.get("pretrained_model")
        if pretrained:
            from miso_tpu.train.checkpoint import load_pytree
            decoder = load_pytree(pretrained, like=decoder)

    K = int(num_poses if num_poses is not None else pcfg.get("num_poses", 1))
    opt_pose = bool(optimize_pose if optimize_pose is not None else pcfg.get("optimize", False))

    return GridNet(
        features=tuple(features),
        stability=tuple(stability),
        decoder=decoder,
        vm_bases=tuple(vm_bases) if vm_bases is not None else None,
        grid_type=grid_type,
        vm_bases_fixed=bool(vm_cfg.get("fix_bases", False)),
        rot_corr=jnp.zeros((K, 3), dtype),
        trans_corr=jnp.zeros((K, 3), dtype),
        Rwk=se3.identity_rotations(K, dtype),
        twk=jnp.zeros((K, 3), dtype),
        bound=jnp.asarray(bound_np),
        ignore_level=jnp.zeros((n_levels,), dtype),
        d=d,
        fdim=fdim,
        num_levels=n_levels,
        cell_sizes=tuple(cell_sizes),
        pos_invariant=pos_invariant,
        decoder_fixed=decoder_fixed,
        optimize_pose=opt_pose,
        anchor_kf=jnp.asarray(anchor_kf, jnp.int32),
        decode_impl=str(dcfg.get("impl", "xla")),
    )


# ---------------------------------------------------------------------------
# Masks: the functional replacement for lock/unlock + params_at_level.
# ---------------------------------------------------------------------------

def grid_net_mask(model: GridNet,
                  features: Any = True,
                  stability: Any = None,
                  decoder: Optional[bool] = None,
                  pose: Optional[bool] = None,
                  pose_rows: Optional[jnp.ndarray] = None,
                  level: Optional[int] = None,
                  feature_lr: float = 1.0,
                  pose_lr: float = 1.0):
    """Build a trainability/LR mask pytree for a GridNet.

    Semantics mirror the reference param-group logic
    (grid_net.py:327-351 ``params_at_level``):
      * ``level=l`` -> only level-l feature+stability grids train
        (``level >= num_levels`` means all levels -- the joint phase);
      * decoder trains unless ``decoder_fixed``;
      * poses train when ``optimize_pose`` (or explicit override);
      * ``pose_rows`` is a (K,) float row mask for per-index locking
        (tracker trains only the head KF, tracker.py:87-91).
    """
    def zeros(x):
        return jax.tree_util.tree_map(lambda _: jnp.asarray(0.0, jnp.float32), x)

    def fulls(x, v):
        return jax.tree_util.tree_map(lambda _: jnp.asarray(float(v), jnp.float32), x)

    if stability is None:
        stability = features
    if decoder is None:
        decoder = not model.decoder_fixed
    if pose is None:
        pose = model.optimize_pose

    if level is not None and level < model.num_levels:
        feat_sel = [1.0 if l == level else 0.0 for l in range(model.num_levels)]
    else:
        feat_sel = [1.0] * model.num_levels

    def level_mask(grids, enabled):
        if isinstance(enabled, (list, tuple)):
            sel = [feat_sel[l] * float(enabled[l]) for l in range(model.num_levels)]
        else:
            sel = [feat_sel[l] * float(bool(enabled)) for l in range(model.num_levels)]
        return tuple(
            jax.tree_util.tree_map(lambda _: jnp.asarray(s * feature_lr, jnp.float32),
                                   g)
            for s, g in zip(sel, grids))

    pose_mask_val = float(bool(pose)) * pose_lr
    if pose_rows is not None:
        rot_mask = jnp.asarray(pose_rows, jnp.float32)[:, None] * pose_mask_val
    else:
        rot_mask = jnp.asarray(pose_mask_val, jnp.float32)

    vm_mask = None
    if model.vm_bases is not None:
        vm_mask = fulls(model.vm_bases,
                        0.0 if model.vm_bases_fixed else float(bool(decoder)))
    return model.replace(
        features=level_mask(model.features, features),
        stability=level_mask(model.stability, stability),
        vm_bases=vm_mask,
        decoder=(fulls(model.decoder, float(bool(decoder))) if model.decoder is not None else None),
        rot_corr=rot_mask,
        trans_corr=rot_mask,
        Rwk=zeros(model.Rwk),
        twk=zeros(model.twk),
        bound=zeros(model.bound),
        ignore_level=zeros(model.ignore_level),
    )
