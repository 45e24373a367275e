"""Scanned multi-step training bursts (cfg scan_steps).

One jitted lax.scan per burst must train equivalently to the per-epoch
loop (same per-step math; RNG draws differ) and must respect
GridTrainer's deterministic level-switch boundaries exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.losses.miso import make_loss
from miso_tpu.losses.sdf import sdf_loss_3d
from miso_tpu.models.grid_net import create_grid_net
from miso_tpu.train.trainer import GridTrainer, Trainer

pytestmark = pytest.mark.fast

CFG_MODEL = {
    "spatial_dim": 3,
    "grid": {"type": "regular", "feature_dim": 2, "init_stddev": 1e-3,
             "bound": [[-1, 1], [-1, 1], [-1, 1]],
             "base_cell_size": 0.5, "per_level_scale": 2.0, "n_levels": 2},
    "decoder": {"type": "mlp", "hidden_dim": 16, "hidden_layers": 1,
                "out_dim": 1, "pos_invariant": True, "fix": False,
                "pretrained_model": None},
    "pose": {"optimize": False, "num_poses": 1},
}


class SphereSdf:
    def __init__(self, n=1024, seed=0):
        self.n = n

    def sample(self, rng):
        x = rng.uniform(-0.9, 0.9, (self.n, 3)).astype(np.float32)
        sdf = (np.linalg.norm(x, axis=1, keepdims=True) - 0.5).astype(np.float32)
        return {"coords": x, "sdf": sdf, "sdf_valid": np.ones_like(sdf)}


def _final_mae(model):
    rng = np.random.default_rng(9)
    x = rng.uniform(-0.8, 0.8, (4096, 3)).astype(np.float32)
    gt = np.linalg.norm(x, axis=1, keepdims=True) - 0.5
    pred = np.asarray(model(jnp.asarray(x)))
    return float(np.abs(pred - gt).mean())


def test_scanned_trainer_matches_loop_quality():
    loss_fn = make_loss(sdf_loss_3d, sdf_weight=1.0)
    maes = {}
    for scan in (1, 64):
        model = create_grid_net(jax.random.PRNGKey(0), CFG_MODEL)
        tr = Trainer({"optimizer": "adam", "learning_rate": 1e-2,
                      "epochs": 120, "scan_steps": scan},
                     model, loss_fn, SphereSdf(), seed=0)
        maes[scan] = _final_mae(tr.train())
    assert maes[64] < 0.05, maes
    assert abs(maes[64] - maes[1]) < 0.02, maes


def test_scanned_gridtrainer_respects_level_boundaries():
    loss_fn = make_loss(sdf_loss_3d, sdf_weight=1.0)
    marks = {}
    for scan in (1, 256):
        model = create_grid_net(jax.random.PRNGKey(0), CFG_MODEL)
        tr = GridTrainer({"optimizer": "adam", "learning_rate": 1e-2,
                          "epochs": 30, "max_epochs_in_level": 10,
                          "grid_training_mode": "coordinate+joint",
                          "scan_steps": scan},
                         model, loss_fn, SphereSdf(), seed=0)
        m = tr.train()
        marks[scan] = {k: v for k, v in tr.train_dict.items()
                       if k.startswith("level")}
        assert _final_mae(m) < 0.2, scan
    # Level switch epochs identical between looped and scanned runs.
    assert marks[1] == marks[256], marks
    assert marks[1]["level0_last_epoch"] == 10
    assert marks[1]["level1_last_epoch"] == 20


def test_make_loss_caches_by_identity():
    """Same (fn, kwargs) -> same function object, so step/scan caches
    reuse compiled executables across Trainer/Fuser instances."""
    from miso_tpu.losses.miso import make_loss, mapping_loss

    a = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0)
    b = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0)
    c = make_loss(mapping_loss, loss_type="L2", weight_sdf=1.0)
    assert a is b
    assert a is not c


def _tiny_seq(frame_samples=64, num_frames=3):
    from miso_tpu.datasets.sequence import SdfSequence, orbit_trajectory
    from miso_tpu.datasets.shapes import room_scene
    from miso_tpu.native import TriangleMesh

    verts, tris = room_scene(4.0, seed=0)
    mesh = TriangleMesh(verts, tris)
    R, t = orbit_trajectory(center=[0, 0, 0], radius=1.4, height=1.2,
                            num_frames=num_frames, look_at=[0, 0, -0.5])
    return SdfSequence(mesh, R, t, frame_samples=frame_samples,
                       frame_batchsize=32, trunc_dist=0.3,
                       near_surface_std=0.1, seed=1)


def test_device_pool_shapes_and_padding():
    seq = _tiny_seq()
    seq.select_keyframes([0, 2])
    pool, sel, n_rows, B = seq.device_pool()
    assert list(np.asarray(sel)) == [0, 2]
    assert B == 32
    nmax = max(f["points_frame"].shape[0] for f in seq.frames)
    for name, a in pool.items():
        # preallocated at FULL sequence size regardless of selection
        assert a.shape[0] == seq.num_kfs and a.shape[1] == nmax, \
            (name, a.shape)
    for kf in (0, 2):
        n = seq.frames[kf]["points_frame"].shape[0]
        assert int(n_rows[kf]) == n
        got = np.asarray(pool["coords_frame"][kf, :n])
        np.testing.assert_array_equal(
            got, seq.frames[kf]["points_frame"][:n])
        # padding rows are zero
        tail = np.asarray(pool["coords_frame"][kf, n:])
        assert (tail == 0).all()
    # kf 1 not selected yet: its rows are unloaded
    assert int(n_rows[1]) == 0
    # selection change only changes sel; kf 1 rows load on demand
    seq.select_keyframes([1])
    pool2, sel2, n_rows2, _ = seq.device_pool()
    assert pool2["coords_frame"].shape[0] == seq.num_kfs
    assert list(np.asarray(sel2)) == [1]
    assert int(n_rows2[1]) == seq.frames[1]["points_frame"].shape[0]


def test_pool_scan_matches_host_step_on_singleton_pools():
    """With 1 valid row per kf every draw picks row 0, so one pooled
    scan step must equal the host make_train_step on the equivalent
    batch exactly (the mapping loss ignores the RNG key)."""
    from miso_tpu.losses.miso import mapping_loss
    from miso_tpu.train.optim import masked_adam_init
    from miso_tpu.train.trainer import (make_train_scan_pool,
                                        make_train_step)
    from miso_tpu.models.base import tree_full_mask

    seq = _tiny_seq()
    cfg = dict(CFG_MODEL)
    cfg["pose"] = {"optimize": True, "num_poses": 4}
    model = create_grid_net(jax.random.PRNGKey(0), cfg)
    for kf in range(3):
        R, t = seq.true_kf_pose_in_world(kf)
        model = model.set_initial_kf_pose(kf, jnp.asarray(R), jnp.asarray(t))
    loss_fn = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0,
                        weight_eik=0.0, weight_fs=0.2, trunc_dist=0.3,
                        finite_diff_eps=0.05, grad_method="finitediff",
                        eik_trunc_dist=0.3)
    seq.select_keyframes([0, 1, 2])
    pool, sel, n_rows, B = seq.device_pool()
    ones = jnp.ones((seq.num_kfs,), jnp.int32)
    mask = tree_full_mask(model)
    lr = jnp.float32(1e-2)

    burst = make_train_scan_pool(loss_fn, "adam")
    m1, _, tls = burst(model, masked_adam_init(model), pool, sel, ones,
                       jax.random.PRNGKey(5), mask, lr, 1, int(B))

    # equivalent host batch: row 0 of each kf, repeated B times
    batch = {}
    for name, a in pool.items():
        row0 = np.asarray(a[:3, 0])
        batch[name] = jnp.asarray(np.repeat(row0, B, axis=0))
    batch["sample_frame_ids"] = jnp.repeat(jnp.asarray([0, 1, 2],
                                                       jnp.int32), B)
    batch["weights"] = jnp.ones((3 * B, 1), jnp.float32)
    step = make_train_step(loss_fn, "adam")
    m2, _, tl, _ = step(model, masked_adam_init(model), batch,
                        jax.random.PRNGKey(7), mask, lr)
    np.testing.assert_allclose(float(tls[0]), float(tl), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1),
                    jax.tree_util.tree_leaves(m2)):
        if hasattr(a, "dtype") and np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_pool_step_matches_host_step_when_single_kf_single_row():
    """make_train_step_pool with k_live=1 and 1 valid row draws
    (kf 0, row 0) for every sample, so it must equal make_train_step on
    that row repeated N times."""
    from miso_tpu.losses.miso import mapping_loss
    from miso_tpu.train.optim import masked_adam_init
    from miso_tpu.train.trainer import make_train_step, make_train_step_pool
    from miso_tpu.models.base import tree_full_mask

    seq = _tiny_seq()
    cfg = dict(CFG_MODEL)
    cfg["pose"] = {"optimize": True, "num_poses": 4}
    model = create_grid_net(jax.random.PRNGKey(0), cfg)
    for kf in range(3):
        R, t = seq.true_kf_pose_in_world(kf)
        model = model.set_initial_kf_pose(kf, jnp.asarray(R), jnp.asarray(t))
    loss_fn = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0,
                        weight_eik=0.0, weight_fs=0.2, trunc_dist=0.3,
                        finite_diff_eps=0.05, grad_method="finitediff",
                        eik_trunc_dist=0.3)
    pool, _, _, _ = seq.device_pool()
    ones = jnp.ones((seq.num_kfs,), jnp.int32)
    mask = tree_full_mask(model)
    lr = jnp.float32(1e-2)
    N = 48

    step_pool = make_train_step_pool(loss_fn, "adam")
    # copies: the pooled step donates params/opt_state
    m_in = jax.tree_util.tree_map(
        lambda x: x + 0 if hasattr(x, "dtype") else x, model)
    m1, _, tl1 = step_pool(m_in, masked_adam_init(model), pool, ones,
                           jnp.int32(1), jax.random.PRNGKey(3), mask, lr, N)

    batch = {name: jnp.asarray(np.repeat(np.asarray(a[0:1, 0]), N, axis=0))
             for name, a in pool.items()}
    batch["sample_frame_ids"] = jnp.zeros((N,), jnp.int32)
    batch["weights"] = jnp.ones((N, 1), jnp.float32)
    step = make_train_step(loss_fn, "adam")
    m2, _, tl2, _ = step(model, masked_adam_init(model), batch,
                         jax.random.PRNGKey(9), mask, lr)
    np.testing.assert_allclose(float(tl1), float(tl2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1),
                    jax.tree_util.tree_leaves(m2)):
        if hasattr(a, "dtype") and np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_burst_pool_matches_scan_pool_bit_exact():
    """make_train_burst_pool with a constant mask schedule must be
    BIT-equal to make_train_scan_pool from a zero-initialized optimizer:
    identical per-step math, sampling, and key chain."""
    from miso_tpu.losses.miso import mapping_loss
    from miso_tpu.train.optim import masked_adam_init
    from miso_tpu.train.trainer import (make_train_burst_pool,
                                        make_train_scan_pool)
    from miso_tpu.models.base import tree_full_mask

    seq = _tiny_seq(frame_samples=128)
    cfg = dict(CFG_MODEL)
    cfg["pose"] = {"optimize": True, "num_poses": 4}
    model = create_grid_net(jax.random.PRNGKey(0), cfg)
    for kf in range(3):
        R, t = seq.true_kf_pose_in_world(kf)
        model = model.set_initial_kf_pose(kf, jnp.asarray(R), jnp.asarray(t))
    loss_fn = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0,
                        weight_fs=0.2, trunc_dist=0.3,
                        finite_diff_eps=0.05, grad_method="finitediff",
                        eik_trunc_dist=0.3)
    seq.select_keyframes([0, 1, 2])
    pool, sel, n_rows, B = seq.device_pool()
    mask = tree_full_mask(model)
    lr = jnp.float32(5e-3)
    steps, key = 7, jax.random.PRNGKey(21)

    scan = make_train_scan_pool(loss_fn, "adam")
    m1, _, tls1 = scan(model, masked_adam_init(model), pool, sel, n_rows,
                       key, mask, lr, steps, int(B))

    masks = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([mask] * steps))
    burst = make_train_burst_pool(loss_fn, "adam")
    m2, tls2 = burst(model, pool, sel, n_rows, key, masks, lr, int(B))

    np.testing.assert_array_equal(np.asarray(tls1), np.asarray(tls2))
    for a, b in zip(jax.tree_util.tree_leaves(m1),
                    jax.tree_util.tree_leaves(m2)):
        if hasattr(a, "dtype") and np.issubdtype(a.dtype, np.floating):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_level_schedule_matches_gridtrainer_boundaries():
    """level_schedule emits the exact level-per-epoch sequence the
    GridTrainer's pre_epoch switching produces with relchange_tol=0
    (test_scanned_gridtrainer_respects_level_boundaries pins the trainer
    side: level0_last_epoch=10, level1_last_epoch=20 at max=10)."""
    from miso_tpu.train.trainer import level_schedule

    assert level_schedule(30, 10, 2, "coordinate+joint") == \
        [0] * 10 + [1] * 10 + [2] * 10
    assert level_schedule(30, 10, 2, "coordinate") == [0] * 10 + [1] * 20
    assert level_schedule(5, 10, 2, "joint") == [2] * 5
    # SLAM per-frame burst shape: 15 iters, 5 per level, 2 levels
    assert level_schedule(15, 5, 2, "coordinate+joint") == \
        [0] * 5 + [1] * 5 + [2] * 5


def test_mapper_one_dispatch_burst_trains():
    """Mapper fast path (one_dispatch): a coarse-to-fine burst in one
    dispatch reduces the mapping loss comparably to the trainer path."""
    from miso_tpu.slam.mapper import Mapper

    losses = {}
    for one_dispatch in (False, True):
        seq = _tiny_seq(frame_samples=256)
        cfg_model = dict(CFG_MODEL)
        cfg_model["grid"] = dict(CFG_MODEL["grid"],
                                 bound=[[-4.0, 4.0]] * 3)
        cfg_model["pose"] = {"optimize": True, "num_poses": 4}
        model = create_grid_net(jax.random.PRNGKey(0), cfg_model)
        for kf in range(3):
            R, t = seq.true_kf_pose_in_world(kf)
            model = model.set_initial_kf_pose(kf, jnp.asarray(R),
                                              jnp.asarray(t))
        cfg = {"mapping": {"learning_rate": 5e-3, "loss_type": "L1",
                           "weight_sdf": 1.0, "weight_fs": 0.2,
                           "trunc_dist": 0.3, "finite_diff_eps": 0.05,
                           "eik_trunc_dist": 0.3,
                           "one_dispatch": one_dispatch,
                           "device_sampling": True},
               "train": {"grid_training_mode": "coordinate+joint"}}
        mapper = Mapper(model, seq, cfg)
        key0 = jax.random.PRNGKey(11)
        b = {k: jnp.asarray(np.asarray(v))
             for k, v in seq.sample(np.random.default_rng(2)).items()}
        before = sum(float(jnp.mean(v))
                     for v in mapper.loss_fn(model, b, key0).values())
        mapper.mapping([0, 1, 2], iterations=30, level_iterations=10)
        after = sum(float(jnp.mean(v))
                    for v in mapper.loss_fn(mapper.grid, b, key0).values())
        losses[one_dispatch] = (before, after)
        assert after < before * 0.8, (one_dispatch, before, after)
        assert mapper.last_sample_time < 0.5
    # comparable quality between the two paths
    a, b_ = losses[True][1], losses[False][1]
    assert a < b_ * 1.5 + 1e-3, losses


def test_trainer_device_sampling_trains():
    """GridTrainer with cfg device_sampling=True runs the pooled scan
    path end-to-end and reduces the mapping loss."""
    from miso_tpu.losses.miso import mapping_loss

    seq = _tiny_seq(frame_samples=256)
    cfg = dict(CFG_MODEL)
    cfg["grid"] = dict(CFG_MODEL["grid"],
                       bound=[[-4.0, 4.0], [-4.0, 4.0], [-4.0, 4.0]])
    cfg["pose"] = {"optimize": True, "num_poses": 4}
    model = create_grid_net(jax.random.PRNGKey(0), cfg)
    for kf in range(3):
        R, t = seq.true_kf_pose_in_world(kf)
        model = model.set_initial_kf_pose(kf, jnp.asarray(R), jnp.asarray(t))
    loss_fn = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0,
                        weight_eik=0.0, weight_fs=0.2, trunc_dist=0.3,
                        finite_diff_eps=0.05, grad_method="finitediff",
                        eik_trunc_dist=0.3)
    seq.select_keyframes([0, 1, 2])
    tr = Trainer({"optimizer": "adam", "learning_rate": 5e-3, "epochs": 32,
                  "scan_steps": 16, "device_sampling": True},
                 model, loss_fn, seq)
    key0 = jax.random.PRNGKey(11)
    b = seq.sample(np.random.default_rng(2))
    b = {k: jnp.asarray(np.asarray(v)) for k, v in b.items()}
    before = sum(float(jnp.mean(v))
                 for v in loss_fn(model, b, key0).values())
    trained = tr.train()
    after = sum(float(jnp.mean(v))
                for v in loss_fn(trained, b, key0).values())
    assert after < before * 0.8, (before, after)
    assert tr.sample_time < 0.5  # pool path: no per-burst host sampling
