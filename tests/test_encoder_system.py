"""Encoder-initialized submap spawning inside the SLAM System.

The MISO paper's second contribution is amortized initialization
(reference `grid_opt/local_opt.py:17-54`: init_mode='encode' predicts a
new model's features one-shot from its observations, then a SHORTER
optimization finishes the job).  These tests wire that into the live
System loop (`slam/system.py::_encode_init_current_submap`) and assert
the iteration saving: an encoder-initialized submap matches the map
quality of a zero-initialized one trained with 3x the init-burst
iterations, while a zero init given the same short burst is measurably
worse.
"""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.datasets.sequence import SdfSequence, orbit_trajectory
from miso_tpu.datasets.shapes import room_scene
from miso_tpu.models.encoder import Encoder
from miso_tpu.models.grid_atlas import GridAtlas
from miso_tpu.native import TriangleMesh
from miso_tpu.slam.system import System

from tests.test_slam import CFG, MODEL_CFG
from tests.test_slam import pretrained_decoder_path, seq  # noqa: F401

TRUNC = 0.3


@pytest.fixture(scope="module")
def pretrained_encoders(pretrained_decoder_path):  # noqa: F811
    """Per-level feature encoders pretrained on held-out room scenes
    (seeds != the test sequence's seed), sharing the test decoder
    (reference training/train_encoders.py recipe)."""
    from miso_tpu.datasets.sdf_3d import PosedSdf3D
    from miso_tpu.models.base import tree_full_mask, tree_zero_mask
    from miso_tpu.models.encoder import (encoder_pretrain_loss,
                                         feature_prediction_init)
    from miso_tpu.models.grid_net import create_grid_net
    from miso_tpu.train.checkpoint import load_pytree
    from miso_tpu.train.optim import masked_adam_init, masked_adam_update

    n_levels = MODEL_CFG["grid"]["n_levels"]
    fdim = MODEL_CFG["grid"]["feature_dim"]
    cfg = copy.deepcopy(MODEL_CFG)
    cfg["decoder"]["fix"] = True
    dec_like = create_grid_net(jax.random.PRNGKey(0), cfg).decoder
    dec = load_pytree(pretrained_decoder_path, like=dec_like)

    datasets, grids = [], []
    key = jax.random.PRNGKey(3)
    for i in range(2):
        mesh = TriangleMesh(*room_scene(4.0 + 0.5 * i, seed=10 + i))
        ds = PosedSdf3D(mesh, frame_batchsize=2**9, frame_samples=2**10,
                        num_frames=16, trunc_dist=TRUNC, seed=i)
        datasets.append(ds)
        key, sub = jax.random.split(key)
        g = create_grid_net(sub, cfg, bound=ds.get_inflated_bound(),
                            num_poses=16)
        grids.append(g.replace(
            decoder=dec, decoder_fixed=True,
            Rwk=jnp.asarray(ds.R_world_frame),
            twk=jnp.asarray(ds.t_world_frame)))
    key, k0, k1 = jax.random.split(key, 3)
    enc_params = [feature_prediction_init(k, fdim, 3) for k in (k0, k1)]

    def make_step(target_level):
        def step(enc, opt, grid, batch, k, lr):
            def obj(enc):
                d = encoder_pretrain_loss(enc, grid, batch, k, target_level,
                                          trunc_dist=TRUNC, pred_std=1e-3)
                return sum(jnp.mean(v) for v in d.values())

            loss, grads = jax.value_and_grad(obj)(enc)
            mask = [tree_full_mask(e) if l == target_level
                    else tree_zero_mask(e) for l, e in enumerate(enc)]
            new_e, new_o = masked_adam_update(grads, opt, enc, mask, lr=lr)
            return new_e, new_o, loss

        return jax.jit(step)

    rng = np.random.default_rng(0)
    for level in range(n_levels):
        step = make_step(level)
        opt = masked_adam_init(enc_params)
        k = jax.random.PRNGKey(level)
        for _ in range(60):
            i = int(rng.integers(len(datasets)))
            batch = {kk: np.asarray(v)
                     for kk, v in datasets[i].sample(rng).items()}
            k, sub = jax.random.split(k)
            enc_params, opt, _ = step(enc_params, opt, grids[i], batch, sub,
                                      np.float32(1e-3))
    return enc_params, dec


def _run_system(seq, dec_path, init_mode, init_iters, enc_params=None):  # noqa: F811
    model_cfg = copy.deepcopy(MODEL_CFG)
    model_cfg["decoder"].update({"fix": True, "pretrained_model": dec_path})
    cfg = copy.deepcopy(CFG)
    # 12-frame orbit, 2 submaps of 6 KFs each.
    cfg["system"].update({"submap_size": 6,
                          "submap_init_mode": init_mode})
    cfg["mapping"].update({"init_iterations": init_iters,
                           "init_iterations_encode": init_iters,
                           "iters_per_frame": 6,
                           "level_iters_per_frame": 2})
    encoder = None
    if init_mode == "encode":
        encoder = Encoder({"model": model_cfg}, trunc_dist=TRUNC)
        encoder.level_params = list(enc_params)
    atlas = GridAtlas(model_cfg, max_kfs_per_submap=6)
    R0, t0 = seq.true_kf_pose_in_world(0)
    system = System(atlas, seq, seq, cfg, R_world_origin=R0,
                    t_world_origin=t0, encoder=encoder)
    system.run()
    assert atlas.num_keyframes == seq.num_kfs
    assert atlas.num_submaps == 2
    if init_mode == "encode":
        # One encoder init per spawn, and the registration list was
        # cleared so no submap buffers stay pinned.
        assert len(system.encoder_info) == 2
        assert len(encoder.grids) == 0
    # Map quality: mean |SDF| at true surface points of each submap's
    # middle frame, decoded through the atlas.
    errs = []
    for kf in (3, 9):
        pts = seq.sampled_points_at_kf(kf)[:512]
        R, t = seq.true_kf_pose_in_world(kf)
        world = pts @ np.asarray(R).T + np.asarray(t)
        sdf = np.asarray(atlas.params(jnp.asarray(world)))
        errs.append(float(np.abs(sdf).mean()))
    return float(np.mean(errs))


@pytest.mark.slow
def test_encoder_init_saves_init_iterations(seq, pretrained_decoder_path,  # noqa: F811
                                            pretrained_encoders):
    """encode@K matches zero@3K map quality and beats zero@K (the
    reference's local_opt.py:37-53 claim, measured in-system)."""
    enc_params, _ = pretrained_encoders
    err_zero_full = _run_system(seq, pretrained_decoder_path, "zero", 30)
    err_zero_short = _run_system(seq, pretrained_decoder_path, "zero", 10)
    err_enc_short = _run_system(seq, pretrained_decoder_path, "encode", 10,
                                enc_params)
    # The encoder-initialized short burst must (a) match the 3x-longer
    # zero-init burst and (b) clearly beat the equal-budget zero init.
    assert err_enc_short < 1.15 * err_zero_full, \
        (err_enc_short, err_zero_full, err_zero_short)
    assert err_enc_short < 0.9 * err_zero_short, \
        (err_enc_short, err_zero_full, err_zero_short)
