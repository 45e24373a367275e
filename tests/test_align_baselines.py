"""Alignment baseline tests (vfpp / mips / ICP pose graph).

Uses the analytic two-submap atlas from test_atlas_align: labels for
vfpp/mips are generated from the source submap's own decoded field at
the GT pose, so the GT relative pose is a minimum of each baseline loss.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_atlas_align import build_atlas

from miso_tpu.models.grid_atlas import fold_stacked, unfold_stacked
from miso_tpu.align.baselines import (align_multiple_submaps_icp,
                                      pairwise_loss_mips, pairwise_loss_vfpp)
from miso_tpu.ops import se3


@pytest.fixture(scope="module")
def atlas_and_obs():
    atlas = build_atlas()
    rng = np.random.default_rng(0)
    # Observation points of submap 1 (in its local frame), labels from
    # its own decoded field -> consistent "sensor" SDF labels.
    coords = rng.uniform(-0.9, 0.9, (2048, 3)).astype(np.float32)
    sub1 = atlas.get_submap(1)
    gt_sdf = np.asarray(sub1(jnp.asarray(coords)))
    valid = np.ones_like(gt_sdf)
    return atlas, jnp.asarray(coords), jnp.asarray(gt_sdf), jnp.asarray(valid)


def _loss_at(fn, atlas, coords, gt, valid, dr, dt, **kw):
    atlas.set_submap_pose_correction(1, np.asarray(dr, np.float32),
                                     np.asarray(dt, np.float32))
    d = fn(atlas.params, atlas, 1, 0, coords, gt, valid, **kw)
    return float(list(d.values())[0])


def test_vfpp_loss_minimum_at_gt(atlas_and_obs):
    atlas, coords, gt, valid = atlas_and_obs
    l_gt = _loss_at(pairwise_loss_vfpp, atlas, coords, gt, valid,
                    [0, 0, 0], [0, 0, 0], trunc_dist=10.0)
    l_pert = _loss_at(pairwise_loss_vfpp, atlas, coords, gt, valid,
                      [0, 0, 0.05], [0.06, -0.04, 0.03], trunc_dist=10.0)
    assert np.isfinite(l_gt) and np.isfinite(l_pert)
    assert l_pert > l_gt, (l_gt, l_pert)


@pytest.mark.slow
def test_mips_loss_differentiable(atlas_and_obs):
    atlas, coords, gt, valid = atlas_and_obs
    atlas.set_submap_pose_correction(1, np.zeros(3, np.float32),
                                     np.zeros(3, np.float32))
    # Surface points for mips: |gt| < tol (use a generous tol since the
    # analytic field is not a true SDF).
    def loss(params):
        d = pairwise_loss_mips(params, atlas, 1, 0, coords, gt, valid,
                               surf_tol=0.5)
        return list(d.values())[0]

    g = jax.grad(lambda p: loss(p), allow_int=True)(atlas.params)
    assert np.isfinite(float(loss(atlas.params)))
    assert np.all(np.isfinite(np.asarray(g.sub_trans_corr)))


def _passthrough_decoder(like):
    """Decoder that outputs feature channel 0 exactly: out = relu(x0) -
    relu(-x0) = x0 survives the ReLU MLP structure."""
    (W0, b0), (W1, b1), (W2, b2) = like
    W0n = np.zeros(W0.shape, np.float32)
    W0n[0, 0] = 1.0
    W0n[0, 1] = -1.0
    W1n = np.zeros(W1.shape, np.float32)
    W1n[0, 0] = 1.0
    W1n[1, 1] = 1.0
    W2n = np.zeros(W2.shape, np.float32)
    W2n[0, 0] = 1.0
    W2n[1, 0] = -1.0
    return ((jnp.asarray(W0n), jnp.zeros_like(b0)),
            (jnp.asarray(W1n), jnp.zeros_like(b1)),
            (jnp.asarray(W2n), jnp.zeros_like(b2)))


@pytest.mark.slow
def test_icp_pose_graph_reduces_error():
    """Perturb submap 1; ICP + pose graph must reduce the pose error.

    The atlas decodes feature channel 0 (a smooth world field crossing
    zero), so both submaps share level sets and ICP on extracted
    level-set points recovers the relative pose approximately.
    """
    atlas = build_atlas()
    atlas.params = atlas.params.replace(
        decoder=_passthrough_decoder(atlas.params.decoder))
    # Replace feature channel 0 with a two-sphere SDF union in world
    # coords: its zero level set fully constrains the relative pose.
    from miso_tpu.ops import interp as _interp

    def sphere_field(x):
        # Kept well inside both submaps' interiors so neither grid's
        # zero-padding boundary distorts the shared level set.
        d1 = np.linalg.norm(x - np.array([0.25, 0.0, 0.0]), axis=-1) - 0.35
        d2 = np.linalg.norm(x - np.array([0.3, -0.25, 0.25]), axis=-1) - 0.22
        return np.minimum(d1, d2)

    feats = []
    p = atlas.params
    for level in range(p.num_levels):
        arr = np.asarray(unfold_stacked(p.features[level],
                                        p.pad_spatial[level], p.fdim)).copy()
        shape = atlas.submap_shapes(0)[level]
        for s in range(2):
            verts = np.asarray(_interp.vertex_positions(
                shape, atlas.params.bounds[s]))
            world = verts + np.array([0.5 * s, 0, 0], np.float32)
            arr[s, ..., 0] = sphere_field(world).reshape(shape)
        feats.append(jnp.asarray(fold_stacked(arr)))
    atlas.params = atlas.params.replace(features=tuple(feats))
    dr = np.array([0, 0, 0.04], np.float32)
    dt = np.array([0.06, -0.04, 0.02], np.float32)
    atlas.set_submap_pose_correction(1, dr, dt)
    R, t = atlas.params.updated_submap_poses()
    err0 = float(jnp.linalg.norm(t[1] - jnp.asarray([0.5, 0, 0])))
    info = align_multiple_submaps_icp(atlas, resolution=32, surf_thresh=0.1,
                                      max_corr_coarse=0.5, max_corr_fine=0.15,
                                      pose_graph_iters=200)
    R, t = atlas.params.updated_submap_poses()
    err1 = float(jnp.linalg.norm(t[1] - jnp.asarray([0.5, 0, 0])))
    assert info["num_edges"] >= 1
    assert err1 < err0, (err0, err1)
