"""Alignment baselines: Vox-Fusion++, MIPS-Fusion, classical ICP.

References: `grid_opt/align/vfpp.py` (render src observations into the
dst grid and minimize the masked SDF residual, vfpp.py:12-162),
`grid_opt/align/mips.py` (SDF-gradient point-to-plane correspondences
``match = p - sdf * grad(sdf)``, mips.py:83-158), `grid_opt/align/icp.py`
(near-surface point extraction + two-stage ICP + pose-graph
optimization, icp.py:14-201; open3d replaced by our own ICP and a
Gauss-Newton pose graph).

The vfpp/mips pairwise losses plug into
``align.miso.generic_align_multiple_submaps`` exactly like the MISO
latent loss.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from miso_tpu.losses.common import masked_mean
from miso_tpu.models.grid_atlas import GridAtlas, GridAtlasParams
from miso_tpu.ops import se3
from miso_tpu.ops.diff import gradient3d


def pairwise_loss_vfpp(params: GridAtlasParams, atlas: GridAtlas,
                       src: int, dst: int, coords_src, gt_sdf, valid,
                       sdf_weight=3000.0, use_bound=True,
                       stability_thresh=0.0, trunc_dist=0.15, key=None,
                       subsample_points=None):
    """VoxFusion++ eq (9)-(10): src-submap observations (coords in src
    frame + SDF labels) rendered into the dst grid; masked MSE of the
    dst prediction vs the labels."""
    sub_dst = params.submap(s=dst, shapes=atlas.submap_shapes(dst))
    if subsample_points is not None and key is not None:
        idx = jax.random.choice(key, coords_src.shape[0],
                                (min(subsample_points, coords_src.shape[0]),))
        coords_src, gt_sdf, valid = coords_src[idx], gt_sdf[idx], valid[idx]
    R, t = params.updated_submap_poses()
    world = se3.transform_points_to(coords_src, R[src], t[src])
    coords_dst = se3.transform_points_from(world, R[dst], t[dst])
    mask = valid * (jnp.abs(gt_sdf) < trunc_dist)
    if use_bound:
        mask = mask * se3.coords_in_bound(coords_dst, sub_dst.bound)
    if stability_thresh > 0:
        mu = jnp.min(sub_dst.query_stability(coords_dst), axis=1, keepdims=True)
        mask = mask * (mu > stability_thresh)
    pred = sub_dst(coords_dst)
    c = jnp.where(mask == 1, pred - gt_sdf, 0.0)
    # Reference means over the full batch (vfpp.py:88-93).
    return {f"vfpp_{src}_{dst}": jnp.mean(c**2) * sdf_weight}


def pairwise_loss_mips(params: GridAtlasParams, atlas: GridAtlas,
                       src: int, dst: int, coords_src, gt_sdf, valid,
                       residual_weight=3000.0, use_bound=True,
                       constraint_type="point_to_plane", key=None,
                       subsample_points=None, surf_tol=1e-3):
    """MIPS-Fusion eq (19)-(22): for surface points of src, find the dst
    correspondence ``match = p - sdf * grad(sdf)`` and minimize the
    point-to-plane residual along the src normal."""
    sub_src = params.submap(s=src, shapes=atlas.submap_shapes(src))
    sub_dst = params.submap(s=dst, shapes=atlas.submap_shapes(dst))
    if subsample_points is not None and key is not None:
        idx = jax.random.choice(key, coords_src.shape[0],
                                (min(subsample_points, coords_src.shape[0]),))
        coords_src, gt_sdf, valid = coords_src[idx], gt_sdf[idx], valid[idx]
    R, t = params.updated_submap_poses()
    world = se3.transform_points_to(coords_src, R[src], t[src])
    coords_dst = se3.transform_points_from(world, R[dst], t[dst])
    mask = valid * (jnp.abs(gt_sdf) < surf_tol)
    if use_bound:
        mask = mask * se3.coords_in_bound(coords_dst, sub_dst.bound)
    grad_src = jax.lax.stop_gradient(gradient3d(coords_src, sub_src, "autograd"))
    sdf_dst = sub_dst(coords_dst)
    grad_dst = jax.lax.stop_gradient(gradient3d(coords_dst, sub_dst, "autograd"))
    match_dst = coords_dst - sdf_dst * grad_dst            # eq (19)
    match_world = se3.transform_points_to(match_dst, R[dst], t[dst])
    match_src = se3.transform_points_from(match_world, R[src], t[src])
    if constraint_type == "point_to_plane":
        cons = jnp.sum((coords_src - match_src) * grad_src, axis=1,
                       keepdims=True)                      # eq (20)
    elif constraint_type == "point_to_point":
        cons = coords_src - match_src
    else:
        raise ValueError(f"Invalid constraint type: {constraint_type}")
    c = jnp.where(mask == 1, cons, 0.0)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return {f"mips_{src}_{dst}": jnp.sum(c**2) / count * residual_weight}


# ---------------------------------------------------------------------------
# Classical ICP + pose-graph baseline (align/icp.py)
# ---------------------------------------------------------------------------

def extract_near_surface_points(atlas: GridAtlas, s: int, resolution=48,
                                surf_thresh=0.05,
                                margin: Optional[float] = None) -> np.ndarray:
    """Near-zero-SDF lattice points of submap s in its local frame
    (icp.py:14-48).

    ``margin`` shrinks the extraction domain away from the grid bound
    (default: one coarse cell) -- the zeros-padding decay rim at the
    bound crosses any threshold and would inject spurious "surface"
    points that exist in only one submap.
    """
    from miso_tpu.utils.sdf import extract_fields

    sub = atlas.get_submap(s)
    if margin is None:
        margin = float(max(sub.cell_sizes))
    b = np.asarray(sub.bound).copy()
    b[:, 0] += margin
    b[:, 1] -= margin
    u = extract_fields(sub, b, resolution)
    ax = [np.linspace(b[i, 0], b[i, 1], resolution) for i in range(3)]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    mask = np.abs(u) < surf_thresh
    return np.stack([X[mask], Y[mask], Z[mask]], axis=-1).astype(np.float32)


def _pose_graph_optimize(n: int, edges: List[Tuple[int, int, np.ndarray]],
                         T_init: np.ndarray, iters=50, lr=0.0):
    """Gauss-Newton pose-graph optimization over SE(3) (replaces open3d
    GlobalOptimization, icp.py:121-201).  Node 0 fixed."""
    import jax
    import jax.numpy as jnp

    from miso_tpu.train.optim import masked_adam_init, masked_adam_update

    R0 = jnp.asarray(T_init[:, :3, :3])
    t0 = jnp.asarray(T_init[:, :3, 3])
    edge_T = jnp.asarray(np.stack([e[2] for e in edges]))
    edge_ij = np.asarray([(e[0], e[1]) for e in edges], np.int32)

    def residual(dr, dt, R0, t0, edge_T):
        R = jnp.matmul(R0, se3.so3_exp(dr), precision=jax.lax.Precision.HIGHEST)
        t = t0 + dt
        res = 0.0
        for k, (i, j) in enumerate(edge_ij):
            # Edge constraint: T_i^-1 T_j == edge_T (relative pose).
            Rij = jnp.matmul(R[i].T, R[j], precision=jax.lax.Precision.HIGHEST)
            tij = jnp.matmul(R[i].T, (t[j] - t[i]),
                             precision=jax.lax.Precision.HIGHEST)
            dR = jnp.matmul(edge_T[k, :3, :3].T, Rij,
                            precision=jax.lax.Precision.HIGHEST)
            res = res + jnp.sum(se3.so3_log(dR[None])**2) \
                + jnp.sum((tij - edge_T[k, :3, 3]) ** 2)
        return res

    dr = jnp.zeros((n, 3))
    dt = jnp.zeros((n, 3))
    params = (dr, dt)
    opt = masked_adam_init(params)
    row = jnp.ones((n, 1)).at[0].set(0.0)
    mask = (row, row)

    # All device data as jit ARGS (closure constants hit the axon slow
    # dispatch path; see ops/interp.py notes).
    @jax.jit
    def step(params, opt, R0_, t0_, edge_T_, mask_):
        loss, grads = jax.value_and_grad(
            lambda p: residual(p[0], p[1], R0_, t0_, edge_T_))(params)
        new_p, new_o = masked_adam_update(grads, opt, params, mask_, lr=1e-2)
        return new_p, new_o, loss

    for _ in range(iters):
        params, opt, loss = step(params, opt, R0, t0, edge_T, mask)
    R = np.asarray(jnp.matmul(R0, se3.so3_exp(params[0]),
                              precision=jax.lax.Precision.HIGHEST))
    t = np.asarray(t0 + params[1])
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = t
    return T


def align_multiple_submaps_icp(atlas: GridAtlas, resolution=48,
                               surf_thresh=0.05, max_corr_coarse=0.5,
                               max_corr_fine=0.1, pose_graph_iters=100,
                               min_fitness=0.1, clouds=None,
                               min_overlap_points=100,
                               constraint="point_to_plane"):
    """Classical baseline (icp.py:95-201): pairwise two-stage ICP on
    near-surface point clouds + global pose-graph optimization; writes
    the optimized submap poses back into the atlas.

    ``clouds`` optionally supplies per-submap local-frame near-surface
    points (the reference feeds *observed* |sdf|<eps sample points,
    icp.py:14-48 get_points_for_submap); default is map-extracted
    level-set lattice points.  Each pair is cropped to the mutual
    overlap box before registration: submaps only partially overlap,
    and uncropped point-to-point ICP drags the solution toward
    maximum-overlap rather than the true pose."""
    from miso_tpu.utils.eval import icp_point_to_point

    S = atlas.num_submaps
    if clouds is None:
        clouds = [extract_near_surface_points(atlas, s, resolution, surf_thresh)
                  for s in range(S)]
    Rw, tw = atlas.params.updated_submap_poses()
    Rw = np.asarray(Rw)
    tw = np.asarray(tw)
    T_init = np.tile(np.eye(4, dtype=np.float32), (S, 1, 1))
    T_init[:, :3, :3] = Rw
    T_init[:, :3, 3] = tw

    edges = []
    for i in range(S):
        for j in range(i + 1, S):
            if not atlas.check_submap_intersection(i, j):
                continue
            # Initial relative transform from current estimates.
            T_ij0 = np.linalg.inv(T_init[i]) @ T_init[j]
            src = clouds[j] @ T_ij0[:3, :3].T + T_ij0[:3, 3]  # j in i frame
            # Crop both clouds to the mutual overlap box in i's frame.
            bi = np.asarray(atlas.get_submap(i).bound)
            bj = np.asarray(atlas.get_submap(j).bound)
            cj = np.array([[bj[0, a], bj[1, b], bj[2, c]]
                           for a in range(2) for b in range(2)
                           for c in range(2)], np.float32)
            cj = cj @ T_ij0[:3, :3].T + T_ij0[:3, 3]
            # Shrink by the extraction rim: points kept on either side
            # must have true counterparts in the other cloud.
            shrink = max(float(max(atlas.get_submap(i).cell_sizes)),
                         float(max(atlas.get_submap(j).cell_sizes)))
            lo = np.maximum(bi[:, 0], cj.min(0)) + shrink
            hi = np.minimum(bi[:, 1], cj.max(0)) - shrink
            dst_c = clouds[i][np.all((clouds[i] >= lo) & (clouds[i] <= hi), 1)]
            src = src[np.all((src >= lo) & (src <= hi), 1)]
            if len(src) < min_overlap_points or len(dst_c) < min_overlap_points:
                continue
            # Two-stage ICP: coarse then fine (icp.py:95-104).  The
            # reference defaults to point-to-plane (icp.py:74-79); the
            # target normals come free from the map's SDF gradient.
            if constraint == "point_to_plane":
                import jax.numpy as jnp

                from miso_tpu.ops.diff import gradient3d
                from miso_tpu.utils.eval import icp_point_to_plane

                g = np.asarray(gradient3d(jnp.asarray(dst_c, jnp.float32),
                                          atlas.get_submap(i)))
                nrm = g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True),
                                     1e-9)
                T1, _, fit1 = icp_point_to_plane(src, dst_c, nrm,
                                                 max_corr_dist=max_corr_coarse)
                T2, _, fit2 = icp_point_to_plane(
                    src @ T1[:3, :3].T + T1[:3, 3], dst_c, nrm,
                    max_corr_dist=max_corr_fine)
            else:
                T1, _, fit1 = icp_point_to_point(src, dst_c,
                                                 max_corr_dist=max_corr_coarse)
                T2, _, fit2 = icp_point_to_point(
                    src @ T1[:3, :3].T + T1[:3, 3], dst_c,
                    max_corr_dist=max_corr_fine)
            if max(fit1, fit2) < min_fitness:
                continue
            T_ij = T2 @ T1 @ T_ij0
            edges.append((i, j, T_ij.astype(np.float32)))
    info = {"num_edges": len(edges)}
    if not edges:
        return info
    T_opt = _pose_graph_optimize(S, edges, T_init, iters=pose_graph_iters)
    for s in range(1, S):
        atlas.set_submap_pose(s, T_opt[s, :3, :3], T_opt[s, :3, 3])
    return info
