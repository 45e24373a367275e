"""GridAtlas: the submap collection (the SLAM map) as a stacked pytree.

Re-design of `grid_opt/models/grid_atlas.py` (587 LoC).  The reference
keeps a ModuleList of per-submap GridNets and loops over them in Python
(`grid_atlas.py:374-399`).  Here all submaps are STACKED on a leading
axis -- features (S, g..., F), submap poses (S, ...), keyframe poses
(S, K, ...) -- so the atlas forward is a single vmap over S, which is
also the natural submap-parallel axis for shard_map across TPU devices
(see miso_tpu/parallel).

Submaps may have different logical bounds (ScanNet precomputed submaps);
storage is padded to the max grid shape per level and per-submap logical
sizes are carried as runtime (S, d) arrays consumed by the interpolation
kernel's ``size`` argument.

Structure:
  * :class:`GridAtlasParams` -- the pure pytree (arrays + static shape
    config).  Everything jitted consumes this.
  * :class:`GridAtlas` -- thin host wrapper holding the pytree plus
    mutable bookkeeping (anchor KFs, kf->submap map, current ids), with
    the reference's add_submap / add_kf / pose accessor API
    (grid_atlas.py:96-328).  SLAM mutates the wrapper; each mutation
    swaps in a new pytree.
"""
from __future__ import annotations

import copy
import functools
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from miso_tpu.models.grid_net import GridNet, create_grid_net
from miso_tpu.ops import interp, se3

_HI = jax.lax.Precision.HIGHEST


def fold_stacked(arr):
    """Fold a stacked (S, g0, ..., g_{d-1}, F) grid array into the
    atlas's rank-3 storage layout (S, g0, g1*...*F).  Row-major element
    order is unchanged (a free reshape); see GridAtlasParams.pad_spatial
    for why the storage is folded (34x TPU lane padding of the F=4
    minor dim in XLA-materialized temps)."""
    return arr.reshape(arr.shape[0], arr.shape[1], -1)


def unfold_stacked(arr, pad_spatial, fdim):
    """Inverse of :func:`fold_stacked`: (S, g0, g1*...*F) back to
    (S, *pad_spatial, fdim)."""
    return arr.reshape(arr.shape[0], *pad_spatial, fdim)


def _read_submap(feats, stabs, s, shapes, pad_spatial, fdim):
    """One jitted dispatch extracting submap s's (possibly unpadded)
    grids from the FOLDED stacked storage (slice slot -> unfold to
    (g..., F) -> crop to logical shapes); eager per-level f[s] indexing
    costs one device round trip per array, which adds up in the
    per-frame SLAM sync path."""
    @functools.partial(jax.jit, static_argnums=(2, 3, 4))
    def go(feats, stabs, shapes, pad_spatial, fdim, s):
        outs_f, outs_s = [], []
        for level, (f, st) in enumerate(zip(feats, stabs)):
            pad = pad_spatial[level]
            start = (s,) + (0,) * (f.ndim - 1)
            row = jax.lax.dynamic_slice(f, start, (1,) + f.shape[1:])[0]
            g = row.reshape(pad + (fdim,))
            srow = jax.lax.dynamic_slice(st, start, (1,) + st.shape[1:])[0]
            sg = srow.reshape(pad + (1,))
            if shapes is not None:
                sl = tuple(slice(0, n) for n in shapes[level])
                g = g[sl]
                sg = sg[sl]
            outs_f.append(g)
            outs_s.append(sg)
        return tuple(outs_f), tuple(outs_s)

    shapes_key = None if shapes is None else tuple(tuple(int(v) for v in sh)
                                                   for sh in shapes)
    pad_key = tuple(tuple(int(v) for v in sh) for sh in pad_spatial)
    return go(feats, stabs, shapes_key, pad_key, int(fdim), jnp.asarray(s))


def _write_submap(feats, stabs, kf_rc, kf_tc, Rsk, tsk, s,
                  g_feats, g_stabs, g_rc, g_tc, g_Rwk, g_twk,
                  pad_spatial):
    """One jitted dispatch writing a GridNet back into slot s of the
    FOLDED stacked storage (pad grid to the padded spatial shape ->
    fold -> slot write).  The stacked feature/stability buffers are
    DONATED so the slot write updates in place instead of copying the
    whole capacity-sized storage (at quad scale, capacity 8 stacks are
    ~300 MB/level; the copy was measured at ~0.9 s/frame through the
    transport).  Callers must drop the old params object -- GridAtlas
    .set_submap replaces it atomically."""
    @functools.partial(jax.jit, static_argnums=(13,), donate_argnums=(0, 1))
    def go(feats, stabs, kf_rc, kf_tc, Rsk, tsk, s,
           g_feats, g_stabs, g_rc, g_tc, g_Rwk, g_twk, pad_spatial):
        def upd(dst, src, pad):
            widths = [(0, p - n) for p, n in zip(pad, src.shape[:-1])]
            if any(w[1] for w in widths):
                src = jnp.pad(src, widths + [(0, 0)])
            folded = src.reshape(dst.shape[1:])
            start = (s,) + (0,) * (dst.ndim - 1)
            return jax.lax.dynamic_update_slice(dst, folded[None], start)

        return (tuple(upd(f, g, p) for f, g, p
                      in zip(feats, g_feats, pad_spatial)),
                tuple(upd(st, g, p) for st, g, p
                      in zip(stabs, g_stabs, pad_spatial)),
                kf_rc.at[s].set(g_rc), kf_tc.at[s].set(g_tc),
                Rsk.at[s].set(g_Rwk), tsk.at[s].set(g_twk))

    pad_key = tuple(tuple(int(v) for v in sh) for sh in pad_spatial)
    return go(feats, stabs, kf_rc, kf_tc, Rsk, tsk, jnp.asarray(s),
              g_feats, g_stabs, g_rc, g_tc, g_Rwk, g_twk, pad_key)


@jax.jit
def _write_submap_poses(kf_rc, kf_tc, Rsk, tsk, s, g_rc, g_tc, g_Rwk, g_twk):
    """Pose-rows-only slot write: the per-frame SLAM sync (tracking and
    odometry only move poses; features go stale until the next full
    sync at a submap/fuse/mesh/checkpoint boundary)."""
    return (kf_rc.at[s].set(g_rc), kf_tc.at[s].set(g_tc),
            Rsk.at[s].set(g_Rwk), tsk.at[s].set(g_twk))


@jax.jit
def _jit_add_kf(Rsk, tsk, kf_rc, kf_tc, kmap, kloc, s, kf_local, kf_global, R, t):
    return (Rsk.at[s, kf_local].set(R),
            tsk.at[s, kf_local].set(jnp.reshape(t, (3,))),
            kf_rc.at[s, kf_local].set(0.0),
            kf_tc.at[s, kf_local].set(0.0),
            kmap.at[kf_global].set(s.astype(kmap.dtype)),
            kloc.at[kf_global].set(kf_local.astype(kloc.dtype)))


class GridAtlasParams(struct.PyTreeNode):
    # Stacked per-submap state (leading axis S).
    features: Tuple[jnp.ndarray, ...]      # per level FOLDED (S, g0, g1*..*F)
    stability: Tuple[jnp.ndarray, ...]     # per level FOLDED (S, g0, g1*..*1)
    decoder: Any                           # shared decoder params
    sub_rot_corr: jnp.ndarray              # (S, 3)
    sub_trans_corr: jnp.ndarray            # (S, 3)
    Rws: jnp.ndarray                       # (S, 3, 3) initial submap poses
    tws: jnp.ndarray                       # (S, 3)
    kf_rot_corr: jnp.ndarray               # (S, K, 3)
    kf_trans_corr: jnp.ndarray             # (S, K, 3)
    Rsk: jnp.ndarray                       # (S, K, 3, 3) initial KF-in-submap
    tsk: jnp.ndarray                       # (S, K, 3)
    bounds: jnp.ndarray                    # (S, d, 2) local bounds
    sizes: Tuple[jnp.ndarray, ...]         # per level (S, d) logical grid sizes
    ignore_level: jnp.ndarray              # (L,)
    active: jnp.ndarray                    # (S,) float; inactive submaps excluded
    kf_to_submap: jnp.ndarray              # (S*K,) int32 (global kf -> submap)
    kf_to_local: jnp.ndarray               # (S*K,) int32 (global kf -> local id)
    # Static config.
    d: int = struct.field(pytree_node=False, default=3)
    fdim: int = struct.field(pytree_node=False, default=4)
    num_levels: int = struct.field(pytree_node=False, default=2)
    # Per-level PADDED spatial shapes of the folded storage.  Feature /
    # stability leaves are stored FOLDED -- (S, g0, g1*g2*F) -- because
    # rank-5 (S, g0, g1, g2, F) puts F=4 on the TPU lane axis: any
    # materialized tiled form (XLA's remat/compress pass makes them at
    # fusion scale) pads 4 -> 128 lanes, 34x memory; a capacity-16 NCD
    # atlas hit 4 x 5.9 GB copies of a 178 MB tensor.  Folded storage
    # tiles at ~1.07x.  Interp kernels take (spatial, fdim) explicitly
    # and only ever reshape(-1), so no relayout is introduced.
    pad_spatial: Tuple[Tuple[int, ...], ...] = struct.field(
        pytree_node=False, default=())
    cell_sizes: Tuple[float, ...] = struct.field(pytree_node=False, default=())
    pos_invariant: bool = struct.field(pytree_node=False, default=True)
    decoder_fixed: bool = struct.field(pytree_node=False, default=True)
    # Slot-loop shape for atlas-wide queries: "scan" keeps the GRADIENT
    # program flat in capacity (the unrolled backward compiled O(S):
    # 368 s for the S=3 fusion step on the TPU compiler); "unroll" is
    # for forward-only consumers (meshing) where nesting the slot scan
    # inside the lattice scan blew the TPU compile up to ~350 s while
    # the unrolled forward compiles in ~35 s.  utils.sdf.extract_fields
    # switches to "unroll" automatically.
    slot_loop: str = struct.field(pytree_node=False, default="scan")

    @property
    def num_submaps(self) -> int:
        return self.Rws.shape[0]

    @property
    def max_kfs_per_submap(self) -> int:
        return self.Rsk.shape[1]

    # -- submap poses (grid_atlas.py:238-268) ------------------------------
    def updated_submap_poses(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        R = jnp.matmul(self.Rws, se3.so3_exp(self.sub_rot_corr), precision=_HI)
        return R, self.tws + self.sub_trans_corr

    def updated_submap_pose(self, s) -> Tuple[jnp.ndarray, jnp.ndarray]:
        R, t = self.updated_submap_poses()
        return R[s], t[s]

    # -- keyframe poses (grid_atlas.py:270-328) ----------------------------
    def updated_kf_poses_in_submap(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(S, K, 3, 3), (S, K, 3): corrected KF poses in their submap."""
        R = jnp.matmul(self.Rsk, se3.so3_exp(self.kf_rot_corr), precision=_HI)
        return R, self.tsk + self.kf_trans_corr

    def updated_kf_poses_in_world(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pose composition for every global KF slot, fully batched
        (replaces per-kf accessors grid_atlas.py:316-328).

        Returns (S*K, 3, 3), (S*K, 3) indexed by global kf id.

        Host (eager) callers -- submap spawn, trajectory eval,
        global_bound -- are routed through ONE module jit: evaluated
        eagerly this is ~15 one-op dispatches whose executables compile
        lazily, and a first-time eager compile in an aged SLAM process
        costs seconds EACH (85 s of the first submap spawn went to
        exactly this chain; CLAUDE.md rule 7).
        """
        if not isinstance(self.Rws, jax.core.Tracer):
            global _jit_kf_poses_world
            if "_jit_kf_poses_world" not in globals():
                _jit_kf_poses_world = jax.jit(
                    lambda p: p.updated_kf_poses_in_world())
            return _jit_kf_poses_world(self)
        R_sk, t_sk = self.updated_kf_poses_in_submap()
        R_ws, t_ws = self.updated_submap_poses()
        sub = self.kf_to_submap
        loc = self.kf_to_local
        Rk = R_sk[sub, loc]                   # (G, 3, 3)
        tk = t_sk[sub, loc]                   # (G, 3)
        Rw = R_ws[sub]
        tw = t_ws[sub]
        R = jnp.matmul(Rw, Rk, precision=_HI)
        t = jnp.einsum("gij,gj->gi", Rw, tk, precision=_HI) + tw
        return R, t

    def updated_kf_pose_in_world(self, kf_id) -> Tuple[jnp.ndarray, jnp.ndarray]:
        R, t = self.updated_kf_poses_in_world()
        return R[kf_id], t[kf_id]

    # -- forward (grid_atlas.py:374-399) -----------------------------------
    def query_feature(self, x_world: jnp.ndarray) -> jnp.ndarray:
        """Masked average of per-submap features for points in bound.

        Unrolled masked accumulation over capacity slots; the decoder is
        applied by __call__.  Points outside every submap get zero
        features (reference sets sum_weights==0 -> 1).

        Slot-loop shape: lax.scan over the stacked slot axis, not a
        Python unroll and not vmap.  Each scan iteration is one slot's
        row gather in the fast layout (vmapping the F-folded flat-index
        gather compiled 180 s+ and ran 5x slower per element on v5e);
        the scan keeps the GRADIENT program size flat in capacity --
        the unrolled form's backward compiled O(S): 20.3 s at S=10 vs
        5.9 s scanned (CPU XLA; the TPU compiler amplified this to 368 s
        for the S=3 fusion step).
        """
        mask, f = self._scan_slots(self.features, self.ignore_level,
                                   self.fdim, x_world)
        return f

    def query_stability(self, x_world: jnp.ndarray) -> jnp.ndarray:
        """Masked average of per-submap stability (mu) fields -- the
        atlas-level observedness signal (used e.g. by
        utils.sdf.observed_sdf_query for masked meshing).  Same scanned
        row-gather accumulation as query_feature."""
        mask, mu = self._scan_slots(self.stability, None, 1, x_world)
        return mu

    def _scan_slots(self, tables, ignore_level, fdim, x_world):
        """Masked-average accumulation over submap slots: ONE lax.scan
        (slot_loop="scan") or a Python unroll (slot_loop="unroll"; see
        the slot_loop field for when each wins).

        Returns (sum_weights (N,), averaged values (N, F))."""
        R_ws, t_ws = self.updated_submap_poses()
        N = x_world.shape[0]
        F = fdim * self.num_levels

        def slot_term(feats, Rs, ts, bnd, szs, act):
            xs = se3.transform_points_from(x_world, Rs, ts)
            m = se3.coords_in_bound(xs, bnd)[:, 0] * act          # (N,)
            f = _interp_levels_sized(feats, xs, bnd, szs, ignore_level,
                                     self.pad_spatial, fdim)      # (N, F)
            return m, m[:, None] * f

        if self.slot_loop == "unroll":
            acc = jnp.zeros((N, F), x_world.dtype)
            sum_w = jnp.zeros((N,), x_world.dtype)
            for s in range(self.Rws.shape[0]):
                m, mf = slot_term(tuple(lv[s] for lv in tables),
                                  R_ws[s], t_ws[s], self.bounds[s],
                                  tuple(sz[s] for sz in self.sizes),
                                  self.active[s])
                acc = acc + mf
                sum_w = sum_w + m
        else:
            def body(carry, slot):
                acc, sw = carry
                feats, Rs, ts, bnd, szs, act = slot
                m, mf = slot_term(feats, Rs, ts, bnd, szs, act)
                return (acc + mf, sw + m), None

            init = (jnp.zeros((N, F), x_world.dtype),
                    jnp.zeros((N,), x_world.dtype))
            slots = (tables, R_ws, t_ws, self.bounds, self.sizes,
                     self.active)
            (acc, sum_w), _ = jax.lax.scan(body, init, slots)
        sum_w = jnp.where(sum_w == 0, 1.0, sum_w)
        return sum_w, acc / sum_w[:, None]

    def __call__(self, x_world: jnp.ndarray) -> jnp.ndarray:
        feats = self.query_feature(x_world)
        decoder = self.decoder
        if decoder is not None and self.decoder_fixed:
            decoder = jax.lax.stop_gradient(decoder)
        return interp.grid_decode(feats, x_world, decoder, self.pos_invariant)

    forward = __call__

    # -- size-aware single-submap queries -----------------------------------
    # Feature storage is padded to the max grid shape per level; these
    # interpolate slot s with its *logical* sizes so padded rows never
    # read as real features (cf. the reference's per-submap GridNets,
    # grid_atlas.py:374-399).  Used by the per-submap losses
    # (losses/fusion.py, losses/isdf_loss.py).
    def query_feature_submap(self, s, x_submap: jnp.ndarray) -> jnp.ndarray:
        feats = tuple(f[s] for f in self.features)
        sizes = tuple(sz[s] for sz in self.sizes)
        return _interp_levels_sized(feats, x_submap, self.bounds[s], sizes,
                                    self.ignore_level, self.pad_spatial,
                                    self.fdim)

    def query_stability_submap(self, s, x_submap: jnp.ndarray) -> jnp.ndarray:
        stabs = tuple(st[s] for st in self.stability)
        sizes = tuple(sz[s] for sz in self.sizes)
        return _interp_levels_sized(stabs, x_submap, self.bounds[s], sizes, None,
                                    self.pad_spatial, 1)

    def forward_submap(self, s, x_submap: jnp.ndarray) -> jnp.ndarray:
        """Decode submap s's field at submap-frame coords."""
        feats = self.query_feature_submap(s, x_submap)
        decoder = self.decoder
        if decoder is not None and self.decoder_fixed:
            decoder = jax.lax.stop_gradient(decoder)
        return interp.grid_decode(feats, x_submap, decoder, self.pos_invariant)

    # -- per-point submap queries ------------------------------------------
    # Each point interpolates ONLY its own submap's grid: one gather over
    # the stacked storage, O(N) compute regardless of S.  The per-submap
    # losses use these instead of looping submaps (losses/fusion.py,
    # losses/isdf_loss.py); compile time and FLOPs stay flat in the
    # number of submaps.
    def query_feature_per_point(self, sub_ids, x_submap: jnp.ndarray) -> jnp.ndarray:
        outs = []
        for level in range(self.num_levels):
            f = interp.grid_interpolate_per_point(
                self.features[level], sub_ids, x_submap, self.bounds,
                self.sizes[level], self.pad_spatial[level], self.fdim)
            f = f * (1.0 - self.ignore_level[level].astype(f.dtype))
            outs.append(f)
        return jnp.concatenate(outs, axis=-1)

    def query_stability_per_point(self, sub_ids, x_submap: jnp.ndarray) -> jnp.ndarray:
        outs = []
        for level in range(self.num_levels):
            outs.append(interp.grid_interpolate_per_point(
                self.stability[level], sub_ids, x_submap, self.bounds,
                self.sizes[level], self.pad_spatial[level], 1))
        return jnp.concatenate(outs, axis=-1)

    def forward_per_point(self, sub_ids, x_submap: jnp.ndarray) -> jnp.ndarray:
        """Decode each point against its own submap's field."""
        feats = self.query_feature_per_point(sub_ids, x_submap)
        decoder = self.decoder
        if decoder is not None and self.decoder_fixed:
            decoder = jax.lax.stop_gradient(decoder)
        return interp.grid_decode(feats, x_submap, decoder, self.pos_invariant)

    # -- submap views ------------------------------------------------------
    def submap(self, s: int, shapes: Optional[Sequence[Tuple[int, ...]]] = None,
               anchor_kf: int = 0) -> GridNet:
        """Extract submap s as a standalone GridNet (shared decoder).

        ``shapes``: optional per-level logical shapes to strip padding.
        KF poses in the GridNet are the submap-frame poses; 'world' for a
        single submap means 'submap frame' (the reference's Tracker /
        Mapper operate on the current submap's GridNet the same way).
        """
        feats, stabs = _read_submap(self.features, self.stability, s,
                                    shapes, self.pad_spatial, self.fdim)
        return GridNet(
            features=feats,
            stability=stabs,
            decoder=self.decoder,
            rot_corr=self.kf_rot_corr[s],
            trans_corr=self.kf_trans_corr[s],
            Rwk=self.Rsk[s],
            twk=self.tsk[s],
            bound=self.bounds[s],
            ignore_level=self.ignore_level,
            d=self.d,
            fdim=self.fdim,
            num_levels=self.num_levels,
            cell_sizes=self.cell_sizes,
            pos_invariant=self.pos_invariant,
            decoder_fixed=self.decoder_fixed,
            optimize_pose=True,
            anchor_kf=jnp.asarray(anchor_kf, jnp.int32),
        )

    def with_submap(self, s: int, grid: GridNet,
                    shapes: Optional[Sequence[Tuple[int, ...]]] = None
                    ) -> "GridAtlasParams":
        """Write a (possibly trained) GridNet back into slot s (one
        jitted dispatch; the per-frame SLAM sync path)."""
        feats, stabs, kf_rc, kf_tc, Rsk, tsk = _write_submap(
            self.features, self.stability, self.kf_rot_corr,
            self.kf_trans_corr, self.Rsk, self.tsk, s,
            grid.features, grid.stability, grid.rot_corr, grid.trans_corr,
            grid.Rwk, grid.twk, self.pad_spatial)
        return self.replace(
            features=feats,
            stability=stabs,
            decoder=grid.decoder,
            kf_rot_corr=kf_rc,
            kf_trans_corr=kf_tc,
            Rsk=Rsk,
            tsk=tsk,
        )

    # -- capacity trimming (fuse-time) --------------------------------------
    def trim(self, S_live: int) -> "GridAtlasParams":
        """Slice storage to the first ``S_live`` submap slots.

        Dead capacity slots cost full gather/scatter work in the
        atlas-wide fusion loss (a capacity-16 atlas with 10 live submaps
        does 60% extra work); fuse() trims, optimizes, and scatters
        back.  Valid because submaps fill slots in order and global kf
        ids are sequential, so every live kf id < S_live * K.

        The result NEVER aliases this pytree's buffers: consumers donate
        the trimmed pytree (the pooled fuse step), and jax full-range
        slices (and the untouched decoder / ignore_level leaves) return
        the SAME buffer -- donating an aliased leaf deletes storage the
        atlas still references ("Array has been deleted" at the next
        atlas read).  The whole sliced tree is therefore passed through
        one jitted copy (one dispatch, one executable).
        """
        K = self.max_kfs_per_submap
        global _jit_tree_copy
        if "_jit_tree_copy" not in globals():
            _jit_tree_copy = jax.jit(
                lambda t: jax.tree_util.tree_map(lambda a: a + 0, t))
        return _jit_tree_copy(self.replace(
            features=tuple(f[:S_live] for f in self.features),
            stability=tuple(st[:S_live] for st in self.stability),
            sub_rot_corr=self.sub_rot_corr[:S_live],
            sub_trans_corr=self.sub_trans_corr[:S_live],
            Rws=self.Rws[:S_live], tws=self.tws[:S_live],
            kf_rot_corr=self.kf_rot_corr[:S_live],
            kf_trans_corr=self.kf_trans_corr[:S_live],
            Rsk=self.Rsk[:S_live], tsk=self.tsk[:S_live],
            bounds=self.bounds[:S_live],
            sizes=tuple(sz[:S_live] for sz in self.sizes),
            active=self.active[:S_live],
            kf_to_submap=self.kf_to_submap[:S_live * K],
            kf_to_local=self.kf_to_local[:S_live * K],
        ))

    def scatter_trimmed(self, t: "GridAtlasParams") -> "GridAtlasParams":
        """Write a :meth:`trim`-derived params back into this
        full-capacity storage (inverse of trim for the live rows)."""
        S_live = t.Rws.shape[0]
        K = self.max_kfs_per_submap
        return self.replace(
            features=tuple(f.at[:S_live].set(tf)
                           for f, tf in zip(self.features, t.features)),
            stability=tuple(s_.at[:S_live].set(ts)
                            for s_, ts in zip(self.stability, t.stability)),
            decoder=t.decoder,
            sub_rot_corr=self.sub_rot_corr.at[:S_live].set(t.sub_rot_corr),
            sub_trans_corr=self.sub_trans_corr.at[:S_live].set(t.sub_trans_corr),
            Rws=self.Rws.at[:S_live].set(t.Rws),
            tws=self.tws.at[:S_live].set(t.tws),
            kf_rot_corr=self.kf_rot_corr.at[:S_live].set(t.kf_rot_corr),
            kf_trans_corr=self.kf_trans_corr.at[:S_live].set(t.kf_trans_corr),
            Rsk=self.Rsk.at[:S_live].set(t.Rsk),
            tsk=self.tsk.at[:S_live].set(t.tsk),
            kf_to_submap=self.kf_to_submap.at[:S_live * K].set(t.kf_to_submap),
            kf_to_local=self.kf_to_local.at[:S_live * K].set(t.kf_to_local),
        )

    def with_submap_poses(self, s: int, grid: GridNet) -> "GridAtlasParams":
        """Write only slot s's KF pose state back (see
        ``_write_submap_poses``)."""
        kf_rc, kf_tc, Rsk, tsk = _write_submap_poses(
            self.kf_rot_corr, self.kf_trans_corr, self.Rsk, self.tsk,
            jnp.asarray(s), grid.rot_corr, grid.trans_corr,
            grid.Rwk, grid.twk)
        return self.replace(kf_rot_corr=kf_rc, kf_trans_corr=kf_tc,
                            Rsk=Rsk, tsk=tsk)


def _interp_levels_sized(feats, x, bound, sizes, ignore_level,
                         spatial=None, fdim=None):
    outs = []
    for level, g in enumerate(feats):
        f = interp.grid_interpolate(
            g, x, bound, size=sizes[level],
            spatial=None if spatial is None else spatial[level], fdim=fdim)
        if ignore_level is not None:
            f = f * (1.0 - ignore_level[level])
        outs.append(f)
    return jnp.concatenate(outs, axis=-1)


@functools.lru_cache(maxsize=1)
def _consolidate_chunk_fn():
    """Jitted fixed-shape chunk query for atlas consolidation: the
    masked-average feature + stability fields at arbitrary world points
    (one executable per (chunk, atlas structure); see
    GridAtlas.consolidated_grid)."""
    @jax.jit
    def consolidate_chunk(params, pts):
        return params.query_feature(pts), params.query_stability(pts)

    return consolidate_chunk


# ---------------------------------------------------------------------------
# Host wrapper with SLAM bookkeeping.
# ---------------------------------------------------------------------------

class GridAtlas:
    """Host-side atlas: pytree + bookkeeping (reference grid_atlas.py).

    Keyframes and submaps are created sequentially; the first KF of each
    submap is its anchor (grid_atlas.py:19-26).
    """

    def __init__(self, cfg_model: Dict, max_kfs_per_submap: int = 1,
                 dtype=jnp.float32, capacity: Optional[int] = None):
        """``capacity``: preallocate this many submap SLOTS so add_submap
        is a shape-stable slot write (no re-stack/re-upload of every
        grid).  Slots beyond the live count are masked inactive.  When
        exceeded, storage grows geometrically (2x).  None (default)
        keeps exact-size storage (realloc per add)."""
        self.cfg_model = copy.deepcopy(cfg_model)
        self.dtype = dtype
        self.max_kfs = int(max_kfs_per_submap)
        self.capacity = int(capacity) if capacity else None
        self.params: Optional[GridAtlasParams] = None
        self._submap_shapes: List[List[Tuple[int, ...]]] = []  # [submap][level]
        self._anchor_kf: List[int] = []
        self._kf_to_submap: List[int] = []
        self.curr_submap_id = -1
        self.curr_kf_id = -1

    # -- properties --------------------------------------------------------
    @property
    def num_submaps(self) -> int:
        return len(self._anchor_kf)

    @property
    def num_keyframes(self) -> int:
        return self.curr_kf_id + 1

    @property
    def num_levels(self) -> int:
        return int(self.cfg_model["grid"]["n_levels"])

    def anchor_kf_for_submap(self, s: int) -> int:
        return self._anchor_kf[s]

    def submap_id_for_kf(self, kf_id: int) -> int:
        return self._kf_to_submap[kf_id]

    def num_keyframes_in_submap(self, s: int) -> int:
        return sum(1 for x in self._kf_to_submap if x == s)

    def submap_shapes(self, s: int) -> List[Tuple[int, ...]]:
        return self._submap_shapes[s]

    # -- construction (grid_atlas.py:96-169) -------------------------------
    def add_submap(self, local_bound, Rws=None, tws=None, num_poses: Optional[int] = None):
        """Append a new submap with the given local bound and world pose."""
        bound_np = np.asarray(local_bound, np.float32)
        K = int(num_poses if num_poses is not None else self.max_kfs)
        K = max(K, self.max_kfs)
        self.max_kfs = K
        Rws = np.eye(3, dtype=np.float32) if Rws is None else np.asarray(Rws, np.float32)
        tws = np.zeros(3, np.float32) if tws is None else np.asarray(tws, np.float32).reshape(3)
        grid_cfg = self.cfg_model["grid"]
        shapes = []
        for level in range(self.num_levels):
            cell = float(grid_cfg["base_cell_size"]) / float(grid_cfg["per_level_scale"]) ** level
            shapes.append(interp.grid_shape_for_bound(bound_np, cell, 3))
        self._submap_shapes.append(shapes)
        anchor = self.curr_kf_id + 1
        self._anchor_kf.append(anchor)
        self.curr_submap_id = self.num_submaps - 1
        if self._can_insert_in_place(shapes, K):
            self._insert_submap_slot(bound_np, Rws, tws, shapes)
        else:
            self._rebuild_params(new_bound=bound_np, new_Rws=Rws, new_tws=tws)

    def _can_insert_in_place(self, shapes, K: int) -> bool:
        """True when the new submap fits the preallocated storage: a free
        slot exists, the KF axis is unchanged, and the padded grid shapes
        cover the new submap's logical shapes."""
        p = self.params
        if p is None or self.capacity is None:
            return False
        if self.num_submaps > p.Rws.shape[0]:
            return False
        if K > p.Rsk.shape[1]:
            return False
        for level in range(self.num_levels):
            pad = p.pad_spatial[level]
            if any(shapes[level][k] > pad[k] for k in range(len(pad))):
                return False
        return True

    def _insert_submap_slot(self, bound_np, Rws, tws, shapes):
        """Shape-stable slot write: O(slot) updates, grids untouched
        (their slot rows are already zero-initialized)."""
        s = self.curr_submap_id
        p = self.params
        sizes = list(p.sizes)
        for level in range(self.num_levels):
            sizes[level] = sizes[level].at[s].set(
                jnp.asarray(shapes[level], jnp.int32))
        self.params = p.replace(
            bounds=p.bounds.at[s].set(jnp.asarray(bound_np)),
            Rws=p.Rws.at[s].set(jnp.asarray(Rws)),
            tws=p.tws.at[s].set(jnp.asarray(tws)),
            sub_rot_corr=p.sub_rot_corr.at[s].set(0.0),
            sub_trans_corr=p.sub_trans_corr.at[s].set(0.0),
            active=p.active.at[s].set(1.0),
            sizes=tuple(sizes),
        )

    def _rebuild_params(self, new_bound, new_Rws, new_tws):
        """Re-stack arrays to include the new submap (host-side realloc).

        With ``capacity`` set, allocates spare submap slots (geometric 2x
        growth once exceeded) so subsequent add_submap calls are O(slot)
        in-place writes instead of full re-stacks."""
        S_live = self.num_submaps
        if self.capacity is None:
            S = S_live
        else:
            S = max(self.capacity, S_live)
            old_alloc = self.params.Rws.shape[0] if self.params is not None else 0
            if S_live > old_alloc > 0:
                S = max(S, 2 * old_alloc)
            self.capacity = S
        K = self.max_kfs
        L = self.num_levels
        fdim = int(self.cfg_model["grid"]["feature_dim"])
        d = 3
        # Padded storage shapes per level = max over submaps.
        pad_shapes = []
        for level in range(L):
            pad_shapes.append(tuple(
                max(sh[level][k] for sh in self._submap_shapes) for k in range(d)))
        old = self.params

        name = self.cfg_model["grid"].get("feature_dtype", "float32")
        if name == "bfloat16":
            import ml_dtypes
            feat_dtype = np.dtype(ml_dtypes.bfloat16)
        else:
            feat_dtype = np.dtype(name)
        # Storage is FOLDED per level -- (S, g0, g1*g2*F) -- see the
        # pad_spatial field comment for the 34x lane-padding failure the
        # rank-5 layout caused.  All host-side copies unfold via free
        # numpy reshapes.
        def fold(a):
            return a.reshape(a.shape[0], a.shape[1], -1)

        features, stability, sizes = [], [], []
        for level in range(L):
            f = np.zeros((S, *pad_shapes[level], fdim), feat_dtype)
            st = np.zeros((S, *pad_shapes[level], 1), feat_dtype)
            # Spare slots get size 1 (a safe placeholder: inactive slots
            # must still interpolate to finite values before the active
            # mask zeroes them).
            sz = np.ones((S, d), np.int32)
            for s in range(S_live):
                sz[s] = self._submap_shapes[s][level]
            if old is not None:
                opad = old.pad_spatial[level]
                of = np.asarray(old.features[level]).astype(feat_dtype) \
                    .reshape(-1, *opad, fdim)
                ost = np.asarray(old.stability[level]).astype(feat_dtype) \
                    .reshape(-1, *opad, 1)
                sl = (slice(0, of.shape[0]),) + tuple(slice(0, n) for n in of.shape[1:])
                f[sl] = of
                st[(slice(0, ost.shape[0]),) + tuple(slice(0, n) for n in ost.shape[1:])] = ost
            features.append(jnp.asarray(fold(f)))
            stability.append(jnp.asarray(fold(st)))
            sizes.append(jnp.asarray(sz))

        def grow(old_arr, new_shape, fill=0.0):
            out = np.full(new_shape, fill, np.float32)
            if old_arr is not None:
                oa = np.asarray(old_arr)
                out[tuple(slice(0, n) for n in oa.shape)] = oa
            return out

        eye = np.broadcast_to(np.eye(3, dtype=np.float32), (S, K, 3, 3)).copy()
        Rws = np.broadcast_to(np.eye(3, dtype=np.float32), (S, 3, 3)).copy()
        if old is not None:
            Rws[: old.Rws.shape[0]] = np.asarray(old.Rws)
        Rws[S_live - 1] = new_Rws
        Rsk = eye
        if old is not None:
            oR = np.asarray(old.Rsk)
            oldK = oR.shape[1]
            Rsk[: oR.shape[0], :oldK] = oR
        tws = grow(old.tws if old else None, (S, 3))
        tws[S_live - 1] = new_tws
        # Spare slots get a unit bound (nonzero extent: zero-width bounds
        # divide by zero in index_coords and the resulting NaNs would
        # poison the active-masked sums).
        bounds = np.tile(np.array([[0.0, 1.0]], np.float32), (S, d, 1))
        if old is not None:
            bounds[: old.bounds.shape[0]] = np.asarray(old.bounds)
        bounds[S_live - 1] = new_bound
        kf_map = np.zeros((S * K,), np.int32)
        kf_loc = np.zeros((S * K,), np.int32)
        for kf, sub in enumerate(self._kf_to_submap):
            kf_map[kf] = sub
            kf_loc[kf] = kf - self._anchor_kf[sub]

        dcfg = self.cfg_model.get("decoder", {"type": "none"})
        if getattr(self, "_pinned_decoder", None) is not None:
            decoder = self._pinned_decoder
        elif old is not None:
            decoder = old.decoder
        else:
            tmp = create_grid_net(jax.random.PRNGKey(0), self.cfg_model,
                                  bound=new_bound, num_poses=1)
            decoder = tmp.decoder

        grid_cfg = self.cfg_model["grid"]
        cell_sizes = tuple(
            float(grid_cfg["base_cell_size"]) / float(grid_cfg["per_level_scale"]) ** l
            for l in range(L))
        self.params = GridAtlasParams(
            features=tuple(features),
            stability=tuple(stability),
            pad_spatial=tuple(tuple(int(v) for v in sh) for sh in pad_shapes),
            decoder=decoder,
            sub_rot_corr=jnp.asarray(grow(old.sub_rot_corr if old else None, (S, 3))),
            sub_trans_corr=jnp.asarray(grow(old.sub_trans_corr if old else None, (S, 3))),
            Rws=jnp.asarray(Rws),
            tws=jnp.asarray(tws),
            kf_rot_corr=jnp.asarray(grow(old.kf_rot_corr if old else None, (S, K, 3))),
            kf_trans_corr=jnp.asarray(grow(old.kf_trans_corr if old else None, (S, K, 3))),
            Rsk=jnp.asarray(Rsk),
            tsk=jnp.asarray(grow(old.tsk if old else None, (S, K, 3))),
            bounds=jnp.asarray(bounds),
            sizes=tuple(sizes),
            ignore_level=jnp.zeros((L,), jnp.float32),
            active=jnp.asarray((np.arange(S) < S_live).astype(np.float32)),
            kf_to_submap=jnp.asarray(kf_map),
            kf_to_local=jnp.asarray(kf_loc),
            d=d,
            fdim=fdim,
            num_levels=L,
            cell_sizes=cell_sizes,
            pos_invariant=bool(dcfg.get("pos_invariant", True)),
            decoder_fixed=bool(dcfg.get("fix", True)),
        )

    def add_kf(self, Rsk=None, tsk=None) -> int:
        """Add a keyframe to the current submap (grid_atlas.py:96-115)."""
        assert self.curr_submap_id >= 0, "Create a submap first."
        s = self.curr_submap_id
        kf_global = self.curr_kf_id + 1
        kf_local = kf_global - self._anchor_kf[s]
        assert kf_local < self.max_kfs, (
            f"Submap {s} exceeded max_kfs_per_submap={self.max_kfs}")
        self._kf_to_submap.append(s)
        Rsk = np.eye(3, dtype=np.float32) if Rsk is None else np.asarray(Rsk, np.float32)
        tsk = np.zeros(3, np.float32) if tsk is None else np.asarray(tsk, np.float32).reshape(3)
        p = self.params
        (Rsk_n, tsk_n, rc, tc, kmap, kloc) = _jit_add_kf(
            p.Rsk, p.tsk, p.kf_rot_corr, p.kf_trans_corr,
            p.kf_to_submap, p.kf_to_local,
            jnp.asarray(s), jnp.asarray(kf_local), jnp.asarray(kf_global),
            jnp.asarray(Rsk), jnp.asarray(tsk))
        self.params = p.replace(Rsk=Rsk_n, tsk=tsk_n, kf_rot_corr=rc,
                                kf_trans_corr=tc, kf_to_submap=kmap,
                                kf_to_local=kloc)
        self.curr_kf_id = kf_global
        return kf_global

    def set_kf_pose(self, kf_id: int, Rsk, tsk):
        s = self.submap_id_for_kf(kf_id)
        loc = kf_id - self._anchor_kf[s]
        p = self.params
        self.params = p.replace(
            Rsk=p.Rsk.at[s, loc].set(jnp.asarray(Rsk)),
            tsk=p.tsk.at[s, loc].set(jnp.asarray(tsk).reshape(3)),
            kf_rot_corr=p.kf_rot_corr.at[s, loc].set(0.0),
            kf_trans_corr=p.kf_trans_corr.at[s, loc].set(0.0),
        )

    def set_submap_pose(self, s: int, Rws, tws):
        p = self.params
        self.params = p.replace(
            Rws=p.Rws.at[s].set(jnp.asarray(Rws)),
            tws=p.tws.at[s].set(jnp.asarray(tws).reshape(3)),
            sub_rot_corr=p.sub_rot_corr.at[s].set(0.0),
            sub_trans_corr=p.sub_trans_corr.at[s].set(0.0),
        )

    def set_submap_pose_correction(self, s: int, dr, dt):
        p = self.params
        self.params = p.replace(
            sub_rot_corr=p.sub_rot_corr.at[s].set(jnp.asarray(dr).reshape(3)),
            sub_trans_corr=p.sub_trans_corr.at[s].set(jnp.asarray(dt).reshape(3)),
        )

    def set_decoder(self, decoder, fixed: Optional[bool] = None):
        """Install a (pretrained) shared decoder; persists across future
        add_submap rebuilds.  ``fixed`` optionally freezes it
        (cfg decoder.fix)."""
        self._pinned_decoder = decoder
        if fixed is not None:
            self.cfg_model.setdefault("decoder", {})["fix"] = bool(fixed)
        if self.params is not None:
            kw = {"decoder": decoder}
            if fixed is not None:
                kw["decoder_fixed"] = bool(fixed)
            self.params = self.params.replace(**kw)

    # -- views -------------------------------------------------------------
    def get_submap(self, s: int) -> GridNet:
        return self.params.submap(s, self._submap_shapes[s], self._anchor_kf[s])

    def set_submap(self, s: int, grid: GridNet):
        self.params = self.params.with_submap(s, grid, self._submap_shapes[s])

    def set_submap_poses(self, s: int, grid: GridNet):
        self.params = self.params.with_submap_poses(s, grid)

    def global_bound(self) -> np.ndarray:
        """World AABB over transformed submap corners (grid_atlas.py:330-356)."""
        R, t = self.params.updated_submap_poses()
        R = np.asarray(R)
        t = np.asarray(t)
        corners_all = []
        for s in range(self.num_submaps):
            b = np.asarray(self.params.bounds[s])
            corners = np.array([[b[0, i], b[1, j], b[2, k]]
                                for i in range(2) for j in range(2) for k in range(2)],
                               np.float32)
            corners_all.append(corners @ R[s].T + t[s])
        corners_all = np.concatenate(corners_all)
        return np.stack([corners_all.min(0), corners_all.max(0)], axis=1)

    def consolidated_grid(self, chunk: int = 1 << 18,
                          structural_only: bool = False,
                          bound=None) -> GridNet:
        """Resample the atlas's masked-average field onto ONE world-frame
        GridNet (fuse-then-mesh).

        The atlas forward is decode(masked-avg of per-submap trilinear
        features) (``_scan_slots``).  Because trilinear interpolation is
        linear in the tables and every grid here uses the same
        cell-center node convention (ops/interp.py:323-338), a fused
        grid whose node features are the TRUE atlas feature field
        sampled at its own nodes reproduces the atlas field EXACTLY
        wherever submap poses are identity, and to O(cell * pose-delta)
        under the cm-scale pose corrections of a fused SLAM run.

        Why: meshing the raw atlas evaluates every lattice point against
        every live submap -- at 512^3 over a capacity-10 co-located
        (world-bound) atlas that is 1.3e9 point-slot queries, and a
        single watchdog-safe scan dispatch of it was measured to
        hard-fault the TPU worker.  Consolidation pays ~2.3M point-slot
        queries once, then meshes a single GridNet (134M single-model
        queries), ~10x less total work and entirely on the small,
        well-exercised GridNet executables.  (The reference meshes its
        atlas directly -- grid_atlas.py:330-356 + utils_sdf.py:69-86 --
        but its per-submap ModuleList pays the same S-fold cost.)

        Chunked: one jitted fixed-shape chunk query per dispatch, each
        ~chunk*S point-slot units, far under the ~100 s dispatch
        watchdog (CLAUDE.md rule 6).

        ``structural_only``: return a zero-feature GridNet of the same
        shapes without querying the device -- for prewarming the meshing
        executable at init (utils/sdf.prewarm_extract_fields).

        ``bound``: override the world bound.  Pass the same (padded)
        bound at prewarm and at the end of a run so the fused grid
        SHAPES -- and with them every meshing executable -- are stable
        under the cm-scale pose drift that global_bound() picks up."""
        p = self.params
        bound_w = np.asarray(bound, np.float32) if bound is not None \
            else self.global_bound()
        grid_cfg = self.cfg_model["grid"]
        base_cell = float(grid_cfg["base_cell_size"])
        scale = float(grid_cfg["per_level_scale"])

        feats, stabs, cells = [], [], []
        fdim = p.fdim
        for level in range(self.num_levels):
            cell = base_cell / scale ** level
            cells.append(cell)
            shape = interp.grid_shape_for_bound(bound_w, cell, 3)
            if structural_only:
                feats.append(jnp.zeros((*shape, fdim),
                                       p.features[level].dtype))
                stabs.append(jnp.zeros((*shape, 1),
                                       p.stability[level].dtype))
                continue
            axes = [bound_w[k, 0] + (np.arange(shape[k]) + 0.5)
                    * (bound_w[k, 1] - bound_w[k, 0]) / shape[k]
                    for k in range(3)]
            verts = np.stack(np.meshgrid(*axes, indexing="ij"),
                             axis=-1).reshape(-1, 3).astype(np.float32)
            nv = verts.shape[0]
            n_chunks = -(-nv // chunk)
            pad = n_chunks * chunk - nv
            if pad:
                # Out-of-bound pad rows: zero weight in every slot, the
                # results are sliced off below.
                verts = np.concatenate(
                    [verts, np.full((pad, 3), 1e30, np.float32)])
            f_parts, s_parts = [], []
            for c in range(n_chunks):
                f, s = _consolidate_chunk_fn()(
                    p, jnp.asarray(verts[c * chunk:(c + 1) * chunk]))
                f_parts.append(np.asarray(
                    f[:, level * fdim:(level + 1) * fdim]))
                s_parts.append(np.asarray(s[:, level:level + 1]))
            f_np = np.concatenate(f_parts)[:nv]
            s_np = np.concatenate(s_parts)[:nv]
            dtype = p.features[level].dtype
            feats.append(jnp.asarray(
                f_np.reshape(*shape, fdim).astype(dtype)))
            stabs.append(jnp.asarray(
                s_np.reshape(*shape, 1).astype(p.stability[level].dtype)))
        return GridNet(
            features=tuple(feats),
            stability=tuple(stabs),
            decoder=p.decoder,
            rot_corr=jnp.zeros((1, 3), jnp.float32),
            trans_corr=jnp.zeros((1, 3), jnp.float32),
            Rwk=jnp.eye(3, dtype=jnp.float32)[None],
            twk=jnp.zeros((1, 3), jnp.float32),
            bound=jnp.asarray(bound_w, jnp.float32),
            ignore_level=p.ignore_level,
            d=p.d,
            fdim=fdim,
            num_levels=self.num_levels,
            cell_sizes=tuple(cells),
            pos_invariant=p.pos_invariant,
            decoder_fixed=True,
            optimize_pose=False,
        )

    def prewarm_consolidated_query(self, chunk: int = 1 << 18):
        """AOT-compile the consolidation chunk query (compile only; see
        prewarm_extract_fields for why nothing may execute here)."""
        pts = jax.ShapeDtypeStruct((chunk, 3), jnp.float32)
        _consolidate_chunk_fn().lower(self.params, pts).compile()

    def check_submap_intersection(self, src: int, dst: int, overlap_thresh=1e-2) -> bool:
        """Finest-level vertices of src tested against dst bound
        (grid_atlas.py:405-420).

        One jitted executable with TRACED pair indices: the eager
        op-by-op version cost ~120 s of first-call compiles on the axon
        tunnel (2.6M-vertex chains, one executable per op) and ran per
        pair -- it was the dominant hidden cost of the first Fuser.align
        (measured via the align stage timers, round 4)."""
        global _jit_submap_overlap
        if "_jit_submap_overlap" not in globals():
            @functools.partial(jax.jit, static_argnames=("shape",))
            def _jit_submap_overlap(params, src, dst, shape):
                verts = interp.vertex_positions(shape, params.bounds[src])
                R, t = params.updated_submap_poses()

                def _frac(v):
                    world = se3.transform_points_to(v, R[src], t[src])
                    local = se3.transform_points_from(world, R[dst], t[dst])
                    return jnp.sum(se3.coords_in_bound(local,
                                                       params.bounds[dst]))

                # Chunked like _jit_align_coords: one fused body over a
                # multi-million-vertex fine level hard-faults the TPU
                # worker (empirical ~1e6-point limit, CLAUDE.md).
                nv = verts.shape[0]
                ch = int(os.environ.get("MISO_ALIGN_COORD_CHUNK",
                                        str(1 << 19)))
                if nv > ch:
                    k = -(-nv // ch)
                    vpad = jnp.concatenate(
                        [verts, jnp.full((k * ch - nv, 3), 1e30,
                                         verts.dtype)])  # pad out of bound
                    hits = jnp.sum(jax.lax.map(_frac, vpad.reshape(k, ch, 3)))
                else:
                    hits = _frac(verts)
                return hits / nv
        shape = tuple(self._submap_shapes[src][-1])
        frac = _jit_submap_overlap(self.params, jnp.int32(src),
                                   jnp.int32(dst), shape)
        return float(frac) > overlap_thresh

    def precompute_coordinates_for_alignment(self, norm_thresh=1e-5,
                                             max_points: Optional[int] = None,
                                             seed: int = 0):
        """Per (submap, level): grid-vertex coords whose multi-level
        feature norm exceeds the threshold (grid_atlas.py:565-587).

        Returns dict[(s, level)] -> (coords (P, 3), valid (P, 1)) with P
        padded to a fixed per-level size so alignment batches have
        static shapes.

        With ``max_points`` set (the SLAM/Fuser path), P is ALWAYS
        min(max_points, level vertex count) -- a shape computable
        without looking at the data, so alignment executables can be
        prewarmed and never recompile across runs -- and the whole
        select-and-pad runs ON DEVICE (one jitted top-k per level
        shape): the previous host path pulled every vertex's feature to
        the host (~400 MB D2H per fine level at quad scale, ~130 s of
        the align stage).
        """
        out = {}
        p = self.params
        if max_points is None:
            # Exact-shape host path (small scenes / tests): P per level
            # = max over submaps of the valid-vertex count.
            for level in range(self.num_levels):
                per_submap = []
                for s in range(self.num_submaps):
                    shape = self._submap_shapes[s][level]
                    verts = interp.vertex_positions(shape, p.bounds[s])
                    feat = self.get_submap(s).query_feature(verts)
                    norm = np.asarray(jnp.linalg.norm(feat, axis=1))
                    per_submap.append(np.asarray(verts)[norm > norm_thresh])
                P = max(max((len(c) for c in per_submap), default=0), 1)
                for s, coords in enumerate(per_submap):
                    n = len(coords)
                    if n == 0:
                        padded = np.zeros((P, 3), np.float32)
                        valid = np.zeros((P, 1), np.float32)
                    else:
                        reps = int(np.ceil(P / n))
                        padded = np.tile(coords, (reps, 1))[:P]
                        valid = np.zeros((P, 1), np.float32)
                        valid[:n] = 1.0
                    out[(s, level)] = (jnp.asarray(padded.astype(np.float32)),
                                       jnp.asarray(valid))
            self._set_alignment_coords(out)
            return out

        _jit_align_coords = _get_jit_align_coords()
        key = jax.random.PRNGKey(seed)
        for level in range(self.num_levels):
            # One P per level (pair contexts stack submaps), independent
            # of the data: min(cap, largest submap's vertex count).
            P = self.alignment_points_per_level(max_points)[level]
            for s in range(self.num_submaps):
                shape = tuple(self._submap_shapes[s][level])
                key, sub = jax.random.split(key)
                out[(s, level)] = _jit_align_coords(
                    p, jnp.int32(s), sub, shape, P, float(norm_thresh))
        self._set_alignment_coords(out)
        return out

    def _set_alignment_coords(self, out):
        self._coords_for_alignment = out
        # Stacked per-level views (S, P, 3)/(S, P, 1): the pair-ctx
        # build gathers rows by pair src id in ONE jitted op instead of
        # one eager num_pairs-element stack per ctx (each eager op on
        # the tunnel costs ~0.1-0.2 s; see align/miso._jit_build_pair_ctx).
        self._coords_stacked = {
            level: (jnp.stack([out[(s, level)][0]
                               for s in range(self.num_submaps)]),
                    jnp.stack([out[(s, level)][1]
                               for s in range(self.num_submaps)]))
            for level in range(self.num_levels)}

    def alignment_coords_stacked(self, level: int):
        """(S, P, 3) coords + (S, P, 1) valid for one level."""
        return self._coords_stacked[level]

    def coordinates_for_alignment(self, s: int, level: int):
        return self._coords_for_alignment[(s, level)]

    def alignment_points_per_level(self, max_points: int):
        """Per-level alignment point count P: min(max_points, largest
        submap's vertex count) -- a pure SHAPE function (no data), so
        prewarms can build alignment contexts without executing."""
        return [max(min(max_points, max(
            int(np.prod(self._submap_shapes[s][level]))
            for s in range(self.num_submaps))), 1)
            for level in range(self.num_levels)]

    def prewarm_alignment_coords(self, max_points: int, norm_thresh=1e-5):
        """AOT-compile the per-level alignment-coords executables
        (lower().compile() -- zero device execution; see
        prewarm_extract_fields for why speculative execution at
        capacity scale is forbidden)."""
        fn = _get_jit_align_coords()
        p = self.params
        key = jax.random.PRNGKey(0)
        for level in range(self.num_levels):
            P = self.alignment_points_per_level(max_points)[level]
            shape = tuple(self._submap_shapes[0][level])
            fn.lower(p, jnp.int32(0), key, shape, P,
                     float(norm_thresh)).compile()


def _get_jit_align_coords():
    global _jit_align_coords_fn
    if "_jit_align_coords_fn" not in globals():
        from functools import partial

        @partial(jax.jit, static_argnames=("shape", "P", "thresh"))
        def _jit_align_coords(params, s, key, shape, P, thresh):
            verts = interp.vertex_positions(shape, params.bounds[s])
            # Chunk the feature-norm pass: a fine quad-scale level
            # is ~21M vertices, and one flat query's 8-corner
            # gather intermediate on top of a capacity-10 stacked
            # atlas hard-faults the TPU worker (HBM blowup; same
            # class as MISO_FLAT_ALIGN_CHUNK in align/miso.py).
            # The (Nv,) score stays flat -- only the gather-heavy
            # norm computation is scanned.
            nv = verts.shape[0]
            ch = int(os.environ.get("MISO_ALIGN_COORD_CHUNK",
                                    str(1 << 19)))
            if nv > ch:
                k = -(-nv // ch)
                vpad = jnp.concatenate(
                    [verts, jnp.zeros((k * ch - nv, 3), verts.dtype)])
                norm = jax.lax.map(
                    lambda v: jnp.linalg.norm(
                        params.query_feature_submap(s, v), axis=1),
                    vpad.reshape(k, ch, 3)).reshape(-1)[:nv]
            else:
                feat = params.query_feature_submap(s, verts)
                norm = jnp.linalg.norm(feat, axis=1)
            ok = (norm > thresh).astype(jnp.float32)
            # top-P by (valid, random) -> a random P-subset of the
            # valid vertices, padded with invalid rows when fewer.
            score = ok * (1.0 + jax.random.uniform(key, norm.shape))
            if verts.shape[0] < P:  # smaller submap in a mixed atlas
                pad = P - verts.shape[0]
                verts = jnp.concatenate(
                    [verts, jnp.zeros((pad, verts.shape[1]),
                                      verts.dtype)])
                score = jnp.concatenate(
                    [score, jnp.zeros((pad,), score.dtype)])
            _, idx = jax.lax.top_k(score, P)
            return verts[idx], (score[idx] >= 1.0)[:, None].astype(
                jnp.float32)

        globals()["_jit_align_coords_fn"] = _jit_align_coords
    return globals()["_jit_align_coords_fn"]


def grid_atlas_mask(params: GridAtlasParams,
                    features: bool = False,
                    stability: bool = False,
                    decoder: bool = False,
                    submap_pose: bool = False,
                    kf_pose: bool = False,
                    anchor_first_submap: bool = True,
                    feature_lr: float = 1.0,
                    submap_pose_lr: float = 1.0,
                    kf_pose_lr: float = 1.0,
                    level: Optional[int] = None) -> GridAtlasParams:
    """Trainability/LR mask for a GridAtlasParams pytree.

    Replaces the reference's lock_submap / lock_submap_pose /
    lock_keyframe_pose / params_for_* plumbing (grid_atlas.py:45-77,
    541-563).  ``anchor_first_submap`` reproduces 'submap 0 fixed at
    origin' (align/base.py:104-110).  ``level=l`` restricts feature /
    stability training to grid level l (coarse-to-fine phases;
    ``level >= num_levels`` or None means all levels).
    """
    def zeros(x):
        return jax.tree_util.tree_map(lambda _: jnp.asarray(0.0, jnp.float32), x)

    def fulls(x, v):
        return jax.tree_util.tree_map(lambda _: jnp.asarray(float(v), jnp.float32), x)

    S = params.num_submaps
    sub_mask = jnp.full((S, 1), float(submap_pose) * submap_pose_lr, jnp.float32)
    if anchor_first_submap and S > 0:
        sub_mask = sub_mask.at[0].set(0.0)
    kf_mask = jnp.asarray(float(kf_pose) * kf_pose_lr, jnp.float32)
    if level is not None and level < params.num_levels:
        lvl_sel = [1.0 if l == level else 0.0 for l in range(params.num_levels)]
    else:
        lvl_sel = [1.0] * params.num_levels
    return params.replace(
        features=tuple(jnp.asarray(float(features) * feature_lr * lvl_sel[l],
                                   jnp.float32)
                       for l in range(params.num_levels)),
        stability=tuple(jnp.asarray(float(stability) * feature_lr * lvl_sel[l],
                                    jnp.float32)
                        for l in range(params.num_levels)),
        decoder=(fulls(params.decoder, float(decoder)) if params.decoder is not None else None),
        sub_rot_corr=sub_mask,
        sub_trans_corr=sub_mask,
        Rws=zeros(params.Rws),
        tws=zeros(params.tws),
        kf_rot_corr=kf_mask,
        kf_trans_corr=kf_mask,
        Rsk=zeros(params.Rsk),
        tsk=zeros(params.tsk),
        bounds=zeros(params.bounds),
        sizes=tuple(zeros(s) for s in params.sizes),
        ignore_level=zeros(params.ignore_level),
        active=zeros(params.active),
        kf_to_submap=zeros(params.kf_to_submap),
        kf_to_local=zeros(params.kf_to_local),
    )
