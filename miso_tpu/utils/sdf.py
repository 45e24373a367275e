"""SDF field extraction, meshing, sphere tracing.

Replaces `grid_opt/utils/utils_sdf.py`.  Field evaluation is a single
jitted chunked scan on device (the reference loops 16^3 blocks in
Python, utils_sdf.py:69-86); marching cubes runs in the native C++
runtime; PLY IO is self-contained.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct as _struct


def sign_mask_from_gt_sdf(gt_sdf, trunc_dist=0.15):
    """+1 for sdf > trunc, 0 otherwise (reference utils_sdf.py:19-37)."""
    return (gt_sdf > trunc_dist).astype(gt_sdf.dtype)


def valid_mask_from_gt_sdf(gt_sdf, trunc_dist=0.15):
    """1 where |sdf| < trunc (reference utils_sdf.py:40-58)."""
    return (jnp.abs(gt_sdf) < trunc_dist).astype(gt_sdf.dtype)


_LATTICE_EVAL_CACHE = {}


def _lattice_chunk_pts(bound, res, start, chunk):
    """On-device lattice coordinates for rows [start, start+chunk).

    linspace(lo, hi, res) node k = lo + k * (hi - lo) / (res - 1); no
    host meshgrid, no H2D point upload.  ``res``/``start`` are traced.
    """
    i = start + jnp.arange(chunk, dtype=jnp.int32)
    res = jnp.int32(res)
    ix = i // (res * res)
    iy = (i // res) % res
    iz = i % res
    step = (bound[:, 1] - bound[:, 0]) / jnp.maximum(res - 1, 1).astype(
        bound.dtype)
    return jnp.stack([bound[0, 0] + ix * step[0],
                      bound[1, 0] + iy * step[1],
                      bound[2, 0] + iz * step[2]], axis=-1)


def _lattice_eval(chunk: int, nb: int):
    """Jitted whole-lattice evaluator: scan over ``nb`` fixed-size
    chunks, cached per (chunk, nb).

    ONE device dispatch per meshing call -- on this environment each
    dispatch can cost tens of seconds under transport congestion, so
    dispatch count, not FLOPs, dominates meshing time.  ``nb`` is
    bucketed to powers of two by the caller, bounding the number of
    distinct executables; ``res``/``start`` stay traced so buckets are
    shared across resolutions and models of one structure.  The model
    is an ARGUMENT, never a closure constant (~100x slow dispatch
    otherwise; see ops/interp.py notes).
    """
    key = (chunk, nb)
    if key in _LATTICE_EVAL_CACHE:
        return _LATTICE_EVAL_CACHE[key]

    @jax.jit
    def f(query_pytree, bound, res, start0):
        def body(c, _):
            pts = _lattice_chunk_pts(bound, res, start0 + c * chunk, chunk)
            return c + 1, query_pytree(pts).reshape(-1)

        _, out = jax.lax.scan(body, jnp.int32(0), None, length=nb)
        return out.reshape(-1)

    _LATTICE_EVAL_CACHE[key] = f
    return f


# Longest scan per dispatch IN SINGLE-MODEL CHUNK-WORK UNITS: a single
# dispatch that runs too long hits the TPU runtime watchdog (~100 s) and
# hard-faults the worker (~4 min recovery).  64 chunks/dispatch is
# measured-safe for a GridNet; a stacked atlas does its masked average
# over S co-located submaps, multiplying per-chunk work by S -- a
# 64-chunk 16.8M-point dispatch on an S=10 world-bound atlas was
# measured to fault the worker outright, so the budget is divided by
# the query's work factor (see _query_work_factor).
_MAX_SCAN_CHUNKS = 64


def _query_work_factor(query_func) -> int:
    """Per-point query cost multiplier vs a single GridNet.

    A stacked GridAtlasParams evaluates every live submap slot for each
    point (masked average), so its lattice-scan chunk budget must shrink
    by the slot count to keep one dispatch under the runtime watchdog."""
    if isinstance(query_func, ObservedQuery):
        return _query_work_factor(query_func.model)
    Rws = getattr(query_func, "Rws", None)
    if Rws is not None and getattr(Rws, "ndim", 0) == 3:
        return max(int(Rws.shape[0]), 1)
    return 1


def _scan_bucket(nb: int, work_factor: int) -> int:
    budget = max(_MAX_SCAN_CHUNKS // max(work_factor, 1), 1)
    if nb <= budget:
        # One dispatch covers the lattice: next power of two ≥ nb so
        # executables are shared across nearby resolutions.
        bucket = 1
        while bucket < nb:
            bucket *= 2
        return bucket
    # Multiple dispatches: largest power of two ≤ budget -- the budget
    # is a watchdog-safety bound and must never be overshot.
    bucket = 1
    while bucket * 2 <= budget:
        bucket *= 2
    return bucket


def extract_fields(query_func: Callable, bound, resolution: int,
                   chunk: int = 2 ** 18) -> np.ndarray:
    """Evaluate an SDF on a resolution^3 lattice spanning ``bound``.

    Lattice nodes are linspace(bound_min, bound_max, resolution) per axis
    (matches reference utils_sdf.py:69-86).  Runs as ONE jitted scan
    over fixed-size chunks with on-device lattice generation (see
    _lattice_eval); chunk count is bucketed to the next power of two
    (extra rows evaluate past the lattice and are trimmed).
    """
    n = resolution ** 3
    # int32 device index math: res^3 must fit (the on-device lattice
    # would silently wrap and corrupt coordinates past this).
    assert n < 2 ** 31, (
        f"resolution {resolution} overflows int32 lattice indexing "
        f"(res^3 = {n}); use resolution <= 1290")
    query_func = _forward_only_query(query_func)
    nb = -(-n // chunk)
    bucket = _scan_bucket(nb, _query_work_factor(query_func))
    n_dispatch = -(-nb // bucket)
    b = jnp.asarray(np.asarray(bound, np.float32))
    # A pytree-callable (GridNet / GridAtlasParams / ObservedQuery) has
    # array leaves; a plain function/closure is its own (callable) leaf.
    leaves = jax.tree_util.tree_leaves(query_func)
    if leaves and all(hasattr(l, "dtype") for l in leaves):
        f = _lattice_eval(chunk, bucket)
        outs = [f(query_func, b, resolution, o * bucket * chunk)
                for o in range(n_dispatch)]
    else:
        # Plain-closure fallback (compiles once per extract_fields call).
        def fc(bound_, res_, start0):
            def body(c, _):
                pts = _lattice_chunk_pts(bound_, res_, start0 + c * chunk,
                                         chunk)
                return c + 1, query_func(pts).reshape(-1)

            _, out = jax.lax.scan(body, jnp.int32(0), None, length=bucket)
            return out.reshape(-1)

        fc = jax.jit(fc)
        outs = [fc(b, resolution, o * bucket * chunk)
                for o in range(n_dispatch)]
    vals = np.concatenate([np.asarray(o) for o in outs]) if len(outs) > 1 \
        else np.asarray(outs[0])
    return vals[:n].reshape(resolution, resolution, resolution)


def _forward_only_query(query_func):
    """Switch an atlas query to the unrolled slot loop for meshing.

    Nesting the gradient-friendly slot scan inside the lattice scan
    blew the TPU compile up to ~350 s; the unrolled forward compiles in
    ~35 s (see GridAtlasParams.slot_loop).  ObservedQuery wrappers are
    unwrapped and rewrapped."""
    if isinstance(query_func, ObservedQuery):
        return query_func.replace(
            model=_forward_only_query(query_func.model))
    if getattr(query_func, "slot_loop", None) == "scan" \
            and hasattr(query_func, "replace"):
        return query_func.replace(slot_loop="unroll")
    return query_func


def prewarm_extract_fields(query_func, resolution: int, chunk: int = 2 ** 18,
                           feature_dtype=None):
    """Compile the meshing executable NOW -- compile ONLY, no execution.

    On the axon transport, a big cache-miss compile in an AGED process
    runs ~11x slower than the same compile at init (CLAUDE.md rule 7;
    measured 35 s fresh vs 390 s after a 5-frame SLAM run, and the
    flagship demo paid 1080 s meshing a 300-frame run).  Call this right
    after the model/atlas storage reaches its final SHAPES (for a
    GridAtlas: after the first add_submap, since storage is
    capacity-padded) and before the run loop: the executable lands in
    the persistent compilation cache, so the final save_mesh /
    extract_fields call deserializes it instead of re-compiling.

    Uses AOT ``lower().compile()`` rather than a speculative throwaway
    execution: the execution is NOT free -- one full-scale lattice
    dispatch on a capacity-10 world-bound atlas ran past the runtime
    watchdog and hard-faulted the TPU worker, poisoning every
    subsequently queued program (the round-5 prewarm crash class).

    ``feature_dtype``: prewarm the cast-storage variant save_mesh will
    use (e.g. "bfloat16"); pass None for the raw-storage executable.
    """
    if feature_dtype is not None:
        query_func = cast_feature_storage(query_func,
                                          jnp.dtype(feature_dtype))
    query_func = _forward_only_query(query_func)
    n = resolution ** 3
    nb = -(-n // chunk)
    bucket = _scan_bucket(nb, _query_work_factor(query_func))
    leaves = jax.tree_util.tree_leaves(query_func)
    if not (leaves and all(hasattr(l, "dtype") for l in leaves)):
        return  # plain-closure path compiles per call; nothing to warm
    f = _lattice_eval(chunk, bucket)
    b = jnp.zeros((3, 2), jnp.float32).at[:, 1].set(1.0)
    f.lower(query_func, b, resolution, 0).compile()


def cast_feature_storage(query_func, dtype=jnp.bfloat16):
    """Cast grid feature/stability storage to a query dtype.

    bf16 features halve gather HBM traffic on query-only paths (measured
    ~2.5x on meshing/eval/tracking forwards, bench.py docstring) while
    the lerp/decode still accumulates in f32 (jax promotes bf16 * f32
    -> f32).  Works on GridNet / GridAtlasParams (``features`` /
    ``stability`` tuples) and on ObservedQuery wrappers (casts the
    wrapped model).  Other callables are returned unchanged.
    """
    if isinstance(query_func, ObservedQuery):
        return query_func.replace(
            model=cast_feature_storage(query_func.model, dtype))
    kw = {}
    if hasattr(query_func, "features"):
        kw["features"] = tuple(f.astype(dtype) for f in query_func.features)
    if hasattr(query_func, "stability"):
        kw["stability"] = tuple(s.astype(dtype) for s in query_func.stability)
    if kw and hasattr(query_func, "replace"):
        return query_func.replace(**kw)
    return query_func


def extract_geometry(query_func, bound, resolution=256, threshold=0.0,
                     feature_dtype=None):
    """Field eval + marching cubes -> (verts, tris) in world coords.

    Reference utils_sdf.py:89-101 (mcubes + rescale).  ``feature_dtype``
    (e.g. jnp.bfloat16 or "bfloat16"): cast grid storage at query time
    for ~2.5x faster field extraction, f32 accumulation (see
    cast_feature_storage).
    """
    from miso_tpu.native import marching_cubes

    if feature_dtype is not None:
        query_func = cast_feature_storage(query_func,
                                          jnp.dtype(feature_dtype))
    b = np.asarray(bound, np.float32)
    u = extract_fields(query_func, bound, resolution)
    spacing = (b[:, 1] - b[:, 0]) / (resolution - 1.0)
    verts, tris = marching_cubes(u, threshold, origin=b[:, 0], spacing=spacing)
    return verts, tris


def save_mesh(query_func, bound, save_path: Optional[str] = None,
              resolution: int = 256, transform: Optional[np.ndarray] = None,
              feature_dtype=None):
    """Extract a mesh and optionally write a binary PLY.

    Returns a native TriangleMesh (reference utils_sdf.py:104-140 returns
    an open3d mesh).  ``feature_dtype``: see extract_geometry.
    """
    from miso_tpu.native import TriangleMesh

    verts, tris = extract_geometry(query_func, bound, resolution,
                                   feature_dtype=feature_dtype)
    if transform is not None:
        T = np.asarray(transform)
        verts = verts @ T[:3, :3].T + T[:3, 3]
    if save_path is not None:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        write_ply(save_path, verts, tris)
    return TriangleMesh(verts, tris)


class ObservedQuery(_struct.PyTreeNode):
    """Pytree-callable wrapping a model with a stability mask.

    A pytree (not a closure) so extract_fields can pass it as a jit
    argument (see _lattice_eval / extract_fields).
    """
    model: object
    stability_thresh: jnp.ndarray
    fill_value: jnp.ndarray

    def __call__(self, x):
        sdf = self.model(x)[:, :1]
        # Finest-level stability: the coarse level's cells smear
        # "observed" ~one coarse cell past the data, which keeps the
        # phantom TSDF shell behind surfaces (the zero crossing where
        # behind-surface supervision ends) in the mesh.
        mu = self.model.query_stability(x)[:, -1:]
        return jnp.where(mu > self.stability_thresh, sdf, self.fill_value)


def observed_sdf_query(model, stability_thresh=0.2, fill_value=1e3):
    """Wrap a model so unobserved regions decode to a large positive SDF.

    Uses the stability (mu) grids (trained toward 1 at observed points,
    loss.py:170-184) as an observedness mask: marching cubes then only
    extracts surface where the map actually saw data, suppressing the
    spurious zero crossings that zero-feature regions produce.
    """
    return ObservedQuery(model=model,
                         stability_thresh=jnp.asarray(stability_thresh),
                         fill_value=jnp.asarray(fill_value))


def write_ply(path: str, verts: np.ndarray, tris: np.ndarray):
    """Minimal binary-little-endian PLY writer (replaces trimesh.export)."""
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int32)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(tris)}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(verts.astype("<f4").tobytes())
        face = np.empty((len(tris),), dtype=[("n", "u1"), ("idx", "<i4", (3,))])
        face["n"] = 3
        face["idx"] = tris
        f.write(face.tobytes())


def read_ply(path: str):
    """Minimal PLY reader (ascii + binary_little_endian, xyz + faces)."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.find(b"end_header\n")
    header = data[:end].decode("ascii").splitlines()
    body = data[end + len(b"end_header\n"):]
    fmt = "ascii"
    nv = nf = 0
    vert_props = []
    in_vertex = False
    for line in header:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            in_vertex = parts[1] == "vertex"
            if parts[1] == "vertex":
                nv = int(parts[2])
            elif parts[1] == "face":
                nf = int(parts[2])
        elif parts[0] == "property" and in_vertex and parts[1] != "list":
            vert_props.append((parts[2], parts[1]))
    type_map = {"float": "<f4", "float32": "<f4", "double": "<f8",
                "uchar": "u1", "uint8": "u1", "int": "<i4", "int32": "<i4"}
    if fmt == "ascii":
        text = body.decode("ascii").split()
        k = len(vert_props)
        vals = np.array(text[: nv * k], dtype=np.float64).reshape(nv, k)
        verts = vals[:, :3].astype(np.float32)
        tris = []
        pos = nv * k
        for _ in range(nf):
            cnt = int(text[pos]); pos += 1
            tris.append([int(t) for t in text[pos: pos + cnt]][:3])
            pos += cnt
        return verts, np.asarray(tris, np.int32)
    vdtype = np.dtype([(n, type_map[t]) for n, t in vert_props])
    varr = np.frombuffer(body, dtype=vdtype, count=nv)
    verts = np.stack([varr["x"], varr["y"], varr["z"]], axis=-1).astype(np.float32)
    offset = nv * vdtype.itemsize
    fdtype = np.dtype([("n", "u1"), ("idx", "<i4", (3,))])
    farr = np.frombuffer(body, dtype=fdtype, count=nf, offset=offset)
    return verts, farr["idx"].astype(np.int32).copy()


def sphere_tracing(query_func, origins, directions, min_dist=1e-3,
                   max_dist=50.0, max_iters=100, epsilon=1e-5):
    """Sphere-trace rays against an SDF (reference utils_sdf.py:197-236).

    Fully jittable: fixed iteration count with converged-ray freezing.
    Returns (points (N, 3), hit_mask (N, 1)).
    """
    directions = directions / (jnp.linalg.norm(directions, axis=-1, keepdims=True) + 1e-12)

    def body(_, state):
        points, stopped = state
        sdfs = query_func(points).reshape(-1, 1)
        converged = sdfs < epsilon
        dist = jnp.linalg.norm(points - origins, axis=-1, keepdims=True)
        far = dist > max_dist
        stop = jnp.logical_or(stopped, jnp.logical_or(converged, far))
        new_points = jnp.where(stop, points, points + sdfs * directions)
        return new_points, stop

    points0 = origins + min_dist * directions
    stopped0 = jnp.zeros((origins.shape[0], 1), bool)
    points, _ = jax.lax.fori_loop(0, max_iters, body, (points0, stopped0))
    final_sdf = query_func(points).reshape(-1, 1)
    return points, final_sdf < epsilon
