"""Pallas TPU kernels: fused multi-level interp(lerp)+concat+decode.

TPU-native parity slot for the reference's one native component, the
CUDA double-backward grid_sample extension
(`third_party/cuda_gridsample_grad2/gridsample_cuda.cu:214`, SURVEY.md
section 2.9).  Two kernels:

  * :func:`fused_interp_decode` -- the full hot path after the corner
    gather: per-corner weighted reduction (the trilinear lerp), level
    concat, and the decoder MLP run in ONE ``pallas_call`` per point
    tile.  Hidden activations and per-level features never touch HBM.
  * :func:`pallas_decode` -- decode-only variant (drop-in for
    ops.mlp.mlp_apply).

Division of labor: the 8-corner *gather* itself and the backward
*scatter-add* stay in XLA here; Mosaic's per-lane ``tpu.dynamic_gather``
cannot express N-point corner gathers from a (G, F) grid.

**Measurement correction (2026-08-21).** The A/B table this file used
to carry (XLA 0.236 ms vs Pallas 0.241 ms per 1e6-pt train step, "the
XLA path is gather-bound at ~HBM speed") was an artifact-vs-artifact
comparison: `block_until_ready` is not an execution barrier on this
backend (CLAUDE.md rule 0), so both sides timed dispatch.  Honest
value-read-synced numbers: the XLA gather runs at ~3e7
element-gathers/s (~503 ms per 1e6-pt 2-level fwd), nowhere near HBM
bandwidth, and the gather -- not the gather-to-decode round trip --
dominates the step.  This kernel's fused lerp+decode epilogue is
therefore NOT the lever; replacing the gather itself is.  That path is
``ops/pallas_interp.py`` (interpolation as tiled one-hot MXU matmuls
against VMEM-resident halo tiles).  decode_impl='pallas' remains the
value/grad/grad2 parity-tested reference slot for the CUDA extension
(tests/test_pallas_decode.py); decode_impl='xla' stays the default.

Everything is computed TRANSPOSED -- points on the 128-wide lane axis,
channels on sublanes -- so the tiny feature dims (F=4, hidden 64) don't
waste lanes.

Differentiation: a ``jax.custom_vjp`` whose backward is plain jnp
(matmul-dominated, runs once per step under XLA) and therefore itself
arbitrarily differentiable -- eikonal/smoothness losses that
differentiate through interpolation gradients compose (the reference
needed an 850-line CUDA kernel for exactly this, cf. naive_gridsample
test strategy test3d.py:17-221).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

TILE_N = 512


def _round_up(x, m):
    return (x + m - 1) // m * m


def _on_tpu():
    return jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Decode-only kernel (transposed): x (N, F) -> MLP -> (N, out).
# ---------------------------------------------------------------------------

def _pad_params_T(params):
    """Transpose weights to (out, in) and pad rows to sublane multiples.

    The lane axis carries points, so weight dims only need 8-sublane
    alignment (f32), not 128.
    """
    dims = [params[0][0].shape[0]] + [W.shape[1] for W, _ in params]
    pdims = [_round_up(d, 8) for d in dims]
    WTs, bs = [], []
    for i, (W, b) in enumerate(params):
        Wp = jnp.zeros((pdims[i + 1], pdims[i]), jnp.float32)
        Wp = Wp.at[: W.shape[1], : W.shape[0]].set(W.T.astype(jnp.float32))
        bp = jnp.zeros((pdims[i + 1], 1), jnp.float32)
        if b is not None:
            bp = bp.at[: b.shape[0], 0].set(b.astype(jnp.float32))
        WTs.append(Wp)
        bs.append(bp)
    return WTs, bs, dims


def _mlp_T(h, WTs, bs):
    """Transposed MLP: h (K, N) -> (out, N); runs inside kernels and in
    the jnp backward alike."""
    n = len(WTs)
    for i in range(n):
        h = jnp.dot(WTs[i], h, preferred_element_type=jnp.float32) + bs[i]
        if i < n - 1:
            h = jnp.maximum(h, 0.0)
    return h


def _decode_kernel(n_layers):
    def kernel(x_ref, *refs):
        WTs = [refs[i][:] for i in range(n_layers)]
        bs = [refs[n_layers + i][:] for i in range(n_layers)]
        out_ref = refs[2 * n_layers]
        out_ref[:] = _mlp_T(x_ref[:], WTs, bs)

    return kernel


def _decode_T_impl(xT, WTs, bs, interpret):
    """xT: (Fin_pad, Np) transposed padded input -> (out_pad, Np)."""
    n_layers = len(WTs)
    Fin, Np = xT.shape
    Fout = WTs[-1].shape[0]
    grid = (Np // TILE_N,)
    in_specs = [pl.BlockSpec((Fin, TILE_N), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    for W in WTs:
        in_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        _decode_kernel(n_layers),
        out_shape=jax.ShapeDtypeStruct((Fout, Np), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Fout, TILE_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xT, *WTs, *bs)


# custom_jvp, not custom_vjp: the tangent is computed by jax.jvp of the
# jnp mirror, so EVERY derivative order (VJP via transposition, grad of
# grad for eikonal/smoothness/encoder losses) routes through ordinary
# jnp ops that XLA fuses -- while the primal runs the Pallas kernel.
# custom_vjp would cap differentiation at first order.
@functools.partial(jax.custom_jvp, nondiff_argnums=(3,))
def _decode_padded(xT, WTs, bs, interpret):
    return _decode_T_impl(xT, tuple(WTs), tuple(bs), interpret)


@_decode_padded.defjvp
def _decode_jvp(interpret, primals, tangents):
    xT, WTs, bs = primals
    out = _decode_padded(xT, tuple(WTs), tuple(bs), interpret)
    _, d_out = jax.jvp(lambda a, W, b: _mlp_T(a, W, b), primals, tangents)
    return out, d_out


def pallas_decode(params, x, force=False, interpret: Optional[bool] = None):
    """Fused decode: drop-in for ops.mlp.mlp_apply.

    params: tuple of (W (in, out), b or None); x: (N, F_in).
    ``interpret`` runs the kernel in interpreter mode (explicit argument,
    never latched globally); default = off-TPU when forced.
    Falls back to the jnp MLP off-TPU unless ``force``.
    """
    if not _PALLAS_OK or (not _on_tpu() and not force):
        from miso_tpu.ops.mlp import mlp_apply
        return mlp_apply(params, x)
    if interpret is None:
        interpret = not _on_tpu()
    WTs, bs, dims = _pad_params_T(params)
    N = x.shape[0]
    Np = _round_up(max(N, TILE_N), TILE_N)
    xT = jnp.zeros((WTs[0].shape[1], Np), jnp.float32)
    xT = xT.at[: x.shape[1], :N].set(x.T.astype(jnp.float32))
    out = _decode_padded(xT, tuple(WTs), tuple(bs), interpret)
    return out[: dims[-1], :N].T.astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused lerp + concat + decode kernel.
# ---------------------------------------------------------------------------

def _fused_kernel(n_levels, fdim, n_layers, lf_pad):
    """cfT (C*F, TILE), wT (C, TILE) -> lerp per level, concat, MLP.

    C = 8 * n_levels corners; rows of cfT are (corner, feature) pairs.
    """
    C = 8 * n_levels

    def kernel(cf_ref, w_ref, *refs):
        WTs = [refs[i][:] for i in range(n_layers)]
        bs = [refs[n_layers + i][:] for i in range(n_layers)]
        out_ref = refs[2 * n_layers]
        accs = []
        for level in range(n_levels):
            acc = jnp.zeros((fdim, w_ref.shape[1]), jnp.float32)
            for c in range(8):
                ci = level * 8 + c
                w_row = w_ref[ci, :][None, :]                 # (1, TILE)
                acc = acc + w_row * cf_ref[ci * fdim:(ci + 1) * fdim, :]
            accs.append(acc)
        h = jnp.concatenate(accs, axis=0)                      # (L*F, TILE)
        if lf_pad > n_levels * fdim:
            h = jnp.concatenate(
                [h, jnp.zeros((lf_pad - n_levels * fdim, h.shape[1]),
                              jnp.float32)], axis=0)
        out_ref[:] = _mlp_T(h, WTs, bs)

    return kernel


def _fused_impl(cfT, wT, WTs, bs, n_levels, fdim, interpret):
    n_layers = len(WTs)
    CF, Np = cfT.shape
    C = 8 * n_levels
    lf_pad = WTs[0].shape[1]
    Fout = WTs[-1].shape[0]
    grid = (Np // TILE_N,)
    in_specs = [
        pl.BlockSpec((CF, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    for W in WTs:
        in_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        _fused_kernel(n_levels, fdim, n_layers, lf_pad),
        out_shape=jax.ShapeDtypeStruct((Fout, Np), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Fout, TILE_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cfT, wT, *WTs, *bs)


def _lerp_T(cfT, wT, n_levels, fdim, lf_pad):
    """jnp mirror of the kernel's lerp (for the backward recompute)."""
    accs = []
    for level in range(n_levels):
        acc = 0.0
        for c in range(8):
            ci = level * 8 + c
            acc = acc + wT[ci][None, :] * cfT[ci * fdim:(ci + 1) * fdim]
        accs.append(acc)
    h = jnp.concatenate(accs, axis=0)
    if lf_pad > n_levels * fdim:
        h = jnp.concatenate(
            [h, jnp.zeros((lf_pad - h.shape[0], h.shape[1]), jnp.float32)],
            axis=0)
    return h


@functools.partial(jax.custom_jvp, nondiff_argnums=(4, 5, 6))
def _fused_padded(cfT, wT, WTs, bs, n_levels, fdim, interpret):
    return _fused_impl(cfT, wT, tuple(WTs), tuple(bs), n_levels, fdim,
                       interpret)


@_fused_padded.defjvp
def _fused_jvp(n_levels, fdim, interpret, primals, tangents):
    cfT, wT, WTs, bs = primals
    out = _fused_padded(cfT, wT, tuple(WTs), tuple(bs), n_levels, fdim,
                        interpret)

    def ref(cf, w, W, b):
        lf_pad = W[0].shape[1]
        return _mlp_T(_lerp_T(cf, w, n_levels, fdim, lf_pad), W, b)

    _, d_out = jax.jvp(ref, primals, tangents)
    return out, d_out


def _corner_gather(grids, x, bound, sizes=None):
    """XLA-side 8-corner gather for every level.

    Returns cfT (8*L*F, N) corner features and wT (8*L, N) lerp weights
    (zeros-padding validity folded into the weights).  Matches
    ops.interp.grid_interpolate semantics exactly.
    """
    from miso_tpu.ops.interp import corner_indices_and_weights

    d = x.shape[-1]
    N = x.shape[0]
    cf_rows, w_rows = [], []
    for level, grid in enumerate(grids):
        spatial = grid.shape[:-1]
        F = grid.shape[-1]
        size = None if sizes is None else sizes[level]
        lin, w = corner_indices_and_weights(x, bound, spatial, size)
        # One flat element gather emits cfT DIRECTLY in (C*F, N) layout:
        # row (corner c, feature f), flat index lin[c]*F + f.  The
        # previous (C, N, F) row-gather + transpose hit the pathological
        # (N, F) minor-dim relayout (measured 3000x the XLA step;
        # CLAUDE.md rule 3) -- this formulation never materializes an
        # N-minor array.
        flat = grid.reshape(-1)
        idx = (lin[:, None, :] * F
               + jnp.arange(F, dtype=jnp.int32)[None, :, None])  # (C, F, N)
        cf = jnp.take(flat, idx.reshape(-1), axis=0) \
            .reshape(2 ** d * F, N).astype(jnp.float32)
        cf_rows.append(cf)
        w_rows.append(w.astype(jnp.float32))
    return jnp.concatenate(cf_rows, axis=0), jnp.concatenate(w_rows, axis=0)


def fused_interp_decode(grids: Sequence[jnp.ndarray], x: jnp.ndarray,
                        bound: jnp.ndarray, decoder_params,
                        sizes=None, ignore_level=None,
                        force=False, interpret: Optional[bool] = None):
    """Multi-level trilinear interp + concat + MLP decode, fused.

    Drop-in for ``grid_decode(multi_level_interpolate(...))`` on the
    pos_invariant path.  Gather runs in XLA; lerp/concat/MLP run in one
    Pallas kernel; gradients (any order) flow via a jnp custom VJP.
    """
    if not _PALLAS_OK or (not _on_tpu() and not force):
        from miso_tpu.ops.interp import grid_decode, multi_level_interpolate
        feats = multi_level_interpolate(grids, x, bound, ignore_level)
        return grid_decode(feats, x, decoder_params, True)
    if interpret is None:
        interpret = not _on_tpu()
    n_levels = len(grids)
    fdim = grids[0].shape[-1]
    cfT, wT = _corner_gather(grids, x, bound, sizes)
    if ignore_level is not None:
        lvl_scale = jnp.repeat(1.0 - ignore_level.astype(jnp.float32), 8)
        wT = wT * lvl_scale[:, None]
    N = x.shape[0]
    Np = _round_up(max(N, TILE_N), TILE_N)
    if Np > N:
        cfT = jnp.pad(cfT, ((0, 0), (0, Np - N)))
        wT = jnp.pad(wT, ((0, 0), (0, Np - N)))
    WTs, bs, dims = _pad_params_T(decoder_params)
    out = _fused_padded(cfT, wT, tuple(WTs), tuple(bs), n_levels, fdim,
                        interpret)
    return out[: dims[-1], :N].T.astype(x.dtype)
