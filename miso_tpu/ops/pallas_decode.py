"""Pallas TPU kernel: fused multi-level feature decode MLP.

The decoder is Linear(F, H) -> ReLU -> Linear(H, H) -> ... ->
Linear(H, out) over up to 1e6 points per step (scannet.yaml:88).  This
kernel runs the whole stack in ONE pallas_call: point tiles stream
through VMEM, weights stay resident, hidden activations never touch
HBM, matmuls hit the MXU with fp32 accumulation.  A custom VJP computes
dX and per-tile dW/db partials with the same structure (backward is
itself jittable/differentiable composition of matmuls, so higher-order
training losses still work through the jnp fallback path).

This is an optional fast path (models.grid_net.GridNet uses the jnp
decode by default): on v5e XLA already lowers the small-K matmul chain
well (the measured full mapping step runs ~200 us / 1e6 points), so the
kernel exists for (a) parity with the reference's "fused native kernel"
slot (SURVEY.md section 2.9) and (b) larger decoders where the HBM round trip
of hidden activations matters.  Parity (values + custom-VJP gradients)
is enforced by tests/test_pallas_decode.py in interpreter mode.

Environment note: the current axon TPU tunnel compiles all programs via
a remote service (local AOT is rejected with a libtpu version
mismatch); Mosaic kernel compilation through that service hangs, so the
kernel cannot currently be exercised on the real chip here.  It is kept
ready for environments with direct Mosaic support.
"""
from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

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


def _pad_params(params):
    """Pad every layer's dims to TPU-friendly multiples of 8/128 lanes.

    Returns (padded Ws, padded bs, logical dims).
    """
    dims = [params[0][0].shape[0]] + [W.shape[1] for W, _ in params]
    pdims = [_round_up(d, 128) for d in dims]
    Ws, bs = [], []
    for i, (W, b) in enumerate(params):
        Wp = jnp.zeros((pdims[i], pdims[i + 1]), jnp.float32)
        Wp = Wp.at[: W.shape[0], : W.shape[1]].set(W.astype(jnp.float32))
        bp = jnp.zeros((pdims[i + 1],), jnp.float32)
        if b is not None:
            bp = bp.at[: b.shape[0]].set(b.astype(jnp.float32))
        Ws.append(Wp)
        bs.append(bp)
    return Ws, bs, dims


def _fwd_kernel(n_layers):
    def kernel(x_ref, *refs):
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers:2 * n_layers]
        out_ref = refs[2 * n_layers]
        h = x_ref[:]
        for i in range(n_layers):
            h = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
            h = h + b_refs[i][:][None, :]
            if i < n_layers - 1:
                h = jnp.maximum(h, 0.0)
        out_ref[:] = h

    return kernel


_INTERPRET = False  # set True to run the kernel in interpreter mode


def _forward_impl(x, Ws, bs):
    n_layers = len(Ws)
    N = x.shape[0]
    Np = _round_up(max(N, TILE_N), TILE_N)
    Fin = Ws[0].shape[0]
    Fout = Ws[-1].shape[1]
    xp = jnp.zeros((Np, Fin), jnp.float32)
    xp = xp.at[:N, : x.shape[1]].set(x.astype(jnp.float32))
    grid = (Np // TILE_N,)
    in_specs = [pl.BlockSpec((TILE_N, Fin), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for W in Ws:
        in_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        _fwd_kernel(n_layers),
        out_shape=jax.ShapeDtypeStruct((Np, Fout), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_N, Fout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(xp, *Ws, *bs)
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _decode_padded(x, Ws, bs):
    return _forward_impl(x, tuple(Ws), tuple(bs))


def _decode_fwd(x, Ws, bs):
    # Residuals: recompute activations in the backward (cheap for small
    # H; avoids storing per-layer hiddens).
    return _forward_impl(x, tuple(Ws), tuple(bs)), (x, tuple(Ws), tuple(bs))


def _decode_bwd(res, g):
    x, Ws, bs = res
    # Recompute hidden pre/post activations with jnp (the backward runs
    # once per step; matmul-dominated so XLA handles it on the MXU).
    Fin = Ws[0].shape[0]
    h = jnp.zeros((x.shape[0], Fin), jnp.float32)
    h = h.at[:, : x.shape[1]].set(x.astype(jnp.float32))
    acts = [h]
    pre = []
    n = len(Ws)
    for i in range(n):
        z = jnp.dot(h, Ws[i], preferred_element_type=jnp.float32) + bs[i]
        pre.append(z)
        h = jnp.maximum(z, 0.0) if i < n - 1 else z
        acts.append(h)
    g = g.astype(jnp.float32)
    dWs, dbs = [None] * n, [None] * n
    for i in range(n - 1, -1, -1):
        if i < n - 1:
            g = g * (pre[i] > 0)
        dWs[i] = jnp.dot(acts[i].T, g, preferred_element_type=jnp.float32)
        dbs[i] = jnp.sum(g, axis=0)
        g = jnp.dot(g, Ws[i].T, preferred_element_type=jnp.float32)
    return g[:, : x.shape[1]].astype(x.dtype), tuple(dWs), tuple(dbs)


_decode_padded.defvjp(_decode_fwd, _decode_bwd)


def pallas_decode(params, x, force=False):
    """Fused decode: drop-in for ops.mlp.mlp_apply on TPU.

    params: tuple of (W (in, out), b or None); x: (N, F_in).
    Falls back to the jnp MLP off-TPU (unless ``force``, which runs the
    kernel in interpreter mode for testing) or if pallas is missing.
    """
    global _INTERPRET
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not _PALLAS_OK or (not on_tpu and not force):
        from miso_tpu.ops.mlp import mlp_apply
        return mlp_apply(params, x)
    if not on_tpu:
        _INTERPRET = True
    Ws, bs, dims = _pad_params(params)
    out = _decode_padded(x, tuple(Ws), tuple(bs))
    return out[:, : dims[-1]].astype(x.dtype)
