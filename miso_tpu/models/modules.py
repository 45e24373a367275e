"""Auxiliary neural modules (reference `grid_opt/models/modules.py`).

ConvInterp and FeaturePrediction (the encoder core) live in
models/encoder.py; this module holds the remaining inventory:
FeatureUpsampler (modules.py:59-104) and FeatureReduction3D
(modules.py:184-231, used by the VM feature-prediction variant).
Channel-last NDHWC layouts throughout.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp

from miso_tpu.ops.mlp import mlp_apply, mlp_init


def feature_upsampler_init(key, dim, in_channels, out_channels, dtype=jnp.float32):
    """ConvTranspose 2x upsampler + per-voxel MLP refiner
    (modules.py:59-75)."""
    k1, k2 = jax.random.split(key)
    ksize = (2,) * dim
    fan_in = in_channels * 2**dim
    lim = 1.0 / math.sqrt(fan_in)
    W = jax.random.uniform(k1, (*ksize, in_channels, out_channels), dtype, -lim, lim)
    b = jnp.zeros((out_channels,), dtype)
    refiner = mlp_init(k2, out_channels, out_channels, 2 * out_channels, 1,
                       bias=True, dtype=dtype)
    return {"deconv_W": W, "deconv_b": b, "refiner": refiner}


def feature_upsampler_apply(params, x):
    """x: (1, *spatial, C) -> (1, *2spatial, C') (modules.py:76-104)."""
    dim = x.ndim - 2
    dn = {2: ("NHWC", "HWIO", "NHWC"), 3: ("NDHWC", "DHWIO", "NDHWC")}[dim]
    y = jax.lax.conv_transpose(
        x, params["deconv_W"], strides=(2,) * dim, padding="VALID",
        dimension_numbers=dn)
    y = y + params["deconv_b"]
    y = jax.nn.relu(y)
    C = y.shape[-1]
    flat = y.reshape(-1, C)
    out = mlp_apply(params["refiner"], flat)
    return out.reshape(*y.shape[:-1], -1)


def feature_reduction_3d_init(key, input_dim, output_dim, mlp_hidden=8,
                              mlp_layers=1, dtype=jnp.float32):
    """Spatial reduction + MLP (modules.py:184-213)."""
    return {"mlp": mlp_init(key, input_dim, output_dim, mlp_hidden, mlp_layers,
                            bias=True, dtype=dtype)}


def feature_reduction_3d_apply(params, x, reduce_axes: Sequence[int],
                               reduce_op="max"):
    """x: (1, gx, gy, gz, C); reduce the given SPATIAL axes (1..3 in our
    channel-last layout) then apply a per-cell MLP (modules.py:215-231).
    """
    axes = tuple(reduce_axes)
    if reduce_op == "max":
        y = jnp.max(x, axis=axes, keepdims=True)
    elif reduce_op == "mean":
        y = jnp.mean(x, axis=axes, keepdims=True)
    else:
        raise ValueError(f"Invalid reduce op: {reduce_op}")
    C = y.shape[-1]
    shape = y.shape
    out = mlp_apply(params["mlp"], y.reshape(-1, C))
    return out.reshape(*shape[:-1], -1)
