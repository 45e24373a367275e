"""Small MLP (decoder) as explicit pytree params.

Replaces the reference's ``MLPNet`` (`grid_opt/models/modules.py:11-40`):
Linear(in, h) + act, hidden_layers x [Linear(h, h) + act], Linear(h, out).

Params are a tuple of (W, b) with W of shape (in, out); b may be None.
Init follows torch.nn.Linear defaults (kaiming-uniform fan_in) so
training dynamics are comparable.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Tuple[Tuple[jnp.ndarray, Optional[jnp.ndarray]], ...]


def mlp_init(
    key,
    input_dim: int,
    output_dim: int,
    hidden_dim: int = 64,
    hidden_layers: int = 1,
    bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    dims = [input_dim] + [hidden_dim] * (hidden_layers + 1) + [output_dim]
    params = []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        fan_in = dims[i]
        lim = 1.0 / math.sqrt(fan_in)
        W = jax.random.uniform(k1, (dims[i], dims[i + 1]), dtype, -lim, lim)
        b = jax.random.uniform(k2, (dims[i + 1],), dtype, -lim, lim) if bias else None
        params.append((W, b))
    return tuple(params)


def mlp_apply(params: Params, x: jnp.ndarray, activation=jax.nn.relu) -> jnp.ndarray:
    """Forward pass; ReLU between layers, linear output (modules.py:31-32).

    Matmuls request float32 accumulation so they map to the MXU cleanly
    even under bf16 inputs.
    """
    n = len(params)
    for i, (W, b) in enumerate(params):
        x = jnp.dot(x, W, preferred_element_type=jnp.float32)
        if b is not None:
            x = x + b
        if i < n - 1:
            x = activation(x)
    return x


def mlp_num_params(params: Params) -> int:
    total = 0
    for W, b in params:
        total += W.size + (b.size if b is not None else 0)
    return total
