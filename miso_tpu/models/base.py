"""Model-layer common utilities.

The reference expresses model state as torch nn.Modules with
requires_grad toggling (`grid_opt/models/base_net.py`,
`grid_modules.py:29-36`).  Here models are immutable flax.struct
pytrees and "lock/unlock" is a *mask pytree*: a pytree with the same
structure whose leaves are float multipliers (0 = frozen, 1 = train,
other values = per-group learning-rate scaling).  Masks are runtime
arrays, so switching training phases never triggers recompilation.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def tree_full_mask(model: Any, value: float = 1.0):
    """Mask pytree with every leaf set to `value` (scalar leaves)."""
    return jax.tree_util.tree_map(lambda _: jnp.asarray(value, jnp.float32), model)


def tree_zero_mask(model: Any):
    return tree_full_mask(model, 0.0)


def tree_scale_mask(mask: Any, scale: float):
    return jax.tree_util.tree_map(lambda m: m * scale, mask)


def tree_combine_masks(*masks):
    """Element-wise max of masks (union of trainable sets)."""
    return jax.tree_util.tree_map(lambda *ms: jnp.maximum(*ms) if len(ms) > 1 else ms[0], *masks)


def tree_norm(tree) -> jnp.ndarray:
    leaves = [jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree_util.tree_leaves(tree)]
    return jnp.sqrt(sum(leaves))


def relative_param_change(curr, prev):
    """sqrt(sum||curr-prev||^2 / sum||prev||^2) (reference trainer.py:231-242)."""
    num = sum(jnp.sum((c - p) ** 2) for c, p in
              zip(jax.tree_util.tree_leaves(curr), jax.tree_util.tree_leaves(prev)))
    den = sum(jnp.sum(p**2) for p in jax.tree_util.tree_leaves(prev))
    return jnp.sqrt(num / jnp.maximum(den, 1e-30))


def masked_select_tree(tree, mask):
    """Return the subtree where mask > 0, zeros elsewhere (for norms)."""
    return jax.tree_util.tree_map(lambda x, m: x * (m > 0), tree, mask)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def check_tensor(x, name: str = "tensor"):
    """Assert finiteness (reference utils.py:479-485 check_tensor)."""
    arr = jnp.asarray(x)
    if not bool(jnp.all(jnp.isfinite(arr))):
        raise ValueError(f"{name} contains NaN/Inf")
    return x


def sanitize_batch(batch):
    """NaN-scrub a batch dict (reference utils.py:487-493
    sanitize_tensor_dict)."""
    return {k: jnp.nan_to_num(jnp.asarray(v)) if jnp.issubdtype(
        jnp.asarray(v).dtype, jnp.floating) else v
        for k, v in batch.items()}
