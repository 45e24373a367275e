"""Masked optimizers: runtime-mask Adam / SGD.

The reference drives training phases by mutating ``requires_grad`` and
instantiating one torch optimizer per grid level plus a joint one
(`grid_opt/trainer.py:410-448`).  On TPU that would force a recompile
per phase.  Instead we use a single optimizer whose update is gated by
a *mask pytree* (same structure as params, float leaves):

  * ``mask == 0``  -> parameter frozen; moments untouched (exactly like
    a parameter that is absent from a torch optimizer);
  * ``mask > 0``   -> parameter trains with lr scaled by the mask value
    (expresses the reference's per-group learning rates, e.g.
    Fuser.fuse feat/submap/kf lrs, fuser.py:57-120).

Bias correction uses a per-element step count so late-unlocked
parameters warm up exactly as if their optimizer had just been created
(matching the reference's fresh per-level Adam instances).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class MaskedAdamState(NamedTuple):
    m: Any
    v: Any
    step: Any  # per-element update counts


def masked_adam_init(params) -> MaskedAdamState:
    zeros = lambda p: jnp.zeros_like(p, dtype=jnp.float32)
    return MaskedAdamState(
        m=jax.tree_util.tree_map(zeros, params),
        v=jax.tree_util.tree_map(zeros, params),
        step=jax.tree_util.tree_map(zeros, params),
    )


def masked_adam_update(grads, state: MaskedAdamState, params, mask,
                       lr=1e-3, b1=0.9, b2=0.999, eps=1e-8):
    """Returns (new_params, new_state)."""

    def upd(g, m, v, step, p, mk):
        if g.dtype == jax.dtypes.float0:
            # Integer/bool parameter (bookkeeping arrays): never updated.
            return p, m, v, step
        g = g.astype(jnp.float32)
        on = (mk > 0).astype(jnp.float32)
        on_b = jnp.broadcast_to(on, jnp.broadcast_shapes(on.shape, p.shape))
        m_new = jnp.where(on_b > 0, b1 * m + (1 - b1) * g, m)
        v_new = jnp.where(on_b > 0, b2 * v + (1 - b2) * g * g, v)
        step_new = step + on_b
        t = jnp.maximum(step_new, 1.0)
        m_hat = m_new / (1 - b1**t)
        v_hat = v_new / (1 - b2**t)
        delta = lr * mk * m_hat / (jnp.sqrt(v_hat) + eps)
        return p - delta.astype(p.dtype), m_new, v_new, step_new

    p_leaves, treedef = jax.tree_util.tree_flatten(params)
    g_leaves = treedef.flatten_up_to(grads)
    m_leaves = treedef.flatten_up_to(state.m)
    v_leaves = treedef.flatten_up_to(state.v)
    s_leaves = treedef.flatten_up_to(state.step)
    k_leaves = treedef.flatten_up_to(mask)
    outs = [upd(g, m, v, s, p, jnp.asarray(mk, jnp.float32))
            for g, m, v, s, p, mk in zip(g_leaves, m_leaves, v_leaves,
                                         s_leaves, p_leaves, k_leaves)]
    new_params = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
    new_m = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
    new_v = jax.tree_util.tree_unflatten(treedef, [o[2] for o in outs])
    new_s = jax.tree_util.tree_unflatten(treedef, [o[3] for o in outs])
    return new_params, MaskedAdamState(new_m, new_v, new_s)


class MaskedSgdState(NamedTuple):
    dummy: Any


def masked_sgd_init(params) -> MaskedSgdState:
    return MaskedSgdState(dummy=jnp.zeros(()))


def masked_sgd_update(grads, state: MaskedSgdState, params, mask, lr=1e-3):
    def upd(p, g, mk):
        if g.dtype == jax.dtypes.float0:
            return p
        return p - (lr * mk * g.astype(jnp.float32)).astype(p.dtype)

    new_params = jax.tree_util.tree_map(upd, params, grads, mask)
    return new_params, state
