"""iSDF baseline: MLP-only SDF model with icosahedron positional encoding.

Re-design of `grid_opt/models/isdf/` (isdf.py:30-148, embedding.py:25+):
Softplus(beta=100) fc blocks, skip concat of the embedding after the
first block stack, scalar output; same keyframe pose-correction API as
GridNet.  The PE projects scaled coords onto 21 icosahedron half-vertex
directions and takes sin at geometric frequencies plus a pi/2 phase
(equals cos), prepending the raw coords.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from miso_tpu.ops import se3

# 21 icosahedron directions (embedding.py:41-62; these public constants
# originate from the iSDF paper's open-source release).
_ICO_DIRS = np.array([
    [0.8506508, 0, 0.5257311],
    [0.809017, 0.5, 0.309017],
    [0.5257311, 0.8506508, 0],
    [1, 0, 0],
    [0.809017, 0.5, -0.309017],
    [0.8506508, 0, -0.5257311],
    [0.309017, 0.809017, -0.5],
    [0, 0.5257311, -0.8506508],
    [0.5, 0.309017, -0.809017],
    [0, 1, 0],
    [-0.5257311, 0.8506508, 0],
    [-0.309017, 0.809017, -0.5],
    [0, 0.5257311, 0.8506508],
    [-0.309017, 0.809017, 0.5],
    [0.309017, 0.809017, 0.5],
    [0.5, 0.309017, 0.809017],
    [0.5, -0.309017, 0.809017],
    [0, 0, 1],
    [-0.5, 0.309017, 0.809017],
    [-0.809017, 0.5, 0.309017],
    [-0.809017, 0.5, -0.309017],
], np.float32).T  # (3, 21)


def positional_encoding(x, min_deg=0, max_deg=6, scale=0.1):
    """Icosahedron PE (embedding.py:95-112).  (N, 3) -> (N, 3 + 2*21*n)."""
    n_freqs = max_deg - min_deg + 1
    freqs = 2.0 ** jnp.linspace(min_deg, max_deg, n_freqs).astype(x.dtype)
    xs = x * scale
    proj = xs @ jnp.asarray(_ICO_DIRS, x.dtype)                  # (N, 21)
    xb = (proj[..., None] * freqs).reshape(*proj.shape[:-1], -1)  # (N, 21*n)
    emb = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    return jnp.concatenate([xs, emb], axis=-1)


def pe_embedding_size(min_deg=0, max_deg=6):
    return 2 * 21 * (max_deg - min_deg + 1) + 3


def _softplus100(x):
    """Softplus(beta=100) (isdf.py:18-22), numerically safe."""
    return jax.nn.softplus(100.0 * x) / 100.0


class ISDF(struct.PyTreeNode):
    layers: Any                 # tuple of (W, b)
    rot_corr: jnp.ndarray       # (K, 3)
    trans_corr: jnp.ndarray     # (K, 3)
    Rwk: jnp.ndarray
    twk: jnp.ndarray
    bound: jnp.ndarray
    d: int = struct.field(pytree_node=False, default=3)
    hidden_size: int = struct.field(pytree_node=False, default=256)
    hidden_layers_block: int = struct.field(pytree_node=False, default=1)
    min_deg: int = struct.field(pytree_node=False, default=0)
    max_deg: int = struct.field(pytree_node=False, default=6)
    pe_scale: float = struct.field(pytree_node=False, default=0.1)
    scale_output: float = struct.field(pytree_node=False, default=1.0)
    optimize_pose: bool = struct.field(pytree_node=False, default=False)
    anchor_kf: int = struct.field(pytree_node=False, default=0)

    @property
    def num_poses(self):
        return self.rot_corr.shape[0]

    def __call__(self, x):
        if x.shape[-1] == 2:  # 2D queries padded with zero z (isdf.py:121-124)
            x = jnp.concatenate([x, jnp.zeros((*x.shape[:-1], 1), x.dtype)], -1)
        pe = positional_encoding(x, self.min_deg, self.max_deg, self.pe_scale)
        n_block = self.hidden_layers_block
        idx = 0

        def fc(i, h):
            W, b = self.layers[i]
            return _softplus100(jnp.dot(h, W, preferred_element_type=jnp.float32) + b)

        h = fc(idx, pe); idx += 1
        for _ in range(n_block):            # mid1
            h = fc(idx, h); idx += 1
        h = jnp.concatenate([h, pe], -1)    # skip concat (isdf.py:133-134)
        h = fc(idx, h); idx += 1            # cat_layer
        for _ in range(n_block):            # mid2
            h = fc(idx, h); idx += 1
        W, b = self.layers[idx]             # out_alpha: plain linear
        raw = jnp.dot(h, W, preferred_element_type=jnp.float32) + b
        return raw * self.scale_output

    forward = __call__

    # Pose API (isdf.py:67-110), mirroring GridNet.
    def updated_kf_poses(self, lock_mask=None):
        dr, dt = self.rot_corr, self.trans_corr
        if lock_mask is not None:
            m = lock_mask[:, None]
            dr = jax.lax.stop_gradient(dr) * m + dr * (1.0 - m)
            dt = jax.lax.stop_gradient(dt) * m + dt * (1.0 - m)
        return jnp.matmul(self.Rwk, se3.so3_exp(dr),
                          precision=jax.lax.Precision.HIGHEST), self.twk + dt

    def updated_kf_pose(self, kf_id):
        R, t = self.updated_kf_poses()
        return R[kf_id], t[kf_id]

    def set_initial_kf_pose(self, kf_id, R, t):
        return self.replace(
            Rwk=self.Rwk.at[kf_id].set(R),
            twk=self.twk.at[kf_id].set(jnp.reshape(t, (3,))),
            rot_corr=self.rot_corr.at[kf_id].set(0.0),
            trans_corr=self.trans_corr.at[kf_id].set(0.0),
        )


def create_isdf(key, cfg_model: Dict, bound=None, hidden_size=256,
                hidden_layers_block=1, scale_output=1.0,
                dtype=jnp.float32) -> ISDF:
    """Xavier-normal weights (isdf.py:25-27)."""
    pcfg = cfg_model.get("pose", {"num_poses": 1, "optimize": False})
    icfg = cfg_model.get("isdf", {})
    hidden_size = int(icfg.get("hidden_size", hidden_size))
    hidden_layers_block = int(icfg.get("hidden_layers_block", hidden_layers_block))
    scale_output = float(icfg.get("scale_output", scale_output))
    emb = pe_embedding_size()
    dims = [(emb, hidden_size)]
    dims += [(hidden_size, hidden_size)] * hidden_layers_block
    dims += [(hidden_size + emb, hidden_size)]
    dims += [(hidden_size, hidden_size)] * hidden_layers_block
    dims += [(hidden_size, 1)]
    layers = []
    for fin, fout in dims:
        key, k = jax.random.split(key)
        std = math.sqrt(2.0 / (fin + fout))  # xavier normal
        W = jax.random.normal(k, (fin, fout), dtype) * std
        layers.append((W, jnp.zeros((fout,), dtype)))
    K = int(pcfg.get("num_poses", 1))
    b = cfg_model.get("grid", {}).get("bound", [[-1, 1]] * 3)
    return ISDF(
        layers=tuple(layers),
        rot_corr=jnp.zeros((K, 3), dtype),
        trans_corr=jnp.zeros((K, 3), dtype),
        Rwk=se3.identity_rotations(K, dtype),
        twk=jnp.zeros((K, 3), dtype),
        bound=jnp.asarray(np.asarray(bound if bound is not None else b, np.float32)),
        hidden_size=hidden_size,
        hidden_layers_block=hidden_layers_block,
        scale_output=scale_output,
        optimize_pose=bool(pcfg.get("optimize", False)),
    )
