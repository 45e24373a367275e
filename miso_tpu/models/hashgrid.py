"""Multiresolution hash-grid SDF model (GridNGP equivalent).

The reference's `grid_opt/models/grid_ngp.py` wraps the external
torch-ngp CUDA `SDFNetwork` (grid_ngp.py:45-53).  Here the Instant-NGP
hash encoding is implemented natively in JAX: per level l the lattice
resolution is ``N_l = floor(N_min * b**l)``; corner features live in a
(T, F) hash table addressed by the xor-prime spatial hash; queries
gather 8 corners per level and interpolate trilinearly, concat across
levels, then decode with an MLP.  Same pose-correction API as GridNet.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from miso_tpu.ops import se3
from miso_tpu.ops.mlp import mlp_apply, mlp_init

_PRIMES = np.array([1, 2654435761, 805459861], np.uint32)


def hash_encode_level(table, x01, res):
    """One hash-grid level.

    table: (T, F); x01: (N, 3) coords normalized to [0, 1]; res: static
    int lattice resolution.  Dense addressing when the (res+1)^3
    lattice fits in the table (NGP's fast path), xor-prime hash
    otherwise.  Returns (N, F).
    """
    tsize = table.shape[0]
    u = x01 * res                       # corner lattice (align_corners style)
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    i0 = jnp.clip(i0, 0, res - 1)
    out = 0.0
    primes = jnp.asarray(_PRIMES)  # uint32 wraparound hashing
    for corner in ((0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
                   (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)):
        offs = jnp.asarray(corner, jnp.int32)
        idx = jnp.clip(i0 + offs, 0, res)
        if (res + 1) ** 3 <= tsize:
            lin = (idx[:, 0] * (res + 1) + idx[:, 1]) * (res + 1) + idx[:, 2]
        else:
            h = idx.astype(jnp.uint32) * primes
            lin = jnp.remainder(h[:, 0] ^ h[:, 1] ^ h[:, 2], jnp.uint32(tsize))
        w = jnp.prod(jnp.where(offs == 1, frac, 1.0 - frac), axis=-1)
        out = out + w[:, None] * jnp.take(table, lin.astype(jnp.int32), axis=0)
    return out


class HashGridNet(struct.PyTreeNode):
    tables: Tuple[jnp.ndarray, ...]   # per level (T, F)
    decoder: Any
    rot_corr: jnp.ndarray
    trans_corr: jnp.ndarray
    Rwk: jnp.ndarray
    twk: jnp.ndarray
    bound: jnp.ndarray
    resolutions: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    table_size: int = struct.field(pytree_node=False, default=2**19)
    fdim: int = struct.field(pytree_node=False, default=2)
    pos_invariant: bool = struct.field(pytree_node=False, default=True)
    decoder_fixed: bool = struct.field(pytree_node=False, default=False)
    optimize_pose: bool = struct.field(pytree_node=False, default=False)
    anchor_kf: int = struct.field(pytree_node=False, default=0)

    @property
    def num_levels(self):
        return len(self.tables)

    @property
    def num_poses(self):
        return self.rot_corr.shape[0]

    def query_feature(self, x):
        lo = self.bound[:, 0]
        hi = self.bound[:, 1]
        x01 = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)
        feats = [hash_encode_level(t, x01, r)
                 for t, r in zip(self.tables, self.resolutions)]
        return jnp.concatenate(feats, axis=-1)

    def __call__(self, x):
        feats = self.query_feature(x)
        decoder = self.decoder
        if self.decoder_fixed:
            decoder = jax.lax.stop_gradient(decoder)
        inp = feats if self.pos_invariant else jnp.concatenate([feats, x], -1)
        return mlp_apply(decoder, inp)

    forward = __call__

    # GridNet-compatible pose API (grid_ngp.py duplicates GridNet's).
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


def create_hash_grid_net(key, cfg_model: Dict, bound=None,
                         dtype=jnp.float32) -> HashGridNet:
    h = cfg_model.get("hash", cfg_model.get("grid", {}))
    dcfg = cfg_model.get("decoder", {})
    pcfg = cfg_model.get("pose", {"num_poses": 1, "optimize": False})
    n_levels = int(h.get("n_levels", 8))
    fdim = int(h.get("feature_dim", 2))
    n_min = int(h.get("base_resolution", 16))
    growth = float(h.get("per_level_scale", 1.5))
    T = int(h.get("log2_hashmap_size", 19))
    table_size = 2**T if T < 64 else int(T)
    b = cfg_model.get("grid", {}).get("bound", [[-1, 1]] * 3)
    bound_np = np.asarray(bound if bound is not None else b, np.float32)
    resolutions = tuple(int(math.floor(n_min * growth**l)) for l in range(n_levels))
    tables = []
    for l in range(n_levels):
        key, k = jax.random.split(key)
        size = min((resolutions[l] + 1) ** 3, table_size)
        tables.append(jax.random.uniform(k, (size, fdim), dtype, -1e-4, 1e-4))
    key, kd = jax.random.split(key)
    in_dim = n_levels * fdim + (0 if dcfg.get("pos_invariant", True) else 3)
    decoder = mlp_init(kd, in_dim, int(dcfg.get("out_dim", 1)),
                       int(dcfg.get("hidden_dim", 64)),
                       int(dcfg.get("hidden_layers", 1)), bias=True, dtype=dtype)
    K = int(pcfg.get("num_poses", 1))
    return HashGridNet(
        tables=tuple(tables),
        decoder=decoder,
        rot_corr=jnp.zeros((K, 3), dtype),
        trans_corr=jnp.zeros((K, 3), dtype),
        Rwk=se3.identity_rotations(K, dtype),
        twk=jnp.zeros((K, 3), dtype),
        bound=jnp.asarray(bound_np),
        resolutions=resolutions,
        table_size=table_size,
        fdim=fdim,
        pos_invariant=bool(dcfg.get("pos_invariant", True)),
        decoder_fixed=bool(dcfg.get("fix", False)),
        optimize_pose=bool(pcfg.get("optimize", False)),
    )
