"""Checkpointing: pytree save/load.

Replaces the reference's torch.save pickles (`trainer.py:319-332`,
`build_submaps.py:141`).  Arrays are stored in a compressed npz with a
flattened key-path encoding, so checkpoints are portable, inspectable,
and free of pickle code execution.  Orbax is used for full train-state
checkpoints when available.

Also provides a torch-checkpoint importer so the reference's pretrained
decoder weights (`decoder_indoor.pt`, `decoder_quad.pt`) can be reused
for parity experiments.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_pytree(path: str, tree: Any, meta: Optional[dict] = None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays, _ = _flatten_with_paths(tree)
    arrays = {f"arr::{k}": v for k, v in arrays.items()}
    if meta is not None:
        arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pytree(path: str, like: Any):
    """Load arrays saved by save_pytree into the structure of ``like``."""
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in flat:
        key = "arr::" + "/".join(str(q) for q in p)
        arr = data[key]
        assert arr.shape == tuple(np.shape(leaf)), f"{key}: {arr.shape} vs {np.shape(leaf)}"
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_meta(path: str) -> Optional[dict]:
    data = np.load(path, allow_pickle=False)
    if "__meta__" not in data:
        return None
    return json.loads(bytes(data["__meta__"]).decode())


def save_model_pickle(path: str, tree: Any):
    """Whole-model pickle including static fields (GridNet/GridAtlas).

    Equivalent of ``torch.save(grid_atlas)`` (build_submaps.py:141); for
    array-only exchange prefer save_pytree.
    """
    import pickle

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host = jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_model_pickle(path: str):
    import pickle

    with open(path, "rb") as f:
        host = pickle.load(f)
    return jax.tree_util.tree_map(jnp.asarray, host)


def import_torch_mlp_decoder(path: str):
    """Convert a reference MLPNet state_dict (.pt) to miso_tpu MLP params.

    The reference decoder is nn.Sequential of Linear layers
    (modules.py:11-21); torch stores (out, in) weights -> transpose.
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    # Keys like 'network.0.weight', 'network.2.weight', ...
    idxs = sorted({int(k.split(".")[1]) for k in sd if k.endswith(".weight")})
    params = []
    for i in idxs:
        W = jnp.asarray(sd[f"network.{i}.weight"].numpy().T)
        b_key = f"network.{i}.bias"
        b = jnp.asarray(sd[b_key].numpy()) if b_key in sd else None
        params.append((W, b))
    return tuple(params)
