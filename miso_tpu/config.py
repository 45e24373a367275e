"""Config loading + factory registry (reference `grid_opt/configs.py`).

YAML with recursive ``inherit_from`` and deep-merge over an optional
default file (configs.py:21-70); factories map named entries to model /
loss / dataset / trainer constructors (configs.py:73-295).  The
reference's if/elif chains become registries so user code can add
entries without editing the framework.
"""
from __future__ import annotations

import copy
import os
from typing import Any, Callable, Dict, Optional

import yaml


def update_recursive(dict1: Dict, dict2: Dict):
    """Deep-merge dict2 into dict1 (configs.py:56-70)."""
    for k, v in dict2.items():
        if isinstance(v, dict):
            if not isinstance(dict1.get(k), dict):
                dict1[k] = {}
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def load_config(path: str, default_path: Optional[str] = None) -> Dict:
    """Load YAML config with recursive inherit_from (configs.py:21-53)."""
    with open(path, "r") as f:
        cfg_special = yaml.full_load(f)
    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        if not os.path.isabs(inherit_from):
            cand = os.path.join(os.path.dirname(path), inherit_from)
            inherit_from = cand if os.path.exists(cand) else inherit_from
        cfg = load_config(inherit_from, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.full_load(f)
    else:
        cfg = {}
    update_recursive(cfg, cfg_special)
    return cfg


def save_config(cfg: Dict, path: str):
    """Dump the config snapshot (configs.py:290-293)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(_yaml_safe(cfg), f)


def _yaml_safe(x):
    import numpy as np

    if isinstance(x, dict):
        return {k: _yaml_safe(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_yaml_safe(v) for v in x]
    if isinstance(x, np.ndarray):
        return x.tolist()
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    return x


# ---------------------------------------------------------------------------
# Registries.
# ---------------------------------------------------------------------------

MODEL_REGISTRY: Dict[str, Callable] = {}
LOSS_REGISTRY: Dict[str, Callable] = {}
DATASET_REGISTRY: Dict[str, Callable] = {}


def register_model(name):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco


def register_loss(name):
    def deco(fn):
        LOSS_REGISTRY[name] = fn
        return fn
    return deco


def register_dataset(name):
    def deco(fn):
        DATASET_REGISTRY[name] = fn
        return fn
    return deco


def cfg_model(cfg: Dict, key=None, **kwargs):
    """Build the model named in cfg['model']['name'] (configs.py:73-119)."""
    import jax

    name = cfg["model"]["name"]
    if name not in MODEL_REGISTRY:
        _register_builtins()
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model: {name}")
    key = key if key is not None else jax.random.PRNGKey(cfg.get("seed", 0))
    return MODEL_REGISTRY[name](cfg, key, **kwargs)


def cfg_loss(cfg: Dict, **kwargs):
    """Build the loss named in cfg['loss']['name'] (configs.py:122-196).
    Returns a (model, batch, key) -> dict callable."""
    name = cfg["loss"]["name"]
    if name not in LOSS_REGISTRY:
        _register_builtins()
    if name not in LOSS_REGISTRY:
        raise ValueError(f"Unknown loss: {name}")
    return LOSS_REGISTRY[name](cfg, **kwargs)


def cfg_dataset(cfg: Dict, **kwargs):
    """Build the dataset named in cfg['dataset']['name']
    (configs.py:199-261).  No DataLoader: datasets sample fixed-shape
    host batches directly."""
    name = cfg["dataset"]["name"]
    if name not in DATASET_REGISTRY:
        _register_builtins()
    if name not in DATASET_REGISTRY:
        raise ValueError(f"Unknown dataset: {name}")
    return DATASET_REGISTRY[name](cfg, **kwargs)


def cfg_trainer(cfg: Dict, model, loss_fn, dataset, val_dataset=None, **kwargs):
    """Build base/grid trainer (configs.py:264-295) and snapshot cfg."""
    from miso_tpu.train.trainer import GridTrainer, Trainer

    cfg_train = cfg["train"]
    log_dir = cfg_train.get("log_dir")
    if log_dir:
        save_config(cfg, os.path.join(log_dir, "cfg.yaml"))
    kind = cfg_train.get("trainer", "base")
    cls = GridTrainer if kind == "grid" else Trainer
    return cls(cfg_train, model, loss_fn, dataset, val_dataset, **kwargs)


_BUILTINS_DONE = False


def _register_builtins():
    global _BUILTINS_DONE
    if _BUILTINS_DONE:
        return
    _BUILTINS_DONE = True

    from miso_tpu.losses.miso import (make_loss, mapping_loss, posed_sdf_loss_3d,
                                      tracking_loss)
    from miso_tpu.losses.fusion import fusion_loss, posed_sdf_loss_3d_submap
    from miso_tpu.losses.sdf import sdf_loss_2d, sdf_loss_3d, tsdf_loss_3d
    from miso_tpu.losses.isdf_loss import isdf_loss, isdf_loss_submap
    from miso_tpu.models.grid_net import create_grid_net

    # -- models (configs.py:73-119) ----------------------------------------
    @register_model("grid_net")
    def _grid_net(cfg, key, **kw):
        return create_grid_net(key, cfg["model"], **kw)

    @register_model("grid_atlas")
    def _grid_atlas(cfg, key, **kw):
        from miso_tpu.models.grid_atlas import GridAtlas
        sys_cfg = cfg.get("system", {})
        return GridAtlas(cfg["model"],
                         max_kfs_per_submap=sys_cfg.get("submap_size", 1),
                         capacity=sys_cfg.get("submap_capacity"))

    @register_model("isdf")
    def _isdf(cfg, key, **kw):
        from miso_tpu.models.isdf import create_isdf
        return create_isdf(key, cfg["model"], **kw)

    @register_model("pointsdf")
    def _pointsdf(cfg, key, **kw):
        from miso_tpu.models.pointsdf import create_pointsdf
        return create_pointsdf(key, cfg["model"], **kw)

    @register_model("ngp")
    def _ngp(cfg, key, **kw):
        from miso_tpu.models.hashgrid import create_hash_grid_net
        return create_hash_grid_net(key, cfg["model"], **kw)

    # -- losses (configs.py:122-196) ---------------------------------------
    def _kw(cfg, keys, rename=None):
        c = cfg["loss"]
        out = {}
        rename = rename or {}
        for k in keys:
            if k in c:
                out[rename.get(k, k)] = c[k]
        return out

    @register_loss("Sdf2D")
    def _sdf2d(cfg):
        return make_loss(sdf_loss_2d, **_kw(cfg, ["sdf_weight"]))

    @register_loss("Sdf3D")
    def _sdf3d(cfg):
        return make_loss(sdf_loss_3d, **_kw(cfg, ["sdf_weight"]))

    @register_loss("Tsdf3D")
    def _tsdf3d(cfg):
        return make_loss(tsdf_loss_3d, **_kw(cfg, [
            "sdf_weight", "sign_weight", "eik_weight", "trunc_dist",
            "grad_method", "finite_diff_eps"]))

    @register_loss("PosedSdf3D")
    def _posed(cfg):
        return make_loss(posed_sdf_loss_3d, **_kw(cfg, [
            "sdf_weight", "sign_weight", "eik_weight", "smooth_weight",
            "trunc_dist", "smooth_std", "grad_method", "finite_diff_eps"],
            rename={}))

    @register_loss("PosedSdf3DSubmap")
    def _posed_submap(cfg):
        c = cfg["loss"]
        return make_loss(posed_sdf_loss_3d_submap,
                         sdf_weight=c.get("sdf_weight", 3e3),
                         sign_weight=c.get("sign_weight", 1e2),
                         smooth_weight=c.get("smooth_weight", 0.0),
                         smooth_std=c.get("smooth_std", 0.1),
                         trunc_dist=c.get("trunc_dist", 0.15),
                         grad_method=c.get("grad_method", "finitediff"),
                         finite_diff_eps=c.get("finite_diff_eps", 1e-2),
                         loss_type=c.get("type", "L2"),
                         pose_reg_weight=c.get("pose_reg_weight", 0.0))

    @register_loss("MisoTracking")
    def _tracking(cfg):
        c = cfg.get("tracking", cfg.get("loss", {}))
        return make_loss(tracking_loss, loss_type=c.get("loss_type", "L2"),
                         trunc_dist=c.get("trunc_dist"),
                         gm_scale_sdf=c.get("gm_scale_sdf", 1.0))

    @register_loss("MisoMapping")
    def _mapping(cfg):
        c = cfg.get("mapping", cfg.get("loss", {}))
        return make_loss(mapping_loss, loss_type=c.get("loss_type", "L1"),
                         weight_sdf=c.get("weight_sdf", 1.0),
                         weight_eik=c.get("weight_eik", 0.0),
                         weight_fs=c.get("weight_fs", 0.0),
                         trunc_dist=c.get("trunc_dist", 0.15),
                         finite_diff_eps=c.get("finite_diff_eps", 1e-2),
                         grad_method=c.get("grad_method", "finitediff"),
                         eik_trunc_dist=c.get("eik_trunc_dist", 0.1))

    @register_loss("MisoFusion")
    def _fusion(cfg):
        c = cfg.get("mapping", cfg.get("loss", {}))
        return make_loss(fusion_loss, loss_type=c.get("loss_type", "L1"),
                         weight_sdf=c.get("weight_sdf", 1.0),
                         weight_eik=c.get("weight_eik", 0.0),
                         weight_fs=c.get("weight_fs", 0.0),
                         trunc_dist=c.get("trunc_dist", 0.15),
                         finite_diff_eps=c.get("finite_diff_eps", 1e-2),
                         grad_method=c.get("grad_method", "finitediff"),
                         eik_trunc_dist=c.get("eik_trunc_dist", 0.1))

    @register_loss("iSDF")
    def _isdf_loss(cfg):
        c = cfg["loss"]
        return make_loss(isdf_loss,
                         trunc_dist=c.get("trunc_dist", 0.15),
                         sdf_weight=c.get("sdf_weight", 1.0),
                         grad_weight=c.get("grad_weight", 0.0),
                         eik_weight=c.get("eik_weight", 0.0),
                         eik_apply_dist=c.get("eik_apply_dist", 0.1),
                         free_space_factor=c.get("free_space_factor", 5.0))

    @register_loss("iSDFSubmap")
    def _isdf_submap(cfg):
        c = cfg["loss"]
        return make_loss(isdf_loss_submap,
                         trunc_dist=c.get("trunc_dist", 0.15),
                         sdf_weight=c.get("sdf_weight", 1.0),
                         eik_weight=c.get("eik_weight", 0.0),
                         eik_apply_dist=c.get("eik_apply_dist", 0.1),
                         free_space_factor=c.get("free_space_factor", 5.0),
                         pose_reg_weight=c.get("pose_reg_weight", 0.0),
                         stability_weight=c.get("stability_weight", 0.0))

    # -- datasets (configs.py:199-261) -------------------------------------
    @register_dataset("Sdf2D")
    def _d_sdf2d(cfg):
        from miso_tpu.datasets.sdf_2d import Sdf2D
        d = cfg["dataset"]
        return Sdf2D(d["path"], batch_size=cfg["train"].get("batch_size", 2**14))

    @register_dataset("Sdf3D")
    def _d_sdf3d(cfg):
        from miso_tpu.datasets.sdf_3d import Sdf3D
        d = cfg["dataset"]
        return Sdf3D(d["path"], batch_size=cfg["train"].get("batch_size", 2**16),
                     trunc_dist=d.get("trunc_dist"))

    @register_dataset("PosedSdf3D")
    def _d_posed(cfg):
        from miso_tpu.datasets.sdf_3d import PosedSdf3D
        d = cfg["dataset"]
        return PosedSdf3D(d["path"],
                          frame_batchsize=d.get("frame_batchsize", 2**14),
                          frame_samples=d.get("frame_samples", 2**14),
                          num_frames=d.get("num_frames", 64),
                          trunc_dist=d.get("trunc_dist", 0.15))

    @register_dataset("PosedSdf3DLidar")
    def _d_lidar(cfg):
        from miso_tpu.datasets.lidar import PosedSdf3DLidar
        return PosedSdf3DLidar(cfg)

    @register_dataset("ScanNet")
    def _d_scannet(cfg):
        from miso_tpu.datasets.scannet import ScanNet
        return ScanNet(cfg)

    @register_dataset("ReplicaCAD")
    def _d_replica(cfg):
        from miso_tpu.datasets.replica import ReplicaCAD
        return ReplicaCAD(cfg)

    @register_dataset("FastCaMo")
    def _d_fastcamo(cfg):
        from miso_tpu.datasets.fastcamo import FastCaMo
        return FastCaMo(cfg)
