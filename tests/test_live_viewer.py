"""Live web viewer: page + state endpoint served from a SLAM-style loop."""
import json
import urllib.request

import numpy as np
import pytest

from miso_tpu.slam.live_viewer import LiveViewer, submap_box_corners

pytestmark = pytest.mark.fast


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.status, r.read()


def test_live_viewer_serves_page_and_state(rng):
    v = LiveViewer(port=0)  # ephemeral port
    try:
        status, body = _get(v.port, "/")
        assert status == 200
        assert b"miso_tpu live" in body and b"state.json" in body

        traj = np.cumsum(rng.normal(0, 0.1, (20, 3)), axis=0)
        box = submap_box_corners(
            np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32),
            np.eye(3), np.zeros(3))
        assert box.shape == (8, 3)
        verts = rng.normal(0, 1, (30, 3)).astype(np.float32)
        tris = rng.integers(0, 30, (40, 3)).astype(np.int32)
        v.update(frame=7, traj_est=traj, traj_gt=traj + 0.01,
                 frame_points=rng.normal(0, 1, (5000, 3)),
                 submap_boxes=[box], mesh=(verts, tris), num_submaps=1)

        status, body = _get(v.port, "/state.json")
        assert status == 200
        st = json.loads(body)
        assert st["frame"] == 7 and st["num_submaps"] == 1
        assert len(st["traj_est"]) == 20 and len(st["traj_gt"]) == 20
        assert len(st["frame_points"]) == 2000        # decimated cap
        assert len(st["submap_boxes"][0]) == 8
        assert 0 < len(st["mesh_edges"]) <= 4000
        # Incremental update keeps previous fields.
        v.update(frame=8)
        st2 = json.loads(_get(v.port, "/state.json")[1])
        assert st2["frame"] == 8 and len(st2["traj_est"]) == 20
    finally:
        v.close()


def test_visualizer_live_wiring(tmp_path):
    """Visualizer(cfg visualizer.live) starts/stops the server."""
    import jax

    from miso_tpu.models.grid_atlas import GridAtlas
    from miso_tpu.slam.visualizer import Visualizer

    cfg_model = {
        "spatial_dim": 3,
        "grid": {"type": "regular", "feature_dim": 2, "init_stddev": 0.0,
                 "bound": [[-1, 1], [-1, 1], [-1, 1]],
                 "base_cell_size": 0.5, "per_level_scale": 2.0, "n_levels": 2},
        "decoder": {"type": "mlp", "hidden_dim": 8, "hidden_layers": 1,
                    "out_dim": 1, "pos_invariant": True, "fix": False,
                    "pretrained_model": None},
        "pose": {"optimize": False, "num_poses": 2},
    }
    atlas = GridAtlas(cfg_model, max_kfs_per_submap=2)
    atlas.add_submap(np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32))
    atlas.add_kf()
    vis = Visualizer(atlas, {"visualizer": {"enable": True, "live": True,
                                            "live_port": 0, "show_mesh": False},
                             "system": {"log_dir": str(tmp_path)}})
    try:
        vis.set_current_frame_points(np.zeros((10, 3), np.float32))
        vis.update_geometries(stop_frame=1)
        st = json.loads(_get(vis.live.port, "/state.json")[1])
        assert st["frame"] == 1 and st["num_submaps"] == 1
        assert len(st["submap_boxes"]) == 1
    finally:
        vis.quit()
