"""SE(3)/SO(3) property tests (replaces pytorch3d functionality)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from miso_tpu.ops import se3



@pytest.mark.fast
def test_exp_log_roundtrip(rng):
    w = rng.standard_normal((64, 3)) * 0.7
    R = se3.so3_exp(jnp.asarray(w))
    # Valid rotations.
    eye = np.broadcast_to(np.eye(3), (64, 3, 3))
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye, atol=1e-5)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, rtol=1e-4, atol=1e-4)


def test_exp_small_angle_smooth():
    w = jnp.zeros((1, 3))
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-7)
    # Differentiable at zero.
    g = jax.grad(lambda ww: jnp.sum(se3.so3_exp(ww)[..., 0, 1]))(w)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.fast
def test_transform_roundtrip(rng):
    pts = jnp.asarray(rng.standard_normal((100, 3)))
    R = se3.so3_exp(jnp.asarray(rng.standard_normal(3) * 0.5))
    t = jnp.asarray(rng.standard_normal(3))
    out = se3.transform_points_to(pts, R, t)
    back = se3.transform_points_from(out, R, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_transform_points_by_id_matches_loop(rng):
    """The batched gather transform equals the reference per-KF loop."""
    K, N = 5, 200
    R = se3.so3_exp(jnp.asarray(rng.standard_normal((K, 3)) * 0.3))
    t = jnp.asarray(rng.standard_normal((K, 3)))
    pts = jnp.asarray(rng.standard_normal((N, 3)))
    ids = jnp.asarray(rng.integers(0, K, N))
    fast = se3.transform_points_by_id(pts, ids, R, t)
    slow = np.zeros((N, 3))
    for k in range(K):
        m = np.asarray(ids) == k
        slow[m] = np.asarray(se3.transform_points_to(pts[m], R[k], t[k]))
    np.testing.assert_allclose(np.asarray(fast), slow, atol=1e-5)


def test_pose_composition(rng):
    R_sk = se3.so3_exp(jnp.asarray(rng.standard_normal((4, 3)) * 0.3))
    t_sk = jnp.asarray(rng.standard_normal((4, 3)))
    R_ws = se3.so3_exp(jnp.asarray(rng.standard_normal(3) * 0.3))
    t_ws = jnp.asarray(rng.standard_normal(3))
    R_wk, t_wk = se3.transform_poses_to(R_sk, t_sk, R_ws, t_ws)
    # Composition law via homogeneous matrices.
    for i in range(4):
        T = np.asarray(se3.pose_matrix(R_ws, t_ws)) @ np.asarray(se3.pose_matrix(R_sk[i], t_sk[i]))
        np.testing.assert_allclose(np.asarray(se3.pose_matrix(R_wk[i], t_wk[i])), T, atol=1e-5)
    R_back, t_back = se3.transform_poses_from(R_wk, t_wk, R_ws, t_ws)
    np.testing.assert_allclose(np.asarray(R_back), np.asarray(R_sk), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_back), np.asarray(t_sk), atol=1e-5)


@pytest.mark.fast
def test_apply_get_pose_correction(rng):
    R = se3.so3_exp(jnp.asarray(rng.standard_normal(3) * 0.2))
    t = jnp.asarray(rng.standard_normal(3))
    dr = jnp.asarray(rng.standard_normal(3) * 0.1)
    dt = jnp.asarray(rng.standard_normal(3))
    R2, t2 = se3.apply_pose_correction(R, t, dr, dt)
    dr2, dt2 = se3.get_pose_correction(R, t, R2, t2)
    np.testing.assert_allclose(np.asarray(dr2), np.asarray(dr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dt2), np.asarray(dt), atol=1e-5)


@pytest.mark.fast
def test_coords_in_bound():
    bound = jnp.asarray(np.array([[0.0, 1.0], [0.0, 1.0], [0.0, 1.0]]))
    pts = jnp.asarray(np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [0.0, 1.0, 0.5]]))
    m = se3.coords_in_bound(pts, bound)
    np.testing.assert_allclose(np.asarray(m).ravel(), [1.0, 0.0, 1.0])


@pytest.mark.fast
def test_rotation_metrics(rng):
    R1 = se3.so3_exp(jnp.asarray(rng.standard_normal((8, 3)) * 0.2))
    np.testing.assert_allclose(float(se3.rotation_rmse_deg(R1, R1)), 0.0, atol=1e-2)
    dr = jnp.asarray(np.tile([0.1, 0, 0], (8, 1)))
    R2 = R1 @ se3.so3_exp(dr)
    np.testing.assert_allclose(float(se3.rotation_rmse_deg(R1, R2)), np.degrees(0.1), atol=1e-2)
