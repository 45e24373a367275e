"""SE(3) / SO(3) utilities in pure JAX.

TPU-native replacement for the reference's pytorch3d usage
(`grid_opt/utils/utils_geometry.py`, pytorch3d `so3_exp_map`,
`matrix_to_axis_angle`, `hat`).  Everything is batched and jit-safe.

Conventions follow the reference: rotations are (..., 3, 3) matrices,
translations are (..., 3) vectors (the reference uses (3, 1) columns; we
use flat (3,) and keep the math identical).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# TPU matmuls default to bf16 inputs; pose math is tiny (3x3) and must be
# exact, so every matmul/einsum here requests full float32 precision.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) vectors -> (..., 3, 3).

    Mirrors pytorch3d.transforms.so3.hat (used by the LM tracker,
    reference `grid_opt/slam/tracker.py:182`).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3) for (..., 3) tangent vectors.

    Rodrigues formula with a second-order Taylor fallback near 0 so the
    map is smooth and differentiable everywhere (pytorch3d
    `so3_exp_map` equivalent; reference `grid_opt/models/grid_net.py:260`).
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    W = hat(w)
    W2 = _mm(W, W)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.  The untaken
    # branch must stay finite (double-where trick) or jax.grad produces
    # NaN at theta == 0.
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta_safe) / theta_safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta_safe)) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SO(3) -> so(3), returns (..., 3) axis-angle.

    Replacement for pytorch3d matrix_to_axis_angle (reference
    `grid_opt/utils/utils_geometry.py:118`).  Stable away from theta=pi;
    near pi it falls back to the symmetric-part extraction.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Skew part.
    w_skew = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # Double-where guard: arccos' gradient blows up at cos=1, which is
    # exactly where pose-graph edge residuals converge, so the small
    # branch must never see arccos(1).  There scale is evaluated as a
    # polynomial of sin^2(theta) = ||skew||^2/4 (exact in R, finite
    # gradient): theta/(2 sin theta) = 0.5 + theta^2/12 + O(theta^4).
    small = cos > 1.0 - 1e-6
    cos_safe = jnp.where(small, 0.0, cos)
    theta = jnp.where(small, 0.0, jnp.arccos(cos_safe))
    sin = jnp.sin(theta)
    sin2 = 0.25 * jnp.sum(w_skew**2, axis=-1)
    scale = jnp.where(small[..., None], 0.5 + sin2[..., None] / 12.0,
                      theta[..., None] / (2.0 * jnp.maximum(sin[..., None], _EPS)))
    w = w_skew * scale
    # Near pi: use diagonal extraction.
    # Wide crossover: the skew-part formula loses ~theta/sin(theta)
    # digits of fp32 precision approaching pi; the diagonal extraction
    # is exact there.
    near_pi = theta > jnp.pi - 1e-2

    def _axis_from_diag(R, theta):
        A = (R + jnp.swapaxes(R, -1, -2)) * 0.5
        d = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
        axis2 = jnp.clip((d - cos[..., None]) / jnp.maximum(1.0 - cos[..., None], _EPS), 0.0, 1.0)
        # Double-where: sqrt'(0) is inf and jnp.where does not stop the
        # untaken near-pi branch from polluting gradients at theta<<pi.
        tiny = axis2 < 1e-12
        axis = jnp.where(tiny, 0.0, jnp.sqrt(jnp.where(tiny, 1.0, axis2)))
        # Fix signs using off-diagonal skew entries.
        sign = jnp.where(w_skew >= 0, 1.0, -1.0)
        return axis * sign * theta[..., None]

    return jnp.where(near_pi[..., None], _axis_from_diag(R, theta), w)


def so3_relative_angle(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Angle (rad) between batches of rotations (pytorch3d equivalent)."""
    R12 = _mm(jnp.swapaxes(R1, -1, -2), R2)
    trace = R12[..., 0, 0] + R12[..., 1, 1] + R12[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(cos)


def apply_pose_correction(R, t, dr, dt):
    """R' = R @ Exp(dr),  t' = t + dt.

    Reference `grid_opt/utils/utils_geometry.py:78-99`.
    R (..., 3, 3), t (..., 3), dr (..., 3), dt (..., 3).
    """
    return _mm(R, so3_exp(dr)), t + dt


def get_pose_correction(R, t, R_new, t_new):
    """Inverse of apply_pose_correction (reference utils_geometry.py:101-119)."""
    dr = so3_log(_mm(jnp.swapaxes(R, -1, -2), R_new))
    return dr, t_new - t


def transform_points_to(points, R, t):
    """points (..., N, 3) in src frame -> dst frame via (R, t) dst<-src.

    Reference `utils_geometry.py:214-225`: x_dst = x_src @ R^T + t.
    Supports batched R (..., 3, 3), t (..., 3).
    """
    return jnp.einsum("...ij,...nj->...ni", R, points, precision=_HI) + t[..., None, :]


def transform_points_from(points, R, t):
    """Inverse transform (reference `utils_geometry.py:227-240`)."""
    return jnp.einsum("...ji,...nj->...ni", R, points - t[..., None, :], precision=_HI)


def transform_points_by_id(points, ids, R, t):
    """Per-point pose transform: columnar gathers, no per-frame loop.

    Replaces the reference's per-keyframe Python loop
    (`grid_opt/loss.py:208-217` etc.).

    COLUMNAR (CLAUDE.md rule 3): nine (N,) 1-axis gathers R[ids, j, k]
    and fused multiply-adds.  The obvious ``einsum("nij,nj->ni",
    R[ids], points)`` materializes an (N, 3, 3) gather and contracts
    over the minor dim -- measured 1.97 ms / 1M points AND a
    pathological several-minute Mosaic compile on v5e; the columnar
    form is pure (N,)-lane work.

    points: (N, 3), ids: (N,) int frame indices, R: (K, 3, 3), t: (K, 3).
    """
    cols = []
    for j in range(3):
        acc = t[ids, j]
        for k in range(3):
            acc = acc + R[ids, j, k] * points[:, k]
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def transform_points_by_id2(points, ids_a, ids_b, R, t):
    """Two-level per-point pose transform: ``R[a, b] @ p + t[a, b]``
    with per-point (submap, local-kf) index pairs, columnar like
    :func:`transform_points_by_id` (nine (N,) gathers + multiply-adds;
    the gathered-(N,3,3) einsum form hits a pathological minor-dim
    layout on TPU).

    points: (N, 3); ids_a/ids_b: (N,) ints; R: (S, K, 3, 3), t: (S, K, 3).
    """
    cols = []
    for j in range(3):
        acc = t[ids_a, ids_b, j]
        for k in range(3):
            acc = acc + R[ids_a, ids_b, j, k] * points[:, k]
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def inverse_transform_points_by_id(points, ids, R, t):
    """Per-point INVERSE pose transform: ``R[ids]^T (points - t[ids])``
    columnar (see transform_points_by_id).  Maps world points into each
    point's own frame -- the align losses' dst-side coordinate map.
    """
    d = [points[:, k] - t[ids, k] for k in range(3)]
    cols = []
    for j in range(3):
        acc = R[ids, 0, j] * d[0]
        for k in range(1, 3):
            acc = acc + R[ids, k, j] * d[k]
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def transform_poses_to(R_frames, t_frames, R, t):
    """Compose: world<-frames given world<-src and src<-frames.

    Reference `utils_geometry.py:242-261`.
    R_frames (..., 3, 3), t_frames (..., 3); R (3, 3), t (3,).
    """
    R_out = jnp.einsum("ij,...jk->...ik", R, R_frames, precision=_HI)
    t_out = jnp.einsum("ij,...j->...i", R, t_frames, precision=_HI) + t
    return R_out, t_out


def transform_poses_from(R_frames, t_frames, R, t):
    """Reference `utils_geometry.py:263-278`."""
    R_inv = R.T
    t_inv = -_mm(R.T, t)
    return transform_poses_to(R_frames, t_frames, R_inv, t_inv)


def pose_matrix(R, t):
    """(3,3),(3,) -> 4x4 homogeneous matrix (reference utils_geometry.py:61-76)."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t.reshape(3))
    return T


def coords_in_bound(coords, bound):
    """(N, d) points, (d, 2) bound -> (N, 1) float mask.

    Reference `utils_geometry.py:11-27` (boolean); we return float for
    multiplicative masking under jit.
    """
    inside = jnp.logical_and(coords >= bound[:, 0], coords <= bound[:, 1])
    return jnp.all(inside, axis=-1, keepdims=True).astype(coords.dtype)


def rotation_rmse_deg(R1, R2):
    """RMSE of relative angles in degrees (reference utils_geometry.py:160-173)."""
    ang = so3_relative_angle(R1, R2)
    return jnp.degrees(jnp.sqrt(jnp.mean(ang**2)))


def rotation_mean_error_deg(R1, R2):
    ang = so3_relative_angle(R1, R2)
    return jnp.degrees(jnp.mean(jnp.abs(ang)))


def translation_rmse(t1, t2):
    d = jnp.linalg.norm(t1.reshape(-1, 3) - t2.reshape(-1, 3), axis=-1)
    return jnp.sqrt(jnp.mean(d**2))


def translation_mean_error(t1, t2):
    d = jnp.linalg.norm(t1.reshape(-1, 3) - t2.reshape(-1, 3), axis=-1)
    return jnp.mean(d)


def identity_rotations(n, dtype=jnp.float32):
    return jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3))


def aabb(points: jnp.ndarray, buffer: float = 0.0) -> jnp.ndarray:
    """Axis-aligned bounding box (d, 2) of (N, d) points (utils_geometry.py:280-290)."""
    lo = points.min(axis=0) - buffer
    hi = points.max(axis=0) + buffer
    return jnp.stack([lo, hi], axis=1)


# ---------------------------------------------------------------------------
# Random pose generation (host-side, numpy-compatible); reference
# utils_geometry.py:121-158.  Used for noise injection in synthetic data.
# ---------------------------------------------------------------------------

def wrapped_gaussian_rotations(key, n, std_rad=0.1):
    w = jax.random.normal(key, (n, 3)) * std_rad
    return so3_exp(w)


def fixed_angle_rotations(key, n, rad):
    axis = jax.random.normal(key, (n, 3))
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + _EPS)
    return so3_exp(axis * rad)


def gaussian_translations(key, n, std):
    return jax.random.normal(key, (n, 3)) * std


def fixed_length_translations(key, n, length):
    d = jax.random.normal(key, (n, 3))
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + _EPS)
    return d * length
