"""Torch-oracle parity for loss semantics (VERDICT r2 item 7).

Imports the reference's pure-torch loss helpers from /root/reference
(read-only) and asserts numerical equality with miso_tpu's functional
rewrites on identical inputs -- the same oracle strategy
tests/test_interp.py uses with F.grid_sample.  Guards SURVEY hard-part
#7 (silent semantic drift where real-data comparison is impossible).

pytorch3d / open3d are not installed; minimal stubs are registered so
``grid_opt.loss`` imports (so3_exp_map is implemented for real since the
pose tests use it as an oracle too).
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _install_reference(monkeypatch=None):
    if "grid_opt.loss" in sys.modules:
        return sys.modules["grid_opt.loss"]

    def so3_exp_map(log_rot):
        """Rodrigues (pytorch3d-compatible): (N, 3) -> (N, 3, 3)."""
        theta = torch.linalg.norm(log_rot, dim=1, keepdim=True)  # (N, 1)
        theta = theta.clamp(min=1e-12)
        k = log_rot / theta
        K = torch.zeros(log_rot.shape[0], 3, 3, dtype=log_rot.dtype)
        K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
        K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
        K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
        st = torch.sin(theta)[:, :, None]
        ct = torch.cos(theta)[:, :, None]
        eye = torch.eye(3, dtype=log_rot.dtype).expand_as(K)
        return eye + st * K + (1 - ct) * (K @ K)

    def so3_relative_angle(R1, R2):
        cos = ((R1 @ R2.transpose(-1, -2)).diagonal(dim1=-2, dim2=-1)
               .sum(-1) - 1.0) / 2.0
        return torch.acos(cos.clamp(-1.0, 1.0))

    def matrix_to_axis_angle(R):
        cos = (R.diagonal(dim1=-2, dim2=-1).sum(-1) - 1.0) / 2.0
        theta = torch.acos(cos.clamp(-1.0, 1.0))
        w = torch.stack([R[..., 2, 1] - R[..., 1, 2],
                         R[..., 0, 2] - R[..., 2, 0],
                         R[..., 1, 0] - R[..., 0, 1]], dim=-1)
        s = torch.sin(theta).clamp(min=1e-12)
        return w * (theta / (2.0 * s))[..., None]

    if "pytorch3d" not in sys.modules:
        p3d = types.ModuleType("pytorch3d")
        tfm = types.ModuleType("pytorch3d.transforms")
        tfm.so3_exp_map = so3_exp_map
        tfm.so3_relative_angle = so3_relative_angle
        tfm.matrix_to_axis_angle = matrix_to_axis_angle
        p3d.transforms = tfm
        sys.modules["pytorch3d"] = p3d
        sys.modules["pytorch3d.transforms"] = tfm
    # Heavy geometry deps the helpers under test never call; stub the
    # ones this environment lacks so the module imports.
    for name in ("open3d", "trimesh", "mcubes", "pysdf", "cv2"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    import grid_opt.loss as ref_loss
    return ref_loss


@pytest.fixture(scope="module")
def ref_loss():
    try:
        return _install_reference()
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference import failed: {e}")


def test_regression_loss_matches_reference(ref_loss, rng):
    from miso_tpu.losses.common import regression_loss

    N, d = 257, 3
    pred = rng.normal(0, 1, (N, d)).astype(np.float32)
    targ = rng.normal(0, 1, (N, d)).astype(np.float32)
    mask = (rng.uniform(size=(N, 1)) < 0.7).astype(np.float32)
    w = rng.uniform(0.1, 2.0, (N, 1)).astype(np.float32)
    for loss_type in ("L1", "L2", "Cosine"):
        want = float(ref_loss.miso_loss_regression(
            torch.from_numpy(pred), torch.from_numpy(targ),
            torch.from_numpy(mask), torch.from_numpy(w), loss_type))
        got = float(regression_loss(pred, targ, mask, w, loss_type))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=loss_type)
        # Also the no-mask default path.
        want = float(ref_loss.miso_loss_regression(
            torch.from_numpy(pred), torch.from_numpy(targ),
            loss_type=loss_type))
        got = float(regression_loss(pred, targ, loss_type=loss_type))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_free_space_loss_matches_reference(ref_loss, rng):
    from miso_tpu.losses.common import free_space_loss

    N = 511
    pred = rng.normal(0, 0.3, (N, 1)).astype(np.float32)
    gt = rng.uniform(0.0, 0.5, (N, 1)).astype(np.float32)
    sign = (rng.uniform(size=(N, 1)) < 0.4).astype(np.float32)
    trunc = 0.15
    want = float(ref_loss.miso_loss_free_space(
        torch.from_numpy(pred), torch.from_numpy(gt),
        torch.from_numpy(sign), trunc))
    got = float(free_space_loss(pred, gt, sign, trunc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_gm_irls_matches_reference_formula(ref_loss, rng):
    """GM-IRLS: w = c/(c+e^2)^2 with DETACHED e (loss.py:570-573).
    Values via the reference's torch arithmetic; the detach semantics
    (gradient treats w as constant) checked via torch.autograd."""
    import jax
    import jax.numpy as jnp

    from miso_tpu.losses.common import gm_weighted_sq

    N = 301
    res = rng.normal(0, 0.2, (N, 1)).astype(np.float32)
    gm_scale = 0.1
    # Reference arithmetic (MisoLossTracking.compute, loss.py:570-573).
    e = torch.from_numpy(res).clone().detach().requires_grad_(True)
    w = gm_scale / (gm_scale + e.detach() ** 2) ** 2
    ref_val = torch.mean(w * e**2)
    ref_val.backward()
    got = np.asarray(jnp.mean(gm_weighted_sq(jnp.asarray(res), gm_scale)))
    np.testing.assert_allclose(got, float(ref_val), rtol=1e-5, atol=1e-8)
    # Gradient parity (detached weights).
    g = jax.grad(lambda r: jnp.mean(gm_weighted_sq(r, gm_scale)))(
        jnp.asarray(res))
    np.testing.assert_allclose(np.asarray(g), e.grad.numpy(),
                               rtol=1e-4, atol=1e-7)


def test_eikonal_loss_matches_reference(ref_loss, rng):
    """Eikonal on an analytic field: the reference gathers the |gt|<trunc
    subset and means over it (loss.py:638-665); ours uses a masked mean."""
    import jax.numpy as jnp

    from miso_tpu.losses.common import eikonal_loss_at

    N = 400
    x = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    gt = rng.uniform(-0.3, 0.3, (N, 1)).astype(np.float32)
    trunc = 0.1

    class TorchField(torch.nn.Module):
        def forward(self, p):
            return (torch.sin(p[:, :1]) * torch.cos(p[:, 1:2])
                    + 0.5 * p[:, 2:3] ** 2)

    def jax_field(p):
        return (jnp.sin(p[:, :1]) * jnp.cos(p[:, 1:2])
                + 0.5 * p[:, 2:3] ** 2)

    want = float(ref_loss.miso_loss_eikonal(
        TorchField(), torch.from_numpy(x), torch.from_numpy(gt),
        trunc, "autograd", 1e-2))
    sel = (np.abs(gt) < trunc).astype(np.float32)
    got = float(eikonal_loss_at(jax_field, jnp.asarray(x), jnp.asarray(sel),
                                "autograd", 1e-2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_so3_exp_matches_pytorch3d_semantics(ref_loss, rng):
    """Our se3.so3_exp against the Rodrigues oracle (the reference's
    pose updates compose via pytorch3d.so3_exp_map, grid_net.py:7)."""
    from miso_tpu.ops import se3

    w = rng.normal(0, 0.7, (32, 3)).astype(np.float32)
    from pytorch3d.transforms import so3_exp_map

    want = so3_exp_map(torch.from_numpy(w.astype(np.float64))).numpy()
    got = np.asarray(se3.so3_exp(w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_isdf_sdf_loss_matches_reference(rng):
    """iSDF eq-6 bounds loss vs the reference's module-level
    ``sdf_loss`` (loss_isdf.py:299-333): per-sample loss matrix and
    free-space mask must agree for L1 and L2."""
    _install_reference()
    import importlib

    try:
        ref_isdf = importlib.import_module("grid_opt.loss_isdf")
    except Exception as e:
        pytest.skip(f"loss_isdf import failed: {e}")
    from miso_tpu.losses.isdf_loss import isdf_sdf_loss_mat

    N = 500
    pred_np = rng.normal(0, 0.3, (N, 1)).astype(np.float32)
    bounds_np = rng.uniform(-0.1, 0.6, (N, 1)).astype(np.float32)
    trunc = 0.15
    for loss_type in ("L1", "L2"):
        want_mat, want_free = ref_isdf.sdf_loss(
            torch.from_numpy(pred_np).clone(),
            torch.from_numpy(bounds_np).clone(), trunc, loss_type)
        got_mat, got_free = isdf_sdf_loss_mat(pred_np, bounds_np, trunc,
                                              loss_type, 5.0)
        np.testing.assert_allclose(np.asarray(got_mat),
                                   want_mat.detach().numpy(),
                                   rtol=1e-5, atol=1e-6, err_msg=loss_type)
        np.testing.assert_array_equal(np.asarray(got_free),
                                      want_free.numpy())
