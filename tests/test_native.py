"""Native geometry runtime tests (marching cubes, BVH SDF, raycast).

The analytic sphere SDF is the oracle, mirroring how the reference
validated its CUDA kernels against naive implementations.
"""
import numpy as np
import pytest

from miso_tpu.native import TriangleMesh, marching_cubes


pytestmark = pytest.mark.fast


def sphere_field(n=48, r=0.6):
    ax = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - r, ax


@pytest.fixture(scope="module")
def sphere_mesh():
    field, ax = sphere_field()
    spacing = [ax[1] - ax[0]] * 3
    verts, tris = marching_cubes(field, 0.0, origin=[-1, -1, -1], spacing=spacing)
    return TriangleMesh(verts, tris)


def test_marching_cubes_sphere():
    field, ax = sphere_field()
    spacing = [ax[1] - ax[0]] * 3
    verts, tris = marching_cubes(field, 0.0, origin=[-1, -1, -1], spacing=spacing)
    assert len(verts) > 500 and len(tris) > 500
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.01)
    assert radii.std() < 0.01
    # Area close to 4 pi r^2.
    mesh = TriangleMesh(verts, tris)
    np.testing.assert_allclose(mesh.area, 4 * np.pi * 0.6**2, rtol=0.02)


def test_signed_distance_sphere(sphere_mesh, rng):
    pts = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
    sdf = sphere_mesh.signed_distance(pts)
    gt = np.linalg.norm(pts, axis=1) - 0.6
    np.testing.assert_allclose(sdf, gt, atol=0.02)


def test_raycast_sphere(sphere_mesh, rng):
    # Rays from origin outward hit the sphere at t ~= 0.6.
    dirs = rng.standard_normal((500, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = np.zeros((500, 3), np.float32)
    t, tri = sphere_mesh.raycast(origins, dirs)
    assert np.all(t > 0)
    np.testing.assert_allclose(t, 0.6, atol=0.02)
    # Rays pointing away from the mesh miss.
    origins2 = 2.0 * dirs
    t2, _ = sphere_mesh.raycast(origins2, dirs)
    assert np.all(t2 < 0)


def test_sample_surface(sphere_mesh):
    pts, normals = sphere_mesh.sample_surface(5000, seed=7, return_normals=True)
    radii = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(radii, 0.6, atol=0.02)
    # Normals point outward.
    cosangle = np.sum(pts / radii[:, None] * normals, axis=1)
    assert (cosangle > 0.9).mean() > 0.99


def test_closest_points(sphere_mesh):
    pts = np.array([[0.9, 0, 0], [0, 0, 0]], np.float32)
    cp, d = sphere_mesh.closest_points(pts)
    np.testing.assert_allclose(d, [0.3, 0.6], atol=0.02)
    np.testing.assert_allclose(cp[0], [0.6, 0, 0], atol=0.02)
