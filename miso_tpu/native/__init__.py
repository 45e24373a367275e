"""ctypes bindings for the miso_native C++ geometry runtime.

The shared library is built on demand with `make` (g++, OpenMP).  All
entry points operate on contiguous float32 / int32 numpy arrays.

Replaces the reference's host geometry dependencies:
  * ``marching_cubes``  <- mcubes (utils_sdf.py:95)
  * ``TriangleMesh.signed_distance`` <- pysdf (sdf_3d.py:54)
  * ``TriangleMesh.raycast`` <- open3d RaycastingScene (sdf_3d.py:209-312)
  * ``TriangleMesh.sample_surface`` <- trimesh/open3d samplers
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmiso_native.so")
_lib = None


def _build():
    subprocess.run(["make", "-s", "-C", _DIR], check=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    c_fp = ctypes.POINTER(ctypes.c_float)
    c_ip = ctypes.POINTER(ctypes.c_int)
    lib.mn_marching_cubes.argtypes = [
        c_fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        c_fp, c_fp,
        ctypes.POINTER(c_fp), c_ip, ctypes.POINTER(c_ip), c_ip,
    ]
    lib.mn_marching_cubes.restype = ctypes.c_int
    lib.mn_free.argtypes = [ctypes.c_void_p]
    lib.mn_mesh_build.argtypes = [c_fp, ctypes.c_int, c_ip, ctypes.c_int]
    lib.mn_mesh_build.restype = ctypes.c_void_p
    lib.mn_mesh_free.argtypes = [ctypes.c_void_p]
    for name in ("mn_signed_distance", "mn_unsigned_distance"):
        getattr(lib, name).argtypes = [ctypes.c_void_p, c_fp, ctypes.c_int, c_fp]
    lib.mn_closest_points.argtypes = [ctypes.c_void_p, c_fp, ctypes.c_int, c_fp, c_fp]
    lib.mn_raycast.argtypes = [ctypes.c_void_p, c_fp, c_fp, ctypes.c_int, c_fp, c_ip]
    lib.mn_sample_surface.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_uint64, c_fp, c_fp]
    _lib = lib
    return lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def marching_cubes(field: np.ndarray, iso: float = 0.0,
                   origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0)
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract an iso-surface from a (nx, ny, nz) scalar field.

    Returns (verts (V, 3) float32 in world coords, tris (T, 3) int32).
    """
    lib = get_lib()
    field = np.ascontiguousarray(field, dtype=np.float32)
    nx, ny, nz = field.shape
    origin = np.ascontiguousarray(origin, dtype=np.float32)
    spacing = np.ascontiguousarray(spacing, dtype=np.float32)
    overts = ctypes.POINTER(ctypes.c_float)()
    otris = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    lib.mn_marching_cubes(_fp(field), nx, ny, nz, iso, _fp(origin), _fp(spacing),
                          ctypes.byref(overts), ctypes.byref(nv),
                          ctypes.byref(otris), ctypes.byref(nt))
    verts = np.ctypeslib.as_array(overts, shape=(nv.value, 3)).copy() if nv.value else np.zeros((0, 3), np.float32)
    tris = np.ctypeslib.as_array(otris, shape=(nt.value, 3)).copy() if nt.value else np.zeros((0, 3), np.int32)
    lib.mn_free(overts)
    lib.mn_free(otris)
    return verts, tris


class TriangleMesh:
    """BVH-accelerated triangle mesh queries (signed distance / raycast)."""

    def __init__(self, vertices: np.ndarray, triangles: np.ndarray):
        self.vertices = np.ascontiguousarray(vertices, dtype=np.float32)
        self.triangles = np.ascontiguousarray(triangles, dtype=np.int32)
        self._lib = get_lib()
        self._handle = self._lib.mn_mesh_build(
            _fp(self.vertices), len(self.vertices),
            _ip(self.triangles), len(self.triangles))

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.mn_mesh_free(self._handle)
                self._handle = None
        except Exception:
            pass

    def signed_distance(self, points: np.ndarray) -> np.ndarray:
        """pysdf-convention SDF is positive *inside*; we return the standard
        convention (positive outside) -- callers should be explicit."""
        pts = np.ascontiguousarray(points, dtype=np.float32)
        out = np.empty((len(pts),), np.float32)
        self._lib.mn_signed_distance(self._handle, _fp(pts), len(pts), _fp(out))
        return out

    def unsigned_distance(self, points: np.ndarray) -> np.ndarray:
        pts = np.ascontiguousarray(points, dtype=np.float32)
        out = np.empty((len(pts),), np.float32)
        self._lib.mn_unsigned_distance(self._handle, _fp(pts), len(pts), _fp(out))
        return out

    def closest_points(self, points: np.ndarray):
        pts = np.ascontiguousarray(points, dtype=np.float32)
        out_p = np.empty((len(pts), 3), np.float32)
        out_d = np.empty((len(pts),), np.float32)
        self._lib.mn_closest_points(self._handle, _fp(pts), len(pts), _fp(out_p), _fp(out_d))
        return out_p, out_d

    def raycast(self, origins: np.ndarray, directions: np.ndarray):
        """Returns (t (N,), tri (N,)); t = -1 where the ray misses."""
        o = np.ascontiguousarray(origins, dtype=np.float32)
        d = np.ascontiguousarray(directions, dtype=np.float32)
        t = np.empty((len(o),), np.float32)
        tri = np.empty((len(o),), np.int32)
        self._lib.mn_raycast(self._handle, _fp(o), _fp(d), len(o), _fp(t), _ip(tri))
        return t, tri

    def sample_surface(self, n: int, seed: int = 0, return_normals: bool = False):
        pts = np.empty((n, 3), np.float32)
        nrm = np.empty((n, 3), np.float32)
        self._lib.mn_sample_surface(self._handle, n, seed, _fp(pts), _fp(nrm))
        if return_normals:
            return pts, nrm
        return pts

    @property
    def face_normals(self) -> np.ndarray:
        v = self.vertices
        t = self.triangles
        n = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
        return n / (np.linalg.norm(n, axis=1, keepdims=True) + 1e-20)

    @property
    def area(self) -> float:
        v = self.vertices
        t = self.triangles
        n = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
        return float(0.5 * np.linalg.norm(n, axis=1).sum())
