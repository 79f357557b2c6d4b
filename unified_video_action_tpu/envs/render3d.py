"""Headless software rendering of mujoco scenes.

TPU hosts ship no GL stack (no libGL/EGL/OSMesa), so mujoco's built-in
``Renderer`` cannot run — yet every image-conditioned policy in this
framework needs RGB observations. This module renders mjModel/mjData
scenes with a from-scratch pipeline:

* geoms (plane / box / sphere / cylinder / capsule / mesh) are tessellated
  ONCE into a triangle soup in geom-local coordinates;
* per frame, vertices are transformed world->camera with one vectorized
  einsum over ``geom_xpos`` / ``geom_xmat``;
* the native z-buffer rasterizer (native/raster3d.cpp, built on demand with
  g++ like native/shm_ipc.cpp) clips, projects and flat-shades; a pure-numpy
  fallback keeps the path alive without a compiler.

Counterpart of the reference's GPU offscreen rendering
(env/libero/envs/env_wrapper.py OffScreenRenderEnv,
env/robomimic/robomimic_image_wrapper.py:10-113 render paths).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple, Union

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(__file__), "..", "..", "native"
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libraster3d.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "raster3d.cpp")

_lib = None
_lib_failed = False


def get_lib() -> Optional[ctypes.CDLL]:
    """Build (if stale) and load the native rasterizer; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    try:
        if not os.path.exists(_SO_PATH) or os.path.getmtime(
            _SO_PATH
        ) < os.path.getmtime(_SRC_PATH):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC_PATH,
                 "-o", _SO_PATH],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.uva_raster3d.restype = None
        lib.uva_raster3d.argtypes = [
            f32p, ctypes.c_int32, i32p, f32p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, f32p, ctypes.c_float, ctypes.c_float,
            u8p, u8p, f32p,
        ]
        _lib = lib
        return _lib
    except Exception:
        _lib_failed = True
        return None


# ---------------------------------------------------------------------------
# primitive tessellation (geom-local coordinates, mujoco size conventions)
# ---------------------------------------------------------------------------

def _box(size) -> Tuple[np.ndarray, np.ndarray]:
    sx, sy, sz = [float(s) for s in size[:3]]
    v = np.array(
        [[x, y, z] for x in (-sx, sx) for y in (-sy, sy) for z in (-sz, sz)],
        np.float32,
    )
    f = np.array(
        [
            [0, 1, 3], [0, 3, 2],  # -x
            [4, 6, 7], [4, 7, 5],  # +x
            [0, 4, 5], [0, 5, 1],  # -y
            [2, 3, 7], [2, 7, 6],  # +y
            [0, 2, 6], [0, 6, 4],  # -z
            [1, 5, 7], [1, 7, 3],  # +z
        ],
        np.int32,
    )
    return v, f


def _uv_sphere(radius: float, stacks: int = 8, slices: int = 12,
               z_scale: float = 1.0, z_off: float = 0.0,
               phi0: float = -np.pi / 2, phi1: float = np.pi / 2):
    """UV-sphere section between latitudes [phi0, phi1] (radians)."""
    phis = np.linspace(phi0, phi1, stacks + 1)
    thetas = np.linspace(0, 2 * np.pi, slices, endpoint=False)
    verts = []
    for phi in phis:
        c, s = np.cos(phi), np.sin(phi)
        for th in thetas:
            verts.append(
                [radius * c * np.cos(th), radius * c * np.sin(th),
                 radius * s * z_scale + z_off]
            )
    v = np.asarray(verts, np.float32)
    faces = []
    for i in range(stacks):
        for j in range(slices):
            a = i * slices + j
            b = i * slices + (j + 1) % slices
            c2 = (i + 1) * slices + j
            d = (i + 1) * slices + (j + 1) % slices
            faces.append([a, b, d])
            faces.append([a, d, c2])
    return v, np.asarray(faces, np.int32)


def _sphere(size):
    return _uv_sphere(float(size[0]))


def _cylinder(size, slices: int = 12):
    r, hl = float(size[0]), float(size[1])
    thetas = np.linspace(0, 2 * np.pi, slices, endpoint=False)
    ring = np.stack([r * np.cos(thetas), r * np.sin(thetas)], -1)
    bot = np.concatenate([ring, np.full((slices, 1), -hl, np.float32)], -1)
    top = np.concatenate([ring, np.full((slices, 1), hl, np.float32)], -1)
    v = np.concatenate(
        [bot, top, [[0, 0, -hl]], [[0, 0, hl]]], 0
    ).astype(np.float32)
    cb, ct = 2 * slices, 2 * slices + 1
    faces = []
    for j in range(slices):
        jn = (j + 1) % slices
        faces += [[j, jn, slices + jn], [j, slices + jn, slices + j]]
        faces += [[cb, jn, j], [ct, slices + j, slices + jn]]
    return v, np.asarray(faces, np.int32)


def _capsule(size, slices: int = 12, stacks: int = 4):
    r, hl = float(size[0]), float(size[1])
    vc, fc = _cylinder(size, slices)
    vc = vc[:-2]  # drop cap centers; keep side quads only
    fc = fc.reshape(-1, 3)
    fc = fc[(fc < 2 * slices).all(axis=1)]
    vt, ft = _uv_sphere(r, stacks, slices, z_off=hl, phi0=0)
    vb, fb = _uv_sphere(r, stacks, slices, z_off=-hl, phi1=0)
    v = np.concatenate([vc, vt, vb], 0)
    f = np.concatenate([fc, ft + len(vc), fb + len(vc) + len(vt)], 0)
    return v.astype(np.float32), f.astype(np.int32)


def _plane(size, default_extent: float = 10.0):
    sx = float(size[0]) or default_extent
    sy = float(size[1]) or default_extent
    v = np.array(
        [[-sx, -sy, 0], [sx, -sy, 0], [sx, sy, 0], [-sx, sy, 0]], np.float32
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, f


# ---------------------------------------------------------------------------
# scene extraction
# ---------------------------------------------------------------------------

class SceneRenderer:
    """Render an mjModel/mjData scene to HWC uint8 frames.

    ``camera`` may be a mujoco camera name, an int camera id, a dict
    ``{"eye": [3], "target": [3], "fovy": deg}`` free camera, or None
    (first model camera if any, else an auto-framing free camera derived
    from ``model.stat``).
    """

    def __init__(self, model, height: int = 96, width: int = 96,
                 camera: Union[str, int, dict, None] = None,
                 groups: Tuple[int, ...] = (0, 1, 2),
                 background=(28, 32, 40)):
        import mujoco

        self.model = model
        self.height, self.width = int(height), int(width)
        self.camera = camera
        self.background = np.asarray(background, np.uint8)

        verts, faces, face_rgb, vert_geom = [], [], [], []
        nv = 0
        for g in range(model.ngeom):
            rgba = model.geom_rgba[g].copy()
            matid = int(model.geom_matid[g])
            if matid >= 0:
                mat_rgba = model.mat_rgba[matid]
                # material colour wins unless the geom overrides it
                if not np.allclose(rgba[:3], 0.5) or rgba[3] != 1.0:
                    pass  # explicit geom colour
                else:
                    rgba = mat_rgba.copy()
            if rgba[3] <= 0.25:  # invisible / debug-overlay geoms (no alpha
                continue         # blending here: drawing them opaque is worse)
            if int(model.geom_group[g]) not in groups:
                continue
            t = int(model.geom_type[g])
            size = model.geom_size[g]
            if t == mujoco.mjtGeom.mjGEOM_PLANE:
                v, f = _plane(size)
            elif t == mujoco.mjtGeom.mjGEOM_SPHERE:
                v, f = _sphere(size)
            elif t == mujoco.mjtGeom.mjGEOM_CAPSULE:
                v, f = _capsule(size)
            elif t == mujoco.mjtGeom.mjGEOM_CYLINDER:
                v, f = _cylinder(size)
            elif t == mujoco.mjtGeom.mjGEOM_BOX:
                v, f = _box(size)
            elif t == mujoco.mjtGeom.mjGEOM_MESH:
                mid = int(model.geom_dataid[g])
                va, vn = int(model.mesh_vertadr[mid]), int(model.mesh_vertnum[mid])
                fa, fn = int(model.mesh_faceadr[mid]), int(model.mesh_facenum[mid])
                v = np.asarray(model.mesh_vert[va : va + vn], np.float32)
                f = np.asarray(model.mesh_face[fa : fa + fn], np.int32)
            else:  # ellipsoid/hfield/sdf: coarse box proxy
                v, f = _box(np.maximum(size, 1e-4))
            verts.append(v)
            faces.append(f + nv)
            face_rgb.append(np.tile(rgba[:3].astype(np.float32), (len(f), 1)))
            vert_geom.append(np.full(len(v), g, np.int32))
            nv += len(v)

        self.local_verts = (
            np.concatenate(verts, 0) if verts else np.zeros((0, 3), np.float32)
        )
        self.faces = (
            np.ascontiguousarray(np.concatenate(faces, 0))
            if faces else np.zeros((0, 3), np.int32)
        )
        self.face_rgb = (
            np.ascontiguousarray(np.concatenate(face_rgb, 0))
            if face_rgb else np.zeros((0, 3), np.float32)
        )
        self.vert_geom = (
            np.concatenate(vert_geom, 0) if vert_geom else np.zeros(0, np.int32)
        )
        self._zbuf = np.empty((self.height, self.width), np.float32)
        self._rgb = np.empty((self.height, self.width, 3), np.uint8)

    # -- cameras ------------------------------------------------------------

    def _camera_pose(self, data, camera):
        """-> (eye [3], R world->cam columns [x right, y up, z backward], fovy)."""
        import mujoco

        model = self.model
        if camera is None:
            camera = 0 if model.ncam > 0 else self._auto_camera()
        if isinstance(camera, str):
            camera = mujoco.mj_name2id(
                model, mujoco.mjtObj.mjOBJ_CAMERA, camera
            )
            if camera < 0:
                raise KeyError("unknown camera")
        if isinstance(camera, dict):
            eye = np.asarray(camera["eye"], np.float64)
            target = np.asarray(camera["target"], np.float64)
            fovy = float(camera.get("fovy", 45.0))
            fwd = target - eye
            fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
            up_w = np.asarray(camera.get("up", [0.0, 0.0, 1.0]), np.float64)
            right = np.cross(fwd, up_w)
            right /= np.linalg.norm(right) + 1e-12
            up = np.cross(right, fwd)
            R = np.stack([right, up, -fwd], axis=1)  # mujoco cam convention
            return eye, R, fovy
        cid = int(camera)
        eye = np.asarray(data.cam_xpos[cid], np.float64)
        R = np.asarray(data.cam_xmat[cid], np.float64).reshape(3, 3)
        return eye, R, float(self.model.cam_fovy[cid])

    def _auto_camera(self) -> dict:
        center = np.asarray(self.model.stat.center, np.float64)
        extent = float(self.model.stat.extent)
        eye = center + extent * np.array([0.9, -1.1, 0.7])
        return {"eye": eye, "target": center, "fovy": 45.0}

    # -- rendering ----------------------------------------------------------

    def render(self, data, camera=None, markers=()) -> np.ndarray:
        """Render the scene; ``markers`` is an optional sequence of
        ``{"pos": [3], "size": r, "rgba": [3 or 4]}`` world-space spheres
        (e.g. goal sites, which are not geoms)."""
        if len(self.faces) == 0 and not markers:
            img = np.empty((self.height, self.width, 3), np.uint8)
            img[:] = self.background
            return img.copy()
        eye, R, fovy = self._camera_pose(data, camera or self.camera)

        gx = np.asarray(data.geom_xmat, np.float32).reshape(-1, 3, 3)
        gp = np.asarray(data.geom_xpos, np.float32)
        mats = gx[self.vert_geom]
        world = (
            np.einsum("nij,nj->ni", mats, self.local_verts)
            + gp[self.vert_geom]
        )
        faces, face_rgb = self.faces, self.face_rgb
        if markers:
            mv, mf, mc = [world], [faces], [face_rgb]
            nv = len(world)
            sv, sf = _MARKER_SPHERE
            for mk in markers:
                r = float(mk.get("size", 0.02))
                mv.append(sv * r + np.asarray(mk["pos"], np.float32))
                mf.append(sf + nv)
                mc.append(
                    np.tile(
                        np.asarray(mk["rgba"][:3], np.float32), (len(sf), 1)
                    )
                )
                nv += len(sv)
            world = np.concatenate(mv, 0)
            faces = np.ascontiguousarray(np.concatenate(mf, 0))
            face_rgb = np.ascontiguousarray(np.concatenate(mc, 0))
        # world -> camera (x right, y up, -z forward) -> render frame
        # (+z forward, +y down to match image rows)
        cam = (world - eye.astype(np.float32)) @ R.astype(np.float32)
        cam[:, 1] *= -1.0
        cam[:, 2] *= -1.0
        cam = np.ascontiguousarray(cam, np.float32)

        H, W = self.height, self.width
        fy = 0.5 * H / np.tan(np.deg2rad(fovy) / 2)
        fx = fy
        cx, cy = W / 2.0, H / 2.0
        light = np.asarray([0.25, -0.55, 0.8], np.float32)
        light /= np.linalg.norm(light)

        lib = get_lib()
        if lib is not None:
            lib.uva_raster3d(
                cam, np.int32(len(cam)), faces, face_rgb,
                np.int32(len(faces)), np.int32(H), np.int32(W),
                np.float32(fx), np.float32(fy), np.float32(cx),
                np.float32(cy), np.float32(0.02), light,
                np.float32(0.45), np.float32(0.55),
                np.ascontiguousarray(self.background), self._rgb, self._zbuf,
            )
            return self._rgb.copy()
        return _raster_numpy(
            cam, faces, face_rgb, H, W, fx, fy, cx, cy, 0.02,
            light, 0.45, 0.55, self.background,
        )


#: shared low-poly unit sphere for render-time marker injection
_MARKER_SPHERE = _uv_sphere(1.0, stacks=6, slices=8)


def _raster_numpy(cam, faces, face_rgb, H, W, fx, fy, cx, cy, znear, light,
                  ambient, diffuse, background) -> np.ndarray:
    """Pure-numpy fallback with identical semantics (slow: test/CI path)."""
    rgb = np.empty((H, W, 3), np.uint8)
    rgb[:] = background
    zbuf = np.full((H, W), np.inf, np.float32)
    tri = cam[faces]  # [nt, 3, 3]
    # skip triangles touching the near plane entirely (fallback renders the
    # common all-in-front case; the native path does true clipping)
    keep = (tri[:, :, 2] >= znear).all(axis=1)
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nn = np.linalg.norm(n, axis=1, keepdims=True)
    shade = ambient + diffuse * np.abs(
        (n / np.maximum(nn, 1e-12)) @ light
    )
    cols = np.clip(face_rgb * shade[:, None], 0, 1)
    iz = 1.0 / tri[:, :, 2]
    px = cx + fx * tri[:, :, 0] * iz
    py = cy + fy * tri[:, :, 1] * iz
    for t in np.nonzero(keep)[0]:
        x0 = max(0, int(np.floor(px[t].min())))
        x1 = min(W - 1, int(np.ceil(px[t].max())))
        y0 = max(0, int(np.floor(py[t].min())))
        y1 = min(H - 1, int(np.ceil(py[t].max())))
        if x0 > x1 or y0 > y1:
            continue
        ax, ay = px[t, 1] - px[t, 0], py[t, 1] - py[t, 0]
        bx, by = px[t, 2] - px[t, 0], py[t, 2] - py[t, 0]
        area = ax * by - ay * bx
        if abs(area) < 1e-9:
            continue
        ys, xs = np.mgrid[y0 : y1 + 1, x0 : x1 + 1]
        pxc, pyc = xs + 0.5, ys + 0.5
        w0 = ((px[t, 1] - pxc) * (py[t, 2] - pyc)
              - (py[t, 1] - pyc) * (px[t, 2] - pxc)) / area
        w1 = ((px[t, 2] - pxc) * (py[t, 0] - pyc)
              - (py[t, 2] - pyc) * (px[t, 0] - pxc)) / area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        z = 1.0 / (w0 * iz[t, 0] + w1 * iz[t, 1] + w2 * iz[t, 2])
        zwin = zbuf[y0 : y1 + 1, x0 : x1 + 1]
        upd = inside & (z < zwin)
        zwin[upd] = z[upd]
        rgb[y0 : y1 + 1, x0 : x1 + 1][upd] = (cols[t] * 255).astype(np.uint8)
    return rgb
