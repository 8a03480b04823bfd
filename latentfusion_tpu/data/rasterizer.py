"""Host-side mesh rasterizer: ctypes binding to the native C++ renderer, with
a (slow) numpy fallback.

This is the TPU-native replacement for the reference's pyrender/EGL
offscreen renderer (reference: rendering.py:198-226). It runs in host data
workers feeding the device, so it is plain C++ rather than a device kernel.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None
_LIB_FAILED = False


def _load_library():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so = _NATIVE_DIR / "librasterizer.so"
    try:
        if not so.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.rasterize.restype = None
        lib.rasterize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,   # vertices
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,   # faces
            ctypes.POINTER(ctypes.c_float),                 # vertex_colors
            ctypes.POINTER(ctypes.c_float),                 # vertex_normals
            ctypes.POINTER(ctypes.c_float),                 # uvs
            ctypes.POINTER(ctypes.c_float),                 # texture
            ctypes.c_int, ctypes.c_int,                     # tex_w, tex_h
            ctypes.c_float,                                 # uv_scale
            ctypes.POINTER(ctypes.c_float),                 # extrinsic
            ctypes.POINTER(ctypes.c_float),                 # intrinsic
            ctypes.c_int, ctypes.c_int,                     # width, height
            ctypes.POINTER(ctypes.c_float),                 # light_pos
            ctypes.POINTER(ctypes.c_float),                 # light_color
            ctypes.POINTER(ctypes.c_float),                 # light_intensity
            ctypes.c_int,                                   # n_lights
            ctypes.c_float,                                 # ambient
            ctypes.c_float,                                 # specular
            ctypes.c_float,                                 # shininess
            ctypes.c_int,                                   # shade
            ctypes.POINTER(ctypes.c_float),                 # out_color
            ctypes.POINTER(ctypes.c_float),                 # out_depth
        ]
        _LIB = lib
    except Exception as e:  # toolchain missing etc.
        logger.warning("native rasterizer unavailable (%s); numpy fallback", e)
        _LIB_FAILED = True
    return _LIB


def _fptr(arr: Optional[np.ndarray]):
    if arr is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rasterize(vertices: np.ndarray, faces: np.ndarray,
              extrinsic: np.ndarray, intrinsic: np.ndarray,
              width: int, height: int,
              vertex_colors: Optional[np.ndarray] = None,
              vertex_normals: Optional[np.ndarray] = None,
              uvs: Optional[np.ndarray] = None,
              texture: Optional[np.ndarray] = None,
              uv_scale: float = 1.0,
              light_pos: Optional[np.ndarray] = None,
              light_color: Optional[np.ndarray] = None,
              light_intensity: Optional[np.ndarray] = None,
              ambient: float = 0.1,
              specular: float = 0.0,
              shininess: float = 32.0,
              shade: bool = True) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Render a mesh. Returns (color (H,W,3) float [0,1], depth (H,W),
    mask (H,W) = depth > 0).

    ``uvs`` (V, 2) + ``texture`` (Th, Tw, 3 float [0,1]) enable UV-mapped
    albedo with wrap addressing and ``uv_scale`` tiling; ``specular`` /
    ``shininess`` add a Blinn-Phong lobe (reference's metallic-roughness
    materials, pyrender.py:232-250)."""
    vertices = np.ascontiguousarray(vertices, dtype=np.float32)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    extrinsic = np.ascontiguousarray(extrinsic, dtype=np.float32).reshape(4, 4)
    intrinsic = np.ascontiguousarray(
        np.asarray(intrinsic, dtype=np.float32)[:3, :3])
    if vertex_colors is not None:
        vertex_colors = np.ascontiguousarray(vertex_colors, dtype=np.float32)
    if vertex_normals is not None:
        vertex_normals = np.ascontiguousarray(vertex_normals, dtype=np.float32)
    if uvs is not None:
        uvs = np.ascontiguousarray(uvs, dtype=np.float32)
    tex_w = tex_h = 0
    if texture is not None:
        texture = np.ascontiguousarray(texture, dtype=np.float32)
        tex_h, tex_w = texture.shape[:2]
    n_lights = 0 if light_pos is None else len(light_pos)
    if n_lights:
        light_pos = np.ascontiguousarray(light_pos, dtype=np.float32)
        light_color = np.ascontiguousarray(light_color, dtype=np.float32)
        light_intensity = np.ascontiguousarray(light_intensity,
                                               dtype=np.float32)

    lib = _load_library()
    color = np.zeros((height, width, 3), dtype=np.float32)
    depth = np.zeros((height, width), dtype=np.float32)
    if lib is not None:
        lib.rasterize(
            _fptr(vertices), len(vertices),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
            _fptr(vertex_colors), _fptr(vertex_normals),
            _fptr(uvs), _fptr(texture), tex_w, tex_h, float(uv_scale),
            _fptr(extrinsic), _fptr(intrinsic),
            width, height,
            _fptr(light_pos if n_lights else None),
            _fptr(light_color if n_lights else None),
            _fptr(light_intensity if n_lights else None),
            n_lights, float(ambient), float(specular), float(shininess),
            int(shade), _fptr(color), _fptr(depth))
    else:
        _rasterize_numpy(vertices, faces, extrinsic, intrinsic, width, height,
                         vertex_colors, vertex_normals, uvs, texture,
                         uv_scale, light_pos, light_color,
                         light_intensity, ambient, specular, shininess,
                         shade, color, depth)
    mask = (depth > 0).astype(np.float32)
    return color, depth, mask


def _rasterize_numpy(vertices, faces, extrinsic, intrinsic, width, height,
                     vertex_colors, vertex_normals, uvs, texture, uv_scale,
                     light_pos, light_color, light_intensity, ambient,
                     specular, shininess, shade, color, depth):
    """Reference numpy implementation (slow; used when no C++ toolchain)."""
    cam_center = -extrinsic[:3, :3].T @ extrinsic[:3, 3]
    cam = vertices @ extrinsic[:3, :3].T + extrinsic[:3, 3]
    z = np.maximum(cam[:, 2], 1e-6)
    px = np.stack([intrinsic[0, 0] * cam[:, 0] / z + intrinsic[0, 2],
                   intrinsic[1, 1] * cam[:, 1] / z + intrinsic[1, 2]], axis=1)
    depth[:] = 0
    zbuf = np.full((height, width), np.inf, dtype=np.float32)
    if vertex_normals is None:
        from ..meshutils import compute_vertex_normals

        vertex_normals = compute_vertex_normals(vertices, faces)
    for tri in faces:
        zs = cam[tri, 2]
        if (zs <= 1e-4).any():
            continue
        pts = px[tri]
        xmin = max(0, int(np.floor(pts[:, 0].min())))
        xmax = min(width - 1, int(np.ceil(pts[:, 0].max())))
        ymin = max(0, int(np.floor(pts[:, 1].min())))
        ymax = min(height - 1, int(np.ceil(pts[:, 1].max())))
        if xmin > xmax or ymin > ymax:
            continue
        (x0, y0), (x1, y1), (x2, y2) = pts
        denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        if abs(denom) < 1e-12:
            continue
        ys, xs = np.mgrid[ymin:ymax + 1, xmin:xmax + 1]
        w0 = ((y1 - y2) * (xs - x2) + (x2 - x1) * (ys - y2)) / denom
        w1 = ((y2 - y0) * (xs - x2) + (x0 - x2) * (ys - y2)) / denom
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        izs = 1.0 / zs
        izp = w0 * izs[0] + w1 * izs[1] + w2 * izs[2]
        zp = 1.0 / np.maximum(izp, 1e-12)
        closer = inside & (zp < zbuf[ymin:ymax + 1, xmin:xmax + 1])
        if not closer.any():
            continue
        b = np.stack([w0 * izs[0], w1 * izs[1], w2 * izs[2]]) * zp[None]
        if uvs is not None and texture is not None:
            th, tw = texture.shape[:2]
            uvp = np.einsum("kij,kc->ijc", b, uvs[tri]) * uv_scale
            uvp -= np.floor(uvp)
            tu = uvp[..., 0] * tw - 0.5
            tv = (1.0 - uvp[..., 1]) * th - 0.5
            u0 = np.floor(tu).astype(int)
            v0 = np.floor(tv).astype(int)
            wu = (tu - u0)[..., None]
            wv = (tv - v0)[..., None]
            u1, v1 = (u0 + 1) % tw, (v0 + 1) % th
            u0, v0 = u0 % tw, v0 % th
            alb = ((1 - wv) * ((1 - wu) * texture[v0, u0]
                               + wu * texture[v0, u1])
                   + wv * ((1 - wu) * texture[v1, u0]
                           + wu * texture[v1, u1])).astype(np.float32)
            if vertex_colors is not None:
                alb = alb * np.einsum("kij,kc->ijc", b, vertex_colors[tri])
        elif vertex_colors is not None:
            alb = np.einsum("kij,kc->ijc", b, vertex_colors[tri])
        else:
            alb = np.full((*zp.shape, 3), 0.8, dtype=np.float32)
        if shade:
            p = np.einsum("kij,kc->ijc", b, vertices[tri])
            n = np.einsum("kij,kc->ijc", b, vertex_normals[tri])
            n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
            sh = np.full(zp.shape + (3,), ambient, dtype=np.float32)
            spec = np.zeros(zp.shape + (3,), dtype=np.float32)
            if light_pos is not None:
                vdir = cam_center[None, None] - p
                vdir = vdir / (np.linalg.norm(vdir, axis=-1, keepdims=True)
                               + 1e-12)
                for lp, lc, li in zip(light_pos, light_color, light_intensity):
                    ldir = lp[None, None] - p
                    d2 = (ldir ** 2).sum(-1, keepdims=True) + 1e-9
                    ldir = ldir / np.sqrt(d2)
                    lam = np.abs((n * ldir).sum(-1, keepdims=True))
                    sh += lam * (li / d2) * lc[None, None]
                    if specular > 0:
                        hv = ldir + vdir
                        hv = hv / (np.linalg.norm(hv, axis=-1, keepdims=True)
                                   + 1e-12)
                        nh = np.abs((n * hv).sum(-1, keepdims=True))
                        spec += specular * nh ** shininess * (li / d2) \
                            * lc[None, None]
            alb = np.minimum(1.0, alb * sh + spec)
        region = (slice(ymin, ymax + 1), slice(xmin, xmax + 1))
        zbuf[region] = np.where(closer, zp, zbuf[region])
        depth[region] = np.where(closer, zp, depth[region])
        color[region] = np.where(closer[..., None], alb, color[region])
