"""Scene/renderer wrappers over the native rasterizer.

Behavioral reference: ``latentfusion/rendering.py`` (pyrender EGL wrapper).
The OpenCV-convention extrinsic is consumed directly by our rasterizer, so
the reference's CAM_REF_POSE OpenGL flip (rendering.py:14-40) is not needed;
the realsense canonical-frame handling is preserved.
"""
from __future__ import annotations

import random
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from .. import meshutils, three
from ..three import quaternion as quat
from . import rasterizer

CANON_POSE_REALSENSE = np.asarray(
    ((1.0, 0.0, 0.0), (0.0, -1.0, 0.0), (0.0, 0.0, -1.0)), dtype=np.float32)


def load_object(path, scale=1.0, size=1.0, recenter=True, resize=True,
                bound_type="diameter", load_materials=False):
    """Load + normalize an object mesh (the global object_scale convention;
    reference: rendering.py:43-79)."""
    obj = meshutils.Object3D(path, load_materials=load_materials)
    if recenter:
        obj.recenter("bounds")
    if resize:
        if bound_type == "diameter":
            object_scale = size / obj.bounding_diameter
        elif bound_type == "extents":
            object_scale = size / obj.bounding_size
        else:
            raise ValueError(f"Unknown size_type {bound_type!r}")
        obj.rescale(object_scale)
    else:
        object_scale = 1.0
    if scale != 1.0:
        obj.rescale(scale)
    return obj, object_scale


def get_zbound(distance, scale, eps=0.01):
    """(reference: rendering.py:96-99)"""
    znear = max(eps, distance - scale / 2.0 - eps)
    zfar = distance + scale / 2.0 + eps
    return znear, zfar


class SceneContext:
    """Rendering context: object + intrinsics + pose + lights
    (reference: rendering.py:102-195)."""

    def __init__(self, obj: meshutils.Object3D, intrinsic):
        self.intrinsic = np.asarray(intrinsic, dtype=np.float32)[:3, :3]
        self.obj = obj
        self.extrinsic: Optional[np.ndarray] = None
        # lights: list of (position (3,), color (3,), intensity)
        self.lights = []
        self.ambient = 0.1
        # Blinn-Phong material (approximates the reference's
        # metallic-roughness PBR, pyrender.py:232-250): specular strength +
        # roughness in (0, 1] mapped to the Phong exponent below.
        self.specular = 0.0
        self.roughness = 1.0

    @property
    def shininess(self) -> float:
        """Roughness -> Blinn-Phong exponent (Beckmann-style 2/r^4 - 2
        mapping, clamped)."""
        r = max(float(self.roughness), 0.05)
        return float(np.clip(2.0 / r ** 4 - 2.0, 1.0, 4096.0))

    @property
    def object_quaternion(self):
        E = jnp.asarray(self.extrinsic)
        return three.extrinsic_to_quat(E)

    @property
    def object_translation(self):
        return jnp.asarray(self.extrinsic[:3, 3])

    def randomize_lights(self, min_lights, max_lights, min_dist=1.5,
                         max_dist=3.0, min_intensity=1.2, max_intensity=20.0,
                         random_color=True):
        """(reference: rendering.py:139-164)"""
        num_lights = random.randint(min_lights, max_lights)
        self.lights = []
        for _ in range(num_lights):
            intensity = random.uniform(min_intensity, max_intensity)
            color = (np.random.uniform(0.2, 1.0, 3) if random_color
                     else np.ones(3))
            position = np.random.randn(3)
            position = (random.uniform(min_dist, max_dist)
                        * position / np.linalg.norm(position))
            self.lights.append((position.astype(np.float32),
                                color.astype(np.float32), float(intensity)))

    def set_pose(self, translation, quaternion, frame="default"):
        """(reference: rendering.py:166-173)"""
        translation = jnp.asarray(translation).reshape(-1)
        quaternion = jnp.asarray(quaternion).reshape(-1)
        if frame == "realsense":
            canon_quat = quat.mat_to_quat(jnp.asarray(CANON_POSE_REALSENSE))
            quaternion = quat.qmul(quaternion, canon_quat)
        extrinsic = three.to_extrinsic_matrix(translation[None],
                                              quaternion[None])[0]
        self.set_pose_from_extrinsic(np.asarray(extrinsic))

    def set_pose_from_extrinsic(self, extrinsic, frame="default"):
        """(reference: rendering.py:175-189)"""
        extrinsic = np.asarray(extrinsic, dtype=np.float32)
        if frame == "realsense":
            canon = np.eye(4, dtype=np.float32)
            canon[:3, :3] = CANON_POSE_REALSENSE
            extrinsic = extrinsic @ canon
        self.extrinsic = extrinsic

    def set_intrinsic(self, intrinsic):
        self.intrinsic = np.asarray(intrinsic, dtype=np.float32)[:3, :3]


class Renderer:
    """(reference: rendering.py:198-226)"""

    def __init__(self, width, height):
        self.width = width
        self.height = height

    def render(self, context: SceneContext) -> Tuple:
        vertices = np.concatenate([m.vertices for m in context.obj.meshes])
        # Re-index faces into the merged vertex buffer.
        faces = []
        colors = []
        normals = []
        uvs = []
        offset = 0
        has_colors = all(m.vertex_colors is not None
                         for m in context.obj.meshes)
        has_uvs = all(m.uvs is not None for m in context.obj.meshes)
        for m in context.obj.meshes:
            faces.append(m.faces + offset)
            normals.append(m.vertex_normals)
            if has_colors:
                colors.append(m.vertex_colors)
            if has_uvs:
                uvs.append(m.uvs)
            offset += len(m.vertices)
        faces = np.concatenate(faces)
        normals = np.concatenate(normals)
        colors = np.concatenate(colors) if has_colors else None
        uvs = np.concatenate(uvs) if has_uvs else None
        # Single-texture objects: take the first mesh's attached material.
        texture = context.obj.meshes[0].texture if has_uvs else None
        uv_scale = context.obj.meshes[0].uv_scale

        lights = context.lights
        color, depth, mask = rasterizer.rasterize(
            vertices, faces, context.extrinsic, context.intrinsic,
            self.width, self.height,
            vertex_colors=colors, vertex_normals=normals,
            uvs=uvs, texture=texture, uv_scale=uv_scale,
            light_pos=np.stack([l[0] for l in lights]) if lights else None,
            light_color=np.stack([l[1] for l in lights]) if lights else None,
            light_intensity=np.asarray([l[2] for l in lights],
                                       dtype=np.float32) if lights else None,
            ambient=context.ambient, specular=context.specular,
            shininess=context.shininess)
        return (jnp.asarray(color), jnp.asarray(depth),
                jnp.asarray((depth > 0).astype(np.float32)))
