"""Model zoo: the flagship architecture and small test variants.

The flagship mirrors the published training recipe
(reference: tools/train/train.sh): 256^2 input, factor projections, GRU
fuser, depth+mask heads, no discriminator. Latent object: 256ch x 16^3.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import Camera
from .recon import fusion, models
from .three import quaternion as quat
from . import three

FLAGSHIP_INPUT_SIZE = 256

SCULPTOR_IMAGE_CONFIG = (
    (64, "D", 128, "D", 196, "D", 256, "D", 512, "D", 512, "D", 512),
    (512, "U", 512, "U", 256),
)
SCULPTOR_CAMERA_CONFIG = (64, 128, 256)
SCULPTOR_OBJECT_CONFIG = (256, 256)
PHOTOGRAPHER_CAMERA_CONFIG = (256, 256)
PHOTOGRAPHER_IMAGE_CONFIG = (
    (256, "D", 512, "D", 512),
    (512, "U", 512, "U", 512, "U", 256, "U", 196, "U", 128, "U", 64),
)


def flagship_sculptor(input_size: int = FLAGSHIP_INPUT_SIZE) -> models.Sculptor:
    return models.Sculptor(
        in_size=input_size,
        image_config=SCULPTOR_IMAGE_CONFIG,
        camera_config=SCULPTOR_CAMERA_CONFIG,
        object_config=SCULPTOR_OBJECT_CONFIG,
        projection_type="factor",
        input_color=True, input_depth=False, input_mask=True,
        cube_size=1.0, scale_mode="nearest")


def flagship_photographer(input_size: int = FLAGSHIP_INPUT_SIZE
                          ) -> models.Photographer:
    # Latent cube is 16^3 for 256^2 input (6 downs, 2 ups in the sculptor).
    return models.Photographer(
        in_size=input_size // 16,
        image_config=PHOTOGRAPHER_IMAGE_CONFIG,
        camera_config=PHOTOGRAPHER_CAMERA_CONFIG,
        object_config=None,
        projection_type="factor",
        predict_color=False, predict_depth=True, predict_mask=True,
        cube_size=1.0, scale_mode="nearest")


def flagship_fuser() -> fusion.GRUFuser:
    return fusion.GRUFuser(in_channels=256, cube_size=1.0)


# --------------------------------------------------------------- demo scale
# The accuracy-rig architecture shared by the cube demo, the oracle/encoder
# distillation rigs and the unseen-object rig: 128^2 input -> 8^3 x 128
# latent (flagship family halved). The committed learned checkpoints under
# artifacts/ (encoder_distill.npz, unseen_objects.npz) use this family.

DEMO_INPUT_SIZE = 128
DEMO_CAMERA_DIST = 5.78  # canonical zoom distance for unit-diameter objects

DEMO_SCULPTOR_IMAGE_CONFIG = (
    (32, "D", 64, "D", 96, "D", 128, "D", 256, "D", 256, "D", 256),
    (256, "U", 256, "U", 128),
)
DEMO_SCULPTOR_CAMERA_CONFIG = (32, 64, 128)
DEMO_SCULPTOR_OBJECT_CONFIG = (128, 128)
DEMO_PHOTOGRAPHER_CAMERA_CONFIG = (128, 128)
DEMO_PHOTOGRAPHER_IMAGE_CONFIG = (
    (128, "D", 256, "D", 256),
    (256, "U", 256, "U", 256, "U", 128, "U", 96, "U", 64, "U", 48),
)


def demo_sculptor(input_depth: bool = True) -> models.Sculptor:
    return models.Sculptor(
        in_size=DEMO_INPUT_SIZE,
        image_config=DEMO_SCULPTOR_IMAGE_CONFIG,
        camera_config=DEMO_SCULPTOR_CAMERA_CONFIG,
        object_config=DEMO_SCULPTOR_OBJECT_CONFIG,
        projection_type="factor", cube_size=1.0, scale_mode="nearest",
        input_color=True, input_depth=input_depth, input_mask=True)


def demo_fuser() -> fusion.GRUFuser:
    return fusion.GRUFuser(in_channels=128, cube_size=1.0)


def demo_photographer() -> models.Photographer:
    return models.Photographer(
        in_size=DEMO_INPUT_SIZE // 16,
        image_config=DEMO_PHOTOGRAPHER_IMAGE_CONFIG,
        camera_config=DEMO_PHOTOGRAPHER_CAMERA_CONFIG,
        object_config=None, projection_type="factor",
        predict_color=False, predict_depth=True, predict_mask=True,
        cube_size=1.0, scale_mode="nearest")


def load_params_npz(path, template: dict) -> dict:
    """Load a parameter pytree saved by the distill rigs' ``save_npz``
    (enumerated-leaf npz) against a matching random-init ``template``."""
    import numpy as np

    data = np.load(path)
    leaves = [jnp.asarray(data[str(i)]) for i in range(len(data.files))]
    treedef = jax.tree_util.tree_structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"{path}: {len(leaves)} leaves, template has "
            f"{treedef.num_leaves} — architecture mismatch")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def random_view_cameras(key, n: int, input_size: int = DEMO_INPUT_SIZE,
                        camera_dist: float = DEMO_CAMERA_DIST) -> Camera:
    """Random full-frame viewpoints around a unit object at the canonical
    distance (the accuracy rigs' reference-view distribution)."""
    k1, k2 = jax.random.split(key)
    quats = quat.random(k1, n)
    t_noise = jax.random.normal(k2, (n, 3)) * jnp.asarray([0.1, 0.1, 0.25])
    trans = jnp.asarray([0.0, 0.0, camera_dist]) + t_noise
    ext = three.to_extrinsic_matrix(trans, quats)
    template = canonical_camera(1, input_size, camera_dist=camera_dist)
    return Camera(
        jnp.broadcast_to(template.intrinsic,
                         (n, *template.intrinsic.shape[1:])), ext,
        z_span=template.z_span, width=template.width,
        height=template.height)


# ---------------------------------------------------------------- mid scale
# The model-scale probe between the 16.9M demo family and the full
# flagship training run: the FLAGSHIP channel widths (64-512, 256ch x 8^3
# latent) at the demo rigs' 128^2 input resolution — ~4x the demo family's
# parameters with everything else held fixed. Used by the unseen-object
# rigs' --family mid to test whether the held-out gate rate is limited by
# model scale (VERDICT r4 next #4).

MID_INPUT_SIZE = 128


def mid_sculptor(input_depth: bool = True) -> models.Sculptor:
    return models.Sculptor(
        in_size=MID_INPUT_SIZE,
        image_config=SCULPTOR_IMAGE_CONFIG,
        camera_config=SCULPTOR_CAMERA_CONFIG,
        object_config=SCULPTOR_OBJECT_CONFIG,
        projection_type="factor", cube_size=1.0, scale_mode="nearest",
        input_color=True, input_depth=input_depth, input_mask=True)


def mid_fuser() -> fusion.GRUFuser:
    return fusion.GRUFuser(in_channels=256, cube_size=1.0)


def mid_photographer() -> models.Photographer:
    return models.Photographer(
        in_size=MID_INPUT_SIZE // 16,
        image_config=PHOTOGRAPHER_IMAGE_CONFIG,
        camera_config=PHOTOGRAPHER_CAMERA_CONFIG,
        object_config=None, projection_type="factor",
        predict_color=False, predict_depth=True, predict_mask=True,
        cube_size=1.0, scale_mode="nearest")


def tiny_sculptor(input_size: int = 16) -> models.Sculptor:
    return models.Sculptor(
        in_size=input_size,
        image_config=((4, "D", 8), (8,)),
        camera_config=(4, 4),
        object_config=(4, 4),
        projection_type="factor",
        cube_size=1.0)


def tiny_photographer(input_size: int = 8) -> models.Photographer:
    # Renders at 2x the latent-cube resolution (16^2 for the 16^2-input tiny
    # sculptor): one down, two ups.
    return models.Photographer(
        in_size=input_size,
        image_config=((4, "D", 8), (8, "U", 8, "U", 4)),
        camera_config=(4, 4),
        object_config=None,
        projection_type="factor",
        predict_depth=True, predict_mask=True,
        cube_size=1.0)


def tiny_fuser() -> fusion.GRUFuser:
    return fusion.GRUFuser(in_channels=4, cube_size=1.0)


def canonical_camera(n: int, input_size: int, camera_dist: float = 1.5,
                     key=None) -> Camera:
    """Cameras matching the LINEMOD-style canonical intrinsic
    (reference: consts.py:1-5, scaled to the requested frame)."""
    f = 615.0
    width, height = 640, 480
    intrinsic = jnp.tile(
        jnp.array([[f, 0.0, width / 2], [0.0, f, height / 2],
                   [0.0, 0.0, 1.0]])[None], (n, 1, 1))
    quats = quat.identity(n) if key is None else quat.random(key, n)
    trans = jnp.tile(jnp.array([[0.0, 0.0, camera_dist]]), (n, 1))
    extrinsic = three.to_extrinsic_matrix(trans, quats)
    return Camera(intrinsic, extrinsic, z_span=0.5, width=width, height=height)


def init_recon_params(key, sculptor, fuser, photographer,
                      batch: int = 1, views: int = 1) -> dict:
    """Random-init parameters for the full reconstruction stack."""
    # Inits are jitted: eager op-by-op dispatch over the tunneled TPU
    # backend costs minutes for these module graphs (one remote round-trip
    # per op); a single traced program initializes in seconds.
    k1, k2, k3 = jax.random.split(key, 3)
    in_size = sculptor.in_size
    cam_in = canonical_camera(batch * views, in_size)
    x = jnp.zeros((batch * views, sculptor.in_channels, in_size, in_size))
    sculptor_params = jax.jit(sculptor.init)(k1, x, cam_in)

    s = sculptor.out_size
    c = sculptor.out_channels
    # Recurrent fusers only apply their cell from the SECOND view on (view 0
    # seeds the hidden state), so initialize with >=2 views — the parameters
    # do not depend on the view count.
    init_views = max(views, 2)
    zv = jnp.zeros((batch, init_views, c, s, s, s))
    cam_fuse = canonical_camera(batch * init_views, in_size)
    fuser_params = jax.jit(fuser.init)(k2, zv, [], [], cam_fuse) if hasattr(
        fuser, "init") else {}
    if isinstance(fuser, (fusion.PoolFuser, fusion.ConcatFuser)):
        fuser_params = {}

    cam_out = canonical_camera(batch, in_size)
    z = jnp.zeros((batch, c, s, s, s))
    photographer_params = jax.jit(photographer.init)(k3, z, cam_out)
    return {
        "sculptor": sculptor_params,
        "fuser": fuser_params,
        "photographer": photographer_params,
    }
