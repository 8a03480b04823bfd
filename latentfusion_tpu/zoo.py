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
