"""L2 NN building blocks (flax.linen)."""
import jax.numpy as jnp

from .equalized import (  # noqa: F401
    EqualizedConv,
    EqualizedConv2d,
    EqualizedConv3d,
    EqualizedLinear,
)


def pixel_norm(x, eps: float = 1e-8):
    """PixelNorm over the channel dim (dim 1, or the trailing dim under the
    channels-last layout policy) (reference: modules/__init__.py:8-15)."""
    from ..layout import channel_axis

    return x / jnp.sqrt(
        jnp.mean(x ** 2, axis=channel_axis(), keepdims=True) + eps)


from .blocks import (  # noqa: F401,E402
    Block,
    InputBlock,
    OutputBlock,
    count_blocks,
    create_block_defs,
)
from .unet import BaseUNet, UNet2d, UNet3d  # noqa: F401,E402
from .gru import ConvGRUCell  # noqa: F401,E402
from .lstm import ConvLSTMCell  # noqa: F401,E402
