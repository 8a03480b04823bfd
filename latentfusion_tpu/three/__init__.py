"""3D math kernel (L0). TPU-native rebuild of ``latentfusion.three``."""
from .core import *  # noqa: F401,F403
from . import stats  # noqa: F401
from . import quaternion  # noqa: F401
from .rigid import (  # noqa: F401
    decompose,
    extrinsic_to_position,
    extrinsic_to_quat,
    intrinsic_to_3x4,
    inverse_transform,
    matrix_3x3_to_4x4,
    random_translation,
    rotation_to_4x4,
    scale_matrix,
    to_extrinsic_matrix,
    translate_matrix,
    translation_to_4x4,
)
from .batchview import b2bv, bv2b, bvmm, vcat, vsplit  # noqa: F401
from . import orientation  # noqa: F401
from . import utils  # noqa: F401
from . import host  # noqa: F401
