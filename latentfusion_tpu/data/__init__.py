"""L6 data layer: datasets, rendering, loaders."""
from . import bop, loader, rasterizer, rendering, synthetic  # noqa: F401
from .bop import BOPDataset  # noqa: F401
from .loader import IterableLoader, collate  # noqa: F401
from .rendering import Renderer, SceneContext, load_object  # noqa: F401
from .synthetic import (  # noqa: F401
    BOPTrainDataset,
    ModelNetDataset,
    ShapeNetDataset,
    SyntheticDataset,
    YCBDataset,
)
