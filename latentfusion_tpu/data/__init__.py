"""L6 data layer: datasets, rendering, loaders."""
from . import (  # noqa: F401
    bop,
    colmap,
    kinectfusion,
    loader,
    rasterizer,
    realsense,
    rendering,
    synthetic,
    triplet,
)
from .bop import BOPDataset  # noqa: F401
from .colmap import ColmapDataset  # noqa: F401
from .kinectfusion import KinectFusionDataset  # noqa: F401
from .realsense import RealsenseDataset  # noqa: F401
from .triplet import TripletDataset  # noqa: F401
from .loader import IterableLoader, collate  # noqa: F401
from .rendering import Renderer, SceneContext, load_object  # noqa: F401
from .synthetic import (  # noqa: F401
    BOPTrainDataset,
    ModelNetDataset,
    ShapeNetDataset,
    SyntheticDataset,
    YCBDataset,
)
