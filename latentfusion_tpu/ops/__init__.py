"""L1 resampling kernels: grid_sample (XLA gather + Pallas backends) and
torch-convention interpolate."""
from .grid_sample import grid_sample, grid_sample_2d, grid_sample_3d  # noqa: F401
from .interpolate import Interpolate, interpolate, resize_nearest  # noqa: F401
