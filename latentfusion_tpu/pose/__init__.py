"""L5 pose estimation: estimators, initialization, metrics."""
from . import estimation, format, gmm, initialization, metrics, utils  # noqa: F401
from .estimation import (  # noqa: F401
    CrossEntropyPoseEstimator,
    GradientPoseEstimator,
    MetropolisPoseEstimator,
    PoseEstimator,
    default_pose_loss,
    load_from_config,
    weigh_losses,
)
