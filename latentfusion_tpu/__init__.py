"""LatentFusion-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the
LatentFusion unseen-object 6D pose estimation framework (NVlabs/latentfusion,
CVPR 2020).

Layer map (mirrors SURVEY.md §1):

- ``three/``        L0 3D math kernel
- ``ops/``          L1 resampling kernels (grid_sample 2D/3D, interpolate) —
                    XLA gather reference impls + Pallas TPU kernels
- ``camera.py``     L1 batched differentiable pinhole camera (pytree)
- ``modules/``      L2 NN building blocks (equalized convs, blocks DSL, UNets,
                    conv GRU/LSTM)
- ``recon/``        L3/L4 Sculptor/Photographer/fusers + LatentFusionModel
- ``observation.py``L4 RGB-D observation container
- ``pose/``         L5 pose estimators (CEM / gradient / Metropolis) + metrics
- ``data/``         L6 datasets + rendering
- ``train/``        L7 training harness
- ``parallel/``     device-mesh sharding utilities
"""
import logging

__version__ = "0.1.0"

logging.getLogger(__name__).addHandler(logging.NullHandler())

_LAZY_EXPORTS = {
    "Camera": ("latentfusion_tpu.camera", "Camera"),
    "Observation": ("latentfusion_tpu.observation", "Observation"),
    "LatentFusionModel": ("latentfusion_tpu.recon.inference",
                          "LatentFusionModel"),
    "three": ("latentfusion_tpu.three", None),
    "ops": ("latentfusion_tpu.ops", None),
}


def __getattr__(name):
    """Lazy top-level exports (keeps `import latentfusion_tpu` light)."""
    if name in _LAZY_EXPORTS:
        import importlib

        module_name, attr = _LAZY_EXPORTS[name]
        module = importlib.import_module(module_name)
        return getattr(module, attr) if attr else module
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
