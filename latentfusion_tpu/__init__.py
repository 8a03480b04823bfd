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


def enable_compilation_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache for this process.

    Cold TPU compiles of the refinement/CEM loops cost 100-500 s on a
    tunneled backend (seconds warm); the persistent cache amortizes them
    across processes and restarts. Call once before the first jit. The
    repo's own tools/bench default to /tmp/jax_bench_cache; deployments
    should point this somewhere durable.

    Returns the cache directory in use.
    """
    import os

    import jax

    if path is None:
        path = os.environ.get(
            "LATENTFUSION_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "latentfusion_tpu", "xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache even fast-compiling entries: estimate() re-jits per batch
    # geometry, and many small entries still beat the tunnel round-trip.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
