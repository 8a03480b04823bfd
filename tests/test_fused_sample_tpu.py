"""TPU-target Mosaic compile coverage for the fused volume sampler
(ADVICE r3 #1: the in-kernel (8,BK)->(BK,8) transpose relayout is only
exercised in interpret mode by the CPU suite; a Mosaic lowering regression
would otherwise first surface in the benchmark).

The regular suite pins the CPU platform in-process (tests/conftest.py), so
this check must run in a clean subprocess against the real chip. It is
gated behind LF_TPU_TESTS=1: CPU-only CI skips it; the bench sweep and any
TPU box run it with

    LF_TPU_TESTS=1 python -m pytest tests/test_fused_sample_tpu.py -q
"""
import os
import subprocess
import sys

import pytest

_CHECK = r"""
import jax, jax.numpy as jnp, numpy as np
from latentfusion_tpu import enable_compilation_cache
enable_compilation_cache()
assert jax.devices()[0].platform != "cpu", (
    "no accelerator visible: " + repr(jax.devices()))
from latentfusion_tpu.ops.pallas_fused_sample import grid_sample_3d_fused
from latentfusion_tpu.ops.gather_matmul import grid_sample_3d_matmul
vol = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 16, 16, 16))
grid = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 8, 3),
                          minval=-1.1, maxval=1.1)
for pm in ("zeros", "border"):
    f = jax.jit(lambda g: grid_sample_3d_fused(vol, g, padding_mode=pm))
    gr = jax.jit(jax.grad(lambda g: grid_sample_3d_fused(
        vol, g, padding_mode=pm).sum()))
    a = np.asarray(f(grid))
    da = np.asarray(gr(grid))
    b = np.asarray(grid_sample_3d_matmul(
        jnp.tile(vol, (8, 1, 1, 1, 1)), grid, padding_mode=pm))
    assert np.allclose(a, b, atol=3e-2), (pm, np.abs(a - b).max())
    assert np.isfinite(da).all(), pm
print("mosaic compile + value check OK on", jax.devices()[0].device_kind)
"""


@pytest.mark.skipif(
    os.environ.get("LF_TPU_TESTS") != "1",
    reason="needs the real TPU; set LF_TPU_TESTS=1 (conftest pins the CPU "
           "platform in-process, so the check runs in a subprocess)")
def test_fused_sampler_mosaic_compile_fwd_bwd():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run([sys.executable, "-c", _CHECK], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-3000:])
    assert "mosaic compile + value check OK" in proc.stdout
