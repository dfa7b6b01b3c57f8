"""Test configuration: CPU backend with 8 virtual devices + float64.

Multi-device tests emulate the ICI mesh on host CPU (the reference tests MPI
only by launching mpirun; we instead use XLA's virtual device emulation), and
float64 lets convergence-order assertions run without TPU f32 noise.
Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
