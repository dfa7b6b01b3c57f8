"""Test configuration: CPU backend with 8 virtual devices + float64.

Multi-device tests emulate the ICI mesh on host CPU (the reference tests MPI
only by launching mpirun; we instead use XLA's virtual device emulation), and
float64 lets convergence-order assertions run without TPU f32 noise.

Note: the ambient environment may pre-import jax with a TPU platform plugin
(sitecustomize), so we must override via jax.config, not just env vars.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (may already be in sys.modules via sitecustomize)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
