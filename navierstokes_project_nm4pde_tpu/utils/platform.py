"""Honor the JAX_PLATFORMS environment variable on this backend.

The deployment image pre-registers the TPU platform from sitecustomize, and
that registration wins over a shell-level ``JAX_PLATFORMS=cpu`` -- the env
var alone leaves ``jax.default_backend() == "tpu"``.  Entry points call
:func:`honor_platform_env` before any jax use so ``JAX_PLATFORMS=cpu
python -m ...`` behaves as documented (tests/conftest.py applies the same
fix for the test suite).
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # jax already initialized with an explicit platform
