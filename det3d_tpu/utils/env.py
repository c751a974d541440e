"""Runtime environment helpers."""

from __future__ import annotations

import os


def setup_jax_from_env() -> None:
    """Honor ``DET3D_JAX_PLATFORM`` even when a sitecustomize hook has
    force-registered a different backend (setting JAX_PLATFORMS alone is
    overridden by such hooks; the config update wins at backend-resolution
    time). Call before any jax device use."""
    plat = os.environ.get("DET3D_JAX_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
