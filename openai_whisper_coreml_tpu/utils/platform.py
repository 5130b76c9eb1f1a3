"""Platform selection helper.

Some environments register a PJRT plugin from sitecustomize and force
jax_platforms in *config* (which beats the JAX_PLATFORMS env var read at
import time). Tools that honour the env var call this once before any
backend initialisation.
"""

from __future__ import annotations

import os


def sync_platform_from_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        from jax._src import xla_bridge

        if not xla_bridge.backends_are_initialized():
            jax.config.update("jax_platforms", want)
    except Exception:
        pass
