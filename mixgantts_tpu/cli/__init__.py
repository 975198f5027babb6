"""CLI package.

Platform selection: ``MIXGANTTS_PLATFORM=cpu`` (or ``tpu``/``axon``) pins
the JAX backend for every CLI before any device is touched.  This has to
be a runtime ``jax.config.update`` — the container's sitecustomize
registers the axon TPU plugin and ignores the standard ``JAX_PLATFORMS``
env var (see CLAUDE.md) — and lets the CLIs run on machines with no TPU
(or a degraded TPU tunnel, which hangs backend enumeration).
"""

import os

_platform = os.environ.get("MIXGANTTS_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)
