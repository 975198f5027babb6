"""Test configuration: run JAX on a virtual 8-device CPU platform so the
multi-chip sharding path is exercised without TPU hardware.

The container's sitecustomize registers the TPU ("axon") PJRT plugin at
interpreter start and pins JAX_PLATFORMS=axon, so we reorder the platform
list at runtime: CPU (8 virtual devices) becomes the default backend, the
TPU stays reachable via jax.devices("tpu") for opt-in tests.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("MIXGANTTS_TEST_CPU_ONLY"):
    # drop the axon platform entirely: any backends() enumeration would
    # otherwise raise/hang if the TPU tunnel service is down (the CPU
    # suite is fully self-contained; only the few TPU-opt-in tests need
    # the chip and fail loudly under this knob)
    jax.config.update("jax_platforms", "cpu")
else:
    try:
        jax.config.update("jax_platforms", "cpu,axon")
    except Exception:
        jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
