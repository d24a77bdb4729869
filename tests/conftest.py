"""Test config: run on a virtual 8-device CPU mesh by default.

The container pins JAX to the axon TPU backend via sitecustomize; we
override to CPU so the suite is hermetic, fast, and can exercise
multi-device sharding on a virtual mesh. Set ``MIA_TEST_BACKEND=tpu`` to
run kernel tests against the real chip instead.

XLA_FLAGS must be set before the CPU client is created (first jax use).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("MIA_TEST_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
