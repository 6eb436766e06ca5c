"""Test config: force an 8-device virtual CPU mesh so sharding tests run
anywhere (the 'fake backend' strategy from SURVEY.md §4).

Note: this machine's sitecustomize imports jax at interpreter startup
(axon TPU plugin), so setting env vars here is too late — we must go
through jax.config as well.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
