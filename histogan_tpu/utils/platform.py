"""Backend selection helper.

This machine's sitecustomize registers a TPU plugin at interpreter
startup which can shadow ``JAX_PLATFORMS`` from the environment; calling
this before any backend query restores env-var semantics for CLI runs
(e.g. JAX_PLATFORMS=cpu for smoke tests)."""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


def setup_runtime() -> None:
    """CLI entry preamble: platform selection, then multi-host init —
    strictly in that order, and strictly before any backend query
    (jax.distributed.initialize is a dead letter once the local backend
    is up; see parallel/mesh.py)."""
    honor_jax_platforms_env()
    from histogan_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
