"""Debug-mode NaN checking (SURVEY.md §5).

Production behavior keeps the reference's semantics: losses are checked
on the host each step and a NaN triggers checkpoint rollback + retry
(histoGAN/histoGAN.py:143-145, 1003-1010). For DEBUGGING the source of a
NaN, wrap the step with :func:`checkify_step` — every intermediate
jnp op is instrumented (jax.experimental.checkify float checks) and the
first NaN/Inf raises with a precise location instead of surfacing at the
loss."""

from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def checkify_step(step_fn: Callable) -> Callable:
    """Wrap a (possibly jitted) train step with float error checking.

    Returns a function with the same signature; raises
    ``checkify.JaxRuntimeError`` at the first NaN/Inf produced anywhere
    inside the step. Noticeably slower — debug only.
    """
    inner = getattr(step_fn, "__wrapped__", step_fn)
    checked = checkify.checkify(inner, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
