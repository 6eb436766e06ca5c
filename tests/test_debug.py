"""checkify debug mode catches NaNs at their source."""

import jax
import jax.numpy as jnp
import pytest
from jax.experimental import checkify

from histogan_tpu.utils.debug import checkify_step


def test_checkify_catches_nan():
    def step(x):
        y = jnp.log(x)          # NaN for negative input
        return y * 2.0

    wrapped = checkify_step(step)
    assert float(wrapped(jnp.asarray(2.0))) == pytest.approx(2 * jnp.log(2.0), rel=1e-6)
    with pytest.raises(checkify.JaxRuntimeError):
        wrapped(jnp.asarray(-1.0))


def test_checkify_clean_path_passes():
    def step(x):
        return jnp.sqrt(x) + 1.0

    out = checkify_step(step)(jnp.asarray(4.0))
    assert float(out) == 3.0
