"""Metric domain tests (mirrors reference tests/test_metrics.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_nmf_tpu.metrics import beta_div, euclidean, is_div, kl_div, sparseness

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("beta", [-1, 0, 0.5, 1, 1.5, 2, 3])
@pytest.mark.parametrize(
    "x, y",
    [
        (np.zeros(100, "f"), RNG.rand(100).astype("f")),
        (RNG.rand(100).astype("f"), RNG.rand(100).astype("f")),
        (RNG.rand(100).astype("f"), np.zeros(100, "f")),
        (np.zeros(100, "f"), np.zeros(100, "f")),
    ],
)
def test_beta_value_range(beta, x, y):
    loss = beta_div(x, y, beta)
    assert not bool(jnp.any(jnp.isnan(loss))), float(loss)
    assert not bool(jnp.any(loss < 0)), float(loss)


def test_sparseness_value_range():
    x = RNG.rand(100).astype("f")
    s = sparseness(x)
    assert not bool(jnp.isnan(s))
    assert 0 <= float(s) <= 1


def test_specials_match_generic_limits():
    x = RNG.rand(64).astype("f") + 0.1
    y = RNG.rand(64).astype("f") + 0.1
    assert np.isclose(float(beta_div(x, y, 2)), float(euclidean(x, y)))
    assert np.isclose(float(beta_div(x, y, 1)), float(kl_div(x, y)))
    assert np.isclose(float(beta_div(x, y, 0)), float(is_div(x, y)))
    # generic formula approaches the specials
    assert np.isclose(
        float(beta_div(x, y, 1 + 1e-4)), float(kl_div(x, y)), rtol=1e-2
    )
