"""Test fixtures. Platform forcing lives in the repo-root conftest.py."""
import numpy as np
import pytest


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.RandomState(0)
