"""RNG discipline.

The reference relies on global-seed context managers to synchronize stochastic
transforms (contrastyou/utils/utils.py:121-163). In JAX, explicit PRNG keys make
that exact by construction; these helpers cover the residual host-side (numpy /
python-random) augmentation code and provide an infinite key stream.
"""
from __future__ import annotations

import random
from typing import Iterator

import jax
import numpy as np


def fix_all_seed(seed: int) -> None:
    """Seed python-random + numpy (host-side augmentation and samplers)."""
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))


def key_iter(seed_or_key) -> Iterator[jax.Array]:
    """Infinite stream of fresh PRNG keys from a seed or key."""
    key = (jax.random.PRNGKey(seed_or_key)
           if isinstance(seed_or_key, int) else seed_or_key)
    while True:
        key, sub = jax.random.split(key)
        yield sub
