"""Deterministic seeding (reference utils/util.py:16-25).

In JAX determinism comes from explicit PRNG keys; this helper seeds the
host-side RNGs used by the data pipeline and returns the root jax key.
"""

import os
import random

import numpy as np
import jax


def set_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)
