"""Weight initializers.

Numerically equivalent to the reference's initializer choices:
  * ``variance_scaling(truncated_normal, scale=1.0, fan_in)`` — the global
    default wired through ``build_initializer`` in the reference
    (/root/reference/structure_tokenizer/model/utils.py:151-171, with the
    released config ``init: {distribution: truncated_normal, scale: 1., mode:
    fan_in}``).
  * AF2-style string initializers ("linear" / "relu" / "zeros") used by the
    structure-module Linear (/root/reference/structure_tokenizer/model/
    common_modules.py:30-50).

Exact init parity is not required for checkpoint inference (weights are
loaded), but training from scratch should start from the same distribution.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# scipy.stats.truncnorm.std(a=-2, b=2, loc=0., scale=1.)
TRUNCATED_NORMAL_STDDEV_FACTOR = 0.87962566103423978


def truncated_normal(key, shape, stddev: float, dtype=jnp.float32):
    unscaled = jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)
    return (stddev * unscaled).astype(dtype)


def variance_scaling_truncated_fan_in(key, shape: Sequence[int], scale: float = 1.0):
    """VarianceScaling(scale, fan_in, truncated_normal) for 2D+ weights."""
    if len(shape) >= 2:
        fan_in = int(np.prod(shape[:-1]))
    else:
        fan_in = int(shape[0])
    stddev = math.sqrt(scale / max(1.0, fan_in)) / TRUNCATED_NORMAL_STDDEV_FACTOR
    return truncated_normal(key, tuple(shape), stddev)


def af2_linear_init(key, shape: Sequence[int], initializer: str, num_input_dims: int = 1):
    """AF2 Linear init: fan-in truncated normal, x2 variance for 'relu'."""
    if initializer == "zeros":
        return jnp.zeros(shape, jnp.float32)
    in_shape = shape[:num_input_dims]
    scale = 1.0
    for dim in in_shape:
        scale /= dim
    if initializer == "relu":
        scale *= 2
    stddev = math.sqrt(scale) / TRUNCATED_NORMAL_STDDEV_FACTOR
    return truncated_normal(key, tuple(shape), stddev)
