"""Memory-chunked evaluation of elementwise-batched functions.

Counterpart of the reference's ``sharded_apply``/``inference_subbatch``
(/root/reference/structure_tokenizer/model/mapping.py:55-245), which evaluates
a module over slices of its batch axis under ``hk.scan`` to bound peak
activation memory.  The TPU-first version pads the axis to a whole number of
chunks and runs ``lax.map`` over a reshaped leading axis — static shapes, one
compiled body, no dynamic_update_slice stitching.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def chunked_apply(
    fn: Callable,
    x: jax.Array,
    *,
    chunk_size: int,
    axis: int = 0,
) -> jax.Array:
    """Apply ``fn`` over ``axis``-chunks of ``x`` and concatenate the results.

    ``fn`` must be elementwise along ``axis`` (output rows depend only on the
    matching input rows) and shape-polymorphic over that axis, which holds for
    the transition/MLP blocks this exists for.  Peak live activation memory of
    ``fn`` drops by ``~len/chunk_size``.
    """
    length = x.shape[axis]
    if chunk_size >= length:
        return fn(x)

    x = jnp.moveaxis(x, axis, 0)
    num_chunks = -(-length // chunk_size)
    padded = num_chunks * chunk_size
    pad = padded - length
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    x = x.reshape((num_chunks, chunk_size) + x.shape[1:])

    out = jax.lax.map(fn, x)
    out = out.reshape((padded,) + out.shape[2:])[:length]
    return jnp.moveaxis(out, 0, axis)
