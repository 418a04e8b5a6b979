"""Mosaic-safe lane rotates for every dtype.

``pltpu.roll`` on sub-32-bit dtypes hard-crashes the Mosaic compiler on
v5e (bisected; HTTP-500 with no diagnostic). The kernels' boundary-lane
synthesis only ever rotates along the LANE (last) axis, and the lane
structure of a 16-bit array is invariant under ``pltpu.bitcast`` to a
32-bit dtype — the bitcast packs pairs along the *second-to-last*
(sublane) dim, leaving every lane index in place. So a 16-bit lane roll
lowers as bitcast -> int32 lane roll -> bitcast back, all Mosaic-legal.

This unlocks synth-mode tap evaluation (no lane ghost columns in HBM,
boundaries synthesized in-register) for bfloat16, which round 1 had to
run in slice mode with full ghost-pad amplification.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def lane_roll(x: jax.Array, shift: int, axis: int) -> jax.Array:
    """Circular shift along the lane (last) axis, safe for 16-bit dtypes.

    Semantically identical to ``pltpu.roll(x, shift, axis)`` /
    ``jnp.roll``; ``axis`` must be the last axis.
    """
    if axis != x.ndim - 1:
        raise ValueError("lane_roll only rotates the last (lane) axis")
    itemsize = jnp.dtype(x.dtype).itemsize
    if itemsize == 4:
        return pltpu.roll(x, shift, axis)
    if itemsize == 2:
        if x.shape[-2] % 2:
            raise ValueError(
                "16-bit lane_roll needs an even sublane extent "
                f"(got shape {x.shape}); pad the second-to-last dim"
            )
        t = pltpu.bitcast(x, jnp.int32)
        t = pltpu.roll(t, shift, axis)
        return pltpu.bitcast(t, x.dtype)
    raise NotImplementedError(f"lane_roll for itemsize {itemsize}")
