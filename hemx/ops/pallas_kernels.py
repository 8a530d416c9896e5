"""Pallas TPU kernels for the input pipeline.

``u8_normalize`` fuses the uint8 -> float [lo, hi] conversion that the
reference performed on the host inside its tf.data map functions
(data.py:44-46, hem/data/*.py parse fns). hemx ships raw uint8 to the
device (4x less host->device bandwidth — the usual bottleneck per the
BASELINE.json north star) and converts on-chip.

The kernel flattens the batch to (rows, 128) tiles and runs on the VPU; a
jnp fallback covers CPU and shapes that don't tile (XLA fuses the fallback
into the consumer anyway — the Pallas path exists to guarantee the fusion
and to keep the conversion off the host).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANES = 128
_SUBLANES = 32  # int8/uint8 min sublane tile


def _norm_kernel(x_ref, out_ref, *, scale: float, offset: float):
    # Mosaic has no direct uint8->f32 cast; widen via int32 first
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    out_ref[:] = x * scale + offset


@functools.partial(jax.jit, static_argnames=("lo", "hi"))
def u8_normalize(x, lo: float = 0.0, hi: float = 1.0):
    """uint8 array -> float32 in [lo, hi] (value/255 * (hi-lo) + lo)."""
    assert x.dtype == jnp.uint8, x.dtype
    scale = (hi - lo) / 255.0
    offset = lo
    total = x.size
    on_tpu = jax.devices()[0].platform == "tpu"
    block = _SUBLANES * _LANES
    if on_tpu and total % block == 0:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        rows = total // _LANES
        flat = x.reshape(rows, _LANES)
        n_blocks = rows // _SUBLANES
        y = pl.pallas_call(
            functools.partial(_norm_kernel, scale=scale, offset=offset),
            out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(flat)
        return y.reshape(x.shape)
    return x.astype(jnp.float32) * scale + offset


def u16_normalize(x, denom: float = 65535.0):
    """uint16 depth -> float32 [0,1] (NYUv2 path); jnp (XLA fuses it)."""
    return x.astype(jnp.float32) / denom
