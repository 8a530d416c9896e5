"""On-chip input-normalization kernels for the input pipeline.

``u8_normalize`` performs the uint8 -> float [lo, hi] conversion that the
reference performed on the host inside its tf.data map functions
(data.py:44-46, hem/data/*.py parse fns). hemx ships raw uint8 to the
device (4x less host->device bandwidth — the usual bottleneck per the
BASELINE.json north star) and converts on-chip.

Implementation note (measured on TPU v5e, round 3): the conversion is a
plain XLA convert+multiply — XLA lowers it to a fused VPU loop at
~memory bandwidth and, crucially, fuses it into the consumer (the batch
gather / the first conv) with no intermediate materialization. The
original hand-written Pallas kernel (kept below as
``u8_normalize_pallas`` for the integration test) measured **20x
slower** at the training shapes: its flatten-to-(rows,128) view forces a
physical relayout of the NHWC uint8 input (minor dim 3 -> lane dim 128)
that costs ~30 ms for a 3072x64x64x3 batch where the whole conversion
should cost ~2 ms, and its 32x128 grid blocks add per-block overhead.
The design win was always *shipping uint8* over the host link, not how
the multiply is scheduled — `scripts/input_kernel_analysis.py` holds the
measurement script (gather+XLA-norm fused 4.9 ms vs 36.3 ms Pallas for
a 6-batch group).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANES = 128
_SUBLANES = 32  # int8/uint8 min sublane tile


def u8_normalize(x, lo: float = 0.0, hi: float = 1.0):
    """uint8 array -> float32 in [lo, hi] (value/255 * (hi-lo) + lo).

    Plain jnp on purpose — XLA fuses it into the consumer; see the module
    docstring for the measurement that retired the Pallas version.
    """
    assert x.dtype == jnp.uint8, x.dtype
    scale = (hi - lo) / 255.0
    return x.astype(jnp.float32) * scale + lo


def _norm_kernel(x_ref, out_ref, *, scale: float, offset: float):
    # Mosaic has no direct uint8->f32 cast; widen via int32 first
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    out_ref[:] = x * scale + offset


@functools.partial(jax.jit, static_argnames=("lo", "hi"))
def u8_normalize_pallas(x, lo: float = 0.0, hi: float = 1.0):
    """The retired hand-written Pallas variant of :func:`u8_normalize`.

    NOT used on any hot path (20x slower than XLA at training shapes —
    module docstring); retained as the repo's exercised example of the
    Pallas TPU integration (grid/BlockSpec/VMEM) and equality-tested
    against the XLA path in tests/test_ops.py.
    """
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
