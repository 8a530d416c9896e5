#!/usr/bin/env python
"""Measure the on-device input-path kernels (round-3 analysis).

Times, on the real chip, the pieces of device-resident batch assembly:
the dataset gather at batch and group granularity, and the uint8
normalize in its Pallas and plain-XLA forms. This script produced the
numbers behind two round-3 decisions (PERF.md "Input-path kernels"):

1. the hand-written Pallas u8_normalize was retired — its
   flatten-to-(rows,128) view forces a physical relayout of the NHWC
   uint8 input that costs ~20x the whole conversion, while XLA's fused
   convert+multiply runs at memory speed and fuses into the consumer;
2. DeviceDataPipeline gained grouped assembly — the TPU dynamic-gather
   has a ~4 ms launch latency that is flat in row count, so one gather
   for a whole train call's batches (group = model.batches_per_train_call)
   costs the same as one batch's gather.

Usage: python scripts/input_kernel_analysis.py   (needs the TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from hemx.parallel.mesh import make_mesh, replicated_sharding
from hemx.ops.pallas_kernels import u8_normalize, u8_normalize_pallas

BATCH, IMAGE, N, G = 512, 64, 18432, 6


def timeit(name, fn, *args, calls=20):
    out = fn(*args)  # compile
    jax.device_get(jax.tree_util.tree_leaves(out)[0][0, :1])
    t0 = time.perf_counter()
    for _ in range(calls):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][0, :1])
    dt = (time.perf_counter() - t0) / calls * 1000
    print(f"{name}: {dt:.2f} ms")
    return dt


def main():
    mesh = make_mesh(0)
    repl = replicated_sharding(mesh)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (N, IMAGE, IMAGE, 3), dtype=np.uint8)
    ds = jax.device_put(imgs, repl)
    idx_np = rng.permutation(N)[:G * BATCH].astype(np.int32)
    idx_g = jax.device_put(idx_np, repl)
    idx_1 = jax.device_put(idx_np[:BATCH], repl)

    gather = jax.jit(lambda d, i: jnp.take(d, i, axis=0))
    gather_norm = jax.jit(
        lambda d, i: u8_normalize(jnp.take(d, i, axis=0), 0.0, 1.0))
    norm_xla = jax.jit(lambda g: u8_normalize(g, 0.0, 1.0))

    print(f"dataset [{N}, {IMAGE}x{IMAGE}x3] uint8; batch {BATCH}; "
          f"group {G}")
    timeit(f"gather 1 batch  [{BATCH} rows]", gather, ds, idx_1)
    timeit(f"gather {G}-group [{G * BATCH} rows]", gather, ds, idx_g)
    pre = gather(ds, idx_g)
    timeit("normalize XLA (4d, group)", norm_xla, pre)
    timeit("normalize Pallas (retired; 4d relayout cost)",
           u8_normalize_pallas, pre)
    timeit("gather + XLA normalize fused (group)", gather_norm, ds, idx_g)


if __name__ == "__main__":
    main()
