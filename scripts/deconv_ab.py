#!/usr/bin/env python
"""Interleaved A/B of the two transposed-conv lowerings (--deconv_impl).

Compiles the FULL IWGAN train call (5 critic + G) twice in ONE process —
once per lowering — then times the two executables in alternating blocks
so tunnel-session drift cancels. This is the harness behind PERF.md
"Transposed-conv lowering": the earlier cross-process chain A/B (separate
runs 20 min apart) disagreed with this interleaved result because
session-to-session tunnel variance exceeded the ~6% effect being
measured; interleave A/Bs before believing cross-process deltas.

Usage: python scripts/deconv_ab.py [--batch 512] [--blocks 3] [--steps 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--image", type=int, default=64)
    ap.add_argument("--latent", type=int, default=200)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--steps", type=int, default=10,
                    help="train calls per timed block")
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    import jax

    import bench
    from hemx.ops.layers import set_compute_dtype, set_deconv_impl
    from hemx.parallel.dp import shard_batch
    from hemx.parallel.mesh import make_mesh

    set_compute_dtype("bfloat16")
    mesh = make_mesh(0)
    rng = np.random.default_rng(0)
    host = {"image": rng.random((args.batch, args.image, args.image, 3),
                                dtype=np.float32)}
    device_batch = shard_batch(host, mesh)

    def forever():
        while True:
            yield device_batch

    arms = {}
    for impl in ("dilated", "phase_split"):
        # the lowering is read at trace time, so each arm's executable
        # bakes its impl; both live in this one process
        set_deconv_impl(impl)
        ns = argparse.Namespace(batch=args.batch, image=args.image,
                                latent=args.latent, no_fused=False)
        model, _ = bench._iwgan(ns, mesh)
        ts = model.init_state(jax.random.PRNGKey(0), host)
        s = forever()
        for _ in range(args.warmup):
            ts, _ = model.train(ts, s)
        bench._barrier(ts)
        arms[impl] = (model, ts, s)

    results = {impl: [] for impl in arms}
    for block in range(args.blocks):
        for impl, (model, ts, s) in arms.items():
            # compilation happened in each arm's warmup above, but any
            # late retrace inside a timed block (donation-shape drift, an
            # unexpected cache miss) would silently trace with whatever
            # impl was set LAST — pin the arm's lowering so a retrace
            # compiles the right one (ADVICE r3)
            set_deconv_impl(impl)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                ts, _ = model.train(ts, s)
            bench._barrier(ts)
            per_call = (time.perf_counter() - t0) / args.steps
            arms[impl] = (model, ts, s)
            results[impl].append(per_call)
            print(f"block {block} {impl:>11}: {per_call * 1e3:8.1f} ms/call",
                  flush=True)

    med = {impl: float(np.median(v)) for impl, v in results.items()}
    d, p = med["dilated"], med["phase_split"]
    print(f"\nmedian dilated {d*1e3:.1f} ms, phase_split {p*1e3:.1f} ms "
          f"-> {'dilated' if d <= p else 'phase_split'} wins by "
          f"{abs(p - d) / max(d, p) * 100:.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
