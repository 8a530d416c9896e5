#!/usr/bin/env python
"""MFU / roofline analysis of the IWGAN hot path (VERDICT r1 #9).

Measures the compiled critic step and generator step separately on the
real chip, pulls the EXACT FLOP count from XLA's cost analysis of each
compiled executable, and prints MFU against TPU v5e peak. Output is the
quantitative core of PERF.md.

Usage: python scripts/perf_analysis.py [--batch 512] [--latent 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e chip peaks (public spec: 197 bf16 TFLOP/s, 819 GB/s HBM)
V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--image", type=int, default=64)
    p.add_argument("--latent", type=int, default=200)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--deconv_impl", default="dilated",
                   choices=["dilated", "phase_split"])
    a = p.parse_args()

    import jax
    from hemx.ops.layers import set_compute_dtype, set_deconv_impl
    set_compute_dtype(a.dtype)
    set_deconv_impl(a.deconv_impl)
    from hemx.config import default_args as make_args
    from hemx.models.plugin import get_model
    from hemx.parallel.mesh import make_mesh, replicated_sharding, \
        data_sharding
    from hemx.parallel.dp import shard_batch

    mesh = make_mesh(0)
    margs = make_args(model="iwgan", batch_size=a.batch // mesh.devices.size,
                      latent_size=a.latent, n_disc_train=5,
                      optimizer="adam", lr=1e-4, beta1=0.5, beta2=0.9,
                      synthetic_shape=[a.image, a.image, 3])
    model = get_model("iwgan")(margs, mesh)
    rng = np.random.default_rng(0)
    host = {"image": rng.random((a.batch, a.image, a.image, 3),
                                dtype=np.float32)}
    ts = model.init_state(jax.random.PRNGKey(0), host)
    batch = shard_batch(host, mesh)

    def measure(jit_call, label, n=a.steps):
        nonlocal ts
        # jit_step donates ts; thread it through
        for _ in range(3):
            ts, _ = jit_call(ts, batch)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(ts["params"])[0]))
        t0 = time.perf_counter()
        for _ in range(n):
            ts, _ = jit_call(ts, batch)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(ts["params"])[0]))
        dt = (time.perf_counter() - t0) / n
        return dt

    def cost(step_fn):
        """Exact XLA cost analysis of the compiled executable."""
        repl = replicated_sharding(mesh)
        data = data_sharding(mesh)
        lowered = jax.jit(step_fn, in_shardings=(repl, data)).lower(ts, batch)
        c = lowered.compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {"flops": float(c.get("flops", float("nan"))),
                "bytes": float(c.get("bytes accessed", float("nan")))}

    # Rebuild the raw step fns for cost analysis (jit_step hides them).
    # These are the same closures model._compile produced; reconstruct via
    # the public API: one critic update and one generator update.
    d_time = measure(model._jit_d, "critic")
    g_time = measure(model._jit_g, "generator")

    # cost analysis on freshly-lowered copies of the same steps
    from hemx.models import common
    from hemx.core import Ctx
    from hemx.ops import losses as L

    def d_step(ts, batch):
        x = 2.0 * (batch["image"] - 0.5)
        rng_, nb = common.split_step_rng(ts)
        rng_, zk, ak = jax.random.split(rng_, 3)
        z = jax.random.normal(zk, (x.shape[0], a.latent))

        def d_loss_fn(dp):
            params = {**ts["params"], "discriminator": dp}
            g, _ = model._g_forward(params, ts["mstate"], z,
                                    Ctx(training=True, rng=rng_))
            both, _ = model._d_forward(params, ts["mstate"],
                                       jax.numpy.concatenate([x, g]),
                                       Ctx(training=True, rng=rng_))
            d_real, d_fake = both[:x.shape[0]], both[x.shape[0]:]
            d_loss = L.wgan_d_loss(d_real, d_fake)
            alpha = jax.random.uniform(ak, (x.shape[0], 1))

            def d_apply(imgs):
                s, _ = model._d_forward(params, ts["mstate"], imgs,
                                        Ctx(training=True, rng=rng_))
                return s

            return d_loss + 10.0 * L.gradient_penalty(d_apply, x, g, alpha)

        d_loss, grads = jax.value_and_grad(d_loss_fn)(
            ts["params"]["discriminator"])
        new_d, new_opt = common.apply_updates_group(
            model.d_optimizer, grads, ts["opt"]["d"],
            ts["params"]["discriminator"])
        # metrics are RETURNED, as in the real step — an unused value
        # would be dead-code-eliminated out of the compiled executable
        # and the cost analysis would under-count vs the measured time
        return ({**ts, "params": {**ts["params"], "discriminator": new_d},
                 "opt": {**ts["opt"], "d": new_opt}, "rng": nb},
                {"d_loss": d_loss})

    dc = cost(d_step)

    def g_step(ts, batch):
        """Generator update (mirrors gan.py g_step: G fwd -> D fwd ->
        wgan_g_loss -> grad -> adam; the d_loss-reporting D(x) forward is
        included, as in the real step). VERDICT r3 weak #4: the G step is
        deconv-dominated — exactly the op class the --deconv_impl A/B is
        about — so it gets the same exact-FLOPs roofline as the critic."""
        x = 2.0 * (batch["image"] - 0.5)
        rng_, nb = common.split_step_rng(ts)
        rng_, zk = jax.random.split(rng_)
        z = jax.random.normal(zk, (x.shape[0], a.latent))

        def g_loss_fn(gp_):
            params = {**ts["params"], "generator": gp_}
            g, ms_g = model._g_forward(params, ts["mstate"], z,
                                       Ctx(training=True, rng=rng_))
            d_fake, _ = model._d_forward(params, ts["mstate"], g,
                                         Ctx(training=True, rng=rng_))
            return L.wgan_g_loss(d_fake), (ms_g, d_fake)

        (g_loss, (ms_g, d_fake)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(ts["params"]["generator"])
        d_real, _ = model._d_forward(ts["params"], ts["mstate"], x,
                                     Ctx(training=True, rng=rng_))
        new_g, new_opt = common.apply_updates_group(
            model.g_optimizer, grads, ts["opt"]["g"],
            ts["params"]["generator"])
        # d_loss is returned so the D(x) forward — present in the real
        # step's metrics (gan.py g_step) — survives compilation and is
        # counted by cost_analysis, matching what g_time measures
        return ({**ts, "params": {**ts["params"], "generator": new_g},
                 "mstate": {**ts["mstate"], "generator": ms_g},
                 "opt": {**ts["opt"], "g": new_opt}, "rng": nb},
                {"g_loss": g_loss,
                 "d_loss": L.wgan_d_loss(d_real, d_fake)})

    gc = cost(g_step)

    d_tf = dc["flops"] / 1e12
    g_tf = gc["flops"] / 1e12
    call_time = 5 * d_time + g_time
    call_tf = 5 * d_tf + g_tf
    call_bytes = 5 * dc["bytes"] + gc["bytes"]
    out = {
        "batch": a.batch, "latent": a.latent, "dtype": a.dtype,
        "deconv_impl": a.deconv_impl,
        "critic_step_ms": round(d_time * 1e3, 3),
        "generator_step_ms": round(g_time * 1e3, 3),
        "train_call_ms": round(call_time * 1e3, 3),
        "images_per_sec": round(a.batch / call_time, 1),
        "critic_flops_T": round(d_tf, 4),
        "critic_tflops_per_s": round(d_tf / d_time, 1),
        "critic_mfu_vs_bf16_peak": round(d_tf / d_time / V5E_BF16_TFLOPS, 3),
        "critic_bytes_GB": round(dc["bytes"] / 1e9, 3),
        "critic_hbm_GBps": round(dc["bytes"] / 1e9 / d_time, 1),
        "critic_hbm_util": round(dc["bytes"] / 1e9 / d_time / V5E_HBM_GBS, 3),
        "generator_flops_T": round(g_tf, 4),
        "generator_tflops_per_s": round(g_tf / g_time, 1),
        "generator_mfu_vs_bf16_peak": round(
            g_tf / g_time / V5E_BF16_TFLOPS, 3),
        "generator_bytes_GB": round(gc["bytes"] / 1e9, 3),
        "generator_hbm_GBps": round(gc["bytes"] / 1e9 / g_time, 1),
        "generator_hbm_util": round(
            gc["bytes"] / 1e9 / g_time / V5E_HBM_GBS, 3),
        "train_call_flops_T": round(call_tf, 4),
        "train_call_mfu_vs_bf16_peak": round(
            call_tf / call_time / V5E_BF16_TFLOPS, 3),
        "train_call_hbm_util": round(
            call_bytes / 1e9 / call_time / V5E_HBM_GBS, 3),
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
