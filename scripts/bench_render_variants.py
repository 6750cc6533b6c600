#!/usr/bin/env python
"""A/B the DP render pipeline variants on the real TPU (VERDICT item 2).

Variants over the production shape (512x768, ks 21):
  base        — current pipeline (two MLP evals, f32 psf handoff, tap-scan)
  onegemm     — left+mirrored queries concatenated into ONE GEMM chain
  bf16psf     — psf materialized bf16 at the MLP->conv boundary (halves the
                ~1.4 GB HBM handoff)
  tapmajor    — conv reads a [ks*ks, ...] tap-major psf (contiguous per-tap
                slices instead of stride-441 gathers)
  combos      — onegemm + bf16psf (+ tapmajor)

Timing: marginal-dispatch (N1 vs N2 pipelined dispatches, one host pull per
batch) — the only honest method through the axon tunnel.

Usage: python scripts/bench_render_variants.py [--model mlp@256
         --psfnet results/f4_fit_w256/psfnet_mlp@256] [--only pipe:fused_int8 ...]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mlp",
                    help="surrogate architecture (mlp | mlp@WIDTH)")
    ap.add_argument("--psfnet", default="ckpt/rf50mm/F4_PSFNet_mlp",
                    help="surrogate checkpoint to load")
    ap.add_argument("--only", nargs="+", default=None,
                    help="subset of variant names to run")
    ap.add_argument("--lens", default="lenses/rf50mm/lens_web.json",
                    help="lens prescription (rf35mm pipelines bench with "
                         "their own d_sensor/d-range)")
    ap.add_argument("--ks", type=int, default=21)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sdirt_tpu.psfnet.surrogate import PSFNetLens
    from sdirt_tpu.render.camera import degamma, gamma
    from sdirt_tpu.render.perpixel import local_dp_conv

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lens = PSFNetLens(os.path.join(here, args.lens),
                      model_name=args.model, kernel_size=args.ks,
                      sensor_res=(512, 768))
    ckpt = os.path.join(here, args.psfnet)
    if os.path.exists(ckpt):
        lens.load_net(ckpt)
        print(f"loaded {args.model} surrogate from {ckpt}")
    apply_fn, params0 = lens.net.apply, lens.params
    ks = args.ks
    d_sensor, d_min, d_max = lens.d_sensor, lens.d_min, lens.d_max

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 3, 512, 768)).astype(np.float32))
    depth = jnp.asarray(-(rng.uniform(0, 1, (1, 1, 512, 768)) * 900 + 100)
                        .astype(np.float32))

    def make_inputs(dpth):
        n, _, h, w = img.shape
        d = dpth + d_sensor
        z = jnp.clip((d - d_min) / (d_max - d_min), 0.0, 1.0).reshape(n, h, w)
        x, y = jnp.meshgrid(jnp.linspace(-1, 1, w), jnp.linspace(1, -1, h),
                            indexing="xy")
        o = jnp.stack([jnp.broadcast_to(x[None], (n, h, w)),
                       jnp.broadcast_to(y[None], (n, h, w)), z], -1)
        return o.astype(jnp.float32)

    def mlp_two_evals(params, o):
        p = jax.tree.map(lambda t: t.astype(jnp.bfloat16), params)
        fn = lambda q: apply_fn(p, q.astype(jnp.bfloat16)).astype(jnp.float32)
        psfl = fn(o).reshape(*o.shape[:-1], ks, ks)
        om = o * jnp.array([-1.0, 1.0, 1.0])
        psfr = jnp.flip(fn(om).reshape(*o.shape[:-1], ks, ks), -1)
        psf = jnp.stack([psfl, psfr], -3)
        return psf / (psf.sum((-1, -2), keepdims=True) + 1e-9)

    def mlp_one_gemm(params, o):
        p = jax.tree.map(lambda t: t.astype(jnp.bfloat16), params)
        flat = o.reshape(-1, 3)
        both = jnp.concatenate([flat, flat * jnp.array([-1.0, 1.0, 1.0])], 0)
        out = apply_fn(p, both.astype(jnp.bfloat16)).astype(jnp.float32)
        P = flat.shape[0]
        psfl = out[:P].reshape(*o.shape[:-1], ks, ks)
        psfr = jnp.flip(out[P:].reshape(*o.shape[:-1], ks, ks), -1)
        psf = jnp.stack([psfl, psfr], -3)
        return psf / (psf.sum((-1, -2), keepdims=True) + 1e-9)

    def conv_tapmajor(lum, psf, ks):
        n, h, w, c = lum.shape
        pad = (ks - 1) // 2
        img_p = jnp.pad(lum, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                        mode="edge").astype(jnp.bfloat16)
        # [N,H,W,2,ks,ks] -> [ks*ks, N, H, W, 2]: contiguous per-tap reads
        psf_t = jnp.moveaxis(psf.reshape(n, h, w, 2, ks * ks), -1, 0)
        psf_t = psf_t.astype(jnp.bfloat16)

        def tap(acc, args):
            idx, k = args
            dy, dx = (ks * ks - 1 - idx) // ks, (ks * ks - 1 - idx) % ks
            patch = jax.lax.dynamic_slice(img_p, (0, dy, dx, 0), (n, h, w, c))
            acc_l = acc[0] + (patch * k[..., 0:1]).astype(jnp.float32)
            acc_r = acc[1] + (patch * k[..., 1:2]).astype(jnp.float32)
            return (acc_l, acc_r), None

        zero = jnp.zeros((n, h, w, c), jnp.float32)
        (out_l, out_r), _ = jax.lax.scan(tap, (zero, zero),
                                         (jnp.arange(ks * ks), psf_t))
        return out_l, out_r

    def build(mlp, conv, psf_bf16):
        @jax.jit
        def run(params, dpth):
            o = make_inputs(dpth)
            psf = mlp(params, o)
            if psf_bf16:
                psf = psf.astype(jnp.bfloat16)
            lum = degamma(img.transpose(0, 2, 3, 1))
            rl, rr = conv(lum, psf, ks)
            out = gamma(jnp.concatenate([rl, rr], -1))
            return jnp.clip(out, 0, 1)
        return run

    from sdirt_tpu.render.pipeline import render_dp

    def pipeline_variant(variant):
        def run(params, dpth):
            out = render_dp(apply_fn, params, img, dpth, [-1000.0],
                            d_sensor=d_sensor, d_min=d_min, d_max=d_max,
                            ks=ks, variant=variant)
            return out.transpose(0, 2, 3, 1)
        return run

    variants = {
        "base":               build(mlp_two_evals, local_dp_conv, False),
        "onegemm":            build(mlp_one_gemm, local_dp_conv, False),
        "bf16psf":            build(mlp_two_evals, local_dp_conv, True),
        "tapmajor":           build(mlp_two_evals, conv_tapmajor, True),
        "onegemm+bf16":       build(mlp_one_gemm, local_dp_conv, True),
        "onegemm+tapmajor":   build(mlp_one_gemm, conv_tapmajor, True),
        "pipe:scan":          pipeline_variant("scan"),
        "pipe:fused":         pipeline_variant("fused"),
        "pipe:fused_int8":    pipeline_variant("fused_int8"),
        # require a linear-output PSFMLPBasis surrogate (--model mlpb@WxK)
        "pipe:basis":         pipeline_variant("basis"),
        "pipe:basis_int8":    pipeline_variant("basis_int8"),
    }

    if args.only:
        variants = {k: v for k, v in variants.items() if k in args.only}

    ref_out = None
    for name, run in variants.items():
        # a variant that fails to compile/run on this backend (e.g. a Mosaic
        # rejection of the fused kernel) must not abort the remaining A/Bs —
        # this script runs unattended via scripts/tpu_queue_runner.py
        try:
            out = np.asarray(run(params0, depth))
        except Exception as e:  # noqa: BLE001
            print(f"{name:20s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        if ref_out is None:
            ref_out = out
        diff = np.abs(out - ref_out).max()

        def batch(nn, seed):
            acc = None
            for i in range(nn):
                d = depth + jnp.float32(i - seed) * 1e-3   # defeat caching
                r = run(params0, d)
                acc = r.mean() if acc is None else acc + r.mean()
            return float(acc)

        batch(2, 0)
        n1, n2 = 4, 14
        t0 = time.perf_counter(); batch(n1, 1)
        t1 = time.perf_counter(); batch(n2, 2)
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3
        print(f"{name:20s} {ms:7.2f} ms/pair   max|diff vs base| {diff:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
