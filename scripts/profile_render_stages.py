#!/usr/bin/env python
"""Per-stage timing of the fused DP render pipeline on the current backend.

Breaks the pipe:fused 34.5 ms/pair (TPU v5e, 512x768/ks21, r3 A/B) into:
  mlp     — layers 0..1 bf16 + 8-layer trunk + tap-major last layer
            (mlp_fast.mlp_psf_tapmajor)
  trunk8  — the eight 512x512 hidden layers alone (the int8-kernel target)
  conv    — fused_conv_pallas.fused_dp_conv_tapmajor alone on a precomputed
            tap-major PSF
  pipe    — the full render_dp variant for reference

Timing is marginal-dispatch (same methodology as bench.py): time K dispatches
vs 2K dispatches and difference, so tunnel latency cancels.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def marginal_ms(fn, *args, k=6):
    """ms per dispatch via (t(2k) - t(k)) / k with consumed outputs."""
    def run(times):
        outs = []
        t0 = time.perf_counter()
        for _ in range(times):
            outs.append(fn(*args))
        s = sum(jnp.sum(o[0] if isinstance(o, tuple) else o) for o in outs)
        float(s)
        return time.perf_counter() - t0

    run(2)  # warm
    t1 = run(k)
    t2 = run(2 * k)
    return (t2 - t1) / k * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, nargs=2, default=(512, 768))
    ap.add_argument("--ks", type=int, default=21)
    args = ap.parse_args()

    from sdirt_tpu.render import mlp_fast
    from sdirt_tpu.render.fused_conv_pallas import fused_dp_conv_tapmajor
    from sdirt_tpu.render.pipeline import render_dp
    from sdirt_tpu.psfnet.surrogate import PSFNetLens

    h, w = args.res
    ks = args.ks
    lens = PSFNetLens("lenses/rf50mm/lens_web.json", kernel_size=ks,
                      sensor_res=(h, w))
    lens.load_net("ckpt/rf50mm/F4_PSFNet_mlp")
    params = lens.params
    print(f"backend={jax.default_backend()} res={h}x{w} ks={ks}", flush=True)

    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (1, h, w, 3), jnp.float32)
    img = jax.random.uniform(key, (1, h, w, 3), jnp.float32)

    mlp = jax.jit(lambda p, q: mlp_fast.mlp_psf_tapmajor(p, q, ks))
    t_mlp = marginal_ms(mlp, params, o)
    print(f"mlp (0..1 + trunk + last, tap-major)  {t_mlp:7.2f} ms", flush=True)

    layers = mlp_fast.dense_layers(params)
    x2 = mlp_fast.stack_views(o)

    @jax.jit
    def head(x):
        hh = x.astype(jnp.bfloat16)
        for ww, bb in layers[:2]:
            hh = jax.lax.dot_general(
                hh, ww.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            hh = jax.nn.relu(hh + bb).astype(jnp.bfloat16)
        return hh

    h0 = jax.block_until_ready(head(x2))
    t_head = marginal_ms(head, x2)
    print(f"head (3->128->512 bf16)               {t_head:7.2f} ms", flush=True)

    @jax.jit
    def trunk(hh):
        for ww, bb in layers[2:-1]:
            hh = jax.lax.dot_general(
                hh, ww.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            hh = jax.nn.relu(hh + bb).astype(jnp.bfloat16)
        return hh

    h8 = jax.block_until_ready(trunk(h0))
    t_trunk = marginal_ms(trunk, h0)
    print(f"trunk8 (8x 512x512 bf16, XLA)         {t_trunk:7.2f} ms", flush=True)

    wl, bl = layers[-1]

    @jax.jit
    def last(hh):
        psf = jax.lax.dot_general(
            wl.astype(jnp.bfloat16), hh.astype(jnp.bfloat16),
            (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        return jax.nn.relu(psf + bl[:, None]).astype(jnp.bfloat16)

    psf_flat = jax.block_until_ready(last(h8))
    t_last = marginal_ms(last, h8)
    print(f"last (512->{ks * ks} tap-major)          {t_last:7.2f} ms", flush=True)

    psf_tm = psf_flat.reshape(ks * ks, 1, 2, h * w)
    conv = jax.jit(lambda im, ps: fused_dp_conv_tapmajor(im, ps, ks))
    t_conv = marginal_ms(conv, img, psf_tm)
    print(f"conv (fused pallas, tap-major)        {t_conv:7.2f} ms", flush=True)

    depth = jax.random.uniform(key, (1, 1, h, w), jnp.float32) * 5 + 0.5
    imgc = img.transpose(0, 3, 1, 2)

    def pipe(im, d):
        return render_dp(lens.net.apply, params, im, d, 1.0,
                         d_sensor=lens.d_sensor, d_min=0.3, d_max=9.0,
                         ks=ks, variant="fused")

    t_pipe = marginal_ms(pipe, imgc, depth)
    print(f"pipe:fused end-to-end                 {t_pipe:7.2f} ms", flush=True)
    print(f"sum of stages                         "
          f"{t_head + t_trunk + t_last + t_conv:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
