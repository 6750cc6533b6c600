#!/usr/bin/env python
"""Stage decomposition of the trace-and-splat north star at the bench shape.

Times each prefix of the pipeline with the bench's on-device lax.scan loop
(scalar carry, one host pull) so stage cost = difference of adjacent rows:

  sample          ray generation only
  trace           + 12-surface scan trace
  propagate       + propagate_to(d_sensor)
  splat           + forward_integral (no chief centering)
  full            dp_psf(center=True) — the bench metric

Variants (--trace scan|specialized) pick the surface-loop implementation.
Run on an IDLE chip; each row prints Mrays/s and ms/call.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", choices=("scan", "specialized"), default="scan")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--spp", type=int, default=20000)
    ap.add_argument("--spp-chief", type=int, default=2048)
    ap.add_argument("--n-pts", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdirt_tpu.dp.psf import dp_psf, lens_scalars
    from sdirt_tpu.dp.splat import forward_integral
    from sdirt_tpu.optics.surfaces import trace_rays, trace_rays_specialized
    from sdirt_tpu.optics.sampling import sample_from_points
    from sdirt_tpu.psfnet.surrogate import PSFNetLens

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lens = PSFNetLens(os.path.join(here, "lenses/rf50mm/lens_web.json"),
                      model_name="mlp", kernel_size=21, sensor_res=(512, 768))
    eta, skip = lens.eta_arrays(0.589, True)
    scalars = lens_scalars(lens)
    desc = lens.static_desc() if args.trace == "specialized" else None

    n_pts, spp, spp_chief, ks = args.n_pts, args.spp, args.spp_chief, 21
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    -(rng.uniform(0, 1, n_pts) * 19800 + 200)], -1)
    pts = jnp.asarray(pts.astype(np.float32))

    depth = pts[:, 2]
    scale = -depth * jnp.tan(scalars["hfov"]) / scalars["r_last"]
    point_obj = jnp.stack([pts[:, 0] * scale * scalars["sensor_w"] / 2,
                           pts[:, 1] * scale * scalars["sensor_h"] / 2,
                           depth], -1)
    pupilz, pupilr = scalars["pupilz"], scalars["pupilr"]
    d_sensor, ps = scalars["d_sensor"], scalars["ps"]

    if desc is not None:
        trace = lambda r: trace_rays_specialized(r, desc, eta)
    else:
        trace = lambda r: trace_rays(r, lens.stack, eta, skip)

    def stage_sample(key):
        r = sample_from_points(key, point_obj, spp, pupilz, pupilr)
        return r.o.mean() + r.d.mean()

    def stage_trace(key):
        r = trace(sample_from_points(key, point_obj, spp, pupilz, pupilr))
        return r.o.mean() + r.ra.mean()

    def stage_prop(key):
        r = trace(sample_from_points(key, point_obj, spp, pupilz, pupilr))
        r = r.propagate_to(d_sensor)
        return r.o.mean() + r.ra.mean()

    def stage_splat(key):
        r = trace(sample_from_points(key, point_obj, spp, pupilz, pupilr))
        r = r.propagate_to(d_sensor)
        pointc = jnp.stack([pts[:, 0] * scalars["sensor_w"] / 2,
                            pts[:, 1] * scalars["sensor_h"] / 2], -1)
        psf_l, psf_r = forward_integral(r.o, r.d, r.ra, ks=ks, ps=ps,
                                        pointc_ref=pointc, chunk=2048)
        return psf_l.mean() + psf_r.mean()

    def stage_full(key):
        psf_l, _ = dp_psf(lens.stack, eta, skip, pts, key, scalars,
                          spp=spp, spp_chief=spp_chief, ks=ks, chunk=2048,
                          static_desc=desc)
        return psf_l.mean()

    def stage_splat_scatter(key):
        r = trace(sample_from_points(key, point_obj, spp, pupilz, pupilr))
        r = r.propagate_to(d_sensor)
        pointc = jnp.stack([pts[:, 0] * scalars["sensor_w"] / 2,
                            pts[:, 1] * scalars["sensor_h"] / 2], -1)
        psf_l, psf_r = forward_integral(r.o, r.d, r.ra, ks=ks, ps=ps,
                                        pointc_ref=pointc, use_matmul=False)
        return psf_l.mean() + psf_r.mean()

    stages = [("sample", stage_sample, spp), ("trace", stage_trace, spp),
              ("propagate", stage_prop, spp), ("splat", stage_splat, spp),
              ("splat_scat", stage_splat_scatter, spp),
              ("full", stage_full, spp + spp_chief)]

    iters = args.iters
    print(f"# trace={args.trace} n_pts={n_pts} spp={spp} iters={iters}")
    prev_ms = 0.0
    for name, fn, rays_per_pt in stages:
        @jax.jit
        def run_many(key, fn=fn):
            def body(carry, k):
                return carry + fn(k), None
            keys = jax.random.split(key, iters)
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return acc

        _ = float(run_many(jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        _ = float(run_many(jax.random.PRNGKey(1)))
        dt = time.perf_counter() - t0
        ms = dt / iters * 1e3
        mrays = n_pts * rays_per_pt / (dt / iters) / 1e6
        print(f"{name:10s} {ms:8.2f} ms/call  (+{ms - prev_ms:7.2f})  "
              f"{mrays:8.1f} Mrays/s", flush=True)
        prev_ms = ms


if __name__ == "__main__":
    main()
