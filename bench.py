#!/usr/bin/env python
"""North-star benchmark: dual-pixel PSF trace-and-splat throughput.

Workload (BASELINE.md compute envelope): rf50mm (12 surfaces), production
PSF-fit batch — 64 field points x 20,000 pupil rays + 2,048 chief rays per
point, ks=21 kernels, full pipeline (sample -> trace -> chief centering ->
DP splat -> normalize) fused in one XLA program on one chip.

Baseline: the reference PyTorch implementation running the identical
workload shape on this host's CPU measures 203,745 rays/s (psf_diff with
center=True, 64 pts x (4096+2048) rays; measured 2026-08-16 via
/root/reference deeplens.optics.Lensgroup.psf_diff, torch 2.13 CPU — the
repo's own micro-benchmark harness per psfnet.py:570-586). BASELINE.json
target: >=20x that. vs_baseline below = ours / cpu_reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPU_REFERENCE_RAYS_PER_SEC = 203_745.0

def main():
    import jax

    from sdirt_tpu.dp.psf import dp_psf, lens_scalars
    from sdirt_tpu.psfnet.surrogate import PSFNetLens

    here = os.path.dirname(os.path.abspath(__file__))
    lens = PSFNetLens(os.path.join(here, "lenses/rf50mm/lens_web.json"),
                      kernel_size=21, sensor_res=(512, 768))
    eta, skip = lens.eta_arrays(0.589, True)
    scalars = lens_scalars(lens)

    n_pts, spp, spp_chief, ks = 64, 20000, 2048, 21
    import numpy as np

    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    -(rng.uniform(0, 1, n_pts) * 19800 + 200)], -1).astype(np.float32)
    pts = jax.numpy.asarray(pts)

    iters = 20

    # The whole timing loop runs ON DEVICE (lax.scan over iterations, one
    # dispatch): through the axon tunnel, per-call dispatch latency would
    # otherwise dominate, and block_until_ready returns early there — only
    # a host-side float() pull is a true sync.
    @jax.jit
    def run_many(key):
        def body(carry, k):
            psf_l, _ = dp_psf(lens.stack, eta, skip, pts, k, scalars,
                              spp=spp, spp_chief=spp_chief, ks=ks, chunk=2048)
            return carry + psf_l[0, 0, 0], None
        keys = jax.random.split(key, iters)
        acc, _ = jax.lax.scan(body, 0.0, keys)
        return acc

    _ = float(run_many(jax.random.PRNGKey(0)))   # compile + warmup
    t0 = time.perf_counter()
    _ = float(run_many(jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0

    rays = iters * n_pts * (spp + spp_chief)
    rays_per_sec = rays / dt
    print(json.dumps({
        "metric": "dp_psf_trace_and_splat_rays_per_sec_per_chip",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / CPU_REFERENCE_RAYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
