#!/usr/bin/env python
"""On-chip A/B of the Pallas fused trace vs the lax.scan trace + promotion.

Runs the north-star trace-and-splat benchmark (bench.py shapes, on-device
timing loop) with both trace implementations, checks PSF parity between
them on the SAME rays on the chip, and writes ckpt/FUSED_TRACE.json.
bench.py then picks the fused path automatically when promote=true.

Promotion gate: fused >= 1.1x scan rays/s AND max PSF L1 <= 1e-3 (interpret
-mode parity is ~1e-5; the on-chip check guards against Mosaic-side numeric
or layout bugs the CPU interpreter can't see).
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.chdir(HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="lenses/rf50mm/lens_web.json")
    ap.add_argument("--parity-lenses", nargs="+",
                    default=["lenses/rf50mm/lens_web.json",
                             "lenses/rf35mm/lens_web.json"],
                    help="every lens the promoted kernel may serve must pass "
                         "the on-chip parity gate (the fit/probe supervision "
                         "path follows the manifest for ALL lenses, so an "
                         "unchecked surface chain could silently corrupt a "
                         "teacher refit)")
    ap.add_argument("--manifest", default="ckpt/FUSED_TRACE.json")
    ap.add_argument("--min-speedup", type=float, default=1.1)
    ap.add_argument("--max-l1", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from sdirt_tpu.dp.fused_trace import make_fused_plan
    from sdirt_tpu.dp.psf import dp_psf, dp_psf_fused, lens_scalars
    from sdirt_tpu.optics.lens import Lens

    lens = Lens(args.lens, sensor_res=(512, 768))

    # --- on-chip parity: same key, both paths, every served lens ----------
    l1 = l1_max = 0.0
    parity = {}
    for lens_path in args.parity_lenses:
        plens = Lens(lens_path, sensor_res=(512, 768))
        eta, skip = plens.eta_arrays(0.589, True)
        scalars = lens_scalars(plens)
        plan = make_fused_plan(plens)
        rng = np.random.default_rng(7)
        pts = jnp.asarray(np.stack([
            rng.uniform(-1, 1, 16), rng.uniform(-1, 1, 16),
            -(rng.uniform(0, 1, 16) * 19800 + 200)], -1).astype(np.float32))
        key = jax.random.PRNGKey(42)
        ref_l, ref_r = dp_psf(plens.stack, eta, skip, pts, key, scalars,
                              spp=4096, spp_chief=1024, ks=21,
                              static_desc=plens.static_desc())
        fus_l, fus_r = dp_psf_fused(pts, key, scalars, plan, spp=4096,
                                    spp_chief=1024, ks=21)
        this_l1 = max(float(jnp.abs(fus_l - ref_l).mean()),
                      float(jnp.abs(fus_r - ref_r).mean()))
        this_max = max(float(jnp.abs(fus_l - ref_l).max()),
                       float(jnp.abs(fus_r - ref_r).max()))
        parity[lens_path] = {"l1_mean": this_l1, "l1_max": this_max}
        l1, l1_max = max(l1, this_l1), max(l1_max, this_max)
        print(f"on-chip PSF parity fused vs specialized [{lens_path}]: "
              f"L1 mean {this_l1:.2e} max {this_max:.2e}")

    # --- throughput A/B ----------------------------------------------------
    scan_rps = bench.bench_trace_splat(lens, "scan")
    print(f"scan  trace: {scan_rps/1e6:.1f} Mrays/s")
    fused_rps = bench.bench_trace_splat(lens, "fused")
    print(f"fused trace: {fused_rps/1e6:.1f} Mrays/s "
          f"({fused_rps/scan_rps:.2f}x scan)")

    promote = (fused_rps >= args.min_speedup * scan_rps
               and l1 <= args.max_l1)
    manifest = {
        "promote": bool(promote),
        "fused_rays_per_sec": round(fused_rps),
        "scan_rays_per_sec": round(scan_rps),
        "speedup": round(fused_rps / scan_rps, 3),
        "psf_l1_mean": l1,
        "psf_l1_max": l1_max,
        "parity_per_lens": parity,
        "gate": {"min_speedup": args.min_speedup, "max_l1": args.max_l1},
        "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(args.manifest, "w") as f:
        json.dump(manifest, f, indent=1)
    print(("PROMOTED" if promote else "NOT promoted")
          + f" -> {args.manifest}")


if __name__ == "__main__":
    main()
