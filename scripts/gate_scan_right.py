#!/usr/bin/env python
"""On-chip gate for the TPU-scan bf16 right-view fix (VERDICT r4 item 3).

Round-4 root cause (RESULTS.md): the scan render's bf16 RIGHT view on TPU
sits ~1.0 dB below the identical program on CPU (left views agree
everywhere); the right view is the only place a jnp.flip on the lane axis
appears (pred_psf mirrors the x-negated query, surrogate.py). Candidates,
both exact w.r.t. the left view:
  noflip — fold the mirror into local_dp_conv's tap gather (no flip op in
           the graph; bit-identical math to flip — tests/test_psf_pipeline).
  f32    — f32 right-view trunk (guaranteed, costs ~half the bf16 saving).

This renders real F/20 flat captures through the promoted w256 PSFMLP in
  scan f32 (truth) / scan bf16 flip / noflip / f32-right
and promotes the cheapest mode whose right-view PSNR-vs-real is within
0.2 dB of the f32 truth, writing ckpt/SCAN_RIGHT.json (consumed by
render/pipeline.py's manifest default).

Usage: python scripts/gate_scan_right.py [--cpu] [--idx N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/dfdp_by_sdirt_rf50mm.yml")
    ap.add_argument("--model", default="mlp@256")
    ap.add_argument("--psfnet", default="ckpt/rf50mm/F4_PSFNet_mlp@256")
    ap.add_argument("--n", type=int, default=3, help="flat captures to score")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tol-db", type=float, default=0.2)
    ap.add_argument("--dry-run", action="store_true",
                    help="report only; do not write the manifest")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from apps.dfdp_net import config
    from sdirt_tpu.dfdp.factory import get_flat_sample_set, get_lens
    from sdirt_tpu.dfdp.monitor import select_focus_dist
    from sdirt_tpu.render.pipeline import render_dp

    cfg = config(args.config)
    cfg["test"]["psfnet_model"] = args.model
    cfg["test"]["psfnet_path"] = args.psfnet
    cfg["results_dir"] = "/tmp/gate_scan_right"
    os.makedirs(cfg["results_dir"], exist_ok=True)

    _, lens = get_lens(cfg)
    flat = get_flat_sample_set(cfg)
    n = min(args.n, len(flat))

    modes = [("f32", dict(mlp_bf16=False, scan_right="flip")),
             ("flip", dict(mlp_bf16=True, scan_right="flip")),
             ("noflip", dict(mlp_bf16=True, scan_right="noflip")),
             ("f32r", dict(mlp_bf16=True, scan_right="f32"))]
    psnr_r = {name: [] for name, _ in modes}
    psnr_l = {name: [] for name, _ in modes}

    def psnr(a, b):
        return -10 * np.log10(np.mean((a - b) ** 2) + 1e-12)

    for idx in range(n):
        f4_img, f20_img, depth = (a[None] for a in flat[idx])
        focus = select_focus_dist(depth, 1, mode="linear")
        for name, kw in modes:
            def render(content):
                return np.asarray(render_dp(
                    lens.net.apply, lens.params, content, -depth * 1e3,
                    -focus[:, 0] * 1e3, d_sensor=lens.d_sensor,
                    d_min=lens.d_min, d_max=lens.d_max, ks=lens.kernel_size,
                    train=False, key=jax.random.PRNGKey(0), variant="scan",
                    **kw))

            # reference pairing (apps test_dp_images / probe_scan_right):
            # render the LEFT f20 content and take the LEFT output view;
            # render the RIGHT f20 content and take the RIGHT output view
            psnr_l[name].append(psnr(render(f20_img[:, :3])[:, :3],
                                     np.asarray(f4_img[:, :3])))
            psnr_r[name].append(psnr(render(f20_img[:, 3:])[:, 3:],
                                     np.asarray(f4_img[:, 3:])))
        print(f"idx {idx}: " + "  ".join(
            f"{nm} R={psnr_r[nm][-1]:.3f}" for nm, _ in modes), flush=True)

    rows = {nm: (float(np.mean(psnr_l[nm])), float(np.mean(psnr_r[nm])))
            for nm, _ in modes}
    print("\nmode    PSNR-L    PSNR-R   dR vs f32")
    for nm, _ in modes:
        print(f"{nm:7s} {rows[nm][0]:.3f}   {rows[nm][1]:.3f}   "
              f"{rows[nm][1] - rows['f32'][1]:+.3f}")

    # cheapest passing mode: noflip (free) > flip (legacy) > f32 (certain)
    bar = rows["f32"][1] - args.tol_db
    if rows["noflip"][1] >= bar:
        pick = "noflip"
    elif rows["flip"][1] >= bar:
        pick = "flip"
    else:
        pick = "f32"
    backend = jax.devices()[0].platform
    print(f"\npick: {pick} (bar {bar:.3f} dB, backend {backend})")

    if not args.dry_run:
        man = {"mode": pick, "bar_db": round(bar, 4), "backend": backend,
               "psnr_right": {k: round(v[1], 4) for k, v in rows.items()},
               "psnr_left": {k: round(v[0], 4) for k, v in rows.items()},
               "gate": "scripts/gate_scan_right.py"}
        with open("ckpt/SCAN_RIGHT.json", "w") as f:
            json.dump(man, f, indent=1)
        print("wrote ckpt/SCAN_RIGHT.json")


if __name__ == "__main__":
    main()
