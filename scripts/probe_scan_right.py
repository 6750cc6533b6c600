#!/usr/bin/env python
"""Probe the scan-vs-basis RIGHT-view divergence (ADVICE r3 medium).

Renders one real F/20 flat capture with a PSFMLPBasis student via
  scan  mlp_bf16=False   (f32 truth)
  scan  mlp_bf16=True    (production scan numerics)
  basis                  (MXU basis path, bf16)
and reports pairwise |diff| on the right view + PSNR vs the real F/4
capture. Findings (RESULTS.md round 4): on CPU all three agree within
0.15 dB and CPU-scan-bf16 reproduces TPU-basis to 3 decimals; the TPU
scan path's bf16 right view alone sits ~1 dB lower — gate against the
f32 scan baseline, not TPU-scan-bf16.

Usage: python scripts/probe_scan_right.py [--cpu] [--res H W] [--idx N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/dfdp_by_sdirt_rf50mm.yml")
    ap.add_argument("--model", default="mlpb@256x32")
    ap.add_argument("--psfnet",
                    default="results/f4_fit_basis32/psfnet_mlpb@256x32")
    ap.add_argument("--idx", type=int, default=0)
    ap.add_argument("--crop", type=int, nargs=4, default=(0, 0, 512, 768),
                    metavar=("Y0", "X0", "H", "W"))
    ap.add_argument("--cpu", action="store_true")
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
    cfg["results_dir"] = "/tmp/probe_scan_right"
    os.makedirs(cfg["results_dir"], exist_ok=True)

    _, lens = get_lens(cfg)
    flat = get_flat_sample_set(cfg)
    f4_img, f20_img, depth = (a[None] for a in flat[args.idx])
    y0, x0, h, w = args.crop
    f20_r = f20_img[:, 3:, y0:y0 + h, x0:x0 + w]
    f4_r = f4_img[:, 3:, y0:y0 + h, x0:x0 + w]
    d = depth[:, :, y0:y0 + h, x0:x0 + w]
    focus = select_focus_dist(depth, 1, mode="linear")

    outs = {}
    for name, variant, bf16 in [("scan_f32", "scan", False),
                                ("scan_bf16", "scan", True),
                                ("basis", "basis", True)]:
        r = render_dp(lens.net.apply, lens.params, f20_r, -d * 1e3,
                      -focus[:, 0] * 1e3, d_sensor=lens.d_sensor,
                      d_min=lens.d_min, d_max=lens.d_max,
                      ks=lens.kernel_size, train=False,
                      key=jax.random.PRNGKey(0), variant=variant,
                      mlp_bf16=bf16)
        outs[name] = np.asarray(r)[:, 3:]   # right view of the pair
        print(f"{name} done", flush=True)

    def psnr(a, b):
        return -10 * np.log10(np.mean((a - b) ** 2) + 1e-12)

    ref = outs["scan_f32"]
    for name, o in outs.items():
        print(f"{name}: maxdiff vs scan_f32 {np.abs(o - ref).max():.5f} "
              f"mean {np.abs(o - ref).mean():.6f}  PSNR-vs-real "
              f"{psnr(o, np.asarray(f4_r)):.3f}", flush=True)


if __name__ == "__main__":
    main()
