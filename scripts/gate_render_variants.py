#!/usr/bin/env python
"""Quality gate for the render-pipeline variants (scan | fused | fused_int8).

Runs the DP-simulation fidelity check (render the real F/20 captures to F/4
and compare against the real F/4 captures — apps/dfdp_net.py:test_dp_images,
reference 2_dfdp_net.py:273-344) once per variant on the SAME flat set and
prints a PSNR/SSIM table. A variant ships as default only if its PSNR is
within 0.1 dB of "scan" (the golden-tested path).

Usage: python scripts/gate_render_variants.py [--config ...] [--variants ...]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/dfdp_by_sdirt_rf50mm.yml")
    ap.add_argument("--variants", nargs="+",
                    default=("scan", "fused", "fused_int8"))
    ap.add_argument("--limit", type=int, default=6,
                    help="flat captures to evaluate per variant")
    ap.add_argument("--model", default=None,
                    help="override the surrogate architecture (e.g. "
                         "mlp@256, mlpb@256x64)")
    ap.add_argument("--psfnet", default=None,
                    help="override the surrogate checkpoint path")
    ap.add_argument("--f32-baseline", action="store_true",
                    help="add a scan_f32 (mlp_bf16=False) row and use it as "
                         "the gate baseline — TPU-scan-bf16's RIGHT view "
                         "reads ~1 dB low (RESULTS.md round-4 root-cause), "
                         "so gating against it misjudges candidates")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    from apps.dfdp_net import config, test_dp_images

    cfg = config(args.config)
    if args.model:
        cfg["test"]["psfnet_model"] = args.model
    if args.psfnet:
        cfg["test"]["psfnet_path"] = args.psfnet
    cfg["results_dir"] = "./results/gate_render_variants"
    os.makedirs(cfg["results_dir"], exist_ok=True)
    from sdirt_tpu.dfdp.factory import get_flat_sample_set, get_lens

    _, test_lens = get_lens(cfg)
    flat_set = get_flat_sample_set(cfg)   # bundled real captures
    if args.limit:
        flat_set.dis_l = flat_set.dis_l[:args.limit]
        flat_set.imgp_l = flat_set.imgp_l[:args.limit]

    variants = list(args.variants)
    if args.f32_baseline:
        variants.insert(0, "scan_f32")

    rows = []
    for variant in variants:
        if variant == "scan_f32":
            os.environ["SDIRT_RENDER_VARIANT"] = "scan"
            os.environ["SDIRT_RENDER_MLP_BF16"] = "0"
        else:
            os.environ["SDIRT_RENDER_VARIANT"] = variant
            os.environ.pop("SDIRT_RENDER_MLP_BF16", None)
        # unattended via scripts/tpu_queue_runner.py: a variant that fails on
        # this backend is reported and skipped, not allowed to abort the gate
        try:
            avg = test_dp_images(test_lens, flat_set, "flat", cfg)
        except Exception as e:  # noqa: BLE001
            print(f"--- {variant}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        rows.append((variant, *avg))
        print(f"--- {variant}: psnr_l {avg[0]:.3f} psnr_r {avg[1]:.3f} "
              f"ssim_l {avg[2]:.4f} ssim_r {avg[3]:.4f}", flush=True)

    print(f"\n{'variant':>12} {'psnr_l':>8} {'psnr_r':>8} {'ssim_l':>8} {'ssim_r':>8}")
    for v, pl_, pr, sl, sr in rows:
        print(f"{v:>12} {pl_:>8.3f} {pr:>8.3f} {sl:>8.4f} {sr:>8.4f}")
    if not rows:
        print("no variant completed")
        return
    base = rows[0]
    for v, pl_, pr, sl, sr in rows[1:]:
        print(f"{v}: dPSNR_l {pl_ - base[1]:+.3f} dB, dPSNR_r {pr - base[2]:+.3f} dB")


if __name__ == "__main__":
    main()
