#!/usr/bin/env python
"""Teacher-relative fidelity gate for rf35mm surrogate students.

rf35mm has no bundled real captures (the real_sample_set is rf50mm-only), so
the rf50mm real-capture gate does not apply. Instead: render the same
all-in-focus content (the bundled F/20 flat captures — content only; the
LENS is rf35mm) through the golden w512 teacher on the scan_f32 path and
through the candidate student on each candidate variant, and score
PSNR(student render, teacher render) per view.

Calibration: the identical teacher-relative measurement for the rf50mm
w512 -> w256(fused_int8) pair — a pair that PASSED the real-capture gate —
defines the precedent bar. The rf35mm student promotes iff its agreement is
within --margin dB of that precedent on both views.

Usage:
  python scripts/gate_rf35_student.py \
      --student-ckpt results/distill_rf35_w256/psfnet_mlp@256 [--student mlp@256]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RF50 = "lenses/rf50mm/lens_web.json"
RF35 = "lenses/rf35mm/lens_web.json"


def render_pairs(lens, flat_set, variant, limit, bf16=True):
    """Render each flat scene's F/20 pair at its plane depth; returns
    [(dof_l, dof_r)] per scene (deterministic: train=False)."""
    import jax
    import numpy as np

    if variant == "scan_f32":
        os.environ["SDIRT_RENDER_VARIANT"] = "scan"
        os.environ["SDIRT_RENDER_MLP_BF16"] = "0"
    else:
        os.environ["SDIRT_RENDER_VARIANT"] = variant
        os.environ.pop("SDIRT_RENDER_MLP_BF16", None)
    outs = []
    for idx in range(min(limit, len(flat_set))):
        _, f20_img, depth = flat_set[idx]
        f20_l, f20_r = f20_img[None, :3], f20_img[None, 3:]
        foc = np.full((1,), 1.0, np.float32)   # reference's constant 1 m focus
        k1, k2 = jax.random.split(jax.random.PRNGKey(idx), 2)
        dof_l = np.asarray(lens.render(f20_l, depth=-depth[None] * 1e3,
                                       foc_dist=-foc * 1e3, key=k1))[:, :3]
        dof_r = np.asarray(lens.render(f20_r, depth=-depth[None] * 1e3,
                                       foc_dist=-foc * 1e3, key=k2))[:, 3:]
        outs.append((dof_l, dof_r))
    return outs


def agreement_db(a_pairs, b_pairs):
    from sdirt_tpu.dfdp.metrics import mask_psnr

    pl = [mask_psnr(a[0], b[0]) for a, b in zip(a_pairs, b_pairs)]
    pr = [mask_psnr(a[1], b[1]) for a, b in zip(a_pairs, b_pairs)]
    return sum(pl) / len(pl), sum(pr) / len(pr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--student", default="mlp@256")
    ap.add_argument("--student-ckpt", required=True)
    ap.add_argument("--variants", nargs="+", default=("fused", "fused_int8"))
    ap.add_argument("--teacher-ckpt", default="ckpt/rf35mm/F4_PSFNet_mlp")
    ap.add_argument("--limit", type=int, default=4)
    ap.add_argument("--margin", type=float, default=1.0,
                    help="allowed dB shortfall vs the rf50mm precedent")
    ap.add_argument("--skip-calibration", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    from sdirt_tpu.dfdp.datasets import CanonFlatSet
    from sdirt_tpu.psfnet.surrogate import PSFNetLens

    flat_set = CanonFlatSet("/root/reference/real_sample_set/flat",
                            resize=(512, 768))

    # precedent: rf50mm w512 (scan_f32) vs promoted w256 student
    precedent = None
    if not args.skip_calibration:
        t50 = PSFNetLens(RF50, model_name="mlp", kernel_size=21,
                         sensor_res=(512, 768))
        t50.load_net("ckpt/rf50mm/F4_PSFNet_mlp")
        s50 = PSFNetLens(RF50, model_name="mlp@256", kernel_size=21,
                         sensor_res=(512, 768))
        s50.load_net("ckpt/rf50mm/F4_PSFNet_mlp@256")
        ref = render_pairs(t50, flat_set, "scan_f32", args.limit)
        stu = render_pairs(s50, flat_set, "fused_int8", args.limit)
        precedent = agreement_db(stu, ref)
        print(f"calibration rf50mm w256/fused_int8 vs w512/scan_f32: "
              f"psnr_l {precedent[0]:.3f} psnr_r {precedent[1]:.3f}",
              flush=True)

    teacher = PSFNetLens(RF35, model_name="mlp", kernel_size=21,
                         sensor_res=(512, 768))
    teacher.load_net(args.teacher_ckpt)
    student = PSFNetLens(RF35, model_name=args.student, kernel_size=21,
                         sensor_res=(512, 768))
    student.load_net(args.student_ckpt)

    ref35 = render_pairs(teacher, flat_set, "scan_f32", args.limit)
    rows = []
    for v in args.variants:
        try:
            stu35 = render_pairs(student, flat_set, v, args.limit)
        except Exception as e:  # noqa: BLE001 — unattended queue must go on
            print(f"--- {v}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        al, ar = agreement_db(stu35, ref35)
        rows.append((v, al, ar))
        print(f"--- rf35 {v}: agree_l {al:.3f} agree_r {ar:.3f}", flush=True)

    if precedent and rows:
        bar_l, bar_r = (precedent[0] - args.margin, precedent[1] - args.margin)
        for v, al, ar in rows:
            verdict = "PASS" if (al >= bar_l and ar >= bar_r) else "FAIL"
            print(f"GATE rf35 {v}: {verdict} (bar {bar_l:.2f}/{bar_r:.2f})",
                  flush=True)


if __name__ == "__main__":
    main()
