"""Result accumulation, image dumping and checkpoint policy.

Parity source: /root/reference/dfdp/utils.py:10-235 (select_focus_dist,
ResultsMonitor). Checkpoints go through orbax instead of torch pickles, with
the same last + best-acc1 policy.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from . import metrics as M


def select_focus_dist(depth, num, mode="linear", foc_d=1.0):
    """Focus-distance selection. The reference early-returns a constant 1.0 m
    for every sample (dfdp/utils.py:24-25) — its linear/importance samplers
    are dead code; the pinned focus IS the published behavior."""
    b = depth.shape[0]
    return np.full((b, num), foc_d, np.float32)


class ResultsMonitor:
    """Accumulates depth metrics across a split, saves visualization images,
    and keeps last/best checkpoints (reference dfdp/utils.py:62-235)."""

    def __init__(self, train_mode: str = "dfdp"):
        self.train_mode = train_mode
        self.create_scores()

    def create_scores(self):
        for k in ("abs_rel sq_rel mse mae rmse rmse_log psnr_deblur ssim_deblur".split()):
            setattr(self, f"Avg_{k}", 0.0)
        for i in (1, 2, 3):
            setattr(self, f"Avg_accuracy_{i}_est", 0.0)
            setattr(self, f"Avg_accuracy_{i}_fix", 0.0)

    def set_outputs(self, outputs: dict):
        self.gt_aif = outputs.get("gt_aif")
        self.gt_depth = np.squeeze(np.asarray(outputs["gt_depth"]))
        self.test_mask = self.gt_depth > 1e-9
        self.gt_l = outputs.get("gt_l")
        self.gt_r = outputs.get("gt_r")
        self.rt_render_l = outputs.get("rt_render_l")
        self.rt_render_r = outputs.get("rt_render_r")
        pred = np.array(np.squeeze(np.asarray(outputs["pred_depth_est"])))  # copy: jax arrays are read-only views
        pred[pred < 0] = 0
        self.pred_depth_est = pred
        if self.train_mode == "deblur":
            self.pred_aif = outputs.get("pred_aif")
            fix = np.array(np.squeeze(np.asarray(outputs["pred_depth_fix"])))
            fix[fix < 0] = 0
            self.pred_depth_fix = fix

    def compute_metrics(self):
        est, gt, m = self.pred_depth_est, self.gt_depth, self.test_mask
        self.Avg_abs_rel += M.mask_abs_rel(est, gt, m)
        self.Avg_sq_rel += M.mask_sq_rel(est, gt, m)
        self.Avg_mse += M.mask_mse(est, gt, m)
        self.Avg_mae += M.mask_mae(est, gt, m)
        self.Avg_rmse += M.mask_rmse(est, gt, m)
        self.Avg_rmse_log += M.mask_rmse_log(est, gt, m)
        for i in (1, 2, 3):
            v = getattr(self, f"Avg_accuracy_{i}_est")
            setattr(self, f"Avg_accuracy_{i}_est", v + M.mask_accuracy_k(est, gt, i, m))
        if self.train_mode == "deblur":
            for i in (1, 2, 3):
                v = getattr(self, f"Avg_accuracy_{i}_fix")
                setattr(self, f"Avg_accuracy_{i}_fix",
                        v + M.mask_accuracy_k(self.pred_depth_fix, gt, i, m))
            if self.gt_aif is not None:    # real sets carry no AiF ground truth
                self.Avg_psnr_deblur += M.mask_psnr(self.pred_aif, self.gt_aif)
                self.Avg_ssim_deblur += M.mask_ssim(self.pred_aif, self.gt_aif)

    def save_images(self, result_img_dir, scene, idx):
        import cv2 as cv

        os.makedirs(result_img_dir, exist_ok=True)

        def save_rgb(arr, name):
            if arr is None:
                return
            a = np.asarray(arr)
            if a.ndim == 4:
                a = a[0]
            img = np.clip(a.transpose(1, 2, 0) * 255 + 0.5, 0, 255).astype(np.uint8)
            cv.imwrite(f"{result_img_dir}/{scene}_{idx}_{name}.png",
                       cv.cvtColor(img, cv.COLOR_RGB2BGR))

        save_rgb(self.gt_aif, "rgb_gt_aif")
        save_rgb(self.gt_l, "rgb_gt_l")
        save_rgb(self.gt_r, "rgb_gt_r")
        save_rgb(self.rt_render_l, "rgb_rt_l")
        save_rgb(self.rt_render_r, "rgb_rt_r")

        depth_max = self.gt_depth.max() * 1.25
        gt8 = (self.gt_depth / depth_max * 255.0).astype(np.uint8)
        cv.imwrite(f"{result_img_dir}/{scene}_{idx}_depth_gt.png",
                   cv.applyColorMap(gt8, cv.COLORMAP_JET))
        est8 = (self.pred_depth_est / depth_max * 255.0).astype(np.uint8)
        cv.imwrite(f"{result_img_dir}/{scene}_{idx}_depth_est.png",
                   cv.applyColorMap(est8, cv.COLORMAP_JET))

    def logging(self, epoch, num_scene):
        logging.info(f"Avg_mse/mae({epoch}): {self.Avg_mse / num_scene}, "
                     f"{self.Avg_mae / num_scene}")
        logging.info(f"Avg_acc_est({epoch}): {self.Avg_accuracy_1_est / num_scene}, "
                     f"{self.Avg_accuracy_2_est / num_scene}, "
                     f"{self.Avg_accuracy_3_est / num_scene}")
        if self.train_mode == "deblur":
            logging.info(f"Avg_ps_deblur({epoch}): {self.Avg_psnr_deblur / num_scene} "
                         f"{self.Avg_ssim_deblur / num_scene}")

    def metric_dict(self, num_scene) -> dict:
        """Structured metrics (not in the reference; used by tests/bench)."""
        out = {
            "abs_rel": self.Avg_abs_rel / num_scene,
            "sq_rel": self.Avg_sq_rel / num_scene,
            "mse": self.Avg_mse / num_scene,
            "mae": self.Avg_mae / num_scene,
            "rmse": self.Avg_rmse / num_scene,
            "rmse_log": self.Avg_rmse_log / num_scene,
        }
        for i in (1, 2, 3):
            out[f"acc{i}"] = getattr(self, f"Avg_accuracy_{i}_est") / num_scene
        return out

    def save_pth(self, args: dict, scene, num_scene, params, batch_stats):
        """last + best-acc1 checkpoint policy (reference dfdp/utils.py:223-235).

        Saves params AND BatchNorm running stats — the torch state_dict the
        reference pickles carries running_mean/var implicitly; here they live
        in a separate collection and must be exported explicitly or inference
        from the checkpoint is garbage."""
        from sdirt_tpu.utils.checkpoint import save_inference_ckpt

        save_inference_ckpt(f"{args['results_dir']}/depth_net_last",
                            params, batch_stats)
        key = f"acc1_{scene}_max"
        args.setdefault(key, 0.0)
        acc1 = self.Avg_accuracy_1_est / num_scene
        if acc1 > args[key]:
            args[key] = acc1
            save_inference_ckpt(f"{args['results_dir']}/{scene}_net_best_acc1",
                                params, batch_stats)
