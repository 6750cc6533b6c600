"""DfDP stack: cost volume semantics, network shapes, loss/transforms,
metrics parity with the reference formulas, datasets on the bundled
real_sample_set, monitor accumulation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_cost_volume_matches_reference_semantics():
    """Mirror the reference's in-place shift construction with torch and
    compare (dddnet.py:136-148)."""
    import torch

    from sdirt_tpu.dfdp.models.dddnet import dp_cost_volume

    rng = np.random.default_rng(0)
    b, c, h, w, d = 2, 3, 4, 16, 8
    x = rng.normal(size=(b, c, h, w)).astype(np.float32)
    y = rng.normal(size=(b, c, h, w)).astype(np.float32)

    xt, yt = torch.tensor(x), torch.tensor(y)
    cost = torch.zeros(b, c * 2, d, h, w)
    for i in range(d):
        gap = i - d // 2
        if gap < 0:
            cost[:, :c, i, :, :gap] = xt[:, :, :, :gap]
            cost[:, c:, i, :, :gap] = yt[:, :, :, -gap:]
        elif gap == 0:
            cost[:, :c, i] = xt
            cost[:, c:, i] = yt
        if gap > 0:
            cost[:, :c, i, :, gap:] = xt[:, :, :, gap:]
            cost[:, c:, i, :, gap:] = yt[:, :, :, :-gap]

    ours = np.asarray(dp_cost_volume(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y.transpose(0, 2, 3, 1)), d))
    # ours: [B, D, H, W, 2C] -> [B, 2C, D, H, W]
    ours = ours.transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(ours, cost.numpy(), atol=1e-6)


def test_disp_softmin_range():
    from sdirt_tpu.dfdp.models.dddnet import Disp

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 4, 6, 1)).astype(np.float32))
    out = Disp(20).apply({}, x)
    assert out.shape == (1, 1, 16, 24)
    # softmin-regressed disparity stays within [-10, 10)
    assert float(out.min()) >= -10 and float(out.max()) < 10


def test_linear_depth_roundtrip():
    from sdirt_tpu.dfdp.basenet import inverse_linear_depth, linear_depth

    depth = jnp.asarray([[0.0, 0.5, 2.0, 10.0]])
    log_d, mask = linear_depth(depth)
    np.testing.assert_array_equal(np.asarray(mask), [[False, True, True, True]])
    back = inverse_linear_depth(log_d, mask)
    np.testing.assert_allclose(np.asarray(back), np.asarray(depth), rtol=1e-4)
    assert float(log_d[0, 0]) == 0.0   # empty pixels untouched


def test_smooth_l1_matches_torch():
    import torch

    from sdirt_tpu.dfdp.basenet import smooth_l1

    rng = np.random.default_rng(1)
    a = rng.normal(size=100).astype(np.float32) * 3
    b = rng.normal(size=100).astype(np.float32) * 3
    ours = np.asarray(smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    ref = torch.nn.functional.smooth_l1_loss(torch.tensor(a), torch.tensor(b),
                                             reduction="none").numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_metrics_formula_parity():
    """Check against independently computed values with the reference's
    exact formulas."""
    from sdirt_tpu.dfdp import metrics as M

    rng = np.random.default_rng(2)
    gt = rng.uniform(0.5, 5.0, (32, 32))
    est = gt + rng.normal(0, 0.2, (32, 32))
    est = np.clip(est, 0.01, None)
    mask = rng.uniform(size=(32, 32)) > 0.3

    np.testing.assert_allclose(M.mask_mae(est, gt, mask),
                               np.mean(np.abs(gt[mask] - est[mask])))
    np.testing.assert_allclose(M.mask_rmse(est, gt, mask),
                               np.sqrt(np.mean((gt[mask] - est[mask]) ** 2)))
    a = est[mask] / (gt[mask] + 1e-6)
    b = gt[mask] / (est[mask] + 1e-6)
    acc1 = np.sum(np.maximum(a, b) < 1.25) / mask.sum()
    np.testing.assert_allclose(M.mask_accuracy_k(est, gt, 1, mask), acc1)


def test_psnr_ssim_sanity():
    from sdirt_tpu.dfdp.metrics import batch_PSNR, batch_SSIM

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    assert batch_PSNR(img, img) == float("inf") or batch_PSNR(img, img) > 80
    assert batch_SSIM(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(np.float32)
    p = batch_PSNR(noisy, img)
    assert 15 < p < 25   # sigma=0.1 noise -> ~20 dB
    s = batch_SSIM(noisy, img)
    # the base image is itself high-variance noise, so SSIM stays high
    assert 0.05 < s < 0.995


def test_real_sample_datasets():
    from sdirt_tpu.dfdp.datasets import (CanonCasualSet, CanonDepthSet,
                                         CanonFlat2DepthSet, CanonFlatSet)

    res = (64, 96)
    box = CanonDepthSet("/root/repo/real_sample_set/box", resize=res)
    img, depth = box[0]
    assert img.shape == (6, 64, 96) and depth.shape == (1, 64, 96)
    # bicubic resampling overshoots [0,1] slightly; the reference's
    # torchvision Resize doesn't clamp either (dataset.py:36-43)
    assert -0.1 < img.min() and img.max() < 1.1

    flat = CanonFlatSet("/root/repo/real_sample_set/flat", resize=res)
    f4, f20, depth = flat[0]
    assert f4.shape == (6, 64, 96) and f20.shape == (6, 64, 96)
    assert depth.max() > 0

    f2d = CanonFlat2DepthSet("/root/repo/real_sample_set/flat", resize=res)
    img, depth = f2d[0]
    assert np.unique(depth).size == 1   # constant plane depth

    casual = CanonCasualSet("/root/repo/real_sample_set/casual", resize=res)
    img, depth = casual[0]
    assert img.shape == (6, 64, 96)


def test_dataloader_batching():
    from sdirt_tpu.dfdp.datasets import DataLoader

    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return [np.full((2, 2), i, np.float32)]

    loader = DataLoader(Toy(), batch_size=3, shuffle=False, num_workers=2,
                        drop_last=True)
    batches = list(loader)
    assert len(batches) == 3
    seen = sorted(int(b[0][j, 0, 0]) for b in batches for j in range(3))
    assert len(seen) == 9 and len(set(seen)) == 9


def test_dataloader_propagates_worker_errors():
    """A raising __getitem__ must surface in the consumer, not hang the
    iteration forever (ADVICE round 1)."""
    import pytest

    from sdirt_tpu.dfdp.datasets import DataLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise IOError("corrupt sample")
            return [np.zeros((2, 2), np.float32)]

    loader = DataLoader(Bad(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="worker failed") as exc_info:
        list(loader)
    assert isinstance(exc_info.value.__cause__, IOError)


def test_monitor_accumulates():
    from sdirt_tpu.dfdp.monitor import ResultsMonitor, select_focus_dist

    f = select_focus_dist(np.zeros((4, 1, 8, 8)), 1)
    np.testing.assert_array_equal(f, np.ones((4, 1), np.float32))

    mon = ResultsMonitor("dfdp")
    gt = np.full((1, 1, 8, 8), 2.0, np.float32)
    pred = np.full((1, 1, 8, 8), 2.2, np.float32)
    mon.set_outputs({"gt_depth": gt, "pred_depth_est": pred})
    mon.compute_metrics()
    d = mon.metric_dict(1)
    assert d["mae"] == pytest.approx(0.2, abs=1e-6)
    assert d["acc1"] == 1.0
