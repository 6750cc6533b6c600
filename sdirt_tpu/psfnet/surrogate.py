"""PSFNetLens: a lens with an implicit dual-pixel PSF surrogate network.

Parity source: /root/reference/deeplens/psfnet.py:18-782. Wraps the ray-traced
lens with a coordinate MLP fitted to (x, y, z) -> left PSF; the right PSF is
the x-mirrored network query (psfnet.py:327-333). Reproduces the reference's
behavioral quirks exactly — they are calibrated behavior, not bugs:
  * d_sensor hard-override per lens (62.25 / 80.447, psfnet.py:42-49) without
    recomputing fov/fnum;
  * focus distances pinned to ~1 m (psfnet.py:50-52);
  * PSFs max-normalized during fitting but sum-normalized in pred();
  * left-only supervision, mirrored right.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import DMAX, DMIN, GEO_SPP
from ..dp.psf import compute_psf
from ..optics.lens import Lens
from .arch import build_psfnet, load_torch_psfnet

DEFAULT_FOC_OFFSETS = np.array([-999.9, -1000.0, -1000.1], np.float32)


def pred_psf(apply_fn, params, inp, ks: int, flip_right: bool = True,
             apply_fn_right=None):
    """Network DP-PSF prediction: left from the net, right mirrored
    (reference psfnet.py:317-336).

    inp: [..., 3] normalized (x, y, z). Returns [..., 2, ks, ks],
    sum-normalized per view.

    flip_right=False returns the right PSF UN-mirrored (the raw x-negated
    query) for consumers that fold the mirror into their own tap indexing
    instead — local_dp_conv(mirror_right=True). Mathematically identical;
    exists because the jnp.flip on the lane axis is the prime suspect in
    the TPU-scan bf16 right-view divergence (RESULTS.md round 4).
    apply_fn_right overrides the network application for the right view
    only (e.g. an f32 trunk while the left runs bf16).
    """
    fn_r = apply_fn if apply_fn_right is None else apply_fn_right
    psfl = apply_fn(params, inp).reshape(*inp.shape[:-1], ks, ks)
    inp_m = inp * jnp.array([-1.0, 1.0, 1.0], inp.dtype)
    psfr = fn_r(params, inp_m).reshape(*inp.shape[:-1], ks, ks)
    if flip_right:
        psfr = jnp.flip(psfr, axis=-1)
    psf = jnp.stack([psfl, psfr], axis=-3)
    return psf / (psf.sum((-1, -2), keepdims=True) + 1e-9)


class PSFNetLens(Lens):
    """Lens + trained implicit PSF representation."""

    def __init__(self, filename: str, model_name: str = "mlp",
                 kernel_size: int = 11, sensor_res=(512, 512), seed: int = 0):
        super().__init__(filename=filename, sensor_res=sensor_res)

        self.kernel_size = kernel_size
        self.model_name = model_name
        self.spp = 4096
        self.patch_size = 64
        self.psf_grid = [sensor_res[0] // 64, sensor_res[1] // 64]

        self.d_max = -DMAX
        self.d_min = -DMIN
        # d_sensor override WITHOUT post_computation — hfov/fnum keep the
        # JSON-derived values (reference psfnet.py:42-49 quirk)
        if "rf35mm" in filename:
            self.d_sensor = 80.447
        elif "rf50mm" in filename:
            self.d_sensor = 62.25
        else:
            raise ValueError("Lens filename must name rf35mm or rf50mm "
                             "(reference psfnet.py:42-48)")
        self.foc_d_arr = DEFAULT_FOC_OFFSETS + self.d_sensor
        self.foc_z_arr = ((self.foc_d_arr - self.d_min)
                          / (self.d_max - self.d_min)).astype(np.float32)
        self.foc_d = np.array([-1000.0], np.float32) + self.d_sensor

        self.net = build_psfnet(model_name, kernel_size)
        self.params = self.net.init(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, 3), jnp.float32))

    def set_focus_prior(self, focus_mm: float):
        """Re-center the fit-time focus prior on a new focus distance.

        The reference pins the focus to ~1 m (psfnet.py:50-52) and its
        training-z sampler draws piecewise-Gaussians around that focus
        (psfnet.py:180-201) — a surrogate fitted for a different focus
        (the multi-focus far-field extension fits a 5 m-focused one) needs
        both the sample concentration and the eval band moved there.
        focus_mm: negative object distance in mm (e.g. -5000.0).
        Call AFTER refocus() so d_sensor is the fit-time value.
        """
        offsets = DEFAULT_FOC_OFFSETS - (-1000.0) + float(focus_mm)
        self.foc_d_arr = (offsets + self.d_sensor).astype(np.float32)
        self.foc_z_arr = ((self.foc_d_arr - self.d_min)
                          / (self.d_max - self.d_min)).astype(np.float32)
        self.foc_d = np.array([float(focus_mm)], np.float32) + self.d_sensor

    # -----------------------------------------------------------------
    # Depth normalization (reference psfnet.py:719-726)
    # -----------------------------------------------------------------
    def depth2z(self, depth):
        z = (depth - self.d_min) / (self.d_max - self.d_min)
        return jnp.clip(z, 0.0, 1.0)

    def z2depth(self, z):
        return z * (self.d_max - self.d_min) + self.d_min

    # -----------------------------------------------------------------
    # Ray-traced ground truth
    # -----------------------------------------------------------------
    def psf(self, points, ks=None, spp=GEO_SPP, key=None, both=False):
        """Ray-traced left DP PSF (reference optics.py:916-931 via the fused
        dp pipeline). points: [N, 3] normalized x,y + depth z in mm."""
        ks = self.kernel_size if ks is None else ks
        return compute_psf(self, points, key=key, spp=spp, ks=ks, both=both)

    # -----------------------------------------------------------------
    # Network prediction / checkpoints
    # -----------------------------------------------------------------
    def pred(self, inp):
        """[..., 3] -> [..., 2, ks, ks] (left net / mirrored right)."""
        return pred_psf(self.net.apply, self.params, jnp.asarray(inp, jnp.float32),
                        self.kernel_size)

    def load_net(self, path: str):
        """Load a checkpoint: .pkl (torch state_dict port) or orbax dir.

        If the stored tree does not match this net's structure, falls back
        to a shape-filtered partial merge (the reference does the same for
        its pretrained loads, psfnet.py:91-98) — this is how a PSFMLPBasis
        student warm-starts its trunk from a fitted PSFMLP checkpoint.
        """
        if path.endswith(".pkl"):
            self.params = load_torch_psfnet(self.params, path)
            return

        import os

        import flax
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        # restore against an abstract template from the checkpoint's own
        # metadata — a template-less restore would try to re-materialize
        # the SAVED device shardings (e.g. a TPU ckpt on a CPU host)
        meta = ckptr.metadata(os.path.abspath(path)).item_metadata
        dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=dev),
            meta)
        stored = ckptr.restore(os.path.abspath(path), abstract)
        cur = flax.traverse_util.flatten_dict(self.params, sep="/")
        new = flax.traverse_util.flatten_dict(stored, sep="/")
        if (set(cur) == set(new)
                and all(cur[k].shape == new[k].shape for k in cur)):
            self.params = jax.tree.map(
                lambda c, s: jnp.asarray(s, c.dtype), self.params, stored)
            return
        merged = dict(cur)
        hits = 0
        for k, v in new.items():
            if k in cur and cur[k].shape == getattr(v, "shape", None):
                merged[k] = jnp.asarray(v, cur[k].dtype)
                hits += 1
        if hits == 0:
            raise ValueError(
                f"checkpoint at {path} shares no same-shaped leaves with "
                f"a {self.model_name} net — wrong checkpoint?")
        print(f"partial net load: {hits}/{len(cur)} leaves from {path}")
        self.params = flax.traverse_util.unflatten_dict(merged, sep="/")

    def save_net(self, path: str):
        import orbax.checkpoint as ocp

        import os

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), self.params, force=True)
        ckptr.wait_until_finished()

    # -----------------------------------------------------------------
    # DP image rendering (reference psfnet.py:644-714)
    # -----------------------------------------------------------------
    def render(self, img, depth, foc_dist, train: bool = False, key=None):
        """Render a DP pair from an all-in-focus image + depth map.

        img: [N, C, H, W] in [0, 1]; depth: [N, 1, H, W] mm (negative);
        foc_dist: [N] mm (negative). Returns [N, 2C, H, W].
        """
        from ..render.pipeline import render_dp

        key = jax.random.PRNGKey(0) if key is None else key
        return render_dp(self.net.apply, self.params, img, depth, foc_dist,
                         d_sensor=self.d_sensor, d_min=self.d_min,
                         d_max=self.d_max, ks=self.kernel_size,
                         train=train, key=key)

    def time_compare_psf(self, n_points: int = 512 * 768 // 16,
                         spp: int = GEO_SPP * 2, log_fn=print):
        """Micro-benchmark: ray-traced PSFs vs network inference for the same
        point count (reference psfnet.py:570-586). Timing uses a host value
        pull (true sync on this TPU stack)."""
        import time

        rng = np.random.default_rng(0)
        pts = np.stack([rng.uniform(-1, 1, n_points), rng.uniform(-1, 1, n_points),
                        -(rng.uniform(0, 1, n_points) * 19800 + 200)],
                       -1).astype(np.float32)
        t0 = time.perf_counter()
        psf = self.psf(pts, spp=spp, key=jax.random.PRNGKey(0))
        float(psf.sum())
        t_rt = time.perf_counter() - t0
        log_fn(f"ray_tracing time cost: {t_rt:.3f}s "
               f"({n_points * spp / t_rt / 1e6:.1f} Mrays/s)")

        inp = jnp.asarray(rng.uniform(0, 1, (1, 128, 192, 3)).astype(np.float32))
        t0 = time.perf_counter()
        out = self.pred(inp)
        float(out.sum())
        t_net = time.perf_counter() - t0
        log_fn(f"network time cost: {t_net:.3f}s")
        return t_rt, t_net

    # -----------------------------------------------------------------
    # Fit-quality evaluation (reference psfnet.py:529-567)
    # -----------------------------------------------------------------
    def compare_psf(self, spp=GEO_SPP * 100, key=None, save_dir=None):
        """Ray-traced vs predicted DP PSFs at the reference field points.

        Returns dict with 'traced' [n_depth, 2(view), 3(field), ks, ks] and
        'pred' [n_depth, 3(field), 2(view), ks, ks].
        """
        key = jax.random.PRNGKey(0) if key is None else key
        xy = np.array([0.0, 0.4, 0.8], np.float32)
        out = {"traced": [], "pred": [], "depths": [-500.0, -20000.0]}
        for depth0 in out["depths"]:
            depth = depth0 + self.d_sensor
            pts = np.stack([xy, xy, np.full_like(xy, depth)], -1)
            key, k1, k2 = jax.random.split(key, 3)
            psfl = np.asarray(self.psf(pts, spp=spp, key=k1))
            pts_m = pts.copy()
            pts_m[:, 0] *= -1
            psfr = np.asarray(self.psf(pts_m, spp=spp, key=k2))[..., ::-1]
            out["traced"].append(np.stack([psfl, psfr], axis=0))   # [2, 3, ks, ks]

            z = float(np.clip((depth - self.d_min) / (self.d_max - self.d_min), 0, 1))
            inp = np.stack([xy, xy, np.full_like(xy, z)], -1)
            out["pred"].append(np.asarray(self.pred(inp)))
        out["traced"] = np.stack(out["traced"])    # [2, 2(v), 3, ks, ks]
        out["pred"] = np.stack(out["pred"])        # [2, 3, 2, ks, ks]

        if save_dir is not None:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for di, d0 in enumerate(out["depths"]):
                for vi, tag in enumerate(["v00", "v04", "v08"]):
                    fig, axs = plt.subplots(2, 2)
                    for side in range(2):
                        axs[0, side].imshow(out["traced"][di, side, vi], cmap="gray")
                        p = out["pred"][di, vi, side]
                        axs[1, side].imshow(p / (p.max() + 1e-9), cmap="gray")
                        for a in axs[:, side]:
                            a.axis("off")
                    fig.suptitle(f"depth {int(d0)}mm {tag}: traced (top) vs pred")
                    fig.savefig(f"{save_dir}/compare_{int(d0)}_{tag}.png", dpi=150)
                    plt.close(fig)
        return out
