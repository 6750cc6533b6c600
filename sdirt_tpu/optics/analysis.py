"""Lens analysis & visualization: setup drawing with ray paths, PSF maps,
spot diagrams, MTF curves, distortion plots, RMS spot statistics.

Parity source: /root/reference/deeplens/optics.py:1663-2140. Pure host-side
matplotlib over traced arrays; the tracing itself runs on device.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from ..core.constants import DEFAULT_WAVE, EPSILON, GEO_SPP, WAVE_RGB
from ..optics import sampling
from ..optics.surfaces import sag_r2


def _surface_profile(lens, i, n_pts=257):
    """(z, r) polyline of surface i for drawing."""
    c = float(np.asarray(lens.stack.c)[i])
    k = float(np.asarray(lens.stack.k)[i])
    ai = np.asarray(lens.stack.ai)[i]
    d = float(np.asarray(lens.stack.d)[i])
    r_ap = float(np.asarray(lens.stack.r)[i])
    r = np.linspace(-r_ap, r_ap, n_pts)
    z = np.asarray(sag_r2(jnp.asarray(r * r), c, k, jnp.asarray(ai))) + d
    return z, r


def plot_setup2d(lens, ax=None, color="k"):
    """Draw surfaces, element boundaries, aperture wedge and sensor
    (reference optics.py:1793-1880)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(5, 5))
    n = lens.stack.num_surfaces
    d_np = np.asarray(lens.stack.d)
    r_np = np.asarray(lens.stack.r)

    for i in range(n):
        if lens.materials[i].is_air and lens.materials[i + 1].is_air:
            d, R = d_np[i], r_np[i]
            wl, wh = 0.05 * R, 0.15 * R
            for sgn in (1, -1):
                ax.plot([d - wl, d + wl], [sgn * R, sgn * R], color="orange")
                ax.plot([d, d], [sgn * R, sgn * (R + wh)], color="orange")
        else:
            z, r = _surface_profile(lens, i)
            ax.plot(z, r, color)

    # element boundaries between glass surfaces
    prev = None
    for i in range(n):
        if lens.materials[i].is_air:
            prev = i
        else:
            z0, r0 = _surface_profile(lens, prev, 3)
            z1, r1 = _surface_profile(lens, i, 3)
            for sgn in (1, -1):
                ax.plot([z0[-1], z1[-1]],
                        [sgn * np.abs(r0[-1]), sgn * np.abs(r1[-1])], color)
            prev = i

    ax.plot([lens.d_sensor, lens.d_sensor], [-lens.r_last, lens.r_last], color)
    ax.set_xlabel("z [mm]")
    ax.set_ylabel("r [mm]")
    ax.set_aspect("equal", adjustable="datalim")
    return ax


def plot_setup2d_with_trace(lens, filename, views=None, M=9, depth=None):
    """Lens drawing + RGB ray fans at 3 field angles
    (reference optics.py:1686-1744)."""
    views = [0, np.rad2deg(lens.hfov) * 0.707, np.rad2deg(lens.hfov) * 0.99] \
        if views is None else views
    ax = plot_setup2d(lens)
    colors = "bgr"
    for i, view in enumerate(views):
        pupil = lens.entrance_pupil()
        if depth is None:
            rays = sampling.sample_parallel_2d(view=view, M=M, pupil=pupil)
        else:
            rays = sampling.sample_point_source_2d(depth=depth, view=view, M=M,
                                                   pupil=pupil)
        out, os_, ras = lens.trace(rays, wvln=WAVE_RGB[2 - i], record=True)
        os_ = np.asarray(os_)          # [S, M, 3]
        start = np.asarray(rays.o)[None]
        path = np.concatenate([start, os_], 0)
        sensor = np.asarray(out.propagate_to(lens.d_sensor).o)[None]
        path = np.concatenate([path, sensor], 0)
        for m in range(path.shape[1]):
            ax.plot(path[:, m, 2], path[:, m, 0], colors[i], linewidth=0.8)
    ax.axis("off")
    title = (f"FoV{round(2 * lens.hfov * 57.3, 1)}({int(lens.calc_eqfl())}mm EFL)"
             f"_F/{round(lens.fnum, 2)}_DIAG{round(lens.r_last * 2, 2)}mm"
             f"_FocLen{round(lens.foclen, 2)}mm")
    ax.set_title(title)
    plt.savefig(f"{filename}.png", bbox_inches="tight", dpi=300)
    plt.close()


def draw_psf_map(lens, grid=9, depth=None, ks=51, spp=GEO_SPP, save_name=None,
                 key=None):
    """Grid-of-PSFs visualization, per-cell max-normalized
    (reference optics.py:1883-1931)."""
    from ..dp.psf import compute_psf_rgb

    points = sampling.point_source_grid(depth=depth, grid=grid).reshape(-1, 3)
    psfs = np.asarray(compute_psf_rgb(lens, points, key=key, spp=spp, ks=ks))
    psfs = psfs.reshape(grid, grid, 3, ks, ks)
    psf_map = psfs.transpose(0, 3, 1, 4, 2).reshape(grid * ks, grid * ks, 3)
    for i in range(0, grid * ks, ks):
        for j in range(0, grid * ks, ks):
            cell = psf_map[i:i + ks, j:j + ks]
            psf_map[i:i + ks, j:j + ks] = cell / (cell.max() + 1e-9)
    plt.figure(figsize=(8, 8))
    plt.imshow(np.clip(psf_map, 0, 1))
    plt.axis("off")
    plt.tight_layout(pad=0)
    name = save_name or "./psf_map"
    plt.savefig(f"{name}_psf{-int(depth)}mm_left.png", dpi=200)
    plt.close()
    return psf_map


def draw_spot_diagram(lens, M=7, depth=None, wvln=DEFAULT_WAVE, save_name=None,
                      key=None):
    """Grid spot diagrams with centroid markers (reference optics.py:1959-1989)."""
    key = jax.random.PRNGKey(0) if key is None else key
    mag = lens.calc_magnification3(depth)
    rays = lens.sample_point_source(key, depth=depth,
                                    R=lens.sensor_size[0] / 2 / mag, M=M, spp=1024)
    rays = lens.trace2sensor(rays, wvln=wvln)
    o2 = -np.asarray(rays.o)
    ra = np.asarray(rays.ra)

    fig, axs = plt.subplots(M, M, figsize=(30, 30))
    for i in range(M):
        for j in range(M):
            r = ra[:, i, j]
            x, y = o2[:, i, j, 0][r > 0], o2[:, i, j, 1][r > 0]
            if len(x) == 0:
                continue
            axs[i, j].scatter(x, y, 1, "black")
            axs[i, j].scatter([x.mean()], [y.mean()], None, "r", "x")
            axs[i, j].set_aspect("equal", adjustable="datalim")
    name = save_name or "./spot"
    plt.savefig(f"{name}_spot{-int(depth)}mm.png", bbox_inches="tight", dpi=150)
    plt.close()


def psf2mtf(lens, psf):
    """Sagittal/tangential MTF from a PSF slice (reference optics.py:1043-1080)."""
    psf = np.asarray(psf)
    cy, cx = psf.shape[0] // 2, psf.shape[1] // 2
    sag = np.abs(np.fft.fft(psf[cy, :]))
    tan = np.abs(np.fft.fft(psf[:, cx]))
    sag /= sag.max()
    tan /= tan.max()
    freq = np.fft.fftfreq(psf.shape[0], lens.pixel_size)
    pos = freq > 0
    return freq[pos], tan[pos], sag[pos]


def draw_mtf(lens, relative_fov=(0.0, 0.7, 1.0), save_name="./mtf.png",
             wvlns=DEFAULT_WAVE, depth=None, key=None):
    """MTF curves at several field points (reference optics.py:2041-2069)."""
    from ..dp.psf import compute_psf

    wvlns = [wvlns] if isinstance(wvlns, float) else list(wvlns)
    colors = "rgb"
    plt.figure(figsize=(6, 6))
    for wvln in wvlns:
        for fi, fov in enumerate(relative_fov):
            point = np.array([[fov, fov, depth]], np.float32)
            psf = np.asarray(compute_psf(lens, point, key=key, spp=GEO_SPP,
                                         ks=129, wvln=wvln))[0]
            freq, mtf_tan, mtf_sag = psf2mtf(lens, psf)
            fov_deg = round(fov * lens.hfov * 57.3, 1)
            plt.plot(freq, mtf_tan, colors[fi], label=f"{fov_deg}(deg)-Tangential")
            plt.plot(freq, mtf_sag, colors[fi], linestyle="--",
                     label=f"{fov_deg}(deg)-Sagittal")
    plt.legend()
    plt.xlabel("Spatial Frequency [cycles/mm]")
    plt.ylabel("MTF")
    if not save_name.endswith(".png"):
        save_name += ".png"
    plt.savefig(save_name, bbox_inches="tight", dpi=300)
    plt.close()


def draw_distortion(lens, depth, M=16, save_name=None, key=None):
    """Reference-vs-traced grid positions (reference optics.py:2072-2100)."""
    key = jax.random.PRNGKey(0) if key is None else key
    scale = lens.calc_scale_pinhole(depth)
    rays = lens.sample_point_source(key, depth=depth,
                                    R=lens.sensor_size[0] / 2 * scale,
                                    M=M, spp=GEO_SPP)
    o1 = np.asarray(rays.o)
    x1, y1 = o1[0, :, :, 0] / scale, o1[0, :, :, 1] / scale
    rays = lens.trace(rays)
    o2 = np.asarray(rays.project_to(lens.d_sensor))
    ra = np.asarray(rays.ra)
    x2 = (o2[..., 0] * ra).sum(0) / ra.sum(0)
    y2 = (o2[..., 1] * ra).sum(0) / ra.sum(0)

    fig, ax = plt.subplots()
    ax.set_title("Lens distortion")
    ax.scatter(x1, y1, s=2)
    ax.scatter(x2, y2, s=2)
    ax.legend(["ref", "distortion"])
    ax.axis("scaled")
    name = save_name or "./distortion"
    plt.savefig(f"{name}_distortion{-int(depth)}mm.png", bbox_inches="tight", dpi=300)
    plt.close()


def analysis_rms(lens, depth, ref=True, key=None):
    """RMS spot radii: average / on-axis / off-axis over RGB
    (reference optics.py:2103-2140)."""
    key = jax.random.PRNGKey(0) if key is None else key
    H = 31
    scale = lens.calc_scale_ray(depth)

    keys = jax.random.split(key, 4)
    if ref:
        rays = lens.sample_point_source(keys[3], depth=depth,
                                        R=lens.sensor_size[0] / 2 * scale,
                                        M=H, spp=GEO_SPP)
        rays = lens.trace(rays, wvln=DEFAULT_WAVE)
        p = np.asarray(rays.project_to(lens.d_sensor))
        ra = np.asarray(rays.ra)
        p_center_ref = (p * ra[..., None]).sum(0) / (ra.sum(0)[..., None] + 1e-4)

    rms, rms_on, rms_off = [], [], []
    for i, wvln in enumerate(WAVE_RGB):
        rays = lens.sample_point_source(keys[i], depth=depth,
                                        R=lens.sensor_size[0] / 2 * scale,
                                        M=H, spp=GEO_SPP)
        rays = lens.trace(rays, wvln=wvln)
        o2 = np.asarray(rays.project_to(lens.d_sensor))
        ra = np.asarray(rays.ra)
        center = (o2 * ra[..., None]).sum(0) / (ra.sum(0)[..., None] + 1e-4)
        o2n = (o2 - (p_center_ref if ref else center)) * ra[..., None]
        rms.append(np.sqrt((o2n**2 * ra[..., None]).sum() / ra.sum()))
        c = H // 2 + 1
        rms_on.append(np.sqrt((o2n[:, c, c, :]**2 * ra[:, c, c, None]).sum()
                              / ra[:, H // 2, H // 2].sum()))
        rms_off.append(np.sqrt((o2n[:, 0, 0, :]**2 * ra[:, 0, 0, None]).sum()
                               / ra[:, 0, 0].sum()))
    return (float(np.mean(rms)), float(np.mean(rms_on)), float(np.mean(rms_off)))


def analysis(lens, save_name="./test", ks=None, depth=None, key=None):
    """Standard analysis bundle: setup plot + PSF map + RMS numbers
    (reference optics.py:1663-1683)."""
    plot_setup2d_with_trace(lens, filename=save_name, depth=depth)
    draw_psf_map(lens, save_name=save_name, ks=ks or 51, depth=depth, key=key)
    rms_avg, rms_on, rms_off = analysis_rms(lens, depth=depth, key=key)
    print(f"On-axis RMS radius: {round(rms_on * 1000, 3)}um, "
          f"Off-axis RMS radius: {round(rms_off * 1000, 3)}um, "
          f"Avg RMS spot size (radius): {round(rms_avg * 1000, 3)}um.")
    return rms_avg, rms_on, rms_off


def draw_psf_radial(lens, M=3, depth=None, ks=51, log_scale=False,
                    save_name="./psf_radial.png", key=None):
    """Diagonal-field PSF strip (reference optics.py:1934-1956)."""
    from ..dp.psf import compute_psf_rgb

    key = jax.random.PRNGKey(0) if key is None else key
    xs = np.linspace(0, 1, M)
    fig, axs = plt.subplots(1, M, figsize=(4 * M, 4))
    for i in range(M):
        pts = np.array([[xs[i], xs[i], depth]], np.float32)
        key, sub = jax.random.split(key)
        psf = np.asarray(compute_psf_rgb(lens, pts, key=sub, spp=4096, ks=ks))[0]
        psf = psf / (psf.max() + 1e-9)
        if log_scale:
            psf = np.log(psf + EPSILON)
            psf = (psf - psf.min()) / (psf.max() - psf.min())
        axs[i].imshow(np.clip(psf.transpose(1, 2, 0), 0, 1))
        axs[i].axis("off")
    plt.savefig(save_name, bbox_inches="tight", dpi=150)
    plt.close()


def draw_spot_radial(lens, M=3, depth=None, save_name=None, key=None):
    """Diagonal-field spot diagrams (reference optics.py:1992-2038)."""
    key = jax.random.PRNGKey(0) if key is None else key
    mag = lens.calc_magnification3(depth)
    rays = lens.sample_point_source(key, depth=depth,
                                    R=lens.sensor_size[0] / 2 / mag,
                                    M=M * 2 - 1, spp=1024)
    rays = lens.trace(rays).propagate_to(lens.d_sensor)
    o2 = np.flip(np.asarray(rays.o), (1, 2))
    ra = np.flip(np.asarray(rays.ra), (1, 2))
    fig, axs = plt.subplots(1, M, figsize=(6 * M, 5))
    for i in range(M):
        ib = i + M - 1
        r = ra[:, ib, ib]
        x, y = o2[:, ib, ib, 0][r > 0], o2[:, ib, ib, 1][r > 0]
        if len(x):
            axs[i].scatter(x, y, 12, "black")
            axs[i].scatter([x.mean()], [y.mean()], 200, "r", "x")
        axs[i].set_aspect("equal", adjustable="datalim")
    name = save_name or "./spot_radial"
    plt.savefig(f"{name}_spot{-int(depth)}mm_radial.png", bbox_inches="tight", dpi=150)
    plt.close()
