"""The Lens: a multi-surface optical system with geometry calculations.

Host-side orchestration object around the jitted trace kernel. Mirrors the
reference Lensgroup (/root/reference/deeplens/optics.py:22-2198): loading,
aperture finding, sensor setup, paraxial pupil/FoV/EFL computation, refocus.
The per-ray compute path (trace) is pure JAX; the small paraxial solves
(pairwise ray intersections, trimmed means) stay in numpy on host exactly like
the reference keeps them out of its hot loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.constants import DEFAULT_WAVE, EPSILON, GEO_SPP
from ..core.rays import Rays
from . import sampling
from . import sampling as sampling_mod
from .surfaces import KIND_STOP, SurfaceStack, surface_step, trace_rays


@functools.partial(jax.jit, static_argnames=("forward",))
def _trace_jit(rays, stack, eta, skip, forward):
    return trace_rays(rays, stack, eta, skip, forward=forward)


@functools.partial(jax.jit, static_argnames=("forward",))
def _trace_record_jit(rays, stack, eta, skip, forward):
    """Trace while recording per-surface intersection points (for plots and
    pruning; reference optics.py:666-689 with record=True)."""
    params = {
        "c": stack.c, "k": stack.k, "ai": stack.ai, "d": stack.d,
        "r": stack.r, "kind": stack.kind, "eta": eta, "skip_refract": skip,
    }
    if not forward:
        params = jax.tree.map(lambda a: jnp.flip(a, axis=0), params)

    def step(carry, p):
        out = surface_step(carry, p, forward=forward)
        return out, (out.o, out.ra)

    out, (os_, ras) = lax.scan(step, rays, params)
    return out, os_, ras


class Lens:
    """A lens system mounted at the origin; surfaces along +z, sensor at
    z = d_sensor, objects at negative z."""

    def __init__(self, filename: str | None = None, sensor_res=(1024, 1024),
                 post_computation: bool = True):
        self.lens_name = filename
        self.sensor_res = tuple(sensor_res)
        self._pupil_cache = {}
        if filename is not None:
            self.load_file(filename, sensor_res, post_computation)

    # ------------------------------------------------------------------
    # Loading / setup
    # ------------------------------------------------------------------
    def load_file(self, filename: str, sensor_res, post_computation=True):
        from ..io.lens_json import read_lens_json

        if not filename.endswith(".json"):
            raise ValueError("Only .json lens files are supported.")
        stack, materials, r_last, d_sensor, _meta = read_lens_json(filename)
        self.stack = stack
        self.materials = materials
        self.r_last = r_last
        self.d_sensor = d_sensor
        self.focz = d_sensor

        self.find_aperture()
        self.prepare_sensor(sensor_res)
        if post_computation:
            self.post_computation()

    def load_external(self, stack, materials, r_last, d_sensor):
        self.stack = stack
        self.materials = materials
        self.r_last = r_last
        self.d_sensor = d_sensor
        self._pupil_cache = {}

    def prepare_sensor(self, sensor_res=(512, 512), sensor_size=(24.0, 36.0)):
        """reference optics.py:154-178 — full-frame 24x36mm sensor by default."""
        sensor_res = (sensor_res, sensor_res) if isinstance(sensor_res, int) else tuple(sensor_res)
        self.sensor_res = sensor_res
        H, W = sensor_res
        if sensor_size is None:
            s = 2 * self.r_last / np.sqrt(H**2 + W**2)
            self.sensor_size = [s * H, s * W]
        else:
            self.sensor_size = list(sensor_size)
            self.r_last = float(np.sqrt(sensor_size[0] ** 2 + sensor_size[1] ** 2) / 2)
        assert self.sensor_size[0] / self.sensor_size[1] == H / W, "Pixel is not square."
        self.pixel_size = self.sensor_size[0] / H

    def post_computation(self):
        """Compute hfov, foclen, fnum (reference optics.py:181-191)."""
        self.find_aperture()
        self._pupil_cache = {}
        self.hfov = self.calc_fov()
        self.foclen = self.calc_efl()
        _, pupilr = self.entrance_pupil()
        self.fnum = self.foclen / pupilr / 2

    def find_aperture(self):
        """First surface with air on both sides (reference optics.py:193-201)."""
        self.aper_idx = None
        n = self.stack.num_surfaces
        for i in range(n - 1):
            if self.materials[i].is_air and self.materials[i + 1].is_air:
                self.aper_idx = i
                return

    def find_diff_surf(self):
        if self.aper_idx is None:
            return list(range(self.stack.num_surfaces))
        return [i for i in range(self.stack.num_surfaces) if i != self.aper_idx]

    # ------------------------------------------------------------------
    # Refraction ratios
    # ------------------------------------------------------------------
    @functools.lru_cache(maxsize=64)
    def _eta_cached(self, wvln: float, forward: bool):
        # Cache invariants: eta depends on materials (immutable after load)
        # and skip on (c == 0), which no lens operation changes (perturb
        # leaves zero curvatures zero; prune/set_aperture touch only r,
        # correct_shape only d). Rebuild the Lens to change materials.
        n = np.array([m.ior(wvln) for m in self.materials], np.float32)
        n1, n2 = n[:-1], n[1:]
        eta = n1 / n2 if forward else n2 / n1
        c = np.asarray(self.stack.c)
        skip = ((c == 0.0) & (eta == 1.0)).astype(np.float32)
        return jnp.asarray(eta), jnp.asarray(skip)

    def eta_arrays(self, wvln: float = DEFAULT_WAVE, forward: bool = True):
        return self._eta_cached(float(wvln), bool(forward))

    def static_desc(self) -> tuple:
        """Hashable static surface description for the unrolled throughput
        trace (surfaces.trace_rays_specialized). Wavelength-independent (the
        skip flag is structural: c == 0 stops in air). Recomputed per call —
        equal values hash equal, so jit caches by content and surface edits
        (set_aperture / perturb / correct_shape) recompile as they must."""
        from .surfaces import static_surface_desc

        _, skip = self.eta_arrays(DEFAULT_WAVE, True)
        return static_surface_desc(self.stack, skip)

    def n_in_array(self, wvln: float = DEFAULT_WAVE, forward: bool = True):
        """Per-surface refractive index of the incidence medium (for coherent
        OPL accumulation)."""
        n = np.array([m.ior(wvln) for m in self.materials], np.float32)
        return jnp.asarray(n[:-1] if forward else n[1:])

    # ------------------------------------------------------------------
    # Tracing
    # ------------------------------------------------------------------
    def trace(self, rays: Rays, wvln: float = DEFAULT_WAVE, forward: bool = True,
              lens_range=None, record: bool = False):
        """Trace rays through (a range of) the surfaces."""
        stack = self.stack
        eta, skip = self.eta_arrays(wvln, forward)
        if lens_range is not None:
            idx = jnp.asarray(list(lens_range), jnp.int32)
            if idx.size == 0:
                return (rays, None, None) if record else rays
            take = lambda a: jnp.take(a, idx, axis=0)
            stack = SurfaceStack(
                c=take(stack.c), k=take(stack.k), ai=take(stack.ai),
                d=take(stack.d), r=take(stack.r), kind=take(stack.kind),
            )
            eta, skip = take(eta), take(skip)
        if record:
            return _trace_record_jit(rays, stack, eta, skip, forward)
        return _trace_jit(rays, stack, eta, skip, forward)

    def trace2sensor(self, rays: Rays, wvln: float = DEFAULT_WAVE) -> Rays:
        """Forward trace then propagate to the sensor plane (optics.py:638-664)."""
        rays = self.trace(rays, wvln=wvln, forward=True)
        return rays.propagate_to(self.d_sensor)

    def trace2obj(self, rays: Rays, depth: float, wvln: float = DEFAULT_WAVE) -> Rays:
        rays = self.trace(rays, wvln=wvln, forward=True)
        return rays.propagate_to(depth)

    # ------------------------------------------------------------------
    # Pupils (paraxial; reference optics.py:1327-1396)
    # ------------------------------------------------------------------
    def entrance_pupil(self, entrance: bool = True, shrink_pupil: bool = False):
        key = entrance
        if key not in self._pupil_cache:
            self._pupil_cache[key] = self._calc_pupil_paraxial(entrance)
        pupilz, pupilr = self._pupil_cache[key]
        if shrink_pupil:
            pupilr = pupilr * 0.25
        return pupilz, pupilr

    def exit_pupil(self, shrink_pupil: bool = False):
        return self.entrance_pupil(entrance=False, shrink_pupil=shrink_pupil)

    def _calc_pupil_paraxial(self, entrance: bool, wvln: float = DEFAULT_WAVE):
        """Image the aperture stop through the preceding/following surfaces
        with an exact 2x2 paraxial ray-transfer matrix (reference
        optics.py:1335-1376 does the same imaging by tracing real rays at
        delta_r=1e-3 and intersecting them, which is the paraxial limit of
        this computation up to conditioning noise of near-parallel lines).

        Convention: state (y, omega) with reduced angle omega = n*u;
        refraction at vertex curvature kappa is [[1,0],[-phi,1]] with power
        phi = kappa*(n2-n1); translation tau in medium n is [[1,tau/n],[0,1]].
        For a stop point imaged through matrix M, angle-independence of the
        image height gives pupilz and magnification det(M)/row-element (and
        det(M)=1), so the result is closed-form and conditioning-free.
        """
        n_surf = self.stack.num_surfaces
        d_np = np.asarray(self.stack.d, np.float64)
        r_np = np.asarray(self.stack.r)
        if self.aper_idx is None:
            return (float(d_np[0]), float(r_np[0])) if entrance else (float(d_np[-1]), float(r_np[-1]))

        aper_r = float(r_np[self.aper_idx])
        n = np.array([m.ior(wvln) for m in self.materials], np.float64)
        c = np.asarray(self.stack.c, np.float64)
        ai0 = np.asarray(self.stack.ai, np.float64)[:, 0]
        kinds = np.asarray(self.stack.kind)
        # vertex curvature of the even asphere: sag = kappa r^2/2 + O(r^4)
        kappa = np.where(kinds == KIND_STOP, 0.0, c + 2.0 * ai0)

        def refract_m(i):
            phi = kappa[i] * (n[i + 1] - n[i])
            return np.array([[1.0, 0.0], [-phi, 1.0]])

        def translate_m(tau, n_med):
            return np.array([[1.0, tau / n_med], [0.0, 1.0]])

        if entrance:
            # M: (y, omega) at the surface-0 vertex plane -> stop plane
            M = np.eye(2)
            for i in range(self.aper_idx):
                M = refract_m(i) @ M
                M = translate_m(d_np[i + 1] - d_np[i], n[i + 1]) @ M
            A, B = M[0]
            pupilz = float(d_np[0] + B / A)
            pupilr = abs(aper_r / A)
        else:
            # M: stop plane -> last-surface vertex plane
            M = np.eye(2)
            for i in range(self.aper_idx + 1, n_surf):
                M = translate_m(d_np[i] - d_np[i - 1], n[i]) @ M
                M = refract_m(i) @ M
            B, D = M[0, 1], M[1, 1]
            pupilz = float(d_np[-1] - B / D)
            pupilr = abs(aper_r / D)
        return pupilz, float(pupilr)

    # ------------------------------------------------------------------
    # FoV / focal length (reference optics.py:1094-1306)
    # ------------------------------------------------------------------
    def calc_fov(self) -> float:
        """Half-diagonal FoV by backward edge-ray tracing (optics.py:1202-1233)."""
        m = 100
        pupilz, pupilr = self.exit_pupil(shrink_pupil=True)
        o1 = np.tile(np.array([self.r_last, 0.0, self.d_sensor], np.float32), (m, 1))
        x2 = np.linspace(-pupilr, pupilr, m)
        o2 = np.stack([x2, np.zeros(m), np.full(m, pupilz)], axis=-1).astype(np.float32)
        rays = Rays.create(o1, o2 - o1)
        rays = self.trace(rays, forward=False)
        ra = np.asarray(rays.ra)
        tan_fov = np.asarray(rays.d[..., 0] / rays.d[..., 2])
        denom = ra.sum()
        fov = np.arctan((tan_fov * ra).sum() / denom) if denom > 0 else np.nan
        if np.isnan(fov):
            return 0.5
        return float(fov)

    def calc_efl(self) -> float:
        return float(self.r_last / np.tan(self.hfov))

    def calc_eqfl(self) -> float:
        """35mm-equivalent focal length (optics.py:1119-1124)."""
        return float(21.63 / np.tan(self.hfov))

    def calc_bfl(self, wvln=DEFAULT_WAVE) -> float:
        return float(self.d_sensor - self.calc_principal(wvln)[1])

    def calc_principal(self, wvln=DEFAULT_WAVE):
        """Front/back principal plane positions (optics.py:1274-1298)."""
        m = 32
        r0 = float(np.asarray(self.stack.r)[0])
        out_planes = []
        for forward in (False, True):
            rays_in = sampling.sample_parallel_2d(R=r0, M=m, z=0.0 if forward else self.d_sensor,
                                                  forward=forward)
            out = self.trace(rays_in, wvln=wvln, forward=forward)
            ra = np.asarray(out.ra)
            # invalidated rays carry d_x == 0; mask the denominator before
            # dividing (they are excluded by ra below) to keep the golden
            # run warning-free
            d0 = np.where(ra > 0, np.asarray(out.d[..., 0]), 1.0)
            t = (np.asarray(out.o[..., 0]) - np.asarray(rays_in.o[..., 0])) / d0
            z = np.asarray(out.o[..., 2]) - np.asarray(out.d[..., 2]) * t
            out_planes.append(float(np.nanmean(z[ra > 0])))
        front_principal, back_principal = out_planes
        return front_principal, back_principal

    def calc_scale_pinhole(self, depth):
        """Pinhole magnification-reciprocal at a depth (optics.py:1301-1306)."""
        return -depth * np.tan(self.hfov) / self.r_last

    def calc_magnification3(self, depth, key=None):
        """Ray-traced magnification (optics.py:1236-1271)."""
        m, spp = 21, 512
        key = jax.random.PRNGKey(42) if key is None else key
        rays = self.sample_point_source(key, depth=depth,
                                        R=-depth * np.tan(self.hfov) * 0.5, M=m, spp=spp)
        o1 = np.asarray(rays.o)[..., :2]
        o1 = np.flip(o1, (1, 2))
        rays = self.trace(rays)
        o2 = np.asarray(rays.project_to(self.d_sensor))
        ra = np.asarray(rays.ra)
        x2 = (o2[..., 0] * ra).sum(0) / (ra.sum(0) + EPSILON)
        x1 = o1[0, :, :, 0]
        mag_x = x1 / x2
        tmp = mag_x[: m // 2, : m // 2]
        mag = 1.0 / float(np.mean(tmp[~np.isnan(tmp)]))
        if mag == 0:
            return 1.0 / self.calc_scale_pinhole(depth)
        return mag

    def calc_scale_ray(self, depth):
        return 1.0 / self.calc_magnification3(depth)

    # ------------------------------------------------------------------
    # Refocus (reference optics.py:1169-1196)
    # ------------------------------------------------------------------
    def refocus(self, depth: float, key=None):
        """Move the sensor to the least-squares focus of a point at `depth`."""
        key = jax.random.PRNGKey(0) if key is None else key
        r0 = float(np.asarray(self.stack.r)[0])
        d0 = float(np.asarray(self.stack.d)[0])
        o = sampling.surface_sample(key, GEO_SPP, r0, d0)
        d = o - jnp.array([0.0, 0.0, depth], jnp.float32)
        rays = Rays.create(o, d)
        rays = self.trace(rays)

        dx, dy, dz = (np.asarray(rays.d[..., i]) for i in range(3))
        ox, oy, oz = (np.asarray(rays.o[..., i]) for i in range(3))
        ra = np.asarray(rays.ra)
        t = (dx * ox + dy * oy) / (dx**2 + dy**2)
        t = t * ra
        focus_d = oz - dz * t
        focus_d = focus_d[ra > 0]
        focus_d = focus_d[~np.isnan(focus_d) & (focus_d > 0)]
        d_sensor_new = float(np.mean(focus_d))
        assert d_sensor_new > 0, "sensor position is negative."
        self.d_sensor = d_sensor_new
        self.post_computation()

    def calc_foc_dist(self, wvln=DEFAULT_WAVE, key=None):
        """Object-space focus distance by backward tracing from the sensor
        center (reference optics.py:1126-1146; negative z)."""
        key = jax.random.PRNGKey(0) if key is None else key
        o1 = jnp.tile(jnp.array([0.0, 0.0, self.d_sensor], jnp.float32),
                      (GEO_SPP, 1))
        r0 = float(np.asarray(self.stack.r)[0])
        d0 = float(np.asarray(self.stack.d)[0])
        o2 = sampling.surface_sample(key, GEO_SPP, r0, d0) * jnp.array(
            [0.2, 0.2, 1.0], jnp.float32)
        rays = Rays.create(o1, o2 - o1)
        rays = self.trace(rays, wvln=wvln, forward=False)
        dx, dy, dz = (np.asarray(rays.d[..., i]) for i in range(3))
        ox, oy, oz = (np.asarray(rays.o[..., i]) for i in range(3))
        ra = np.asarray(rays.ra)
        t = (dx * ox + dy * oy) / (dx**2 + dy**2)
        focus_p = (oz - dz * t)[ra > 0]
        focus_p = focus_p[~np.isnan(focus_p) & (focus_p < 0)]
        return float(np.mean(focus_p))

    def refocus_inf(self):
        """Focus to infinity with an axial parallel beam (optics.py:1148-1166)."""
        r0 = float(np.asarray(self.stack.r)[0])
        rays = sampling.sample_parallel_2d(R=r0 * 0.5, M=GEO_SPP, z=0.0)
        rays = self.trace(rays)
        dx, dy, dz = (np.asarray(rays.d[..., i]) for i in range(3))
        ox, oy, oz = (np.asarray(rays.o[..., i]) for i in range(3))
        ra = np.asarray(rays.ra)
        t = (dx * ox + dy * oy) / (dx**2 + dy**2)
        focus_p = oz - dz * t
        focus_p = focus_p[ra > 0]
        focus_p = focus_p[~np.isnan(focus_p) & (focus_p > 0)]
        d_sensor_new = float(np.mean(focus_p))
        assert d_sensor_new > 0
        self.d_sensor = d_sensor_new
        self.post_computation()

    @property
    def surface_count(self) -> int:
        return self.stack.num_surfaces

    # ------------------------------------------------------------------
    # Sampling helpers bound to this lens
    # ------------------------------------------------------------------
    def sample_from_points(self, key, points, spp: int = 256, shrink_pupil=False) -> Rays:
        pupilz, pupilr = self.entrance_pupil(shrink_pupil=shrink_pupil)
        return sampling.sample_from_points(key, points, spp, pupilz, pupilr)

    def sample_from_points_grid(self, points, M: int = 256) -> Rays:
        """Regular pupil-grid quadrature (for coherent integration)."""
        pupilz, pupilr = self.entrance_pupil()
        return sampling.sample_from_points_grid(points, M, pupilz, pupilr)

    def sample_point_source(self, key, depth=-10.0, R=None, M=11, spp=16) -> Rays:
        """Grid of point sources, pupil-aimed rays [spp, M, M]
        (reference optics.py:403-456)."""
        if R is None:
            R = float(np.asarray(self.stack.r)[0])
        Rw = R * self.sensor_res[1] / self.sensor_res[0]
        x, y = np.meshgrid(np.linspace(-1, 1, M), np.linspace(1, -1, M), indexing="xy")
        o = np.stack([x * Rw, y * R, np.full_like(x, depth)], axis=-1).astype(np.float32)
        o = jnp.broadcast_to(jnp.asarray(o)[None], (spp, M, M, 3))
        pupilz, pupilr = self.entrance_pupil()
        o2 = sampling.sample_pupil_stratified(key, (M, M), spp, pupilr, pupilz)
        return Rays.create(o, o2 - o)

    def sample_parallel(self, key, fov_deg: float = 0.0, M: int = 15,
                        sampling: str = "grid", forward: bool = True) -> Rays:
        """Parallel rays over the entrance pupil, propagated back to the
        first surface plane (reference optics.py:277-362: rays are formed on
        the pupil then moved to z = surfaces[0].d before tracing)."""
        pupilz, pupilr = self.entrance_pupil()
        z0 = float(np.asarray(self.stack.d)[0])
        return sampling_mod.sample_parallel(key, fov_deg, M, pupilz, pupilr,
                                            sampling=sampling, forward=forward,
                                            z=z0)

    def sample_sensor(self, key, spp: int = 64) -> Rays:
        """Backward rays from sensor pixels through the exit pupil
        (reference optics.py:497-538)."""
        pupilz, pupilr = self.exit_pupil()
        return sampling.sample_sensor(key, self.sensor_res, self.sensor_size,
                                      self.d_sensor, spp, pupilz, pupilr)

    # ------------------------------------------------------------------
    # Pruning / shape correction (reference optics.py:1554-1656)
    # ------------------------------------------------------------------
    def prune_surf(self, outer=None):
        outer = self.r_last * 0.05 if outer is None else outer
        surface_range = self.find_diff_surf()

        r_np = np.asarray(self.stack.r).copy()
        for i in surface_range:
            r_np[i] = self.r_last
        self.stack = SurfaceStack(c=self.stack.c, k=self.stack.k, ai=self.stack.ai,
                                  d=self.stack.d, r=jnp.asarray(r_np), kind=self.stack.kind)

        view = self.hfov if self.hfov is not None else np.arctan(self.r_last / self.d_sensor)
        pupil = self.entrance_pupil()
        rays = sampling.sample_parallel_2d(view=float(np.rad2deg(view)), M=21, pupil=pupil)
        _, os_, ras = self.trace(rays, record=True)
        os_, ras = np.asarray(os_), np.asarray(ras)   # [S, M, 3], [S, M]
        for i in surface_range:
            hit = np.abs(os_[i, :, 0])
            if hit.size:
                r_np[i] = hit.max() + outer
        for i in surface_range[:-1]:
            if self.materials[i].n_d < self.materials[i + 1].n_d:
                r_np[i] = min(r_np[i], r_np[i + 1])
        # cap by shape-defined max height and the sensor radius
        c_np, k_np = np.asarray(self.stack.c), np.asarray(self.stack.k)
        for i in surface_range:
            if k_np[i] > -1 and c_np[i] != 0:
                max_h = np.sqrt(1 / (k_np[i] + 1) / c_np[i] ** 2) - 0.01
            else:
                max_h = 100.0
            r_np[i] = min(r_np[i], min(max_h, self.r_last))
        self.stack = SurfaceStack(c=self.stack.c, k=self.stack.k, ai=self.stack.ai,
                                  d=self.stack.d, r=jnp.asarray(r_np), kind=self.stack.kind)

    def set_aperture(self, fnum=None, foclen=None, aper_r=None):
        """Change the aperture radius (reference optics.py:1527-1538)."""
        r_np = np.asarray(self.stack.r).copy()
        if aper_r is None:
            if foclen is None:
                foclen = self.calc_efl()
            aper_r = foclen / fnum / 2
        r_np[self.aper_idx] = aper_r
        self.stack = SurfaceStack(c=self.stack.c, k=self.stack.k, ai=self.stack.ai,
                                  d=self.stack.d, r=jnp.asarray(r_np), kind=self.stack.kind)
        self._pupil_cache = {}
        self.fnum = self.foclen / aper_r / 2

    def write_lens_json(self, path: str):
        from ..io.lens_json import write_lens_json
        write_lens_json(self, path)
