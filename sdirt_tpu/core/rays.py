"""Ray bundles as JAX pytrees (struct-of-arrays).

The reference models a ray bundle as a torch nn.Module with mutable tensor
attributes (/root/reference/deeplens/basics.py:216-297). Here a bundle is an
immutable registered dataclass: every transform (propagation, surface
interaction) returns a new bundle, so bundles flow through jit / vmap / grad
without device bookkeeping.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along axis (torch nnF.normalize equivalent)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Rays:
    """A bundle of rays sharing one wavelength.

    o:     [..., 3] positions [mm]
    d:     [..., 3] unit directions
    ra:    [...]    validity (1.0 live / 0.0 dead)
    en:    [...]    spherical-wave energy decay
    obliq: [...]    accumulated obliquity factor (product of cos of bend angles)
    opl:   [...]    optical path length (coherent mode)
    phi:   [...]    accumulated phase, reduced per surface (coherent mode;
                    reference basics.py:272 / surfaces.py:439 keeps phase
                    f32-accurate via fmod(n*k*(t - t.min), 2pi) per surface —
                    total-OPL phase is meaningless in f32 for far objects)
    """

    o: jnp.ndarray
    d: jnp.ndarray
    ra: jnp.ndarray
    en: jnp.ndarray
    obliq: jnp.ndarray
    opl: jnp.ndarray
    phi: jnp.ndarray

    @staticmethod
    def create(o, d, ra=None, dtype=jnp.float32) -> "Rays":
        o = jnp.asarray(o, dtype)
        d = normalize(jnp.asarray(d, dtype))
        shape = o.shape[:-1]
        if ra is None:
            ra = jnp.ones(shape, dtype)
        else:
            ra = jnp.asarray(ra, dtype)
        one = jnp.ones(shape, dtype)
        zero = jnp.zeros(shape, dtype)
        return Rays(o=o, d=d, ra=ra, en=one, obliq=one, opl=zero, phi=zero)

    @property
    def shape(self):
        return self.o.shape[:-1]

    def propagate_to(self, z, n: float = 1.0, wvln=None) -> "Rays":
        """Propagate every ray to the plane at depth z (basics.py:256-274).

        With wvln (microns) set, also accumulates opl and per-step-reduced
        phase like coherent surface stepping (basics.py:266-272)."""
        t = (z - self.o[..., 2]) / self.d[..., 2]
        new = dataclasses.replace(self, o=self.o + self.d * t[..., None])
        if wvln is not None:
            k_wave = 2.0 * jnp.pi / (wvln * 1e-3)
            dphi = jnp.mod(n * k_wave * (t - jax.lax.stop_gradient(t).min(axis=0)),
                           2.0 * jnp.pi)
            new = dataclasses.replace(new, opl=self.opl + n * t,
                                      phi=self.phi + dphi)
        return new

    def project_to(self, z) -> jnp.ndarray:
        """(x, y) intersection with plane z, shape [..., 2] (basics.py:277-285)."""
        t = (z - self.o[..., 2]) / self.d[..., 2]
        return self.o[..., 0:2] + self.d[..., 0:2] * t[..., None]

    def replace(self, **kw) -> "Rays":
        return dataclasses.replace(self, **kw)
