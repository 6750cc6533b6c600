"""FocalStackLens: render a multi-focus DP stack through several surrogates.

The reference scaffolds focal stacks (n_stack, select_focus_dist,
2_dfdp_net.py:164,210) but pins n=1 everywhere and its validation loop even
overwrites the stack each iteration — multi-focus input is dead code there.
Here it is a real capability: one surrogate per focus setting (each fitted
with its own refocused geometry + focus prior, apps/fit_psfnet.py
--focus-mm), rendered in sequence and concatenated channel-wise, giving the
depth net views whose defocus gradients live in DIFFERENT depth bands.

Physics motivation (RESULTS.md round-2/4 probes): at F/4 focused at 1 m the
DP disparity spans only 0.14 px from 5 m to 9 m — far-field depth is below
any network's discrimination ceiling from a single 1 m-focused pair, and the
round-4 F/1.8 A/B proved wider apertures do not fix it. A second view focused
AT 5 m re-centers the resolvable disparity band on the far field.

Layout contract (consumed by dfdp.basenet.Basenet): the stack is
[N, 6*V, H, W] with view v occupying channels [6v, 6v+6) as (left RGB ||
right RGB) — each sub-render's native output, concatenated in lens order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class FocalStackLens:
    """A list of PSFNetLens (one per focus), rendered as one input stack."""

    def __init__(self, lenses):
        assert len(lenses) >= 1
        self.lenses = list(lenses)
        # shared-geometry attributes delegate to the primary (1 m) lens
        p = self.lenses[0]
        self.kernel_size = p.kernel_size
        self.sensor_res = p.sensor_res

    @property
    def n_views(self) -> int:
        return len(self.lenses)

    @property
    def net(self):
        return self.lenses[0].net

    @property
    def params(self):
        return self.lenses[0].params

    def render(self, img, depth, foc_dist, train: bool = False, key=None):
        """img: [N, C, H, W]; depth: [N, 1, H, W] mm (negative).
        Returns [N, 2C*V, H, W] — per-view DP pairs concatenated in lens
        order. foc_dist is accepted for interface parity and ignored: each
        sub-lens's focus is baked into its fitted surrogate (the reference's
        4D render branch ignores foc_dist too, psfnet.py:683-694)."""
        key = jax.random.PRNGKey(0) if key is None else key
        keys = jax.random.split(key, len(self.lenses))
        outs = [lens.render(img, depth, foc_dist, train=train, key=k)
                for lens, k in zip(self.lenses, keys)]
        return jnp.concatenate(outs, axis=1)
