"""Failure detection: checkify-instrumented tracing for debug runs.

The reference hard-exits the process on NaN inside Newton
(surfaces.py:555-558) and asserts on NaN loss (2_dfdp_net.py:180). The
production path here never exits — invalid rays are masked out — and this
module adds an opt-in instrumented trace that *reports* non-finite
intermediates with jax.experimental.checkify instead of crashing or
silently propagating.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..optics.surfaces import trace_rays


def checked_trace(rays, stack, eta, skip, forward: bool = True):
    """Trace with non-finite checks on the outputs. Returns (error, rays);
    call error.throw() to raise, or error.get() for a report string."""

    def traced(rays, stack, eta, skip):
        out = trace_rays(rays, stack, eta, skip, forward=forward)
        checkify.check(jnp.isfinite(out.o).all(),
                       "non-finite ray positions after trace")
        checkify.check(jnp.isfinite(out.d).all(),
                       "non-finite ray directions after trace")
        live = out.ra.sum()
        checkify.check(jnp.isfinite(live), "non-finite validity mask")
        return out

    checked = checkify.checkify(traced, errors=checkify.float_checks)
    return jax.jit(checked)(rays, stack, eta, skip)


def assert_finite_loss(loss, context: str = "loss"):
    """Host-side NaN guard for training loops (reference 2_dfdp_net.py:180,
    minus the process kill)."""
    import numpy as np

    val = float(loss)
    if not np.isfinite(val):
        raise FloatingPointError(f"non-finite {context}: {val}")
    return val
