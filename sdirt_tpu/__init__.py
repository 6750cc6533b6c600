"""sdirt-tpu: TPU-native dual-pixel ray-tracing / depth-estimation framework.

Top-level convenience exports are lazy (PEP 562) so `import sdirt_tpu` stays
instant and does not pull jax/flax until a symbol is touched.
"""

__version__ = "0.2.0"

_EXPORTS = {
    "Lens": "sdirt_tpu.optics.lens",
    "PSFNetLens": "sdirt_tpu.psfnet.surrogate",
    "Rays": "sdirt_tpu.core.rays",
    "Material": "sdirt_tpu.core.materials",
    "trace_rays": "sdirt_tpu.optics.surfaces",
    "SurfaceStack": "sdirt_tpu.optics.surfaces",
    "compute_psf": "sdirt_tpu.dp.psf",
    "forward_integral": "sdirt_tpu.dp.splat",
    "DPParams": "sdirt_tpu.dp.splat",
    "coherent_psf": "sdirt_tpu.dp.coherent",
    "render_dp": "sdirt_tpu.render.pipeline",
    "Basenet": "sdirt_tpu.dfdp.basenet",
    "ThinLens": "sdirt_tpu.psfnet.thinlens",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module = importlib.import_module(_EXPORTS[name])
        value = getattr(module, name)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'sdirt_tpu' has no attribute {name!r}")


def __dir__():
    return __all__
