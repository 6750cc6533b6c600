"""Physical and numerical constants of the optical stack.

Parity source: /root/reference/deeplens/basics.py:15-37. Values are behavior,
not style — tolerances and sample counts shape the traced PSFs, so they are
reproduced exactly.
"""

# Wavelengths [um]
DEFAULT_WAVE = 0.589
WAVE_RGB = (0.656, 0.589, 0.486)

# Depth conventions [mm]; objects live at negative z
DEPTH = -20000.0

# Ray sampling
GEO_SPP = 2048          # samples/point for geometric optics calculations

# Numerics
MINT = 1e-5
MAXT = 1e5
DELTA = 1e-6
EPSILON = 1e-9          # replaces 0 in denominators

# Newton iteration (reference surfaces.py:26-29). The reference runs up to
# 10 plane-seeded iterations; with the closed-form sphere seed
# (optics/surfaces.py:_sphere_seed) 2 suffice and are the production
# default (golden-validated on both shipped lenses). 1 iteration matches
# goldens for plain forward traces but breaks backward tracing (FoV/focus
# calibration) and the refocused chief-ray pipeline — do not lower it.
NEWTON_MAXITER = 10
NEWTON_FAST_ITERS = 2
NEWTON_TOL_TIGHT = 10e-6   # [mm] == 10 nm
NEWTON_TOL_LOOSE = 50e-6   # [mm]
NEWTON_STEP_BOUND = 5.0    # [mm] max step per Newton iteration

# PSF surrogate working range [mm] (reference psfnet.py:15-16)
DMIN = 200.0
DMAX = 20000.0

# Maximum number of even-asphere coefficients carried by the stacked surface
# representation (a2..a16). Shipped lenses use at most 6.
MAX_AI_TERMS = 8
