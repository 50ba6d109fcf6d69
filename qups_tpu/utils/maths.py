"""Numeric helpers mirroring QUPS's ``utils/`` (see SURVEY.md §2.6).

The reference's dimension-juggling helpers (``swapdim``, ``sub``, ``tenmul``,
``/root/reference/utils/swapdim.m:1``) vanish into ``jnp`` indexing/einsum; the
numeric and test helpers below carry over.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mod2db(x):
    """Log-compressed magnitude: ``20*log10(|x|)`` (ref ``utils/mod2db.m``)."""
    return 20.0 * jnp.log10(jnp.abs(x))


def db2pow(x):
    return 10.0 ** (jnp.asarray(x) / 10.0)


def pow2db(x):
    return 10.0 * jnp.log10(jnp.asarray(x))


def nan2zero(x):
    """Replace NaNs with zeros (ref ``utils/nan2zero.m``)."""
    return jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)


def rsqrt(x):
    return 1.0 / jnp.sqrt(x)


def isalmostn(a, b, tol=None) -> bool:
    """NaN-tolerant almost-equal — the reference test comparator
    (``utils/isalmostn.m``, used throughout ``test/KernTest.m``)."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        return False
    if tol is None:
        tol = 1e2 * np.finfo(np.result_type(a.dtype, b.dtype, np.float32)).eps
    nan_match = np.isnan(a) == np.isnan(b)
    if not nan_match.all():
        return False
    ok = np.ones(a.shape, dtype=bool)
    m = ~np.isnan(a)
    ok[m] = np.abs(a[m] - b[m]) < tol
    return bool(ok.all())


def deg2rad(x):
    return jnp.asarray(x) * (np.pi / 180.0)


def rad2deg(x):
    return jnp.asarray(x) * (180.0 / np.pi)


def cosd(x):
    return jnp.cos(deg2rad(x))


def sind(x):
    return jnp.sin(deg2rad(x))


def vecnorm(x, axis=0, keepdims=False):
    """Euclidean norm along ``axis`` (MATLAB ``vecnorm`` semantics)."""
    return jnp.sqrt(jnp.sum(jnp.real(x) ** 2 + jnp.imag(x) ** 2, axis=axis, keepdims=keepdims)) \
        if jnp.iscomplexobj(x) else jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))


def next_pow2(n: int) -> int:
    n = int(n)
    p = 1
    while p < n:
        p <<= 1
    return p


def box_rbounds(pa, pb):
    """Conservative ``(min, max)`` Euclidean distance between two point
    sets via their axis-aligned bounding boxes — O(len(a) + len(b)) host
    numpy, vs the exact O(a*b) distance matrix (seconds of host time and
    multi-hundred-MB temps at ~1e5 x 128 points). The lower bound
    under-estimates and the upper over-estimates, which is the safe
    direction for FFT-length / trace-window planning.

    ``pa``/``pb``: (num, 3) point arrays.
    """
    import numpy as np

    pa = np.asarray(pa, np.float64).reshape(-1, 3)
    pb = np.asarray(pb, np.float64).reshape(-1, 3)
    alo, ahi = pa.min(axis=0), pa.max(axis=0)
    blo, bhi = pb.min(axis=0), pb.max(axis=0)
    gap = np.maximum(0.0, np.maximum(blo - ahi, alo - bhi))
    span = np.maximum(bhi - alo, ahi - blo)
    return float(np.linalg.norm(gap)), float(np.linalg.norm(span))


def gridded_interp(vals, fis, method: str = "cubic"):
    """Separable gridded interpolation of an N-D host array at fractional
    indices — the ``griddedInterpolant(..., 'cubic')`` analog used by the
    eikonal LUT sampling (``UltrasoundSystem.m:4318-4321``) and
    ``Medium.Sampled`` (``Medium.m:465``).

    ``vals``: (N1, ..., Nd) numpy array; ``fis``: list of d fractional
    index arrays (common broadcast shape Q). ``method``: 'nearest' |
    'linear' | 'cubic' (Catmull-Rom; clamp-replicated edge taps).
    Size-1 axes are constant. Returns shape Q (host numpy, float64).
    """
    import numpy as np
    vals = np.asarray(vals)
    d = vals.ndim
    assert len(fis) == d, (len(fis), d)
    if method == "nearest":
        idx = tuple(
            np.clip(np.round(np.asarray(f)).astype(int), 0, n - 1)
            for f, n in zip(fis, vals.shape))
        return vals[idx]

    def taps(f, n):
        """[(index array, weight array), ...] along one axis."""
        f = np.asarray(f, np.float64)
        if n == 1:
            return [(np.zeros(f.shape, int), np.ones(f.shape))]
        i0 = np.floor(f)
        u = f - i0
        i0 = i0.astype(int)
        if method == "linear":
            pairs = [(i0, 1.0 - u), (i0 + 1, u)]
        elif method == "cubic":
            w = (0.5 * (u * (-1.0 + u * (2.0 - u))),
                 0.5 * (2.0 + u * u * (-5.0 + 3.0 * u)),
                 0.5 * (u * (1.0 + u * (4.0 - 3.0 * u))),
                 0.5 * (u * u * (u - 1.0)))
            pairs = [(i0 - 1 + k, w[k]) for k in range(4)]
        else:
            raise ValueError(f"unknown method {method!r}")
        return [(np.clip(i, 0, n - 1), wt) for i, wt in pairs]

    axes = [taps(f, n) for f, n in zip(fis, vals.shape)]
    out = 0.0
    from itertools import product
    for combo in product(*axes):
        idx = tuple(c[0] for c in combo)
        w = 1.0
        for c in combo:
            w = w * c[1]
        out = out + w * vals[idx]
    return out
