"""HEALPix RING-scheme pixel directions (Gorski et al. 2005).

The reference uses HEALPix pixel centres as the fixed ray set of the
MALI step-1 loop (healpix_sphere, src/healpix_mod.f90:20; lorder CLI
flag, init_mcfost.f90 -healpix_lorder).  Only the pixel-centre
directions (and the uniform weights 4pi/npix that come with an
equal-area pixelisation) are needed, so this is a compact closed-form
implementation of the RING-scheme centre formulas — no neighbour or
map machinery.
"""
from __future__ import annotations

import numpy as np


def healpix_npix(nside: int) -> int:
    return 12 * nside * nside


def healpix_ring_directions(nside: int) -> np.ndarray:
    """Unit vectors of all 12*nside^2 RING-ordered pixel centres, (npix, 3).

    Equal-area: each direction carries solid angle 4*pi/npix, so angular
    quadrature is a plain mean over pixels.
    """
    if nside < 1 or (nside & (nside - 1)) != 0:
        raise ValueError("nside must be a positive power of 2")
    n = nside
    npix = healpix_npix(n)
    ncap = 2 * n * (n - 1)          # pixels in the north polar cap
    p = np.arange(npix)

    z = np.empty(npix)
    phi = np.empty(npix)

    # --- north polar cap: rings i = 1..n-1 with 4i pixels each
    cap = p < ncap
    ph = (p[cap] + 1) / 2.0
    i = np.floor(np.sqrt(ph - np.sqrt(np.floor(ph)))).astype(int) + 1
    j = p[cap] + 1 - 2 * i * (i - 1)
    z[cap] = 1.0 - i ** 2 / (3.0 * n ** 2)
    phi[cap] = (np.pi / (2.0 * i)) * (j - 0.5)

    # --- equatorial belt: rings i = n..3n with 4n pixels each
    eq = (p >= ncap) & (p < npix - ncap)
    pp = p[eq] - ncap
    i = pp // (4 * n) + n
    j = pp % (4 * n) + 1
    s = (i - n + 1) % 2              # ring-dependent half-pixel shift
    z[eq] = 4.0 / 3.0 - 2.0 * i / (3.0 * n)
    phi[eq] = (np.pi / (2.0 * n)) * (j - s / 2.0)

    # --- south polar cap: mirror of the north cap
    sc = p >= npix - ncap
    q = npix - 1 - p[sc]
    ph = (q + 1) / 2.0
    i = np.floor(np.sqrt(ph - np.sqrt(np.floor(ph)))).astype(int) + 1
    j = q + 1 - 2 * i * (i - 1)
    z[sc] = -(1.0 - i ** 2 / (3.0 * n ** 2))
    # mirrored pixels run backwards around the ring
    phi[sc] = (np.pi / (2.0 * i)) * (4 * i - j + 0.5)

    st = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return np.stack([st * np.cos(phi), st * np.sin(phi), z], axis=1)
