"""ABO (Anstee-Barklem-O'Mara) van der Waals line broadening.

Covers the reference's gas/abo.f90: collisional broadening of neutral
lines by hydrogen using the ABO cross-section parameterisation
(sigma, alpha) — either given per line in the atomic model file
(RH convention: cvdWaals = sigma[a0^2] alpha He1 He2 with sigma > 20)
or interpolated from the published Barklem tables in
$MCFOST_UTILS/Atoms/Barklem_{sp,pd,df}data.dat
(init_Barklem_cross_data, abo.f90:80-152).

Theory (Anstee & O'Mara 1995 MNRAS 276, 859):
  Gamma_vdW = 2 n_H sigma(v0) (4/pi)^(alpha/2) Gamma(2 - alpha/2)
              v0 (vbar/v0)^(1-alpha),   v0 = 1e4 m/s,
  vbar = sqrt(8 k T / pi mu) -> Gamma = K(alpha) T^{(1-alpha)/2} n_H,
exactly the reference's runtime form GvdW = cvdW1 T^(0.5-0.5 alpha) n_HI
after its read-time conversion (get_barklem_cross_data, abo.f90:295-308).
"""
from __future__ import annotations

import math
import os

import numpy as np

from .. import constants as cst

A0 = 5.29177210903e-11        # Bohr radius [m]
V0 = 1.0e4                    # ABO reference velocity [m/s]
AMU = 1.66053906660e-27

# table geometry (abo.f90:20-38)
_TABLES = {
    "sp": ("Barklem_spdata.dat", 21, 18, 1.0, 1.3),
    "pd": ("Barklem_pddata.dat", 18, 18, 1.3, 2.3),
    "df": ("Barklem_dfdata.dat", 18, 18, 2.3, 3.3),
}
_DELTA_NEFF = 0.1


def abo_gamma_coeff(sigma_au, alpha, atom_weight_amu) -> np.ndarray:
    """K such that Gamma_vdW = K * T^{(1-alpha)/2} * n_HI  [SI, rad/s]."""
    sigma_au = np.asarray(sigma_au, np.float64)
    alpha = np.asarray(alpha, np.float64)
    mu = (atom_weight_amu * 1.008) / (atom_weight_amu + 1.008) * AMU
    gam = np.array([math.gamma(2.0 - 0.5 * a) for a in np.atleast_1d(alpha)])
    gam = gam.reshape(np.shape(alpha))
    return (2.0 * sigma_au * A0 ** 2 * (4.0 / np.pi) ** (alpha / 2.0)
            * gam * V0 ** alpha
            * (8.0 * cst.kb / (np.pi * mu)) ** ((1.0 - alpha) / 2.0))


def read_barklem_table(kind: str):
    """(neff1, neff2, cross, alpha) from the Barklem data file, or None
    when $MCFOST_UTILS is absent (abo.f90:80-152: whitespace floats,
    comment lines start with 'c'; first N1 rows cross sections in units
    of 1e4 m/s relative velocity, then N1 rows of alpha)."""
    fname, n1, n2, neff1_0, neff2_0 = _TABLES[kind.lower()]
    base = os.environ.get("MCFOST_UTILS", "")
    path = os.path.join(base, "Atoms", fname)
    if not base or not os.path.isfile(path):
        return None
    vals: list[float] = []
    with open(path) as f:
        for line in f:
            ls = line.strip()
            if not ls or ls.lower().startswith("c"):
                continue
            vals.extend(float(x) for x in ls.split())
    need = 2 * n1 * n2
    if len(vals) < need:
        return None
    arr = np.asarray(vals[:need], np.float64)
    cross = arr[:n1 * n2].reshape(n1, n2)
    alpha = arr[n1 * n2:].reshape(n1, n2)
    neff1 = neff1_0 + _DELTA_NEFF * np.arange(n1)
    neff2 = neff2_0 + _DELTA_NEFF * np.arange(n2)
    return neff1, neff2, cross, alpha


def barklem_sigma_alpha(neff_low: float, neff_up: float, kind: str):
    """Bilinear (sigma[a0^2], alpha) from the Barklem table; None when
    the table is unavailable or the effective quantum numbers fall
    outside it (the reference then reverts to Unsold)."""
    tab = read_barklem_table(kind)
    if tab is None:
        return None
    neff1, neff2, cross, alpha = tab
    x, y = float(neff_low), float(neff_up)
    if not (neff1[0] <= x <= neff1[-1] and neff2[0] <= y <= neff2[-1]):
        return None
    i = min(int((x - neff1[0]) / _DELTA_NEFF), len(neff1) - 2)
    j = min(int((y - neff2[0]) / _DELTA_NEFF), len(neff2) - 2)
    fx = (x - neff1[i]) / _DELTA_NEFF
    fy = (y - neff2[j]) / _DELTA_NEFF

    def bi(t):
        return ((1 - fx) * (1 - fy) * t[i, j] + fx * (1 - fy) * t[i + 1, j]
                + (1 - fx) * fy * t[i, j + 1] + fx * fy * t[i + 1, j + 1])
    return bi(cross), bi(alpha)
