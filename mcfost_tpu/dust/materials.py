"""Optical-index (n, k) providers.

Two sources, mirroring the reference's data model (docs/input.rst:22-115):

* ``read_optical_indices_file``: the reference's ``Dust/`` table format —
  comment lines, a 2-value header (density [g/cm^3], sublimation T [K]),
  then three columns (lambda [micron], n, k) (consumed by
  src/dust_prop.f90:226-455).
* ``builtin_astrosil``: an *approximate* built-in astronomical-silicate-like
  material used when no data directory is available (this environment has no
  network access to `mcfost -setup` data).  The table reproduces the
  qualitative behaviour of astronomical silicate — strong UV absorption,
  near-transparent visible/NIR, the 9.7 and 18 micron Si-O features, and a
  far-IR opacity falling roughly as lambda^-2 — but is NOT Draine's data;
  swap in real index files for production work.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Material:
    name: str
    rho: float           # bulk density [g/cm^3]
    t_sub: float         # sublimation temperature [K]
    lam: np.ndarray      # [micron], increasing
    n: np.ndarray
    k: np.ndarray

    def m_at(self, lam: np.ndarray) -> np.ndarray:
        """Complex refractive index interpolated (log-log) at wavelengths."""
        ll = np.log(lam)
        n = np.exp(np.interp(ll, np.log(self.lam), np.log(self.n)))
        k = np.exp(np.interp(ll, np.log(self.lam), np.log(np.maximum(self.k, 1e-10))))
        return n + 1j * k


_ASTROSIL_TABLE = np.array([
    # lam[um]   n       k
    [0.020, 0.80, 0.65],
    [0.050, 0.90, 1.00],
    [0.100, 1.05, 1.10],
    [0.200, 1.45, 0.75],
    [0.300, 1.70, 0.35],
    [0.550, 1.72, 0.030],
    [1.000, 1.70, 0.015],
    [2.000, 1.68, 0.010],
    [5.000, 1.65, 0.020],
    [8.000, 1.30, 0.30],
    [9.700, 1.90, 2.20],
    [11.00, 2.50, 1.00],
    [13.00, 2.20, 0.35],
    [18.00, 1.95, 1.10],
    [25.00, 2.60, 0.70],
    [60.00, 3.20, 0.25],
    [100.0, 3.30, 0.14],
    [300.0, 3.40, 0.045],
    [1000., 3.40, 0.013],
    [3000., 3.40, 0.0042],
])


def builtin_astrosil() -> Material:
    t = _ASTROSIL_TABLE
    return Material(name="builtin_astrosil", rho=3.5, t_sub=1500.0,
                    lam=t[:, 0], n=t[:, 1], k=t[:, 2])


def read_optical_indices_file(path: str) -> Material:
    """Read the reference's Dust/ optical-index format
    (docs/input.rst:22-60): comments (# lines), 2-value header
    (density, T_sub), then lambda/n/k columns (either order of lambda)."""
    rows = []
    header = None
    with open(path) as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#") or s.startswith("!"):
                continue
            toks = s.split()
            if header is None:
                header = (float(toks[0]), float(toks[1]))
                continue
            rows.append([float(x) for x in toks[:3]])
    arr = np.array(rows)
    if arr[0, 0] > arr[-1, 0]:
        arr = arr[::-1]
    return Material(name=os.path.basename(path), rho=header[0],
                    t_sub=header[1], lam=arr[:, 0], n=arr[:, 1], k=arr[:, 2])


def get_material(filename: str, data_dir: str | None = None) -> Material:
    """Resolve a material by the filename given in the parameter file.

    Search order mirrors the reference (docs/input.rst:1-20): working dir,
    then data_dir; falls back to the built-in silicate when unavailable."""
    for base in filter(None, [".", data_dir,
                              os.environ.get("MCFOST_UTILS"),
                              os.path.join(os.environ.get("MCFOST_UTILS", ""), "Dust")]):
        p = os.path.join(base, filename)
        if os.path.isfile(p):
            try:
                return read_optical_indices_file(p)
            except (ValueError, IndexError):
                # not an (n,k) indices file — likely a tabulated Q table
                # (handled by dust.opacity_files); bulk properties fall
                # back to the built-in grain density
                return builtin_astrosil()
    return builtin_astrosil()


def bruggeman_emt(materials, volume_fracs, lam, porosity=0.0):
    """Bruggeman effective-medium mixing of several components (+ vacuum
    porosity), as the reference's Bruggeman_EMT (src/dust_prop.f90:455-540).

    Solves sum_i f_i (eps_i - eps_eff)/(eps_i + 2 eps_eff) = 0 by fixed-point
    iteration at each wavelength."""
    fracs = np.asarray(volume_fracs, dtype=float)
    fracs = fracs / fracs.sum() * (1.0 - porosity)
    eps = [m.m_at(lam) ** 2 for m in materials]
    if porosity > 0:
        eps.append(np.ones_like(eps[0]))
        fracs = np.append(fracs, porosity)
    eps = np.stack(eps)            # (C, L)
    eps_eff = (fracs[:, None] * eps).sum(0)   # volume-average start
    for _ in range(200):
        num = (fracs[:, None] * eps / (eps + 2 * eps_eff)).sum(0)
        den = (fracs[:, None] / (eps + 2 * eps_eff)).sum(0)
        new = num / den
        if np.max(np.abs(new - eps_eff) / np.abs(eps_eff)) < 1e-12:
            eps_eff = new
            break
        eps_eff = new
    m_eff = np.sqrt(eps_eff)
    # principal branch with positive imaginary part
    m_eff = np.where(m_eff.imag < 0, -m_eff, m_eff)
    return m_eff
