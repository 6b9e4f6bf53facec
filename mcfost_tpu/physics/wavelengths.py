"""Wavelength grids.

Log-spaced wavelength table with bin edges, mirroring the semantics of the
reference (src/wavelengths.f90:24-70): ``delta = (lmax/lmin)^(1/n)``,
``lambda_1 = lmin*sqrt(delta)``, ``lambda_i = lambda_{i-1}*delta``.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class WavelengthGrid:
    lam: np.ndarray        # bin centres [micron], (n,)
    lam_inf: np.ndarray    # lower edges [micron]
    lam_sup: np.ndarray    # upper edges [micron]
    dlam: np.ndarray       # bin widths [micron]

    @property
    def n(self) -> int:
        return len(self.lam)


def log_wavelength_grid(n_lambda: int, lambda_min: float,
                        lambda_max: float) -> WavelengthGrid:
    delta = np.exp(np.log(lambda_max / lambda_min) / n_lambda)
    i = np.arange(n_lambda)
    lam_inf = lambda_min * delta ** i
    lam_sup = lam_inf * delta
    lam = lambda_min * np.sqrt(delta) * delta ** i
    return WavelengthGrid(lam=lam, lam_inf=lam_inf, lam_sup=lam_sup,
                          dlam=lam_sup - lam_inf)


def file_wavelength_grid(lams: np.ndarray) -> WavelengthGrid:
    """Observation grid from an explicit wavelength list (the reference's
    lambda-file input: lect_lambda, input.f90:520-600; used for step 2 when
    'use default wavelength grid' is F).  Bin edges at log midpoints."""
    lam = np.sort(np.asarray(lams, np.float64).reshape(-1))
    logl = np.log(lam)
    mid = 0.5 * (logl[1:] + logl[:-1])
    lam_inf = np.exp(np.concatenate([[logl[0] - (mid[0] - logl[0])
                                      if len(lam) > 1 else logl[0] - 0.05],
                                     mid]))
    lam_sup = np.exp(np.concatenate([mid,
                                     [logl[-1] + (logl[-1] - mid[-1])
                                      if len(lam) > 1 else logl[-1] + 0.05]]))
    return WavelengthGrid(lam=lam, lam_inf=lam_inf, lam_sup=lam_sup,
                          dlam=lam_sup - lam_inf)


def read_lambda_file(path: str) -> np.ndarray:
    """Wavelength list file: one lambda [micron] per line."""
    return np.loadtxt(path, usecols=0, ndmin=1)


def mono_wavelength_grid(lam0: float) -> WavelengthGrid:
    """Single-wavelength grid for image mode (reference: wavelengths.f90:41-45)."""
    a = np.array([lam0])
    return WavelengthGrid(lam=a, lam_inf=a.copy(), lam_sup=a.copy(),
                          dlam=np.array([1.0]))
