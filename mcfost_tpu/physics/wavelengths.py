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


def mono_wavelength_grid(lam0: float) -> WavelengthGrid:
    """Single-wavelength grid for image mode (reference: wavelengths.f90:41-45)."""
    a = np.array([lam0])
    return WavelengthGrid(lam=a, lam_inf=a.copy(), lam_sup=a.copy(),
                          dlam=np.array([1.0]))
