"""Background gas continuum opacities.

Covers the reference's gas/gas_contopac.f90 (background_continua_lambda):
Thomson scattering, H- bound-free and free-free (John 1988 A&A 193, 189
fits), hydrogen free-free (hydrogenic Kramers with Gaunt factor), and
Rayleigh scattering by neutral H (Dalgarno 1962 expansion).

All functions are vectorized over (cells, wavelengths) numpy arrays and
return opacities in m^-1 (converted to AU^-1 by the caller for the ray
integrator)."""
from __future__ import annotations

import numpy as np

from .. import constants as cst
from .atom import SIGMA_THOMSON

# John (1988) H- bound-free cross-section fit coefficients (table 1);
# sigma in 1e-18 cm^2, lambda in um, valid 0.125 < lambda < 1.6419 um
_JOHN_BF_C = np.array([152.519, 49.534, -118.858, 92.536, -34.194, 4.982])
_LAMBDA0_HMIN = 1.6419      # um, photodetachment threshold

# John (1988) H- free-free fit coefficients (table 3a), lambda > 0.3645 um
_JOHN_FF_A = np.array([
    [0.0, 2483.346, -3449.889, 2200.040, -696.271, 88.283],
    [0.0, 285.827, -1158.382, 2427.719, -1841.400, 444.517],
    [0.0, -2054.291, 8746.523, -13651.105, 8624.970, -1863.864],
    [0.0, 2827.776, -11485.632, 16755.524, -10051.530, 2095.288],
    [0.0, -1341.537, 5303.609, -7510.494, 4400.067, -901.788],
    [0.0, 208.952, -812.939, 1132.738, -655.020, 132.985]])


def hminus_bf_sigma(lam_um: np.ndarray) -> np.ndarray:
    """H- photodetachment cross-section [m^2] (John 1988 eq. 4)."""
    lam = np.asarray(lam_um, np.float64)
    x = np.maximum(1.0 / lam - 1.0 / _LAMBDA0_HMIN, 0.0)
    f = np.zeros_like(lam)
    for n in range(6):
        f = f + _JOHN_BF_C[n] * x ** (n / 2.0)
    sig = 1e-18 * lam ** 3 * x ** 1.5 * f          # cm^2
    return np.where((lam > 0.125) & (lam < _LAMBDA0_HMIN),
                    sig * 1e-4, 0.0)


def hminus_bf(lam_um, T, ne, nhmin):
    """H- b-f opacity [m^-1] with stimulated-emission correction:
    chi = n(H-) sigma (1 - e^(-hnu/kT))."""
    nu = cst.c_light / (np.asarray(lam_um) * 1e-6)
    stim = 1.0 - np.exp(-cst.hp * nu[None, :]
                        / (cst.kb * np.maximum(T, 1.0))[:, None])
    return nhmin[:, None] * hminus_bf_sigma(lam_um)[None, :] * stim


def hminus_ff(lam_um, T, ne, nH1):
    """H- f-f opacity [m^-1] (John 1988 eq. 6): kappa per unit electron
    pressure per neutral H atom, summed fit."""
    lam = np.maximum(np.asarray(lam_um, np.float64), 0.3645)
    T = np.maximum(np.asarray(T, np.float64), 1.0)
    th = 5040.0 / T                                  # (C,)
    k = np.zeros((T.shape[0], lam.shape[0]))
    for n in range(6):
        cn = (_JOHN_FF_A[n, 1] * lam ** 2 + _JOHN_FF_A[n, 2]
              + _JOHN_FF_A[n, 3] / lam + _JOHN_FF_A[n, 4] / lam ** 2
              + _JOHN_FF_A[n, 5] / lam ** 3)
        k = k + th[:, None] ** (1.0 + n / 2.0) * cn[None, :]
    # k in 1e-29 cm^4/dyn; kappa = k * pe * nH1  (pe in dyn/cm^2,
    # nH1 in cm^-3) -> cm^-1
    pe = ne * 1e-6 * 1.380649e-16 * T                # dyn/cm^2
    kappa_cm = 1e-29 * k * pe[:, None] * (nH1 * 1e-6)[:, None]
    return np.maximum(kappa_cm, 0.0) * 1e2           # m^-1


def hydrogen_ff(lam_um, T, ne, nion):
    """Hydrogenic free-free opacity [m^-1] (Kramers with g_ff ~ 1 + ...;
    Mihalas 1978 eq. 4-116): chi = 3.692e8 gff Z^2 T^-1/2 nu^-3 ne ni
    (1 - e^-hnu/kT) in cgs."""
    lam = np.asarray(lam_um, np.float64)
    nu = cst.c_light / (lam * 1e-6)
    T = np.maximum(np.asarray(T, np.float64), 1.0)
    x = cst.hp * nu[None, :] / (cst.kb * T[:, None])
    gff = 1.1          # flat Gaunt-factor approximation (Gray 2005 ch. 8)
    chi_cgs = (3.692e8 * gff / np.sqrt(T)[:, None] / nu[None, :] ** 3
               * (ne * 1e-6)[:, None] * (nion * 1e-6)[:, None]
               * (1.0 - np.exp(-x)))
    return np.maximum(chi_cgs, 0.0) * 1e2            # m^-1


def rayleigh_H(lam_um, nH1):
    """Rayleigh scattering off neutral H [m^-1] (Dalgarno 1962 fit as
    used in stellar-atmosphere codes): sigma(lambda) with lambda in A."""
    lam_A = np.asarray(lam_um, np.float64) * 1e4
    lam_A = np.maximum(lam_A, 1300.0)
    sig_cm2 = (5.799e-13 / lam_A ** 4 + 1.422e-6 / lam_A ** 6
               + 2.784 / lam_A ** 8)
    return nH1[:, None] * (sig_cm2 * 1e-4)[None, :]


def thomson(ne):
    """Thomson scattering opacity [m^-1] per cell (achromatic)."""
    return ne * SIGMA_THOMSON


def background_continuum(lam_um: np.ndarray, T: np.ndarray,
                         ne: np.ndarray, nH1: np.ndarray,
                         nprot: np.ndarray, nhmin: np.ndarray):
    """Total background gas continuum (background_continua_lambda,
    gas_contopac.f90): returns (chi_abs (C, W), chi_sca (C, W)) in m^-1.
    Thermal emissivity follows as chi_abs * B_nu (LTE)."""
    chi_abs = (hminus_bf(lam_um, T, ne, nhmin)
               + hminus_ff(lam_um, T, ne, nH1)
               + hydrogen_ff(lam_um, T, ne, nprot))
    chi_sca = rayleigh_H(lam_um, nH1) + thomson(ne)[:, None]
    return chi_abs, chi_sca
