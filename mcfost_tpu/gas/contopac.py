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


_RYDBERG_EV = 13.605693


def gaunt_bf(u, n_eff):
    """Bound-free Gaunt factor (Seaton 1960; reference Gaunt_bf,
    gas_contopac.f90:338-355).  u = n_eff^2 h nu / (Z^2 Ry) - 1."""
    g = (1.0 + 0.1728 * n_eff ** (-2.0 / 3.0) * (u + 1.0) ** (-2.0 / 3.0)
         * (u - 1.0)
         - 0.0496 * n_eff ** (-4.0 / 3.0) * (u + 1.0) ** (-4.0 / 3.0)
         * (u * u + 4.0 / 3.0 * u + 1.0))
    g = np.where(g < 0.0, 0.0, g)
    return np.where(g > 2.0, 1.0, g)


def hydrogenic_bf_sigma(lam_um, n_eff, Z=1.0):
    """Hydrogenic photoionization cross-section [m^2] with the Seaton
    Gaunt factor (reference H_bf_Xsection, gas_contopac.f90:380-412):
    alpha = 2.815e25 Z^4 g_bf / n_eff^5 / nu^3."""
    lam = np.asarray(lam_um, np.float64)
    nu = cst.c_light / (lam * 1e-6)
    hnu_eV = cst.hp * nu / 1.602176634e-19
    u = n_eff ** 2 * hnu_eV / (Z * Z * _RYDBERG_EV) - 1.0
    g = gaunt_bf(u, np.asarray(n_eff, np.float64))
    return 2.815e25 * Z ** 4 * g / n_eff ** 5 / nu ** 3


def wocc_n(T, ne, n_eff, Zr=1.0, nH1=None, Zp=1.0):
    """Occupation probability of level n_eff (Hummer & Mihalas 1988
    eq. 4.71; reference wocc_n, occupation_probability.f90:25-90).

    Vectorized over cells; n_eff may be scalar or broadcastable.
    Accounts for neutral (ground-state H) and charged (singly-ionized,
    n_p = ne) perturbers."""
    T = np.maximum(np.asarray(T, np.float64), 1.0)
    ne = np.maximum(np.asarray(ne, np.float64), 1e-10)
    n = np.asarray(n_eff, np.float64)
    RBOHR = 5.29177210903e-11                        # m
    a0fourpi3 = (4.0 / 3.0) * np.pi * RBOHR ** 3
    # <r^2> of orbital (n, l=0, Z): n^2 (5 n^2 + 1) / (2 Z^2) a0^2
    r1 = np.sqrt(n * n * (5.0 * n * n + 1.0) / 2.0) / Zr    # / a0
    rp1 = np.sqrt(1.0 * (5.0 + 1.0) / 2.0)                  # H ground
    npop1 = np.zeros_like(T) if nH1 is None \
        else np.asarray(nH1, np.float64)
    # radii are in units of a0; a0fourpi3 carries the a0^3 volume factor
    w_neutr = np.exp(-a0fourpi3 * npop1 * (r1 + rp1) ** 3)
    # charged perturbers (H&M 4.71 via Hubeny & Mihalas ch. 9)
    k = np.where(n <= 3.0, 1.0, 16.0 / 3.0 * n / (n + 1.0) ** 2)
    betac = 1e4 * 8.3e14 * ne ** (-2.0 / 3.0) * Zp ** 3 * k / n ** 4
    a = 0.1 * 0.09 * ne ** (1.0 / 6.0) / np.sqrt(T)
    x = (1.0 + a) ** 3.15
    c1, c2 = 0.1402, 0.1285
    f = c1 * (x + 4.0 * Zr * a ** 3) * betac ** 3 \
        / (1.0 + c2 * x * np.sqrt(betac ** 3))
    w_ion = f / (1.0 + f)
    return w_neutr * w_ion


def dissolve_fraction(lam_um, T, ne, nH1, n_eff, chi0_eV, lambda0_um,
                      Zr=1.0):
    """Pseudo-continuum dissolve fraction redward of a bf edge
    (Daeppen, Anderson & Mihalas 1987; reference f_dissolve,
    occupation_probability.f90:92-130): for lambda > lambda0 the edge
    continues with weight 1 - w(m')/w(n), m' the effective level that
    an absorbed photon of that energy can reach.  Returns (C, W)."""
    lam = np.asarray(lam_um, np.float64)
    hnu_eV = cst.hp * cst.c_light / (lam * 1e-6) / 1.602176634e-19
    Zsq = (Zr + 1.0) ** 2
    m = 1.0 / n_eff ** 2 - hnu_eV / (chi0_eV * Zsq)
    with np.errstate(divide="ignore", invalid="ignore"):
        mp = 1.0 / np.sqrt(np.abs(m))
    w1 = wocc_n(T, ne, n_eff, Zr=Zr, nH1=nH1)            # (C,)
    fd = np.ones((T.shape[0], lam.shape[0]))
    red = (lam > lambda0_um) & (m > 0.0)
    if np.any(red):
        # w(m') varies per wavelength: vectorize over the red points
        idx = np.where(red)[0]
        for j in idx:
            wm = wocc_n(T, ne, float(mp[j]), Zr=Zr, nH1=nH1)
            fd[:, j] = 1.0 - wm / np.maximum(w1, 1e-300)
    return np.clip(fd, 0.0, 1.0)


def metal_bf(lam_um, T, ne, nHtot):
    """Background metal bound-free opacity [m^-1]: LTE neutral
    ground-state populations of the dominant electron donors
    (gas/electron.ELEMENTS) photoionizing through the hydrogenic
    cross-section with n_eff = sqrt(Ry/chi_ion) — the reference
    computes exactly this through its passive-atom continua
    (H_bf_Xsection for non-H atoms, gas_contopac.f90:388-395)."""
    from .electron import ELEMENTS, ionization_fractions
    lam = np.asarray(lam_um, np.float64)
    nu = cst.c_light / (lam * 1e-6)
    T = np.maximum(np.asarray(T, np.float64), 1.0)
    stim = 1.0 - np.exp(-cst.hp * nu[None, :] / (cst.kb * T[:, None]))
    fr = ionization_fractions(T, np.maximum(ne, 1e-10))
    chi = np.zeros((T.shape[0], lam.shape[0]))
    for name, _w, ab, chis, _u in ELEMENTS:
        if name in ("H", "He"):
            continue
        chi_ion = chis[0]
        lam0 = cst.hp * cst.c_light / (chi_ion * 1.602176634e-19) * 1e6
        sel = lam < lam0
        if not np.any(sel):
            continue
        n_eff = np.sqrt(_RYDBERG_EV / chi_ion)
        sig = hydrogenic_bf_sigma(lam[sel], n_eff)       # m^2
        n0 = nHtot * ab * fr[name][:, 0]                 # neutral pop
        chi[:, sel] += n0[:, None] * sig[None, :] * stim[:, sel]
    return chi


def background_continuum(lam_um: np.ndarray, T: np.ndarray,
                         ne: np.ndarray, nH1: np.ndarray,
                         nprot: np.ndarray, nhmin: np.ndarray,
                         nHtot: np.ndarray | None = None):
    """Total background gas continuum (background_continua_lambda,
    gas_contopac.f90): returns (chi_abs (C, W), chi_sca (C, W)) in m^-1.
    Thermal emissivity follows as chi_abs * B_nu (LTE).

    nHtot (optional) switches on the metal bound-free background
    (the reference carries metal bf through its passive atoms); the
    modeled atom's own bf (with Gaunt factor + level dissolution) is
    added by the caller from its actual populations."""
    chi_abs = (hminus_bf(lam_um, T, ne, nhmin)
               + hminus_ff(lam_um, T, ne, nH1)
               + hydrogen_ff(lam_um, T, ne, nprot))
    if nHtot is not None:
        chi_abs = chi_abs + metal_bf(lam_um, T, ne, nHtot)
    chi_sca = rayleigh_H(lam_um, nH1) + thomson(ne)[:, None]
    return chi_abs, chi_sca
