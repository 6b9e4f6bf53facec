"""Electron density from LTE ionization equilibrium.

Covers the reference's solve_ne / solve_ne_loc
(src/gas/electron_density.f90:304-579): Newton iteration on
F(ne) = ne - sum_elem A_elem nH sum_j j f_j(ne, T) + n(H-), with the
ionization fractions f_j from a Saha chain over each element's stages.

TPU-native/vectorized: the iteration runs over *all cells at once* as
numpy array ops (this is a setup-time computation, like the reference's
OpenMP cell loop)."""
from __future__ import annotations

import numpy as np

from .. import constants as cst
from .lte import saha_phi
from .atom import E_ION_HMIN, M_ELECTRON

# (weight, abundance n/nH, [chi_1, chi_2] eV, [U_0, U_1, U_2] ground-state
# statistical weights used as partition functions).  Abundances: Asplund
# et al. 2009; ionization energies: NIST.  The reference reads these from
# its abundance + Kurucz pf tables (elements_type.f90); a two-stage chain
# captures the dominant electron donors.
EV = 1.602176634e-19
ELEMENTS = [
    ("H", 1.008, 1.0, [13.598], [2.0, 1.0]),
    ("He", 4.003, 8.51e-2, [24.587, 54.418], [1.0, 2.0, 1.0]),
    ("C", 12.011, 2.69e-4, [11.260, 24.383], [9.0, 6.0, 1.0]),
    ("N", 14.007, 6.76e-5, [14.534, 29.601], [4.0, 9.0, 6.0]),
    ("O", 15.999, 4.90e-4, [13.618, 35.121], [9.0, 4.0, 9.0]),
    ("Na", 22.990, 1.74e-6, [5.139, 47.286], [2.0, 1.0, 6.0]),
    ("Mg", 24.305, 3.98e-5, [7.646, 15.035], [1.0, 2.0, 1.0]),
    ("Al", 26.982, 2.82e-6, [5.986, 18.829], [6.0, 1.0, 2.0]),
    ("Si", 28.085, 3.24e-5, [8.152, 16.346], [9.0, 6.0, 1.0]),
    ("S", 32.06, 1.32e-5, [10.360, 23.338], [9.0, 4.0, 9.0]),
    ("K", 39.098, 1.07e-7, [4.341, 31.625], [2.0, 1.0, 6.0]),
    ("Ca", 40.078, 2.19e-6, [6.113, 11.872], [1.0, 2.0, 1.0]),
    ("Cr", 51.996, 4.37e-7, [6.767, 16.486], [7.0, 6.0, 25.0]),
    ("Fe", 55.845, 3.16e-5, [7.902, 16.199], [25.0, 30.0, 25.0]),
]


def ionization_fractions(T: np.ndarray, ne: np.ndarray):
    """Saha-chain ionization fractions per element.

    Returns dict name -> (C, nstage) fractions."""
    T = np.maximum(np.asarray(T, np.float64), 1.0)
    phi = saha_phi(T)
    out = {}
    for name, _w, _ab, chis, U in ELEMENTS:
        nst = len(chis) + 1
        # cumulative log ratios n_{j+1}/n_j = (U_{j+1}/U_j) e^{-chi/kT}
        #                                   / (ne Phi_T)
        logr = np.zeros((T.shape[0], nst))
        for j, chi in enumerate(chis):
            logr[:, j + 1] = (logr[:, j]
                              + np.log(U[j + 1] / U[j])
                              - chi * EV / (cst.kb * T)
                              - np.log(np.maximum(ne * phi, 1e-300)))
        logr -= logr.max(axis=1, keepdims=True)
        f = np.exp(logr)
        out[name] = f / f.sum(axis=1, keepdims=True)
    return out


def solve_ne(T: np.ndarray, nHtot: np.ndarray, max_iter: int = 100,
             tol: float = 1e-6) -> np.ndarray:
    """Electron density [m^-3] per cell from LTE ionization of H + metals
    including the H- sink (solve_ne_loc, electron_density.f90:304-430).

    Damped fixed-point iteration, vectorized over cells."""
    T = np.maximum(np.asarray(T, np.float64), 1.0)
    nHtot = np.asarray(nHtot, np.float64)
    kT = cst.kb * T

    # start from the metal floor + pure-H Saha quadratic
    phi = saha_phi(T)
    SH = np.exp(np.minimum(np.log(1.0 / 2.0) - 13.598 * EV / kT
                           - np.log(np.maximum(phi, 1e-300)), 600.0))
    # ne^2 + SH ne - SH nH = 0
    ne = 0.5 * (-SH + np.sqrt(SH ** 2 + 4.0 * SH * nHtot))
    ne = np.maximum(ne, 1e-4 * nHtot * 2.69e-4)   # ~ C fully ionized floor

    phi_hmin = 0.25 * (cst.hp ** 2 / (2.0 * np.pi * M_ELECTRON * cst.kb
                                      * T)) ** 1.5 \
        * np.exp(np.minimum(E_ION_HMIN / kT, 600.0))

    for _ in range(max_iter):
        fr = ionization_fractions(T, ne)
        ne_new = np.zeros_like(ne)
        for name, _w, ab, chis, _u in ELEMENTS:
            f = fr[name]
            stages = np.arange(f.shape[1])
            ne_new += ab * nHtot * (f * stages[None, :]).sum(axis=1)
        # H- sink: ne_new -= n(H-)
        nH1 = nHtot * fr["H"][:, 0]
        ne_new = ne_new - ne * nH1 * phi_hmin
        ne_new = np.maximum(ne_new, 1e-30)
        # geometric damping for stability
        ne_next = np.sqrt(ne * ne_new)
        rel = np.max(np.abs(ne_next - ne) / np.maximum(ne, 1e-30))
        ne = ne_next
        if rel < tol:
            break
    return ne


def solve_ne_nlte(T: np.ndarray, nHtot: np.ndarray, elem: str,
                  n_elec_model: np.ndarray, ne0: np.ndarray | None = None,
                  max_iter: int = 100, tol: float = 1e-6) -> np.ndarray:
    """Electron density with the NLTE ionization of ``elem`` imposed:
    its LTE (Saha) contribution is replaced by ``n_elec_model`` — the
    per-cell free electrons implied by the model atom's actual ion
    populations.  This is the ne re-iteration of the MALI loop
    (-iterate_ne, atom_transfer.f90:155-165 + solve_ne re-entry)."""
    T = np.maximum(np.asarray(T, np.float64), 1.0)
    nHtot = np.asarray(nHtot, np.float64)
    n_elec_model = np.asarray(n_elec_model, np.float64)
    ne = np.asarray(ne0, np.float64).copy() if ne0 is not None \
        else solve_ne(T, nHtot)
    elem = elem.upper()

    phi_hmin = 0.25 * (cst.hp ** 2 / (2.0 * np.pi * M_ELECTRON * cst.kb
                                      * T)) ** 1.5 \
        * np.exp(np.minimum(E_ION_HMIN / (cst.kb * T), 600.0))

    for _ in range(max_iter):
        fr = ionization_fractions(T, ne)
        ne_new = n_elec_model.copy()
        for name, _w, ab, chis, _u in ELEMENTS:
            if name.upper() == elem:
                continue                      # NLTE element imposed above
            f = fr[name]
            stages = np.arange(f.shape[1])
            ne_new += ab * nHtot * (f * stages[None, :]).sum(axis=1)
        if elem != "H":
            nH1 = nHtot * fr["H"][:, 0]
            ne_new = ne_new - ne * nH1 * phi_hmin
        ne_new = np.maximum(ne_new, 1e-30)
        ne_next = np.sqrt(ne * ne_new)
        rel = np.max(np.abs(ne_next - ne) / np.maximum(ne, 1e-30))
        ne = ne_next
        if rel < tol:
            break
    return ne
