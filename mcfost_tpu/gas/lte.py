"""LTE (Saha-Boltzmann) level populations and H-.

Covers the reference's ltepops_atoms / LTEpops_atom_loc
(src/gas/lte.f90:120-405) and nH_minus (lte.f90:79): combined
Saha-Boltzmann weights w_i = g_i exp(-E_i/kT) (ne Phi_T)^(-stage_i)
normalized to the element's total number density, vectorized over all
cells at once.
"""
from __future__ import annotations

import numpy as np

from .. import constants as cst
from .atom import AtomModel, E_ION_HMIN, M_ELECTRON


def saha_phi(T: np.ndarray) -> np.ndarray:
    """Phi_T = (1/2) (h^2 / (2 pi m_e k T))^(3/2)  [m^3].

    The Saha relation reads n_(s+1) ne / n_s =
    (g_(s+1)/g_s) exp(-chi/kT) / Phi_T  (Hubeny & Mihalas eq. 4.35,
    reference phi_jl, lte.f90)."""
    deb = cst.hp ** 2 / (2.0 * np.pi * M_ELECTRON * cst.kb
                         * np.maximum(T, 1.0))
    return 0.5 * deb ** 1.5


def lte_pops(atom: AtomModel, T: np.ndarray, ne: np.ndarray,
             ntot: np.ndarray) -> np.ndarray:
    """LTE populations (C, N) for all cells.

    T, ne [m^-3], ntot [m^-3] are flat per-cell arrays; ntot is the total
    element number density (all stages)."""
    T = np.maximum(np.asarray(T, np.float64), 1.0)
    kT = cst.kb * T
    phi = saha_phi(T)
    ne_phi = np.maximum(ne * phi, 1e-300)
    # weights relative to the ground level, in log space for stability
    logw = (np.log(atom.g)[None, :]
            - atom.E[None, :] / kT[:, None]
            - atom.stage[None, :] * np.log(ne_phi)[:, None])
    logw -= logw.max(axis=1, keepdims=True)
    w = np.exp(logw)
    return ntot[:, None] * w / w.sum(axis=1, keepdims=True)


def nh_minus(T: np.ndarray, ne: np.ndarray,
             nH1: np.ndarray) -> np.ndarray:
    """H- number density from Saha against neutral-H ground level
    (nH_minus, lte.f90:79; PhiHmin in solve_ne, electron_density.f90):
    n(H-) = ne * n(H I, n=1) * (gH-/2 gH1) (h^2/2 pi m kT)^(3/2)
    exp(E_a/kT), with g(H-)=1, g(H I)=2."""
    T = np.maximum(np.asarray(T, np.float64), 1.0)
    phi_hmin = 0.25 * (cst.hp ** 2 / (2.0 * np.pi * M_ELECTRON * cst.kb
                                      * T)) ** 1.5 \
        * np.exp(np.minimum(E_ION_HMIN / (cst.kb * T), 600.0))
    # in cold gas the LTE Saha factor diverges; H- can never exceed the
    # available neutral hydrogen or free electrons
    return np.minimum(ne * nH1 * phi_hmin, np.minimum(nH1, ne))
