"""Statistical equilibrium for atoms: collision rates + batched SEE solve.

Covers the reference's see_atom / rate_matrix (src/gas/see.f90:320-520)
and the collision-rate assembly (collision_atom.f90): the rate matrix
Gamma per cell is built from radiative (MALI-preconditioned) and
collisional rates; the row of the most-populated level is replaced by
particle conservation (Hubeny & Mihalas eq. 14.8); all cells solve in one
batched numpy linear solve (the reference does a per-cell LU inside an
OpenMP loop)."""
from __future__ import annotations

import numpy as np

from .. import constants as cst
from .atom import (AtomModel, E_RYDBERG, M_ELECTRON, A_BOHR,
                   johnson_ce, johnson_ci)

# RH's C0 for OMEGA data: (E_Ryd/sqrt(m_e)) pi a0^2 sqrt(8/(pi k_B))
C0_OMEGA = (E_RYDBERG / np.sqrt(M_ELECTRON)) * np.pi * A_BOHR ** 2 \
    * np.sqrt(8.0 / (np.pi * cst.kb))


def collision_matrix(atom: AtomModel, T: np.ndarray, ne: np.ndarray,
                     nstar: np.ndarray) -> np.ndarray:
    """Per-cell collisional rates Cmat[c, i, j] = C(i -> j) [1/s]
    for all level pairs (collision_rates_atom_loc,
    collision_atom.f90:29-84 for H; :860-900 for file data).

    Downward rates follow from detailed balance with the LTE ratio
    nstar_i/nstar_j (so three-body recombination carries its ne^2)."""
    C = T.shape[0]
    N = atom.n_levels
    T = np.maximum(np.asarray(T, np.float64), 1.0)
    Cmat = np.zeros((C, N, N))
    ratio = np.maximum(nstar, 1e-300)

    if atom.johnson_collisions:
        nb = N - 1
        CE = johnson_ce(T, N, atom.weight)           # (C, nb, nb) m^3/s up
        CI = johnson_ci(T, N, atom.weight)           # (C, nb)
        for i in range(nb):
            for j in range(i + 1, nb):
                cup = ne * CE[:, i, j]
                Cmat[:, i, j] += cup
                Cmat[:, j, i] += cup * ratio[:, i] / ratio[:, j]
            cup = ne * CI[:, i]
            Cmat[:, i, N - 1] += cup
            Cmat[:, N - 1, i] += cup * ratio[:, i] / ratio[:, N - 1]

    for tab in atom.collisions:
        i, j = tab.i, tab.j
        cc = np.interp(T, tab.temps, tab.rates)
        if tab.kind == "OMEGA":       # ions: Cdown = C0 ne Omega/(gj sqrtT)
            cdown = C0_OMEGA * ne * cc / (atom.g[j] * np.sqrt(T))
            cup = cdown * ratio[:, j] / ratio[:, i]
        elif tab.kind == "CE":        # neutrals: Cdown = CC ne gi/gj sqrtT
            cdown = cc * ne * (atom.g[i] / atom.g[j]) * np.sqrt(T)
            cup = cdown * ratio[:, j] / ratio[:, i]
        elif tab.kind == "CI":        # ionization: Cup = CC ne e^-dE/kT sqrtT
            dE = atom.E[j] - atom.E[i]
            cup = cc * ne * np.exp(-dE / (cst.kb * T)) * np.sqrt(T)
            cdown = cup * ratio[:, i] / ratio[:, j]
        else:
            continue
        Cmat[:, i, j] += cup
        Cmat[:, j, i] += cdown
    return Cmat


def solve_see(atom: AtomModel, ntot: np.ndarray, Cmat: np.ndarray,
              Rline_ij: np.ndarray, Rline_ji: np.ndarray,
              Rcont_ij: np.ndarray, Rcont_ji: np.ndarray,
              pops_old: np.ndarray):
    """Batched SEE solve.  Rates: (C, L) and (C, K) arrays of i->j (up)
    and j->i (down) radiative rates.  Returns (pops (C, N), max rel
    change) (see_atom, see.f90:320-460)."""
    C, N = pops_old.shape
    M = np.zeros((C, N, N))

    def add(i, j, rate_up, rate_down):
        # dn_j/dt += n_i Rup ; dn_i/dt += n_j Rdown
        M[:, j, i] += rate_up
        M[:, i, i] -= rate_up
        M[:, i, j] += rate_down
        M[:, j, j] -= rate_down

    for k in range(atom.n_lines):
        add(atom.line_i[k], atom.line_j[k], Rline_ij[:, k], Rline_ji[:, k])
    for k in range(atom.n_cont):
        add(atom.cont_i[k], atom.cont_j[k], Rcont_ij[:, k], Rcont_ji[:, k])
    for i in range(N):
        for j in range(N):
            if i != j:
                add(i, j, Cmat[:, i, j], 0.0 * Cmat[:, i, j])

    # levels with no coupling at all (e.g. a continuum with all rates
    # zero) would make the system singular: pin them to zero population
    coupling = np.abs(M).sum(1) + np.abs(M).sum(2)      # (C, N)
    decoupled = coupling <= 0.0
    idx_c, idx_l = np.nonzero(decoupled)
    M[idx_c, idx_l, idx_l] = 1.0

    # conservation replaces the row of the most-populated level
    imax = np.argmax(pops_old, axis=1)
    M[np.arange(C), imax, :] = 1.0
    b = np.zeros((C, N))
    b[np.arange(C), imax] = ntot
    pops = np.linalg.solve(M, b[..., None])[..., 0]
    pops = np.abs(pops)                  # clamp tiny negatives (see.f90:430)
    pops = np.maximum(pops, 1e-30 * ntot[:, None])

    mask = pops_old > 1e-15 * ntot[:, None]
    rel = np.abs(pops - pops_old) / np.maximum(pops_old, 1e-300)
    dM = rel[mask].max() if mask.any() else 0.0
    return pops, dM
