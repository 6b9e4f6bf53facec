"""Non-equilibrium (stochastic) grain heating: P(T) distributions.

Covers the reference's heating methods 2 and 3 (src/grains.f90:8-30):

* method 2 (RE + nLTE): each grain size has its own equilibrium
  temperature set by the local radiation field
  (Temp_finale_nLTE, src/thermal_emission.f90:932-1012);
* method 3 (nRE): grains too small to stay at equilibrium — the
  temperature probability distribution P(T) is solved from a transition
  matrix with radiative cooling on the sub-diagonal and heating rates
  from the MC mean intensity (Temp_nRE, src/thermal_emission.f90:1018-1437,
  matrix build :1080-1107, per-cell solve :1111-1137), with grains whose
  fluctuations are small flagged back to equilibrium (:1246-1293).

TPU-first re-design: instead of a per-cell LU solve inside an OpenMP loop,
the steady state is obtained with the Guhathakurta & Draine (1989)
recursion — a length-M `lax.fori_loop` of batched mat-vec contractions —
`vmap`-ed over (cell, grain) pairs and chunked by the caller, so the whole
grid solves as a handful of MXU-shaped batches.

Enthalpies follow Draine & Li (2001) two/three-Debye fits (eqs 9 & 11),
replacing the reference's specific_heat models (src/PAH.f90:14-120).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as cst

amu_g = 1.66053906660e-24


def _debye_f(n: int, x: np.ndarray) -> np.ndarray:
    """f_n(x) = n * int_0^1 y^n dy / (exp(y/x) - 1)  (DL01 eq. 10)."""
    y = np.linspace(1e-6, 1.0, 400)
    dy = y[1] - y[0]
    arg = y[None, :] / np.maximum(x[:, None], 1e-12)
    em1 = np.expm1(np.minimum(arg, 500.0))
    integ = y[None, :] ** n / np.maximum(em1, 1e-300)
    integ = np.where(arg >= 500.0, 0.0, integ)
    return n * integ.sum(-1) * dy


def grain_enthalpy(a_um: float, T: np.ndarray, material: str,
                   rho_bulk: float, sh_table=None) -> np.ndarray:
    """Grain enthalpy U(T) [J] (Draine & Li 2001 eqs 9-11).

    graphite / PAH:  U = (N-2) k [ 863 f2(T/863) + 2*2504 f2(T/2504) ]
    silicate:        U = (N-2) k [ 2*500 f2(T/500) + 1500 f3(T/1500) ]
    with N the number of atoms of the grain.

    sh_table: optional (T_tab [K], C_tab [erg/g/K]) tabulated specific
    heat from Misselt/DustEM opacity files (Misselt_specific_heat /
    DustEM_specific_heat, PAH.f90:220-270): U = m_grain int C dT.
    """
    mass_g = (4.0 / 3.0) * np.pi * (a_um * 1e-4) ** 3 * rho_bulk
    if sh_table is not None:
        T_tab, C_tab = sh_table
        order = np.argsort(T_tab)
        T_tab = np.asarray(T_tab, np.float64)[order]
        C_tab = np.asarray(C_tab, np.float64)[order]
        # cumulative integral of C on the table grid, then interpolate
        U_tab = np.concatenate([[0.0], np.cumsum(
            0.5 * (C_tab[1:] + C_tab[:-1]) * np.diff(T_tab))])
        U_per_g = np.interp(np.asarray(T, np.float64), T_tab, U_tab)
        # below the table: extrapolate with the first C value
        lo = np.asarray(T, np.float64) < T_tab[0]
        U_per_g = np.where(lo, C_tab[0] * np.asarray(T, np.float64), U_per_g + C_tab[0] * T_tab[0])
        return U_per_g * mass_g * 1e-7          # erg -> J
    if material in ("graphite", "PAH"):
        n_at = mass_g / (12.0 * amu_g)
        U_k = (863.0 * _debye_f(2, T / 863.0)
               + 2.0 * 2504.0 * _debye_f(2, T / 2504.0))
    else:  # silicate-like (mean atomic weight 24.6, MgFeSiO4)
        n_at = mass_g / (24.6 * amu_g)
        U_k = (2.0 * 500.0 * _debye_f(2, T / 500.0)
               + 1500.0 * _debye_f(3, T / 1500.0))
    return max(n_at - 2.0, 1.0) * cst.kb * U_k


def planck_lambda(wl_um: np.ndarray, T: np.ndarray) -> np.ndarray:
    """B_lambda(T) [W m^-3 sr^-1]; T (M,), wl (L,) -> (M, L)."""
    lam = wl_um[None, :] * 1e-6
    arg = cst.thermal_const / (lam * T[:, None])
    ok = arg < 500.0
    return np.where(
        ok, 2.0 * cst.hp * cst.c_light ** 2 / lam ** 5
        / np.expm1(np.minimum(arg, 500.0)), 0.0)


@dataclass
class NREGrainTables:
    """Per-grain-size precomputed tables for the P(T) solver."""
    T_bins: np.ndarray         # (M,) bin-centre temperatures [K]
    U: np.ndarray              # (M,) enthalpy at bin centres [J]
    dU: np.ndarray             # (M,) enthalpy bin widths [J]
    cool: np.ndarray           # (M,) cooling rate denominator terms:
                               # Edot(T_f) [W] (4 pi int C_abs B dl)
    c_abs_m2: np.ndarray       # (L,) absorption cross section [m^2]
    lam_um: np.ndarray         # (L,)


def build_nre_tables(a_um: float, c_abs_um2: np.ndarray,
                     wl_um: np.ndarray, material: str, rho_bulk: float,
                     n_bins: int = 128, T_min: float = 1.5,
                     T_max: float = 2500.0, sh_table=None) -> NREGrainTables:
    """Precompute the temperature/enthalpy grid and the radiated power
    Edot(T) per bin for one grain size (init of Temp_nRE,
    thermal_emission.f90:1040-1078).  sh_table: tabulated specific heat
    (Misselt/DustEM files) overriding the analytic enthalpy."""
    edges = np.exp(np.linspace(np.log(T_min), np.log(T_max), n_bins + 1))
    T_bins = np.sqrt(edges[:-1] * edges[1:])
    U_edges = grain_enthalpy(a_um, edges, material, rho_bulk, sh_table)
    U = grain_enthalpy(a_um, T_bins, material, rho_bulk, sh_table)
    dU = np.diff(U_edges)

    c_abs_m2 = c_abs_um2 * 1e-12
    B = planck_lambda(wl_um, T_bins)                       # (M, L)
    dlam_m = np.gradient(wl_um) * 1e-6
    edot = 4.0 * np.pi * (B * (c_abs_m2 * dlam_m)[None, :]).sum(-1)
    return NREGrainTables(T_bins=T_bins, U=U, dU=dU, cool=edot,
                          c_abs_m2=c_abs_m2, lam_um=wl_um)


def _heating_matrix(tab: NREGrainTables, J_lam: np.ndarray) -> np.ndarray:
    """Heating transition rates A[f, i] (f > i) for a batch of cells.

    J_lam: (B, L) mean intensity [W m^-2 m^-1 sr^-1].
    Rate of photon absorptions landing bin i -> f (GD89 eq 2.16 /
    reference matrix build thermal_emission.f90:1080-1107):
      A_fi = 4 pi C(l_fi) J_l(l_fi) l_fi^3 / (h^2 c^2) * dU_f
    with h c / l_fi = U_f - U_i, interpolated in log-lambda.
    """
    U, dU = tab.U, tab.dU
    M = U.size
    dE = U[:, None] - U[None, :]                           # (M, M)
    f_gt_i = dE > 0
    lam_fi = np.where(f_gt_i, cst.hp * cst.c_light
                      / np.maximum(dE, 1e-300), 1.0)       # [m]
    lam_fi_um = lam_fi * 1e6

    log_l = np.log(tab.lam_um)
    idx = np.clip(np.searchsorted(log_l, np.log(
        np.maximum(lam_fi_um, 1e-30))), 1, log_l.size - 1)
    w = np.clip((np.log(np.maximum(lam_fi_um, 1e-30)) - log_l[idx - 1])
                / (log_l[idx] - log_l[idx - 1]), 0.0, 1.0)
    in_grid = (lam_fi_um >= tab.lam_um[0]) & (lam_fi_um <= tab.lam_um[-1])

    CJ = tab.c_abs_m2[None, :] * J_lam                     # (B, L)
    CJ_i = (CJ[:, idx - 1] * (1 - w)[None] + CJ[:, idx] * w[None])  # (B,M,M)
    A = (4.0 * np.pi * CJ_i * lam_fi[None] ** 3
         / (cst.hp ** 2 * cst.c_light ** 2) * dU[None, :, None])
    return np.where((f_gt_i & in_grid)[None], A, 0.0)


@jax.jit
def _gd89_solve(A: jax.Array, cool_rate: jax.Array) -> jax.Array:
    """Steady-state P from heating matrix A (B, M, M) and the
    discretized cooling rates cool_rate[f] = Edot(T_f)/(U_f - U_{f-1})
    (thermal-continuous cooling, only f -> f-1; DL01 eq 41).

    Guhathakurta & Draine (1989) recursion:
      B_fi = sum_{k>=f} A_ki ;  X_0 = 1 ;
      X_f = sum_{i<f} B_fi X_i / cool_rate_f
    normalised to sum X = 1.  Log-scaled to avoid overflow.
    """
    Bm, M, _ = A.shape
    # cumulative-from-top of A over the destination axis
    Bmat = jnp.flip(jnp.cumsum(jnp.flip(A, 1), axis=1), 1)  # (B, M, M)

    def body(f, carry):
        X, scale = carry
        mask = (jnp.arange(M) < f).astype(A.dtype)          # i < f
        num = jnp.einsum("bi,bi->b", Bmat[:, f, :], X * mask[None])
        Xf = num / jnp.maximum(cool_rate[:, f], 1e-300)
        X = X.at[:, f].set(Xf)
        # renormalise to keep the recursion in range
        mx = jnp.maximum(jnp.max(X, axis=1, keepdims=True), 1e-300)
        return X / mx, scale + jnp.log(mx[:, 0])

    X0 = jnp.zeros((Bm, M), A.dtype).at[:, 0].set(1.0)
    X, _ = jax.lax.fori_loop(1, M, body, (X0, jnp.zeros(Bm, A.dtype)))
    tot = jnp.maximum(jnp.sum(X, axis=1, keepdims=True), 1e-300)
    return X / tot


def solve_temperature_distribution(tab: NREGrainTables, J_lam: np.ndarray,
                                   chunk: int = 2048,
                                   force_nre: bool = False):
    """P(T) per cell for one grain size.

    J_lam: (n_cells, L) mean intensity.  Returns (P (n_cells, M),
    is_re (n_cells,) equilibrium flags, T_eq (n_cells,)).

    The equilibrium check follows the reference's back-flagging
    (thermal_emission.f90:1246-1293): if the mean time between photon
    absorptions is much shorter than the radiative cooling time at the
    equilibrium temperature, fluctuations are negligible and the grain is
    treated as RE.
    """
    n_cells = J_lam.shape[0]
    M = tab.T_bins.size
    dlam_m = np.gradient(tab.lam_um) * 1e-6

    # equilibrium temperature: absorbed power == Edot(T)
    e_phot = cst.hp * cst.c_light / (tab.lam_um * 1e-6)    # (L,)
    p_abs = 4.0 * np.pi * (tab.c_abs_m2 * J_lam * dlam_m).sum(-1)  # W
    n_abs = 4.0 * np.pi * (tab.c_abs_m2 * J_lam / e_phot
                           * dlam_m).sum(-1)               # photons/s
    log_edot = np.log(np.maximum(tab.cool, 1e-300))
    ti = np.clip(np.searchsorted(log_edot,
                                 np.log(np.maximum(p_abs, 1e-300))),
                 1, M - 1)
    w = np.clip((np.log(np.maximum(p_abs, 1e-300)) - log_edot[ti - 1])
                / np.maximum(log_edot[ti] - log_edot[ti - 1], 1e-30),
                0.0, 1.0)
    T_eq = np.exp(np.log(tab.T_bins[ti - 1]) * (1 - w)
                  + np.log(tab.T_bins[ti]) * w)

    # fluctuation test: t_abs = 1/n_abs vs t_cool = U(T_eq)/Edot(T_eq)
    U_eq = np.interp(T_eq, tab.T_bins, tab.U)
    edot_eq = np.maximum(np.exp(np.interp(np.log(T_eq),
                                          np.log(tab.T_bins), log_edot)),
                         1e-300)
    t_cool = U_eq / edot_eq
    t_abs = 1.0 / np.maximum(n_abs, 1e-300)
    # -force_PAH_out_equilibrium disables the RE back-flagging
    # (lforce_PAH_out_equilibrium, init_mcfost.f90:1154-1160)
    is_re = (t_abs < 0.1 * t_cool) & (not force_nre)

    cool_rate = np.zeros(M)
    cool_rate[1:] = tab.cool[1:] / np.maximum(np.diff(tab.U), 1e-300)

    P = np.zeros((n_cells, M))
    for i0 in range(0, n_cells, chunk):
        sl = slice(i0, min(i0 + chunk, n_cells))
        A = _heating_matrix(tab, J_lam[sl])
        cr = np.broadcast_to(cool_rate[None], (A.shape[0], M))
        P[sl] = np.asarray(_gd89_solve(jnp.asarray(A), jnp.asarray(cr)))

    # equilibrium grains: the discrete photon ladder cannot resolve their
    # enthalpy bins (dU >> photon energies); their P is a delta at T_eq,
    # mirroring the reference's RE back-flagging (lRE,
    # thermal_emission.f90:1246-1293)
    if np.any(is_re):
        i_eq = np.clip(np.searchsorted(tab.T_bins, T_eq), 0, M - 1)
        P_eq = np.zeros((n_cells, M))
        P_eq[np.arange(n_cells), i_eq] = 1.0
        P = np.where(is_re[:, None], P_eq, P)
    return P, is_re, T_eq


def nre_emissivity(tab: NREGrainTables, P: np.ndarray) -> np.ndarray:
    """Emissivity per grain j_lambda (n_cells, L) [W m^-1 sr^-1]:
    C_abs(l) sum_f P_f B_l(T_f)  (emission_nRE,
    thermal_emission.f90:1518-1608)."""
    B = planck_lambda(tab.lam_um, tab.T_bins)              # (M, L)
    return (P @ B) * tab.c_abs_m2[None, :]


def equilibrium_temperature_per_size(c_abs_um2: np.ndarray,
                                     J_lam: np.ndarray,
                                     wl_um: np.ndarray,
                                     n_T: int = 200, T_min: float = 1.0,
                                     T_max: float = 3000.0) -> np.ndarray:
    """heating method 2 (RE + nLTE): per-grain-size equilibrium T
    (Temp_finale_nLTE, thermal_emission.f90:932-1012).

    c_abs_um2: (K, L); J_lam: (n_cells, L).  Returns (K, n_cells) [K].
    """
    T_tab = np.exp(np.linspace(np.log(T_min), np.log(T_max), n_T))
    B = planck_lambda(wl_um, T_tab)                        # (n_T, L)
    dlam_m = np.gradient(wl_um) * 1e-6
    c_m2 = c_abs_um2 * 1e-12
    edot = 4.0 * np.pi * np.einsum("kl,tl->kt", c_m2 * dlam_m[None], B)
    p_abs = 4.0 * np.pi * np.einsum("kl,cl->kc", c_m2 * dlam_m[None],
                                    J_lam)                 # (K, C)
    log_e = np.log(np.maximum(edot, 1e-300))
    log_p = np.log(np.maximum(p_abs, 1e-300))
    out = np.zeros_like(p_abs)
    for k in range(c_abs_um2.shape[0]):
        ti = np.clip(np.searchsorted(log_e[k], log_p[k]), 1, n_T - 1)
        w = np.clip((log_p[k] - log_e[k][ti - 1])
                    / np.maximum(log_e[k][ti] - log_e[k][ti - 1], 1e-30),
                    0.0, 1.0)
        out[k] = np.exp(np.log(T_tab[ti - 1]) * (1 - w)
                        + np.log(T_tab[ti]) * w)
    return out
