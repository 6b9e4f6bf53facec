"""Sobolev / escape-probability NLTE initial solution (LVG).

Covers the reference's gas/escape.f90 capability (nlte_loop_sobolev
:614-1177, mean_velocity_gradient :191-500): before the expensive
ray-coupled lambda/MALI iteration, level populations are brought close
to the converged answer by a *local* solve — each line's mean radiation
field is the large-velocity-gradient estimate

    J_bar = (1 - beta) * S_line + beta * J_background(CMB)

with the angle-averaged escape probability beta(tau) = (1-exp(-tau))/tau
and the Sobolev optical depth computed from the local populations and
the mean velocity gradient.  The solve is a per-cell fixed point with no
ray transport at all, so one iteration is a batched SEE solve over all
cells — ideal TPU shape, and exactly the role the reference gives it
("local Sobolev with no background continua for lines", escape.f90:615).
"""
from __future__ import annotations

import numpy as np

from .. import constants as cst
from ..grids import geometry as geom
from ..mc.model import Model, HostModel
from ..physics.molecules import MoleculeData, lte_populations


def mean_velocity_gradient(model: Model, host: HostModel,
                           vfield: np.ndarray, vth: np.ndarray,
                           k_neigh: int = 6) -> np.ndarray:
    """Per-cell mean |dv/ds| [1/s] from nearest-neighbour differencing
    (reference: mean_velocity_gradient, gas/escape.f90:191-500).

    vfield: (C, 3) cylindrical velocity components [m/s];
    vth: (C,) thermal+turbulent width [m/s] — sets the gradient floor
    vth/size so tau_sobolev stays finite in static regions.
    """
    r = geom.host_arrays(model.grid, "r_grid")
    try:
        z = geom.host_arrays(model.grid, "z_grid")
    except AttributeError:
        z = np.zeros_like(r)
    pos = np.stack([r, z], 1)                          # AU
    C = r.shape[0]
    k = min(k_neigh, C - 1)
    grad = np.zeros(C)
    chunk = max(1, int(4e7 // max(C, 1)))
    for i0 in range(0, C, chunk):
        sl = slice(i0, min(i0 + chunk, C))
        d2 = ((pos[sl, None, :] - pos[None, :, :]) ** 2).sum(-1)
        for j, i in enumerate(range(i0, sl.stop)):
            d2[j, i] = np.inf
        idx = np.argpartition(d2, k, axis=1)[:, :k]
        dist = np.sqrt(np.take_along_axis(d2, idx, axis=1))     # (c, k) AU
        dv = np.linalg.norm(vfield[idx] - vfield[sl][:, None, :], axis=-1)
        grad[sl] = (dv / np.maximum(dist * cst.AU_to_m, 1e-300)).mean(1)
        # floor: thermal width across the local cell scale
        size = dist.min(1) * cst.AU_to_m
        grad[sl] = np.maximum(grad[sl], vth[sl] / np.maximum(size, 1e-300))
    return grad


def beta_escape(tau: np.ndarray) -> np.ndarray:
    """Angle-averaged LVG escape probability (1-exp(-tau))/tau, with the
    tau->0 limit handled and masing (tau<0) clamped as the reference does."""
    t = np.clip(tau, -30.0, 700.0)
    small = np.abs(t) < 1e-6
    with np.errstate(over="ignore", invalid="ignore"):
        b = np.where(small, 1.0 - 0.5 * t, (1.0 - np.exp(-t)) / np.where(
            small, 1.0, t))
    return np.clip(b, 0.0, 1.0 + np.abs(np.minimum(tau, 0.0)))


def sobolev_populations(model: Model, host: HostModel, mol: MoleculeData,
                        T_gas: np.ndarray, abundance: float,
                        nlev: int | None = None, max_iter: int = 100,
                        tol: float = 1e-3, verbose: bool = False):
    """LVG molecular populations: local fixed point, no ray transport.

    Returns (pops (C, n_levels), n_iter, max_rel_change).  Serves both as
    a standalone fast solver (optically-thin to moderate tau) and as the
    initial solution of nlte_populations (the reference's
    -escape_prob / initial-solution role).
    """
    from ..transfer.mol import gas_number_density
    from ..transfer.mol_nlte import solve_see
    from ..transfer.mol import MolRT  # reuse velocity setup convention

    para = host.para
    nlev_solve = nlev or para.mol.molecules[0].level_max
    n_mol = gas_number_density(host) * abundance
    n_coll = gas_number_density(host)
    pops = lte_populations(mol, T_gas, n_mol)

    # velocity field (cylindrical comps) as the line RT uses it
    rt = MolRT(model, host, mol, T_gas, np.array([0]),
               abundance=abundance, v_turb=para.mol.v_turb,
               v_turb_unit=para.mol.v_turb_unit, pops=pops)
    vfield = np.asarray(rt.vfield, np.float64)
    vth = np.sqrt(1.0 / np.maximum(np.asarray(rt.sigma2_m1, np.float64),
                                   1e-300))
    grad = mean_velocity_gradient(model, host, vfield, vth)

    nu = mol.freq                                  # (NT,) Hz
    ntr = len(mol.Aul)
    C = T_gas.shape[0]
    tcmb = 2.7260
    j_cmb = (2 * cst.hp * nu ** 3 / cst.c_light ** 2
             / np.expm1(cst.hp * nu / (cst.kb * tcmb)))  # (NT,)

    diff = np.inf
    it = 0
    for it in range(1, max_iter + 1):
        jbar = np.zeros((C, ntr))
        for itr in range(ntr):
            u, l = mol.trans_up[itr], mol.trans_low[itr]
            nl, nu_p = pops[:, l], pops[:, u]
            # Sobolev depth: tau = c^3 A /(8 pi nu^3) (nl gu/gl - nu)/|dv/ds|
            col = (nl * mol.g[u] / mol.g[l] - nu_p)
            tau = (cst.c_light ** 3 * mol.Aul[itr] / (8 * np.pi * nu[itr] ** 3)
                   * col / np.maximum(grad, 1e-300))
            beta = beta_escape(tau)
            with np.errstate(divide="ignore", invalid="ignore"):
                s_line = (2 * cst.hp * nu[itr] ** 3 / cst.c_light ** 2
                          / (nl * mol.g[u] / (np.maximum(nu_p, 1e-300)
                                              * mol.g[l]) - 1.0))
            s_line = np.where((nu_p > 0) & np.isfinite(s_line)
                              & (s_line > 0), s_line, 0.0)
            jbar[:, itr] = (1.0 - beta) * s_line + beta * j_cmb[itr]
        new = solve_see(mol, T_gas, n_coll, n_mol, jbar, nlev_solve)
        old = pops[:, :nlev_solve]
        mask = old > 1e-30 * n_mol[:, None]
        rel = np.abs(new - old) / np.maximum(old, 1e-300)
        diff = float(rel[mask].max()) if mask.any() else 0.0
        # damped update for stability at large tau
        pops = pops.copy()
        pops[:, :nlev_solve] = 0.5 * new + 0.5 * old
        if verbose:
            print(f"    LVG iter {it}: max dpop/pop = {diff:.2e}")
        if diff < tol:
            break
    return pops, it, diff
