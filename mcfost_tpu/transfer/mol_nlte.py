"""NLTE molecular level populations: statistical equilibrium + lambda
iteration.

Covers the reference's NLTE molecular solver
(NLTE_mol_line_transfer, mol_transfer.f90:138-480; J_mol_loc,
equilibre_rad_mol_loc, molecular_emission.f90:429-673):

* per outer iteration, the mean radiation field J_bar(ul) is estimated in
  every cell by formal integration along a fixed set of rays (the
  reference's etape 1 uses 2 rays/cell, etape 2 uses ~100 rays/cell);
* the statistical equilibrium (radiative A/B rates with J_bar + collisional
  rates with detailed balance) is solved per cell as a dense linear system
  with particle conservation replacing one row (see_atom-style);
* iterate until the maximum relative population change is below tolerance.

TPU-native: all cells' rays integrate concurrently (n_cells * n_rays rays
in one while_loop); the per-cell SEE solves are one batched
jnp.linalg.solve.  Plain lambda iteration for now — accurate for tau_line
up to a few; ALI/Ng acceleration is the next refinement (the reference's
own step 1/2 are also lambda iterations with fixed ray sets).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as cst
from ..grids import geometry as geom
from ..mc.model import Model, HostModel
from ..physics.molecules import MoleculeData, lte_populations
from .mol import MolRT, gas_number_density, integrate_mol_rays


def _fibonacci_sphere(n: int) -> np.ndarray:
    i = np.arange(n) + 0.5
    phi = np.pi * (1 + 5 ** 0.5) * i
    mu = 1 - 2 * i / n
    s = np.sqrt(1 - mu ** 2)
    return np.stack([s * np.cos(phi), s * np.sin(phi), mu], 1)


def mean_radiation_field(model: Model, host: HostModel, rt: MolRT,
                         n_rays: int = 16, nv: int = 15,
                         ray_chunk: int = 4) -> np.ndarray:
    """J_bar per (cell, transition): angle & profile-weighted mean intensity
    (J_mol_loc, molecular_emission.f90:611-673).

    Rays start at cell centres (phi=0 on each ring) and integrate the
    incident intensity backward to the grid edge."""
    dtype = model.kappa.dtype
    n_cells = model.grid.n_cells
    nt = len(rt.itrans)
    dirs = _fibonacci_sphere(n_rays)

    dv = np.asarray(rt.dv_line, np.float64)
    # per-cell velocity grid +-3 sigma; use the max width so the channel
    # grid is shared (profile weights handle the rest)
    vmax = 3.0 * dv.max()
    tab_speed_np = np.linspace(-vmax, vmax, nv)
    tab_speed = jnp.asarray(tab_speed_np, dtype)

    x0 = model.grid.r_grid
    y0 = jnp.zeros(n_cells, dtype)
    z0 = model.grid.z_grid

    jbar = np.zeros((n_cells, nt))
    wsum = np.zeros((n_cells, nt))
    sig2_m1 = np.asarray(rt.sigma2_m1, np.float64)

    for c0 in range(0, n_rays, ray_chunk):
        chunk = dirs[c0:c0 + ray_chunk]
        for d in chunk:
            u = jnp.full(n_cells, d[0], dtype)
            v = jnp.full(n_cells, d[1], dtype)
            w = jnp.full(n_cells, d[2], dtype)
            # incident intensity: integrate backward along -d from the cell
            # (the ray toward the cell travels along +d)
            I, _ = integrate_mol_rays(
                model, rt.kappa_mol, rt.emis_mol, rt.kappa_cont,
                rt.emis_cont, rt.dv_line, rt.norme_m1, rt.sigma2_m1,
                rt.vfield, rt.cmb, tab_speed,
                x0, y0, z0, u, v, w, nv=nv, nt=nt)
            I = np.asarray(I, np.float64)             # (C, nt, nv)
            # profile weights centred on the cell's own projected velocity
            # (the channel grid is in the local frame: v=0 at cell velocity)
            phi_w = np.exp(-sig2_m1[:, None] * tab_speed_np[None, :] ** 2)
            jbar += (I * phi_w[:, None, :]).sum(-1)
            wsum += phi_w.sum(-1)[:, None]
    return jbar / np.maximum(wsum, 1e-300)


def solve_see(mol: MoleculeData, T: np.ndarray, n_coll: np.ndarray,
              n_mol: np.ndarray, jbar_all: np.ndarray,
              nlev: int) -> np.ndarray:
    """Batched statistical equilibrium (equilibre_rad_mol_loc,
    molecular_emission.f90:429-608): dn_i/dt = 0 with radiative +
    collisional rates; one row replaced by particle conservation."""
    C = T.shape[0]
    M = np.zeros((C, nlev, nlev))

    # radiative rates for all transitions among the first nlev levels
    for itr in range(len(mol.Aul)):
        u = mol.trans_up[itr]
        l = mol.trans_low[itr]
        if u >= nlev:
            continue
        J = jbar_all[:, itr]
        Rul = mol.Aul[itr] + mol.Bul[itr] * J
        Rlu = mol.Blu[itr] * J
        M[:, l, u] += Rul
        M[:, u, u] -= Rul
        M[:, u, l] += Rlu
        M[:, l, l] -= Rlu

    # collisional rates (detailed balance for the upward rates)
    if mol.coll_rates.size:
        logT = np.log(np.maximum(T, 1.0))
        logTt = np.log(mol.coll_temps)
        for k in range(len(mol.coll_up)):
            u = mol.coll_up[k]
            l = mol.coll_low[k]
            if u >= nlev:
                continue
            cul = np.exp(np.interp(logT, logTt,
                                   np.log(np.maximum(mol.coll_rates[k],
                                                     1e-300))))
            cul = cul * 1e-6 * n_coll                  # cm^3/s -> m^3/s * n
            dE = (mol.level_energy[u] - mol.level_energy[l]) \
                * 1.602176634e-19
            clu = cul * mol.g[u] / mol.g[l] * np.exp(
                -dE / (cst.kb * np.maximum(T, 1.0)))
            M[:, l, u] += cul
            M[:, u, u] -= cul
            M[:, u, l] += clu
            M[:, l, l] -= clu

    # particle conservation replaces the last row
    M[:, -1, :] = 1.0
    b = np.zeros((C, nlev, 1))
    b[:, -1, 0] = n_mol
    pops = np.linalg.solve(M, b)[:, :, 0]
    return np.maximum(pops, 0.0)


def nlte_populations(model: Model, host: HostModel, mol: MoleculeData,
                     T_gas: np.ndarray, abundance: float,
                     nlev: int | None = None, n_rays: int = 16,
                     max_iter: int = 30, tol: float = 1e-3,
                     initial: str = "lte", ng_order: int = 2,
                     verbose: bool = False):
    """Lambda-iterate the level populations to statistical equilibrium.

    initial: "lte" (reference default) or "sobolev" — the LVG
    escape-probability local solve as starting point (the reference's
    escape-probability initial solution, gas/escape.f90:614).
    Ng acceleration (utils.f90:418-518 role) fires every ng_order+2
    iterations once enough history exists; ng_order=0 disables.

    Returns (pops (C, nlev_full), n_iter, max_rel_change)."""
    para = host.para
    m = para.mol.molecules[0]
    nlev_solve = nlev or m.level_max
    nlev_full = mol.n_levels

    n_mol = gas_number_density(host) * abundance
    n_coll = gas_number_density(host)                 # H2 collider
    if initial == "sobolev":
        from ..gas.escape import sobolev_populations
        pops, _, _ = sobolev_populations(model, host, mol, T_gas, abundance,
                                         nlev=nlev_solve, verbose=verbose)
    else:
        pops = lte_populations(mol, T_gas, n_mol)     # start from LTE

    # transitions among the solved levels
    itrans_see = np.array([i for i in range(len(mol.Aul))
                           if mol.trans_up[i] < nlev_solve])

    diff = np.inf
    it = 0
    history: list[np.ndarray] = []
    for it in range(1, max_iter + 1):
        rt = MolRT(model, host, mol, T_gas, itrans_see,
                   abundance=abundance, v_turb=para.mol.v_turb,
                   v_turb_unit=para.mol.v_turb_unit, pops=pops)
        jbar = mean_radiation_field(model, host, rt, n_rays=n_rays)
        jall = np.zeros((T_gas.shape[0], len(mol.Aul)))
        jall[:, itrans_see] = jbar
        new = solve_see(mol, T_gas, n_coll, n_mol, jall, nlev_solve)

        old = pops[:, :nlev_solve]
        mask = old > 1e-30 * n_mol[:, None]
        rel = np.abs(new - old) / np.maximum(old, 1e-300)
        diff = rel[mask].max() if mask.any() else 0.0

        if ng_order:
            history.append(new.copy())
            if len(history) > ng_order + 2:
                history.pop(0)
            if len(history) == ng_order + 2 and it % (ng_order + 2) == 0:
                from ..utils.ng import ng_accelerate
                acc = np.maximum(ng_accelerate(history, order=ng_order), 0.0)
                # renormalise to conserve the total per cell
                tot = acc.sum(1, keepdims=True)
                acc = acc * (n_mol[:, None] * (new.sum(1, keepdims=True)
                                               / np.maximum(n_mol[:, None],
                                                            1e-300))
                             / np.maximum(tot, 1e-300))
                new = acc
                history.clear()

        pops = pops.copy()
        pops[:, :nlev_solve] = new
        if verbose:
            print(f"    NLTE iter {it}: max dpop/pop = {diff:.2e}")
        if diff < tol:
            break
        from ..utils.safestop import safe_stop_requested
        if safe_stop_requested():
            print("    safe_stop: wall-clock budget reached, "
                  "returning current populations")
            break
    return pops, it, diff
