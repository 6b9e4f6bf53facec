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
    I_ext, ds0, vproj0, tab_speed_np = gather_incident_field(
        model, host, rt, _fibonacci_sphere(n_rays), nv)
    sig2_m1 = np.asarray(rt.sigma2_m1, np.float64)
    dvv = tab_speed_np[None, None, :] - vproj0[:, :, None]     # (C,R,nv)
    phi_w = np.exp(-sig2_m1[:, None, None] * dvv * dvv)
    jbar = (I_ext.astype(np.float64)
            * phi_w[:, :, None, :]).sum((1, 3))
    wsum = phi_w.sum((1, 2))
    return jbar / np.maximum(wsum, 1e-300)[:, None]


def gather_incident_field(model: Model, host: HostModel, rt: MolRT,
                          dirs: np.ndarray, nv: int = 15,
                          exclude_own: bool = True):
    """Incident intensity per (cell, ray) with the own-cell contribution
    excluded, plus the own-cell path length and projected cell velocity
    per ray — the frozen external field of the local ALI sub-iteration
    (the reference's labs bookkeeping, integ_ray_mol
    optical_depth.f90:511-514 + J_mol_loc :611-673).

    Returns (I_ext (C, R, nt, nv) f32, ds0 (C, R), vproj0 (C, R),
    tab_speed (nv,))."""
    dtype = model.kappa.dtype
    n_cells = model.grid.n_cells
    nt = len(rt.itrans)
    R = dirs.shape[0]

    dv = np.asarray(rt.dv_line, np.float64)
    vmax = 3.0 * dv.max()
    tab_speed_np = np.linspace(-vmax, vmax, nv)
    tab_speed = jnp.asarray(tab_speed_np, dtype)

    x0 = model.grid.r_grid
    y0 = jnp.zeros(n_cells, dtype)
    z0 = model.grid.z_grid
    own = jnp.arange(n_cells, dtype=jnp.int32)

    vf = np.asarray(rt.vfield, np.float64)            # (C, 3) cyl comps
    I_ext = np.zeros((n_cells, R, nt, nv), np.float32)
    ds0 = np.zeros((n_cells, R))
    vproj0 = np.zeros((n_cells, R))
    for ir, d in enumerate(dirs):
        u = jnp.full(n_cells, d[0], dtype)
        v = jnp.full(n_cells, d[1], dtype)
        w = jnp.full(n_cells, d[2], dtype)
        out = integrate_mol_rays(
            model, rt.kappa_mol, rt.emis_mol, rt.kappa_cont,
            rt.emis_cont, rt.dv_line, rt.norme_m1, rt.sigma2_m1,
            rt.vfield, rt.cmb, tab_speed,
            x0, y0, z0, u, v, w, nv=nv, nt=nt,
            skip_flat=own if exclude_own else None)
        if exclude_own:
            I, _, d0 = out
            ds0[:, ir] = np.asarray(d0, np.float64)
        else:
            I, _ = out
        I_ext[:, ir] = np.asarray(I, np.float32)
        # own-cell velocity projected on the ray at (r, 0, z):
        # R-hat -> (1,0,0), phi-hat -> (0,1,0)
        vproj0[:, ir] = vf[:, 0] * d[0] + vf[:, 1] * d[1] + vf[:, 2] * d[2]
    return I_ext, ds0, vproj0, tab_speed_np


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


def _local_jbar(mol, rt_np, pops, I_ext, ds0, vproj0, tab_speed,
                itrans_see, freq_see):
    """J_bar with the own-cell contribution recomputed from the CURRENT
    populations while the external field stays frozen — the reference's
    local operator in J_mol_loc (molecular_emission.f90:611-673)."""
    sig2_m1, norme_m1, kcont, emis_cont = rt_np
    up = mol.trans_up[itrans_see]
    low = mol.trans_low[itrans_see]
    kap = np.maximum(pops[:, low] * mol.fBlu[itrans_see][None, :]
                     - pops[:, up] * mol.fBul[itrans_see][None, :], 0.0)
    eps = pops[:, up] * mol.fAul[itrans_see][None, :]
    kap = kap / freq_see[None, :] * cst.AU_to_m            # (C, nt)
    eps = eps / freq_see[None, :] * cst.AU_to_m

    dvv = tab_speed[None, None, :] - vproj0[:, :, None]    # (C, R, nv)
    P_loc = norme_m1[:, None, None] * np.exp(
        -sig2_m1[:, None, None] * dvv * dvv)
    phi_w = np.exp(-sig2_m1[:, None, None] * dvv * dvv)

    opac = (kap[:, None, :, None] * P_loc[:, :, None, :]
            + kcont[:, None, :, None])                     # (C, R, nt, nv)
    tau = opac * ds0[:, :, None, None]
    S = ((eps[:, None, :, None] * P_loc[:, :, None, :]
          + emis_cont[:, None, :, None])
         / np.maximum(opac, 1e-300))
    att = np.exp(-np.minimum(tau, 60.0))
    Jray = I_ext.astype(np.float64) * att + S * (1.0 - att)
    jbar = (Jray * phi_w[:, :, None, :]).sum((1, 3))
    wsum = phi_w.sum((1, 2))
    return jbar / np.maximum(wsum, 1e-300)[:, None]


def nlte_populations(model: Model, host: HostModel, mol: MoleculeData,
                     T_gas: np.ndarray, abundance: float,
                     nlev: int | None = None, n_rays: int = 100,
                     max_iter: int = 30, tol: float = 1e-1,
                     initial: str = "lte", ng_order: int = 2,
                     verbose: bool = False, accurate_pop: bool = False,
                     n_sub: int = 10, tol_sub: float = 1e-3,
                     nv: int = 15, seed: int = 269753, cmb: bool = True):
    """Staged NLTE solve with a local ALI-style sub-iteration, mirroring
    the reference's driver (NLTE_mol_line_transfer,
    mol_transfer.f90:138-480):

    * stage 1 — 4 fixed rays per cell (the reference's 1+1D 2-ray etape,
      both signs of the vertical + radial directions);
    * stage 2 — ``n_rays`` fixed (Fibonacci) rays per cell (etape 2's
      100 fixed rays);
    * stage 3 (``accurate_pop``, the para's laccurate_pop) — random ray
      sets, count doubling until the populations are stable (etape 3).

    Per outer iteration the external incident field is frozen
    (gather_incident_field) and the statistical equilibrium is
    sub-iterated with the own-cell contribution to J_bar recomputed from
    the running populations (tol 1e-3, :406) — the diagonal-ALI step that
    makes optically thick lines converge.  Outer convergence follows the
    reference: max relative population change < ``tol`` (1e-1, :161-162)
    twice in a row.

    initial: "lte" (reference default) or "sobolev" (LVG escape
    probability, gas/escape.f90:614).  Ng acceleration on the outer
    iterates (utils.f90:418-518); ng_order=0 disables.

    Returns (pops (C, nlev_full), n_iter, max_rel_change)."""
    para = host.para
    m = para.mol.molecules[0]
    nlev_solve = nlev or m.level_max

    n_mol = gas_number_density(host) * abundance
    n_coll = gas_number_density(host)                 # H2 collider
    if initial == "sobolev":
        from ..gas.escape import sobolev_populations
        pops, _, _ = sobolev_populations(model, host, mol, T_gas, abundance,
                                         nlev=nlev_solve, verbose=verbose)
    else:
        pops = lte_populations(mol, T_gas, n_mol)     # start from LTE

    itrans_see = np.array([i for i in range(len(mol.Aul))
                           if mol.trans_up[i] < nlev_solve])
    freq_see = mol.freq[itrans_see]

    # ray stages (1+1D -> fixed Fibonacci -> doubling MC)
    dirs_11d = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0],
                         [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    stages: list[tuple[str, np.ndarray]] = [
        ("1+1D", dirs_11d),
        ("fixed", _fibonacci_sphere(n_rays)),
    ]
    if accurate_pop:
        rng = np.random.default_rng(seed)

        def _rand_dirs(n):
            mu = rng.uniform(-1, 1, n)
            ph = rng.uniform(0, 2 * np.pi, n)
            s = np.sqrt(1 - mu ** 2)
            return np.stack([s * np.cos(ph), s * np.sin(ph), mu], 1)
        stages.append(("mc", _rand_dirs(n_rays)))
        stages.append(("mc2", _rand_dirs(2 * n_rays)))

    from ..utils.safestop import safe_stop_requested
    diff = np.inf
    it_total = 0
    for stage_name, dirs in stages:
        history: list[np.ndarray] = []
        n_below = 0
        for it in range(1, max_iter + 1):
            it_total += 1
            rt = MolRT(model, host, mol, T_gas, itrans_see,
                       abundance=abundance, v_turb=para.mol.v_turb,
                       v_turb_unit=para.mol.v_turb_unit, pops=pops,
                       cmb=cmb)
            I_ext, ds0, vproj0, tab_speed = gather_incident_field(
                model, host, rt, dirs, nv=nv)
            rt_np = (np.asarray(rt.sigma2_m1, np.float64),
                     np.asarray(rt.norme_m1, np.float64),
                     np.asarray(rt.kappa_cont, np.float64),
                     np.asarray(rt.emis_cont, np.float64))

            # local ALI sub-iteration at frozen external field (:406)
            sub_pops = pops.copy()
            for _ in range(n_sub):
                jbar = _local_jbar(mol, rt_np, sub_pops, I_ext, ds0,
                                   vproj0, tab_speed, itrans_see, freq_see)
                jall = np.zeros((T_gas.shape[0], len(mol.Aul)))
                jall[:, itrans_see] = jbar
                new = solve_see(mol, T_gas, n_coll, n_mol, jall, nlev_solve)
                oldl = sub_pops[:, :nlev_solve]
                maskl = oldl > 1e-30 * n_mol[:, None]
                rl = np.abs(new - oldl) / np.maximum(oldl, 1e-300)
                sub_diff = rl[maskl].max() if maskl.any() else 0.0
                sub_pops = sub_pops.copy()
                sub_pops[:, :nlev_solve] = new
                if sub_diff < tol_sub:
                    break

            old = pops[:, :nlev_solve]
            mask = old > 1e-30 * n_mol[:, None]
            rel = np.abs(new - old) / np.maximum(old, 1e-300)
            diff = rel[mask].max() if mask.any() else 0.0

            if ng_order:
                history.append(new.copy())
                if len(history) > ng_order + 2:
                    history.pop(0)
                if len(history) == ng_order + 2 \
                        and it % (ng_order + 2) == 0:
                    from ..utils.ng import ng_accelerate
                    acc = np.maximum(ng_accelerate(history,
                                                   order=ng_order), 0.0)
                    tot = acc.sum(1, keepdims=True)
                    acc = acc * (new.sum(1, keepdims=True)
                                 / np.maximum(tot, 1e-300))
                    new = acc
                    history.clear()

            pops = pops.copy()
            pops[:, :nlev_solve] = new
            if verbose:
                print(f"    NLTE {stage_name} iter {it}: "
                      f"max dpop/pop = {diff:.2e}")
            # reference criterion: below threshold twice in a row (:442)
            n_below = n_below + 1 if diff < tol else 0
            if n_below >= 2 or (diff < tol and it >= max_iter):
                break
            if safe_stop_requested():
                print("    safe_stop: wall-clock budget reached, "
                      "returning current populations")
                return pops, it_total, diff
    return pops, it_total, diff
