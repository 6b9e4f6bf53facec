"""Live-coupling API for hydro codes (the libmcfost analogue).

The reference builds a static library exposing ``init_mcfost_phantom`` /
``run_mcfost_phantom`` (reference: src/mcfost2phantom.f90:7-155,159-474)
so Phantom can call the thermal MC in-memory every hydro step: particles
in, per-particle dust temperatures (and optionally Planck-mean opacities
for the hydro code's radiation module, mcfost2phantom.f90:535) out.

TPU-native design: the expensive part of a coupled step is the Voronoi
rebuild (host, native C++) + one thermal MC (device).  The MC kernel is
already shape-stable, so across hydro steps with a fixed particle count
XLA re-uses the compiled executable — only the mesh/opacity tables are
re-uploaded.  ``dudt`` extra heating enters the temperature solve exactly
like the reference's lheating path (init_reemission(dudt),
src/thermal_emission.f90:404-644): it is an additional per-cell heating
rate added to the MC-deposited kappa*J before the T inversion.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import numpy as np

from . import constants as cst
from .config.para import Para, read_para


@dataclass
class CouplingState:
    """Persistent state across coupled calls (init_mcfost_phantom)."""
    para: Para
    n_packets: int
    seed: int = 269753
    call_count: int = 0
    # cached compiled model pieces keyed by particle count
    verbose: bool = True
    _last: dict = field(default_factory=dict)


def init_mcfost_phantom(para_or_path, n_packets: int | None = None,
                        verbose: bool = True) -> CouplingState:
    """Parse the parameter file once and fix the run configuration
    (reference init_mcfost_phantom, src/mcfost2phantom.f90:7-155)."""
    para = (para_or_path if isinstance(para_or_path, Para)
            else read_para(para_or_path))
    n = int(n_packets if n_packets is not None else para.photons.n_eq_th)
    return CouplingState(para=para, n_packets=n, seed=para.seed,
                         verbose=verbose)


def run_mcfost_phantom(state: CouplingState,
                       xyz: np.ndarray, h: np.ndarray, mass_g: np.ndarray,
                       star_xyz: np.ndarray, star_mass: np.ndarray,
                       dudt: np.ndarray | None = None,
                       t_guess: np.ndarray | None = None,
                       batch: int = 16384):
    """One coupled radiative step (run_mcfost_phantom,
    src/mcfost2phantom.f90:159-474).

    Parameters are live SPH arrays in mcfost units (AU / g); ``dudt`` is
    the per-particle hydro heating rate [W] folded into the temperature
    solve.  Returns (T_per_particle [K], mu_gamma_stub, n_packets_used).
    Culled particles get T = T_CMB like the reference's `Tdust=Tcmb`
    fill.
    """
    from .io.phantom import SPHModel
    from .mc.model import build_model
    from .mc import thermal_mc

    n_part = xyz.shape[0]
    sph = SPHModel(xyz=np.asarray(xyz, np.float64),
                   h=np.asarray(h, np.float64),
                   mass=np.asarray(mass_g, np.float64),
                   rho_gas=np.zeros(n_part),
                   vxyz=None, dustfrac=None,
                   star_xyz=np.asarray(star_xyz, np.float64),
                   star_mass=np.asarray(star_mass, np.float64))

    t0 = time.time()
    model, host = build_model(state.para, cache_dir=None, sph=sph)
    keep = host.sph_keep if host.sph_keep is not None \
        else np.ones(n_part, bool)
    if state.verbose:
        print(f"  coupling: Voronoi model {model.grid.n_cells} cells "
              f"({time.time()-t0:.1f}s)")

    key = jax.random.PRNGKey(state.seed + state.call_count)
    state.call_count += 1
    res = thermal_mc.run_thermal_mc(model, key, state.n_packets,
                                    batch=batch, mrw=True)
    res.xkj.block_until_ready()

    extra = None
    if dudt is not None:
        # hydro heating per cell [W]: one Voronoi cell == one particle
        extra = np.zeros(model.grid.n_cells)
        extra[:] = np.asarray(dudt, np.float64)[keep]
    T_cells = np.asarray(thermal_mc.final_temperature(
        model, res.xkj, int(res.emitted), extra_heating=extra))

    T = np.full(n_part, cst.T_Cmb)
    T[keep] = T_cells
    state._last = {"model": model, "host": host, "T_cells": T_cells,
                   "keep": keep, "res": res}
    return T, None, int(res.emitted)


def diffusion_opacity(state: CouplingState, T_part: np.ndarray
                      ) -> np.ndarray:
    """Planck-mean absorption opacity per particle at its temperature
    [cm^2/g of gas] for the hydro code's radiation/diffusion module
    (reference diffusion_opacity, src/mcfost2phantom.f90:535-607)."""
    last = state._last
    if not last:
        raise RuntimeError("run_mcfost_phantom must run first")
    model, host = last["model"], last["host"]
    keep = last["keep"]
    # kappa_absp is Planck-mean absorption per unit dust density
    # [AU^-1 / (g cm^-3)] tabulated on tab_temp (build_model)
    tab_T = np.asarray(model.tab_temp, np.float64)
    p_icell = np.asarray(model.p_icell, np.int64)
    kap_tab = np.asarray(model.kappa_absp, np.float64)   # (P, n_T)
    rho_dust = np.asarray(host.rho_dust, np.float64)
    gas_to_dust = host.para.zones[0].gas_to_dust

    T_cells = np.asarray(T_part, np.float64)[keep]
    idx = np.clip(np.searchsorted(tab_T, T_cells) - 1, 0, len(tab_T) - 2)
    w = np.clip((T_cells - tab_T[idx])
                / np.maximum(tab_T[idx + 1] - tab_T[idx], 1e-30), 0, 1)
    kap_cell = (kap_tab[p_icell, idx] * (1 - w)
                + kap_tab[p_icell, idx + 1] * w) * rho_dust
    # convert extinction [AU^-1] -> cm^2 per g of gas
    rho_gas = np.maximum(rho_dust * gas_to_dust, 1e-300)
    kappa_cm2g = kap_cell / cst.AU_to_cm / rho_gas
    out = np.zeros(len(keep))
    out[keep] = kappa_cm2g
    return out


# ---------------------------------------------------------------------------
# C-ABI adapters (native/coupling_c.c): raw f64 buffers in/out, so the
# embedding shim stays a thin argument-marshalling layer.  Mirrors the
# reference's C-callable library surface (libmcfost.a:
# init_mcfost_phantom / run_mcfost_phantom / diffusion_opacity,
# src/Makefile:263-266, src/mcfost2phantom.f90:7,159,535).
# ---------------------------------------------------------------------------

def _c_api_write_default_para(path: str, n_packets: int = 4000,
                              n_lambda: int = 10,
                              n_grains: int = 4) -> int:
    """Write a reduced default parameter file (C test harness helper)."""
    from .config.para import write_para
    p = Para()
    p.photons.n_eq_th = n_packets
    p.wavelengths.n_lambda = n_lambda
    for sp in p.dust[0]:
        sp.n_grains = n_grains
    write_para(p, path)
    return 0


def _c_api_init(para_path: str, n_packets: int) -> CouplingState:
    """C entry: parse the para file; n_packets<=0 uses the file's own."""
    return init_mcfost_phantom(
        para_path, n_packets if n_packets > 0 else None, verbose=False)


def _c_api_run(state: CouplingState, n_part: int, xyz_mv, h_mv, mass_mv,
               n_star: int, star_xyz_mv, star_mass_mv, dudt_mv,
               t_out_mv, batch: int = 8192) -> int:
    """C entry: f64 buffers [xyz (3N), h (N), mass_g (N), star_xyz (3S),
    star_mass_Msun (S), dudt (N W, optional), T_out (N K)].  Returns the
    packet count used, <0 on error."""
    xyz = np.frombuffer(xyz_mv, np.float64)[:3 * n_part].reshape(n_part, 3)
    h = np.frombuffer(h_mv, np.float64)[:n_part]
    mass = np.frombuffer(mass_mv, np.float64)[:n_part]
    sxyz = np.frombuffer(star_xyz_mv, np.float64)[:3 * n_star].reshape(
        n_star, 3)
    smass = np.frombuffer(star_mass_mv, np.float64)[:n_star]
    dudt = (np.frombuffer(dudt_mv, np.float64)[:n_part]
            if dudt_mv is not None else None)
    T, _, n_used = run_mcfost_phantom(state, xyz, h, mass, sxyz, smass,
                                      dudt=dudt, batch=batch)
    np.frombuffer(t_out_mv, np.float64)[:n_part] = T
    return int(n_used)


def _c_api_diffusion(state: CouplingState, n_part: int, t_mv,
                     kappa_out_mv) -> int:
    """C entry: Planck-mean opacity [cm^2/g gas] per particle."""
    T = np.frombuffer(t_mv, np.float64)[:n_part]
    kap = diffusion_opacity(state, T)
    np.frombuffer(kappa_out_mv, np.float64)[:n_part] = kap
    return 0
