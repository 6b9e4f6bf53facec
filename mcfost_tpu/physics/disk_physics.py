"""Disk physics: dust sublimation, hydrostatic equilibrium, viscous heating.

Covers the reference's src/disk_physics.f90 capability surface:
* optically-thin sublimation radius from the stellar spectrum
  (compute_othin_sublimation_radius :21-76) — rescales zone inner radii;
* temperature-based dust sublimation (sublimate_dust :124-176) — zero
  the dust density wherever T_dust exceeds the material's sublimation
  temperature, iterated with the thermal MC by the runner;
* vertical hydrostatic equilibrium (equilibre_hydrostatique :203-263) —
  per-column integration of d ln rho/dz = -(dT/dz + G M mu m_H z /
  (k T r^3)) with column-mass-preserving renormalisation (the reference
  leaves the renormalisation commented out; here it is complete);
* alpha-disc viscous heating Gamma = 9/4 alpha rho_gas c_s^2 Omega
  [W/m^3], fed into the B&W temperature solve as extra heating (the
  reference's lheating/extra-heating channel, thermal_emission.f90:404).

All pure-numpy model-build/post-MC functions; the MC kernel itself is
untouched (extra heating enters through final_temperature's offset).
"""
from __future__ import annotations

import numpy as np

from .. import constants as cst
from ..config.para import Para

MU_GAS = 2.3          # mean molecular weight of H2+He disk gas
M_H = 1.6735575e-27   # [kg]


def othin_sublimation_radius(para: Para, wl, kappa_abs_norm: np.ndarray,
                             E_stars: np.ndarray, T_sub: float = 1500.0,
                             safety: float = 1.6) -> float:
    """Optically-thin sublimation radius [AU]
    (compute_othin_sublimation_radius, disk_physics.f90:21-76):
    balance kappa-weighted stellar heating at distance r against
    kappa-weighted blackbody cooling at T_sub; r_sub = sqrt(E_star/E_dust),
    scaled by the reference's empirical 1.6 factor.

    kappa_abs_norm: (L,) absorption opacity shape (any normalisation —
    only ratios matter); E_stars: (L,) the star emission spectrum in the
    build_star_model units (surface x B_lambda)."""
    lam_m = wl.lam * 1e-6
    dlam_m = wl.dlam * 1e-6
    x = cst.thermal_const / (T_sub * lam_m)
    good = x < 500.0
    bb = np.zeros(wl.n)
    bb[good] = 1.0 / (lam_m[good] ** 5 * np.expm1(x[good]))
    e_dust = 4.0 * (kappa_abs_norm * bb * dlam_m).sum() \
        * 2.0 * np.pi * cst.hp * cst.c_light ** 2
    e_star = (kappa_abs_norm * E_stars
              * 2.0 * np.pi * cst.hp * cst.c_light ** 2 * dlam_m).sum() \
        / (4.0 * np.pi * cst.AU_to_m ** 2)
    if e_dust <= 0:
        return 0.0
    return float(np.sqrt(e_star / e_dust)) * safety


def sublimate_dust(rho: np.ndarray, volume: np.ndarray, Tdust: np.ndarray,
                   T_sub: float = 1500.0, verbose: bool = False):
    """Zero the dust density where T_dust > T_sub
    (sublimate_dust, disk_physics.f90:124-176).  Returns (new_rho,
    sublimated_mask); the caller re-runs the thermal MC until no new
    cell sublimates (dust_transfer.f90:302-314 iteration)."""
    mask = np.asarray(Tdust, np.float64) > T_sub
    new_rho = np.where(mask, 0.0, np.asarray(rho, np.float64))
    if verbose and mask.any():
        lost = (np.asarray(rho)[mask] * np.asarray(volume)[mask]).sum()
        print(f"  sublimated {int(mask.sum())} cells "
              f"({lost:.3e} dust units)")
    return new_rho, mask


def hydrostatic_density(para: Para, r_grid: np.ndarray, z_grid: np.ndarray,
                        volume: np.ndarray, Tdust: np.ndarray,
                        rho: np.ndarray, n_rad: int, nz: int,
                        rho_gas: np.ndarray | None = None):
    """Per-column vertical hydrostatic equilibrium
    (equilibre_hydrostatique, disk_physics.f90:203-263):

        d ln rho / dz = -(dT/dz + G M_* mu m_H z / (k r^3)) / T

    with r, z in AU internally converted; each (r, phi) column is
    renormalised to conserve its dust column mass.  Arrays are flat
    cylindrical-grid order (iz fastest after reshape (n_rad, nz, n_az)).
    Returns the new dust density (same shape/order as rho)."""
    C = rho.shape[0]
    n_az = max(1, C // (n_rad * nz))
    shape = (n_rad, nz, n_az)
    T = np.asarray(Tdust, np.float64).reshape(shape)
    z = np.asarray(z_grid, np.float64).reshape(shape)
    r = np.asarray(r_grid, np.float64).reshape(shape)
    v = np.asarray(volume, np.float64).reshape(shape)
    rho0 = np.asarray(rho, np.float64).reshape(shape)

    m_stars = sum(s.mass for s in para.stars) * cst.Msun_to_kg
    # (G M mu m_H / k) has units K*m; fac1 = cst_hydro * z_AU/r_AU^3 must
    # come out in K/AU so that (fac1/T)*dz_AU is dimensionless:
    # K*m * (z_m/r_m^3) * AU_m = K*m * (z_AU/r_AU^3)/AU_m^2 * AU_m
    cst_hydro = (cst.Ggrav * m_stars * MU_GAS * M_H
                 / (cst.kb * cst.AU_to_m))             # K/AU per (z/r^3)

    T = np.maximum(T, 2.7)
    dz = np.diff(z, axis=1)                            # (n_rad, nz-1, n_az)
    dTdz = np.diff(T, axis=1) / np.maximum(dz, 1e-300)
    zmid = 0.5 * (z[:, 1:] + z[:, :-1])
    rmid = 0.5 * (r[:, 1:] + r[:, :-1])
    Tmid = 0.5 * (T[:, 1:] + T[:, :-1])
    fac1 = cst_hydro * zmid / np.maximum(rmid, 1e-300) ** 3
    dlnrho = -(dTdz + fac1) / Tmid * dz
    ln_rho = np.concatenate(
        [np.zeros((n_rad, 1, n_az)), np.cumsum(dlnrho, axis=1)], axis=1)
    ln_rho -= ln_rho.max(axis=1, keepdims=True)        # avoid overflow
    prof = np.exp(ln_rho)

    # column renormalisation: preserve each column's dust mass
    mass_col = (rho0 * v).sum(axis=1, keepdims=True)
    norm = (prof * v).sum(axis=1, keepdims=True)
    new = prof * (mass_col / np.maximum(norm, 1e-300))
    # keep empty columns empty
    new = np.where(mass_col > 0, new, 0.0)
    return new.reshape(C)


def viscous_heating_rate(para: Para, r_grid: np.ndarray,
                         volume: np.ndarray, rho_gas: np.ndarray,
                         Tgas: np.ndarray) -> np.ndarray:
    """Alpha-disc viscous dissipation per cell [W]
    (the para 'viscous heating, alpha_viscosity' switch):

        Gamma = 9/4 alpha rho_gas c_s^2 Omega   [W/m^3]

    with c_s^2 = k T / (mu m_H) and Omega = sqrt(G M_*/r^3); multiplied
    by the cell volume.  Fed to final_temperature(extra_heating=...) so
    the B&W balance becomes Qcool(T) = kappa*J_MC + Gamma/V."""
    alpha = para.physics.alpha_viscosity
    m_stars = sum(s.mass for s in para.stars) * cst.Msun_to_kg
    r_m = np.maximum(np.asarray(r_grid, np.float64), 1e-6) * cst.AU_to_m
    omega = np.sqrt(cst.Ggrav * m_stars / r_m ** 3)            # [1/s]
    cs2 = cst.kb * np.maximum(np.asarray(Tgas, np.float64), 2.7) \
        / (MU_GAS * M_H)                                       # [m^2/s^2]
    gamma = 2.25 * alpha * np.asarray(rho_gas, np.float64) * cs2 * omega
    return gamma * np.asarray(volume, np.float64) * cst.AU3_to_m3
