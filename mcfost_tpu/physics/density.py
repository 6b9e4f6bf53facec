"""Analytic zone densities on the grid.

Implements the reference's define_dust_density / normalize_dust_density for
the disk-family geometries (src/density.f90:404-923, :1892-2011) as
vectorized numpy over all cells:

  zone 1 (disk):          Sigma ~ r^p1,   rho ~ fact_exp * exp(-z^2/(2 h^2))
  zone 2 (tapered edge):  extra exp(-(r/Rc)^(2+p2))
  zone 3 (envelope):      rho ~ r^p1 (spherical radius)
  zone 4 (debris):        two-power-law radial x exp(-(|z|/h)^gamma)
  zone 5 (wall)

with h(r) = H0 (r/r0)^beta and the inner-edge Gaussian smoothing
(density.f90:585-598).  The result is numerically normalised so the summed
cell masses match each zone's dust mass (normalize_dust_density,
density.f90:1951-1977).
"""
from __future__ import annotations

import numpy as np

from .. import constants as cst
from ..config.para import Para


def compute_dust_density(para: Para, r_grid: np.ndarray, z_grid: np.ndarray,
                         volume: np.ndarray) -> np.ndarray:
    """Per-cell dust density [g/cm^3 of dust], numerically mass-normalised.

    r_grid/z_grid/volume: flat (n_cells,) arrays (cell centres, AU / AU^3).
    Volumes are the full mirrored-cell volumes, consistent with the grid.
    """
    rho = np.zeros_like(r_grid)
    for z in para.zones:
        h = z.scale_height * (r_grid / z.ref_radius) ** z.flaring_exp
        if z.geometry in (1, 2):
            fact = (r_grid / z.ref_radius) ** (z.surface_density_exp
                                               - z.flaring_exp)
            if z.geometry == 2:
                fact = fact * np.exp(-(r_grid / z.rc) ** (2.0 + z.gamma_exp))
            rho_z = fact * np.exp(-0.5 * (z_grid / h) ** 2)
        elif z.geometry == 3:  # envelope: spherical power law
            rsph = np.sqrt(r_grid ** 2 + z_grid ** 2)
            rho_z = rsph ** z.surface_density_exp
        elif z.geometry == 4:  # debris disk (Augereau+ 99)
            a_in, a_out = z.surface_density_exp, z.gamma_exp
            rr = r_grid / z.rc
            radial = (rr ** (-2 * a_in) + rr ** (-2 * a_out)) ** (-0.5)
            rho_z = radial * np.exp(
                -(np.abs(z_grid) / h) ** z.vert_profile_exp)
        else:
            raise NotImplementedError(f"zone geometry {z.geometry}")

        # radial mask + inner-edge smoothing (density.f90:581-598)
        inside = (r_grid >= z.rmin) & (r_grid <= z.rmax)
        if z.edge > 0:
            edge_fac = np.where(
                r_grid < z.rin,
                np.exp(-((r_grid - z.rin) ** 2) / (2 * z.edge ** 2)), 1.0)
            rho_z = rho_z * edge_fac
        rho_z = np.where(inside, rho_z, 0.0)

        # numeric normalisation to the zone dust mass
        # (normalize_dust_density, density.f90:1951-1963)
        total = (rho_z * volume).sum()
        if total > 0:
            mass_g = z.dust_mass * cst.Msun_to_g
            rho_z = rho_z * mass_g / (total * cst.AU3_to_cm3)
        rho = rho + rho_z
    return rho
