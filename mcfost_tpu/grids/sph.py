"""SPH particles -> Voronoi model grid.

Mirrors the reference pipeline SPH_to_Voronoi (src/SPH2mcfost.f90:176-635):
particle culling, bounding-box selection, Voronoi tessellation (native
C++, grids/voronoi.py), and density assignment rho_cell = m_particle /
V_cell which conserves total mass exactly.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants as cst
from ..io.phantom import SPHModel
from .voronoi import VoronoiGrid, build_voronoi_grid


@dataclass
class VoronoiModel:
    grid: VoronoiGrid
    rho_gas: np.ndarray         # (N,) [g/cm^3]
    rho_dust: np.ndarray        # (N,) [g/cm^3]
    keep: np.ndarray            # (N_orig,) bool mask of kept particles
    star_xyz: np.ndarray
    star_mass: np.ndarray


def cull_particles(sph: SPHModel, bbox=None, rmax: float | None = None,
                   delete_inside_r: float | None = None,
                   latitude_max: float | None = None) -> np.ndarray:
    """Particle masking (mess_up_SPH, src/mess_up_SPH.f90:17-174):
    radius cuts, inner hole, latitude cut.  Returns a keep mask."""
    keep = np.ones(sph.xyz.shape[0], bool)
    r = np.linalg.norm(sph.xyz, axis=1)
    if rmax is not None:
        keep &= r <= rmax
    if delete_inside_r is not None:
        keep &= r >= delete_inside_r
    if latitude_max is not None:
        rcyl = np.linalg.norm(sph.xyz[:, :2], axis=1)
        keep &= np.abs(np.arctan2(sph.xyz[:, 2],
                                  np.maximum(rcyl, 1e-30))) <= latitude_max
    if bbox is not None:
        b = np.asarray(bbox)
        keep &= ((sph.xyz[:, 0] >= b[0]) & (sph.xyz[:, 0] <= b[1])
                 & (sph.xyz[:, 1] >= b[2]) & (sph.xyz[:, 1] <= b[3])
                 & (sph.xyz[:, 2] >= b[4]) & (sph.xyz[:, 2] <= b[5]))
    return keep


def sph_to_voronoi(sph: SPHModel, bbox=None, gas_to_dust: float = 100.0,
                   max_nb: int = 32, jitter: float = 0.0,
                   **cull_kw) -> VoronoiModel:
    """Tessellate the kept particles and assign densities.

    bbox defaults to the 1-99 percentile extent padded by 10% (the
    reference uses fixed 'phantom.limits' boxes or -limits files,
    init_mcfost.f90:1006)."""
    if bbox is None:
        lo = np.percentile(sph.xyz, 1, axis=0)
        hi = np.percentile(sph.xyz, 99, axis=0)
        pad = 0.1 * (hi - lo)
        bbox = np.stack([lo - pad, hi + pad], -1).reshape(-1)
    keep = cull_particles(sph, bbox=bbox, **cull_kw)
    xyz = sph.xyz[keep]
    mass = sph.mass[keep]

    grid = build_voronoi_grid(xyz, bbox, max_nb=max_nb, jitter=jitter)
    vol_cm3 = np.asarray(grid.volume, np.float64) * cst.AU3_to_cm3
    rho_gas = mass / np.maximum(vol_cm3, 1e-300)       # g/cm^3

    if sph.dustfrac is not None:
        rho_dust = rho_gas * sph.dustfrac.sum(0)[keep]
    else:
        rho_dust = rho_gas / gas_to_dust
    return VoronoiModel(grid=grid, rho_gas=rho_gas, rho_dust=rho_dust,
                        keep=keep, star_xyz=sph.star_xyz,
                        star_mass=sph.star_mass)
