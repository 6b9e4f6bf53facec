"""Molecular chemistry cuts: freeze-out, photodissociation, photodesorption.

Reference: src/molecular_emission.f90:826-905 (freeze_out /
photo_dissociation) called from src/mol_transfer.f90:80-81.  The abundance
is depleted where the dust is cold (freeze-out onto grains, unless the
vertical column is low enough for photo-desorption to keep the molecule in
the gas) and where the vertical column density is too small to shield the
molecule from photodissociating UV.

All cuts operate on the *vertical* gas column density above each cell,
computed here as a cumulative sum over the z-stack of each (r, phi) column
— a host-side O(n_cells) prefix sum, not a per-cell ray integration.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants as cst
from ..grids import geometry as geom

# 0.8 * 1.59e21 cm^-2 in m^-2 (Qi et al 2011 threshold, ref
# molecular_emission.f90:836)
_THRESHOLD_CD = 0.8 * 1.59e21 * 1e4          # m^-2
_PHOTODISSOCIATION_DEPLETION = 1.0e-6        # ref :884
_MU_H2_G = 2.3 * 1.007825 / 6.022140857e23   # mean molecular weight [g]


@dataclass
class ChemistrySettings:
    """CLI-driven chemistry switches (ref init_mcfost.f90:778-798)."""
    freeze_out: bool = False
    T_freeze_out: float = 0.0
    freeze_out_depletion: float = 0.0
    photo_dissociation: bool = False
    photodissociation_factor: float = 1.0
    photo_desorption: bool = False

    @property
    def any(self) -> bool:
        return self.freeze_out or self.photo_dissociation


def vertical_gas_column(model, host, weight=None) -> np.ndarray:
    """H2 number column density above each cell [m^-2].

    Vertical prefix sum over each column of the structured grids
    (compute_vertical_CD role, ref optical_depth.f90).  For Voronoi
    meshes an isotropic estimate n_H2 * dz_local is a poor proxy, so we
    sort cells by |z| within nothing — instead we fall back to a coarse
    per-cell estimate n_H2 * (r_max - |z|) which is only used to gate
    chemistry cuts, never for radiation transport.
    """
    g2d = host.para.zones[0].gas_to_dust
    n_h2 = host.rho_dust * g2d / _MU_H2_G * 1e6      # m^-3
    if weight is not None:
        # e.g. molecular abundance for -mol_cd column densities
        n_h2 = n_h2 * np.asarray(weight, np.float64).reshape(n_h2.shape)
    shape = geom.cell_shape(model.grid)
    if len(shape) == 1:                              # Voronoi
        r = geom.host_arrays(model.grid, "r_grid")
        z = np.abs(geom.host_arrays(model.grid, "z_grid"))
        h = np.maximum(r.max() * 0.5 - z, 0.0)
        return n_h2 * h * cst.AU_to_m

    grid = model.grid
    nd = n_h2.reshape(shape)          # 2D: (nz, n_rad); 3D: (n_az, 2nz, n_rad)
    z_axis = 0 if len(shape) == 2 else 1
    nz_cells = shape[z_axis]
    try:
        zmax = np.asarray(geom.host_arrays(grid, "zmax"))   # (n_rad,) [AU]
        dz_col = zmax / (nz_cells // 2 if len(shape) == 3 else nz_cells)
        dz = np.broadcast_to(dz_col, shape)
    except (KeyError, TypeError, AttributeError):
        # spherical: theta stacks play z's role; use |z| spacing per column
        z = np.abs(geom.host_arrays(grid, "z_grid")).reshape(shape)
        dz = np.abs(np.gradient(z, axis=z_axis))
    col = nd * dz * cst.AU_to_m                      # column of each cell
    up = np.flip(np.cumsum(np.flip(col, z_axis), axis=z_axis), z_axis)
    if len(shape) == 2:
        # half-plane grid (z>0 mirrored): the surface is at high index
        cd = up - 0.5 * col
    else:
        # signed z: shield by the *nearer* surface
        down = np.cumsum(col, axis=z_axis)
        cd = np.minimum(up, down) - 0.5 * col
    return np.maximum(cd, 0.0).reshape(-1)


def apply_chemistry_cuts(model, host, T_dust: np.ndarray, abundance,
                         settings: ChemistrySettings,
                         verbose: bool = True) -> np.ndarray:
    """Per-cell abundance after freeze-out / photodissociation cuts.

    Mirrors freeze_out() and photo_dissociation()
    (molecular_emission.f90:828-905).
    """
    ab = np.broadcast_to(np.asarray(abundance, np.float64),
                         T_dust.shape).copy()
    if not settings.any:
        return ab
    cd = vertical_gas_column(model, host)
    if settings.freeze_out:
        cold = T_dust < settings.T_freeze_out
        if settings.photo_desorption:
            # photo-desorption keeps the molecule gaseous in low columns
            cold = cold & (cd >= _THRESHOLD_CD)
        ab[cold] *= settings.freeze_out_depletion
        if verbose:
            print(f"  freeze-out: {int(cold.sum())} cells "
                  f"below {settings.T_freeze_out} K")
    if settings.photo_dissociation:
        thin = cd < _THRESHOLD_CD * 0.65 * settings.photodissociation_factor
        ab[thin] *= _PHOTODISSOCIATION_DEPLETION
        if verbose:
            print(f"  photodissociation: {int(thin.sum())} cells depleted")
    return ab
