"""Diagnostic FITS outputs.

Mirrors the reference's observability surface (SURVEY §5):
* write_disk_struct (output.f90:1606): data_disk/{gas_density,
  dust_mass_density, grid, volume}.fits.gz;
* write_dust_prop (dust_prop.f90:1339): data_dust/{albedo, g, kappa,
  lambda}.fits.gz + phase function;
* optical-depth map (write_tau_map / compute_column,
  output.f90:1166 / optical_depth.f90:328).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from ..mc.model import Model, HostModel
from .fits import write_fits


def write_disk_struct(model: Model, host: HostModel, root_dir: str = "."):
    d = os.path.join(root_dir, "data_disk")
    os.makedirs(d, exist_ok=True)
    nz, n_rad = model.grid.nz, model.grid.n_rad
    g2d = host.para.zones[0].gas_to_dust
    rho_d = host.rho_dust.reshape(nz, n_rad)
    write_fits(os.path.join(d, "dust_mass_density.fits.gz"),
               rho_d.astype(np.float32), keywords={"BUNIT": "g.cm-3"})
    write_fits(os.path.join(d, "gas_density.fits.gz"),
               (rho_d * g2d).astype(np.float32),
               keywords={"BUNIT": "g.cm-3"})
    write_fits(os.path.join(d, "volume.fits.gz"),
               np.asarray(model.volume, np.float64).reshape(nz, n_rad)
               .astype(np.float32), keywords={"BUNIT": "AU3"})
    from ..grids import geometry as _geom
    grid_r = _geom.host_arrays(model.grid, "r_grid").reshape(nz, n_rad)
    grid_z = _geom.host_arrays(model.grid, "z_grid").reshape(nz, n_rad)
    write_fits(os.path.join(d, "grid.fits.gz"),
               np.stack([grid_r, grid_z]).astype(np.float32),
               keywords={"BUNIT": "AU"})


def write_dust_prop(model: Model, host: HostModel, root_dir: str = "."):
    d = os.path.join(root_dir, "data_dust")
    os.makedirs(d, exist_ok=True)
    dust = host.dust
    # opacity per gram of dust [cm^2/g]: kappa_unit [AU^-1/(g cm^-3)] / AU_to_cm
    kappa_cm2g = np.asarray(model.kappa, np.float64) / cst.AU_to_cm
    write_fits(os.path.join(d, "kappa.fits.gz"),
               kappa_cm2g.astype(np.float32),
               extensions=[host.wl.lam.astype(np.float64)],
               keywords={"BUNIT": "cm2.g-1"})
    write_fits(os.path.join(d, "albedo.fits.gz"),
               np.asarray(model.albedo, np.float32))
    write_fits(os.path.join(d, "g.fits.gz"),
               np.asarray(model.g_cell, np.float32))
    write_fits(os.path.join(d, "lambda.fits.gz"),
               host.wl.lam.astype(np.float64))
    write_fits(os.path.join(d, "phase_function.fits.gz"),
               np.asarray(model.s11_rt, np.float32))
    if dust.s12_rt is not None:
        write_fits(os.path.join(d, "polarizability.fits.gz"),
                   (-np.asarray(model.s12_rt, np.float64)).astype(np.float32))


def write_tau_map(model: Model, host: HostModel, ilam: int,
                  root_dir: str = ".", direction=(0.0, 0.0, 1.0)):
    """Vertical (or custom-direction) optical-depth map per cell column +
    midplane radial tau (integ_tau, optical_depth.f90:186-244)."""
    from ..transfer.raytrace import los_optical_depth
    d = os.path.join(root_dir, "data_disk")
    os.makedirs(d, exist_ok=True)
    dtype = model.kappa.dtype
    n_cells = model.grid.n_cells
    u, v, w = direction
    tau = los_optical_depth(
        model, model.grid.r_grid, jnp.zeros(n_cells, dtype),
        model.grid.z_grid,
        jnp.full(n_cells, u, dtype), jnp.full(n_cells, v, dtype),
        jnp.full(n_cells, w, dtype),
        jnp.full(n_cells, ilam, jnp.int32))
    nz, n_rad = model.grid.nz, model.grid.n_rad
    write_fits(os.path.join(d, "optical_depth_map.fits.gz"),
               np.asarray(tau, np.float64).reshape(nz, n_rad)
               .astype(np.float32),
               keywords={"LAMBDA": float(host.wl.lam[ilam])})
    return np.asarray(tau)
