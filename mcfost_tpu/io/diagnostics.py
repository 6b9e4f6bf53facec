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
    # -write_velocity: the per-cell velocity field rides with the disk
    # structure (lwrite_velocity + ldisk_struct, init_mcfost.f90:1440)
    if getattr(host.para, "write_velocity", False) \
            and host.velocity is not None:
        write_fits(os.path.join(d, "velocity.fits.gz"),
                   np.asarray(host.velocity, np.float64).T.reshape(
                       3, nz, n_rad).astype(np.float32),
                   keywords={"BUNIT": "m.s-1"})


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
    # -average_grain_size: surface-weighted <a> per bucket
    # (laverage_grain_size, init_mcfost.f90:638-640)
    if getattr(host.para, "average_grain_size", False):
        g_ = dust.grains
        n = g_.n_grains * g_.s_grain      # cross-section weighting
        a_avg = float((g_.r_grain * n).sum() / max(n.sum(), 1e-300))
        write_fits(os.path.join(d, "average_grain_size.fits.gz"),
                   np.float32(a_avg) * np.ones(1, np.float32),
                   keywords={"BUNIT": "micron"})
        print(f"  surface-weighted <a> = {a_avg:.4g} micron")


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


def write_tau_surface(model: Model, host: HostModel, ilam: int,
                      tau_s: float = 1.0, root_dir: str = "."):
    """tau=<s>_surface.fits.gz: xyz [AU] of the tau_s point along each image
    pixel ray, [3, RT_n_az, RT_n_incl, ny, nx] (write_tau_surface,
    output.f90:1052-1120)."""
    from ..transfer.raytrace import tau_surface_positions
    from ..grids import geometry as geom
    para = host.para
    dirs = np.asarray(model.rt_dirs, np.float64)
    n_rt = dirs.shape[0]
    npx, npy = para.maps.nx, para.maps.ny
    pix = para.maps.map_size / max(npx, npy)
    rmax = geom.model_extent(model.grid)[1]
    dtype = model.kappa.dtype
    out = np.zeros((n_rt, npy, npx, 3), np.float32)
    for i_rt in range(n_rt):
        u, v, w = dirs[i_rt]
        az = np.arctan2(u, -v) if (abs(u) > 1e-10 or abs(v + 1) > 1e-10) \
            else 0.0
        xpl = np.array([np.cos(az), np.sin(az), 0.0])
        ypl = -np.cross(xpl, [u, v, w])
        center = np.array([u, v, w]) * 10.0 * rmax
        corner = center - 0.5 * npx * pix * xpl - 0.5 * npy * pix * ypl
        ix, iy = np.meshgrid(np.arange(npx) + 0.5, np.arange(npy) + 0.5,
                             indexing="ij")
        px = corner[0] + ix * pix * xpl[0] + iy * pix * ypl[0]
        py = corner[1] + ix * pix * xpl[1] + iy * pix * ypl[1]
        pz = corner[2] + ix * pix * xpl[2] + iy * pix * ypl[2]
        n = px.size
        xs, ys, zs, found = tau_surface_positions(
            model, jnp.asarray(px.ravel(), dtype),
            jnp.asarray(py.ravel(), dtype), jnp.asarray(pz.ravel(), dtype),
            jnp.full(n, -u, dtype), jnp.full(n, -v, dtype),
            jnp.full(n, -w, dtype), jnp.full(n, ilam, jnp.int32),
            jnp.asarray(tau_s, dtype))
        for k, a in enumerate((xs, ys, zs)):
            out[i_rt, :, :, k] = np.asarray(a, np.float64).reshape(
                npx, npy).T
    n_incl, n_az = para.maps.n_incl, para.maps.n_az_angles
    arr = out.reshape(n_az, n_incl, npy, npx, 3).transpose(4, 0, 1, 2, 3)
    d = os.path.join(root_dir, "data_th")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"tau={tau_s:g}_surface.fits.gz")
    write_fits(path, np.ascontiguousarray(np.nan_to_num(arr)),
               keywords={"BUNIT": "AU",
                         "LAMBDA": float(host.wl.lam[ilam])})
    return path


def write_column_density(model: Model, host: HostModel, root_dir: str = "."):
    """column_density.fits.gz: vertical + radial gas/dust columns per cell
    [g cm^-2 and particles m^-2] (compute_column, optical_depth.f90:328)."""
    from ..physics.chemistry import vertical_gas_column, _MU_H2_G
    from ..grids import geometry as geom
    d = os.path.join(root_dir, "data_disk")
    os.makedirs(d, exist_ok=True)
    shape = geom.cell_shape(model.grid)
    cd_h2 = vertical_gas_column(model, host)              # m^-2
    # surface densities in g/cm^2: N_H2 * mu / (1e4 cm^2/m^2)
    sigma_gas = cd_h2 * _MU_H2_G / 1e4
    g2d = host.para.zones[0].gas_to_dust
    path = os.path.join(d, "column_density.fits.gz")
    write_fits(path, sigma_gas.reshape(shape).astype(np.float32),
               extensions=[(sigma_gas / max(g2d, 1e-30)).reshape(shape)
                           .astype(np.float32),
                           cd_h2.reshape(shape).astype(np.float32)],
               keywords={"BUNIT": "g.cm-2"})
    return path


def write_tau_to_cell(model: Model, host: HostModel, ilam: int,
                      root_dir: str = "."):
    """optical_depth_to_cell.fits.gz: optical depth from each cell along
    4 directions — toward the star, +z, -z, +r — at the threshold
    wavelength (write_optical_depth_to_cell -> write_column(2,...),
    output.f90:1424-1436,1469-1488)."""
    from ..transfer.raytrace import los_optical_depth
    from ..grids import geometry as geom
    r = geom.host_arrays(model.grid, "r_grid")
    z = geom.host_arrays(model.grid, "z_grid")
    try:
        phi = geom.host_arrays(model.grid, "phi_grid")
    except Exception:
        phi = np.zeros_like(r)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    dtype = model.kappa.dtype
    C = r.size
    xj, yj, zj = (jnp.asarray(a, dtype) for a in (x, y, z))
    il = jnp.full(C, ilam, jnp.int32)

    def tau_dir(u, v, w):
        return np.asarray(los_optical_depth(
            model, xj, yj, zj, jnp.asarray(u, dtype),
            jnp.asarray(v, dtype), jnp.asarray(w, dtype), il), np.float64)

    # toward the star (at the origin, like the reference's warning says):
    # tau(star->cell) = tau_to_inf(star, d) - tau_to_inf(cell, d) along
    # the shared line d = cell/|cell|
    d_len = np.maximum(np.sqrt(x * x + y * y + z * z), 1e-30)
    ux, uy, uz = x / d_len, y / d_len, z / d_len
    eps = 1e-6
    t_full = np.asarray(los_optical_depth(
        model, jnp.asarray(ux * eps, dtype), jnp.asarray(uy * eps, dtype),
        jnp.asarray(uz * eps, dtype), jnp.asarray(ux, dtype),
        jnp.asarray(uy, dtype), jnp.asarray(uz, dtype), il), np.float64)
    t_rem = tau_dir(ux, uy, uz)
    tau_star = np.maximum(t_full - t_rem, 0.0)
    one = np.ones(C)
    zero = np.zeros(C)
    cols = np.stack([tau_star, tau_dir(zero, zero, one),
                     tau_dir(zero, zero, -one),
                     tau_dir(np.cos(phi), np.sin(phi), zero)])
    d = os.path.join(root_dir, "data_disk")
    os.makedirs(d, exist_ok=True)
    shape = geom.cell_shape(model.grid)
    path = os.path.join(d, "optical_depth_to_cell.fits.gz")
    write_fits(path, cols.reshape((4,) + shape).astype(np.float32),
               keywords={"LAMBDA": float(host.wl.lam[ilam])})
    return path


def write_mol_column_density(model: Model, host: HostModel, abundance,
                             root_dir: str = ".",
                             subdir: str = "data_mol"):
    """Molecular column density above each cell [molecules m^-2 and
    g cm^-2-equivalent H2] (-mol_cd; write_mol_column_density ->
    write_column(3,...), output.f90:1454-1465)."""
    from ..physics.chemistry import vertical_gas_column, _MU_H2_G
    from ..grids import geometry as geom
    cd_mol = vertical_gas_column(model, host, weight=abundance)   # m^-2
    d = os.path.join(root_dir, subdir)
    os.makedirs(d, exist_ok=True)
    shape = geom.cell_shape(model.grid)
    path = os.path.join(d, "column_density.fits.gz")
    write_fits(path, cd_mol.reshape(shape).astype(np.float32),
               keywords={"BUNIT": "m-2"})
    return path


def write_origin(model: Model, orig, root_dir: str = ".",
                 subdir: str = "data_th", lam_sel=None):
    """origine.fits.gz: per-cell fraction of the escaped packet energy
    that was last emitted in each cell (write_origin,
    output.f90:1366-1420; star/ISM origin normalised in).

    orig: flat (L*(C+1),) origin tally from the MC (slot C = star)."""
    C = model.grid.n_cells
    o = np.asarray(orig, np.float64).reshape(-1, C + 1)
    if lam_sel is not None:
        o = o[lam_sel:lam_sel + 1]
    o = o.sum(0)
    o_star = o[C]
    o_disk = o[:C]
    tot = o_disk.sum() + o_star
    o_disk = o_disk / max(tot, 1e-300)
    d = os.path.join(root_dir, subdir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "origine.fits.gz")
    write_fits(path, o_disk.astype(np.float32),
               keywords={"O_STAR": float(o_star / max(tot, 1e-300))})
    return path


def write_reemission_stats(model: Model, nabs, root_dir: str = "."):
    """reemission_stats.fits.gz: number of absorption+reemission events
    per cell during the thermal MC (reemission_stats,
    output.f90:1553-1604)."""
    d = os.path.join(root_dir, "data_th")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "reemission_stats.fits.gz")
    write_fits(path, np.asarray(nabs, np.float32),
               keywords={"BUNIT": "count"})
    return path
