"""Ray-traced images (RT.fits.gz) at a single wavelength.

Pixel-grid sampling with fixed 2x2 supersampling (the reference iterates
adaptively between 2 and 6 refinement levels, intensite_pixel_dust,
dust_transfer.f90:1732-1790; a fixed first refinement covers the common
case and keeps the ray batch shape static — adaptive refinement rounds can
be layered on by re-integrating flagged pixels).

The star is added as a point source in its projected pixel with
line-of-sight extinction (compute_stars_map, dust_transfer.f90:1406-).
Output axes follow the reference contract [contrib, az, incl, ny, nx]
(ecriture_map_ray_tracing, output.f90:798-1048; docs/outputs.rst:52-77).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from ..mc.model import Model, HostModel
from .raytrace import (N_TYPE, assemble_source_function, integrate_rays,
                       los_optical_depth)


def image_rt(model: Model, host: HostModel, xi, T_cells,
             n_sent_per_lambda, n_az_rt: int = 45, subpix: int = 2,
             lam_index: int = 0):
    """Ray-traced image for every RT direction at wavelength index lam_index.

    Returns (nRT, ny, nx, N_TYPE) lambda.F_lambda in W/m^2/pixel."""
    para = host.para
    n_rt = model.rt_dirs.shape[0]
    dtype = model.kappa.dtype
    dirs = np.asarray(model.rt_dirs, np.float64)
    npx, npy = para.maps.nx, para.maps.ny
    map_size = para.maps.map_size

    eps = assemble_source_function(model, host, xi, T_cells,
                                   n_sent_per_lambda, n_az_rt)

    from ..grids import geometry as _geom
    rmax = _geom.model_extent(model.grid)[1]
    dist2 = (para.maps.distance * cst.pc_to_AU) ** 2
    pix = map_size / max(npx, npy)                  # [AU]
    out = np.zeros((n_rt, npy, npx, N_TYPE))

    pa = np.deg2rad(para.maps.disk_pa + 90.0)       # reference ang_disque

    for i_rt in range(n_rt):
        u, v, w = dirs[i_rt]
        az = np.arctan2(u, -v) if (abs(u) > 1e-10 or abs(v + 1) > 1e-10) \
            else 0.0
        xpl = np.array([np.cos(az), np.sin(az), 0.0])
        ypl = -np.cross(xpl, [u, v, w])
        # disk PA rotation about the viewing axis
        if abs(pa) > 1e-10:
            ca, sa = np.cos(pa), np.sin(pa)
            uvw = np.array([u, v, w])
            def rot(vec):
                return (vec * ca + np.cross(uvw, vec) * sa
                        + uvw * np.dot(uvw, vec) * (1 - ca))
            xpl = rot(xpl)
            ypl = rot(ypl)

        lfar = 10.0 * rmax
        center = np.array([u, v, w]) * lfar
        corner = center - 0.5 * npx * pix * xpl - 0.5 * npy * pix * ypl

        # subpixel centres
        offs = (np.arange(subpix) + 0.5) / subpix
        ix, iy, sx, sy = np.meshgrid(np.arange(npx), np.arange(npy),
                                     offs, offs, indexing="ij")
        fx = (ix + sx).ravel()
        fy = (iy + sy).ravel()
        px = corner[0] + fx * pix * xpl[0] + fy * pix * ypl[0]
        py = corner[1] + fx * pix * xpl[1] + fy * pix * ypl[1]
        pz = corner[2] + fx * pix * xpl[2] + fy * pix * ypl[2]
        n = px.size

        st = np.asarray(integrate_rays(
            model, eps,
            jnp.asarray(px, dtype), jnp.asarray(py, dtype),
            jnp.asarray(pz, dtype),
            jnp.full(n, -u, dtype), jnp.full(n, -v, dtype),
            jnp.full(n, -w, dtype),
            jnp.full(n, lam_index, jnp.int32),
            jnp.full(n, i_rt, jnp.int32)), np.float64)
        st = st.reshape(npx, npy, subpix * subpix, N_TYPE).mean(2)
        out[i_rt] = st.transpose(1, 0, 2) * (pix ** 2 / dist2)

        # star: point source in its projected pixel
        tau = float(np.asarray(los_optical_depth(
            model, jnp.asarray([1e-4], dtype), jnp.asarray([0.0], dtype),
            jnp.asarray([1e-5], dtype),
            jnp.asarray([u], dtype), jnp.asarray([v], dtype),
            jnp.asarray([w], dtype),
            jnp.asarray([lam_index], jnp.int32)))[0])
        fstar = (2.0 * np.pi * cst.hp * cst.c_light ** 2
                 * host.stars.E_stars[lam_index]
                 * (host.wl.lam[lam_index] * 1e-6)
                 / (4.0 * np.pi * dist2) * np.exp(-tau))
        # projected star position (centred star -> image centre)
        cx, cy = npx // 2, npy // 2
        out[i_rt, cy, cx, 0] += fstar
        out[i_rt, cy, cx, 4] += fstar
    return out
