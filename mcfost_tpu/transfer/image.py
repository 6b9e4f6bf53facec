"""Ray-traced images (RT.fits.gz) at a single wavelength.

Pixel-grid sampling with ADAPTIVE sub-pixel refinement: every pixel starts
at 1 then 2 sub-rays per axis (the reference's n_iter_min=2), and pixels
whose Stokes I changed by more than 1e-2 relative keep doubling their
sub-sampling up to 2^5 per axis (intensite_pixel_dust,
dust_transfer.f90:1701-1804).  TPU shape discipline: each refinement round
re-integrates only the flagged pixels, padded to the next power of two so
the ray-batch shapes XLA compiles stay bounded.

Stars are mapped by Monte-Carlo sampling each stellar disk: random points
on the photosphere, per-ray line-of-sight extinction, cos(theta) (+ limb
darkening) weighting, binned into their TRUE projected pixels — resolved
stars get up to ~100 rays per covered pixel (compute_stars_map,
dust_transfer.f90:1406-1616).  Multi-star models put each star at its own
projected position with its own spectrum share (cdf_star).

Output axes follow the reference contract [contrib, az, incl, ny, nx]
(ecriture_map_ray_tracing, output.f90:798-1048; docs/outputs.rst:52-77).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from ..mc.model import Model, HostModel
from .raytrace import (N_TYPE,
                       assemble_source_function_rt2, integrate_rays,
                       integrate_rays_rt2, los_optical_depth)


def _next_pow2(n: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(n, 1)))), 0)


def _subpixel_points(corner, pix, xpl, ypl, ii, jj, s):
    """Ray origins for pixels (ii, jj) with s x s sub-sampling."""
    offs = (np.arange(s) + 0.5) / s
    sx, sy = np.meshgrid(offs, offs, indexing="ij")
    fx = (ii[:, None, None] + sx[None]).ravel()
    fy = (jj[:, None, None] + sy[None]).ravel()
    px = corner[0] + fx * pix * xpl[0] + fy * pix * ypl[0]
    py = corner[1] + fx * pix * xpl[1] + fy * pix * ypl[1]
    pz = corner[2] + fx * pix * xpl[2] + fy * pix * ypl[2]
    return px, py, pz


def image_rt(model: Model, host: HostModel, xi, T_cells,
             n_sent_per_lambda, n_az_rt: int = 45, lam_index: int = 0,
             scheme: str = "rt1", precision: float = 1e-2,
             n_iter_min: int = 2, n_iter_max: int = 6,
             nang_rt: int = 15, n_theta_i: int = 15, n_phi_i: int = 15,
             seed: int = 1234):
    """Ray-traced image for every RT direction at wavelength index lam_index.

    Returns (nRT, ny, nx, N_TYPE) lambda.F_lambda in W/m^2/pixel."""
    para = host.para
    n_rt = model.rt_dirs.shape[0]
    dtype = model.kappa.dtype
    dirs = np.asarray(model.rt_dirs, np.float64)
    npx, npy = para.maps.nx, para.maps.ny
    map_size = para.maps.map_size

    if scheme == "rt1":
        from .raytrace import source_tables
        fac1, jth1 = source_tables(model, host, T_cells,
                                   n_sent_per_lambda, n_az_rt)

    from ..grids import geometry as _geom
    rmax = _geom.model_extent(model.grid)[1]
    dist2 = (para.maps.distance * cst.pc_to_AU) ** 2
    pix = map_size / max(npx, npy)                  # [AU]
    out = np.zeros((n_rt, npy, npx, N_TYPE))

    # reference ang_disque; -old_PA restores the pre-2019 convention
    # (+90 deg, init_mcfost.f90:1780)
    pa = np.deg2rad(para.maps.disk_pa + 90.0
                    + (90.0 if getattr(para, "old_pa", False) else 0.0))

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

        if scheme == "rt2":
            eps2, istar_src = assemble_source_function_rt2(
                model, host, xi, T_cells, n_sent_per_lambda, i_rt,
                nang_rt=nang_rt, n_theta_i=n_theta_i, n_phi_i=n_phi_i)
            istar_j = jnp.asarray(istar_src, dtype)

        def integ(px, py, pz):
            n = px.size
            args = (jnp.asarray(px, dtype), jnp.asarray(py, dtype),
                    jnp.asarray(pz, dtype),
                    jnp.full(n, -u, dtype), jnp.full(n, -v, dtype),
                    jnp.full(n, -w, dtype),
                    jnp.full(n, lam_index, jnp.int32))
            if scheme == "rt1":
                return np.asarray(integrate_rays(
                    model, xi, fac1, jth1, *args, i_rt,
                    n_az_rt=n_az_rt), np.float64)
            return np.asarray(integrate_rays_rt2(model, eps2, istar_j,
                                                 *args, nang_rt=nang_rt),
                              np.float64)

        # ---- adaptive sub-pixel refinement
        ii, jj = np.meshgrid(np.arange(npx), np.arange(npy), indexing="ij")
        ii, jj = ii.ravel(), jj.ravel()
        P = ii.size
        vals = integ(*_subpixel_points(corner, pix, xpl, ypl, ii, jj, 1))
        vals = vals.reshape(P, N_TYPE)
        active = np.arange(P)
        for it in range(1, n_iter_max):
            s = 2 ** it
            if it >= n_iter_min:
                d = np.abs(res[:, 0] - prev0)
                keep = d > precision * np.maximum(prev0, 1e-300)
                active = active[keep]
                if active.size == 0:
                    break
            # pad the flagged set to a power of two: bounded XLA shapes
            npad = _next_pow2(active.size)
            ap = np.concatenate([active,
                                 np.zeros(npad - active.size, np.int64)])
            prev0 = vals[active, 0]
            res = integ(*_subpixel_points(corner, pix, xpl, ypl,
                                          ii[ap], jj[ap], s))
            res = res.reshape(npad, s * s, N_TYPE).mean(1)[:active.size]
            vals[active] = res
        st = vals.reshape(npx, npy, N_TYPE)
        out[i_rt] = st.transpose(1, 0, 2) * (pix ** 2 / dist2)

        # ---- star maps: MC over each stellar disk (compute_stars_map)
        out[i_rt] += _stars_map(model, host, lam_index, u, v, w, xpl, ypl,
                                corner, pix, npx, npy, dist2, dtype, seed)
    return out


def _limb_law(para):
    """(mu, I(mu)) of the -limb_darkening argument: a linear coefficient or
    a 2-column file (read_limb_darkening_file, input.f90:628); None when
    limb darkening is off."""
    ld = getattr(para, "limb_darkening", None)
    if not ld:
        return None
    try:
        u_c = float(ld)
        mu = np.linspace(0.0, 1.0, 64)
        return mu, 1.0 - u_c * (1.0 - mu)
    except (TypeError, ValueError):
        arr = np.loadtxt(ld)
        order = np.argsort(arr[:, 0])
        return arr[order, 0], arr[order, 1]


def _stars_map(model: Model, host: HostModel, lam_index, u, v, w,
               xpl, ypl, corner, pix, npx, npy, dist2, dtype,
               seed: int = 1234, n_ray_base: int = 1024,
               n_ray_cap: int = 131072):
    """Per-star projected maps with LOS extinction + limb darkening
    (compute_stars_map, dust_transfer.f90:1406-1616).  Flux calibration:
    each star carries its cdf_star share of E_stars; the MC only
    distributes it over pixels and applies per-ray extinction."""
    S = int(model.star_r.shape[0])
    star_pos = np.asarray(model.star_pos, np.float64)
    star_r = np.asarray(model.star_r, np.float64)
    cdf = np.asarray(model.cdf_star, np.float64)        # (L, S+1)
    e_frac = np.maximum(cdf[lam_index, 1:] - cdf[lam_index, :-1], 0.0)
    if e_frac.sum() <= 0:
        e_frac = np.full(S, 1.0 / S)
    lamflam_tot = (2.0 * np.pi * cst.hp * cst.c_light ** 2
                   * host.stars.E_stars[lam_index]
                   * (host.wl.lam[lam_index] * 1e-6) / (4.0 * np.pi * dist2))

    rng = np.random.default_rng(seed)
    obs = np.array([u, v, w])
    out = np.zeros((npy, npx, N_TYPE))
    for istar in range(S):
        r = star_r[istar]
        resolved = 2.0 * r > pix
        n_ray = n_ray_base
        if resolved:
            n_ray = int(min(max(100 * 4 * np.pi * (r / pix) ** 2,
                                n_ray_base), n_ray_cap))
        # random points on the VISIBLE hemisphere (mirror hidden ones)
        zr = 2.0 * rng.random(n_ray) - 1.0
        ar = np.pi * (2.0 * rng.random(n_ray) - 1.0)
        sr = np.sqrt(np.maximum(1.0 - zr ** 2, 0.0))
        nvec = np.stack([sr * np.cos(ar), sr * np.sin(ar), zr], 1)
        cosb = nvec @ obs
        nvec = np.where(cosb[:, None] < 0.0, -nvec, nvec)
        cos_thet = np.abs(cosb)
        # uniform-disk brightness needs the cos(theta) projection weight
        wgt = cos_thet
        limb = _limb_law(host.para)
        if limb is not None:
            wgt = wgt * np.interp(cos_thet, limb[0], limb[1])
        p = star_pos[istar][None, :] + nvec * (r * (1.0 + 1e-6))
        tau = np.asarray(los_optical_depth(
            model, jnp.asarray(p[:, 0], dtype), jnp.asarray(p[:, 1], dtype),
            jnp.asarray(p[:, 2], dtype),
            jnp.full(n_ray, u, dtype), jnp.full(n_ray, v, dtype),
            jnp.full(n_ray, w, dtype),
            jnp.full(n_ray, lam_index, jnp.int32)), np.float64)
        # projected pixel of each surface point
        rel = p - corner[None, :]
        fx = rel @ xpl / pix
        fy = rel @ ypl / pix
        i = np.floor(fx).astype(np.int64)
        j = np.floor(fy).astype(np.int64)
        in_map = (i >= 0) & (i < npx) & (j >= 0) & (j < npy)
        flux = wgt * np.exp(-tau)
        denom = wgt.sum()
        if denom <= 0:
            continue
        amp = lamflam_tot * e_frac[istar] / denom
        m = np.zeros((npy, npx))
        np.add.at(m, (j[in_map], i[in_map]), flux[in_map] * amp)
        out[..., 0] += m
        out[..., 4] += m
    return out
