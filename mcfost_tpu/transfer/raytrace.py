"""Ray-traced observables (images and SEDs) from the MC radiation field.

Implements the reference's RT1 scheme end-to-end, vectorized over rays:

1. during the monochromatic MC the kernel tallies the scattered specific
   intensity toward each observer direction per (wavelength, cell, azimuth
   bin, z-sign) — `xi` in mc/thermal_mc.py (xI_scatt,
   reference dust_ray_tracing.f90:480-632);
2. the source function per cell combines that scattered field with the
   thermal dust emissivity (init_dust_source_fct1,
   dust_ray_tracing.f90:636-713; calc_Jth :810-860);
3. backward formal integration I = sum exp(-tau) (1-exp(-dtau)) S along
   parallel rays (integ_ray_dust, optical_depth.f90:1327-1421), over
   - log-r annuli samples for SEDs (dust_map method 1,
     dust_transfer.f90:1284-1344), or
   - a pixel grid with supersampling for images (method 2,
     dust_transfer.f90:1345-1382);
4. the direct stellar contribution is added with its line-of-sight
   extinction (compute_stars_map, dust_transfer.f90:1406-...).

All rays march concurrently in one while_loop — the TPU replacement for the
reference's OpenMP pixel loop.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from ..grids import geometry as cyl
from ..mc.model import Model, HostModel
from ..physics.stars import bb_shape


N_TYPE = 8   # I, Q, U, V, star_direct, star_scat, disk_th, disk_scat


def assemble_source_function(model: Model, host: HostModel,
                             xi: jax.Array, T_cells: np.ndarray,
                             n_sent_per_lambda: np.ndarray,
                             n_az_rt: int = 45):
    """Source function eps (L, n_cells, n_az_rt, 2, nRT, N_TYPE).

    Follows init_dust_source_fct1 (dust_ray_tracing.f90:636-713):
      photon_energy = (E_stars + E_disk) lambda 1e-6 / (n_sent AU_to_cm pi)
      I_scatt = xi * photon_energy / V * (n_az_rt*2) * kappa_sca
      eps     = (I_scatt + J_th) / kappa_ext
    """
    wl = host.wl
    L = wl.n
    n_cells = model.grid.n_cells
    n_rt = model.rt_dirs.shape[0]
    dtype = model.kappa.dtype

    p_c = np.asarray(model.p_icell)
    kabs = np.asarray(model.kappa_abs, np.float64)[p_c].T    # (L, C)
    kext = np.asarray(model.kappa, np.float64)[p_c].T        # (L, C)
    alb = np.asarray(model.albedo, np.float64)[p_c].T        # (L, C)
    rho = host.rho_dust
    V = np.asarray(model.volume, np.float64)

    # E_disk for the photon-energy normalisation (repartition_energie)
    wl_m = wl.lam * 1e-6
    cst_wl = cst.thermal_const / np.maximum(
        np.outer(wl_m, T_cells), 1e-30) * 0 + \
        cst.thermal_const / np.maximum(T_cells[None, :] * wl_m[:, None], 1e-30)
    ok = cst_wl < 500.0
    planck = np.where(ok, 1.0 / (wl_m[:, None] ** 5
                                 * (np.exp(np.minimum(cst_wl, 500.0)) - 1.0)),
                      0.0)
    E_cell = 4.0 * kabs * (rho * V)[None, :] * planck
    E_disk = E_cell.sum(1)
    E_star = host.stars.E_stars

    photon_energy = ((E_star + E_disk) * wl.lam * 1e-6
                     / (np.maximum(n_sent_per_lambda, 1.0)
                        * cst.AU_to_cm * np.pi))          # (L,)

    kext_cell = kext * rho[None, :]                       # (L, C)
    ksca_cell = kext_cell * alb

    # thermal emissivity J_th (calc_Jth, dust_ray_tracing.f90:826-850)
    j_th = (2.0 * cst.hp * cst.c_light ** 2 * planck * wl_m[:, None]
            * kabs * rho[None, :])                        # (L, C)

    factor = (photon_energy[:, None] / V[None, :]
              * (n_az_rt * 2))                            # (L, C)

    xi = xi.reshape(L, n_cells, n_az_rt, 2, n_rt, 6)
    fac = jnp.asarray((factor * ksca_cell
                       / np.maximum(kext_cell, 1e-300)), dtype)
    i_scatt = xi * fac[:, :, None, None, None, None]

    eps = jnp.zeros((L, n_cells, n_az_rt, 2, n_rt, N_TYPE), dtype)
    jth_term = jnp.asarray(j_th / np.maximum(kext_cell, 1e-300), dtype)
    jth_b = jth_term[:, :, None, None, None]
    eps = eps.at[..., 0].set(i_scatt[..., 0] + jth_b)
    eps = eps.at[..., 1].set(i_scatt[..., 1])
    eps = eps.at[..., 2].set(i_scatt[..., 2])
    eps = eps.at[..., 3].set(i_scatt[..., 3])
    eps = eps.at[..., 5].set(i_scatt[..., 4])             # star scat
    eps = eps.at[..., 6].set(jth_b)                       # disk thermal
    eps = eps.at[..., 7].set(i_scatt[..., 5])             # disk scat
    return eps


def _move_to_grid(grid: cyl.CylGrid, x, y, z, u, v, w):
    """Advance rays from outside to the model boundary
    (move_to_grid_cyl, cylindrical_grid.f90:1284-1411). Returns new
    positions, (ri, zj) and a hit mask."""
    dtype = x.dtype
    big = jnp.asarray(1.0e30, dtype)
    # entry margin: must exceed accumulated f32 rounding of the quadratic
    # solve at r of a few hundred AU; 1e-4 relative is optically negligible
    cm = 1.0 - 1e-6 if dtype == jnp.float64 else 1.0 - 2e-4
    R2 = grid.r_lim2[-1] * cm
    zmaxmax = jnp.max(grid.zmax) * cm

    a = u * u + v * v
    vert = a < 1e-20
    a_s = jnp.maximum(a, 1e-20)
    b = (x * u + y * v) / a_s
    c = (x * x + y * y - R2) / a_s
    delta = b * b - c
    rac = jnp.sqrt(jnp.maximum(delta, 0.0))
    s1 = jnp.where(vert | (delta < 0.0), big, -b - rac)
    s2 = jnp.where(vert | (delta < 0.0), big, -b + rac)

    w_s = jnp.where(jnp.abs(w) > 1e-20, w, 1e-20)
    horiz = jnp.abs(w * z) < 1e-30
    zlim = jnp.sign(z) * zmaxmax
    t1 = jnp.where(horiz, big, (zlim - z) / w_s)
    t2 = jnp.where(horiz, big, (-zlim - z) / w_s)

    # branch logic (cylindrical_grid.f90:1365-1398)
    enter_cyl_first = t1 > s1
    dv_a = jnp.where(t1 > s2, s1, t1)      # if exits cylinder before slab,
    ok_a = jnp.where(t1 > s2,
                     jnp.abs(z + s1 * w) <= zmaxmax / cm, True)
    dv_b = s1
    ok_b = ~(t2 < s1)
    delta_vol = jnp.where(enter_cyl_first, dv_a, dv_b)
    hit = jnp.where(enter_cyl_first, ok_a, ok_b)
    # vertical rays never meet the cylinder: enter through the slab if the
    # cylindrical radius is inside the outer wall
    delta_vol = jnp.where(vert, t1, delta_vol)
    hit = jnp.where(vert, (x * x + y * y < R2) & (t1 >= 0.0), hit)
    hit = hit & (delta_vol < big * 0.5) & (delta_vol >= 0.0)

    x1 = x + delta_vol * u
    y1 = y + delta_vol * v
    z1 = z + delta_vol * w
    ri, zj = cyl.index_cell(grid, x1, y1, z1)
    return x1, y1, z1, ri, zj, hit


@functools.partial(jax.jit, static_argnames=("max_steps",))
def integrate_rays(model: Model, eps: jax.Array, x0, y0, z0, u, v, w,
                   ilam, i_rt, max_steps: int = 4000):
    """Backward formal integration along a batch of rays.

    eps: (L, n_cells, n_az_rt, 2, nRT, N_TYPE) source function.
    Returns Stokes (Nrays, N_TYPE).  Rays that hit the star are terminated
    (their direct-star flux is handled by the star map)."""
    grid = model.grid
    dtype = x0.dtype
    n_cells = grid.n_cells
    n_az_rt = eps.shape[2]

    x, y, z, ri, zj, hit = cyl.move_to_grid(grid, x0, y0, z0, u, v, w)

    N = x.shape[0]
    out = jnp.zeros((N, N_TYPE), dtype)
    tau = jnp.zeros(N, dtype)
    alive = hit & ~cyl.has_exited(grid, ri, zj, z)

    def cond(state):
        return jnp.any(state[-1]) & (state[0] < max_steps)

    def body(state):
        it, x, y, z, ri, zj, tau, out, alive = state
        inside = cyl.is_inside(grid, ri, zj)
        flat = jnp.clip(cyl.flat_index(grid, ri, zj), 0, n_cells - 1)
        kext = jnp.where(inside, model.kappa[model.p_icell[flat], ilam]
                         * model.kappa_factor[flat], 0.0)
        x1, y1, z1, ri1, zj1, l = cyl.cross_cell(grid, x, y, z, u, v, w,
                                                 ri, zj)
        dtau = l * kext

        xm = 0.5 * (x + x1)
        ym = 0.5 * (y + y1)
        zm = 0.5 * (z + z1)
        phi_pos = jnp.arctan2(xm, ym)
        kphi = jnp.clip((jnp.mod(phi_pos, 2 * jnp.pi)
                         / (2 * jnp.pi) * n_az_rt).astype(jnp.int32),
                        0, n_az_rt - 1)
        psup = jnp.where(zm > 0.0, 0, 1)

        S = eps[ilam, flat, kphi, psup, i_rt]             # (N, N_TYPE)
        # -expm1 keeps (1 - exp(-dtau)) accurate for small dtau in f32
        wgt = jnp.where(alive & inside,
                        jnp.exp(-tau) * (-jnp.expm1(-dtau)), 0.0)
        out = out + wgt[:, None] * S

        tau = tau + jnp.where(alive, dtau, 0.0)
        x = jnp.where(alive, x1, x)
        y = jnp.where(alive, y1, y)
        z = jnp.where(alive, z1, z)
        ri = jnp.where(alive, ri1, ri)
        zj = jnp.where(alive, zj1, zj)

        # star termination: entering the cavity and aimed at the star
        in_cav = ri == 0
        t_ca = -(x * u + y * v + z * w)
        d2 = x * x + y * y + z * z - t_ca * t_ca
        hit_star = in_cav & (t_ca > 0) & (d2 < model.star_r[0] ** 2)

        alive = (alive & ~cyl.has_exited(grid, ri, zj, z)
                 & (tau < 50.0) & ~hit_star)
        return it + 1, x, y, z, ri, zj, tau, out, alive

    state = (jnp.zeros((), jnp.int32), x, y, z, ri, zj, tau, out, alive)
    state = jax.lax.while_loop(cond, body, state)
    return state[7]


def los_optical_depth(model: Model, x0, y0, z0, u, v, w, ilam,
                      max_steps: int = 4000):
    """Optical depth from a point inside the grid to infinity along (u,v,w)
    (optical_length_tot, optical_depth.f90:248-324)."""
    grid = model.grid
    n_cells = grid.n_cells
    ri, zj = cyl.index_cell(grid, x0, y0, z0)

    def cond(state):
        return jnp.any(state[-1]) & (state[0] < max_steps)

    def body(state):
        it, x, y, z, ri, zj, tau, alive = state
        inside = cyl.is_inside(grid, ri, zj)
        flat = jnp.clip(cyl.flat_index(grid, ri, zj), 0, n_cells - 1)
        kext = jnp.where(inside, model.kappa[model.p_icell[flat], ilam]
                         * model.kappa_factor[flat], 0.0)
        x1, y1, z1, ri1, zj1, l = cyl.cross_cell(grid, x, y, z, u, v, w,
                                                 ri, zj)
        tau = tau + jnp.where(alive, l * kext, 0.0)
        x, y, z = (jnp.where(alive, a, b) for a, b in
                   ((x1, x), (y1, y), (z1, z)))
        ri = jnp.where(alive, ri1, ri)
        zj = jnp.where(alive, zj1, zj)
        alive = alive & ~cyl.has_exited(grid, ri, zj, z)
        return it + 1, x, y, z, ri, zj, tau, alive

    tau = jnp.zeros_like(x0)
    alive = ~cyl.has_exited(grid, ri, zj, z0)
    state = (jnp.zeros((), jnp.int32), x0, y0, z0, ri, zj, tau, alive)
    state = jax.lax.while_loop(cond, body, state)
    return state[6]


def sed_rt(model: Model, host: HostModel, xi, T_cells,
           n_sent_per_lambda, n_rad_rt: int = 128, n_phi_rt: int = 30,
           n_az_rt: int = 45):
    """Ray-traced SED for all wavelengths and RT directions.

    Log-annuli image-plane sampling (dust_map method 1,
    dust_transfer.f90:1284-1344).  Returns (L, nRT, N_TYPE) lambda.F_lambda
    in W/m^2."""
    para = host.para
    wl = host.wl
    L = wl.n
    n_rt = model.rt_dirs.shape[0]
    dtype = model.kappa.dtype
    dirs = np.asarray(model.rt_dirs, np.float64)

    eps = assemble_source_function(model, host, xi, T_cells,
                                   n_sent_per_lambda, n_az_rt)

    _rl = cyl.host_arrays(model.grid, "r_lim")
    rmax = float(_rl[-1])
    rmin = float(_rl[0])
    rmin_rt, rmax_rt = 0.01 * rmin, 2.0 * rmax
    fact_r = np.exp(np.log(rmax_rt / rmin_rt) / (n_rad_rt - 1))
    tab_r = rmin_rt * fact_r ** np.arange(n_rad_rt)
    fact_A = np.sqrt(np.pi * (fact_r - 1.0 / fact_r) / n_phi_rt)
    cst_phi = np.pi / n_phi_rt          # image symmetry: half plane
    phis = cst_phi * (np.arange(n_phi_rt) + 0.5)

    dist2 = (para.maps.distance * cst.pc_to_AU) ** 2
    out = np.zeros((L, n_rt, N_TYPE))

    for i_rt in range(n_rt):
        u, v, w = dirs[i_rt]
        # image plane basis (dust_map, dust_transfer.f90:1244-1258)
        xpl = np.array([1.0, 0.0, 0.0])
        if abs(u) > 1e-10 or abs(v + 1) > 1e-10:
            az = np.arctan2(u, -v)
            xpl = np.array([np.cos(az), np.sin(az), 0.0])
        ypl = -np.cross(xpl, [u, v, w])

        lfar = 10.0 * rmax
        center = np.array([u, v, w]) * lfar

        rr, pp = np.meshgrid(tab_r, phis, indexing="ij")
        px = (center[0] + rr * np.sin(pp) * xpl[0]
              + rr * np.cos(pp) * ypl[0]).ravel()
        py = (center[1] + rr * np.sin(pp) * xpl[1]
              + rr * np.cos(pp) * ypl[1]).ravel()
        pz = (center[2] + rr * np.sin(pp) * xpl[2]
              + rr * np.cos(pp) * ypl[2]).ravel()
        pix_area = ((fact_A * rr) ** 2).ravel()           # AU^2
        n_pix = px.size

        # one ray batch for ALL wavelengths of this direction
        xs = jnp.asarray(np.tile(px, L), dtype)
        ys = jnp.asarray(np.tile(py, L), dtype)
        zs = jnp.asarray(np.tile(pz, L), dtype)
        us = jnp.full(n_pix * L, -u, dtype)
        vs = jnp.full(n_pix * L, -v, dtype)
        ws = jnp.full(n_pix * L, -w, dtype)
        il = jnp.asarray(np.repeat(np.arange(L), n_pix), jnp.int32)
        ir = jnp.full(n_pix * L, i_rt, jnp.int32)
        st = np.asarray(integrate_rays(model, eps, xs, ys, zs,
                                       us, vs, ws, il, ir), np.float64)
        st = st.reshape(L, n_pix, N_TYPE)
        out[:, i_rt, :] += (st * pix_area[None, :, None]).sum(1) / dist2

        # direct star term (compute_stars_map analogue): stellar flux
        # attenuated along the LOS from the star centre
        t = los_optical_depth(
            model,
            jnp.full(L, 1e-4, dtype), jnp.zeros(L, dtype),
            jnp.full(L, 1e-5, dtype),
            jnp.full(L, u, dtype), jnp.full(L, v, dtype),
            jnp.full(L, w, dtype), jnp.asarray(np.arange(L), jnp.int32))
        tau_star = np.asarray(t, np.float64)
        fstar = (2.0 * np.pi * cst.hp * cst.c_light ** 2 * host.stars.E_stars
                 * (wl.lam * 1e-6) / (4.0 * np.pi * dist2)
                 * np.exp(-tau_star))
        out[:, i_rt, 0] += fstar
        out[:, i_rt, 4] += fstar

    return out


@functools.partial(jax.jit, static_argnames=("max_steps",))
def tau_surface_positions(model: Model, x0, y0, z0, u, v, w, ilam,
                          tau_s, max_steps: int = 4000):
    """Position along each ray where the accumulated optical depth first
    reaches ``tau_s`` (-tau=1_surface; reference compute_tau_surface role,
    optical_depth.f90 + output.f90:1052-1120).

    Returns (x, y, z, found) — found=False where the ray exits the model
    before reaching tau_s (position reported as NaN, like the reference's
    zeroed pixels)."""
    grid = model.grid
    n_cells = grid.n_cells
    x0, y0, z0, ri, zj, entered = cyl.move_to_grid(grid, x0, y0, z0, u, v, w)

    def cond(state):
        return jnp.any(state[-1]) & (state[0] < max_steps)

    def body(state):
        it, x, y, z, ri, zj, tau, xs, ys, zs, found, alive = state
        inside = cyl.is_inside(grid, ri, zj)
        flat = jnp.clip(cyl.flat_index(grid, ri, zj), 0, n_cells - 1)
        kext = jnp.where(inside, model.kappa[model.p_icell[flat], ilam]
                         * model.kappa_factor[flat], 0.0)
        x1, y1, z1, ri1, zj1, l = cyl.cross_cell(grid, x, y, z, u, v, w,
                                                 ri, zj)
        dtau = l * kext
        # crossing inside this cell?
        hit = alive & ~found & (tau + dtau >= tau_s) & (kext > 0)
        l_hit = jnp.where(kext > 0, (tau_s - tau) / jnp.maximum(kext, 1e-30),
                          0.0)
        xs = jnp.where(hit, x + u * l_hit, xs)
        ys = jnp.where(hit, y + v * l_hit, ys)
        zs = jnp.where(hit, z + w * l_hit, zs)
        found = found | hit
        tau = tau + jnp.where(alive, dtau, 0.0)
        x, y, z = (jnp.where(alive, a, b) for a, b in
                   ((x1, x), (y1, y), (z1, z)))
        ri = jnp.where(alive, ri1, ri)
        zj = jnp.where(alive, zj1, zj)
        alive = alive & ~cyl.has_exited(grid, ri, zj, z) & ~found
        return it + 1, x, y, z, ri, zj, tau, xs, ys, zs, found, alive

    nan = jnp.full_like(x0, jnp.nan)
    alive = entered & ~cyl.has_exited(grid, ri, zj, z0)
    state = (jnp.zeros((), jnp.int32), x0, y0, z0, ri, zj,
             jnp.zeros_like(x0), nan, nan, nan,
             jnp.zeros_like(alive), alive)
    st = jax.lax.while_loop(cond, body, state)
    return st[7], st[8], st[9], st[10]
