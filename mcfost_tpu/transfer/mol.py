"""Molecular line transfer: LTE populations + velocity-resolved channel maps.

Covers the reference's -mol mode for LTE populations (the ref4.1 default:
lmol_LTE=T): line/continuum opacities per cell (opacite_mol_loc,
molecular_emission.f90:305-368), Doppler profiles with turbulence
(init_Doppler_profiles :141-178), Keplerian projected velocities
(v_proj :675-760), and the velocity-resolved backward formal integration
(integ_ray_mol, optical_depth.f90:419-599) with sub-cell velocity sampling
(local_line_profile, optical_depth.f90:863-927).

TPU-native: every (pixel, inclination) ray marches concurrently; the
velocity channels of all ray-traced transitions ride along each ray as a
vectorized axis.  NLTE level populations (statistical equilibrium against
the angle-averaged radiation field) live in transfer/mol_nlte.py and are
selected per the para flags (lpop / lmol_LTE) by the runner.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from ..config.para import Para
from ..grids import geometry as geom
from ..io.fits import write_fits
from ..mc.model import Model, HostModel
from ..physics.molecules import MoleculeData, get_molecule, lte_populations
from ..physics.stars import bb_shape


def gas_number_density(host: HostModel) -> np.ndarray:
    """H2 number density per cell [m^-3] from the dust density and the
    gas-to-dust ratio (init_molecular_disk semantics)."""
    g2d = host.para.zones[0].gas_to_dust
    rho_gas = host.rho_dust * g2d                     # g/cm^3
    mu_mH = 2.3 * 1.007825 / 6.022140857e23           # g (constants.f90 mu)
    return rho_gas / mu_mH * 1e6                      # m^-3


class MolRT:
    """Device tables for the line ray tracer."""

    def __init__(self, model: Model, host: HostModel, mol: MoleculeData,
                 T_gas: np.ndarray, itrans: np.ndarray,
                 abundance: float, v_turb: float, v_turb_unit: str = "km/s",
                 star_mass: float | None = None,
                 pops: np.ndarray | None = None, cmb: bool = True):
        dtype = model.kappa.dtype
        para = host.para
        n_cells = model.grid.n_cells
        self.mol = mol
        self.itrans = np.asarray(itrans, int)         # ray-traced transitions
        nt = len(self.itrans)

        n_mol = gas_number_density(host) * abundance
        if pops is None:
            pops = lte_populations(mol, T_gas, n_mol)     # (C, nlev)

        up = mol.trans_up[self.itrans]
        low = mol.trans_low[self.itrans]
        nu_pop = pops[:, up]                          # (C, nt)
        nl_pop = pops[:, low]
        freq = mol.freq[self.itrans]

        # line opacity/emissivity per frequency (opacite_mol_loc,
        # molecular_emission.f90:318-337): kappa = (nl fBlu - nu fBul),
        # converted to AU^-1 after division by the frequency
        fBlu = mol.fBlu[self.itrans]
        fBul = mol.fBul[self.itrans]
        fAul = mol.fAul[self.itrans]
        kap = np.maximum(nl_pop * fBlu[None, :] - nu_pop * fBul[None, :], 0.0)
        eps = nu_pop * fAul[None, :]
        self.kappa_mol = jnp.asarray(kap / freq[None, :] * cst.AU_to_m, dtype)
        self.emis_mol = jnp.asarray(eps / freq[None, :] * cst.AU_to_m, dtype)

        # thermal width incl. turbulence (init_Doppler_profiles :159-166)
        mH_kg = 1.007825 / 6.022140857e23 * 1e-3
        cs2 = cst.kb * np.maximum(T_gas, 1.0) / (2.3 * mH_kg)
        if v_turb_unit.lower().startswith("cs"):
            vt2 = (np.asarray(v_turb, np.float64) ** 2) * cs2
        else:
            # scalar (para) or per-cell (benchmark tables) turbulence
            vt = np.asarray(v_turb, np.float64) * 1e3
            vt2 = np.ascontiguousarray(
                np.broadcast_to(vt ** 2, T_gas.shape), np.float64)
        sigma2 = 2.0 * cst.kb * np.maximum(T_gas, 1.0) / (mol.weight * mH_kg) \
            + vt2
        self.dv_line = jnp.asarray(np.sqrt(sigma2), dtype)
        self.norme_m1 = jnp.asarray(cst.c_light / np.sqrt(np.pi * sigma2),
                                    dtype)
        self.sigma2_m1 = jnp.asarray(1.0 / sigma2, dtype)

        # continuum: dust opacity and emissivity at the line frequencies
        lam_um = cst.c_light / freq * 1e6
        kabs_p = np.asarray(model.kappa_abs, np.float64)      # (P, L)
        kabs_unit = np.stack([
            np.exp(np.interp(np.log(lam_um), np.log(host.wl.lam),
                             np.log(np.maximum(kabs_p[q], 1e-300))))
            for q in range(kabs_p.shape[0])])                 # (P, nt)
        p_c = np.asarray(model.p_icell)
        kcont = kabs_unit[p_c] * host.rho_dust[:, None]       # (C, nt) AU^-1
        T_d = np.maximum(T_gas, 1.0)
        Bnu = np.zeros((n_cells, nt))
        for i in range(nt):
            x = cst.hp * freq[i] / (cst.kb * T_d)
            Bnu[:, i] = np.where(
                x < 300.0,
                2 * cst.hp * freq[i] ** 3 / cst.c_light ** 2
                / np.maximum(np.exp(np.minimum(x, 300.0)) - 1.0, 1e-300),
                0.0)
        self.kappa_cont = jnp.asarray(kcont, dtype)
        self.emis_cont = jnp.asarray(kcont * Bnu, dtype)

        # velocity field: hydro-model velocities when present (C, 3)
        # cylindrical (v_R, v_phi, v_z), else Keplerian azimuthal
        # (v_proj lkeplerian branch, molecular_emission.f90:736-752)
        # -vphi_Kep forces the Keplerian law over hydro velocities
        # (init_mcfost.f90:1367-1370)
        if host.velocity is not None and not getattr(para, "vphi_kep",
                                                     False):
            vf = np.asarray(host.velocity, np.float64).copy()
        else:
            mstar = star_mass if star_mass is not None \
                else para.stars[0].mass
            r = geom.host_arrays(model.grid, "r_grid")
            if getattr(para, "cyl_rotation", False):
                # -cylindrical_rotation: midplane Keplerian value,
                # z-independent (mol_transfer.f90:1018-1021)
                vkep = np.sqrt(cst.Ggrav * mstar * cst.Msun_to_kg
                               / (r * cst.AU_to_m))
            else:
                # z-dependent Keplerian v_phi = sqrt(G M r^2 /
                # (r^2+z^2)^1.5) (mol_transfer.f90:1022-1026)
                z = geom.host_arrays(model.grid, "z_grid")
                vkep = np.sqrt(cst.Ggrav * mstar * cst.Msun_to_kg * r ** 2
                               / ((r ** 2 + z ** 2) ** 1.5 * cst.AU_to_m))
            vf = np.zeros((n_cells, 3))
            vf[:, 1] = vkep
        # -chi_infall: spherical-radial infall at chi * |v_kep|
        # (linfall, init_mcfost.f90:1267-1272; the lkeplerian+linfall
        # branch of v_proj, molecular_emission.f90:743-749), decomposed
        # onto the cylindrical (v_R, v_z) components
        chi_inf = getattr(para, "chi_infall", None)
        if chi_inf:
            r = geom.host_arrays(model.grid, "r_grid")
            z = geom.host_arrays(model.grid, "z_grid")
            rs = np.maximum(np.sqrt(r ** 2 + z ** 2), 1e-30)
            vmag = np.sqrt(vf[:, 0] ** 2 + vf[:, 1] ** 2 + vf[:, 2] ** 2)
            vf[:, 0] = vf[:, 0] - chi_inf * vmag * (r / rs)
            vf[:, 2] = vf[:, 2] - chi_inf * vmag * (z / rs)
        # -no_vr / -no_vz zero individual cylindrical components
        if getattr(para, "no_vr", False):
            vf[:, 0] = 0.0
        if getattr(para, "no_vz", False):
            vf[:, 2] = 0.0
        self.vfield = jnp.asarray(vf, dtype)

        # CMB at the line frequencies (init_tab_Cmb_mol :252-283);
        # cmb=False zeroes it like the water benchmarks
        # (tab_Cmb_mol = 0, benchmarks.f90:425-426)
        xc = cst.hp * freq / (cst.kb * cst.T_Cmb)
        self.cmb = jnp.asarray(np.where(
            xc < 100.0, 2 * cst.hp * freq ** 3 / cst.c_light ** 2
            / (np.exp(np.minimum(xc, 100.0)) - 1.0), 0.0)
            * (1.0 if cmb else 0.0), dtype)
        self.freq = freq


@functools.partial(jax.jit, static_argnames=("nv", "nt", "n_vpoints",
                                             "max_steps", "half"))
def integrate_mol_rays(model: Model, kappa_mol, emis_mol, kappa_cont,
                       emis_cont, dv_line, norme_m1, sigma2_m1, vfield, cmb,
                       tab_speed, x0, y0, z0, u, v, w,
                       nv: int, nt: int, n_vpoints: int = 8,
                       max_steps: int = 2000, skip_flat=None,
                       half: int = 0):
    """Backward velocity-resolved formal integration for a ray batch.

    Returns (I (N, nt, nv), I_cont (N, nt)) specific intensities.

    half: 1 = line emission/opacity from the TOP half only (z > 0),
    2 = bottom only (the reference's -only_top/-only_bottom,
    optical_depth.f90:517-519).

    skip_flat: optional (N,) flat cell index of each ray's OWN cell — its
    contribution (emission AND attenuation) is excluded while the ray has
    not yet left it, and the traversed path through it is returned as a
    third output ds0 (N,).  This is the reference's ``labs`` bookkeeping
    (integ_ray_mol, optical_depth.f90:511-514) that feeds the local
    ALI-style sub-iteration of the NLTE solver."""
    grid = model.grid
    dtype = x0.dtype
    n_cells = grid.n_cells

    # rays starting INSIDE the grid (cell-centre J-bar rays) must not be
    # advanced: move_to_grid is an outside->boundary mover and would
    # teleport them to the slab surface
    ri0, zj0 = geom.index_cell(grid, x0, y0, z0)
    inside0 = geom.is_inside(grid, ri0, zj0)
    xm, ym, zm, rim, zjm, hitm = geom.move_to_grid(grid, x0, y0, z0, u, v, w)
    x = jnp.where(inside0, x0, xm)
    y = jnp.where(inside0, y0, ym)
    z = jnp.where(inside0, z0, zm)
    ri = jnp.where(inside0, ri0, rim)
    zj = jnp.where(inside0, zj0, zjm)
    hit = inside0 | hitm
    N = x.shape[0]
    I = jnp.zeros((N, nt, nv), dtype)
    Ic = jnp.zeros((N, nt), dtype)
    tau = jnp.zeros((N, nt, nv), dtype)
    tau_c = jnp.zeros((N, nt), dtype)
    alive = hit & ~geom.has_exited(grid, ri, zj, z)
    ds0 = jnp.zeros(N, dtype)
    left_own = jnp.zeros(N, bool)

    def v_proj(cell_v, xx, yy, zz):
        # cylindrical components projected on the ray (v_proj,
        # molecular_emission.f90:675-760): phi-hat = (-y, x)/R,
        # R-hat = (x, y)/R
        rr = jnp.sqrt(jnp.maximum(xx * xx + yy * yy, 1e-30))
        return (cell_v[:, 0] * (xx * u + yy * v) / rr
                + cell_v[:, 1] * (-yy * u + xx * v) / rr
                + cell_v[:, 2] * w)

    def cond(st):
        return jnp.any(st[10]) & (st[0] < max_steps)   # st[10] = alive

    def body(st):
        it, x, y, z, ri, zj, tau, tau_c, I, Ic, alive, ds0, left_own = st
        inside = geom.is_inside(grid, ri, zj)
        flat = jnp.clip(geom.flat_index(grid, ri, zj), 0, n_cells - 1)
        x1, y1, z1, ri1, zj1, l = geom.cross_cell(grid, x, y, z, u, v, w,
                                                  ri, zj)

        # sub-cell velocity sampling (local_line_profile,
        # optical_depth.f90:880-923) with a fixed number of points
        cell_v = vfield[flat]
        P = jnp.zeros((N, nv), dtype)
        for k in range(n_vpoints):
            f = (k + 0.5) / n_vpoints
            vproj_k = v_proj(cell_v, x + f * l * u, y + f * l * v,
                             z + f * l * w)
            dvv = tab_speed[None, :] - vproj_k[:, None]     # (N, nv)
            P = P + (norme_m1[flat][:, None]
                     * jnp.exp(-sigma2_m1[flat][:, None] * dvv * dvv))
        P = P / n_vpoints

        kc = kappa_cont[flat]                               # (N, nt)
        dtau_c = l[:, None] * kc
        Snu_c = emis_cont[flat] / jnp.maximum(kc, 1e-30)

        if half:
            zmid = z + 0.5 * l * w
            fac = (zmid >= 0.0) if half == 1 else (zmid <= 0.0)
            facd = fac.astype(dtype)[:, None, None]
        else:
            facd = 1.0
        opac = (kappa_mol[flat][:, :, None] * P[:, None, :] * facd
                + kc[:, :, None])                           # (N, nt, nv)
        dtau = l[:, None, None] * opac
        Snu = ((emis_mol[flat][:, :, None] * P[:, None, :] * facd
                + emis_cont[flat][:, :, None])
               / jnp.maximum(opac, 1e-30))

        okl = alive & inside
        if skip_flat is not None:
            in_own = okl & ~left_own & (flat == skip_flat)
            ds0 = ds0 + jnp.where(in_own, l, 0.0)
            left_own = left_own | (okl & (flat != skip_flat))
            okl = okl & ~in_own
        ok = okl[:, None, None]
        I = I + jnp.where(ok, jnp.exp(-tau) * (-jnp.expm1(-dtau)) * Snu, 0.0)
        Ic = Ic + jnp.where(ok[:, :, 0],
                            jnp.exp(-tau_c) * (-jnp.expm1(-dtau_c)) * Snu_c,
                            0.0)
        tau = tau + jnp.where(ok, dtau, 0.0)
        tau_c = tau_c + jnp.where(ok[:, :, 0], dtau_c, 0.0)

        x = jnp.where(alive, x1, x)
        y = jnp.where(alive, y1, y)
        z = jnp.where(alive, z1, z)
        ri = jnp.where(alive, ri1, ri)
        zj = jnp.where(alive, zj1, zj)

        in_cav = ri == 0
        t_ca = -(x * u + y * v + z * w)
        d2 = x * x + y * y + z * z - t_ca * t_ca
        hit_star = in_cav & (t_ca > 0) & (d2 < model.star_r[0] ** 2)
        alive = (alive & ~geom.has_exited(grid, ri, zj, z) & ~hit_star)
        return (it + 1, x, y, z, ri, zj, tau, tau_c, I, Ic, alive,
                ds0, left_own)

    st = (jnp.zeros((), jnp.int32), x, y, z, ri, zj, tau, tau_c, I, Ic,
          alive, ds0, left_own)
    st = jax.lax.while_loop(cond, body, st)
    I, Ic, tau = st[8], st[9], st[6]
    # CMB attenuated by the total optical depth (integ_ray_mol :585-588)
    I = I + cmb[None, :, None] * jnp.exp(-tau)
    if skip_flat is not None:
        return I, Ic, st[11]
    return I, Ic


def _mol_flux_march(model: Model, kappa_mol_t, emis_mol_t, kappa_cont_t,
                    emis_cont_t, norme_m1, sigma2_m1, vfield, tab_speed,
                    x0, y0, z0, u, v, w, thr=None, n_vpoints: int = 8,
                    max_steps: int = 2000):
    """Single-transition inward march for the energy-fraction surface.

    thr=None: return the final line+continuum specific intensity (N, nv)
    accumulated from the observer side (no CMB term) — the per-pixel peak
    of this is the reference's flux threshold base.  thr=(N,): return
    (pos (N, 3), found (N,)) — the point along each ray where the running
    channel-peak intensity first exceeds thr, with the final step length
    rescaled by (thr - I_prev)/(I - I_prev) exactly like
    physical_length_mol_Flux (optical_depth.f90:732-859)."""
    grid = model.grid
    dtype = x0.dtype
    n_cells = grid.n_cells
    nv = tab_speed.shape[0]
    N = x0.shape[0]

    ri0, zj0 = geom.index_cell(grid, x0, y0, z0)
    inside0 = geom.is_inside(grid, ri0, zj0)
    xm, ym, zm, rim, zjm, hitm = geom.move_to_grid(grid, x0, y0, z0, u, v, w)
    x = jnp.where(inside0, x0, xm)
    y = jnp.where(inside0, y0, ym)
    z = jnp.where(inside0, z0, zm)
    ri = jnp.where(inside0, ri0, rim)
    zj = jnp.where(inside0, zj0, zjm)
    alive = (inside0 | hitm) & ~geom.has_exited(grid, ri, zj, z)

    I = jnp.zeros((N, nv), dtype)
    tau = jnp.zeros((N, nv), dtype)
    found = jnp.zeros(N, bool)
    fpos = jnp.zeros((N, 3), dtype)
    record = thr is not None

    def v_proj(cell_v, xx, yy, zz):
        rr = jnp.sqrt(jnp.maximum(xx * xx + yy * yy, 1e-30))
        return (cell_v[:, 0] * (xx * u + yy * v) / rr
                + cell_v[:, 1] * (-yy * u + xx * v) / rr
                + cell_v[:, 2] * w)

    def cond(st):
        return jnp.any(st[8]) & (st[0] < max_steps)

    def body(st):
        it, x, y, z, ri, zj, tau, I, alive, found, fpos = st
        inside = geom.is_inside(grid, ri, zj)
        flat = jnp.clip(geom.flat_index(grid, ri, zj), 0, n_cells - 1)
        x1, y1, z1, ri1, zj1, l = geom.cross_cell(grid, x, y, z, u, v, w,
                                                  ri, zj)
        cell_v = vfield[flat]
        P = jnp.zeros((N, nv), dtype)
        for k in range(n_vpoints):
            f = (k + 0.5) / n_vpoints
            vproj_k = v_proj(cell_v, x + f * l * u, y + f * l * v,
                             z + f * l * w)
            dvv = tab_speed[None, :] - vproj_k[:, None]
            P = P + (norme_m1[flat][:, None]
                     * jnp.exp(-sigma2_m1[flat][:, None] * dvv * dvv))
        P = P / n_vpoints
        kc = kappa_cont_t[flat]
        opac = kappa_mol_t[flat][:, None] * P + kc[:, None]
        dtau = l[:, None] * opac
        Snu = (emis_mol_t[flat][:, None] * P
               + emis_cont_t[flat][:, None]) / jnp.maximum(opac, 1e-30)
        okl = alive & inside
        dI = jnp.where(okl[:, None],
                       jnp.exp(-tau) * (-jnp.expm1(-dtau)) * Snu, 0.0)
        I1 = I + dI
        if record:
            prev = jnp.max(I, axis=1)
            cur = jnp.max(I1, axis=1)
            cross = okl & ~found & (cur > thr)
            f_l = jnp.clip((thr - prev) / jnp.maximum(cur - prev, 1e-300),
                           0.0, 1.0)
            hitp = jnp.stack([x + f_l * l * u, y + f_l * l * v,
                              z + f_l * l * w], axis=1)
            fpos = jnp.where(cross[:, None], hitp, fpos)
            found = found | cross
        tau = tau + jnp.where(okl[:, None], dtau, 0.0)
        I = I1
        x = jnp.where(alive, x1, x)
        y = jnp.where(alive, y1, y)
        z = jnp.where(alive, z1, z)
        ri = jnp.where(alive, ri1, ri)
        zj = jnp.where(alive, zj1, zj)
        in_cav = ri == 0
        t_ca = -(x * u + y * v + z * w)
        d2 = x * x + y * y + z * z - t_ca * t_ca
        hit_star = in_cav & (t_ca > 0) & (d2 < model.star_r[0] ** 2)
        alive = (alive & ~geom.has_exited(grid, ri, zj, z) & ~hit_star
                 & ~found)
        return (it + 1, x, y, z, ri, zj, tau, I, alive, found, fpos)

    st = (jnp.zeros((), jnp.int32), x, y, z, ri, zj, tau, I, alive,
          found, fpos)
    st = jax.lax.while_loop(cond, body, st)
    if record:
        return st[10], st[9]
    return st[7]


def flux_fraction_surface(model: Model, rt: "MolRT", tab_speed, frac: float,
                          px, py, pz, u, v, w, itrans: int = 0,
                          n_vpoints: int = 8):
    """xyz positions where ``frac`` of each pixel ray's final channel-peak
    line+continuum intensity has been accumulated
    (emission_line_energy_fraction_surface_map,
    mol_transfer.f90:1215-1320; only ray-tracing transition 1, like the
    reference).  Returns (pos (N, 3), found (N,)); not-found pixels stay
    (0,0,0) like the reference's flag_sortie branch."""
    dtype = model.kappa.dtype
    args = (model, rt.kappa_mol[:, itrans], rt.emis_mol[:, itrans],
            rt.kappa_cont[:, itrans], rt.emis_cont[:, itrans],
            rt.norme_m1, rt.sigma2_m1, rt.vfield, tab_speed,
            px, py, pz, u, v, w)
    I_fin = _mol_flux_march(*args, thr=None, n_vpoints=n_vpoints)
    thr = jnp.asarray(frac, dtype) * jnp.max(I_fin, axis=1)
    return _mol_flux_march(*args, thr=thr, n_vpoints=n_vpoints)


def mol_cube(model: Model, host: HostModel, T_gas: np.ndarray,
             root_dir: str = ".", n_vpoints: int = 8, verbose: bool = True,
             pops: np.ndarray | None = None, abundance=None,
             half: int = 0, flux_fraction: float | None = None):
    """Full -mol LTE pipeline: channel-map cubes for the parameter file's
    ray-tracing transitions, written as lines.fits.gz
    (emission_line_map, mol_transfer.f90:484-; docs/outputs.rst:80-96)."""
    para = host.para
    m = para.mol.molecules[0]
    mol = get_molecule(m.filename)
    itrans = np.array([t - 1 for t in m.transitions[:m.n_lines_rt]])
    rt = MolRT(model, host, mol, T_gas, itrans,
               abundance=m.abundance if abundance is None else abundance,
               v_turb=para.mol.v_turb,
               v_turb_unit=para.mol.v_turb_unit, pops=pops)

    nv = m.n_speed
    # -v_syst: systemic-velocity offset of the channel grid [km/s]
    # (init_mcfost.f90 v_syst; channels stay centred on the line but the
    # object moves)
    v0 = getattr(para, "v_syst", 0.0) * 1e3
    tab_speed = jnp.asarray(
        np.linspace(m.vmin * 1e3, m.vmax * 1e3, nv) + v0,
        model.kappa.dtype)
    nt = len(itrans)
    dirs = np.asarray(model.rt_dirs, np.float64)
    n_rt = dirs.shape[0]
    npx, npy = para.maps.nx, para.maps.ny
    pix = para.maps.map_size / max(npx, npy)
    dist2 = (para.maps.distance * cst.pc_to_AU) ** 2
    rmax = geom.model_extent(model.grid)[1]
    dtype = model.kappa.dtype

    cube = np.zeros((n_rt, nv, nt, npy, npx))
    cont = np.zeros((n_rt, nt, npy, npx))
    ffs = (np.zeros((n_rt, npy, npx, 3), np.float32)
           if flux_fraction is not None else None)

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
        I, Ic = integrate_mol_rays(
            model, rt.kappa_mol, rt.emis_mol, rt.kappa_cont, rt.emis_cont,
            rt.dv_line, rt.norme_m1, rt.sigma2_m1, rt.vfield, rt.cmb,
            tab_speed,
            jnp.asarray(px.ravel(), dtype), jnp.asarray(py.ravel(), dtype),
            jnp.asarray(pz.ravel(), dtype),
            jnp.full(n, -u, dtype), jnp.full(n, -v, dtype),
            jnp.full(n, -w, dtype), nv=nv, nt=nt, n_vpoints=n_vpoints,
            half=half)
        I = np.asarray(I, np.float64).reshape(npx, npy, nt, nv)
        Ic = np.asarray(Ic, np.float64).reshape(npx, npy, nt)
        if flux_fraction is not None:
            # -flux_fraction_surface: the radius where flux_fraction of
            # each pixel's line energy has been emitted along the ray
            pos, fnd = flux_fraction_surface(
                model, rt, tab_speed, flux_fraction,
                jnp.asarray(px.ravel(), dtype),
                jnp.asarray(py.ravel(), dtype),
                jnp.asarray(pz.ravel(), dtype),
                jnp.full(n, -u, dtype), jnp.full(n, -v, dtype),
                jnp.full(n, -w, dtype), n_vpoints=n_vpoints)
            pos = np.where(np.asarray(fnd)[:, None],
                           np.asarray(pos, np.float64), 0.0)
            ffs[i_rt] = pos.reshape(npx, npy, 3).transpose(1, 0, 2)
        # nu.F_nu per pixel (intensite_pixel_mol, mol_transfer.f90:823-830)
        for t in range(nt):
            fac = (pix ** 2 / dist2) * rt.freq[t]
            cube[i_rt, :, t] = I[:, :, t, :].transpose(2, 1, 0) * fac
            cont[i_rt, t] = Ic[:, :, t].T * fac

    # lines.fits.gz [nv, ntrans, n_az, n_incl, ny, nx]
    n_incl, n_az = para.maps.n_incl, para.maps.n_az_angles
    arr = cube.reshape(n_az, n_incl, nv, nt, npy, npx).transpose(
        2, 3, 0, 1, 4, 5)
    carr = cont.reshape(n_az, n_incl, nt, npy, npx).transpose(2, 0, 1, 3, 4)
    out_dir = os.path.join(root_dir, f"data_{mol.name.split()[0]}")
    os.makedirs(out_dir, exist_ok=True)
    write_fits(os.path.join(out_dir, "lines.fits.gz"),
               np.ascontiguousarray(arr).astype(np.float32),
               extensions=[np.ascontiguousarray(carr).astype(np.float32),
                           (itrans + 1).astype(np.int32),
                           rt.freq.astype(np.float64)],
               keywords={"BUNIT": "W.m-2.pixel-1"})
    if verbose:
        print(f"  line cube written: {out_dir}/lines.fits.gz "
              f"({nv} channels x {nt} transitions x {n_rt} directions)")
    if ffs is not None:
        # f<frac>_surface.fits.gz [3, RT_n_az, RT_n_incl, ny, nx]
        # (write_tau_surface with lflux_fraction_surface,
        # output.f90:1052-1120)
        sarr = ffs.reshape(n_az, n_incl, npy, npx, 3).transpose(
            4, 0, 1, 2, 3)
        fname = f"f{flux_fraction:g}_surface.fits.gz"
        write_fits(os.path.join(out_dir, fname),
                   np.ascontiguousarray(sarr).astype(np.float32),
                   keywords={"BUNIT": "AU"})
        if verbose:
            print(f"  flux-fraction surface written: {out_dir}/{fname}")
    return cube, cont, rt
