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
                             n_az_rt: int = 45, lam_sel=None,
                             estimator: str = "collision"):
    """Source function, FLAT layout (Lc*n_cells*n_az_rt*2, nRT*N_TYPE).

    Follows init_dust_source_fct1 (dust_ray_tracing.f90:636-713):
      photon_energy = (E_stars + E_disk) lambda 1e-6 / (n_sent AU_to_cm pi)
      I_scatt = xi * photon_energy / V * (n_az_rt*2) * kappa_sca
      eps     = (I_scatt + J_th) / kappa_ext

    estimator: "track" = the reference's per-crossing track-length tally
    (xi sums l * Stokes * phase, so I_scatt carries the kappa_sca factor
    above); "collision" (default) = the event-based tally in
    mc/thermal_mc.py, whose interaction sampling already supplies
    kappa_sca * l in expectation — the kappa_sca multiplication is
    dropped and everything else is identical.

    lam_sel = (lo, hi): assemble only that wavelength window (rows stay
    lambda-major with chunk-local indices).  TPU layout notes: a 6-D
    device array with trailing (nRT, 8) dims tile-pads to (8, 128) — a
    34x HBM blowup that OOM'd the full-resolution fixtures; the flat 2-D
    layout pads only 128/(nRT*8), and sed_rt chunks the wavelength axis
    so each chunk's eps stays ~1 GB.  Assembly happens in host numpy —
    only the final flat array ever lands on device."""
    wl = host.wl
    L = wl.n
    n_cells = model.grid.n_cells
    n_rt = model.rt_dirs.shape[0]
    dtype = model.kappa.dtype
    lo, hi = (0, L) if lam_sel is None else lam_sel

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

    Lc = hi - lo
    rows_per_l = n_cells * n_az_rt * 2
    # fully ON DEVICE: the tally xi never leaves the chip (a host
    # round-trip of each chunk over a tunnelled TPU moved ~200 MB per
    # chunk and stalled full-resolution runs for hours); only the small
    # (Lc, C) factor tables upload
    sca_num = ksca_cell if estimator == "track" else 1.0
    # near-empty cells (a debris-disk cavity, sparse outer rings) host
    # ~zero scattering events, but the collision factor divides by kext:
    # zero it below a per-lambda relative floor and clip the f32 cast so
    # xi=0 cells give 0, not 0*inf=NaN (their formal-ray contribution is
    # (1-e^-dtau)*eps ~ kext*l*eps -> negligible by the same smallness)
    kmax = np.maximum(kext_cell.max(axis=1, keepdims=True), 1e-300)
    with np.errstate(over="ignore"):    # masked branch may overflow
        fac_np = np.where(kext_cell > 1e-15 * kmax,
                          factor * sca_num / np.maximum(kext_cell, 1e-300),
                          0.0)
    fac = jnp.asarray(np.asarray(np.clip(fac_np, 0.0, 1e37),
                                 np.float32)[lo:hi], dtype)   # (Lc, C)
    jth = jnp.asarray(np.asarray(
        j_th / np.maximum(kext_cell, 1e-300), np.float32)[lo:hi], dtype)
    facr = jnp.broadcast_to(fac[:, :, None],
                            (Lc, n_cells, n_az_rt * 2)).reshape(-1)
    jthr = jnp.broadcast_to(jth[:, :, None],
                            (Lc, n_cells, n_az_rt * 2)).reshape(-1)
    xi_c = xi[lo * rows_per_l:hi * rows_per_l].astype(dtype)
    # strictly 2-D construction: any (rows, nRT, 6|8) intermediate would
    # tile-pad its trailing dims (8, 128) — gigabytes of phantom HBM
    zero = jnp.zeros_like(facr)
    cols = []
    for o in range(n_rt):
        I_o = xi_c[:, o * 6 + 0] * facr
        cols.extend([I_o + jthr,
                     xi_c[:, o * 6 + 1] * facr,
                     xi_c[:, o * 6 + 2] * facr,
                     xi_c[:, o * 6 + 3] * facr,
                     zero,
                     xi_c[:, o * 6 + 4] * facr,
                     jthr,
                     xi_c[:, o * 6 + 5] * facr])
    return jnp.stack(cols, axis=1)       # (rows, nRT*N_TYPE)


def source_tables(model: Model, host: HostModel, T_cells,
                  n_sent_per_lambda, n_az_rt: int = 45, lam_sel=None,
                  estimator: str = "collision"):
    """(fac (Lc*C,), jth (Lc*C,)) device arrays for the ON-THE-FLY source
    construction inside integrate_rays.

    Replaces materializing the (Lc*C*n_az*2, nRT*N_TYPE) eps array of
    assemble_source_function: the 24 columns tile-pad to 128 on TPU, so
    each 3-wavelength chunk wrote ~1 GB of padded HBM — measured 30 s of
    the 57 s ref4.1 SED RT.  The integrator now gathers the raw xi tally
    row plus these two per-(lambda, cell) scalars and assembles the
    N_TYPE columns arithmetically."""
    wl = host.wl
    L = wl.n
    dtype = model.kappa.dtype
    lo, hi = (0, L) if lam_sel is None else lam_sel
    photon_energy, kext_cell, ksca_cell, j_th, V = _sed_energy_tables(
        model, host, T_cells, n_sent_per_lambda)
    factor = (photon_energy[:, None] / V[None, :] * (n_az_rt * 2))
    sca_num = ksca_cell if estimator == "track" else 1.0
    kmax = np.maximum(kext_cell.max(axis=1, keepdims=True), 1e-300)
    with np.errstate(over="ignore"):
        fac_np = np.where(kext_cell > 1e-15 * kmax,
                          factor * sca_num
                          / np.maximum(kext_cell, 1e-300), 0.0)
    fac = jnp.asarray(np.asarray(np.clip(fac_np, 0.0, 1e37),
                                 np.float32)[lo:hi].reshape(-1), dtype)
    jth = jnp.asarray(np.asarray(
        j_th / np.maximum(kext_cell, 1e-300),
        np.float32)[lo:hi].reshape(-1), dtype)
    return fac, jth


def _sed_energy_tables(model: Model, host: HostModel, T_cells,
                       n_sent_per_lambda):
    """photon_energy (L,), kext_cell/ksca_cell (L,C), J_th (L,C) — shared
    by the RT1 and RT2 source-function assemblies."""
    wl = host.wl
    wl_m = wl.lam * 1e-6
    p_c = np.asarray(model.p_icell)
    kabs = np.asarray(model.kappa_abs, np.float64)[p_c].T    # (L, C)
    kext = np.asarray(model.kappa, np.float64)[p_c].T
    alb = np.asarray(model.albedo, np.float64)[p_c].T
    rho = host.rho_dust
    V = np.asarray(model.volume, np.float64)
    cst_wl = cst.thermal_const / np.maximum(
        T_cells[None, :] * wl_m[:, None], 1e-30)
    ok = cst_wl < 500.0
    planck = np.where(ok, 1.0 / (wl_m[:, None] ** 5
                                 * (np.exp(np.minimum(cst_wl, 500.0))
                                    - 1.0)), 0.0)
    E_disk = (4.0 * kabs * (rho * V)[None, :] * planck).sum(1)
    photon_energy = ((host.stars.E_stars + E_disk) * wl.lam * 1e-6
                     / (np.maximum(n_sent_per_lambda, 1.0)
                        * cst.AU_to_cm * np.pi))
    kext_cell = kext * rho[None, :]
    ksca_cell = kext_cell * alb
    j_th = (2.0 * cst.hp * cst.c_light ** 2 * planck * wl_m[:, None]
            * kabs * rho[None, :])
    return photon_energy, kext_cell, ksca_cell, j_th, V


def assemble_source_function_rt2(model: Model, host: HostModel,
                                 xi2, T_cells: np.ndarray,
                                 n_sent_per_lambda: np.ndarray, i_rt: int,
                                 nang_rt: int = 15, n_theta_i: int = 15,
                                 n_phi_i: int = 15, n_super: int = 5,
                                 pola: bool = True, lam_sel=None,
                                 estimator: str = "collision"):
    """RT2 source function for ONE viewing direction.

    Convolves the per-cell specific intensity I(theta_I, phi_I) stored by
    the MC (rt2 tally) with the cell phase matrix toward the observer ray
    of each azimuthal position bin iscatt (calc_Isca_rt2,
    dust_ray_tracing.f90:907-1240; source assembly init_dust_source_fct2
    :717-806).  The direct stellar field (I_spec_star) is returned as a
    per-cell source amplitude for the EXACT-angle on-the-fly convolution
    in integrate_rays_rt2 — tighter than the reference's 1000-bin star
    table (calc_Isca_rt2_star).

    Returns (eps2 FLAT (Lc*C*nang_rt*2, N_TYPE) jax array — the 5-D
    layout tile-pads its trailing (2, 8) dims 64x on TPU —
    and istar (Lc*C,) numpy source amplitude / kappa_ext).
    lam_sel = (lo, hi): wavelength window (rows chunk-local)."""
    wl = host.wl
    L = wl.n
    C = model.grid.n_cells
    dtype = model.kappa.dtype
    nb = n_theta_i * n_phi_i
    A1 = model.nang + 1
    nang_scatt = model.nang
    lo, hi = (0, L) if lam_sel is None else lam_sel

    photon_energy, kext_cell, ksca_cell, j_th, V = _sed_energy_tables(
        model, host, T_cells, n_sent_per_lambda)
    factor = photon_energy[:, None] / V[None, :]              # (L, C)
    # collision-estimator tallies already carry kappa_sca (the
    # interaction draw sampled kext*l and the scatter branch the albedo)
    # — drop the kappa_sca numerator and guard near-empty cells against
    # 1/kext overflow exactly like the RT1 assembly
    sca_num2 = ksca_cell if estimator == "track" else 1.0
    kmax2 = np.maximum(kext_cell.max(axis=1, keepdims=True), 1e-300)
    with np.errstate(over="ignore"):    # masked branch may overflow
        fac_sca = np.where(kext_cell > 1e-15 * kmax2,
                           factor * sca_num2
                           / np.maximum(kext_cell, 1e-300), 0.0)
    fac_sca = np.clip(fac_sca, 0.0, 1e37)[lo:hi]              # (Lc, C)
    kext_cell = kext_cell[lo:hi]
    j_th = j_th[lo:hi]

    rows_per_l = C * (nb + 1)
    xi2 = np.asarray(xi2, np.float64).reshape(-1)[
        lo * rows_per_l * 6:hi * rows_per_l * 6].reshape(
        hi - lo, C, nb + 1, 6)
    L = hi - lo                        # chunk-local extent from here on
    Inu = xi2[:, :, :nb, :]                                   # (Lc,C,nb,6)
    istar = xi2[:, :, nb, 0] * fac_sca                        # (Lc,C)

    # observer geometry (uv0, w0); our rt_dirs use phi=0 along -y, the
    # RT2 table convention (u_rt = uv0 sin phis, v_rt = -uv0 cos phis)
    d_obs = np.asarray(model.rt_dirs, np.float64)[i_rt]
    uv0 = np.sqrt(max(d_obs[0] ** 2 + d_obs[1] ** 2, 1e-40))
    w0 = d_obs[2]

    # ---- (theta_I, phi_I, sub) -> scattering-angle bin per (iscatt, dir)
    phis = 2.0 * np.pi * (np.arange(nang_rt) + 1.0) / nang_rt
    u_rt = uv0 * np.sin(phis)                                 # (IS,)
    v_rt = -uv0 * np.cos(phis)
    f = (np.arange(n_super) + 1.0) / (n_super + 1.0)
    t_idx = np.arange(n_theta_i) + 1.0
    p_idx = np.arange(n_phi_i) + 1.0
    # w_in (DIR, T, sub1), u/v_in (P, sub2)
    sgn = np.array([-1.0, 1.0])                               # dir 0/1
    w_in = (2.0 * ((t_idx[None, :, None] - f[None, None, :]) / n_theta_i)
            - 1.0) * sgn[:, None, None]
    w02 = np.sqrt(np.maximum(1.0 - w_in ** 2, 0.0))
    phi_in = 2.0 * np.pi * (p_idx[:, None] - f[None, :]) / n_phi_i
    su, cu = np.sin(phi_in), np.cos(phi_in)                   # (P, sub2)
    # cos_scatt (IS, DIR, T, P, sub1, sub2)
    cos_sc = (u_rt[:, None, None, None, None, None]
              * (w02[None, :, :, None, :, None] * su[None, None, None, :,
                                                     None, :])
              + v_rt[:, None, None, None, None, None]
              * (-w02[None, :, :, None, :, None] * cu[None, None, None, :,
                                                      None, :])
              + w0 * w_in[None, :, :, None, :, None])
    sin_sc = np.sqrt(np.maximum(1.0 - cos_sc ** 2, 0.0))
    k_tab = np.clip(np.rint(np.arccos(np.clip(cos_sc, -1, 1))
                            * (nang_scatt / np.pi)), 0, nang_scatt
                    ).astype(np.int64)
    wsin = sin_sc / np.maximum(sin_sc.sum(axis=(-2, -1), keepdims=True),
                               1e-300)
    # weighted k histogram H (A1, IS*DIR*T*P) -> supersampled mean s11
    flatk = (k_tab + (np.arange(nang_rt * 2 * n_theta_i * n_phi_i)
                      .reshape(nang_rt, 2, n_theta_i, n_phi_i)
                      [..., None, None] * A1)).reshape(-1)
    H = np.zeros(nang_rt * 2 * n_theta_i * n_phi_i * A1)
    np.add.at(H, flatk, wsin.reshape(-1))
    H = H.reshape(nang_rt, 2, n_theta_i, n_phi_i, A1)

    # centre-of-bin angle for the polarization terms + rotation angle
    ic = n_super // 2
    k_c = k_tab[:, :, :, :, ic, ic]                           # (IS,DIR,T,P)
    if pola:
        wc = w_in[None, :, :, None, ic]                       # (1,DIR,T,1)
        w02c = np.sqrt(np.maximum(1.0 - wc ** 2, 0.0))
        uc = w02c * su[None, None, None, :, ic]
        vc = -w02c * cu[None, None, None, :, ic]
        wc = np.broadcast_to(wc, uc.shape)
        # omega rotation (reference rotation() + omega block,
        # dust_ray_tracing.f90:1040-1075)
        ur = u_rt[:, None, None, None]
        vr = v_rt[:, None, None, None]
        wr = np.broadcast_to(w0, ur.shape)
        import jax.numpy as _jnp
        from ..mc.sampling import rotation_to_frame
        _, v1pj, v1pk = rotation_to_frame(
            _jnp.asarray(uc), _jnp.asarray(vc), _jnp.asarray(wc),
            _jnp.asarray(-ur * np.ones_like(uc)),
            _jnp.asarray(-vr * np.ones_like(uc)),
            _jnp.asarray(-wr * np.ones_like(uc)))
        v1pj = np.asarray(v1pj, np.float64)
        v1pk = np.asarray(v1pk, np.float64)
        xnyp = np.sqrt(v1pj ** 2 + v1pk ** 2)
        costhet = np.where(xnyp < 1e-10, 1.0, v1pj / np.maximum(xnyp,
                                                                1e-30))
        theta = np.arccos(np.clip(costhet, -1, 1))
        theta = np.where(theta >= np.pi, 0.0, theta)
        omega = np.where(v1pk < 0.0, -2.0 * theta, 2.0 * theta)
        cosw = np.where(np.abs(np.cos(omega)) < 1e-6, 0.0, np.cos(omega))
        sinw = np.where(np.abs(np.sin(omega)) < 1e-6, 0.0, np.sin(omega))

    # ---- per-bucket convolution (einsum over the direction bins)
    import jax.numpy as jnp2
    P_b = model.n_buckets
    p_c = np.asarray(model.p_icell)
    s11_tab = np.asarray(model.s11_rt, np.float64)[:, lo:hi]  # (P,Lc,A1)
    r12_tab = np.asarray(model.s12_rt, np.float64)[:, lo:hi]
    r33_tab = np.asarray(model.s33_rt, np.float64)[:, lo:hi]
    r34_tab = np.asarray(model.s34_rt, np.float64)[:, lo:hi]

    out = np.zeros((L, C, nang_rt, 2, 6))
    Hb = H.reshape(nang_rt * 2 * nb, A1)
    for p in range(P_b):
        cells = np.nonzero(p_c == p)[0] if P_b > 1 else slice(None)
        s11s = (s11_tab[p] @ Hb.T).reshape(L, nang_rt, 2, n_theta_i,
                                           n_phi_i)           # (L,IS,DIR,T,P)
        I_p = Inu[:, cells]                                   # (L,Cp,nb,6)
        Ib = I_p.reshape(I_p.shape[0], I_p.shape[1], n_theta_i, n_phi_i, 6)
        # unpolarized terms: I (when pola is off), star/nonstar contribs
        conv = np.einsum("lctpk,lsdtp->lcsdk", Ib[..., [0, 4, 5]],
                         s11s, optimize=True)
        if not pola:
            out[:, cells, :, :, 0] += conv[..., 0]
        out[:, cells, :, :, 4] += conv[..., 1]
        out[:, cells, :, :, 5] += conv[..., 2]
        if pola:
            # centre-bin Mueller elements (RT2 sign convention,
            # dust_ray_tracing.f90:1178-1186; s22=s11, s44=s33 for Mie)
            s11c = s11s                                       # supersampled
            r12 = r12_tab[p][:, k_c]                          # (L,IS,DIR,T,P)
            r33 = r33_tab[p][:, k_c]
            r34 = r34_tab[p][:, k_c]
            s12 = -s11c * r12
            s33 = -s11c * r33
            s34 = -s11c * r34
            s44 = s33
            cw = cosw[None]                                   # (1,IS,DIR,T,P)
            sw = sinw[None]
            Iq = Ib[..., 1]
            Iu = Ib[..., 2]
            Iv = Ib[..., 3]
            Ii = Ib[..., 0]
            # C2/C3 depend on (is,dir) through cw/sw -> fold into weights
            e = lambda Wt, S: np.einsum("lsdtp,lctp->lcsd", Wt, S,
                                        optimize=True)
            D1 = e(s11c, Ii) + e(s12 * cw, Iq) - e(s12 * sw, Iu)
            D2I = e(s12 * cw, Ii) + e(s11c * cw * cw, Iq) \
                - e(s11c * cw * sw, Iu)
            D3I = e(s33 * sw * sw, Iq) + e(s33 * sw * cw, Iu) \
                - e(s34 * sw, Iv)
            # S2 = cosw*D2 + sinw*D3 (weights already folded above)
            S2 = D2I + D3I
            D2b = e(s12 * -sw, Ii) + e(s11c * -sw * cw, Iq) \
                + e(s11c * sw * sw, Iu)
            D3b = e(s33 * cw * sw, Iq) + e(s33 * cw * cw, Iu) \
                - e(s34 * cw, Iv)
            S3 = -(D2b + D3b)
            S4 = e(s34 * sw, Iq) + e(s34 * cw, Iu) + e(s44, Iv)
            out[:, cells, :, :, 0] += D1
            out[:, cells, :, :, 1] += S2
            out[:, cells, :, :, 2] += S3
            out[:, cells, :, :, 3] += S4

    out *= fac_sca[:, :, None, None, None]
    jth_term = j_th / np.maximum(kext_cell, 1e-300)
    eps2 = np.zeros((L, C, nang_rt, 2, N_TYPE), np.float32)
    eps2[..., 0] = out[..., 0] + jth_term[:, :, None, None]
    eps2[..., 1] = out[..., 1]
    eps2[..., 2] = out[..., 2]
    eps2[..., 3] = out[..., 3]
    eps2[..., 5] = out[..., 4]                                # star scat
    eps2[..., 6] = jth_term[:, :, None, None]                 # disk thermal
    eps2[..., 7] = out[..., 5]                                # disk scat
    return (jnp2.asarray(eps2.reshape(L * C * nang_rt * 2, N_TYPE),
                         dtype),
            istar.reshape(-1))


@functools.partial(jax.jit, static_argnames=("max_steps", "pola",
                                             "nang_rt"))
def integrate_rays_rt2(model: Model, eps2: jax.Array, istar: jax.Array,
                       x0, y0, z0, u, v, w, ilam,
                       max_steps: int = 4000, pola: bool = True,
                       nang_rt: int = 15, lam0=0):
    """Backward formal integration with the RT2 source function.

    eps2: FLAT (Lc*C*nang_rt*2, N_TYPE) for ONE viewing direction
    (5-D would tile-pad 64x on TPU); sampled with periodic linear
    interpolation over the azimuthal position angle (dust_source_fct
    method 2, dust_ray_tracing.f90:1545-1575).  The direct-star
    scattering term istar (Lc*C,) is convolved on the fly with the
    phase matrix at the EXACT scattering angle of each step.  lam0:
    chunk start — eps2/istar rows are chunk-local, ilam global."""
    from ..mc.sampling import rotation_to_frame
    grid = model.grid
    dtype = x0.dtype
    n_cells = grid.n_cells
    A1 = model.nang + 1
    nang_scatt = model.nang
    L = model.n_lambda

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
        p = model.p_icell[flat]
        kext = jnp.where(inside, model.kappa[p, ilam]
                         * model.kappa_factor[flat], 0.0)
        x1, y1, z1, ri1, zj1, l = cyl.cross_cell(grid, x, y, z, u, v, w,
                                                 ri, zj)
        dtau = l * kext

        xm = 0.5 * (x + x1)
        ym = 0.5 * (y + y1)
        zm = 0.5 * (z + z1)
        phi_pos = jnp.mod(jnp.arctan2(xm, ym), 2 * jnp.pi)
        xisc = phi_pos / (2 * jnp.pi) * nang_rt
        fl = jnp.floor(xisc)
        frac = (xisc - fl).astype(dtype)
        ia = (fl.astype(jnp.int32) - 1) % nang_rt
        ib = fl.astype(jnp.int32) % nang_rt
        dirb = jnp.where(zm > 0.0, 1, 0)
        base = ((ilam - lam0) * n_cells + flat) * nang_rt
        row_a = (base + ia) * 2 + dirb
        row_b = (base + ib) * 2 + dirb
        S = (eps2[row_a] * (1.0 - frac)[:, None]
             + eps2[row_b] * frac[:, None])                  # (N, N_TYPE)

        # exact-angle direct-star scattering (replaces eps_dust2_star)
        rm = jnp.sqrt(jnp.maximum(xm * xm + ym * ym + zm * zm, 1e-30))
        diu, div, diw = xm / rm, ym / rm, zm / rm
        cos_sc = -(diu * u + div * v + diw * w)
        k = jnp.clip(jnp.rint(jnp.arccos(jnp.clip(cos_sc, -1.0, 1.0))
                              * (nang_scatt / jnp.pi)).astype(jnp.int32),
                     1, nang_scatt)
        lin = (p * L + ilam) * A1 + k
        s11 = model.s11_rt.reshape(-1)[lin]
        amp = istar[(ilam - lam0) * n_cells + flat]
        S = S.at[:, 0].add(s11 * amp)
        S = S.at[:, 5].add(s11 * amp)
        if pola:
            r12 = model.s12_rt.reshape(-1)[lin]
            _, v1pj, v1pk = rotation_to_frame(diu, div, diw, u, v, w)
            xnyp = jnp.sqrt(jnp.maximum(v1pj * v1pj + v1pk * v1pk, 0.0))
            costhet = jnp.where(xnyp < 1e-10, 1.0,
                                v1pj / jnp.maximum(xnyp, 1e-30))
            theta = jnp.arccos(jnp.clip(costhet, -1.0, 1.0))
            theta = jnp.where(theta >= jnp.pi, 0.0, theta)
            omega = jnp.where(v1pk < 0.0, -2.0 * theta, 2.0 * theta)
            s12 = -s11 * r12
            S = S.at[:, 1].add(jnp.cos(omega) * s12 * amp)
            S = S.at[:, 2].add(jnp.sin(omega) * s12 * amp)

        wgt = jnp.where(alive & inside,
                        jnp.exp(-tau) * (-jnp.expm1(-dtau)), 0.0)
        out = out + wgt[:, None] * S

        tau = tau + jnp.where(alive, dtau, 0.0)
        x = jnp.where(alive, x1, x)
        y = jnp.where(alive, y1, y)
        z = jnp.where(alive, z1, z)
        ri = jnp.where(alive, ri1, ri)
        zj = jnp.where(alive, zj1, zj)
        in_cav = ri == 0
        hit_star = _any_star_hit(model, x, y, z, u, v, w) & in_cav
        alive = (alive & ~cyl.has_exited(grid, ri, zj, z)
                 & (tau < 50.0) & ~hit_star)
        return it + 1, x, y, z, ri, zj, tau, out, alive

    state = (jnp.zeros((), jnp.int32), x, y, z, ri, zj, tau, out, alive)
    state = jax.lax.while_loop(cond, body, state)
    return state[7]


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


@functools.partial(jax.jit, static_argnames=("max_steps", "n_az_rt"))
def integrate_rays(model: Model, xi: jax.Array, fac: jax.Array,
                   jth: jax.Array, x0, y0, z0, u, v, w,
                   ilam, i_rt, n_az_rt: int = 45,
                   max_steps: int = 4000, lam0=0):
    """Backward formal integration along a batch of rays.

    xi: the RAW flat RT1 tally (Lc*n_cells*n_az_rt*2, nRT*6);
    fac/jth: (Lc*n_cells,) per-(lambda, cell) source factors
    (source_tables) — the N_TYPE source columns are assembled ON THE FLY
    per crossing instead of materializing the padded eps array
    (assemble_source_function cost 30 s of a 57 s ref4.1 SED RT).
    i_rt: the observer direction of this ray batch (traced — changing it
    does not recompile); ilam: chunk-local wavelength index per ray.
    Returns Stokes (N, N_TYPE).  Rays that hit the star are terminated
    (their direct-star flux is handled by the star map)."""
    grid = model.grid
    dtype = x0.dtype
    n_cells = grid.n_cells
    # one dynamic column-slice per call (i_rt stays traced so changing
    # the observer direction does not recompile the integrator)
    xi_dir = jax.lax.dynamic_slice_in_dim(
        xi, jnp.asarray(i_rt, jnp.int32) * 6, 6, axis=1)

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

        # xi rows are chunk-local (lam0 = chunk start); opacity lookups
        # above use the global ilam
        lc = ilam - lam0
        row = ((lc * n_cells + flat) * n_az_rt + kphi) * 2 + psup
        xr = xi_dir[row]                                  # (N, 6)
        fj = fac[lc * n_cells + flat]
        jt = jth[lc * n_cells + flat]
        # N_TYPE columns (assemble_source_function's layout): I+jth, Q,
        # U, V, 0 (direct star rides the star map), star_scat, jth
        # (disk thermal), disk_scat
        S = jnp.stack([xr[:, 0] * fj + jt, xr[:, 1] * fj, xr[:, 2] * fj,
                       xr[:, 3] * fj, jnp.zeros_like(fj), xr[:, 4] * fj,
                       jt, xr[:, 5] * fj], axis=1)        # (N, N_TYPE)
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

        # star termination: entering the cavity and aimed at any star
        in_cav = ri == 0
        hit_star = _any_star_hit(model, x, y, z, u, v, w) & in_cav

        alive = (alive & ~cyl.has_exited(grid, ri, zj, z)
                 & (tau < 50.0) & ~hit_star)
        return it + 1, x, y, z, ri, zj, tau, out, alive

    state = (jnp.zeros((), jnp.int32), x, y, z, ri, zj, tau, out, alive)
    state = jax.lax.while_loop(cond, body, state)
    return state[7]


def _any_star_hit(model: Model, x, y, z, u, v, w):
    """Forward ray-sphere test against every star (intersect_stars loops
    all stars, stars.f90:812-938)."""
    hit = jnp.zeros_like(x, bool)
    for s_i in range(model.star_r.shape[0]):
        px = x - model.star_pos[s_i, 0]
        py = y - model.star_pos[s_i, 1]
        pz = z - model.star_pos[s_i, 2]
        t_ca = -(px * u + py * v + pz * w)
        d2 = px * px + py * py + pz * pz - t_ca * t_ca
        hit = hit | ((t_ca > 0) & (d2 < model.star_r[s_i] ** 2))
    return hit


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
           n_az_rt: int = 45, scheme: str = "rt1", nang_rt: int = 15,
           n_theta_i: int = 15, n_phi_i: int = 15):
    """Ray-traced SED for all wavelengths and RT directions.

    Log-annuli image-plane sampling (dust_map method 1,
    dust_transfer.f90:1284-1344).  Returns (L, nRT, N_TYPE) lambda.F_lambda
    in W/m^2.

    scheme: 'rt1' (angular-binned scattered intensity, 3D-capable) or
    'rt2' (per-cell specific intensity convolved with the phase matrix per
    viewing direction — the reference's 2D default; `xi` must then be the
    rt2 tally of the MC)."""
    para = host.para
    wl = host.wl
    L = wl.n
    n_rt = model.rt_dirs.shape[0]
    dtype = model.kappa.dtype
    dirs = np.asarray(model.rt_dirs, np.float64)

    # wavelength chunks: keep each (Lc*C*az*2, nRT*8) eps under ~1 GB of
    # padded HBM (cols pad to 128); full-resolution fixtures OOM'd when
    # the whole L rode one array
    # chunking now only bounds the per-call ray batch (n_pix * Lc rays)
    # and the xi slice view; nothing per-chunk is materialized anymore
    rows_per_l = model.grid.n_cells * n_az_rt * 2
    bytes_per_l = rows_per_l * max(n_rt * N_TYPE, 128) * 4
    Lc_max = max(1, int(4.0e9 // max(bytes_per_l, 1)))
    if scheme == "rt2":
        # the RT2 convolution runs in host numpy: pull the tally ONCE
        # (per-chunk slices of a device array would re-cross the TPU
        # tunnel for every chunk x direction)
        xi = np.asarray(xi)

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

    rows_per_l_xi = model.grid.n_cells * n_az_rt * 2
    for lo in range(0, L, Lc_max):
        hi = min(lo + Lc_max, L)
        Lc = hi - lo
        if scheme == "rt1":
            fac_c, jth_c = source_tables(model, host, T_cells,
                                         n_sent_per_lambda, n_az_rt,
                                         lam_sel=(lo, hi))
            xi_c = xi[lo * rows_per_l_xi:hi * rows_per_l_xi]
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
            pix_area = ((fact_A * rr) ** 2).ravel()       # AU^2
            n_pix = px.size

            # one ray batch for this chunk's wavelengths
            xs = jnp.asarray(np.tile(px, Lc), dtype)
            ys = jnp.asarray(np.tile(py, Lc), dtype)
            zs = jnp.asarray(np.tile(pz, Lc), dtype)
            us = jnp.full(n_pix * Lc, -u, dtype)
            vs = jnp.full(n_pix * Lc, -v, dtype)
            ws = jnp.full(n_pix * Lc, -w, dtype)
            # chunk-local lambda for eps rows; GLOBAL lambda for the
            # opacity tables inside the integrator
            il_g = jnp.asarray(np.repeat(np.arange(lo, hi), n_pix),
                               jnp.int32)
            if scheme == "rt1":
                st = np.asarray(
                    integrate_rays(model, xi_c, fac_c, jth_c,
                                   xs, ys, zs, us, vs, ws,
                                   il_g, i_rt, n_az_rt=n_az_rt,
                                   lam0=lo), np.float64)
            else:
                eps2, istar = assemble_source_function_rt2(
                    model, host, xi, T_cells, n_sent_per_lambda, i_rt,
                    nang_rt=nang_rt, n_theta_i=n_theta_i,
                    n_phi_i=n_phi_i, lam_sel=(lo, hi))
                st = np.asarray(integrate_rays_rt2(
                    model, eps2, jnp.asarray(istar, dtype), xs, ys, zs,
                    us, vs, ws, il_g, nang_rt=nang_rt, lam0=lo),
                    np.float64)
            st = st.reshape(Lc, n_pix, N_TYPE)
            out[lo:hi, i_rt, :] += (st * pix_area[None, :, None]
                                    ).sum(1) / dist2

    for i_rt in range(n_rt):
        u, v, w = dirs[i_rt]
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
