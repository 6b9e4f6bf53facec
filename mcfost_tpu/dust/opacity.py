"""Dust model assembly: size distribution, cross sections, per-cell opacities.

Builds every table the MC transport and thermal solver need, as plain numpy
(host, float64) packed into a `DustModel`.  Mirrors the reference's data
flow  build_grain_size_distribution -> prop_grains -> opacity
(src/dust_prop.f90:33-222, :551-679, :791-1033) re-organised as batch array
ops:

* grain sizes: log bins, n(a) da ~ a^-aexp da with the extra factor a for
  d ln a binning (dust_prop.f90:156-209);
* Mie cross sections for every (grain, lambda) pair in one vectorized batch;
* per-cell opacity kappa [AU^-1], albedo, scattering-angle CDFs and Mueller
  tables;
* uniform-dust memory collapse: when every cell shares the same grain mix,
  tables carry a single reference cell and the true opacity is
  kappa * kappa_factor(icell) (dust_prop.f90:947-956).
"""
from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .. import constants as cst
from ..config.para import Para
from ..physics.wavelengths import WavelengthGrid
from . import materials as mat
from .coated_sphere import coated_batch, dhs_batch
from .mie import mie_batch


@dataclass
class GrainPopulation:
    """Per-grain-size arrays for all populations concatenated
    (reference: src/grains.f90:35-57)."""
    r_grain: np.ndarray        # (K,) [micron]
    s_grain: np.ndarray        # (K,) geometric cross section [micron^2]
    m_grain: np.ndarray        # (K,) grain mass [g]
    n_grains: np.ndarray       # (K,) relative number per cell unit density
    rho1g: np.ndarray          # (K,) bulk density
    zone: np.ndarray           # (K,) zone index of each grain
    avg_grain_mass: float      # [g]


def build_grain_sizes(para: Para) -> GrainPopulation:
    """Log-binned power-law size distribution
    (reference: src/dust_prop.f90:119-209)."""
    rs, ss, ms, ns, rhos, zones = [], [], [], [], [], []
    avg_mass = 0.0
    # -grain_size_distrib_file: tabulated (a, n(a)) replacing the
    # power law — single population only (lread_grain_size_distrib,
    # dust_prop.f90:64-108)
    gs_file = getattr(para, "grain_size_file", None)
    file_a = file_n = None
    if gs_file:
        n_pop = sum(len(sp) for sp in para.dust)
        if n_pop > 1:
            raise SystemExit("you cannot provide a grain size "
                             "distribution with more than 1 population")
        rows = [ln.split() for ln in open(gs_file)
                if ln.strip() and not ln.lstrip().startswith(("#", "!"))]
        file_a = np.array([float(r[0]) for r in rows])
        file_n = np.array([float(r[1]) for r in rows])
        if file_a.size != para.dust[0][0].n_grains:
            raise SystemExit("the number of grains must be the same as "
                             "in the parameter file.")
    for iz, species in enumerate(para.dust):
        for sp in species:
            material = mat.get_material(sp.components[0].optical_indices_file)
            rho1g = material.rho * (1.0 - sp.porosity)
            kdelta = np.exp(np.log(sp.amax / sp.amin) / sp.n_grains)
            a = sp.amin * np.sqrt(kdelta) * kdelta ** np.arange(sp.n_grains)
            if file_a is not None:
                a = file_a
            # average grain mass of the analytic distribution
            # (dust_prop.f90:127-146)
            p = sp.aexp
            if abs(sp.amax - sp.amin) < 1e-5 * sp.amax:
                avg = cst.four_thirds_pi * cst.mum_to_cm ** 3 * sp.amin ** 3 * rho1g
            elif abs(p - 4.0) > 1e-5 and abs(p - 1.0) > 1e-5:
                avg = (cst.four_thirds_pi * cst.mum_to_cm ** 3 * rho1g
                       * (1 - p) / (4 - p)
                       * (sp.amax ** (4 - p) - sp.amin ** (4 - p))
                       / (sp.amax ** (1 - p) - sp.amin ** (1 - p)))
            elif abs(p - 1.0) <= 1e-5:
                avg = (cst.four_thirds_pi * cst.mum_to_cm ** 3 * rho1g / (4 - p)
                       * (sp.amax ** (4 - p) - sp.amin ** (4 - p))
                       / np.log(sp.amax / sp.amin))
            else:
                avg = (cst.four_thirds_pi * cst.mum_to_cm ** 3 * rho1g
                       * (1 - p) * np.log(sp.amax / sp.amin)
                       / (sp.amax ** (1 - p) - sp.amin ** (1 - p)))

            if file_n is not None:
                # tabulated n(a); extra a for da = a dln a
                # (dust_prop.f90:100-103)
                n = file_n * a
                n = n / n.sum()
                m_k = cst.four_thirds_pi * (a * cst.mum_to_cm) ** 3 * rho1g
                avg = float((n * m_k).sum())
            else:
                n = a ** (-p) * a      # extra a: da = a dln a
                n = n / n.sum()        # fraction per size within pop
            # include mass fraction / avg mass so density*n = number density
            # (dust_prop.f90:203-209, uniform-dust path)
            n = n * sp.mass_fraction / avg

            rs.append(a)
            ss.append(np.pi * a ** 2)
            ms.append(cst.four_thirds_pi * (a * cst.mum_to_cm) ** 3 * rho1g)
            ns.append(n)
            rhos.append(np.full_like(a, rho1g))
            zones.append(np.full(a.shape, iz, dtype=np.int32))
            avg_mass = avg
    return GrainPopulation(
        r_grain=np.concatenate(rs), s_grain=np.concatenate(ss),
        m_grain=np.concatenate(ms), n_grains=np.concatenate(ns),
        rho1g=np.concatenate(rhos), zone=np.concatenate(zones),
        avg_grain_mass=avg_mass)


@dataclass
class DustModel:
    """All per-wavelength dust tables (host numpy; moved to device later).

    Shapes: K grains, L wavelengths, A = nang+1 scattering angles,
    P = p_n_cells reference cells (=1 for uniform dust)."""
    grains: GrainPopulation
    # per-grain cross sections [micron^2] (dust_prop.f90:626-636)
    c_ext: np.ndarray          # (K, L)
    c_sca: np.ndarray          # (K, L)
    c_abs: np.ndarray          # (K, L)
    c_abs_norm: np.ndarray     # (K, L) in AU^-1-normalised units
    tab_g: np.ndarray          # (K, L) asymmetry parameter
    # Mueller tables per grain (scattering.f90:539-553), normalised so that
    # s11 == 1 (phase-function normalisation, method 1)
    tab_s11: np.ndarray        # (K, L, A)
    tab_s12: np.ndarray        # (K, L, A)
    tab_s33: np.ndarray        # (K, L, A)
    tab_s34: np.ndarray        # (K, L, A)
    prob_s11: np.ndarray       # (K, L, A) CDF over theta for angle sampling
    # per-cell (reference cell) assembled opacities
    kappa: np.ndarray          # (P, L) extinction [AU^-1]
    kappa_abs: np.ndarray      # (P, L) absorption (RE LTE grains) [AU^-1]
    albedo: np.ndarray         # (P, L)
    g_cell: np.ndarray         # (P, L) mean asymmetry parameter
    ksca_cdf: np.ndarray       # (P, L, K) CDF over grain for scatterer draw
    # cell-mean Mueller tables for ray-tracing (calc_local_scattering_matrices,
    # dust_prop.f90:1086-1199): s11_rt normalised so the scattered energy over
    # the sphere is 1 (dust_prop.f90:1169-1171); s12/s33/s34 as ratios to s11
    s11_rt: Optional[np.ndarray] = None   # (P, L, A)
    s12_rt: Optional[np.ndarray] = None   # (P, L, A)
    s33_rt: Optional[np.ndarray] = None   # (P, L, A)
    s34_rt: Optional[np.ndarray] = None   # (P, L, A)
    # scattering method 2 (per-cell mean phase matrix,
    # select_scattering_method scattering.f90:39-66): theta-sampling CDF of
    # the bucket-mean s11 — the TPU fast path (one matmul, no per-grain draw)
    prob_s11_m2: Optional[np.ndarray] = None  # (P, L, A)
    kappa_factor: Optional[np.ndarray] = None  # (n_cells,) rho/rho_ref
    uniform: bool = True


def assemble_mix_tables(grains: GrainPopulation, weights: np.ndarray,
                        c_ext, c_sca, c_abs, gsca, s11, s12, s33, s34):
    """Per-bucket opacity assembly (opacity(), dust_prop.f90:851-1033 +
    calc_local_scattering_matrices :1098-1171) for P grain mixes at once.

    weights: (P, K) per-size number densities per unit dust density.
    Returns dict of (P, ...) tables."""
    P = weights.shape[0]
    kappa = np.einsum("pk,kl->pl", weights, c_ext)
    ksca = np.einsum("pk,kl->pl", weights, c_sca)
    kabs = np.einsum("pk,kl->pl", weights, c_abs)
    albedo = np.where(kappa > 0, ksca / np.maximum(kappa, 1e-300), 0.0)
    g_cell = np.where(ksca > 0,
                      np.einsum("pk,kl->pl", weights, c_sca * gsca)
                      / np.maximum(ksca, 1e-300), 0.0)
    # scatterer-selection CDF over grains (ksca_CDF, dust_prop.f90:930-1033)
    contrib = weights[:, None, :] * c_sca.T[None, :, :]        # (P, L, K)
    ksca_cdf = np.cumsum(contrib, axis=-1)
    ksca_cdf = ksca_cdf / np.maximum(ksca_cdf[..., -1:], 1e-300)

    # cell-mean Mueller tables for ray-tracing, (P, L, A):
    # sum_k s11_k(theta) * S_k * w_k
    s11_sum = np.einsum("pk,kla->pla", weights * grains.s_grain[None, :],
                        s11)
    s12_sum = np.einsum("pk,kla->pla", weights * grains.s_grain[None, :],
                        s12)
    s33_sum = np.einsum("pk,kla->pla", weights * grains.s_grain[None, :],
                        s33)
    s34_sum = np.einsum("pk,kla->pla", weights * grains.s_grain[None, :],
                        s34)
    s11_safe = np.where(s11_sum > 0, s11_sum, 1.0)
    A = s11.shape[-1]
    dtheta = np.pi / (A - 1)
    s11_rt = (s11_sum / np.maximum(ksca[:, :, None], 1e-300)
              * (dtheta / (2.0 * np.pi)))

    # method-2 theta-sampling CDF over the mean s11 (same construction as
    # the per-grain prob_s11, scattering.f90:514-537, with the missed
    # forward-diffraction flux folded into the first bin)
    theta = np.linspace(0.0, np.pi, A)
    wsin = np.sin(theta) * dtheta
    wsin[0] = 0.0
    cum = np.cumsum(s11_sum * wsin[None, None, :], axis=-1)
    cum[..., 0] = 0.0
    missing = np.maximum(ksca - cum[..., -1], 0.0)
    prob = cum + missing[..., None]
    prob[..., 0] = 0.0
    prob_s11_m2 = prob / np.maximum(prob[..., -1:], 1e-300)

    return dict(kappa=kappa * cst.opacity_norm_fact,
                kappa_abs=kabs * cst.opacity_norm_fact,
                albedo=albedo, g_cell=g_cell, ksca_cdf=ksca_cdf,
                s11_rt=s11_rt, s12_rt=s12_sum / s11_safe,
                s33_rt=s33_sum / s11_safe, s34_rt=s34_sum / s11_safe,
                prob_s11_m2=prob_s11_m2)


def build_dust_model(para: Para, wl: WavelengthGrid,
                     cache_dir: str | None = None,
                     weights: np.ndarray | None = None,
                     grains: GrainPopulation | None = None) -> DustModel:
    """weights: optional (P, K) per-bucket grain mixes (settling /
    multi-zone variable dust); None = the uniform base mix (P=1)."""
    if grains is None:
        grains = build_grain_sizes(para)
    K, L = grains.r_grain.size, wl.n
    nang = para.nang_scatt
    A = nang + 1

    cache_file = None
    if cache_dir:
        h = hashlib.sha1(repr((grains.r_grain.tobytes(), wl.lam.tobytes(),
                               [(s.components[0].optical_indices_file,
                                 s.grain_type, s.mixing_rule, s.porosity,
                                 s.dhs_vmax)
                                for sp in para.dust for s in sp],
                               nang)).encode()).hexdigest()[:16]
        cache_file = os.path.join(cache_dir, f"dust_prop_{h}.npz")

    if cache_file and os.path.isfile(cache_file):
        z = np.load(cache_file)
        qext, qsca, gsca = z["qext"], z["qsca"], z["gsca"]
        s11, s12, s33, s34 = z["s11"], z["s12"], z["s33"], z["s34"]
    else:
        # one batched Mie evaluation for all (grain, lambda) pairs
        # per species (different materials)
        qext = np.zeros((K, L)); qsca = np.zeros((K, L)); gsca = np.zeros((K, L))
        s11 = np.zeros((K, L, A)); s12 = np.zeros((K, L, A))
        s33 = np.zeros((K, L, A)); s34 = np.zeros((K, L, A))
        k0 = 0
        for iz, species in enumerate(para.dust):
            for sp in species:
                ksl = slice(k0, k0 + sp.n_grains)
                a = grains.r_grain[ksl]
                # tabulated Q table (Draine/Misselt/DustEM files, e.g. the
                # PAH populations): bypass Mie (read_opacity.f90 path)
                from . import opacity_files as opf
                table = opf.try_read(sp.components[0].optical_indices_file)
                if table is not None:
                    out = opf.tabulated_optics(table, a, wl.lam, A)
                    qext[ksl] = out["qext"].reshape(sp.n_grains, L)
                    qsca[ksl] = out["qsca"].reshape(sp.n_grains, L)
                    gsca[ksl] = out["gsca"].reshape(sp.n_grains, L)
                    s11[ksl] = out["s11"].reshape(sp.n_grains, L, A)
                    s12[ksl] = out["s12"].reshape(sp.n_grains, L, A)
                    s33[ksl] = out["s33"].reshape(sp.n_grains, L, A)
                    s34[ksl] = out["s34"].reshape(sp.n_grains, L, A)
                    k0 += sp.n_grains
                    continue
                material = mat.get_material(sp.components[0].optical_indices_file)
                coated = (sp.grain_type.lower() != "dhs"
                          and sp.n_components == 2 and sp.mixing_rule == 2)
                if (sp.n_components > 1 or sp.porosity > 0) and not coated:
                    mats = [mat.get_material(c.optical_indices_file)
                            for c in sp.components]
                    m_lam = mat.bruggeman_emt(
                        mats, [c.volume_fraction for c in sp.components],
                        wl.lam, sp.porosity)
                else:
                    m_lam = material.m_at(wl.lam)
                x = (2 * np.pi * a[:, None] / wl.lam[None, :]).ravel()
                m = np.broadcast_to(m_lam[None, :], (sp.n_grains, L)).ravel()
                if sp.grain_type.lower() == "dhs":
                    # hollow-sphere ensemble (mueller_DHS,
                    # src/coated_sphere.f90:132-265)
                    out = dhs_batch(x, m, fmax=sp.dhs_vmax, nang=A)
                elif coated:
                    # core/mantle grain (mueller_coated_sphere,
                    # src/coated_sphere.f90:20-128): component 1 = core,
                    # component 2 = mantle; core radius from volume fraction
                    mantle = mat.get_material(
                        sp.components[1].optical_indices_file)
                    vf = sp.components[0].volume_fraction
                    vtot = vf + sp.components[1].volume_fraction
                    x_core = x * (vf / max(vtot, 1e-30)) ** (1.0 / 3.0)
                    m_mantle = np.broadcast_to(
                        mantle.m_at(wl.lam)[None, :], (sp.n_grains, L)).ravel()
                    out = coated_batch(x_core, x, m, m_mantle, nang=A)
                else:
                    out = mie_batch(x, m, nang=A)
                qext[ksl] = out["qext"].reshape(sp.n_grains, L)
                qsca[ksl] = out["qsca"].reshape(sp.n_grains, L)
                gsca[ksl] = out["gsca"].reshape(sp.n_grains, L)
                s11[ksl] = out["s11"].reshape(sp.n_grains, L, A)
                s12[ksl] = out["s12"].reshape(sp.n_grains, L, A)
                s33[ksl] = out["s33"].reshape(sp.n_grains, L, A)
                s34[ksl] = out["s34"].reshape(sp.n_grains, L, A)
                k0 += sp.n_grains
        if cache_file:
            os.makedirs(cache_dir, exist_ok=True)
            np.savez_compressed(cache_file, qext=qext, qsca=qsca, gsca=gsca,
                                s11=s11, s12=s12, s33=s33, s34=s34)

    # ---- scattering-physics overrides (applied post-cache so the cache
    # stays keyed on the raw optics alone)
    A_ = s11.shape[-1]
    theta = np.linspace(0.0, np.pi, A_)
    wsin = np.sin(theta) * (np.pi / (A_ - 1))
    wsin[0] = 0.0
    if getattr(para, "no_scattering", False):
        # -no_scattering: pure absorption (lno_scattering,
        # init_mcfost.f90:804-806)
        qext = qext - qsca
        qsca = np.zeros_like(qsca)
        gsca = np.zeros_like(gsca)
        s11 = np.zeros_like(s11)
        s12 = np.zeros_like(s12)
        s33 = np.zeros_like(s33)
        s34 = np.zeros_like(s34)
    elif getattr(para, "qsca_equal_qabs", False):
        # -qsca=qabs (lqsca_equal_qabs, init_mcfost.f90:807-809)
        qabs = np.maximum(qext - qsca, 0.0)
        scale = qabs / np.maximum(qsca, 1e-300)
        qsca = qabs
        qext = 2.0 * qabs
        s11 = s11 * scale[:, :, None]
        s12 = s12 * scale[:, :, None]
        s33 = s33 * scale[:, :, None]
        s34 = s34 * scale[:, :, None]
    # -Fresnel / -Fresnel_size: user 4x4 Mueller matrices replace the
    # Mie optics per grain (Fresnel_input(_size), scattering.f90:727-960);
    # applied before -iso/-hg so those transforms still act on it
    if getattr(para, "fresnel_file", None):
        from .mueller_input import apply_fresnel_per_grain
        qext, qsca, gsca, s11, s12, s33, s34 = apply_fresnel_per_grain(
            qext, qsca, gsca, s11, s12, s33, s34, grains.r_grain, para)
    # the para's anisotropy method 2 == HG with the same g
    # (ref4.1.para scattering section / aniso_method)
    if getattr(para, "aniso_method", 1) == 2 and not para.hg_scattering:
        para.hg_scattering = True
    if para.iso_scattering:
        # -iso (lisotropic): angle-independent phase function with the
        # same scattered energy, no polarization
        s11_int = (s11 * wsin[None, None, :]).sum(-1) / wsin.sum()
        s11 = np.broadcast_to(s11_int[:, :, None], s11.shape).copy()
        s12 = np.zeros_like(s12)
        s33 = s11.copy()
        s34 = np.zeros_like(s34)
        gsca = np.zeros_like(gsca)
    elif para.hg_scattering:
        # -hg: Henyey-Greenstein phase function at the Mie asymmetry g
        # (hg, scattering.f90:1354-1383), same scattered energy;
        # -force_HG <g> pins g to the given value (lforce_HG,
        # init_mcfost.f90:1098-1104)
        s11_int = (s11 * wsin[None, None, :]).sum(-1)       # (K, L)
        fg = getattr(para, "forced_g", None)
        g = np.clip(np.full_like(gsca, fg) if fg is not None else gsca,
                    -0.99, 0.99)
        hgp = ((1.0 - g[:, :, None] ** 2)
               / np.maximum(1.0 + g[:, :, None] ** 2
                            - 2.0 * g[:, :, None]
                            * np.cos(theta)[None, None, :], 1e-6) ** 1.5)
        hg_int = (hgp * wsin[None, None, :]).sum(-1)
        s11 = hgp * (s11_int / np.maximum(hg_int, 1e-300))[:, :, None]
        s12 = np.zeros_like(s12)
        s33 = s11.copy()
        s34 = np.zeros_like(s34)

    # -Pmax: overwrite S12 with a Rayleigh-like bell of peak polarisation
    # Pmax (overwrite_s12, scattering.f90:561-576)
    pmax_ow = getattr(para, "pmax_overwrite", None)
    if pmax_ow is not None:
        th_ow = np.linspace(0.0, np.pi, s11.shape[-1])
        s12 = -pmax_ow * np.sin(th_ow)[None, None, :] ** 2 * s11

    c_ext = qext * grains.s_grain[:, None]
    c_sca = qsca * grains.s_grain[:, None]
    c_abs = c_ext - c_sca
    c_abs_norm = c_abs * cst.opacity_norm_fact

    # --- scattering-angle CDF per grain (normalise_Mueller_matrix,
    # scattering.f90:514-537): cumulative s11 sin(theta) dtheta with the
    # missed diffraction flux added to the first bin.
    theta = np.linspace(0.0, np.pi, A)
    dtheta = np.pi / nang
    w = np.sin(theta) * dtheta
    w[0] = 0.0
    cum = np.cumsum(s11 * w[None, None, :], axis=-1)
    cum[..., 0] = 0.0
    missing = np.maximum(qsca - cum[..., -1], 0.0)
    prob = cum + missing[..., None]
    prob[..., 0] = 0.0
    tot = np.maximum(prob[..., -1], 1e-300)
    prob_s11 = prob / tot[..., None]

    # Mueller tables normalised to s11=1 (phase function drawn separately)
    s11_safe = np.where(s11 > 0, s11, 1.0)
    tab_s11 = np.ones_like(s11)
    tab_s12 = s12 / s11_safe
    tab_s33 = s33 / s11_safe
    tab_s34 = s34 / s11_safe

    # --- per-bucket assembly (uniform dust: P=1, base mix)
    # (opacity(), dust_prop.f90:851-888; p_icell collapse :947-956)
    if weights is None:
        weights = grains.n_grains[None, :]
    tabs = assemble_mix_tables(grains, weights, c_ext, c_sca, c_abs, gsca,
                               s11, s12, s33, s34)

    # -Mueller <file>: user-supplied opacities + phase matrices replace
    # the computed optics (Mueller_input, scattering.f90:383-580)
    mfile = getattr(para, "mueller_file", None)
    if mfile:
        from .mueller_input import apply_mueller_input, read_mueller_file
        tabs = apply_mueller_input(tabs, read_mueller_file(mfile),
                                   wl.lam, nang)

    return DustModel(
        grains=grains, c_ext=c_ext, c_sca=c_sca, c_abs=c_abs,
        c_abs_norm=c_abs_norm, tab_g=gsca,
        tab_s11=tab_s11, tab_s12=tab_s12, tab_s33=tab_s33, tab_s34=tab_s34,
        prob_s11=prob_s11,
        kappa=tabs["kappa"], kappa_abs=tabs["kappa_abs"],
        albedo=tabs["albedo"], g_cell=tabs["g_cell"],
        ksca_cdf=tabs["ksca_cdf"],
        s11_rt=tabs["s11_rt"], s12_rt=tabs["s12_rt"],
        s33_rt=tabs["s33_rt"], s34_rt=tabs["s34_rt"],
        prob_s11_m2=tabs["prob_s11_m2"],
        uniform=weights.shape[0] == 1)
