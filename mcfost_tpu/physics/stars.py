"""Stellar emission: spectra, wavelength CDFs, packet-launch quantities.

Follows star_energy_distribution (reference: src/stars.f90:231-642) for the
black-body branch (FITS atmosphere spectra plug in the same way when a data
directory is present), producing the quantities the MC loop consumes:

* ``E_stars(lambda)``: relative star emission per wavelength bin, in the
  reference's internal units (surface * Planck-shape, stars.f90:548-599);
* per-lambda cumulative star-selection CDF;
* the packet-wavelength CDF and thermal packet luminosity L_packet
  (repartition_wl_em, src/thermal_emission.f90:315-360).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants as cst
from ..config.para import Para
from .wavelengths import WavelengthGrid


def bb_shape(lam_um: np.ndarray, T: float) -> np.ndarray:
    """Planck shape 1/(wl^5 (exp(hc/(wl k T)) - 1)), wl in metres
    (reference stars.f90:549-553 / thermal_emission.f90:444-446)."""
    wl = lam_um * 1e-6
    cst_wl = cst.thermal_const / (T * wl)
    out = np.zeros_like(wl)
    ok = cst_wl < 500.0
    out[ok] = 1.0 / (wl[ok] ** 5 * (np.exp(cst_wl[ok]) - 1.0))
    return out


@dataclass
class StarModel:
    pos: np.ndarray            # (S, 3) [AU]
    radius: np.ndarray         # (S,) [AU]
    teff: np.ndarray           # (S,)
    E_stars: np.ndarray        # (L,) total star emission per lambda
    cdf_star: np.ndarray       # (L, S+1) star-selection CDF at fixed lambda
    # step-1 emission spectrum CDF over lambda (filled in by thermal setup
    # once disk emission is known; for a cold start it's the stars only)
    lum_tot: float             # 2*pi*h*c^2 * int E dlambda  [W-ish internal]
    E_ism: np.ndarray | None = None   # (L,) external ISM+CMB field


def _find_spectrum_file(teff: float) -> str | None:
    """Closest-Teff atmosphere FITS from $MCFOST_UTILS/Stellar_Spectra
    (find_spectra, stars.f90:1020-1100)."""
    import os
    import re
    base = os.environ.get("MCFOST_UTILS", "")
    d = os.path.join(base, "Stellar_Spectra")
    if not base or not os.path.isdir(d):
        return None
    best, best_dt = None, 1e30
    for f in os.listdir(d):
        m = re.search(r"(\d{3,6})", f)
        if m and f.endswith((".fits", ".fits.gz")):
            dt = abs(float(m.group(1)) - teff)
            if dt < best_dt:
                best, best_dt = os.path.join(d, f), dt
    return best


def _spectrum_from_fits(path: str, wl: WavelengthGrid, teff: float,
                        r_au: float) -> np.ndarray | None:
    """Atmosphere spectrum resampled onto the model grid: files hold
    (lambda [um], F_lambda normalized to 1 Rsun @ 1 pc, BB reference)
    (stars.f90:336-571): BB below range, lambda^-4 above, log-log
    interpolation between."""
    from ..io.fits import read_fits
    try:
        hdus = read_fits(path)
        arr = np.asarray(hdus[0][1], np.float64)
    except Exception:
        return None
    if arr.ndim != 2:
        return None
    if arr.shape[0] in (2, 3):
        lam_f, flux_f = arr[0], arr[1]
    elif arr.shape[1] in (2, 3):
        lam_f, flux_f = arr[:, 0], arr[:, 1]
    else:
        return None
    ok = (lam_f > 0) & (flux_f > 0)
    lam_f, flux_f = lam_f[ok], flux_f[ok]
    shape = np.zeros(wl.n)
    inside = (wl.lam >= lam_f.min()) & (wl.lam <= lam_f.max())
    shape[inside] = np.exp(np.interp(np.log(wl.lam[inside]),
                                     np.log(lam_f), np.log(flux_f)))
    # BB below the tabulated range; lambda^-4 power law above
    # (line-blanketing extrapolation, stars.f90:517-541)
    bb = bb_shape(wl.lam, teff)
    lo = wl.lam < lam_f.min()
    if lo.any() and inside.any():
        i0 = np.argmax(inside)
        scale = shape[i0] / max(bb[i0], 1e-300)
        shape[lo] = bb[lo] * scale
    hi = wl.lam > lam_f.max()
    if hi.any() and inside.any():
        i1 = wl.n - 1 - np.argmax(inside[::-1])
        shape[hi] = shape[i1] * (wl.lam[hi] / wl.lam[i1]) ** -4.0
    # renormalize so int F dlambda = sigma Teff^4 like the BB branch
    # (stars.f90:413-426): our BB branch integral sets the scale
    num = np.trapezoid(bb, wl.lam)
    den = np.trapezoid(shape, wl.lam)
    if den <= 0:
        return None
    return shape * (num / den)


def ism_emission(wl: WavelengthGrid, r_ism_au: float,
                 chi_ism: float = 1.0, model: int = 1) -> np.ndarray:
    """E_ISM in the E_stars convention (ism_energy_distribution,
    stars.f90:646-722): the ProDiMo-style field
    chi*1.71*Wdil*B(20000K) + B(T_CMB) emitted inward from the R_ISM
    sphere, normalised with the reference's
    ``E_ISM *= 4 R_ISM^2 * 2/(h c^2) * 0.4`` (:721) — which in bb_shape
    units (B_lambda / 2hc^2) is ``6.4 R^2 * shape``."""
    wdil = 9.85357e-17            # reference parameters.f90:256
    t_ism = 20000.0               # :258
    if model == 2:
        # Bate & Keto: Zucconi/Black diluted blackbodies (stars.f90:682-698)
        shape = (1e-14 * bb_shape(wl.lam, 7500.0)
                 + 1e-13 * bb_shape(wl.lam, 4000.0)
                 + 4e-13 * bb_shape(wl.lam, 3000.0)
                 + bb_shape(wl.lam, cst.T_Cmb))
    else:
        shape = (chi_ism * 1.71 * wdil * bb_shape(wl.lam, t_ism)
                 + bb_shape(wl.lam, cst.T_Cmb))
    return 6.4 * r_ism_au ** 2 * shape


def ism_field(wl: WavelengthGrid, chi_ism: float = 1.0) -> np.ndarray:
    """ISM radiation field shape: CMB blackbody + a Mathis et al. (1983)
    like ISRF approximated as diluted blackbodies (ism_energy_distribution,
    stars.f90:646-724).  Returned in the same 'surface x planck' units per
    unit emitting area (scaled by the caller)."""
    cmb = bb_shape(wl.lam, cst.T_Cmb)
    # Mathis ISRF: diluted BBs at 7500/4000/3000 K (standard decomposition)
    isrf = (1e-14 * bb_shape(wl.lam, 7500.0)
            + 1.65e-13 * bb_shape(wl.lam, 4000.0)
            + 4e-13 * bb_shape(wl.lam, 3000.0)) * chi_ism
    return cmb + isrf


def build_star_model(para: Para, wl: WavelengthGrid) -> StarModel:
    S, L = len(para.stars), wl.n
    E = np.zeros((S, L))
    pos = np.zeros((S, 3))
    radius = np.zeros(S)
    teff = np.zeros(S)
    for i, s in enumerate(para.stars):
        r_au = s.radius * cst.Rsun_to_AU
        pos[i] = [s.x, s.y, s.z]
        radius[i] = r_au
        teff[i] = s.teff
        surface = 4.0 * np.pi * r_au ** 2
        # black-body branch (stars.f90:548-553): terme = surface * planck
        E[i] = surface * bb_shape(wl.lam, s.teff)
        # atmosphere-model spectrum when available (find_spectra +
        # star_energy_distribution non-BB branch, stars.f90:336-571)
        if not s.blackbody or not s.auto_spectrum:
            path = s.spectrum_file if s.spectrum_file \
                else _find_spectrum_file(s.teff)
            if path:
                shape = _spectrum_from_fits(path, wl, s.teff, r_au)
                if shape is not None:
                    E[i] = surface * shape
        # accretion luminosity (stars.f90:461-491): L_acc = G M Mdot / R
        # added as a blackbody at T_acc = (L_acc / 4 pi sigma R^2)^1/4 —
        # a BB at T_acc over the stellar surface has exactly L_acc
        if s.mdot > 0:
            lacc = (cst.Ggrav * s.mass * cst.Msun_to_kg
                    * s.mdot * cst.Msun_to_kg / cst.year_to_s
                    / (r_au * cst.AU_to_m))
            t_acc = (lacc / (4.0 * np.pi * cst.sigma_sb
                             * (r_au * cst.AU_to_m) ** 2)) ** 0.25
            E[i] += surface * bb_shape(wl.lam, t_acc)
        # fUV excess (stars.f90:435-458): power law F ~ wl^p replacing the
        # spectrum blueward of the Wien peak where larger
        if s.fuv > 0:
            wl_m = wl.lam * 1e-6
            wl_inf, wl_sup = 91.2e-9, 250e-9
            p = s.slope_fuv
            lstar = np.trapezoid(bb_shape(wl.lam, s.teff), wl.lam)  # rel.
            if abs(p + 1.0) > 1e-5:
                c_uv = s.fuv * lstar * (p + 1) / (wl_sup ** (p + 1)
                                                 - wl_inf ** (p + 1)) / 1e6
            else:
                c_uv = s.fuv * lstar * np.log(wl_sup / wl_inf) / 1e6
            uv = c_uv * wl_m ** p * surface
            mask = wl.lam < 2898.0 / s.teff
            E[i][mask] = np.maximum(E[i][mask], uv[mask])

    E_stars = E.sum(0)
    cdf = np.concatenate([np.zeros((1, L)), np.cumsum(E, axis=0)], axis=0).T
    tot = np.maximum(cdf[:, -1:], 1e-300)
    cdf_star = cdf / tot

    lum = 2.0 * np.pi * cst.hp * cst.c_light ** 2 * np.sum(
        E_stars * wl.dlam * 1e-6)
    return StarModel(pos=pos, radius=radius, teff=teff, E_stars=E_stars,
                     cdf_star=cdf_star, lum_tot=lum)
