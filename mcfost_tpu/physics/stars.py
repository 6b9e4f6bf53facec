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
