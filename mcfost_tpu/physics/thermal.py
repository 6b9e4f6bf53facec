"""Bjorkman & Wood immediate-reemission thermal tables.

Pre-tabulates, per reference cell:

* ``log_Qcool(T)`` — emitted power at each sampled temperature,
  log(sum_l kappa_abs(l) B(l,T) dl * cst_E)  (init_reemission,
  reference: src/thermal_emission.f90:404-515);
* ``kdB_dT_cdf(T, l)`` — wavelength CDF of kappa_abs * dB/dT used to draw
  the re-emission wavelength with temperature correction (Bjorkman & Wood
  2001 eq. 9; thermal_emission.f90:533-550).

The MC-side lookups (cell temperature from the running kappa*J tally, and
re-emission wavelength sampling) are pure JAX functions over packet batches.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants as cst
from ..physics.wavelengths import WavelengthGrid


@dataclass
class ThermalTables:
    tab_temp: np.ndarray       # (n_T,) log-spaced temperatures
    log_qcool: np.ndarray      # (P, n_T)
    kdb_dt_cdf: np.ndarray     # (P, n_T, L) CDF over lambda

    @property
    def n_T(self):
        return self.tab_temp.shape[0]


def build_thermal_tables(wl: WavelengthGrid, kappa_abs: np.ndarray,
                         n_T: int = 100, T_min: float = 1.0,
                         T_max: float = 3000.0) -> ThermalTables:
    """kappa_abs: (P, L) absorption opacity of the reference cell(s)
    in the same units used by the MC tally (consistency is all that
    matters; the kappa_factor cancels between Qheat and Qcool for uniform
    dust, see reference radiation_field.f90:53 & thermal_emission.f90:472)."""
    # log-spaced temperature table (reference Temperature.f90:23-39)
    delta = np.exp(np.log(T_max / T_min) / n_T)
    tab_temp = T_min * np.sqrt(delta) * delta ** np.arange(n_T)

    wl_m = wl.lam * 1e-6
    dwl_m = wl.dlam * 1e-6
    cst_wl = cst.thermal_const / (tab_temp[:, None] * wl_m[None, :])  # (T, L)
    ok = cst_wl < 500.0
    expf = np.exp(np.minimum(cst_wl, 500.0))
    B = np.where(ok, 1.0 / (wl_m[None, :] ** 5 * (expf - 1.0)), 0.0) * dwl_m
    dB_dT = np.where(ok, B * cst_wl * expf / np.maximum(expf - 1.0, 1e-300), 0.0)

    cst_E = 2.0 * cst.hp * cst.c_light ** 2 * cst.four_pi

    # Qcool(T) per reference cell (thermal_emission.f90:464-504)
    qcool = np.einsum("pl,tl->pt", kappa_abs, B) * cst_E
    log_qcool = np.where(qcool > 1e-300, np.log(np.maximum(qcool, 1e-300)),
                         -1000.0)

    # wavelength CDF of kappa dB/dT (thermal_emission.f90:533-550)
    integ = np.cumsum(kappa_abs[:, None, :] * dB_dT[None, :, :], axis=-1)
    tot = np.maximum(integ[..., -1:], 1e-300)
    kdb_dt_cdf = integ / tot

    return ThermalTables(tab_temp=tab_temp, log_qcool=log_qcool,
                         kdb_dt_cdf=kdb_dt_cdf)


def emission_cdf(wl: WavelengthGrid, E_stars: np.ndarray,
                 E_disk: np.ndarray | None = None,
                 E_ism: np.ndarray | None = None):
    """Step-1 packet-wavelength CDF + packet luminosity
    (repartition_wl_em, reference thermal_emission.f90:315-360).

    Returns (cdf (L+1,), L_tot) with L_tot = 2 pi h c^2 * int E dlambda."""
    E = np.array(E_stars, dtype=np.float64).copy()
    if E_disk is not None:
        E = E + E_disk
    if E_ism is not None:
        E = E + E_ism
    w = E * wl.dlam * 1e-6
    cdf = np.concatenate([[0.0], np.cumsum(w)])
    tot = cdf[-1]
    L_tot = 2.0 * np.pi * cst.hp * cst.c_light ** 2 * tot
    return cdf / max(tot, 1e-300), L_tot
