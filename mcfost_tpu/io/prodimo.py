"""ProDiMo / astrochem / ML interop.

The reference exports its MC state for downstream thermochemical codes:

* ``forProDiMo.fits.gz`` — grid, densities, dust temperature, grain
  properties and the wavelength-resolved MC radiation field, consumed by
  the ProDiMo thermochemistry code (mcfost2ProDiMo,
  reference: src/io_prodimo.f90:350-1152; -prodimo flag);
* reading ProDiMo's output back (gas temperature + molecular abundances)
  to drive line transfer (read_mcfost2ProDiMo, src/io_prodimo.f90:1291);
* an astrochem input grid (-astrochem, src/init_mcfost.f90:1047,
  src/astrochem_wrapper.c);
* an XGBoost regressor predicting ProDiMo-like gas temperatures directly
  from MC features (ML_prodimo, src/ML_prodimo.f90:22-147 +
  src/xgboost_wrapper.cpp).
"""
from __future__ import annotations

import os

import numpy as np

from .. import constants as cst
from .fits import write_fits, read_fits


def _grids_2d(model, host):
    nz, n_rad = model.grid.nz, model.grid.n_rad
    from ..grids import geometry as _geom
    r = _geom.host_arrays(model.grid, "r_grid").reshape(nz, n_rad)
    z = _geom.host_arrays(model.grid, "z_grid").reshape(nz, n_rad)
    return r, z


def write_for_prodimo(model, host, T, J, n_packets, root_dir: str = "."):
    """Write forProDiMo.fits.gz (mcfost2ProDiMo, io_prodimo.f90:350-1152).

    HDU layout (primary + image extensions, all float32):
      0: grid [2, nz, n_rad] (r, z) [AU]
      1: gas density [g/cm^3]
      2: dust mass density [g/cm^3]
      3: T_dust [K]
      4: wavelengths [um]
      5: J_lambda(cell, lambda) mean intensity [W.m-2.um-1.sr-1]
      6: grain sizes [um]
      7: dust opacities kappa_ext(bucket, lambda) [cm^2/g]
    """
    d = os.path.join(root_dir, "data_ProDiMo")
    os.makedirs(d, exist_ok=True)
    nz, n_rad = model.grid.nz, model.grid.n_rad
    r, z = _grids_2d(model, host)
    g2d = host.para.zones[0].gas_to_dust
    rho_d = np.asarray(host.rho_dust, np.float64).reshape(nz, n_rad)
    J = np.asarray(J, np.float64)
    if J.ndim == 2 and J.shape[0] == host.wl.n:      # (L, C) -> (C, L)
        J = J.T
    kappa_cm2g = np.asarray(model.kappa, np.float64) / cst.AU_to_cm
    write_fits(
        os.path.join(d, "forProDiMo.fits.gz"),
        np.stack([r, z]).astype(np.float32),
        extensions=[
            (rho_d * g2d).astype(np.float32),
            rho_d.astype(np.float32),
            np.asarray(T, np.float64).reshape(nz, n_rad).astype(np.float32),
            host.wl.lam.astype(np.float64),
            J.reshape(nz, n_rad, host.wl.n).astype(np.float32),
            host.dust.grains.r_grain.astype(np.float64),
            kappa_cm2g.astype(np.float32),
        ],
        keywords={"NPACKETS": int(n_packets),
                  "GASTODUS": float(g2d),
                  # -prodimo1..4 pin the interface version; -prodimo_fPAH
                  # forces the PAH abundance ProDiMo should assume
                  # (mcfost2ProDiMo_version / ProDiMo_fPAH,
                  # init_mcfost.f90:1053-1079)
                  "PRODIMO": int(getattr(host.para, "prodimo_version", 5)),
                  **({"FPAH": float(host.para.prodimo_fpah)}
                     if getattr(host.para, "prodimo_fpah", None) else {})})
    return os.path.join(d, "forProDiMo.fits.gz")


def read_prodimo_output(path: str):
    """Read ProDiMo-format output back for line RT (read_mcfost2ProDiMo,
    io_prodimo.f90:1291): returns (T_gas, abundance) per cell."""
    hdus = read_fits(path)
    t_gas = np.asarray(hdus[0][1], np.float64)
    abundance = np.asarray(hdus[1][1], np.float64) if len(hdus) > 1 else None
    return t_gas, abundance


def write_astrochem_grid(model, host, T, J, root_dir: str = "."):
    """Astrochem input: per-cell (n_H, T_dust, chi_UV, Av) source table
    (the reference's -astrochem writer feeding astrochem_wrapper.c)."""
    d = os.path.join(root_dir, "data_astrochem")
    os.makedirs(d, exist_ok=True)
    g2d = host.para.zones[0].gas_to_dust
    rho_gas = np.asarray(host.rho_dust, np.float64).reshape(-1) * g2d
    n_h = rho_gas / (cst.mu_h * 1e3)       # [cm^-3], mu_h in kg
    J = np.asarray(J, np.float64)
    if J.ndim == 2 and J.shape[0] == host.wl.n:
        J = J.T
    # UV field in Draine units: integral of J over 91.2-205 nm vs the
    # Draine (1978) ISRF value 2.67e-6 W/m^2 (UV_field output analogue,
    # output.f90:2371)
    lam = host.wl.lam
    uv_mask = (lam >= 0.0912) & (lam <= 0.205)
    if uv_mask.any():
        chi = (4 * np.pi * np.sum(J[:, uv_mask] * host.wl.dlam[uv_mask],
                                  axis=1) / 2.67e-6)
    else:
        chi = np.zeros(J.shape[0])
    tab = np.stack([n_h, np.asarray(T, np.float64).reshape(-1), chi])
    path = os.path.join(d, "astrochem_grid.fits.gz")
    write_fits(path, tab.astype(np.float64),
               keywords={"COL1": "nH cm-3", "COL2": "Tdust K",
                         "COL3": "chi Draine"})
    return path


# --- ML gas-temperature prediction (ML_prodimo analogue) ---------------

def ml_features(model, host, T, J):
    """Assemble the per-cell feature matrix the reference feeds XGBoost
    (ML_prodimo.f90:57-147): log densities, T_dust, UV field, radial and
    vertical position."""
    nz, n_rad = model.grid.nz, model.grid.n_rad
    r, z = _grids_2d(model, host)
    g2d = host.para.zones[0].gas_to_dust
    rho_gas = np.asarray(host.rho_dust, np.float64).reshape(-1) * g2d
    J = np.asarray(J, np.float64)
    if J.ndim == 2 and J.shape[0] == host.wl.n:
        J = J.T
    lam = host.wl.lam
    uv_mask = (lam >= 0.0912) & (lam <= 0.205)
    chi = np.sum(J[:, uv_mask] * host.wl.dlam[uv_mask], axis=1) \
        if uv_mask.any() else np.zeros(J.shape[0])
    feats = np.stack([
        np.log10(np.maximum(rho_gas, 1e-30)),
        np.asarray(T, np.float64).reshape(-1),
        np.log10(np.maximum(chi, 1e-30)),
        np.log10(np.maximum(r.reshape(-1), 1e-3)),
        z.reshape(-1) / np.maximum(r.reshape(-1), 1e-3),
    ], axis=1)
    return feats


def predict_gas_temperature(model, host, T, J, model_path: str | None = None):
    """Predict a ProDiMo-like gas temperature per cell.

    With an XGBoost model file + the xgboost package this matches the
    reference's native predict() path (xgboost_wrapper.cpp:13-43).
    Without them, falls back to the standard thermochemistry limits the
    ML model was trained to reproduce: T_gas = T_dust in the dense
    midplane, rising with the UV field in the surface layers
    (photoelectric heating scaling)."""
    feats = ml_features(model, host, T, J)
    if model_path is not None:
        try:
            import xgboost as xgb
            booster = xgb.Booster()
            booster.load_model(model_path)
            return booster.predict(xgb.DMatrix(feats))
        except ImportError:
            pass
    t_dust = feats[:, 1]
    chi = 10.0 ** feats[:, 2]
    n_gas = 10.0 ** feats[:, 0] / (cst.mu_h * 1e3)
    # photoelectric-heating surface correction: T_gas -> T_dust deep
    # (n >> n_crit), T_gas ~ T_dust * (1 + f(chi/n)) at the surface
    boost = 1.0 + 2.0 * np.sqrt(chi / np.maximum(n_gas * 1e-6, 1e-30))
    return t_dust * np.minimum(boost, 30.0)
