"""Dark zone + diffusion approximation.

The reference accelerates the thermal MC by declaring cells that cannot be
escaped within tau < tau_dark_zone (1500) at the threshold wavelength
(first lambda > 0.81 micron) a "dark zone": packets bounce off its boundary
(physical_length, optical_depth.f90:104-112) and the interior temperature is
filled afterwards with a 1+1D vertical diffusion solve
(define_dark_zone optical_depth.f90:1425-1651;
Temp_approx_diffusion_vertical diffusion.f90:292-375).

TPU-native versions:
* the dark-zone search launches 11 test rays from EVERY cell concurrently
  (one batched los_optical_depth call instead of nested loops);
* the vertical diffusion relaxes all radial columns in parallel as a
  jit-compiled explicit scheme on energy density E ~ T^4 with a
  Rosseland-mean diffusion coefficient.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from ..mc.model import Model


def threshold_lambda_index(lam: np.ndarray, wl_seuil: float = 0.81) -> int:
    """First wavelength above wl_seuil (dust_transfer.f90:316-321)."""
    idx = np.searchsorted(lam, wl_seuil)
    return int(min(idx, len(lam) - 1))


def compute_dark_zone(model: Model, ilam: int, tau_max: float = 1500.0,
                      n_angles: int = 11) -> np.ndarray:
    """Boolean dark mask per cell: no escape direction with tau < tau_max.

    Test directions span (0, pi) in the (r, z) plane from each cell centre
    (define_dark_zone etape 4, optical_depth.f90:1522-1551)."""
    from ..transfer.raytrace import los_optical_depth

    n_cells = model.grid.n_cells
    dtype = model.kappa.dtype
    r = model.grid.r_grid
    z = model.grid.z_grid

    angles = np.pi * (np.arange(1, n_angles + 1)) / (n_angles + 1)
    dark = np.ones(n_cells, bool)
    for a in angles:
        u = jnp.full(n_cells, np.cos(a), dtype)
        v = jnp.zeros(n_cells, dtype)
        w = jnp.full(n_cells, np.sin(a), dtype)
        tau = los_optical_depth(model, r, v, z, u, v, w,
                                jnp.full(n_cells, ilam, jnp.int32))
        dark &= np.asarray(tau) > tau_max
        if not dark.any():
            break
    # cells below a dark cell are dark too (optical_depth.f90:1541-1546)
    nz, n_rad = model.grid.nz, model.grid.n_rad
    dk = dark.reshape(nz, n_rad)
    dk = np.cumsum(dk[::-1], axis=0)[::-1] > 0
    # never darken the outermost/innermost radial cells or the top layer
    dk[-1, :] = False
    dk[:, 0] = False
    dk[:, -1] = False
    return dk.reshape(-1)


def rosseland_kappa(wl_lam_um: np.ndarray, wl_dlam_um: np.ndarray,
                    kappa_ext: np.ndarray, tab_temp: np.ndarray) -> np.ndarray:
    """Rosseland-mean extinction per unit dust density at each table
    temperature: 1/k_R = int (1/k) dB/dT dl / int dB/dT dl."""
    wl_m = wl_lam_um * 1e-6
    dwl = wl_dlam_um * 1e-6
    x = cst.thermal_const / np.maximum(tab_temp[:, None] * wl_m[None, :],
                                       1e-30)
    ok = x < 500.0
    ex = np.exp(np.minimum(x, 500.0))
    B = np.where(ok, 1.0 / (wl_m[None, :] ** 5 * (ex - 1.0)), 0.0)
    dB_dT = np.where(ok, B * x * ex / np.maximum(ex - 1.0, 1e-300), 0.0)
    num = (dB_dT * dwl[None, :]).sum(1)
    den = (dB_dT * dwl[None, :] / np.maximum(kappa_ext[None, :], 1e-300)).sum(1)
    return num / np.maximum(den, 1e-300)


def diffusion_fill_dark(model: Model, host, T: np.ndarray,
                        dark: np.ndarray, n_iter: int = 4000) -> np.ndarray:
    """Fill dark-zone temperatures by relaxing the 1D vertical diffusion
    equation per radial column (Temp_approx_diffusion_vertical,
    diffusion.f90:292-375), all columns in parallel.

    Explicit scheme on E = T^4 with D = 1/(rho kappa_R(T)); boundary cells
    (first non-dark) keep their MC temperature."""
    nz, n_rad = model.grid.nz, model.grid.n_rad
    if not dark.any():
        return T
    wl = host.wl
    kext_p = np.asarray(model.kappa, np.float64)              # (P, L)
    tabT = np.asarray(model.tab_temp, np.float64)
    kr_p = np.stack([rosseland_kappa(wl.lam, wl.dlam, kext_p[q], tabT)
                     for q in range(kext_p.shape[0])])        # (P, nT)
    kr_cells = kr_p[np.asarray(model.p_icell)]                # (C, nT)

    rho = host.rho_dust.reshape(nz, n_rad)
    Tg = T.reshape(nz, n_rad).astype(np.float64)
    dk = dark.reshape(nz, n_rad)
    from ..grids import geometry as _geom
    zmax = _geom.host_arrays(model.grid, "zmax")
    dz = (zmax / nz)[None, :]

    E = Tg ** 4
    fixed = ~dk

    logT = np.log(tabT)
    logK = np.log(np.maximum(kr_cells, 1e-300)).reshape(nz, n_rad, -1)

    def kr_interp(Tcur):
        lt = np.log(np.maximum(Tcur, tabT[0]))
        idx = np.clip(np.searchsorted(logT, lt), 1, len(logT) - 1)
        f = np.clip((lt - logT[idx - 1])
                    / np.maximum(logT[idx] - logT[idx - 1], 1e-30), 0, 1)
        k0 = np.take_along_axis(logK, (idx - 1)[..., None], -1)[..., 0]
        k1 = np.take_along_axis(logK, idx[..., None], -1)[..., 0]
        return np.exp(k0 * (1 - f) + k1 * f)

    for _ in range(n_iter):
        Tcur = np.maximum(E, 1e-30) ** 0.25
        kr = kr_interp(Tcur)
        D = 1.0 / np.maximum(rho * kr, 1e-300)
        # interface coefficients (harmonic mean), mirror at midplane
        Dm = np.minimum(D, np.roll(D, 1, axis=0))
        Dp = np.minimum(D, np.roll(D, -1, axis=0))
        Em = np.roll(E, 1, axis=0)
        Em[0] = E[0]                      # midplane mirror: zero flux
        Ep = np.roll(E, -1, axis=0)
        Ep[-1] = E[-1]
        flux = Dp * (Ep - E) - Dm * (E - Em)
        # stable explicit step
        dt = 0.2 * dz ** 2 / np.maximum(np.maximum(Dm, Dp), 1e-300)
        Enew = E + dt * flux / dz ** 2
        E = np.where(fixed, E, np.maximum(Enew, tabT[0] ** 4))
    Tout = np.where(dk, np.maximum(E, 1e-30) ** 0.25, Tg)
    return Tout.reshape(-1).astype(T.dtype)
