"""Run orchestration: thermal MC step -> temperature + MC SED outputs.

Mirrors the output contract of the reference's step 1
(dust_transfer_sub etape 1, src/dust_transfer.f90:381-835):

* ``data_th/Temperature.fits.gz`` — [n_rad, nz] Kelvin
  (ecriture_temperature, output.f90:2523);
* ``data_th/.sed_th.fits.gz`` — [n_lambda, N_thet, N_phi] lambda.F_lambda
  in W/m^2 at the observer distance (ecriture_sed(1), output.f90:3000-3080).
"""
from __future__ import annotations

import os
import time

import jax
import numpy as np

from . import constants as cst
from .config.para import Para
from .io.fits import write_fits
from .mc.model import build_model
from .mc import thermal_mc
from .parallel.mesh import make_mesh, run_thermal_mc_sharded


def run_thermal(para: Para, root_dir: str = ".", seed: int | None = None,
                batch: int = 16384, n_capt: int = 10,
                use_all_devices: bool = True, verbose: bool = True):
    """Execute the thermal MC step; returns (T_cells, sed_th, model, host)."""
    t0 = time.time()
    model, host = build_model(para, cache_dir=os.path.join(
        root_dir, ".mcfost_tpu_cache"))
    if verbose:
        print(f"  model build: {time.time()-t0:.1f}s "
              f"({model.grid.n_cells} cells, {model.n_lambda} wavelengths, "
              f"{model.n_grains} grain sizes)")

    n_packets = int(para.photons.n_eq_th)
    key = jax.random.PRNGKey(seed if seed is not None else para.seed)

    t0 = time.time()
    devs = jax.devices()
    if use_all_devices and len(devs) > 1:
        mesh = make_mesh(devs)
        res = run_thermal_mc_sharded(model, key, n_packets, mesh,
                                     batch_per_device=batch, n_capt=n_capt)
    else:
        res = thermal_mc.run_thermal_mc(model, key, n_packets, batch=batch,
                                        n_capt=n_capt)
    res.xkj.block_until_ready()
    dt = time.time() - t0
    if verbose:
        print(f"  thermal MC: {int(res.emitted)} packets in {dt:.2f}s "
              f"({int(res.emitted)/dt:.0f} packets/s), "
              f"{int(res.n_iters)} steps, lost {int(res.n_lost)}")

    T = np.asarray(thermal_mc.final_temperature(model, res.xkj, int(res.emitted)))
    sed = np.asarray(res.sed[..., 0], np.float64)  # (L, n_capt) Stokes I

    # outputs
    data_dir = os.path.join(root_dir, "data_th")
    os.makedirs(data_dir, exist_ok=True)
    nz, n_rad = model.grid.nz, model.grid.n_rad
    write_fits(os.path.join(data_dir, "Temperature.fits.gz"),
               T.reshape(nz, n_rad).astype(np.float32),
               keywords={"BUNIT": "K"})

    # .sed_th calibration (ecriture_sed(1), output.f90:3047-3077):
    # E_photon1 = L_packet * (N_thet*N_phi/4pi) / (distance_pc*pc_to_AU)^2
    # flux(lambda) = sum_phi sed * E_photon1 * lambda/dlambda
    wl = host.wl
    n_phi = 1
    l_packet = float(model.l_tot) / max(int(res.emitted), 1)
    e_photon1 = (l_packet * (n_capt * n_phi / cst.four_pi)
                 / (para.maps.distance * cst.pc_to_AU) ** 2)
    sed_th = sed * e_photon1 * (wl.lam / wl.dlam)[:, None]    # (L, n_capt)
    write_fits(os.path.join(data_dir, ".sed_th.fits.gz"),
               sed_th.T[None, :, :].astype(np.float32),       # (n_phi, n_capt, L)
               extensions=[wl.lam.astype(np.float64)],
               keywords={"BUNIT": "W.m-2"})
    return T, sed_th, model, host, res
