"""Ray-traced SED validation.

1. Optically thin disk: the RT SED must equal the stellar spectrum at every
   inclination (direct star term dominates).
2. Moderate-optical-depth disk: the RT SED must agree with the MC SED — two
   fully independent estimators of the same observable (the reference relies
   on the same cross-check between sed_mc and sed_rt).
"""
import numpy as np
import pytest
import jax

from mcfost_tpu import constants as cst
from mcfost_tpu.config.para import Para
from mcfost_tpu.mc.model import build_model
from mcfost_tpu.mc.thermal_mc import run_thermal_mc, final_temperature
from mcfost_tpu.transfer.sed import run_mc_sed
from mcfost_tpu.transfer.raytrace import sed_rt


def make(dust_mass):
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 16, 8, 2
    para.wavelengths.n_lambda = 16
    para.zones[0].dust_mass = dust_mass
    para.maps.n_incl = 2
    para.maps.imax = 60.0
    for sp in para.dust[0]:
        sp.n_grains = 10
        sp.amax = 10.0
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    return para, model, host


def stellar_lamflam(host, distance_pc):
    wl = host.wl
    d = distance_pc * cst.pc_to_AU
    return (2.0 * np.pi * cst.hp * cst.c_light ** 2 * host.stars.E_stars
            * (wl.lam * 1e-6) / (4.0 * np.pi * d ** 2))


def test_rt_sed_thin_equals_star():
    para, model, host = make(1e-12)
    T = np.full(model.grid.n_cells, 2.0)
    n_per_lambda = 400
    out = run_mc_sed(model, host, T, jax.random.PRNGKey(7),
                     n_per_lambda=n_per_lambda, batch=4096,
                     max_iters=30000, rt=True, n_az_rt=15)
    sed = sed_rt(model, host, out["res"].xi, T, out["n_sent"], n_az_rt=15,
                 n_rad_rt=64, n_phi_rt=16)
    expect = stellar_lamflam(host, para.maps.distance)
    keep = expect > expect.max() * 1e-8
    for i_rt in range(sed.shape[1]):
        ratio = sed[keep, i_rt, 0] / expect[keep]
        assert np.allclose(ratio, 1.0, atol=0.05), (i_rt, ratio)


def test_rt_sed_matches_mc_sed():
    """Independent estimators agree on a moderately thick disk."""
    para, model, host = make(1e-5)
    model2, host2 = model, host
    # step 1: temperature
    res = run_thermal_mc(model, jax.random.PRNGKey(8), 30000, batch=8192,
                         max_iters=200000)
    T = np.asarray(final_temperature(model, res.xkj, int(res.emitted)))

    n_per_lambda = 4000
    out = run_mc_sed(model, host, T, jax.random.PRNGKey(9),
                     n_per_lambda=n_per_lambda, batch=8192,
                     max_iters=100000, rt=True, n_az_rt=15)
    rt = sed_rt(model, host, out["res"].xi, T, out["n_sent"], n_az_rt=15,
                n_rad_rt=64, n_phi_rt=16)

    # compare each RT direction against the MC capture bin containing that
    # inclination (capt = floor((1 - cos i) * n_capt), output.f90:343)
    n_capt = out["sed"].shape[1]
    dirs = np.asarray(model.rt_dirs)
    ratios = []
    for i_rt in range(dirs.shape[0]):
        w = abs(dirs[i_rt, 2])
        bin_i = min(int((1.0 - w) * n_capt), n_capt - 1)
        mc = out["sed"][:, bin_i, 0]
        keep = mc > mc.max() * 1e-5
        ratios.append(rt[keep, i_rt, 0] / mc[keep])
    ratio = np.concatenate(ratios)
    assert np.all(ratio > 0.5) and np.all(ratio < 2.0), ratio
    assert abs(np.median(ratio) - 1.0) < 0.25, ratio
