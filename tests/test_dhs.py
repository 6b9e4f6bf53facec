"""Coated-sphere / DHS optics vs the homogeneous-Mie limits.

Pins the three exact limits of the stratified-sphere solution
(reference capability: src/coated_sphere.f90) and the end-to-end DHS
dust-model build.
"""
import numpy as np

from mcfost_tpu.dust.coated_sphere import coated_batch, dhs_batch
from mcfost_tpu.dust.mie import mie_batch


def test_coated_equal_indices_is_mie():
    x = np.array([0.5, 3.0, 25.0])
    m = np.full(3, 1.6 + 0.02j)
    mie = mie_batch(x, m, nang=91)
    co = coated_batch(0.5 * x, x, m, m, nang=91)
    assert np.allclose(co["qext"], mie["qext"], rtol=1e-6)
    assert np.allclose(co["qsca"], mie["qsca"], rtol=1e-6)
    assert np.allclose(co["gsca"], mie["gsca"], atol=1e-6)
    assert np.allclose(co["s11"], mie["s11"], rtol=1e-4, atol=1e-8)


def test_coated_vanishing_core_is_shell_mie():
    x = np.array([1.0, 10.0])
    m = np.full(2, 1.7 + 0.1j)
    mie = mie_batch(x, m, nang=91)
    co = coated_batch(1e-6 * x, x, np.ones(2, complex), m, nang=91)
    assert np.allclose(co["qext"], mie["qext"], rtol=1e-6)


def test_coated_thin_shell_is_core_mie():
    x = np.array([2.0, 20.0])
    mc = np.full(2, 1.3 + 0.4j)
    mie = mie_batch(x, mc, nang=91)
    co = coated_batch(0.999999 * x, x, mc, np.full(2, 1.9 + 0.05j), nang=91)
    assert np.allclose(co["qext"], mie["qext"], rtol=1e-4)


def test_coated_stable_in_overflow_regime():
    # big, strongly absorbing shell: the textbook BHCOAT overflows here
    co = coated_batch(np.array([100.0]), np.array([2000.0]),
                      np.array([1.0 + 0j]), np.array([2.0 + 1.0j]), nang=91)
    assert np.isfinite(co["qext"]).all() and 1.5 < co["qext"][0] < 3.0
    assert np.isfinite(co["s11"]).all()


def test_dhs_differs_from_mie_and_is_physical():
    x = np.array([0.5, 5.0])
    m = np.full(2, 1.7 + 0.03j)
    d = dhs_batch(x, m, fmax=0.8, nang=91)
    mie = mie_batch(x, m, nang=91)
    assert (d["qext"] > 0).all() and (d["qsca"] >= 0).all()
    assert (d["qsca"] <= d["qext"] + 1e-12).all()
    assert np.abs(d["gsca"]) .max() <= 1.0
    # hollow-sphere ensemble must NOT coincide with compact spheres
    assert np.abs(d["qext"] / mie["qext"] - 1).max() > 0.02


def test_dhs_small_fmax_approaches_mie():
    x = np.array([1.0, 8.0])
    m = np.full(2, 1.5 + 0.01j)
    d = dhs_batch(x, m, fmax=1e-4, nang=91)
    mie = mie_batch(x, m, nang=91)
    assert np.allclose(d["qext"], mie["qext"], rtol=1e-3)
    assert np.allclose(d["qsca"], mie["qsca"], rtol=1e-3)


def test_dust_model_dhs_build():
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.physics.wavelengths import log_wavelength_grid
    from mcfost_tpu.dust.opacity import build_dust_model

    para = Para()
    for sp in para.dust[0]:
        sp.grain_type = "DHS"
        sp.n_grains = 4
        sp.amax = 10.0
        sp.dhs_vmax = 0.8
    wl = log_wavelength_grid(6, 0.3, 100.0)
    dm = build_dust_model(para, wl)
    assert np.isfinite(dm.kappa).all() and (dm.kappa > 0).all()
    assert (dm.albedo >= 0).all() and (dm.albedo <= 1).all()
    # angle CDFs monotone in [0, 1]
    assert np.all(np.diff(dm.prob_s11, axis=-1) >= -1e-12)
