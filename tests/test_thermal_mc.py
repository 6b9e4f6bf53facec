"""End-to-end physics tests for the thermal Monte Carlo.

The reference validates against golden FITS outputs (docs/test_suite.rst);
without the Fortran binary or its data files in this environment, we test
against *analytic* physics instead:

* exact energy conservation through the B&W walk (every packet exits);
* optically-thin radiative equilibrium: the MC temperature must match the
  dilution-field solution computed directly from the same opacity tables.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcfost_tpu import constants as cst
from mcfost_tpu.config.para import Para
from mcfost_tpu.mc.model import build_model
from mcfost_tpu.mc.thermal_mc import run_thermal_mc, final_temperature


def small_para(dust_mass=1e-3):
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 20, 10, 3
    para.wavelengths.n_lambda = 25
    para.zones[0].dust_mass = dust_mass
    for sp in para.dust[0]:
        sp.n_grains = 15
        sp.amax = 100.0
    return para


@pytest.fixture(scope="module")
def thin_setup():
    para = small_para(dust_mass=1e-9)   # optically thin everywhere
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    return para, model, host


def test_energy_conservation(thin_setup):
    para, model, host = thin_setup
    res = run_thermal_mc(model, jax.random.PRNGKey(1), 4000,
                         batch=2048, max_iters=20000)
    assert int(res.emitted) == 4000
    assert int(res.n_lost) == 0
    # all packets exit with unit energy (B&W conserves packet energy;
    # star-hit losses are < 1e-3 for an optically thin disk)
    assert np.isclose(float(res.sed[..., 0].sum()), 4000, rtol=2e-3)


def test_optically_thin_temperature(thin_setup):
    """MC temperature vs analytic dilution-field equilibrium.

    Expected Qheat in a cell at distance d from the star:
      Qheat = 2 pi h c^2 * sum_l E_star(l) dl kappa_abs(l) / (4 pi d^2)
    then T solves Qcool(T) = Qheat using the same tables the MC uses."""
    para, model, host = thin_setup
    n = 60000
    res = run_thermal_mc(model, jax.random.PRNGKey(2), n,
                         batch=8192, max_iters=20000)
    T_mc = np.asarray(final_temperature(model, res.xkj, int(res.emitted)))

    wl = host.wl
    kabs = np.asarray(model.kappa_abs, np.float64)[0]    # per unit density
    E_star = host.stars.E_stars
    d2 = (np.asarray(model.grid.r_grid) ** 2
          + np.asarray(model.grid.z_grid) ** 2)
    qheat = (2 * np.pi * cst.hp * cst.c_light ** 2
             * np.sum(E_star * wl.dlam * 1e-6 * kabs)
             / (4 * np.pi * d2))
    log_qcool = np.asarray(model.log_qcool, np.float64)[0]
    tab_t = np.asarray(model.tab_temp, np.float64)
    ti = np.clip(np.searchsorted(log_qcool, np.log(qheat)), 1,
                 len(tab_t) - 1)
    frac = np.clip((np.log(qheat) - log_qcool[ti - 1])
                   / (log_qcool[ti] - log_qcool[ti - 1]), 0, 1)
    T_ana = np.exp(np.log(tab_t[ti]) * frac
                   + np.log(tab_t[ti - 1]) * (1 - frac))

    # compare where statistics are decent (all cells are crossed by many
    # packets in the thin limit) — median relative error must be small
    rel = np.abs(T_mc - T_ana) / T_ana
    assert np.median(rel) < 0.03, (np.median(rel), np.percentile(rel, 90))
    assert np.percentile(rel, 90) < 0.08


def test_thick_disk_runs_and_cools_midplane():
    """Optically thick disk: the midplane must be colder than the surface
    at the same radius (shielding), and energy still conserved."""
    para = small_para(dust_mass=1e-4)
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    res = run_thermal_mc(model, jax.random.PRNGKey(3), 30000,
                         batch=8192, max_iters=100000)
    assert int(res.n_lost) == 0
    assert np.isclose(float(res.sed[..., 0].sum()), float(res.emitted), rtol=5e-3)
    T = np.asarray(final_temperature(model, res.xkj, int(res.emitted))).reshape(10, 20)
    # inner-region midplane vs upper layers
    mid_inner = T[0, 1:6].mean()
    surf_inner = T[-2, 1:6].mean()
    assert surf_inner > mid_inner
    # temperature decreases outward in the midplane
    assert T[0, 2] > T[0, -1]


def test_mrw_matches_plain_walk():
    """Modified Random Walk vs plain walk on a thick disk: the observable
    photosphere temperatures must agree (Min et al. 2009 validation)."""
    para = small_para(dust_mass=3e-3)
    para.grid.nz = 12
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    Ts = {}
    for mrw in (False, True):
        # a tight age cap keeps the un-accelerated walk affordable; the few
        # killed stragglers don't move the photosphere temperatures
        res = run_thermal_mc(model, jax.random.PRNGKey(4), 2000, batch=4096,
                             max_iters=100000, mrw=mrw, age_cap=15000)
        assert int(res.n_lost) <= 20
        Ts[mrw] = np.asarray(final_temperature(
            model, res.xkj, int(res.emitted))).reshape(12, 20)
    # compare the upper layers (photosphere) where statistics are good
    surf_a, surf_b = Ts[False][8:], Ts[True][8:]
    good = surf_a > 20.0
    rel = np.abs(surf_b[good] - surf_a[good]) / surf_a[good]
    assert np.median(rel) < 0.05, np.median(rel)


def test_limb_darkening_biases_exit_cosine():
    """u=0 reproduces the cosine law table; strong darkening shifts the
    packet exit-cosine distribution toward the surface normal."""
    import numpy as np
    from mcfost_tpu.mc.model import linear_limb_darkening
    u = (np.arange(128) + 0.5) / 128
    t0 = linear_limb_darkening(0.0)
    np.testing.assert_allclose(t0, np.sqrt(u), atol=1e-4)
    t9 = linear_limb_darkening(0.9)
    # I(mu) rises toward mu=1 relative to flat -> mean exit cosine larger
    assert t9.mean() > t0.mean()
    assert np.all(np.diff(t9) > 0)         # valid inverse CDF


def test_ism_emission_step1():
    """-ISM_heating: ISM share of the step-1 emission CDF grows toward
    the mm (CMB-dominated) bins and the MC runs with ISM packets emitted
    from the R_ISM sphere (stars.f90:646-785)."""
    import jax
    import numpy as np
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model
    from mcfost_tpu.mc.thermal_mc import run_thermal_mc

    p = Para()
    p.grid.n_rad, p.grid.nz, p.grid.n_rad_in = 12, 6, 2
    p.wavelengths.n_lambda = 8
    for sp in p.dust[0]:
        sp.n_grains = 6
    p.ism_model = 1
    m, h = build_model(p)
    fi = np.asarray(m.frac_e_ism)
    assert fi.shape == (8,)
    assert np.all((fi >= 0) & (fi <= 1))
    assert fi[-1] > fi[0]                  # CMB wins in the mm
    assert float(m.r_ism) > 300.0          # sphere encloses the disk
    r = run_thermal_mc(m, jax.random.PRNGKey(0), 1500, batch=256)
    assert int(r.emitted) >= 1500
    assert np.isfinite(np.asarray(r.xkj)).all()
