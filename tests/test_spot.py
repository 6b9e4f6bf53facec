"""-spot hot-spot emission + multi-star occlusion (VERDICT r2 item 8;
reference dust_transfer.f90:896-921 and intersect_stars
stars.f90:812-938)."""
import numpy as np
import jax

from mcfost_tpu import constants as cst
from mcfost_tpu.config.para import Para, Star
from mcfost_tpu.mc.model import build_model
from mcfost_tpu.mc.thermal_mc import run_thermal_mc


def _thin_para():
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 12, 8, 2
    para.wavelengths.n_lambda = 14
    para.zones[0].dust_mass = 1e-14       # optically thin: all escape
    for sp in para.dust[0]:
        sp.n_grains = 6
        sp.amax = 10.0
    return para


def _sed(para, n=60000, seed=2):
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    res = run_thermal_mc(model, jax.random.PRNGKey(seed), n, batch=8192,
                         max_iters=30000)
    return np.asarray(res.sed[..., 0], np.float64).sum(1), host, res


def test_spot_boosts_blue_flux_by_planck_ratio():
    para0 = _thin_para()
    sed0, host, _ = _sed(para0)

    para1 = _thin_para()
    t_spot, frac = 10000.0, 0.1
    para1.spot = (t_spot, frac, 45.0, 0.0)
    sed1, _, _ = _sed(para1)

    # expected per-lambda boost: 1 + f_cap (corr - 1), with the cap area
    # fraction f_cap = (1 - sqrt(1-f))/2 of uniformly-drawn surface points
    lam = host.wl.lam
    t_star = para0.stars[0].teff
    hc_lk = cst.hp * cst.c_light / (lam * 1e-6 * cst.kb)
    corr = np.expm1(hc_lk / t_star) / np.expm1(hc_lk / t_spot)
    f_cap = (1.0 - np.sqrt(1.0 - frac)) / 2.0
    expect = 1.0 + f_cap * (corr - 1.0)

    got = sed1 / np.maximum(sed0, 1e-300)
    # compare where both SEDs have decent counts and the effect is real
    good = (sed0 > 300) & (expect > 1.2)
    assert good.sum() >= 2
    assert np.allclose(got[good], expect[good], rtol=0.25), (
        got[good], expect[good])
    # long wavelengths unaffected
    red = (sed0 > 1000) & (expect < 1.05)
    if red.any():
        assert np.allclose(got[red], 1.0, atol=0.1)


def test_second_star_occludes_packets():
    """Packets from one star hitting the companion are absorbed: the
    captured fraction drops by about the companion's solid angle."""
    para = _thin_para()
    para.zones[0].rin = 40.0              # both stars inside the cavity
    r_au = 8.0 / 0.00465                  # 8 AU in Rsun
    para.stars = [Star(x=-10.0, radius=r_au),
                  Star(x=10.0, radius=r_au)]
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    n = 60000
    res = run_thermal_mc(model, jax.random.PRNGKey(3), n, batch=8192,
                         max_iters=30000)
    captured = float(np.asarray(res.sed[..., 0]).sum())
    # solid-angle fraction of the companion (R / 2d)^2 with d = 20 AU
    f_occ = (8.0 / (2.0 * 20.0)) ** 2
    got = 1.0 - captured / int(res.emitted)
    assert 0.4 * f_occ < got < 2.5 * f_occ, (got, f_occ)
