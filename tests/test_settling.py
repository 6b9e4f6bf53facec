"""Dust settling + variable-dust bucket validation.

The reference implements settling in define_dust_density
(density.f90:482-500 parametric, :566-575 Dubrulle, :676-747 Fromang);
here the per-size vertical structure is encoded in dust buckets
(generalised p_icell).  Physics checks: large grains concentrate toward
the midplane, mass is conserved, and the bucketed tables stay exact in
the no-settling limit."""
import numpy as np
import pytest
import jax

from mcfost_tpu import constants as cst
from mcfost_tpu.config.para import Para
from mcfost_tpu.dust.opacity import build_grain_sizes
from mcfost_tpu.grids.cylindrical import build_cylindrical_grid
from mcfost_tpu.physics.density import (compute_density_structure,
                                        compute_dust_density)


def small_para(settling=0):
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 12, 10, 2
    para.wavelengths.n_lambda = 8
    para.physics.settling_type = settling
    para.physics.a_strat = 1.0
    para.physics.exp_strat = 0.5
    for sp in para.dust[0]:
        sp.n_grains = 6
    return para


def _grids(para):
    g = build_cylindrical_grid(para)
    return (np.asarray(g.r_grid, np.float64),
            np.asarray(g.z_grid, np.float64),
            np.asarray(g.volume, np.float64))


def test_no_settling_single_bucket():
    para = small_para(0)
    grains = build_grain_sizes(para)
    r, z, v = _grids(para)
    st = compute_density_structure(para, grains, r, z, v)
    assert st.weights.shape[0] == 1
    assert np.all(st.p_icell == 0)
    # identical to the fast path
    rho0 = compute_dust_density(para, r, z, v)
    assert np.allclose(st.rho, rho0, rtol=1e-12)


@pytest.mark.parametrize("stype", [1, 2, 3])
def test_settling_large_grains_sink(stype):
    """Mass-weighted |z|/h of the largest grains must be smaller than the
    smallest grains for every settling prescription."""
    para = small_para(stype)
    grains = build_grain_sizes(para)
    r, z, v = _grids(para)
    st = compute_density_structure(para, grains, r, z, v)
    assert st.weights.shape[0] > 1
    assert np.all(np.isfinite(st.rho))

    z0 = para.zones[0]
    h = z0.scale_height * (r / z0.ref_radius) ** z0.flaring_exp
    y = np.abs(z) / h
    # per-size mass density per cell: rho * w_k(p) * m_k
    w_cells = st.weights[st.p_icell]                    # (C, K)
    k_small, k_big = 0, grains.r_grain.argmax()
    rho_small = st.rho * w_cells[:, k_small] * grains.m_grain[k_small]
    rho_big = st.rho * w_cells[:, k_big] * grains.m_grain[k_big]
    ok = st.rho > 0
    y_small = (y * rho_small * v)[ok].sum() / max(
        (rho_small * v)[ok].sum(), 1e-300)
    y_big = (y * rho_big * v)[ok].sum() / max(
        (rho_big * v)[ok].sum(), 1e-300)
    # vertical resolution bounds the contrast: the first z-layer sits at
    # y ~ 0.35, so fully settled grains average there
    assert y_big < 0.95 * y_small, (stype, y_big, y_small)
    # concentration check: fraction of big-grain mass below y = 0.5
    lo = y < 0.5
    f_big = (rho_big * v)[ok & lo].sum() / max((rho_big * v)[ok].sum(),
                                               1e-300)
    f_small = (rho_small * v)[ok & lo].sum() / max(
        (rho_small * v)[ok].sum(), 1e-300)
    assert f_big > f_small + 0.1, (stype, f_big, f_small)


def test_settling_mass_conserved():
    para = small_para(1)
    grains = build_grain_sizes(para)
    r, z, v = _grids(para)
    st = compute_density_structure(para, grains, r, z, v)
    mass = (st.rho * v).sum() * cst.AU3_to_cm3 / cst.Msun_to_g
    assert abs(mass - para.zones[0].dust_mass) / para.zones[0].dust_mass \
        < 1e-10


def test_settling_weights_normalised():
    """sum_k w_k m_k = 1 gram for every bucket (number per gram of dust)."""
    para = small_para(2)
    grains = build_grain_sizes(para)
    r, z, v = _grids(para)
    st = compute_density_structure(para, grains, r, z, v)
    wm = st.weights @ grains.m_grain
    assert np.allclose(wm, 1.0, rtol=1e-10)


def test_settling_end_to_end_thermal():
    """Thermal MC with settling buckets: runs, conserves energy, and the
    midplane is enriched in big grains (opacity differs between buckets)."""
    from mcfost_tpu.mc.model import build_model
    from mcfost_tpu.mc.thermal_mc import run_thermal_mc, final_temperature
    para = small_para(1)
    model, host = build_model(para, cache_dir=".mcfost_tpu_cache")
    assert int(np.asarray(model.p_icell).max()) > 0
    n = 20000
    res = run_thermal_mc(model, jax.random.PRNGKey(0), n, batch=4096,
                         max_iters=100000)
    out_frac = float(res.sed[..., 0].sum()) / int(res.emitted)
    assert out_frac > 0.95
    T = np.asarray(final_temperature(model, res.xkj, int(res.emitted)))
    assert np.all(np.isfinite(T)) and T.max() > 50.0


def test_multizone_buckets():
    """Two radially separated zones get distinct grain mixes: zone-2
    grains carry no weight in zone-1 cells."""
    from mcfost_tpu.config.para import Zone, DustSpecies
    para = small_para(0)
    z1 = para.zones[0]
    z1.rin, z1.rout = 1.0, 30.0
    z2 = Zone()
    z2.rin, z2.rout = 50.0, 300.0
    z2.dust_mass = 2e-4
    para.zones.append(z2)
    sp2 = DustSpecies()
    sp2.n_grains = 6
    sp2.amax = 10.0
    para.dust.append([sp2])

    grains = build_grain_sizes(para)
    r, z, v = _grids(para)
    st = compute_density_structure(para, grains, r, z, v)
    assert st.weights.shape[0] >= 2
    # total mass = sum of both zones
    mass = (st.rho * v).sum() * cst.AU3_to_cm3 / cst.Msun_to_g
    expect = z1.dust_mass + z2.dust_mass
    assert abs(mass - expect) / expect < 1e-10
    # a zone-1 cell's bucket has ~no zone-2 grain weight
    w_cells = st.weights[st.p_icell]
    in_z1 = (r > 2) & (r < 25) & (st.rho > 0)
    z2_grains = grains.zone == 1
    frac_z2 = (w_cells[in_z1][:, z2_grains]
               @ grains.m_grain[z2_grains])
    assert np.all(frac_z2 < 1e-6)
    in_z2 = (r > 60) & (r < 250) & (st.rho > 0)
    frac_z2b = (w_cells[in_z2][:, z2_grains]
                @ grains.m_grain[z2_grains])
    assert np.all(frac_z2b > 0.99)


def test_accretion_luminosity():
    """Star with Mdot > 0: total luminosity increases by
    L_acc = G M Mdot / R (stars.f90:461-491)."""
    from mcfost_tpu.physics.stars import build_star_model
    from mcfost_tpu.physics.wavelengths import log_wavelength_grid
    para = small_para()
    wl = log_wavelength_grid(100, 0.01, 3000.0)
    s0 = build_star_model(para, wl)
    para.stars[0].mdot = 1e-7
    s1 = build_star_model(para, wl)
    ratio = s1.lum_tot / s0.lum_tot
    s = para.stars[0]
    lstar = (4 * np.pi * cst.sigma_sb
             * (s.radius * cst.Rsun_to_AU * cst.AU_to_m) ** 2
             * s.teff ** 4)
    lacc = (cst.Ggrav * s.mass * cst.Msun_to_kg * 1e-7 * cst.Msun_to_kg
            / cst.year_to_s / (s.radius * cst.Rsun_to_AU * cst.AU_to_m))
    assert abs(ratio - (1 + lacc / lstar)) < 0.05 * lacc / lstar + 1e-3
