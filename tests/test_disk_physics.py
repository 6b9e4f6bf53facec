"""Disk physics: sublimation, hydrostatic equilibrium, viscous heating.

Physics pins:
* sublimation radius scales as sqrt(L_star) (hotter star -> larger r_sub);
* sublimate_dust removes exactly the hot cells and nothing else;
* hydrostatic equilibrium on an isothermal column reproduces the
  Gaussian rho(z) ~ exp(-z^2/2H^2) with H = c_s/Omega;
* viscous heating is positive, scales linearly with alpha, and the
  extra-heating channel raises the B&W temperature.
"""
import numpy as np

from mcfost_tpu import constants as cst
from mcfost_tpu.config.para import Para
from mcfost_tpu.physics.disk_physics import (
    MU_GAS, M_H, hydrostatic_density, othin_sublimation_radius,
    sublimate_dust, viscous_heating_rate)
from mcfost_tpu.physics.wavelengths import log_wavelength_grid
from mcfost_tpu.physics.stars import build_star_model


def test_sublimation_radius_scales_with_luminosity():
    para = Para()
    wl = log_wavelength_grid(30, 0.1, 3000.0)
    kabs = wl.lam ** -1.5            # any plausible opacity shape
    s1 = build_star_model(para, wl)
    r1 = othin_sublimation_radius(para, wl, kabs, s1.E_stars)
    para.stars[0].radius *= 2.0      # 4x luminosity
    s2 = build_star_model(para, wl)
    r2 = othin_sublimation_radius(para, wl, kabs, s2.E_stars)
    assert r1 > 0 and np.isclose(r2 / r1, 2.0, rtol=1e-6)


def test_sublimate_dust_masks_hot_cells():
    rho = np.ones(10)
    vol = np.ones(10)
    T = np.linspace(100.0, 2000.0, 10)
    new, mask = sublimate_dust(rho, vol, T, T_sub=1500.0)
    assert mask.sum() == (T > 1500.0).sum()
    assert (new[mask] == 0).all() and (new[~mask] == 1).all()


def test_hydrostatic_isothermal_gaussian():
    # one column, isothermal: solution is exp(-z^2 / 2 H^2)
    n_rad, nz = 1, 60
    r0, T0, mstar = 10.0, 50.0, 1.0
    z = np.linspace(0.0, 4.0, nz)                  # AU
    r = np.full(nz, r0)
    vol = np.ones(nz)
    T = np.full(nz, T0)
    rho0 = np.exp(-z)                              # wrong shape on purpose
    para = Para()
    para.stars[0].mass = mstar
    new = hydrostatic_density(para, r, z, vol, T, rho0, n_rad, nz)
    cs2 = cst.kb * T0 / (MU_GAS * M_H)
    om2 = cst.Ggrav * mstar * cst.Msun_to_kg / (r0 * cst.AU_to_m) ** 3
    H_au = np.sqrt(cs2 / om2) / cst.AU_to_m
    expect = np.exp(-0.5 * (z / H_au) ** 2)
    expect *= new[0] / expect[0]
    ok = expect > 1e-8 * expect.max()
    assert np.allclose(new[ok], expect[ok], rtol=0.05)
    # column mass conserved
    assert np.isclose(new.sum(), rho0.sum(), rtol=1e-10)


def test_viscous_heating_scaling():
    para = Para()
    para.physics.alpha_viscosity = 1e-2
    r = np.array([1.0, 10.0])
    vol = np.ones(2)
    rho_gas = np.array([1e-6, 1e-8])               # kg/m^3
    T = np.array([500.0, 100.0])
    g1 = viscous_heating_rate(para, r, vol, rho_gas, T)
    assert (g1 > 0).all()
    para.physics.alpha_viscosity = 2e-2
    g2 = viscous_heating_rate(para, r, vol, rho_gas, T)
    assert np.allclose(g2, 2 * g1)


def test_extra_heating_raises_temperature():
    import jax
    from mcfost_tpu.mc.model import build_model
    from mcfost_tpu.mc import thermal_mc

    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 8, 6, 2
    para.wavelengths.n_lambda = 8
    for sp in para.dust[0]:
        sp.n_grains = 4
        sp.amax = 10.0
    model, host = build_model(para, cache_dir=".mcfost_tpu_cache")
    C = model.grid.n_cells
    xkj = np.full(C, 1e-8)
    T0 = np.asarray(thermal_mc.final_temperature(model, xkj, 1000))
    extra = np.full(C, 1e20)       # strong heating [W]
    T1 = np.asarray(thermal_mc.final_temperature(model, xkj, 1000,
                                                 extra_heating=extra))
    assert (T1 >= T0 - 1e-6).all() and T1.mean() > T0.mean()
