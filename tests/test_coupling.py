"""Live-coupling API + ProDiMo/astrochem/ML interop tests.

Reference behavior: src/mcfost2phantom.f90 (init/run/diffusion_opacity),
src/io_prodimo.f90 (forProDiMo.fits), src/ML_prodimo.f90.
"""
import numpy as np
import pytest


def _disk_particles(n=400, seed=0):
    rng = np.random.default_rng(seed)
    r = np.exp(rng.uniform(np.log(5.0), np.log(80.0), n))
    phi = rng.uniform(0, 2 * np.pi, n)
    z = rng.normal(0, 0.05 * r)
    xyz = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)
    h = np.full(n, 2.0)
    mass = np.full(n, 1e-4 * 1.989e33 / n)       # 1e-4 Msun of gas [g]
    return xyz, h, mass


@pytest.fixture(scope="module")
def small_para():
    from mcfost_tpu.config.para import Para
    para = Para()
    para.photons.n_eq_th = 4000
    para.wavelengths.n_lambda = 10
    for sp in para.dust[0]:
        sp.n_grains = 4
    return para


def test_run_mcfost_phantom_roundtrip(small_para):
    from mcfost_tpu import coupling
    xyz, h, mass = _disk_particles()
    state = coupling.init_mcfost_phantom(small_para, verbose=False)
    T, _, n_used = coupling.run_mcfost_phantom(
        state, xyz, h, mass,
        star_xyz=np.zeros((1, 3)), star_mass=np.array([1.0]),
        batch=2048)
    assert T.shape == (400,)
    assert n_used >= 4000
    # kept particles must be heated above the CMB floor
    assert (T > 2.73).sum() > 350
    assert np.all(np.isfinite(T))
    # a second call reuses the state (call counter advances the seed)
    assert state.call_count == 1


def test_dudt_extra_heating_raises_T(small_para):
    from mcfost_tpu import coupling
    xyz, h, mass = _disk_particles()
    state = coupling.init_mcfost_phantom(small_para, verbose=False)
    T0, _, _ = coupling.run_mcfost_phantom(
        state, xyz, h, mass, np.zeros((1, 3)), np.array([1.0]),
        batch=2048)
    state2 = coupling.init_mcfost_phantom(small_para, verbose=False)
    dudt = np.full(len(xyz), 1e20)     # strong hydro heating [W]
    T1, _, _ = coupling.run_mcfost_phantom(
        state2, xyz, h, mass, np.zeros((1, 3)), np.array([1.0]),
        dudt=dudt, batch=2048)
    assert np.median(T1) > np.median(T0)


def test_diffusion_opacity(small_para):
    from mcfost_tpu import coupling
    xyz, h, mass = _disk_particles()
    state = coupling.init_mcfost_phantom(small_para, verbose=False)
    T, _, _ = coupling.run_mcfost_phantom(
        state, xyz, h, mass, np.zeros((1, 3)), np.array([1.0]),
        batch=2048)
    kap = coupling.diffusion_opacity(state, T)
    assert kap.shape == T.shape
    keep = state._last["keep"]
    assert np.all(kap[keep] > 0)
    assert np.all(np.isfinite(kap))


def test_prodimo_astrochem_ml(tmp_path):
    import jax
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model
    from mcfost_tpu.mc import thermal_mc
    from mcfost_tpu.io import prodimo as pdm
    from mcfost_tpu.io.fits import read_fits

    para = Para()
    para.grid.n_rad, para.grid.nz = 16, 8
    para.wavelengths.n_lambda = 12
    for sp in para.dust[0]:
        sp.n_grains = 4
    model, host = build_model(para, cache_dir=None)
    res = thermal_mc.run_thermal_mc(model, jax.random.PRNGKey(0), 4000,
                                    batch=2048, jtally=True)
    T = np.asarray(thermal_mc.final_temperature(model, res.xkj,
                                                int(res.emitted)))
    J = np.asarray(thermal_mc.mean_intensity(model, host.wl.dlam, res.xj,
                                             int(res.emitted)))
    p = pdm.write_for_prodimo(model, host, T, J, int(res.emitted),
                              str(tmp_path))
    hdus = read_fits(p)
    assert len(hdus) == 8
    assert hdus[0][1].shape == (2, 8, 16)        # grid r,z
    assert hdus[5][1].shape == (8, 16, 12)       # J(cell, lambda)
    # round trip of a ProDiMo-style output (Tgas + abundance)
    tg, ab = pdm.read_prodimo_output(p)
    assert tg.shape == (2, 8, 16)

    p2 = pdm.write_astrochem_grid(model, host, T, J, str(tmp_path))
    tab = read_fits(p2)[0][1]
    assert tab.shape == (3, 16 * 8)
    assert np.all(tab[0] >= 0)

    tgas = pdm.predict_gas_temperature(model, host, T, J)
    assert tgas.shape == (16 * 8,)
    # gas temperature tracks dust temperature within the physical bounds
    assert np.all(tgas >= T.reshape(-1) * 0.99)
    assert np.all(tgas <= T.reshape(-1) * 30.0 + 1e-6)
