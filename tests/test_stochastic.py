"""Physics tests for non-equilibrium (stochastic) grain heating.

Checks the P(T) solver against limits with known answers:
* Dulong-Petit high-T limit of the DL01 enthalpies;
* energy conservation: emitted power from P(T) == absorbed power;
* large grains collapse to the equilibrium temperature;
* tiny PAH-like grains show the expected broad, spiky P(T).
"""
import numpy as np
import pytest

from mcfost_tpu import constants as cst
from mcfost_tpu.physics import stochastic as st


def _radiation_field(wl_um, T_star=9000.0, dilution=1e-12):
    return dilution * st.planck_lambda(wl_um, np.array([T_star]))[0]


def _kramers_cabs(a_um, wl_um):
    """Toy absorption cross-section: geometric at short lambda with a
    1/lambda falloff beyond 2 pi a (qualitatively dust-like)."""
    x = 2.0 * np.pi * a_um / wl_um
    q = np.minimum(1.0, x)
    return np.pi * a_um ** 2 * q


@pytest.fixture(scope="module")
def wl():
    return np.exp(np.linspace(np.log(0.05), np.log(3000.0), 120))


def test_enthalpy_dulong_petit():
    # far above the highest Debye temperature (2504 K) so the classical
    # limit applies -- a math check, not a physical temperature
    T = np.array([50000.0])
    for mat, aw in (("graphite", 12.0), ("silicate", 24.6)):
        a = 0.01
        U = st.grain_enthalpy(a, T, mat, 2.5)[0]
        mass_g = (4.0 / 3.0) * np.pi * (a * 1e-4) ** 3 * 2.5
        n_at = mass_g / (aw * st.amu_g)
        # U -> 3 (N-2) k T at high T
        assert U / ((n_at - 2) * cst.kb * T[0]) == pytest.approx(3.0,
                                                                rel=0.05)
    # monotonicity
    Ts = np.linspace(2.0, 2000.0, 50)
    U = st.grain_enthalpy(0.001, Ts, "graphite", 2.24)
    assert np.all(np.diff(U) > 0)


def test_energy_conservation_and_limits(wl):
    J = _radiation_field(wl)
    dlam_m = np.gradient(wl) * 1e-6

    for a_um, mat, rho in ((0.0005, "PAH", 2.24), (0.005, "graphite", 2.24),
                           (0.1, "silicate", 3.5)):
        c_abs = _kramers_cabs(a_um, wl)
        tab = st.build_nre_tables(a_um, c_abs, wl, mat, rho)
        P, is_re, T_eq = st.solve_temperature_distribution(
            tab, J[None, :])
        assert P.shape == (1, tab.T_bins.size)
        assert np.all(P >= 0) and P[0].sum() == pytest.approx(1.0, abs=1e-5)

        p_abs = 4 * np.pi * (tab.c_abs_m2 * J * dlam_m).sum()
        j = st.nre_emissivity(tab, P)                  # (1, L)
        p_em = 4 * np.pi * (j[0] * dlam_m).sum()
        # emitted == absorbed within discretisation error
        assert p_em == pytest.approx(p_abs, rel=0.15)


def test_large_grain_is_equilibrium(wl):
    J = _radiation_field(wl, dilution=1e-8)
    a_um = 1.0
    c_abs = _kramers_cabs(a_um, wl)
    tab = st.build_nre_tables(a_um, c_abs, wl, "silicate", 3.5)
    P, is_re, T_eq = st.solve_temperature_distribution(tab, J[None, :])
    assert bool(is_re[0])
    # P concentrated near T_eq: the mean of P should be close to T_eq
    T_mean = (P[0] * tab.T_bins).sum()
    assert T_mean == pytest.approx(T_eq[0], rel=0.25)


def test_small_grain_fluctuates(wl):
    J = _radiation_field(wl, dilution=1e-14)
    a_um = 0.0005                                      # 5 Angstrom PAH
    c_abs = _kramers_cabs(a_um, wl)
    tab = st.build_nre_tables(a_um, c_abs, wl, "PAH", 2.24)
    P, is_re, T_eq = st.solve_temperature_distribution(tab, J[None, :])
    assert not bool(is_re[0])
    # the grain sits cold most of the time with rare temperature spikes:
    # the bulk of the *emitted power* comes from temperatures far above
    # the equilibrium temperature (the hallmark of stochastic heating)
    p_em_per_bin = P[0] * tab.cool
    hot = tab.T_bins > 2.0 * T_eq[0]
    frac_hot = p_em_per_bin[hot].sum() / max(p_em_per_bin.sum(), 1e-300)
    assert frac_hot > 0.5


def test_nre_pipeline_end_to_end(tmp_path):
    """Thermal MC with a heating_method=3 species writes Proba_Tdust and the
    J-field diagnostic, with physically sensible values."""
    import os

    from mcfost_tpu.config.para import Para
    from mcfost_tpu.io.fits import read_fits
    from mcfost_tpu.runner import run_thermal

    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 16, 8, 2
    para.wavelengths.n_lambda = 20
    para.photons.n_eq_th = 8000
    para.zones[0].dust_mass = 1e-8
    for sp in para.dust[0]:
        sp.n_grains = 4
        sp.amin, sp.amax = 0.005, 0.5
        sp.heating_method = 3
    T, sed_th, model, host, res = run_thermal(
        para, root_dir=str(tmp_path), batch=2048, verbose=False,
        output_j=True, use_all_devices=False)

    pfile = os.path.join(str(tmp_path), "data_th", "Proba_Tdust.fits.gz")
    assert os.path.isfile(pfile)
    hdus = read_fits(pfile)
    proba = hdus[0][1]
    assert proba.shape[0] == 4                      # grain sizes
    # probabilities: non-negative, cells with radiation normalised to 1
    assert proba.min() >= -1e-6
    sums = proba.sum(axis=1).ravel()
    touched = sums > 0.5
    assert touched.any()
    np.testing.assert_allclose(sums[touched], 1.0, atol=1e-3)

    jfile = os.path.join(str(tmp_path), "data_th", "J.fits.gz")
    assert os.path.isfile(jfile)
    J = read_fits(jfile)[0][1]
    assert J.max() > 0 and np.isfinite(J).all()


def test_equilibrium_temperature_per_size(wl):
    J = _radiation_field(wl, dilution=1e-10)
    sizes = np.array([0.01, 0.1, 1.0])
    c_abs = np.stack([_kramers_cabs(a, wl) for a in sizes])
    T = st.equilibrium_temperature_per_size(c_abs, J[None, :], wl)
    assert T.shape == (3, 1)
    assert np.all(T > 1.0) and np.all(T < 3000.0)
    # small grains absorb UV efficiently but emit poorly -> hotter
    assert T[0, 0] > T[2, 0]


def test_tabulated_specific_heat_enthalpy():
    """Misselt/DustEM tabulated C(T) drives the enthalpy grid
    (specific_heat dispatch, PAH.f90:14-37): U = m int C dT, monotonic,
    and recovering C on differentiation."""
    from mcfost_tpu.physics.stochastic import grain_enthalpy
    T_tab = np.geomspace(2.0, 3000.0, 60)
    C_tab = 1e4 * (T_tab / 100.0) ** 2        # erg/g/K, Debye-like T^2
    T = np.geomspace(3.0, 2500.0, 100)
    U = grain_enthalpy(0.01, T, "silicate", 2.5, sh_table=(T_tab, C_tab))
    assert np.isfinite(U).all() and (np.diff(U) > 0).all()
    # dU/dT ~ m C(T) in the mid range
    mass_g = (4.0 / 3.0) * np.pi * (0.01e-4) ** 3 * 2.5
    mid = slice(30, 70)
    dUdT = np.gradient(U, T)[mid]
    expect = mass_g * np.interp(T[mid], T_tab, C_tab) * 1e-7
    assert np.allclose(dUdT, expect, rtol=0.15)


def test_dustem_heat_capacity_reader(tmp_path):
    import os
    from mcfost_tpu.dust.opacity_files import read_dustem_heat_capacity
    d = tmp_path / "hcap"
    os.makedirs(d)
    nT = 8
    logT = np.linspace(0.5, 3.5, nT)
    logC = 2.0 * logT - 1.0
    with open(d / "C_amC.DAT", "w") as f:
        f.write("# comment\n2\n0.01 0.1\n%d\n" % nT)
        for k in range(nT):
            f.write(f"{logT[k]} {logC[k]}\n")
    out = read_dustem_heat_capacity(str(tmp_path), "amC", rho1g=2.0)
    assert out is not None
    T, C = out
    np.testing.assert_allclose(T, 10.0 ** logT)
    np.testing.assert_allclose(C, 10.0 ** logC / 2.0)
