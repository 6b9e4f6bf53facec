"""NLTE molecular solver validation.

The fundamental limit tests:
* high density (n >> n_crit): SEE populations -> LTE (collisions dominate);
* the SEE solver itself conserves particles and reproduces LTE when fed
  the Planck radiation field at the gas temperature.
"""
import numpy as np
import pytest

from mcfost_tpu import constants as cst
from mcfost_tpu.config.para import Para
from mcfost_tpu.mc.model import build_model
from mcfost_tpu.physics.molecules import builtin_co, lte_populations
from mcfost_tpu.transfer.mol_nlte import nlte_populations, solve_see


def test_see_planck_field_gives_lte():
    """Feeding B_nu(T) as J_bar must return LTE populations exactly
    (detailed balance)."""
    co = builtin_co(8)
    T = np.array([40.0, 80.0])
    n_mol = np.array([1.0, 1.0])
    n_coll = np.array([1e10, 1e10])   # any value: radiation + collisions
    nlev = 6
    jbar = np.zeros((2, len(co.Aul)))
    for itr in range(len(co.Aul)):
        x = cst.hp * co.freq[itr] / (cst.kb * T)
        jbar[:, itr] = (2 * cst.hp * co.freq[itr] ** 3 / cst.c_light ** 2
                        / (np.exp(x) - 1.0))
    pops = solve_see(co, T, n_coll, n_mol, jbar, nlev)
    expect = lte_populations(co, T, n_mol)[:, :nlev]
    # conservation
    assert np.allclose(pops.sum(1), n_mol, rtol=1e-8)
    # ratios match Boltzmann
    assert np.allclose(pops / pops[:, :1],
                       expect / expect[:, :1], rtol=1e-3)


def test_see_high_density_lte_limit():
    """n_coll >> n_crit forces LTE regardless of the radiation field."""
    co = builtin_co(8)
    T = np.array([30.0])
    n_mol = np.array([1.0])
    n_coll = np.array([1e18])         # far above CO n_crit (~1e9-1e11 m^-3)
    jbar = np.zeros((1, len(co.Aul)))  # no radiation at all
    pops = solve_see(co, T, n_coll, n_mol, jbar, 6)
    expect = lte_populations(co, T, n_mol)[:, :6]
    assert np.allclose(pops / pops[:, :1], expect / expect[:, :1],
                       rtol=1e-2)


def test_nlte_iteration_dense_disk_stays_near_lte():
    """A dense disk (n_H2 >> n_crit everywhere that matters) must converge
    quickly with populations close to LTE."""
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 12, 6, 2
    para.wavelengths.n_lambda = 12
    para.zones[0].dust_mass = 1e-4     # n_H2 ~ 1e13-1e17 m^-3
    para.mol.molecules[0].abundance = 1e-6
    for sp in para.dust[0]:
        sp.n_grains = 8
        sp.amax = 10.0
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    T = np.full(model.grid.n_cells, 25.0)
    co = builtin_co(8)
    pops, n_iter, diff = nlte_populations(
        model, host, co, T, abundance=1e-6, nlev=6, n_rays=8, max_iter=10)
    assert diff < 0.05, diff
    from mcfost_tpu.transfer.mol import gas_number_density
    n_mol = gas_number_density(host) * 1e-6
    lte = lte_populations(co, T, n_mol)
    # compare the J=1,2 populations in the dense midplane cells
    dense = n_mol > np.percentile(n_mol, 80)
    for lev in (1, 2):
        r = pops[dense, lev] / lte[dense, lev]
        assert np.median(np.abs(r - 1.0)) < 0.1, (lev, np.median(r))


def _thick_disk(nh2_scale=1.0):
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 12, 6, 2
    para.wavelengths.n_lambda = 12
    para.zones[0].dust_mass = 1e-5 * nh2_scale
    para.mol.molecules[0].abundance = 1e-4   # very abundant: thick lines
    for sp_ in para.dust[0]:
        sp_.n_grains = 8
        sp_.amax = 10.0
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    T = np.full(model.grid.n_cells, 25.0)
    return para, model, host, T


def test_ali_operator_consistency():
    """At any population state, the frozen-field local-ALI J_bar evaluated
    with the SAME populations must equal the directly integrated J_bar
    (the local operator is exact when nothing changes)."""
    from mcfost_tpu.transfer.mol import MolRT
    from mcfost_tpu.transfer import mol_nlte as mn

    para, model, host, T = _thick_disk()
    co = builtin_co(6)
    from mcfost_tpu.transfer.mol import gas_number_density
    n_mol = gas_number_density(host) * 1e-4
    pops = lte_populations(co, T, n_mol)
    itrans = np.arange(3)
    rt = MolRT(model, host, co, T, itrans, abundance=1e-4,
               v_turb=para.mol.v_turb, v_turb_unit=para.mol.v_turb_unit,
               pops=pops)
    dirs = mn._fibonacci_sphere(12)
    # full J_bar (own cell included)
    I_full, _, vproj0, tab = mn.gather_incident_field(
        model, host, rt, dirs, nv=15, exclude_own=False)
    sig2_m1 = np.asarray(rt.sigma2_m1, np.float64)
    dvv = tab[None, None, :] - vproj0[:, :, None]
    w = np.exp(-sig2_m1[:, None, None] * dvv * dvv)
    j_direct = (I_full.astype(np.float64) * w[:, :, None, :]).sum((1, 3)) \
        / np.maximum(w.sum((1, 2)), 1e-300)[:, None]
    # ALI decomposition: external field + local reconstruction at the
    # same populations
    I_ext, ds0, vproj0b, tabb = mn.gather_incident_field(
        model, host, rt, dirs, nv=15, exclude_own=True)
    rt_np = (sig2_m1, np.asarray(rt.norme_m1, np.float64),
             np.asarray(rt.kappa_cont, np.float64),
             np.asarray(rt.emis_cont, np.float64))
    j_ali = mn._local_jbar(co, rt_np, pops, I_ext, ds0, vproj0b, tabb,
                           itrans, co.freq[itrans])
    # a few edge cells index just across a wall from their centre and
    # carry no own-cell segment; the vast majority must
    assert (ds0 > 0).mean() > 0.9
    sig = j_direct > j_direct.max() * 1e-6
    rel = np.abs(j_ali[sig] - j_direct[sig]) / j_direct[sig]
    # the split is not bitwise (sub-cell velocity sampling vs single-point
    # local profile) but must agree closely
    assert np.median(rel) < 0.1, np.median(rel)
    assert np.percentile(rel, 75) < 0.3, np.percentile(rel, 75)


def test_staged_nlte_thick_line_thermalizes_by_trapping():
    """Optically thick CO with photon trapping: Tex(1-0) in the dense
    midplane approaches T_kin even though radiative rates are large —
    the regime where plain lambda iteration is slow and the local ALI
    sub-iteration is required (reference mol_transfer.f90:138-480)."""
    para, model, host, T = _thick_disk()
    co = builtin_co(6)
    pops, n_iter, diff = nlte_populations(
        model, host, co, T, abundance=1e-4, nlev=5, n_rays=24,
        max_iter=12, initial="sobolev", nv=11)
    assert diff < 0.1, diff
    from mcfost_tpu.transfer.mol import gas_number_density
    n_mol = gas_number_density(host) * 1e-4
    dense = n_mol > np.percentile(n_mol, 85)
    # Tex(1-0) from the population ratio
    g0, g1 = co.g[0], co.g[1]
    dE = (co.level_energy[1] - co.level_energy[0]) * 1.602176634e-19
    ratio = pops[dense, 1] / np.maximum(pops[dense, 0], 1e-300)
    tex = -dE / (cst.kb * np.log(np.maximum(ratio * g0 / g1, 1e-300)))
    assert np.median(tex) > 0.7 * 25.0, np.median(tex)
    assert np.median(np.abs(tex - 25.0) / 25.0) < 0.35, np.median(tex)
