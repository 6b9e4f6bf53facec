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
