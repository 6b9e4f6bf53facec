"""Sobolev escape probability, HEALPix directions, Ng acceleration.

Physics limits pinned:
* beta(tau->0) = 1 (optically thin: pure escape), beta(large tau) ~ 1/tau;
* LVG populations -> LTE at high collider density;
* LVG seed is consistent with the ray-based NLTE solve on a dense disk;
* HEALPix RING centres are unit, equal-area (quadrature test), all-unique;
* Ng acceleration is exact on a 2-dominant-mode linear fixed point.
"""
import numpy as np

from mcfost_tpu.config.para import Para
from mcfost_tpu.gas.escape import beta_escape, sobolev_populations
from mcfost_tpu.mc.model import build_model
from mcfost_tpu.physics.molecules import builtin_co, lte_populations
from mcfost_tpu.utils.healpix import healpix_npix, healpix_ring_directions
from mcfost_tpu.utils.ng import ng_accelerate


def test_beta_limits():
    assert np.isclose(beta_escape(np.array([1e-12]))[0], 1.0)
    assert np.isclose(beta_escape(np.array([100.0]))[0], 0.01, rtol=1e-3)
    b = beta_escape(np.linspace(0.0, 50.0, 200))
    assert np.all(np.diff(b) <= 1e-12)          # monotone decreasing


def _small_model():
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 10, 6, 2
    para.wavelengths.n_lambda = 10
    para.zones[0].dust_mass = 1e-4
    for sp in para.dust[0]:
        sp.n_grains = 4
        sp.amax = 10.0
    model, host = build_model(para, cache_dir=".mcfost_tpu_cache")
    return para, model, host


def test_sobolev_dense_disk_near_lte():
    para, model, host = _small_model()
    co = builtin_co(8)
    C = model.grid.n_cells
    T_gas = np.full(C, 40.0)
    pops, it, diff = sobolev_populations(model, host, co, T_gas, 1e-6,
                                         nlev=6)
    from mcfost_tpu.transfer.mol import gas_number_density
    n_mol = gas_number_density(host) * 1e-6
    lte = lte_populations(co, T_gas, n_mol)
    # densest cells must be very close to LTE (excitation ratios)
    dense = gas_number_density(host) > 1e14
    assert dense.any()
    r = (pops[dense, 1:4] / pops[dense, :1]) \
        / (lte[dense, 1:4] / np.maximum(lte[dense, :1], 1e-300))
    assert np.abs(r - 1).max() < 0.05
    # conservation over the solved levels
    ok = n_mol > 0
    assert np.allclose(pops[ok, :6].sum(1), n_mol[ok], rtol=1e-6)


def test_healpix_directions():
    for nside in (1, 2, 4):
        d = healpix_ring_directions(nside)
        assert d.shape == (healpix_npix(nside), 3)
        assert np.allclose(np.linalg.norm(d, axis=1), 1.0)
        assert len(np.unique(np.round(d, 12), axis=0)) == d.shape[0]
        # equal-area quadrature: mean over pixels integrates P2 to ~0
        p2 = ((3 * d[:, 2] ** 2 - 1) / 2).mean()
        assert abs(p2) < 0.06 / nside ** 2 + 1e-12
        # symmetric: vector sum ~ 0
        assert np.abs(d.sum(0)).max() < 1e-12 * d.shape[0] + 1e-10


def test_ng_exact_two_mode():
    A = np.diag([0.99, 0.9])
    b = np.ones(2)
    xstar = np.linalg.solve(np.eye(2) - A, b)
    x = np.zeros(2)
    hist = [x]
    for _ in range(6):
        x = A @ x + b
        hist.append(x)
    acc = ng_accelerate(hist, order=2)
    assert np.abs((acc - xstar) / xstar).max() < 1e-5
    plain = np.abs((hist[-1] - xstar) / xstar).max()
    assert plain > 0.5      # plain iteration is nowhere near converged
