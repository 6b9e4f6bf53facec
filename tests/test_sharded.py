"""First-class sharded MC: determinism, physics parity with single-device,
compaction/MRW in the sharded driver (VERDICT r1 items 4/5)."""
import jax
import numpy as np
import pytest

from mcfost_tpu.config.para import Para
from mcfost_tpu.mc.model import build_model
from mcfost_tpu.mc import thermal_mc
from mcfost_tpu.parallel.mesh import make_mesh, run_thermal_mc_sharded


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = Para()
    p.grid.n_rad, p.grid.nz, p.grid.n_rad_in = 14, 8, 2
    p.wavelengths.n_lambda = 8
    for sp in p.dust[0]:
        sp.n_grains = 8
    return build_model(p, cache_dir=str(tmp_path_factory.mktemp("c")))[0]


def _run(model, seed=0, n=1024):
    mesh = make_mesh(jax.devices())
    return run_thermal_mc_sharded(
        model, jax.random.PRNGKey(seed), n_packets=n, mesh=mesh,
        batch_per_device=128, mrw=True, age_cap=20000)


def test_sharded_deterministic(model):
    r1 = _run(model)
    r2 = _run(model)
    np.testing.assert_array_equal(np.asarray(r1.xkj), np.asarray(r2.xkj))
    assert int(r1.emitted) == int(r2.emitted)


def test_sharded_matches_single_device_physics(model):
    """Same total packet budget: the sharded absorbed-energy tally must
    agree with the single-device one within MC noise (different RNG
    streams, same physics)."""
    n = 4096
    rs = _run(model, n=n)
    r1 = thermal_mc.run_thermal_mc(model, jax.random.PRNGKey(1), n,
                                   batch=1024)
    a_s = float(np.asarray(rs.xkj).sum()) / int(rs.emitted)
    a_1 = float(np.asarray(r1.xkj).sum()) / int(r1.emitted)
    assert a_s > 0 and a_1 > 0
    assert abs(a_s - a_1) / a_1 < 0.15, (a_s, a_1)
    # temperatures from both tallies agree cell-wise where sampled well
    T_s = np.asarray(thermal_mc.final_temperature(model, rs.xkj,
                                                  int(rs.emitted)))
    T_1 = np.asarray(thermal_mc.final_temperature(model, r1.xkj,
                                                  int(r1.emitted)))
    good = (T_s > 5) & (T_1 > 5)
    rel = np.abs(T_s[good] - T_1[good]) / T_1[good]
    assert np.percentile(rel, 75) < 0.2
