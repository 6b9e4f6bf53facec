"""Phantom dump format round-trip + SPH -> Voronoi pipeline tests."""
import numpy as np
import pytest

from mcfost_tpu import constants as cst
from mcfost_tpu.io import phantom as ph
from mcfost_tpu.grids.sph import sph_to_voronoi


def _synthetic_disk(n=3000, seed=5):
    """A thin Keplerian disk of SPH particles in code units."""
    rng = np.random.default_rng(seed)
    r = 10.0 * rng.uniform(0.1, 1.0, n) ** 0.5
    phi = rng.uniform(0, 2 * np.pi, n)
    z = 0.05 * r * rng.normal(size=n)
    x, y = r * np.cos(phi), r * np.sin(phi)
    h = np.full(n, 0.3)
    return x, y, z, h


@pytest.fixture(scope="module")
def dump_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ph") / "disc_00000")
    x, y, z, h = _synthetic_disk()
    n = x.size
    udist = cst.AU_to_cm                   # 1 AU
    umass = cst.Msun_to_g
    utime = np.sqrt(udist ** 3 / (ph.G_CGS * umass))
    header = {
        "nparttot": np.int64(n),
        "ntypes": np.int32(1),
        "npartoftype": np.int32(n),
        "nblocks": np.int32(1),
        "massoftype": 1e-9,                # Msun per particle
        "hfact": 1.2,
        "time": 0.5,
        "udist": udist, "umass": umass, "utime": utime,
    }
    parts = {"x": x, "y": y, "z": z, "h": h,
             "vx": np.zeros(n), "vy": np.zeros(n), "vz": np.zeros(n),
             "itype": np.ones(n, np.int8),
             "dustfrac": np.full(n, 0.01)}
    sinks = {"x": np.array([0.0]), "y": np.array([0.0]),
             "z": np.array([0.0]), "m": np.array([1.0]),
             "h": np.array([0.01])}
    ph.write_dump(path, header, parts, sinks)
    return path


def test_roundtrip_read(dump_file):
    dump = ph.read_dump(dump_file)
    assert dump.fileid.startswith("FT")
    assert int(dump.hvalue("nparttot")) == 3000
    assert dump.hvalue("hfact") == pytest.approx(1.2)
    part = dump.blocks[0][0]
    assert set(part) >= {"x", "y", "z", "h", "vx", "dustfrac", "itype"}
    assert part["x"].size == 3000
    sink = dump.blocks[0][1]
    assert sink["m"].size == 1


def test_unit_conversion(dump_file):
    sph = ph.read_phantom(dump_file)
    assert sph.xyz.shape == (3000, 3)
    # udist = 1 AU: positions in AU match code units
    assert np.abs(sph.xyz[:, 0]).max() < 11.0
    assert sph.mass[0] == pytest.approx(1e-9 * cst.Msun_to_g, rel=1e-6)
    # rho = m (hfact/h)^3: all particles same h -> same rho
    assert np.allclose(sph.rho_gas, sph.rho_gas[0])
    rho_expect = (1e-9 * (1.2 / 0.3) ** 3
                  * cst.Msun_to_g / cst.AU_to_cm ** 3)
    assert sph.rho_gas[0] == pytest.approx(rho_expect, rel=1e-6)
    assert sph.star_mass[0] == pytest.approx(1.0, rel=1e-6)
    assert sph.dustfrac.shape == (1, 3000)


def test_bad_units_rejected(dump_file):
    dump = ph.read_dump(dump_file)
    dump.header["utime"] = np.float64(123.0)   # breaks G consistency
    with pytest.raises(ValueError, match="inconsistent"):
        ph.phantom_to_sph(dump)


def test_voronoi_thermal_mc_end_to_end(dump_file):
    """Full pipeline: Phantom dump -> Voronoi mesh -> thermal MC."""
    import jax
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model
    from mcfost_tpu.mc.thermal_mc import run_thermal_mc, final_temperature

    sph = ph.read_phantom(dump_file)
    para = Para()
    para.wavelengths.n_lambda = 16
    for sp in para.dust[0]:
        sp.n_grains = 6
        sp.amax = 10.0
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache",
                              sph=sph)
    assert model.grid.n_cells == int(
        np.sum(np.asarray(model.kappa_factor) >= 0))
    # sink became the star at the origin
    assert np.allclose(np.asarray(model.star_pos)[0], 0.0, atol=1e-6)

    res = run_thermal_mc(model, jax.random.PRNGKey(3), 4000, batch=2048,
                         max_iters=40000, mrw=False)
    assert int(res.emitted) == 4000
    # energy conservation: packets exit (minus the few that hit the star)
    out_frac = float(res.sed[..., 0].sum()) / 4000
    assert out_frac > 0.95
    T = np.asarray(final_temperature(model, res.xkj, 4000))
    seeds = np.asarray(model.grid.seeds)
    r = np.linalg.norm(seeds, axis=1)
    heated = T > 1.5
    assert heated.mean() > 0.5
    # temperature decreases outward (binned medians, MC noise tolerant)
    rb = np.quantile(r[heated], [0.1, 0.5, 0.9])
    t_in = np.median(T[heated & (r < rb[0])])
    t_out = np.median(T[heated & (r > rb[2])])
    assert t_in > 1.5 * t_out


def test_sph_to_voronoi_mass_conservation(dump_file):
    sph = ph.read_phantom(dump_file)
    model = sph_to_voronoi(sph)
    vol = np.asarray(model.grid.volume, np.float64)
    # rho * V restores each kept particle's mass exactly
    mass_back = (model.rho_gas * vol * cst.AU3_to_cm3)
    np.testing.assert_allclose(mass_back, sph.mass[model.keep], rtol=1e-5)
    assert model.rho_dust == pytest.approx(model.rho_gas * 0.01)
    # most particles survive the default percentile box
    assert model.keep.mean() > 0.9


def test_hdf5_roundtrip(tmp_path, dump_file):
    """HDF5 dump -> same SPHModel as the Fortran-binary dump."""
    h5 = str(tmp_path / "disc_00000.h5")
    x, y, z, h = _synthetic_disk()
    n = x.size
    udist = cst.AU_to_cm
    umass = cst.Msun_to_g
    utime = np.sqrt(udist ** 3 / (ph.G_CGS * umass))
    header = {"nparttot": np.int64(n), "ntypes": np.int32(1),
              "npartoftype": np.int32(n), "nblocks": np.int32(1),
              "massoftype": 1e-9, "hfact": 1.2, "time": 0.5,
              "udist": udist, "umass": umass, "utime": utime}
    parts = {"x": x, "y": y, "z": z, "h": h,
             "vx": np.zeros(n), "vy": np.zeros(n), "vz": np.zeros(n),
             "itype": np.ones(n, np.int8),
             "dustfrac": np.full(n, 0.01)}
    sinks = {"x": np.array([0.0]), "y": np.array([0.0]),
             "z": np.array([0.0]), "m": np.array([1.0]),
             "h": np.array([0.01])}
    ph.write_dump_hdf5(h5, header, parts, sinks)

    sph_h5 = ph.read_phantom(h5)          # magic-dispatched
    sph_bin = ph.read_phantom(dump_file)
    np.testing.assert_allclose(sph_h5.xyz, sph_bin.xyz, rtol=1e-12)
    np.testing.assert_allclose(sph_h5.rho_gas, sph_bin.rho_gas, rtol=1e-12)
    np.testing.assert_allclose(sph_h5.star_mass, sph_bin.star_mass)
    assert sph_h5.dustfrac is not None


def test_dust_moments_roundtrip(tmp_path):
    """Nucleation moments K0..K3 survive the dump round-trip and feed the
    moment reconstruction (read_phantom.f90:275-283 + SPH2mcfost.f90:381)."""
    import math
    from mcfost_tpu import constants as cst
    from mcfost_tpu.io import phantom as ph
    from mcfost_tpu.dust.moments import reconstruct_gamma_dist
    rng = np.random.default_rng(3)
    n = 40
    udist = cst.AU_to_cm
    umass = cst.Msun_to_g
    utime = np.sqrt(udist ** 3 / (ph.G_CGS * umass))
    header = {"nparttot": np.int64(n), "ntypes": np.int32(1),
              "npartoftype": np.int32(n), "nblocks": np.int32(1),
              "massoftype": 1e-8, "hfact": 1.2, "time": 0.0,
              "udist": udist, "umass": umass, "utime": utime}
    # moments of a generalized gamma with (d/p, p) = (2, 1)
    def ratio(a, b):
        return math.exp(math.lgamma(a) - math.lgamma(b))
    mu = np.array([3.0 * 2.0 ** (k / 3.0) * ratio(2.0 + k / 3.0, 2.0)
                   for k in range(4)])
    parts = {"x": rng.uniform(-5, 5, n), "y": rng.uniform(-5, 5, n),
             "z": rng.uniform(-1, 1, n), "h": np.full(n, 0.6),
             "itype": np.ones(n, np.int8)}
    for k in range(4):
        parts[f"K{k}"] = np.full(n, mu[k])
    p = str(tmp_path / "dumpK")
    ph.write_dump(p, header, parts, {"x": np.array([0.0]),
                                     "y": np.array([0.0]),
                                     "z": np.array([0.0]),
                                     "m": np.array([1.0]),
                                     "h": np.array([0.05])})
    sph = ph.read_phantom(p)
    assert sph.dust_moments is not None
    assert sph.dust_moments.shape == (4, n)
    np.testing.assert_allclose(sph.dust_moments[:, 0], mu)
    lam, res, ierr = reconstruct_gamma_dist(sph.dust_moments[:, 0])
    assert ierr in (1, 5)
    # the (d/p, p) pair is not unique, but the matched moments are
    from mcfost_tpu.dust.moments import gamma_func_moment
    for k in (2, 3):
        got = gamma_func_moment(mu, lam[0], lam[1], k)
        assert abs(got / mu[k] - 1.0) < 0.12, (k, got, mu[k])
