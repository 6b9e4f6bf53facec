"""3D cylindrical grid (n_az > 1): traversal properties + 2D/3D parity.

The reference's flagship 3D config is src/ref4.1_3D.para (n_az=72); its
traversal is cross_cylindrical_cell's phi-plane branch
(cylindrical_grid.f90:1090-1130).  An axisymmetric model must give the
same azimuthally-averaged temperature in 2D and 3D.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcfost_tpu.config.para import Para
from mcfost_tpu.grids import cyl3d, geometry as geom


@pytest.fixture(scope="module")
def grid():
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_az = 12, 6, 8
    para.grid.n_rad_in = 3
    return cyl3d.build_cyl3d_grid(para, dtype=jnp.float32)


def test_build_volumes(grid):
    r = np.asarray(grid.r_lim, np.float64)
    zmax = np.asarray(grid.zmax, np.float64)
    vtot = np.asarray(grid.volume, np.float64).sum()
    expect = (np.pi * (r[1:] ** 2 - r[:-1] ** 2) * 2 * zmax).sum()
    assert np.isclose(vtot, expect, rtol=1e-5)
    assert grid.n_cells == 12 * 2 * 6 * 8
    assert grid.n_az == 8 and grid.nz == 6 and grid.n_rad == 12


def test_pos_index_roundtrip(grid):
    rng = np.random.default_rng(0)
    n = 4000
    ic = rng.integers(0, grid.n_cells, n).astype(np.int32)
    ri, zj = geom.cell_from_flat(grid, jnp.asarray(ic))
    r1, r2, r3 = [jnp.asarray(rng.random(n), jnp.float32) for _ in range(3)]
    x, y, z = geom.pos_in_cell(grid, ri, zj, r1, r2, r3)
    ri2, zj2 = geom.index_cell(grid, x, y, z)
    assert np.array_equal(np.asarray(geom.flat_index(grid, ri2, zj2)), ic)


def test_traversal_terminates_and_segments_belong(grid):
    rng = np.random.default_rng(1)
    n = 2000
    ic = rng.integers(0, grid.n_cells, n).astype(np.int32)
    ri, zj = geom.cell_from_flat(grid, jnp.asarray(ic))
    r1, r2, r3 = [jnp.asarray(rng.random(n), jnp.float32) for _ in range(3)]
    x, y, z = geom.pos_in_cell(grid, ri, zj, r1, r2, r3)
    u_ = rng.normal(size=(n, 3))
    u_ /= np.linalg.norm(u_, axis=1, keepdims=True)
    u, v, w = [jnp.asarray(u_[:, i], jnp.float32) for i in range(3)]
    alive = ~geom.has_exited(grid, ri, zj, z)
    bad_mid = 0
    for it in range(400):
        x1, y1, z1, ri1, zj1, length = geom.cross_cell(
            grid, x, y, z, u, v, w, ri, zj)
        # midpoint of each traversed segment must lie in the claimed cell
        inside = np.asarray(alive & geom.is_inside(grid, ri, zj))
        xm = np.asarray(0.5 * (x + x1))[inside]
        ym = np.asarray(0.5 * (y + y1))[inside]
        zm = np.asarray(0.5 * (z + z1))[inside]
        rim, zjm = geom.index_cell(grid, jnp.asarray(xm), jnp.asarray(ym),
                                   jnp.asarray(zm))
        fm = np.asarray(geom.flat_index(grid, rim, zjm))
        fc = np.asarray(geom.flat_index(grid, ri, zj))[inside]
        bad_mid += int((fm != fc).sum())
        x = jnp.where(alive, x1, x)
        y = jnp.where(alive, y1, y)
        z = jnp.where(alive, z1, z)
        ri = jnp.where(alive, ri1, ri)
        zj = jnp.where(alive, zj1, zj)
        alive = alive & ~geom.has_exited(grid, ri, zj, z)
        if not bool(alive.any()):
            break
    assert not bool(alive.any()), "rays did not exit the 3D grid"
    # float32 wall guards allow a tiny fraction of boundary-straddling
    # midpoints; anything more indicates a traversal bug
    assert bad_mid <= 0.005 * n * it, f"{bad_mid} segment midpoints astray"


def _tiny_para(n_az):
    para = Para()
    para.photons.n_eq_th = 20000
    para.wavelengths.n_lambda = 15
    para.grid.n_rad, para.grid.nz, para.grid.n_az = 10, 6, n_az
    para.grid.n_rad_in = 2
    for z in para.zones:
        z.dust_mass = 1e-6
    return para


def test_thermal_mc_3d_matches_2d_axisymmetric():
    """Azimuthally-averaged 3D temperature == 2D temperature (within MC
    noise) on an axisymmetric model; also checks ref4.1-style n_az>1
    configs actually run (VERDICT: n_az was silently dropped)."""
    from mcfost_tpu.mc.model import build_model
    from mcfost_tpu.mc import thermal_mc

    key = jax.random.PRNGKey(7)
    out = {}
    for n_az in (1, 4):
        para = _tiny_para(n_az)
        model, host = build_model(para, cache_dir=None)
        res = thermal_mc.run_thermal_mc(model, key, para.photons.n_eq_th,
                                        batch=4096, mrw=False)
        T = np.asarray(thermal_mc.final_temperature(
            model, res.xkj, int(res.emitted)), np.float64)
        out[n_az] = T
    T2d = out[1].reshape(6, 10)                       # (nz, n_rad)
    T3d = out[4].reshape(4, 12, 10)                   # (n_az, 2nz, n_rad)
    # azimuthal mean, folded in z to match the 2D |z| convention
    T3d_fold = 0.5 * (T3d.mean(0)[6:] + T3d.mean(0)[:6][::-1])
    mask = (T2d > 5.0) & (T3d_fold > 5.0)
    rel = np.abs(T3d_fold - T2d)[mask] / T2d[mask]
    # MC-percentile comparator in the spirit of the reference test suite
    # (test_suite/test_mcfost.py:46-57)
    assert np.percentile(rel, 75) < 0.12, (
        f"3D vs 2D temperature 75th-pct rel diff {np.percentile(rel, 75)}")
