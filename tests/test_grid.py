"""Property tests for the cylindrical grid traversal.

The reference has no unit tests (docs/test_suite.rst:7-8); these kernel-level
tests are the new framework's substitute for golden-model traversal parity:
random rays are marched through the grid and checked for geometric
consistency (chord lengths, cell membership, termination).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcfost_tpu.config.para import Para
from mcfost_tpu.grids import cylindrical as cyl


@pytest.fixture(scope="module")
def grid():
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 30, 20, 5
    return cyl.build_cylindrical_grid(para, dtype=jnp.float32)


def test_grid_build(grid):
    r = np.asarray(grid.r_lim)
    assert r.shape == (31,)
    assert np.all(np.diff(r) > 0)
    assert np.isclose(r[0], 1.0)
    assert np.isclose(r[-1], 300.0)
    assert grid.n_rad == 30 and grid.nz == 20
    # volumes: sum of cell volumes = 2*pi*(Rmax^2-Rmin^2)* <zmax> style check
    v = np.asarray(grid.volume).reshape(20, 30)
    dr2 = np.pi * (r[1:] ** 2 - r[:-1] ** 2)
    zmax = np.asarray(grid.zmax)
    assert np.allclose(v.sum(0), 2 * dr2 * zmax, rtol=1e-5)


def test_index_cell_roundtrip(grid):
    rng = np.random.default_rng(0)
    n = 2000
    r = np.exp(rng.uniform(np.log(1.01), np.log(299.0), n))
    phi = rng.uniform(0, 2 * np.pi, n)
    x, y = r * np.cos(phi), r * np.sin(phi)
    zmax_at = np.asarray(grid.zmax)[
        np.searchsorted(np.asarray(grid.r_lim), r) - 1]
    z = rng.uniform(-0.99, 0.99, n) * zmax_at
    ri, zj = cyl.index_cell(grid, jnp.asarray(x, jnp.float32),
                            jnp.asarray(y, jnp.float32),
                            jnp.asarray(z, jnp.float32))
    ri, zj = np.asarray(ri), np.asarray(zj)
    assert np.all((ri >= 1) & (ri <= 30))
    assert np.all((zj >= 1) & (zj <= 20))
    # verify against wall arrays
    r_lim = np.asarray(grid.r_lim)
    assert np.all(r >= r_lim[ri - 1] * (1 - 1e-5))
    assert np.all(r <= r_lim[ri] * (1 + 1e-5))
    dz = zmax_at / 20
    assert np.all(np.abs(z) >= (zj - 1) * dz * (1 - 1e-4) - 1e-6)
    assert np.all(np.abs(z) <= zj * dz * (1 + 1e-4) + 1e-6)


def _march(grid, x, y, z, u, v, w, max_steps=500):
    """March rays until exit; return total in-grid path length and step count."""
    ri, zj = cyl.index_cell(grid, x, y, z)
    total = jnp.zeros_like(x)
    alive = ~cyl.has_exited(grid, ri, zj, z)
    steps = jnp.zeros_like(ri)

    def body(state):
        x, y, z, ri, zj, total, alive, steps = state
        x1, y1, z1, ri1, zj1, l = cyl.cross_cell(grid, x, y, z, u, v, w, ri, zj)
        inside = cyl.is_inside(grid, ri, zj)
        total = jnp.where(alive & inside, total + l, total)
        x = jnp.where(alive, x1, x)
        y = jnp.where(alive, y1, y)
        z = jnp.where(alive, z1, z)
        ri = jnp.where(alive, ri1, ri)
        zj = jnp.where(alive, zj1, zj)
        steps = jnp.where(alive, steps + 1, steps)
        alive = alive & ~cyl.has_exited(grid, ri, zj, z)
        return x, y, z, ri, zj, total, alive, steps

    def cond(state):
        return jnp.any(state[6]) & jnp.all(state[7] < max_steps)

    state = (x, y, z, ri, zj, total, alive, steps)
    state = jax.lax.while_loop(cond, body, state)
    return state[5], state[7], state[6]


def test_march_terminates_and_chords(grid):
    """Rays through the disk must exit, and radial midplane chords must match
    the analytic chord length."""
    n = 512
    rng = np.random.default_rng(1)
    # random oblique rays from outside, aimed at the grid centre region
    theta = rng.uniform(0, np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    u = np.sin(theta) * np.cos(phi)
    v = np.sin(theta) * np.sin(phi)
    w = np.cos(theta)
    # start points inside the disk
    r0 = np.exp(rng.uniform(np.log(1.05), np.log(250.0), n))
    ph0 = rng.uniform(0, 2 * np.pi, n)
    x = (r0 * np.cos(ph0)).astype(np.float32)
    y = (r0 * np.sin(ph0)).astype(np.float32)
    zmax_at = np.asarray(grid.zmax)[
        np.searchsorted(np.asarray(grid.r_lim), r0) - 1]
    z = (rng.uniform(-0.9, 0.9, n) * zmax_at).astype(np.float32)

    total, steps, alive = _march(
        grid, jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
        jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32),
        jnp.asarray(w, jnp.float32))
    assert not np.any(np.asarray(alive)), "some rays did not terminate"
    assert np.all(np.asarray(total) > 0)


def test_radial_chord_length(grid):
    """A ray along +x in the midplane from the centre: in-grid path must be
    Rmax - Rmin to float accuracy."""
    x = jnp.asarray([0.001, -5.0], jnp.float32)
    y = jnp.asarray([0.0, 0.0], jnp.float32)
    z = jnp.asarray([1e-4, 1e-4], jnp.float32)
    u = jnp.asarray([1.0, 1.0], jnp.float32)
    v = jnp.zeros(2, jnp.float32)
    w = jnp.zeros(2, jnp.float32)
    total, steps, alive = _march(grid, x, y, z, u, v, w)
    total = np.asarray(total)
    # ray 1: starts in cavity -> chord = Rmax - Rmin
    assert np.isclose(total[0], 299.0, rtol=1e-3)
    # ray 2: starts at x=-5 in-grid: path = (5-1) + (1 crossing cavity skipped) + 300-1
    assert np.isclose(total[1], 4.0 + 299.0, rtol=1e-3)


def test_vertical_ray(grid):
    """A vertical ray exits through the top after crossing nz cells."""
    # place at r=50 midplane going straight up
    x = jnp.asarray([50.0], jnp.float32)
    y = jnp.asarray([0.0], jnp.float32)
    z = jnp.asarray([1e-5], jnp.float32)
    u = jnp.zeros(1, jnp.float32)
    v = jnp.zeros(1, jnp.float32)
    w = jnp.ones(1, jnp.float32)
    total, steps, alive = _march(grid, x, y, z, u, v, w)
    assert not np.any(np.asarray(alive))
    ri, _ = cyl.index_cell(grid, x, y, z)
    zmax_here = np.asarray(grid.zmax)[int(ri[0]) - 1]
    assert np.isclose(np.asarray(total)[0], zmax_here, rtol=1e-3)


def test_midplane_bounce(grid):
    """A downward ray crosses the midplane and keeps going into z<0 with the
    |z| cell convention (reference cylindrical_grid.f90:1031-1049)."""
    x = jnp.asarray([50.0], jnp.float32)
    y = jnp.asarray([0.0], jnp.float32)
    ri0, _ = cyl.index_cell(grid, x, y, jnp.asarray([0.1], jnp.float32))
    zmax_here = float(np.asarray(grid.zmax)[int(ri0[0]) - 1])
    z = jnp.asarray([0.5 * zmax_here], jnp.float32)
    u = jnp.zeros(1, jnp.float32)
    v = jnp.zeros(1, jnp.float32)
    w = -jnp.ones(1, jnp.float32)
    total, steps, alive = _march(grid, x, y, z, u, v, w)
    assert not np.any(np.asarray(alive))
    # path: from +zmax/2 down through midplane to -zmax => 1.5 zmax
    assert np.isclose(np.asarray(total)[0], 1.5 * zmax_here, rtol=1e-3)
