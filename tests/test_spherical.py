"""Spherical grid traversal + end-to-end physics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcfost_tpu.config.para import Para
from mcfost_tpu.grids import spherical as sph
from mcfost_tpu.mc.model import build_model
from mcfost_tpu.mc.thermal_mc import run_thermal_mc, final_temperature
from mcfost_tpu import constants as cst


@pytest.fixture(scope="module")
def grid():
    para = Para()
    para.grid.geometry = 2
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 24, 12, 3
    return sph.build_spherical_grid(para, dtype=jnp.float32)


def _march(grid, x, y, z, u, v, w, max_steps=600):
    ri, tj = sph.index_cell(grid, x, y, z)
    total = jnp.zeros_like(x)
    alive = ~sph.has_exited(grid, ri, tj, z)

    def body(state):
        x, y, z, ri, tj, total, alive, steps = state
        x1, y1, z1, ri1, tj1, l = sph.cross_cell(grid, x, y, z, u, v, w,
                                                 ri, tj)
        inside = sph.is_inside(grid, ri, tj)
        total = jnp.where(alive & inside, total + l, total)
        x = jnp.where(alive, x1, x)
        y = jnp.where(alive, y1, y)
        z = jnp.where(alive, z1, z)
        ri = jnp.where(alive, ri1, ri)
        tj = jnp.where(alive, tj1, tj)
        steps = steps + 1
        alive = alive & ~sph.has_exited(grid, ri, tj, z)
        return x, y, z, ri, tj, total, alive, steps

    def cond(state):
        return jnp.any(state[6]) & (state[7] < max_steps)

    state = (x, y, z, ri, tj, total, alive,
             jnp.zeros((), jnp.int32))
    state = jax.lax.while_loop(cond, body, state)
    return state[5], state[6]


def test_radial_chord(grid):
    # radial ray from centre: in-grid path = Rmax - Rmin
    x = jnp.asarray([0.001], jnp.float32)
    y = jnp.asarray([0.0], jnp.float32)
    z = jnp.asarray([1e-4], jnp.float32)
    total, alive = _march(grid, x, y, z,
                          jnp.ones(1, jnp.float32), jnp.zeros(1, jnp.float32),
                          jnp.zeros(1, jnp.float32))
    assert not bool(alive[0])
    assert np.isclose(float(total[0]), 299.0, rtol=1e-3)


def test_vertical_chord(grid):
    # vertical ray through the pole: path = Rmax - Rmin (through cavity:
    # 2*(Rmax-Rmin) when starting below)
    x = jnp.asarray([0.0], jnp.float32)
    y = jnp.asarray([1e-4], jnp.float32)
    z = jnp.asarray([0.01], jnp.float32)
    total, alive = _march(grid, x, y, z,
                          jnp.zeros(1, jnp.float32), jnp.zeros(1, jnp.float32),
                          jnp.ones(1, jnp.float32))
    assert not bool(alive[0])
    assert np.isclose(float(total[0]), 299.0, rtol=2e-3)


def test_random_rays_terminate_and_chords(grid):
    rng = np.random.default_rng(7)
    n = 512
    th = rng.uniform(0, np.pi, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    u = (np.sin(th) * np.cos(ph)).astype(np.float32)
    v = (np.sin(th) * np.sin(ph)).astype(np.float32)
    w = np.cos(th).astype(np.float32)
    r0 = np.exp(rng.uniform(np.log(1.5), np.log(250.0), n))
    mu = rng.uniform(-0.95, 0.95, n)
    x = (r0 * np.sqrt(1 - mu ** 2)).astype(np.float32)
    y = np.zeros(n, np.float32)
    z = (r0 * mu).astype(np.float32)
    total, alive = _march(grid, jnp.asarray(x), jnp.asarray(y),
                          jnp.asarray(z), jnp.asarray(u), jnp.asarray(v),
                          jnp.asarray(w))
    assert not np.any(np.asarray(alive))
    # each in-grid chord <= geometric maximum 2*Rmax and > 0
    tt = np.asarray(total)
    assert np.all(tt > 0)
    assert np.all(tt <= 600.0 * 1.001)


def test_spherical_thin_temperature():
    """Optically thin equilibrium on the spherical grid (same physics test
    as the cylindrical case)."""
    para = Para()
    para.grid.geometry = 2
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 16, 8, 2
    para.wavelengths.n_lambda = 20
    para.zones[0].dust_mass = 1e-9
    for sp_ in para.dust[0]:
        sp_.n_grains = 10
        sp_.amax = 10.0
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    res = run_thermal_mc(model, jax.random.PRNGKey(3), 40000, batch=8192,
                         max_iters=20000)
    assert int(res.n_lost) == 0
    assert np.isclose(float(res.sed[..., 0].sum()), float(res.emitted),
                      rtol=2e-3)
    T_mc = np.asarray(final_temperature(model, res.xkj, int(res.emitted)))

    wl = host.wl
    kabs = np.asarray(model.kappa_abs, np.float64)[0]
    d2 = (np.asarray(model.grid.r_grid) ** 2
          + np.asarray(model.grid.z_grid) ** 2)
    qheat = (2 * np.pi * cst.hp * cst.c_light ** 2
             * np.sum(host.stars.E_stars * wl.dlam * 1e-6 * kabs)
             / (4 * np.pi * d2))
    log_qcool = np.asarray(model.log_qcool, np.float64)[0]
    tab_t = np.asarray(model.tab_temp, np.float64)
    ti = np.clip(np.searchsorted(log_qcool, np.log(qheat)), 1,
                 len(tab_t) - 1)
    frac = np.clip((np.log(qheat) - log_qcool[ti - 1])
                   / (log_qcool[ti] - log_qcool[ti - 1]), 0, 1)
    T_ana = np.exp(np.log(tab_t[ti]) * frac
                   + np.log(tab_t[ti - 1]) * (1 - frac))
    rel = np.abs(T_mc - T_ana) / T_ana
    assert np.median(rel) < 0.03, np.median(rel)
