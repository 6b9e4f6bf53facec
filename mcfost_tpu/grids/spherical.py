"""Spherical grid: construction and vectorized ray traversal.

Mirrors the reference's spherical grid contract (src/spherical_grid.f90):

* log-spaced radial shells sharing the cylindrical builder's radial walls
  (define_cylindrical_grid handles both, cylindrical_grid.f90:496-582);
* latitude cells uniform in w = sin(theta from midplane)
  (cylindrical_grid.f90:530-539), walls are cones |z| = tan_theta * r_cyl;
* 2D cells indexed (ri, tj) with tj keyed on |z| (midplane mirror);
* traversal solves sphere and cone intersections analytically
  (cross_spherical_cell, spherical_grid.f90:182-446), fully branch-free
  over a packet batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _np_dt(dtype):
    # numpy-side cast avoids one XLA convert_element_type
    # compilation per distinct array shape (slow over tunnels)
    return np.dtype(dtype.dtype if hasattr(dtype, 'dtype') else dtype)

from ..config.para import Para


class SphGrid(NamedTuple):
    r_lim: jax.Array          # (n_rad+1,) spherical shell walls [AU]
    r_lim2: jax.Array
    tan_theta_lim: jax.Array  # (nz+1,) tan of latitude walls (0..~inf)
    w_lim: jax.Array          # (nz+1,) sin(theta) walls
    volume: jax.Array         # (n_cells,)
    r_grid: jax.Array         # (n_cells,) cylindrical radius of centre
    z_grid: jax.Array         # (n_cells,) height of centre (>0)

    @property
    def n_rad(self) -> int:
        return self.r_lim.shape[0] - 1

    @property
    def nz(self) -> int:
        return self.tan_theta_lim.shape[0] - 1

    @property
    def n_cells(self) -> int:
        return self.volume.shape[0]


def build_spherical_grid(para: Para, dtype=jnp.float32) -> SphGrid:
    from .cylindrical import build_cylindrical_grid
    n_rad, nz = para.grid.n_rad, para.grid.nz
    # radial walls: same recursion as the cylindrical builder
    cylg = build_cylindrical_grid(para, dtype=jnp.float64)
    r_lim = np.asarray(cylg.r_lim, np.float64)
    r_lim2 = r_lim ** 2
    r_lim3 = r_lim ** 3

    # uniform-in-sine latitude walls (cylindrical_grid.f90:530-539)
    w_lim = np.arange(nz + 1) / nz
    with np.errstate(divide="ignore"):
        tan_theta_lim = w_lim / np.sqrt(np.maximum(1.0 - w_lim ** 2, 0.0))
    tan_theta_lim[0] = 1.0e-10
    tan_theta_lim[-1] = 1.0e30

    # volumes: V = 4/3 pi (r3_{i+1}-r3_i) * dcos_theta (f90:561-580);
    # dcos = 1/nz, and both z signs are mirrored into one cell
    rsph = np.sqrt(r_lim[1:] * r_lim[:-1])
    Vi = 4.0 / 3.0 * np.pi * (r_lim3[1:] - r_lim3[:-1])
    volume = np.broadcast_to((Vi / nz)[None, :], (nz, n_rad)).copy()

    wc = 0.5 * (w_lim[1:] + w_lim[:-1])
    uv = np.sqrt(1.0 - wc ** 2)
    r_grid = rsph[None, :] * uv[:, None]
    z_grid = rsph[None, :] * wc[:, None]

    grid = SphGrid(
        r_lim=jnp.asarray(np.asarray(r_lim, _np_dt(dtype))),
        r_lim2=jnp.asarray(np.asarray(r_lim2, _np_dt(dtype))),
        tan_theta_lim=jnp.asarray(np.asarray(tan_theta_lim, _np_dt(dtype))),
        w_lim=jnp.asarray(np.asarray(w_lim, _np_dt(dtype))),
        volume=jnp.asarray(np.asarray(volume.reshape(-1), _np_dt(dtype))),
        r_grid=jnp.asarray(np.asarray(r_grid.reshape(-1), _np_dt(dtype))),
        z_grid=jnp.asarray(np.asarray(z_grid.reshape(-1), _np_dt(dtype))),
    )
    from . import geometry as _geom
    _geom.register_host(grid, dict(
        r_grid=r_grid.reshape(-1).astype(np.float64),
        z_grid=z_grid.reshape(-1).astype(np.float64),
        volume=volume.reshape(-1).astype(np.float64),
        r_lim=r_lim.astype(np.float64)))
    return grid


def _eps(dtype):
    return 1.0e-14 if dtype == jnp.float64 else 3.0e-6


def flat_index(grid: SphGrid, ri, tj):
    return (tj - 1) * grid.n_rad + (ri - 1)


def is_inside(grid: SphGrid, ri, tj):
    return (ri >= 1) & (ri <= grid.n_rad) & (tj >= 1) & (tj <= grid.nz)


def index_cell(grid: SphGrid, x, y, z):
    """(ri, tj) from position (index_cell_sph, spherical_grid.f90:48)."""
    n_rad, nz = grid.n_rad, grid.nz
    r2 = x * x + y * y + z * z
    ri = jnp.searchsorted(grid.r_lim2, r2, side="left").astype(jnp.int32)
    w = jnp.abs(z) / jnp.sqrt(jnp.maximum(r2, 1e-30))
    tj = jnp.clip(jnp.searchsorted(grid.w_lim, w, side="left"),
                  1, nz).astype(jnp.int32)
    inside_r = (ri >= 1) & (ri <= n_rad)
    tj = jnp.where(inside_r, tj, 1)
    return ri, tj


def has_exited(grid: SphGrid, ri, tj, z):
    return ri > grid.n_rad


def _cone_crossing(x, y, z, u, v, w, tan_lim, big, prec=1e-15):
    """Smallest positive intersection with the cone |z| = tan_lim * r_cyl
    (signed tan_lim selects the hemisphere; spherical_grid.f90:272-330)."""
    tan2 = tan_lim * tan_lim
    a = w * w - tan2 * (u * u + v * v)
    a_safe = jnp.where(jnp.abs(a) > 1e-30, a, 1e-30)
    b = w * z - tan2 * (x * u + y * v)
    c = z * z - tan2 * (x * x + y * y)
    delta = b * b - a * c
    rac = jnp.sqrt(jnp.maximum(delta, 0.0))
    t_1 = (-b - rac) / a_safe
    t_2 = (-b + rac) / a_safe
    lo = jnp.minimum(t_1, t_2)
    hi = jnp.maximum(t_1, t_2)
    t = jnp.where(lo > prec, lo, jnp.where(hi > prec, hi, big))
    return jnp.where(delta < 0.0, big, t)


def cross_cell(grid: SphGrid, x, y, z, u, v, w, ri, tj):
    """One cell-wall crossing (cross_spherical_cell,
    spherical_grid.f90:182-446), 2D |z| convention, vectorized."""
    dtype = x.dtype
    eps = _eps(dtype)
    cm, cp = 1.0 - eps, 1.0 + eps
    big = jnp.asarray(1.0e30, dtype)
    n_rad, nz = grid.n_rad, grid.nz

    r2 = x * x + y * y + z * z
    b = x * u + y * v + z * w

    in_cavity = ri == 0

    # radial sphere crossings
    r_out2 = grid.r_lim2[jnp.clip(ri, 0, n_rad)]
    r_in2 = grid.r_lim2[jnp.clip(ri - 1, 0, n_rad)]
    moving_in = b < 0.0
    c_in = r2 - r_in2 * cm
    delta_in = b * b - c_in
    hits_inner = moving_in & (delta_in >= 0.0) & (ri > 0)
    c_out = r2 - r_out2 * cp
    delta_out = jnp.maximum(b * b - c_out, 0.0)
    delta = jnp.where(hits_inner, delta_in, delta_out)
    delta_rad = jnp.where(hits_inner, -1, 1)
    rac = jnp.sqrt(jnp.maximum(delta, 0.0))
    s = -b - rac
    s = jnp.where(s < 0.0, -b + rac, s)
    s = jnp.maximum(s, 0.0)
    # cavity: through r_lim(0)
    c_cav = r2 - grid.r_lim2[0] * cp
    rac_cav = jnp.sqrt(jnp.maximum(b * b - c_cav, 0.0))
    s = jnp.where(in_cavity, (-b + rac_cav) * cp, s)

    # latitude cone crossings (|z| convention: sign of tan follows z)
    tjc = jnp.clip(tj, 1, nz)
    sign_z = jnp.sign(z)
    tan1 = sign_z * grid.tan_theta_lim[tjc] * cp          # upper cone
    tan2_ = sign_z * grid.tan_theta_lim[tjc - 1] * cm     # lower cone
    t1 = _cone_crossing(x, y, z, u, v, w, tan1, big)
    t2 = _cone_crossing(x, y, z, u, v, w, tan2_, big)
    take1 = t1 < t2
    t = jnp.where(take1, t1, t2)
    delta_theta = jnp.where(take1,
                            jnp.where(tjc == nz, 0, 1),
                            jnp.where(tjc == 1, 0, -1))
    t = jnp.where(in_cavity, big, t)

    take_r = s < t
    length = jnp.where(take_r, s, t)

    x1 = x + length * u
    y1 = y + length * v
    z1 = z + length * w

    ri1 = jnp.where(take_r, ri + delta_rad, ri)
    tj1 = jnp.where(take_r, tj, tj + delta_theta)
    # entering from the cavity: recompute the theta index
    w_new = jnp.abs(z1) * jax.lax.rsqrt(
        jnp.maximum(x1 * x1 + y1 * y1 + z1 * z1, 1e-30))
    tj_entry = jnp.clip(jnp.searchsorted(grid.w_lim, w_new, side="left"),
                        1, nz).astype(jnp.int32)
    ri0_was_cavity = ri == 0
    tj1 = jnp.where(take_r & ri0_was_cavity, tj_entry, tj1)
    tj1 = jnp.where(take_r & (ri1 == 0), 1, tj1)

    z1 = jnp.where(z1 == 0.0, jnp.asarray(np.asarray(eps, _np_dt(dtype))), z1)
    return x1, y1, z1, ri1.astype(jnp.int32), tj1.astype(jnp.int32), length


def pos_in_cell(grid: SphGrid, ri, tj, rand1, rand2, rand3):
    """Uniform random position inside cell (ri, tj)
    (pos_em_cell_sph semantics)."""
    dtype = rand1.dtype
    n_rad, nz = grid.n_rad, grid.nz
    r3a = grid.r_lim[jnp.clip(ri - 1, 0, n_rad)] ** 3
    r3b = grid.r_lim[jnp.clip(ri, 0, n_rad)] ** 3
    r = (r3a + rand1 * (r3b - r3a)) ** (1.0 / 3.0)
    wa = grid.w_lim[jnp.clip(tj - 1, 0, nz)]
    wb = grid.w_lim[jnp.clip(tj, 0, nz)]
    frac = jnp.where(rand2 > 0.5, 2.0 * (rand2 - 0.5), 2.0 * rand2)
    wv = wa + frac * (wb - wa)
    zsign = jnp.where(rand2 > 0.5, 1.0, -1.0)
    uv = jnp.sqrt(jnp.maximum(1.0 - wv * wv, 0.0))
    phi = 2.0 * jnp.pi * rand3
    return (r * uv * jnp.cos(phi), r * uv * jnp.sin(phi), zsign * r * wv)


def distance_to_closest_wall(grid: SphGrid, ri, tj, x, y, z):
    """Distance to nearest wall (distance_to_closest_wall_sph,
    spherical_grid.f90:451-...): shells exactly; cones approximately via
    the angular distance times the spherical radius."""
    dtype = x.dtype
    n_rad, nz = grid.n_rad, grid.nz
    ric = jnp.clip(ri, 1, n_rad)
    tjc = jnp.clip(tj, 1, nz)
    r = jnp.sqrt(x * x + y * y + z * z)
    s1 = grid.r_lim[ric] - r
    s2 = r - grid.r_lim[ric - 1]
    w = jnp.abs(z) / jnp.maximum(r, 1e-30)
    s3 = (grid.w_lim[tjc] - w) * r
    s4 = (w - grid.w_lim[tjc - 1]) * r
    return jnp.maximum(jnp.minimum(jnp.minimum(s1, s2),
                                   jnp.minimum(s3, s4)), 0.0)
