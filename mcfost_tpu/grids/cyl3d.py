"""3D cylindrical grid (n_az > 1): construction and vectorized traversal.

Extends the 2D cylindrical grid (grids/cylindrical.py) with azimuthal
phi-walls and *signed* vertical cells, following the reference's 3D mode
(src/cylindrical_grid.f90:918-1175; phi-plane intersections at
:1090-1130; 3D cell count n_cells = 2*n_rad*nz*n_az, grid.f90:277-284).

Cell layout
-----------
* ``ri`` in 1..n_rad as in 2D (0 = inner cavity, n_rad+1 = radial exit);
* signed vertical index ``j`` in 1..2*nz, cell j spanning
  ``[(j-1-nz)*dz_i, (j-nz)*dz_i]`` with ``dz_i = zmax(ri)/nz``
  (j = 0 / 2*nz+1 are the virtual below/above layers);
* azimuthal index ``k`` in 1..n_az, cell k spanning
  ``[(k-1)*dphi, k*dphi]`` with uniform ``dphi = 2*pi/n_az``.

To keep the MC kernels' packet state unchanged (they carry an opaque
``(ri, zj)`` int pair through grids.geometry), j and k are *packed* into a
single int ``zj = j + (2*nz+2)*(k-1)``; only this module decodes it.

Traversal mirrors cross_cylindrical_cell's 3D branch as fully masked
arithmetic: radial quadratic + signed z-planes + phi half-planes, nearest
wall wins.  Unlike the reference's tan(phi) bookkeeping the phi walls are
solved directly from sin/cos of the (uniform) wall angles.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.para import Para
from .cylindrical import _grid_eps, _np_dt, radial_vertical_walls


class Cyl3DGrid(NamedTuple):
    r_lim: jax.Array      # (n_rad+1,) radial walls [AU]
    r_lim2: jax.Array     # (n_rad+1,)
    zmax: jax.Array       # (n_rad,) vertical half-extent per ring
    phi_lim: jax.Array    # (n_az+1,) azimuthal walls [rad] — encodes n_az
    volume: jax.Array     # (n_cells,) [AU^3]
    r_grid: jax.Array     # (n_cells,) cell-centre cylindrical radius
    z_grid: jax.Array     # (n_cells,) cell-centre height (signed)
    phi_grid: jax.Array   # (n_cells,) cell-centre azimuth

    @property
    def n_rad(self) -> int:
        return self.r_lim.shape[0] - 1

    @property
    def n_az(self) -> int:
        return self.phi_lim.shape[0] - 1

    @property
    def nz(self) -> int:
        # cells per vertical *half*; total z cells = 2*nz
        return self.volume.shape[0] // (2 * self.n_rad * self.n_az)

    @property
    def n_cells(self) -> int:
        return self.volume.shape[0]

    @property
    def _zstride(self) -> int:
        return 2 * self.nz + 2


def build_cyl3d_grid(para: Para, dtype=jnp.float32) -> Cyl3DGrid:
    """Host-side (float64 numpy) 3D grid construction."""
    n_rad, nz, n_az = para.grid.n_rad, para.grid.nz, para.grid.n_az
    r_lim, zmax = radial_vertical_walls(para)
    r_lim2 = r_lim ** 2
    r_centre = 0.5 * (r_lim[1:] + r_lim[:-1])

    dz = zmax / nz                                   # (n_rad,)
    dphi = 2.0 * np.pi / n_az
    phi_lim = dphi * np.arange(n_az + 1)

    # V(i,j,k) = pi*(r2_{i+1}-r2_i)*dz_i / n_az per signed z cell
    # (cylindrical_grid.f90:479-491 3D branch)
    v_ring = np.pi * (r_lim2[1:] - r_lim2[:-1]) * dz / n_az    # (n_rad,)
    # flat ordering: icell = (ri-1) + n_rad*(j-1) + n_rad*2nz*(k-1)
    volume = np.broadcast_to(v_ring[None, None, :],
                             (n_az, 2 * nz, n_rad)).reshape(-1)
    r_grid = np.broadcast_to(r_centre[None, None, :],
                             (n_az, 2 * nz, n_rad)).reshape(-1)
    jj = np.arange(1, 2 * nz + 1)
    z_grid = np.broadcast_to(((jj - 0.5 - nz)[None, :, None] * dz[None, None, :]),
                             (n_az, 2 * nz, n_rad)).reshape(-1)
    phi_grid = np.broadcast_to(
        ((np.arange(n_az) + 0.5) * dphi)[:, None, None],
        (n_az, 2 * nz, n_rad)).reshape(-1)

    grid = Cyl3DGrid(
        r_lim=jnp.asarray(np.asarray(r_lim, _np_dt(dtype))),
        r_lim2=jnp.asarray(np.asarray(r_lim2, _np_dt(dtype))),
        zmax=jnp.asarray(np.asarray(zmax, _np_dt(dtype))),
        phi_lim=jnp.asarray(np.asarray(phi_lim, _np_dt(dtype))),
        volume=jnp.asarray(np.asarray(volume, _np_dt(dtype))),
        r_grid=jnp.asarray(np.asarray(r_grid, _np_dt(dtype))),
        z_grid=jnp.asarray(np.asarray(z_grid, _np_dt(dtype))),
        phi_grid=jnp.asarray(np.asarray(phi_grid, _np_dt(dtype))),
    )
    from . import geometry as _geom
    _geom.register_host(grid, dict(
        r_grid=r_grid.astype(np.float64), z_grid=z_grid.astype(np.float64),
        phi_grid=phi_grid.astype(np.float64),
        volume=volume.astype(np.float64),
        r_lim=r_lim.astype(np.float64), zmax=zmax.astype(np.float64)))
    return grid


# --------------------------------------------------------------------------
# Index packing
# --------------------------------------------------------------------------

def decode(grid: Cyl3DGrid, zj):
    """Packed zj -> (j, k)."""
    s = grid._zstride
    return zj % s, zj // s + 1


def encode(grid: Cyl3DGrid, j, k):
    return j + grid._zstride * (k - 1)


def flat_index(grid: Cyl3DGrid, ri, zj):
    j, k = decode(grid, zj)
    return ((ri - 1) + grid.n_rad * (j - 1)
            + grid.n_rad * (2 * grid.nz) * (k - 1))


def is_inside(grid: Cyl3DGrid, ri, zj):
    j, k = decode(grid, zj)
    return ((ri >= 1) & (ri <= grid.n_rad)
            & (j >= 1) & (j <= 2 * grid.nz))


def has_exited(grid: Cyl3DGrid, ri, zj, z):
    j, _ = decode(grid, zj)
    zmaxmax = jnp.max(grid.zmax)
    return ((ri > grid.n_rad)
            | (((j <= 0) | (j >= 2 * grid.nz + 1))
               & (jnp.abs(z) > zmaxmax)))


def _phi_index(grid: Cyl3DGrid, x, y):
    dphi = 2.0 * jnp.pi / grid.n_az
    phi = jnp.arctan2(y, x)
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    return jnp.clip((phi / dphi).astype(jnp.int32) + 1, 1, grid.n_az)


def _z_index(grid: Cyl3DGrid, ri, z):
    """Signed z index in a given ring, clamped to the virtual layers."""
    nz = grid.nz
    zmax_i = grid.zmax[jnp.clip(ri - 1, 0, grid.n_rad - 1)]
    dz = zmax_i / nz
    j = jnp.floor(z / dz).astype(jnp.int32) + nz + 1
    return jnp.clip(j, 0, 2 * nz + 1)


def index_cell(grid: Cyl3DGrid, x, y, z):
    """(ri, packed zj) from position (index_cell_cyl 3D,
    cylindrical_grid.f90:833-890)."""
    r2 = x * x + y * y
    ri = jnp.sum(grid.r_lim2 < r2[..., None], axis=-1).astype(jnp.int32)
    inside_r = (ri >= 1) & (ri <= grid.n_rad)
    j = _z_index(grid, jnp.where(inside_r, ri, 1), z)
    k = _phi_index(grid, x, y)
    return ri, encode(grid, jnp.where(inside_r, j, 1),
                      jnp.where(inside_r, k, 1))


def cross_cell(grid: Cyl3DGrid, x, y, z, u, v, w, ri, zj):
    """One wall crossing for a packet batch; 3D (r, z, phi) walls.

    Pure masked arithmetic mirror of cross_cylindrical_cell's 3D case
    (cylindrical_grid.f90:918-1175; phi planes :1090-1130)."""
    dtype = x.dtype
    eps = _grid_eps(dtype)
    cm, cp = 1.0 - eps, 1.0 + eps
    big = jnp.asarray(1.0e30, dtype)
    n_rad, nz, n_az = grid.n_rad, grid.nz, grid.n_az
    j, k = decode(grid, zj)

    a = u * u + v * v
    inv_a = jnp.where(a > 1e-30, 1.0 / jnp.maximum(a, 1e-30), big)
    r2 = x * x + y * y
    b = (x * u + y * v) * inv_a
    in_cavity = ri == 0

    # ---- radial wall (same math as the 2D grid)
    ric = jnp.clip(ri, 0, n_rad + 1)
    r_out2 = grid.r_lim2[jnp.clip(ric, 0, n_rad)]
    r_in2 = grid.r_lim2[jnp.clip(ric - 1, 0, n_rad)]
    moving_in = (u * x + v * y) < 0.0
    c_in = (r2 - r_in2 * cm) * inv_a
    delta_in = b * b - c_in
    hits_inner = moving_in & (delta_in >= 0.0) & (ri > 0)
    c_out = (r2 - r_out2 * cp) * inv_a
    delta = jnp.where(hits_inner, delta_in,
                      jnp.maximum(b * b - c_out, 0.0))
    delta_rad = jnp.where(hits_inner, -1, 1)
    rac = jnp.sqrt(jnp.maximum(delta, 0.0))
    c_cav = (r2 - grid.r_lim2[0]) * inv_a
    rac_cav = jnp.sqrt(jnp.maximum(b * b - c_cav, 0.0))
    s_cav = (-b + rac_cav) * cp
    s = (-b - rac) * cp
    s = jnp.where(s < 0.0, (-b + rac) * cp, s)
    s = jnp.maximum(s, 0.0)
    s = jnp.where(in_cavity, s_cav, s)
    s = jnp.where(a > 1e-30, s, big)

    # ---- signed vertical walls (no midplane mirror in 3D)
    zmax_c = grid.zmax[jnp.clip(ric - 1, 0, n_rad - 1)]
    dz_i = zmax_c / nz
    z_hi = jnp.where(j >= 2 * nz + 1, big,
                     (j - nz).astype(dtype) * dz_i)
    z_lo = jnp.where(j <= 0, -big, (j - 1 - nz).astype(dtype) * dz_i)
    up = w > 0.0
    zw = jnp.where(up, z_hi, z_lo)
    w_safe = jnp.where(jnp.abs(w) > 1e-30, w, 1e-30)
    t = (zw - z) / w_safe
    t = jnp.where((w == 0.0) | in_cavity, big, t)
    t = jnp.maximum(t, 0.0) * cp
    delta_j = jnp.where(up, 1, -1)

    # ---- phi walls: half-plane x*sin(pw) - y*cos(pw) = 0
    dphi = 2.0 * jnp.pi / n_az
    cross_z = x * v - y * u            # sign of d(phi)/ds
    kw = jnp.where(cross_z > 0.0, k, k - 1).astype(dtype) * dphi
    sw, cw = jnp.sin(kw), jnp.cos(kw)
    den = u * sw - v * cw
    den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
    p = (y * cw - x * sw) / den_safe
    p = jnp.where((jnp.abs(den) <= 1e-30) | (a <= 1e-30) | in_cavity
                  | (jnp.abs(cross_z) <= 0.0), big, p)
    p = jnp.where(p < 0.0, big, p * cp)
    delta_k = jnp.where(cross_z > 0.0, 1, -1)

    # ---- nearest wall wins; overshoot by (1+eps) pushes the position
    # strictly past the chosen wall (the reference's 1+-eps guards,
    # cylindrical_grid.f90:938-939)
    length = jnp.minimum(jnp.minimum(s, t), p)
    take_r = s <= length
    take_p = (p <= length) & ~take_r

    x1 = x + length * u
    y1 = y + length * v
    z1 = z + length * w

    # radial crossing: re-bin the signed z index (z walls change per ring);
    # cavity entry additionally re-bins phi (the packet orbits freely there)
    ri1_r = ri + delta_rad
    j_rebin = _z_index(grid, jnp.clip(ri1_r, 1, n_rad), z1)
    j1_r = jnp.where(ri1_r > n_rad, j, j_rebin)
    k_rebin = _phi_index(grid, x1, y1)
    k1_r = jnp.where(in_cavity, k_rebin, k)
    j1_r = jnp.where(ri1_r == 0, 1, j1_r)
    k1_r = jnp.where(ri1_r == 0, 1, k1_r)

    ri1 = jnp.where(take_r, ri1_r, ri)
    j1 = jnp.where(take_r, j1_r,
                   jnp.where(take_p, j,
                             jnp.clip(j + delta_j, 0, 2 * nz + 1)))
    k1 = jnp.where(take_r, k1_r,
                   jnp.where(take_p,
                             ((k - 1 + delta_k) % n_az) + 1, k))

    z1 = jnp.where(z1 == 0.0, jnp.asarray(np.asarray(eps, _np_dt(dtype))),
                   z1)
    zj1 = encode(grid, j1.astype(jnp.int32), k1.astype(jnp.int32))
    return (x1, y1, z1, ri1.astype(jnp.int32), zj1.astype(jnp.int32),
            length)


def pos_in_cell(grid: Cyl3DGrid, ri, zj, rand1, rand2, rand3):
    """Uniform random position inside cell (ri, j, k)
    (pos_em_cell_cyl 3D, cylindrical_grid.f90:1415-1466)."""
    dtype = rand1.dtype
    n_rad, nz, n_az = grid.n_rad, grid.nz, grid.n_az
    j, k = decode(grid, zj)
    r2a = grid.r_lim2[jnp.clip(ri - 1, 0, n_rad)]
    r2b = grid.r_lim2[jnp.clip(ri, 0, n_rad)]
    r = jnp.sqrt(r2a + rand1 * (r2b - r2a))
    dz_i = grid.zmax[jnp.clip(ri - 1, 0, n_rad - 1)] / nz
    zpos = ((j - 1 - nz).astype(dtype) + rand2) * dz_i
    dphi = 2.0 * jnp.pi / n_az
    phi = ((k - 1).astype(dtype) + rand3) * dphi
    return r * jnp.cos(phi), r * jnp.sin(phi), zpos


def distance_to_closest_wall(grid: Cyl3DGrid, ri, zj, x, y, z):
    """Min distance to the cell's six walls (MRW sphere radius)."""
    dtype = x.dtype
    n_rad, nz, n_az = grid.n_rad, grid.nz, grid.n_az
    j, k = decode(grid, zj)
    ric = jnp.clip(ri, 1, n_rad)
    jc = jnp.clip(j, 1, 2 * nz)
    r = jnp.sqrt(x * x + y * y)
    s1 = grid.r_lim[jnp.clip(ric, 1, n_rad)] - r
    s2 = r - grid.r_lim[ric - 1]
    dz = grid.zmax[ric - 1] / nz
    s3 = (jc - nz).astype(dtype) * dz - z
    s4 = z - (jc - 1 - nz).astype(dtype) * dz
    dphi = 2.0 * jnp.pi / n_az
    p_lo = (k - 1).astype(dtype) * dphi
    p_hi = k.astype(dtype) * dphi
    s5 = jnp.abs(x * jnp.sin(p_lo) - y * jnp.cos(p_lo))
    s6 = jnp.abs(x * jnp.sin(p_hi) - y * jnp.cos(p_hi))
    m = jnp.minimum
    return jnp.maximum(m(m(m(s1, s2), m(s3, s4)), m(s5, s6)), 0.0)
