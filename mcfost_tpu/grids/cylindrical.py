"""Cylindrical grid: construction and vectorized ray traversal.

Grid semantics follow the reference (src/cylindrical_grid.f90):

* log-spaced radial walls with power-law subdivision of the innermost cell
  (``define_cylindrical_grid``, cylindrical_grid.f90:183-676);
* per-ring vertical extent ``zmax(i) = cutoff * H(r_i)`` with ``nz`` uniform
  z-cells per ring (cylindrical_grid.f90:458-465) — note the z-walls are
  *different in every ring*, so crossing a radial wall re-bins the vertical
  index;
* 2D cells indexed by ``(ri, zj)`` with ``zj`` keyed on ``|z|`` (midplane
  mirror symmetry) and the "midplane bounce" crossing of the reference
  (cylindrical_grid.f90:1031-1049);
* virtual cells: ``ri = 0`` inner cavity, ``ri = n_rad+1`` radial exit,
  ``zj = nz+1`` empty layer above the disk (exit only once ``|z| > zmaxmax``,
  cylindrical_grid.f90:680-704).

The traversal (`cross_cell`) is a pure, branch-free function of packet
position/direction and cell indices, vectorized over a packet batch — the
TPU-native replacement for the reference's scalar ``cross_cylindrical_cell``
(cylindrical_grid.f90:918-1175). Instead of translating its control flow, all
wall candidates are computed unconditionally and combined with masks.
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


class CylGrid(NamedTuple):
    """Device-resident grid geometry (all jnp arrays; shapes encode sizes)."""
    r_lim: jax.Array      # (n_rad+1,) radial walls, [AU]
    r_lim2: jax.Array     # (n_rad+1,) squared walls
    zmax: jax.Array       # (n_rad,) vertical extent per ring
    volume: jax.Array     # (n_cells,) cell volumes [AU^3]
    r_grid: jax.Array     # (n_cells,) cell-centre cylindrical radius
    z_grid: jax.Array     # (n_cells,) cell-centre height (>0)

    @property
    def n_rad(self) -> int:
        return self.r_lim.shape[0] - 1

    @property
    def nz(self) -> int:
        return self.volume.shape[0] // self.n_rad

    @property
    def n_cells(self) -> int:
        return self.volume.shape[0]


def radial_vertical_walls(para: Para):
    """Host-side (float64) radial walls + per-ring vertical extent shared
    by the 2D and 3D cylindrical grid builders
    (define_cylindrical_grid, cylindrical_grid.f90:183-495)."""
    n_rad = para.grid.n_rad
    # the inner subdivision cannot exceed the radial grid itself (guards
    # CLI overrides like -n_rad 16 with the para default n_rad_in=30)
    n_rad_in = min(max(para.grid.n_rad_in, 1), max(n_rad - 1, 1))
    rmin, rmax = para.rmin, para.rmax

    # --- radial walls: log grid with power-law inner subdivision
    # (cylindrical_grid.f90:306-351)
    tab_r = np.zeros(n_rad + 1)
    tab_r[0] = rmin
    ln_delta_r = np.log(rmax / rmin) / (n_rad - n_rad_in + 1)
    delta_r = np.exp(ln_delta_r)

    # steepest zone slope: p = 1 + surf - beta (cylindrical_grid.f90:315-324)
    puiss = 0.0
    for z in para.zones:
        p = 1.0 + z.surface_density_exp - z.flaring_exp
        puiss = max(puiss, p)

    if puiss == 0.0:
        for i in range(1, n_rad_in + 1):
            tab_r[i] = np.exp(
                np.log(rmin) - (np.log(rmin) - np.log(rmin * delta_r))
                * (2.0 ** i - 1.0) / (2.0 ** n_rad_in - 1.0))
    else:
        for i in range(1, n_rad_in + 1):
            tab_r[i] = (rmin ** puiss - (rmin ** puiss - (rmin * delta_r) ** puiss)
                        * (2.0 ** (i + 1) - 1.0)
                        / (2.0 ** (n_rad_in + 1) - 1.0)) ** (1.0 / puiss)

    for i in range(n_rad_in + 1, n_rad + 1):
        tab_r[i] = tab_r[i - 1] * delta_r

    r_lim = tab_r
    r_lim2 = r_lim ** 2

    # --- vertical extent per ring: zmax = cutoff * max-zone H(r)
    # (cylindrical_grid.f90:416-455)
    r_centre = 0.5 * (r_lim[1:] + r_lim[:-1])
    zmax = np.zeros(n_rad)
    for i in range(n_rad):
        H = 0.0
        for z in para.zones:
            if z.rmin < r_centre[i] < z.rmax:
                h = z.scale_height * (r_centre[i] / z.ref_radius) ** z.flaring_exp
                H = max(H, h)
        zmax[i] = para.cutoff * H
    # interpolate empty rings in log r (cylindrical_grid.f90:433-455)
    if np.any(zmax <= 0):
        good = zmax > 0
        if not np.any(good):
            raise ValueError("no zone covers the radial grid")
        zmax = np.exp(np.interp(np.log(r_centre),
                                np.log(r_centre[good]), np.log(zmax[good])))
    return r_lim, zmax


def build_cylindrical_grid(para: Para, dtype=jnp.float32) -> CylGrid:
    """Host-side (float64 numpy) grid construction.

    Mirrors define_cylindrical_grid (cylindrical_grid.f90:183-495) for a
    single-region model; multiple touching zones share the radial span.
    """
    n_rad, nz = para.grid.n_rad, para.grid.nz
    r_lim, zmax = radial_vertical_walls(para)
    r_lim2 = r_lim ** 2
    r_centre = 0.5 * (r_lim[1:] + r_lim[:-1])

    # --- volumes: V(i,j) = 2*pi*(r_i+1^2 - r_i^2) * dz_i, then *0.5/n_az in 3D
    # 2D (half-disk mirror): factor 2 for z<0 symmetry built in
    # (cylindrical_grid.f90:479-491); mcfost keeps V as the full (z>0 + z<0)
    # volume in 2D: dr2 = 2*pi*(r2_{i+1}-r2_i), V = dr2 * cell_height.
    dz = zmax / nz
    dr2 = 2.0 * np.pi * (r_lim2[1:] - r_lim2[:-1])
    volume = (dr2 * dz)[None, :].repeat(nz, axis=0)              # (nz, n_rad)

    r_grid = np.broadcast_to(r_centre[None, :], (nz, n_rad))
    z_grid = (np.arange(nz)[:, None] + 0.5) * dz[None, :]

    # flatten with reference ordering: icell = i + n_rad*(j-1) → ri fastest
    grid = CylGrid(
        r_lim=jnp.asarray(np.asarray(r_lim, _np_dt(dtype))),
        r_lim2=jnp.asarray(np.asarray(r_lim2, _np_dt(dtype))),
        zmax=jnp.asarray(np.asarray(zmax, _np_dt(dtype))),
        volume=jnp.asarray(np.asarray(volume.reshape(-1), _np_dt(dtype))),
        r_grid=jnp.asarray(np.asarray(r_grid.reshape(-1), _np_dt(dtype))),
        z_grid=jnp.asarray(np.asarray(z_grid.reshape(-1), _np_dt(dtype))),
    )
    # host float64 copies: device->host readback over a tunnelled TPU
    # costs tens of seconds per array, so setup code must never pull the
    # grid back from the device (see host_arrays in grids.geometry)
    from . import geometry as _geom
    _geom.register_host(grid, dict(
        r_grid=r_grid.reshape(-1).astype(np.float64),
        z_grid=z_grid.reshape(-1).astype(np.float64),
        volume=volume.reshape(-1).astype(np.float64),
        r_lim=r_lim.astype(np.float64), zmax=zmax.astype(np.float64)))
    return grid


# --------------------------------------------------------------------------
# Traversal
# --------------------------------------------------------------------------

def _grid_eps(dtype) -> float:
    # relative wall guard: reference uses 1e-14 in float64
    # (cylindrical_grid.f90:16); float32 needs a larger guard.
    return 1.0e-14 if dtype == jnp.float64 else 3.0e-6


def _one_hot_rows(idx, n, dtype):
    """(B, n) one-hot of clipped indices.

    TPU gathers of B random indices serialize (~11ns/lane); for the tiny
    per-ring wall tables (n_rad+2 entries) a dense compare + matmul streams
    at VPU/MXU speed instead — ~10x faster per lookup and it batches every
    wall quantity into ONE matmul."""
    return (idx[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(dtype)


def _wall_table(grid: CylGrid):
    """(n_rad+2, 7) per-ring wall quantities indexed by the *raw* ri
    (0 = cavity, n_rad+1 = outside), pre-shifted so the traversal needs a
    single one-hot matmul: columns are
    [r_out^2, r_in^2, zmax(cell), zmax(ri-1), zmax(ri+1), r_out, r_in].
    Loop-invariant: XLA hoists it out of the MC while_loop."""
    n_rad = grid.n_rad
    i = jnp.arange(n_rad + 2)
    ric = jnp.clip(i, 1, n_rad)
    return jnp.stack([
        grid.r_lim2[jnp.clip(i, 0, n_rad)],
        grid.r_lim2[jnp.clip(i - 1, 0, n_rad)],
        grid.zmax[ric - 1],
        grid.zmax[jnp.clip(i - 2, 0, n_rad - 1)],
        grid.zmax[jnp.clip(i, 0, n_rad - 1)],
        grid.r_lim[jnp.clip(i, 1, n_rad)],
        grid.r_lim[ric - 1],
    ], axis=1)


def flat_index(grid: CylGrid, ri, zj):
    """Flat cell index for tallies; valid only for 1<=ri<=n_rad, 1<=zj<=nz.

    Uses the reference ordering icell = ri + n_rad*(zj-1)
    (cylindrical_grid.f90:91-107), zero-based here.
    """
    return (zj - 1) * grid.n_rad + (ri - 1)


def is_inside(grid: CylGrid, ri, zj):
    return (ri >= 1) & (ri <= grid.n_rad) & (zj >= 1) & (zj <= grid.nz)


def index_cell(grid: CylGrid, x, y, z):
    """Locate (ri, zj) from a position (reference index_cell_cyl,
    cylindrical_grid.f90:833-890). Vectorized."""
    r2 = x * x + y * y
    n_rad, nz = grid.n_rad, grid.nz
    # dense searchsorted (count walls < r2): one (B, n_rad+1) compare
    # instead of a serialized per-lane binary search
    ri = jnp.sum(grid.r_lim2 < r2[..., None], axis=-1).astype(jnp.int32)
    # count gives: r2 <= r_lim2[0] -> 0 (cavity); r2 > r_lim2[n_rad] -> n_rad+1
    inside_r = (ri >= 1) & (ri <= n_rad)
    zmax_i = _one_hot_rows(jnp.clip(ri - 1, 0, n_rad - 1), n_rad,
                           x.dtype) @ grid.zmax
    zj = jnp.floor(jnp.abs(z) / zmax_i * nz).astype(jnp.int32) + 1
    zj = jnp.minimum(zj, nz + 1)
    zj = jnp.where(inside_r, zj, 1)
    return ri, zj


def cross_cell(grid: CylGrid, x, y, z, u, v, w, ri, zj):
    """One cell-wall crossing for a batch of packets.

    Pure function; all inputs (x..w: float arrays, ri/zj: int32 arrays) share
    a leading batch shape.  Returns (x1, y1, z1, ri1, zj1, length).

    Mirrors the semantics of cross_cylindrical_cell
    (cylindrical_grid.f90:918-1175), 2D case, as fully masked arithmetic.
    """
    dtype = x.dtype
    eps = _grid_eps(dtype)
    cm, cp = 1.0 - eps, 1.0 + eps
    big = jnp.asarray(1.0e30, dtype)
    n_rad, nz = grid.n_rad, grid.nz

    a = u * u + v * v
    inv_a = jnp.where(a > 1e-30, 1.0 / jnp.maximum(a, 1e-30), big)
    w_safe = jnp.where(jnp.abs(w) > 1e-30, w, 1e-30)
    inv_w = 1.0 / w_safe

    r2 = x * x + y * y
    b = (x * u + y * v) * inv_a

    in_cavity = ri == 0

    # all per-ring wall quantities in one one-hot matmul (see _wall_table)
    wt = _one_hot_rows(jnp.clip(ri, 0, n_rad + 1), n_rad + 2,
                       dtype) @ _wall_table(grid)
    r_out2, r_in2 = wt[..., 0], wt[..., 1]
    zmax_c, zmax_m, zmax_p = wt[..., 2], wt[..., 3], wt[..., 4]

    # ---- radial wall intersection (cylindrical_grid.f90:962-1000)

    moving_in = (u * x + v * y) < 0.0
    # try inner wall
    c_in = (r2 - r_in2 * cm) * inv_a
    delta_in = b * b - c_in
    hits_inner = moving_in & (delta_in >= 0.0) & (ri > 0)
    # outer wall (always exists)
    c_out = (r2 - r_out2 * cp) * inv_a
    delta_out = jnp.maximum(b * b - c_out, 0.0)

    delta = jnp.where(hits_inner, delta_in, delta_out)
    delta_rad = jnp.where(hits_inner, -1, 1)
    rac = jnp.sqrt(jnp.maximum(delta, 0.0))

    # cavity: unique positive root through r_lim[0]
    # (cylindrical_grid.f90:962-971)
    c_cav = (r2 - grid.r_lim2[0]) * inv_a
    rac_cav = jnp.sqrt(jnp.maximum(b * b - c_cav, 0.0))
    s_cav = (-b + rac_cav) * cp

    s = (-b - rac) * cp
    s = jnp.where(s < 0.0, (-b + rac) * cp, s)
    s = jnp.maximum(s, 0.0)
    s = jnp.where(in_cavity, s_cav, s)
    # pure-vertical rays never hit a radial wall
    s = jnp.where(a > 1e-30, s, big)

    # ---- vertical wall intersection, 2D |z| convention
    # (cylindrical_grid.f90:1003-1055)
    dz_i = zmax_c / nz
    dotprod = w * z
    away = dotprod > 0.0

    at_top = zj >= nz + 1
    upper = jnp.where(at_top, big, zj.astype(dtype) * dz_i)
    zlim_away = jnp.sign(z) * upper * cp
    dzj_away = jnp.where(at_top, 0, 1)

    # toward midplane
    bounce = zj == 1
    zlim_tow = jnp.where(
        bounce,
        -jnp.sign(z) * dz_i * cm,                      # cross midplane: |z|=dz on far side
        jnp.sign(z) * (zj.astype(dtype) - 1.0) * dz_i * cm)
    dzj_tow = jnp.where(bounce, 1, -1)

    zlim = jnp.where(away, zlim_away, zlim_tow)
    delta_zj = jnp.where(away, dzj_away, dzj_tow)
    t = (zlim - z) * inv_w
    t = jnp.where(dotprod == 0.0, big, t)
    t = jnp.maximum(t, 0.0)
    t = jnp.where(in_cavity, big, t)

    # ---- pick nearest wall (cylindrical_grid.f90:1098-1156)
    take_r = s < t
    length = jnp.where(take_r, s, t)

    x1 = x + length * u
    y1 = y + length * v
    z1 = z + length * w

    ri1_r = ri + delta_rad
    # re-bin z index when crossing a radial wall (cylindrical_grid.f90:1112-1119)
    zmax_new = jnp.where(delta_rad < 0, zmax_m, zmax_p)
    zj_rebin = jnp.floor(
        jnp.minimum(jnp.abs(z1) / zmax_new * nz, 2.0e9)).astype(jnp.int32) + 1
    zj_rebin = jnp.minimum(zj_rebin, nz + 1)
    zj1_r = jnp.where(ri1_r == 0, 1, jnp.where(ri1_r > n_rad, zj, zj_rebin))

    ri1 = jnp.where(take_r, ri1_r, ri)
    zj1 = jnp.where(take_r, zj1_r, zj + delta_zj)

    # keep z off exactly 0 (cylindrical_grid.f90:1159-1165)
    z1 = jnp.where(z1 == 0.0, jnp.asarray(np.asarray(eps, _np_dt(dtype))), z1)

    return x1, y1, z1, ri1.astype(jnp.int32), zj1.astype(jnp.int32), length


def has_exited(grid: CylGrid, ri, zj, z):
    """Exit test (reference test_exit_grid_cyl, cylindrical_grid.f90:680-704)."""
    zmaxmax = jnp.max(grid.zmax)
    radial = ri > grid.n_rad
    vertical = (zj > grid.nz) & (jnp.abs(z) > zmaxmax)
    return radial | vertical


def pos_in_cell(grid: CylGrid, ri, zj, rand1, rand2, rand3):
    """Uniform random position inside cell (ri,zj); 2D signed-z choice.

    Mirrors pos_em_cell_cyl (cylindrical_grid.f90:1415-1466).  Wall values
    come from the shared one-hot wall table — this runs inside the fused
    MC refill every iteration, where serialized gathers are ~90 ns/lane."""
    dtype = rand1.dtype
    n_rad, nz = grid.n_rad, grid.nz
    wt = _one_hot_rows(jnp.clip(ri, 0, n_rad + 1), n_rad + 2,
                       dtype) @ _wall_table(grid)
    r2a, r2b = wt[..., 1], wt[..., 0]
    r = jnp.sqrt(r2a + rand1 * (r2b - r2a))
    dz_i = wt[..., 2] / nz
    zlow = (zj.astype(dtype) - 1.0) * dz_i
    # random sign (2D mirror): rand2<0.5 -> negative z
    frac = jnp.where(rand2 > 0.5, 2.0 * (rand2 - 0.5), 2.0 * rand2)
    zabs = zlow + frac * dz_i
    zsign = jnp.where(rand2 > 0.5, 1.0, -1.0)
    phi = 2.0 * jnp.pi * rand3
    return r * jnp.cos(phi), r * jnp.sin(phi), zsign * zabs


def distance_to_closest_wall(grid: CylGrid, ri, zj, x, y, z):
    """Distance from a point to the nearest wall of its cell
    (reference distance_to_closest_wall_cyl, cylindrical_grid.f90:1179-1226).
    The 2D midplane counts as a wall (conservative for MRW spheres)."""
    dtype = x.dtype
    n_rad, nz = grid.n_rad, grid.nz
    zjc = jnp.clip(zj, 1, nz)
    r = jnp.sqrt(x * x + y * y)
    wt = _one_hot_rows(jnp.clip(ri, 0, n_rad + 1), n_rad + 2,
                       dtype) @ _wall_table(grid)
    s1 = wt[..., 5] - r
    s2 = r - wt[..., 6]
    dz = wt[..., 2] / nz
    za = jnp.abs(z)
    s3 = zjc.astype(dtype) * dz - za
    s4 = za - (zjc.astype(dtype) - 1.0) * dz
    return jnp.maximum(jnp.minimum(jnp.minimum(s1, s2),
                                   jnp.minimum(s3, s4)), 0.0)
