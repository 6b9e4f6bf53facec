"""Geometry dispatch: one traversal interface over all grid types.

The reference binds procedure pointers at runtime (setup_grid,
grid.f90:273-367: cross_cell, pos_em_cell, move_to_grid, index_cell,
test_exit_grid).  Here the dispatch is static at trace time on the pytree
type, so each jitted kernel specialises to its grid with zero overhead.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import cyl3d as _c3d
from . import cylindrical as _cyl
from . import sph3d as _s3d
from . import spherical as _sph
from . import voronoi as _vor
from .cyl3d import Cyl3DGrid
from .cylindrical import CylGrid
from .sph3d import Sph3DGrid
from .spherical import SphGrid
from .voronoi import VoronoiGrid


def _mod(grid):
    if isinstance(grid, SphGrid):
        return _sph
    if isinstance(grid, Sph3DGrid):
        return _s3d
    if isinstance(grid, Cyl3DGrid):
        return _c3d
    return _cyl


def is_voronoi(grid) -> bool:
    return isinstance(grid, VoronoiGrid)


def cross_cell(grid, x, y, z, u, v, w, ri, zj):
    if is_voronoi(grid):
        x1, y1, z1, inext, l = _vor.cross_cell(grid, x, y, z, u, v, w, ri)
        return x1, y1, z1, inext, jnp.ones_like(zj), l
    return _mod(grid).cross_cell(grid, x, y, z, u, v, w, ri, zj)


def index_cell(grid, x, y, z):
    if is_voronoi(grid):
        ic = _vor.locate(grid, x, y, z)
        return ic, jnp.ones_like(ic)
    return _mod(grid).index_cell(grid, x, y, z)


def pos_in_cell(grid, ri, zj, r1, r2, r3):
    if is_voronoi(grid):
        return _vor.pos_in_cell(grid, ri, r1, r2, r3)
    return _mod(grid).pos_in_cell(grid, ri, zj, r1, r2, r3)


# host-side float64 copies of the grid arrays, registered by the grid
# builders: device->host readback over a tunnelled TPU costs tens of
# seconds per array, so setup-time code reads the grid from here.  Keyed
# by id of the device volume array; the entry keeps the array alive so
# the id cannot be recycled while registered.
_HOST_GRIDS: dict = {}


def register_host(grid, arrays: dict):
    _HOST_GRIDS[id(grid.volume)] = (grid.volume, arrays)


def host_arrays(grid, name: str):
    """Host float64 copy of a grid array (r_grid, z_grid, volume, ...);
    falls back to a device readback for unregistered grids."""
    ent = _HOST_GRIDS.get(id(grid.volume))
    if ent is not None and ent[0] is grid.volume and name in ent[1]:
        return ent[1][name]
    import numpy as np
    return np.asarray(getattr(grid, name), np.float64)


def flat_index(grid, ri, zj):
    if is_voronoi(grid):
        return _vor.flat_index(grid, ri)
    return _mod(grid).flat_index(grid, ri, zj)


def is_inside(grid, ri, zj):
    if is_voronoi(grid):
        return _vor.is_inside(grid, ri)
    return _mod(grid).is_inside(grid, ri, zj)


def has_exited(grid, ri, zj, z):
    if is_voronoi(grid):
        return _vor.has_exited(grid, ri)
    return _mod(grid).has_exited(grid, ri, zj, z)


def cell_from_flat(grid, icell):
    """Flat cell index -> (ri, zj) index pair for packet emission."""
    ic = icell.astype(jnp.int32)
    if is_voronoi(grid):
        return ic + 1, jnp.ones_like(ic)
    if isinstance(grid, (Cyl3DGrid, Sph3DGrid)):
        ri = (ic % grid.n_rad) + 1
        rem = ic // grid.n_rad
        j = rem % (2 * grid.nz) + 1
        k = rem // (2 * grid.nz) + 1
        enc = _s3d.encode if isinstance(grid, Sph3DGrid) else _c3d.encode
        return ri, enc(grid, j, k)
    return (ic % grid.n_rad) + 1, (ic // grid.n_rad) + 1


def cell_shape(grid):
    """Numpy (C-order) shape of per-cell arrays for FITS output:
    (nz, n_rad) in 2D, (n_az, 2*nz, n_rad) in 3D, (n_cells,) Voronoi
    — matching the reference's [n_rad, nz(, n_az)] FITS axis order
    (ecriture_temperature, output.f90:2523)."""
    if is_voronoi(grid):
        return (grid.n_cells,)
    if isinstance(grid, (Cyl3DGrid, Sph3DGrid)):
        return (grid.n_az, 2 * grid.nz, grid.n_rad)
    return (grid.nz, grid.n_rad)


def distance_to_closest_wall(grid, ri, zj, x, y, z):
    if is_voronoi(grid):
        i0 = _vor.flat_index(grid, ri)
        s = grid.seeds[i0]
        d_seed = jnp.sqrt((x - s[:, 0]) ** 2 + (y - s[:, 1]) ** 2
                          + (z - s[:, 2]) ** 2)
        return jnp.maximum(grid.inradius[i0] - d_seed, 0.0)
    return _mod(grid).distance_to_closest_wall(grid, ri, zj, x, y, z)


def move_to_grid(grid, x, y, z, u, v, w):
    """Advance rays from outside to the model boundary; dispatched:
    cylinder+slab for cylindrical (move_to_grid_cyl), outer sphere for
    spherical (move_to_grid_sph, spherical_grid.f90), bounding box for
    Voronoi."""
    if is_voronoi(grid):
        x1, y1, z1, ic, hit = _vor.move_to_grid(grid, x, y, z, u, v, w)
        return x1, y1, z1, ic, jnp.ones_like(ic), hit
    if isinstance(grid, (SphGrid, Sph3DGrid)):
        dtype = x.dtype
        big = jnp.asarray(1.0e30, dtype)
        cm = 1.0 - (1e-6 if dtype == jnp.float64 else 2e-4)
        R2 = grid.r_lim2[-1] * cm
        b = x * u + y * v + z * w
        c = x * x + y * y + z * z - R2
        delta = b * b - c
        rac = jnp.sqrt(jnp.maximum(delta, 0.0))
        s1 = -b - rac
        hit = (delta > 0.0) & (s1 > 0.0)
        s1 = jnp.where(hit, s1, 0.0)
        x1, y1, z1 = x + s1 * u, y + s1 * v, z + s1 * w
        ri, tj = _mod(grid).index_cell(grid, x1, y1, z1)
        return x1, y1, z1, ri, tj, hit
    from ..transfer.raytrace import _move_to_grid
    return _move_to_grid(grid, x, y, z, u, v, w)


def model_extent(grid):
    """(rmin, rmax) of the model in AU for any grid kind — outer radial wall
    for structured grids, seed-cloud extent for Voronoi meshes."""
    import numpy as np
    if is_voronoi(grid):
        r = host_arrays(grid, "r_grid")
        z = host_arrays(grid, "z_grid")
        rmax = float(np.sqrt((r ** 2 + z ** 2).max()))
        return float(max(r.min(), 1e-3)), rmax
    rl = host_arrays(grid, "r_lim")
    return float(rl[0]), float(rl[-1])
