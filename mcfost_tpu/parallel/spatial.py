"""Spatial domain decomposition: cells sharded over the mesh, packets
routed to the owner device (SURVEY §2.7 north star).

Unlike the packet-DP path (parallel/mesh.py), where every device holds
every tally cell and the (L, C) tallies are psum-reduced at phase end,
here each device OWNS a contiguous slab of flat cell indices and is the
only device that ever accumulates into that slab.  Packets crossing a slab
boundary are parked and ring-routed with `lax.ppermute` until they reach
their owner.  Tally memory per device is C/n_dev — the axis that lets
large Voronoi/3D models exceed single-chip HBM.

The routing schedule is a simple ICI-friendly ring: one `ppermute` hop per
outer round, each device claiming the parked packets whose cell it owns.
A packet needs at most n_dev-1 hops; in radially-ordered slabs almost all
crossings are to a ring neighbour, so hops ride adjacent ICI links —
exactly the layout the scaling-book recipe prescribes for halo exchange.

Geometry (walls, per-cell wall tables) is replicated — it is O(C) scalars,
tiny next to the (L, C) tallies; densities/opacities stay in the per-
bucket `p_icell` compression of the MC model.

This module ships the *transport+tally* core (extinction deposition along
rays, the xJ/xkj pattern of thermal_mc) with bitwise-checkable semantics;
the fused thermal kernel plugs its interaction physics into the same
routing skeleton next.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..grids import geometry as geom
from ..mc.model import Model


def slab_size(n_cells: int, n_dev: int) -> int:
    return -(-n_cells // n_dev)          # ceil


def owner_of(flat, slab: int):
    return flat // slab


@functools.partial(jax.jit, static_argnames=("n_dev", "axis", "n_inner",
                                             "max_rounds"))
def _spatial_deposit_device(model: Model, x, y, z, u, v, w, ilam, wgt,
                            dev_id, n_dev: int, axis: str,
                            n_inner: int = 96, max_rounds: int = 256):
    """Per-device body (called inside shard_map): advance the local ray
    block, deposit kappa*l into the owned slab only, ring-route strays."""
    grid = model.grid
    n_cells = grid.n_cells
    slab = slab_size(n_cells, n_dev)
    L = model.n_lambda
    dtype = x.dtype

    x, y, z, ri, zj, entered = geom.move_to_grid(grid, x, y, z, u, v, w)
    alive = entered & ~geom.has_exited(grid, ri, zj, z)
    tally = jnp.zeros((L, slab), dtype)

    def owned(flat):
        return owner_of(flat, slab) == dev_id

    def cond(st):
        return (st[8] > 0) & (st[0] < max_rounds)

    def body(st):
        (rnd, x, y, z, ri, zj, alive, tally, moving) = st[:9]
        u_, v_, w_, wgt_, ilam_ = st[9:]
        x, y, z, ri, zj, alive, tally = jax.lax.fori_loop(
            0, n_inner,
            lambda k, s: _inner(s, u_, v_, w_, wgt_, ilam_),
            (x, y, z, ri, zj, alive, tally))
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        shift = lambda a: jax.lax.ppermute(a, axis, perm)  # noqa: E731
        x, y, z = shift(x), shift(y), shift(z)
        ri, zj = shift(ri), shift(zj)
        u_, v_, w_ = shift(u_), shift(v_), shift(w_)
        wgt_, ilam_ = shift(wgt_), shift(ilam_)
        alive = shift(alive)
        moving = jax.lax.psum(jnp.sum(alive.astype(jnp.int32)), axis)
        return (rnd + 1, x, y, z, ri, zj, alive, tally, moving,
                u_, v_, w_, wgt_, ilam_)

    def _inner(st, u_, v_, w_, wgt_, ilam_):
        x, y, z, ri, zj, alive, tally = st
        inside = geom.is_inside(grid, ri, zj)
        flat = jnp.clip(geom.flat_index(grid, ri, zj), 0, n_cells - 1)
        mine = owned(flat) & inside
        run = alive & mine
        kext = model.kappa[model.p_icell[flat], ilam_] \
            * model.kappa_factor[flat]
        x1, y1, z1, ri1, zj1, l = geom.cross_cell(grid, x, y, z,
                                                  u_, v_, w_, ri, zj)
        dep = jnp.where(run, l * kext * wgt_, 0.0)
        loc = jnp.clip(flat - dev_id * slab, 0, slab - 1)
        tally = tally.at[ilam_, loc].add(dep, mode="drop")
        adv = run | (alive & ~inside)
        x = jnp.where(adv, x1, x)
        y = jnp.where(adv, y1, y)
        z = jnp.where(adv, z1, z)
        ri = jnp.where(adv, ri1, ri)
        zj = jnp.where(adv, zj1, zj)
        alive = alive & ~geom.has_exited(grid, ri, zj, z)
        return x, y, z, ri, zj, alive, tally

    moving0 = jax.lax.psum(jnp.sum(alive.astype(jnp.int32)), axis)
    st = (jnp.zeros((), jnp.int32), x, y, z, ri, zj, alive, tally, moving0,
          u, v, w, wgt, ilam)
    st = jax.lax.while_loop(cond, body, st)
    return st[7]                          # tally


def spatial_deposit(model: Model, mesh: Mesh, x, y, z, u, v, w, ilam, wgt,
                    axis: str = "dp"):
    """Cell-sharded extinction deposit over `mesh`.

    Rays are blocked over devices (leading axis n_dev); the returned tally
    is (L, n_dev*slab) assembled from the per-device slabs (only for
    inspection — production callers keep it sharded)."""
    n_dev = mesh.devices.size
    slab = slab_size(model.grid.n_cells, n_dev)

    def dev_fn(model, x, y, z, u, v, w, ilam, wgt):
        dev = jax.lax.axis_index(axis)
        t = _spatial_deposit_device(model, x[0], y[0], z[0], u[0], v[0],
                                    w[0], ilam[0], wgt[0], dev,
                                    n_dev=n_dev, axis=axis)
        return t[None]

    f = jax.shard_map(dev_fn, mesh=mesh,
                      in_specs=(P(),) + (P(axis),) * 8,
                      out_specs=P(axis), check_vma=False)
    out = f(model, x, y, z, u, v, w, ilam, wgt)   # (n_dev, L, slab)
    out = np.asarray(jax.device_get(out))
    L = out.shape[1]
    return out.transpose(0, 2, 1).reshape(n_dev * slab, L).T[
        :, :model.grid.n_cells]
