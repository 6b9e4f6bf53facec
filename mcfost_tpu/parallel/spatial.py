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

Two kernels share the routing skeleton:

* `spatial_deposit` — deterministic extinction deposition along rays
  (no RNG), whose 8-dev == 1-dev float-tol test pins the
  routing/ownership semantics exactly;
* `run_thermal_mc_spatial` — the FULL fused thermal MC
  (emission, scattering, B&W immediate reemission, MRW, SED/RT1
  tallies; mc/thermal_mc.make_mc_step with ``spatial=`` ownership):
  each device owns a slab of cells, advances only the lanes currently
  inside its slab (plus lanes outside the grid), freezes the rest, and
  ring-routes all lane state one hop per round.  xkj/xJ/nabs/xi tallies
  are slab-local (memory per device = C/n_dev on the cell axis); only
  the small (L, n_capt, 8) MC-SED tally is device-private and summed at
  the end.  The B&W reemission temperature reads the owner's slab tally
  — the complete running deposit for that cell, *tighter* than the
  packet-DP path where each device sees only its private share.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..grids import geometry as geom
from ..mc import thermal_mc
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


# ---------------------------------------------------------------------------
# Full thermal MC under spatial domain decomposition
# ---------------------------------------------------------------------------

# MCState fields with a per-lane (B,) leading axis: exactly these move with
# the packet when it is ring-routed to its owner device.
_LANE_FIELDS = ("x", "y", "z", "u", "v", "w", "sI", "sQ", "sU", "sV",
                "ilam", "ri", "zj", "tau_rem", "alive", "fstar", "fscat",
                "age")


def _shift_lanes(s, axis: str, n_dev: int):
    """One ring hop of all per-lane packet state (tallies/counters stay)."""
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    sh = lambda a: jax.lax.ppermute(a, axis, perm)  # noqa: E731
    return s._replace(**{f: sh(getattr(s, f)) for f in _LANE_FIELDS})


@functools.lru_cache(maxsize=32)
def _spatial_mc_chunk(mesh: Mesh, axis: str, n_dev: int, slab: int,
                      n_rounds: int, n_inner: int,
                      pola: bool, mono: bool, rt: bool, n_az_rt: int,
                      mrw: bool, mrw_gamma: float, jtally: bool,
                      scat_method: int, nabs_tally: bool, dark: bool,
                      age_cap: int):
    """Build the jitted per-chunk spatial advance.

    lru_cached: a fresh ``jax.jit`` per driver call would recompile the
    whole fused kernel every run (see parallel/mesh._sharded_advance).

    Per device: ``n_rounds`` outer rounds of [``n_inner`` fused MC
    iterations on owned/outside lanes  →  one ppermute ring hop of all
    lane state], with a *collective* termination count so every device
    executes the same number of collectives (a per-device exit would
    deadlock the ring)."""

    def dev_fn(model, keys, state, budgets, totals, stop_work):
        dev = jax.lax.axis_index(axis)
        key = keys[0]
        budget = budgets[0]
        n_total = totals[0]     # traced, so packet count changes don't
        stop_w = stop_work[0]   # recompile the kernel
        mc = jax.tree.map(lambda a: a[0], state)
        body = thermal_mc.make_mc_step(
            model, key, budget, n_total, pola=pola, mono=mono, rt=rt,
            n_az_rt=n_az_rt, mrw=mrw, mrw_gamma=mrw_gamma, jtally=jtally,
            scat_method=scat_method, nabs_tally=nabs_tally, dark=dark,
            age_cap=age_cap, spatial=(dev, n_dev, slab))

        def work_of(m):
            rem = jnp.maximum(budget - m.emitted, 0)
            return jax.lax.psum(
                jnp.sum(m.alive.astype(jnp.int32)) + rem, axis)

        def round_body(st):
            m, _, rnd = st
            m = jax.lax.fori_loop(0, n_inner, lambda k, s2: body(s2), m)
            m = _shift_lanes(m, axis, n_dev)
            return (m, work_of(m), rnd + 1)

        def cond(st):
            # the work counter is a psum — identical on every device, so
            # this collective-safe early exit lets the host compact the
            # drain (stop_work = next-rung threshold * n_dev, 0 before
            # the budget is spent)
            return (st[1] > stop_w) & (st[2] < n_rounds)

        mc, work, _ = jax.lax.while_loop(
            cond, round_body, (mc, work_of(mc), jnp.zeros((), jnp.int32)))
        return jax.tree.map(lambda a: a[None], mc), work[None]

    f = jax.shard_map(dev_fn, mesh=mesh,
                      in_specs=(P(), P(axis), P(axis), P(axis), P(axis),
                                P(axis)),
                      out_specs=(P(axis), P(axis)), check_vma=False)
    return jax.jit(f, donate_argnums=(2,))


@functools.lru_cache(maxsize=1)
def _spatial_summary_fn():
    return jax.jit(lambda s, wk: (jnp.max(s.it), jnp.sum(s.emitted),
                                  jnp.sum(s.alive.astype(jnp.int32)),
                                  wk[0]))


def run_thermal_mc_spatial(model: Model, key, n_packets: int, mesh: Mesh,
                           batch_per_device: int = 4096, n_capt: int = 10,
                           max_rounds: int = 1000000, n_inner: int = 48,
                           rounds_per_call: int = 50, pola: bool = True,
                           mono: bool = False, rt: bool = False,
                           n_az_rt: int = 45, mrw: bool = True,
                           mrw_gamma: float = 2.0, jtally: bool = False,
                           scat_method: int = 2, nabs_tally: bool = False,
                           age_cap: int = 100000,
                           progress=None) -> thermal_mc.MCResult:
    """Run the full thermal MC with cells sharded over ``mesh``.

    Returns a globally-assembled MCResult identical in structure to the
    replicated drivers'.  The per-device tally footprint on the cell axis
    is C/n_dev — the memory-scaling axis of SURVEY §2.7 — at the price of
    interior lanes idling while they ride the ring to their owner slab.
    Deterministic per (key, mesh size): fixed ring schedule + per-device
    counter RNG."""
    n_dev = int(mesh.devices.size)
    axis = mesh.axis_names[0]
    n_cells = model.grid.n_cells
    slab = slab_size(n_cells, n_dev)
    n_per_dev = int(np.ceil(n_packets / n_dev))
    keys = jax.random.split(key, n_dev)
    budgets = jnp.full((n_dev,), n_per_dev, jnp.int32)

    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n_dev,) + a.shape),
        thermal_mc.init_state(model, batch_per_device, n_capt, rt=rt,
                              n_az_rt=n_az_rt, jtally=jtally, n_ct=slab,
                              mono=mono))
    dark = bool(jax.device_get(jnp.any(model.dark_zone)))
    totals = jnp.full((n_dev,), n_per_dev * n_dev, jnp.int32)
    chunk = _spatial_mc_chunk(mesh, axis, n_dev, slab,
                              n_rounds=rounds_per_call, n_inner=n_inner,
                              pola=pola, mono=mono, rt=rt, n_az_rt=n_az_rt,
                              mrw=mrw, mrw_gamma=mrw_gamma, jtally=jtally,
                              scat_method=scat_method,
                              nabs_tally=nabs_tally, dark=dark,
                              age_cap=age_cap)
    summary = _spatial_summary_fn()

    def stop_for(b):
        # per-device next-rung threshold (see run_thermal_mc)
        return 3000 if b > 4096 else 768 if b > 1024 else \
            96 if b > 128 else 0

    rounds = 0
    b_cur = batch_per_device
    # arm the collective work-threshold exit from the FIRST chunk (the
    # work counter includes the remaining emission budget, so the exit
    # cannot fire before the budget is spent): without this the first
    # chunk burns rounds_per_call*n_inner full-width iterations on an
    # almost-dead batch — measured 2.77 s of a 3.15 s run at 1 device
    stop_w = stop_for(b_cur) * n_dev
    while rounds * n_inner < max_rounds:
        stops = jnp.full((n_dev,), stop_w, jnp.int32)
        state, work = chunk(model, keys, state, budgets, totals, stops)
        rounds += rounds_per_call
        done, emitted, n_alive, wk = (
            int(v) for v in jax.device_get(summary(state, work)))
        if progress is not None:
            progress(done, emitted, n_alive)
        if wk == 0:
            break
        if emitted >= n_per_dev * n_dev and n_alive > 0:
            # drain ladder (see run_thermal_mc): the chunk's collective
            # work-threshold exit returns control when compaction may be
            # possible; lanes compact uniformly across devices (frozen
            # awaiting-routing lanes count as alive and survive, so the
            # ring stays consistent across the width change)
            per_dev_alive = int(jax.device_get(
                jnp.max(jnp.sum(state.alive.astype(jnp.int32), axis=1))))
            target = b_cur
            for b_new, thresh in ((4096, 3000), (1024, 768), (128, 96)):
                if per_dev_alive <= thresh and target > b_new:
                    target = b_new
            if target < b_cur:
                from .mesh import _compact_sharded
                state = _compact_sharded(state, target)
                b_cur = target
                stop_w = stop_for(b_cur) * n_dev
            elif wk <= stop_w:
                # one device still above the rung while the sum is under
                # the collective threshold: drain without early exit so
                # the loop cannot spin
                stop_w = 0
            else:
                stop_w = stop_for(b_cur) * n_dev

    # ---- assemble the slab-sharded tallies back to global cell order
    def slabs_to_cells(a):        # (n_dev, L, slab) -> (L, n_cells)
        return a.transpose(1, 0, 2).reshape(a.shape[1], -1)[:, :n_cells]

    st = jax.device_get(state)
    L = model.n_lambda
    xkj = np.asarray(st.xkj).reshape(-1)[:n_cells]
    nabs = np.asarray(st.nabs).reshape(-1)[:n_cells]
    xj = slabs_to_cells(np.asarray(st.xj).reshape(n_dev, L, slab)
                        ).reshape(-1) if jtally else np.zeros(1)
    if rt:
        nrt = int(model.rt_dirs.shape[0])
        xi = np.asarray(st.xi).reshape(n_dev, L, slab, n_az_rt * 2, nrt, 6)
        xi = xi.transpose(1, 0, 2, 3, 4, 5).reshape(
            L, n_dev * slab, -1)[:, :n_cells]
        xi = xi.reshape(-1)          # flat 1-D tally contract
    else:
        xi = np.asarray(st.xi).sum(0)
    return thermal_mc.MCResult(
        xkj=jnp.asarray(xkj),
        nabs=jnp.asarray(nabs),
        sed=jnp.sum(jnp.asarray(st.sed), axis=0),
        emitted=jnp.sum(jnp.asarray(st.emitted)),
        n_iters=jnp.max(jnp.asarray(st.it)),
        n_lost=int(np.asarray(st.alive).sum() + np.asarray(st.nkill).sum()),
        xi=jnp.asarray(xi),
        xj=jnp.asarray(xj),
        nsent=jnp.sum(jnp.asarray(st.nsent), axis=0),
    )


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
