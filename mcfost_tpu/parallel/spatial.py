"""Spatial domain decomposition (SURVEY §2.7 north star): the
structurally large per-cell tally is sharded over the mesh and tally
EVENTS are ring-routed to their owner device.

Two kernels live here:

* `spatial_deposit` — deterministic extinction deposition along rays
  (no RNG) with LANE routing (each device advances only rays inside its
  slab; the whole block rides a `lax.ppermute` ring), whose
  8-dev == 1-dev float-tol test pins the ownership semantics exactly;
* `run_thermal_mc_spatial` — the FULL fused thermal MC with the RT1
  scattered-intensity tally sharded by cell slab and foreign collision
  EVENTS ring-routed to their owner each iteration (see the design
  notes mid-file for why lane routing was abandoned for the MC:
  measured 1/n_dev duty cycle, resp. a capacity gridlock).  Packets are
  data-parallel; the small tallies stay device-private and are summed
  at the end — exactly the reference's per-thread arrays reduced at
  thermal_emission.f90:668.

Geometry (walls, per-cell wall tables) is replicated — it is O(C)
scalars, tiny next to the (L, C, n_az, 2) tallies; densities/opacities
stay in the per-bucket `p_icell` compression of the MC model.
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
# Full thermal MC under spatial domain decomposition (r5 architecture)
# ---------------------------------------------------------------------------
#
# r4 routed LANES to the owner of their current cell (every lane frozen
# while foreign, the whole batch ppermuted each round).  Measured on a
# 2-device mesh with full core headroom that design has a hard ~1/n_dev
# duty cycle (sdd_eff 0.19); a stray-exchange variant (pack strays into
# fixed ring buffers, merge into dead slots at the owner) deadlocks under
# load because with a 50/50 slab split half of all lanes want to be
# elsewhere at any time — more than any bounded buffer + free-slot supply
# (measured: emission stalls with every lane alive-but-frozen).
#
# The r5 design decouples compute placement from tally placement:
# packets advance DATA-PARALLEL on every device (the per-cell model
# tables are O(C) scalars and stay replicated), the small tallies
# (xkj, nabs, SED, xJ) stay device-private and are summed at the end —
# exactly the reference's per-thread arrays reduced at
# thermal_emission.f90:668 — and the one structurally LARGE array, the
# (L*C*n_az*2, nRT*6) RT1 scattered-intensity tally, is sharded by cell
# slab.  Collision events (mc/thermal_mc.py rt_est="collision") landing
# in an owned cell scatter locally; foreign events are compacted into a
# small staging block and ring-routed with `lax.ppermute`, each hop
# extracting the arrivals into an inbox that is scattered ONCE into the
# local slab.  An arriving event is consumed by a scatter-add — never
# queued against a capacity — so the exchange cannot deadlock, and the
# per-iteration traffic is tiny (~600 events x 21 f32 on the ref4.1
# disk).  This is the memory-scaling axis of SURVEY §2.7: xi memory per
# device is C/n_dev while throughput stays at packet-DP efficiency.


@functools.lru_cache(maxsize=32)
def _spatial_mc_chunk(mesh: Mesh, axis: str, n_dev: int, slab: int,
                      n_iters: int,
                      pola: bool, mono: bool, rt: bool, n_az_rt: int,
                      mrw: bool, mrw_gamma: float, jtally: bool,
                      scat_method: int, nabs_tally: bool, dark: bool,
                      age_cap: int, emit_width=None):
    """Build the jitted per-chunk spatial advance (see module notes).

    lru_cached: a fresh ``jax.jit`` per driver call would recompile the
    whole fused kernel every run.  The iteration loop's exit condition is
    a psum'd work counter, identical on every device, so the in-loop
    collectives stay in lockstep."""

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
            age_cap=age_cap, emit_width=emit_width,
            rt_slab=(dev, n_dev, slab) if rt else None)
        fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        L = model.n_lambda
        n_rt = model.rt_dirs.shape[0]

        def route_events(m):
            """Ring-route this iteration's foreign RT events to their
            owners: n_dev-1 hops, each hop scattering the arrivals
            directly into the local slab (masked: foreign rows add 0 to
            row 0).  Bounded-exact: the block is fe_cap rows and every
            entry reaches its owner within n_dev-1 hops — an earlier
            fixed-size-inbox variant silently dropped 23% of the events
            at the hot inner slab's owner."""
            X = m.fe                              # (Ef, 3+nrt*6)
            Ef = X.shape[0]
            # mark rows past the valid count unroutable (flat = -1)
            live = jnp.arange(Ef) < m.fe_n
            X = X.at[:, 1].set(jnp.where(live, X[:, 1], -1.0))
            xi = m.xi
            for _ in range(n_dev - 1):
                X = jax.lax.ppermute(X, axis, fwd)
                flatX = jnp.round(X[:, 1]).astype(jnp.int32)
                mine = (flatX >= 0) & ((flatX // slab) == dev)
                ilamX = jnp.round(X[:, 0]).astype(jnp.int32)
                azkX = jnp.round(X[:, 2]).astype(jnp.int32)
                row = ((ilamX * slab + flatX - dev * slab)
                       * (2 * n_az_rt) + azkX)
                row = jnp.where(mine, row, 0)
                row = jnp.clip(row, 0, L * slab * 2 * n_az_rt - 1)
                vals = jnp.where(mine[:, None], X[:, 3:], 0.0)
                xi = xi.at[row].add(vals.astype(xi.dtype),
                                    mode="promise_in_bounds")
                # consume adopted entries so later devices cannot
                # double-count them
                X = jnp.where(mine[:, None], 0.0, X)
                X = X.at[:, 1].set(jnp.where(mine, -1.0, X[:, 1]))
            # any entry still routable after n_dev-1 hops would be a
            # relay bug; count it so it cannot vanish silently
            lost = jnp.sum((X[:, 1] >= 0.0).astype(jnp.int32))
            return m._replace(
                xi=xi, fe=jnp.zeros_like(m.fe),
                fe_n=jnp.zeros((), jnp.int32),
                fe_lost=m.fe_lost + lost)

        def work_of(m):
            rem = jnp.maximum(budget - m.emitted, 0)
            return jax.lax.psum(
                jnp.sum(m.alive.astype(jnp.int32)) + rem, axis)

        def iter_body(st):
            m, wk, it = st
            m = body(m)
            if rt and n_dev > 1:
                m = route_events(m)
            # the work psum is the only per-iteration collective in
            # thermal mode: check it every 8th iteration (all devices
            # share `it`, so the cond's collective stays in lockstep)
            # — the barrier per iteration measurably drags the CPU-mesh
            # curve, and on ICI it is still a sync point
            wk = jax.lax.cond((it + 1) % 8 == 0,
                              lambda m_: work_of(m_),
                              lambda m_: wk, m)
            return (m, wk, it + 1)

        def cond(st):
            return (st[1] > stop_w) & (st[2] < n_iters)

        mc, work, _ = jax.lax.while_loop(
            cond, iter_body, (mc, work_of(mc), jnp.zeros((), jnp.int32)))
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
    """Run the full thermal MC with the RT tally sharded over ``mesh``.

    Packets are data-parallel; the (L*C*n_az*2, nRT*6) RT1 tally — the
    memory-scaling axis of SURVEY §2.7 — lives as C/n_dev slabs with
    collision events ring-routed to their owner (see module notes for
    why lane routing was abandoned).  Returns a globally-assembled
    MCResult identical in structure to the replicated drivers'.
    Deterministic per (key, mesh size): fixed ring schedule + per-device
    counter RNG.  n_inner/rounds_per_call kept for API compatibility:
    the chunk length is rounds_per_call * n_inner iterations."""
    n_dev = int(mesh.devices.size)
    axis = mesh.axis_names[0]
    n_cells = model.grid.n_cells
    slab = slab_size(n_cells, n_dev)
    n_per_dev = int(np.ceil(n_packets / n_dev))
    keys = jax.random.split(key, n_dev)
    budgets = jnp.full((n_dev,), n_per_dev, jnp.int32)

    # staging sized to the batch: events/iteration <= B, so source-side
    # overflow is impossible (+64 so the leading dim can never collide
    # with a lane-batch width inside _compact_sharded's shape test)
    fe_cap = batch_per_device + 64 if (rt and n_dev > 1) else 0
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n_dev,) + a.shape),
        thermal_mc.init_state(model, batch_per_device, n_capt, rt=rt,
                              n_az_rt=n_az_rt, jtally=jtally,
                              xi_rows=slab if rt else None,
                              fe_cap=fe_cap, mono=mono))
    dark = bool(jax.device_get(jnp.any(model.dark_zone)))
    totals = jnp.full((n_dev,), n_per_dev * n_dev, jnp.int32)
    n_iters_call = rounds_per_call * n_inner

    def get_chunk():
        return _spatial_mc_chunk(
            mesh, axis, n_dev, slab, n_iters=n_iters_call,
            pola=pola, mono=mono, rt=rt, n_az_rt=n_az_rt,
            mrw=mrw, mrw_gamma=mrw_gamma, jtally=jtally,
            scat_method=scat_method, nabs_tally=nabs_tally, dark=dark,
            age_cap=age_cap)

    summary = _spatial_summary_fn()

    # drain ladder: compact to rung w once the widest device's alive
    # count fits 0.9*w; the chunk's collective exit threshold is the SAME
    # criterion (summed over devices) so an exit always enables a
    # compaction — a mismatched pair here let a 770-alive device sit just
    # above the old 768 rung, disarm the exit, and burn a whole chunk of
    # full-width iterations (9 ms/iter at 2 devices)
    RUNGS = (4096, 1024, 128)

    def stop_for(b):
        for w in RUNGS:
            if w < b:
                return int(w * 0.9)
        return 0

    iters = 0
    b_cur = batch_per_device
    # arm the collective work-threshold exit from the FIRST chunk (the
    # work counter includes the remaining emission budget, so the exit
    # cannot fire before the budget is spent)
    stop_w = stop_for(b_cur) * n_dev
    while iters < max_rounds * n_inner:
        stops = jnp.full((n_dev,), stop_w, jnp.int32)
        state, work = get_chunk()(model, keys, state, budgets, totals,
                                  stops)
        iters += n_iters_call
        done, emitted, n_alive, wk = (
            int(v) for v in jax.device_get(summary(state, work)))
        if progress is not None:
            progress(done, emitted, n_alive)
        if wk == 0:
            break
        if emitted >= n_per_dev * n_dev and n_alive > 0:
            # drain ladder (see run_thermal_mc): compact the batch as the
            # stragglers die off; widths shrink uniformly on all devices
            per_dev_alive = int(jax.device_get(
                jnp.max(jnp.sum(state.alive.astype(jnp.int32), axis=1))))
            target = b_cur
            for b_new in RUNGS:
                if b_new < target and per_dev_alive <= int(b_new * 0.9):
                    target = b_new
            if target < b_cur:
                from .mesh import _compact_sharded
                state = _compact_sharded(state, target)
                b_cur = target
            stop_w = stop_for(b_cur) * n_dev
        if wk <= stop_w:
            # between rungs (summed work under the collective threshold
            # while one device still exceeds its per-device rung): drain
            # in 20% bites — each chunk exits once a fifth of the
            # remaining work has died, re-checking compaction after each
            # bite.  Any rung-anchored re-arm here either equals wk
            # (instant-exit spin) or is 0 (no exit: measured 2400
            # full-width iterations burned at 4.5 ms each)
            stop_w = int(wk * 0.8)

    # ---- assemble: private tallies summed (the reference's per-thread
    # reduction), the slab-sharded xi reordered to global cell order
    st = jax.device_get(state)
    L = model.n_lambda
    xkj = np.asarray(st.xkj, np.float64).sum(0)
    nabs = np.asarray(st.nabs, np.float64).sum(0)
    xj = (np.asarray(st.xj, np.float64).sum(0) if jtally
          else np.zeros(1))
    if rt:
        nrt = int(model.rt_dirs.shape[0])
        xi = np.asarray(st.xi).reshape(n_dev, L, slab, n_az_rt * 2,
                                       nrt * 6)
        xi = xi.transpose(1, 0, 2, 3, 4).reshape(
            L, n_dev * slab, n_az_rt * 2, nrt * 6)[:, :n_cells]
        xi = xi.reshape(L * n_cells * n_az_rt * 2, nrt * 6)
    else:
        xi = np.asarray(st.xi).sum(0)
    fe_lost = int(np.asarray(st.fe_lost).sum())
    import os as _os
    if _os.environ.get("MCFOST_TPU_DEBUG_FE"):
        print("  DEBUG fe_lost =", fe_lost, "per dev", np.asarray(st.fe_lost))
    if fe_lost:
        print(f"  WARNING: spatial RT exchange dropped {fe_lost} "
              "events (fe staging overflow) — raise batch_per_device//4")
    return thermal_mc.MCResult(
        xkj=jnp.asarray(xkj.astype(np.float32)),
        nabs=jnp.asarray(nabs.astype(np.float32)),
        sed=jnp.sum(jnp.asarray(st.sed), axis=0),
        emitted=jnp.sum(jnp.asarray(st.emitted)),
        n_iters=jnp.max(jnp.asarray(st.it)),
        n_lost=int(np.asarray(st.alive).sum() + np.asarray(st.nkill).sum()),
        xi=jnp.asarray(xi),
        xj=jnp.asarray(xj.astype(np.float32)),
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
