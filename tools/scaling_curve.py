#!/usr/bin/env python
"""Packet-DP and spatial-DD WEAK-scaling efficiency on a virtual CPU mesh.

Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
Each mesh size gets the same packets PER DEVICE (the natural MC scaling:
more chips = more packets in the same wall time); eff = (pps / n_dev) /
pps_1dev.

The virtual devices TIME-SHARE the host cores, so weak scaling on this
box has a hard ceiling of eff <= cores / n_dev once n_dev > cores — the
curve reports that ceiling per point and eff_vs_ceiling = eff / ceiling,
which is the number that actually isolates driver+collective overhead
from host oversubscription (VERDICT r4 weak #3: "dispatch dominates"
must be a measurement, not an assertion).  It also instruments the
spatial-DD round: body-iteration cost vs the per-round
ppermute+psum+lockstep cost, measured by slope over two n_inner values
on a dead-lane chunk (no MC work, only the round skeleton).

Prints one JSON line.  Shape-only: absolute speed is CPU, not TPU.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# the session's sitecustomize imports jax with JAX_PLATFORMS=axon before
# this script runs, so the env var alone is too late (same dance as
# tests/conftest.py): force the config too, before any device use
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# persistent XLA compilation cache: the per-(driver, mesh-size) kernel
# compiles dominate this tool's runtime; cached, a rerun fits well
# inside bench.py's subprocess cap
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache_cpu"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sdd_iter_split(model, mesh, slab, n_dev, axis):
    """(sdd_us_per_iter, plain_us_per_iter) at a fixed 512-lane width
    with an unlimited budget: the sdd chunk adds one psum'd work counter
    (and, with rt on, the event ring) per kernel iteration — the
    difference against the plain per-device kernel is the
    collective+lockstep overhead the efficiency curve needs to explain
    (VERDICT r4 weak #3)."""
    import jax.numpy as jnp
    import numpy as np
    from mcfost_tpu import mc
    from mcfost_tpu.parallel import spatial as sp

    keys = jax.random.split(jax.random.PRNGKey(0), n_dev)
    budgets = jnp.full((n_dev,), 1_000_000_000, jnp.int32)
    totals = jnp.full((n_dev,), 1_000_000_000, jnp.int32)
    stops = jnp.full((n_dev,), -1, jnp.int32)

    def dead_state(b):
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (n_dev,) + a.shape),
            mc.thermal_mc.init_state(model, b, 10))

    def t_iters(n_iters):
        chunk = sp._spatial_mc_chunk(
            mesh, axis, n_dev, slab, n_iters=n_iters,
            pola=True, mono=False, rt=False, n_az_rt=45, mrw=True,
            mrw_gamma=2.0, jtally=False, scat_method=2, nabs_tally=False,
            dark=False, age_cap=100000)
        st = dead_state(512)
        st, wk = chunk(model, keys, st, budgets, totals, stops)
        float(np.asarray(st.xkj).sum())
        st = dead_state(512)
        t0 = time.time()
        st, wk = chunk(model, keys, st, budgets, totals, stops)
        float(np.asarray(st.xkj).sum())
        return time.time() - t0

    # two independent slope estimates; take the min (scheduler hiccups
    # only ever inflate a wall-clock difference)
    s1 = (t_iters(96) - t_iters(24)) / 72
    s2 = (t_iters(96) - t_iters(24)) / 72
    sdd_us = min(s1, s2) * 1e6

    # plain per-device kernel at the same width (no collectives)
    from mcfost_tpu.mc.thermal_mc import advance, init_state
    advance.clear_cache()

    def t_plain(n):
        st = init_state(model, 512)
        float(st.xkj.sum())
        t0 = time.time()
        st = advance(model, jax.random.PRNGKey(0), st, 1_000_000_000,
                     n_iters=n)
        float(st.xkj.sum())
        return time.time() - t0

    t_plain(96)
    plain_us = (t_plain(96) - t_plain(24)) / 72 * 1e6
    plain_us = max(plain_us, 0.0)
    if sdd_us < 0.25 * plain_us:
        # host oversubscription broke the slope (two timed runs landed
        # on opposite sides of a scheduler hiccup): report unusable
        # rather than a nonsense number
        return None, round(plain_us, 1)
    return round(sdd_us, 1), round(plain_us, 1)


def main():
    import numpy as np
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model
    from mcfost_tpu.parallel.mesh import make_mesh, run_thermal_mc_sharded
    from mcfost_tpu.parallel.spatial import run_thermal_mc_spatial, slab_size

    para = Para()
    para.grid.n_rad, para.grid.nz = 32, 20      # keep the CPU run tractable
    para.wavelengths.n_lambda = 16
    for sp in para.dust[0]:
        sp.n_grains = 16
    model, host = build_model(para, cache_dir=".mcfost_tpu_cache_cpu")

    n = 6000                                    # packets per device
    bpd = 2048
    devs = jax.devices()
    cores = os.cpu_count() or 1
    sizes = [s for s in (1, 2, 4, 8) if s <= len(devs)]
    ceiling = [round(min(1.0, cores / s), 3) for s in sizes]
    out = {"n_devices": sizes, "cpu_cores": cores, "core_ceiling": ceiling,
           "dp_pps": [], "dp_eff": [], "sdd_pps": [], "sdd_eff": [],
           "dp_eff_vs_ceiling": [], "sdd_eff_vs_ceiling": [],
           "sdd_round_split": []}
    for drv, pkey, ekey, vkey in (
            (run_thermal_mc_sharded, "dp_pps", "dp_eff",
             "dp_eff_vs_ceiling"),
            (run_thermal_mc_spatial, "sdd_pps", "sdd_eff",
             "sdd_eff_vs_ceiling")):
        base = None
        for i, s in enumerate(sizes):
            mesh = make_mesh(devs[:s])
            kw = dict(batch_per_device=bpd)
            n_s = n * s                 # weak scaling: packets/device fixed
            r = drv(model, jax.random.PRNGKey(1), n_s, mesh, **kw)
            jax.block_until_ready(r.sed)
            t0 = time.time()
            r = drv(model, jax.random.PRNGKey(1), n_s, mesh, **kw)
            jax.block_until_ready(r.sed)
            pps = int(r.emitted) / (time.time() - t0)
            print(f"# {pkey} s={s}: {pps:.0f} pps "
                  f"(warm+timed done t={time.time():.0f})", file=sys.stderr,
                  flush=True)
            if base is None:
                base = pps
            eff = pps / (base * s)
            out[pkey].append(round(pps, 1))
            out[ekey].append(round(eff, 3))
            out[vkey].append(round(eff / ceiling[i], 3))
            if drv is run_thermal_mc_spatial:
                slab = slab_size(model.grid.n_cells, s)
                sdd_us, plain_us = _sdd_iter_split(
                    model, mesh, slab, s, mesh.axis_names[0])
                print(f"# sdd split s={s}: sdd={sdd_us} plain={plain_us}",
                      file=sys.stderr, flush=True)
                out["sdd_round_split"].append(
                    {"n_devices": s, "sdd_us_per_iter": sdd_us,
                     "plain_us_per_iter": plain_us})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
