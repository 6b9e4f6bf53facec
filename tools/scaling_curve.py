#!/usr/bin/env python
"""Packet-DP and spatial-DD WEAK-scaling efficiency on a virtual CPU mesh.

Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
Each mesh size gets the same packets PER DEVICE (the natural MC scaling:
more chips = more packets in the same wall time); eff = (pps / n_dev) /
pps_1dev.  Prints one JSON line {"n_devices", "dp_pps", "dp_eff",
"sdd_pps", "sdd_eff"}.  Shape-only: absolute speed is CPU, not TPU.
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

# persistent XLA compilation cache: the 8 (driver, mesh-size) kernel
# compiles dominate this tool's runtime; cached, a rerun fits well
# inside bench.py's 240 s subprocess cap
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache_cpu"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import numpy as np
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model
    from mcfost_tpu.parallel.mesh import make_mesh, run_thermal_mc_sharded
    from mcfost_tpu.parallel.spatial import run_thermal_mc_spatial

    para = Para()
    para.grid.n_rad, para.grid.nz = 32, 20      # keep the CPU run tractable
    para.wavelengths.n_lambda = 16
    for sp in para.dust[0]:
        sp.n_grains = 16
    model, host = build_model(para, cache_dir=".mcfost_tpu_cache_cpu")

    n = 8000
    bpd = 2048
    devs = jax.devices()
    sizes = [s for s in (1, 2, 4, 8) if s <= len(devs)]
    out = {"n_devices": sizes, "dp_pps": [], "dp_eff": [],
           "sdd_pps": [], "sdd_eff": []}
    for drv, pkey, skey in (
            (run_thermal_mc_sharded, "dp_pps", "dp_eff"),
            (run_thermal_mc_spatial, "sdd_pps", "sdd_eff")):
        base = None
        for s in sizes:
            mesh = make_mesh(devs[:s])
            kw = dict(batch_per_device=bpd)
            if drv is run_thermal_mc_spatial:
                kw["n_inner"] = 24
            n_s = n * s                 # weak scaling: packets/device fixed
            r = drv(model, jax.random.PRNGKey(1), n_s, mesh, **kw)
            jax.block_until_ready(r.sed)
            t0 = time.time()
            r = drv(model, jax.random.PRNGKey(1), n_s, mesh, **kw)
            jax.block_until_ready(r.sed)
            pps = int(r.emitted) / (time.time() - t0)
            if base is None:
                base = pps
            out[pkey].append(round(pps, 1))
            out[skey].append(round(pps / (base * s), 3))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
