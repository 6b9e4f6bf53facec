#!/usr/bin/env python
"""Driver benchmark: thermal MC packets/s on the ref4.1 disk model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference's published scaling table implies ~1e3
packets/s/core for the full thermal+SED run on a 2014 Xeon
(BASELINE.md: 1.28e5 thermal packets within a 141 s single-thread run).
vs_baseline = packets_per_s / 1000.
"""
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model
    from mcfost_tpu.mc.thermal_mc import run_thermal_mc

    para = Para()   # ref4.1 defaults: 100x70 grid, 50 lambda, 100 grains
    model, host = build_model(para, cache_dir=".mcfost_tpu_cache")

    n = 128000      # ref4.1 thermal packet count (src/ref4.1.para:4)
    batch = 32768
    # compile + warmup (excluded from timing): the tail-compaction ladder
    # means three batch sizes get compiled; prewarm all of them
    from mcfost_tpu.mc.thermal_mc import advance, init_state, _compact
    for b in (batch, 1024, 128):
        st = advance(model, jax.random.PRNGKey(0), init_state(model, b),
                     0, n_iters=2000)
        jax.block_until_ready(st.xkj)
    for b_from, b_to in ((batch, 1024), (batch, 128), (1024, 128)):
        st = _compact(init_state(model, b_from), b_to)
        jax.block_until_ready(st.xkj)
    r = run_thermal_mc(model, jax.random.PRNGKey(0), 2000, batch=batch,
                       max_iters=500000)
    r.xkj.block_until_ready()

    t0 = time.time()
    res = run_thermal_mc(model, jax.random.PRNGKey(1), n, batch=batch,
                         max_iters=500000)
    res.xkj.block_until_ready()
    dt = time.time() - t0
    pps = int(res.emitted) / dt

    print(json.dumps({
        "metric": "thermal_mc_packets_per_s",
        "value": round(pps, 1),
        "unit": "packets/s/chip",
        "vs_baseline": round(pps / 1000.0, 2),
    }))


if __name__ == "__main__":
    main()
