#!/usr/bin/env python
"""Subtractive ablation profile of the fused MC kernel on the real TPU.

Each MCFOST_TPU_ABLATE knob statically removes one block from the trace;
the time delta vs the base run is that block's cost.  Used to direct the
round-4 performance work (VERDICT r3 item 1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def time_iters(model, key, B, iters, warm_iters=None, reps=2, **flags):
    """Seconds per kernel iteration, compile and dispatch excluded.

    Methodology notes (hard-won):
    * n_iters is a DYNAMIC argument of `advance` so all calls share one
      executable — an earlier version warmed with a different static
      n_iters, recompiled inside the timed region, and reported compile
      time as step time (r3's entire step_time_breakdown had that
      artifact);
    * completion is forced by a dependent scalar READBACK — on the
      tunnelled axon backend, block_until_ready on a donated output can
      return before the computation finishes;
    * the per-iteration cost is the SLOPE between a short and a long
      run, cancelling the per-call dispatch + readback constant."""
    from mcfost_tpu.mc.thermal_mc import advance, init_state
    advance.clear_cache()
    init_kw = dict(rt=flags.get("rt", False), jtally=flags.get("jtally", False),
                   mono=flags.get("mono", False))
    n_short = max(iters // 4, 10)

    def run(n):
        st = init_state(model, B, **init_kw)
        float(st.xkj.sum())
        t0 = time.time()
        st = advance(model, key, st, 2_000_000_000, n_iters=n, **flags)
        float(st.xkj.sum())
        return time.time() - t0

    run(iters)                      # compile + warm
    best = float("inf")
    for _ in range(reps):
        t_short = run(n_short)
        t_long = run(iters)
        best = min(best, (t_long - t_short) / (iters - n_short))
    return best


def main():
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model

    para = Para()
    model, host = build_model(para, cache_dir=".mcfost_tpu_cache")
    key = jax.random.PRNGKey(0)
    B = 32768
    iters = 200

    def run(name, abl, mdl=None, **flags):
        os.environ["MCFOST_TPU_ABLATE"] = abl
        t = time_iters(mdl if mdl is not None else model, key, B, iters,
                       **flags)
        print(f"{name:28s} abl={abl or '-':12s} {t*1e6:9.1f} us/iter",
              flush=True)
        return t

    t_base = run("thermal base", "")
    for abl in ("rng", "emit", "starkill", "nodense", "cellgather",
                "xkjgather", "xkjscatter", "cross", "sed", "scatsample",
                "reemit"):
        t = run("thermal", abl)
        print(f"   -> delta {(t_base - t)*1e6:+9.1f} us", flush=True)

    t_rt = run("thermal+rt1", "", rt=True, n_az_rt=45)
    print(f"   -> rt1 extra {(t_rt - t_base)*1e6:+9.1f} us", flush=True)
    t = run("thermal+rt1", "rtscatter", rt=True, n_az_rt=45)
    print(f"   -> rt scatter {(t_rt - t)*1e6:+9.1f} us", flush=True)

    # mono mode (disk CDF needed)
    import numpy as np
    pe = np.asarray(model.prob_e_cell)
    C = model.grid.n_cells
    cdf = np.tile(np.linspace(0, 1, C + 1, dtype=pe.dtype),
                  (model.n_lambda, 1))
    model_m = model._replace(prob_e_cell=jax.device_put(cdf))
    t_mono = run("mono base", "", mdl=model_m, mono=True, mrw=False)
    for abl in ("emit", "sed", "scatsample"):
        t = run("mono", abl, mdl=model_m, mono=True, mrw=False)
        print(f"   -> delta {(t_mono - t)*1e6:+9.1f} us", flush=True)
    os.environ["MCFOST_TPU_ABLATE"] = ""


if __name__ == "__main__":
    main()
