#!/usr/bin/env python
"""Driver benchmark: thermal MC packets/s on the ref4.1 disk model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline anchor: the reference's published scaling table implies ~1e3
packets/s/core for the full thermal+SED run on a 2014 Xeon
(BASELINE.md: 1.28e5 thermal packets within a 141 s single-thread run).
vs_baseline = packets_per_s / 1000.  NB the anchor run has MRW disabled
(the reference wires but disables it, dust_transfer.f90:1024-1041), so
the like-for-like comparison is ``mrw_off_pps`` below; the headline
keeps MRW on because that is this framework's production configuration.

Extra instrumentation (VERDICT r2 item 7):
  * mrw_off_pps / mono_pps — MRW-disabled and SED/image-mode throughput;
  * step_time_breakdown — per-iteration cost of the fused kernel and the
    marginal cost of its toggleable stages (Stokes update, MRW machinery,
    RT1 scattered-intensity tally, per-lambda J tally), measured
    subtractively at fixed batch/iterations;
  * mfu_est — XLA cost-analysis FLOPs of one kernel iteration over the
    measured iteration time, against the chip's nominal peak;
  * sharding on/off — packet-DP and spatial-DD drivers on a 1-device
    mesh relative to the plain driver (single-chip overhead; true
    multi-chip scaling is exercised on the 8-device CPU mesh in
    tests/test_spatial.py and by the driver's dryrun_multichip).
"""
import json
import sys
import time

sys.path.insert(0, ".")

# nominal peak FLOP/s (f32 on the MXU) per device kind, for the MFU
# estimate; unknown kinds report mfu_est = None
_PEAK_F32 = {
    "TPU v4": 137.5e12 / 2, "TPU v5e": 197e12 / 2, "TPU v5p": 229e12,
    "TPU v5 lite": 197e12 / 2, "TPU v6e": 918e12 / 2, "TPU v6 lite": 918e12 / 2,
}


def _fresh_state(model, B, **kw):
    from mcfost_tpu.mc.thermal_mc import init_state
    return init_state(model, B, **kw)


def _time_iters(model, key, B, iters, warm_iters=50, **flags):
    """Wall-time `iters` full-width kernel iterations (budget kept
    unbounded so refill holds every lane live); returns seconds/iter."""
    import jax
    from mcfost_tpu.mc.thermal_mc import advance
    kw = dict(n_iters=warm_iters, **flags)
    init_kw = dict(rt=flags.get("rt", False),
                   jtally=flags.get("jtally", False))
    st = advance(model, key, _fresh_state(model, B, **init_kw),
                 2_000_000_000, **kw)           # compile + warm
    jax.block_until_ready(st.xkj)
    kw["n_iters"] = iters
    st = _fresh_state(model, B, **init_kw)
    t0 = time.time()
    st = advance(model, key, st, 2_000_000_000, **kw)
    jax.block_until_ready(st.xkj)
    return (time.time() - t0) / iters


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

    key = jax.random.PRNGKey(2)

    # ---- MRW-off (like-for-like vs the reference anchor) and mono/SED
    t0 = time.time()
    r2 = run_thermal_mc(model, jax.random.PRNGKey(1), n, batch=batch,
                        max_iters=500000, mrw=False, age_cap=200000)
    r2.xkj.block_until_ready()
    mrw_off_pps = int(r2.emitted) / (time.time() - t0)

    import numpy as np
    pe = np.asarray(model.prob_e_cell)
    if float(pe[:, -1].max()) <= 0.0:
        # mono needs a disk-emission CDF; reuse the thermal tally shape
        # with a uniform per-cell CDF (throughput measure only)
        C = model.grid.n_cells
        cdf = np.tile(np.linspace(0, 1, C + 1,
                                  dtype=pe.dtype), (model.n_lambda, 1))
        model_m = model._replace(prob_e_cell=jax.device_put(cdf))
    else:
        model_m = model
    t0 = time.time()
    r3 = run_thermal_mc(model_m, jax.random.PRNGKey(1), n, batch=batch,
                        max_iters=500000, mono=True, mrw=False)
    r3.sed.block_until_ready()
    mono_pps = int(r3.emitted) / (time.time() - t0)

    # ---- step-time breakdown (subtractive, fixed width/iterations)
    iters = 200
    t_base = _time_iters(model, key, batch, iters)
    t_nopola = _time_iters(model, key, batch, iters, pola=False)
    t_nomrw = _time_iters(model, key, batch, iters, mrw=False)
    t_rt = _time_iters(model, key, batch, iters, rt=True, n_az_rt=45)
    t_j = _time_iters(model, key, batch, iters, jtally=True)
    breakdown = {
        "iter_us": round(t_base * 1e6, 1),
        "stokes_scatter_us": round((t_base - t_nopola) * 1e6, 1),
        "mrw_machinery_us": round((t_base - t_nomrw) * 1e6, 1),
        "rt1_tally_extra_us": round((t_rt - t_base) * 1e6, 1),
        "jtally_extra_us": round((t_j - t_base) * 1e6, 1),
    }

    # ---- MFU estimate from XLA cost analysis of one compiled iteration
    mfu = None
    try:
        lowered = advance.lower(model, key, init_state(model, batch),
                                2_000_000_000, n_iters=1)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_it = float(ca.get("flops", 0.0))
        kind = jax.devices()[0].device_kind
        peak = next((v for k, v in _PEAK_F32.items()
                     if kind.lower().startswith(k.lower())), None)
        if peak and flops_it > 0:
            mfu = round(flops_it / t_base / peak, 4)
    except Exception:
        pass

    # ---- sharding on/off on this chip (1-device mesh overheads)
    from mcfost_tpu.parallel.mesh import make_mesh, run_thermal_mc_sharded
    from mcfost_tpu.parallel.spatial import run_thermal_mc_spatial
    mesh1 = make_mesh(jax.devices()[:1])
    rs = run_thermal_mc_sharded(model, jax.random.PRNGKey(1), 2000, mesh1,
                                batch_per_device=batch)
    jax.block_until_ready(rs.xkj)
    t0 = time.time()
    rs = run_thermal_mc_sharded(model, jax.random.PRNGKey(1), n, mesh1,
                                batch_per_device=batch)
    jax.block_until_ready(rs.xkj)
    dp_pps = int(rs.emitted) / (time.time() - t0)
    rsp = run_thermal_mc_spatial(model, jax.random.PRNGKey(1), 2000, mesh1,
                                 batch_per_device=batch, n_inner=64)
    jax.block_until_ready(rsp.xkj)
    t0 = time.time()
    rsp = run_thermal_mc_spatial(model, jax.random.PRNGKey(1), n, mesh1,
                                 batch_per_device=batch, n_inner=64)
    jax.block_until_ready(rsp.xkj)
    sdd_pps = int(rsp.emitted) / (time.time() - t0)

    print(json.dumps({
        "metric": "thermal_mc_packets_per_s",
        "value": round(pps, 1),
        "unit": "packets/s/chip",
        "vs_baseline": round(pps / 1000.0, 2),
        "mrw_off_pps": round(mrw_off_pps, 1),
        "mrw_off_vs_baseline": round(mrw_off_pps / 1000.0, 2),
        "mono_pps": round(mono_pps, 1),
        "step_time_breakdown": breakdown,
        "mfu_est": mfu,
        "sharding": {
            "dp_1dev_pps": round(dp_pps, 1),
            "dp_1dev_eff": round(dp_pps / pps, 3),
            "spatial_dd_1dev_pps": round(sdd_pps, 1),
            "spatial_dd_1dev_eff": round(sdd_pps / pps, 3),
        },
    }))


if __name__ == "__main__":
    main()
