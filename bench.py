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

Instrumentation (VERDICT r3 items 1-3):
  * mrw_off_pps / mono_pps / mono_rt_pps — MRW-disabled, SED-mode and
    image-mode (RT1 tally on) throughput;
  * step_time_breakdown — per-iteration cost of the fused kernel and the
    marginal cost of its toggleable stages, measured subtractively at
    fixed batch/iterations with the warm executable reused (r3 measured
    recompiles here and reported compile time; n_iters is dynamic now);
  * mfu_est / hbm_gbps_est — XLA cost-analysis FLOPs and bytes of one
    kernel iteration over the measured iteration time, against nominal
    peak compute and HBM bandwidth;
  * voronoi — production-scale Voronoi throughput (150k particles /
    149k cells, the synthetic discF disk at bench-sized packet count);
  * sharding — packet-DP and spatial-DD drivers on a 1-device mesh vs
    the plain driver (driver overhead), plus a LIVE efficiency curve
    over a virtual 8-device CPU mesh (subprocess) reporting the host
    core ceiling, ceiling-normalized efficiencies and an instrumented
    sdd-vs-plain per-iteration split.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

# nominal peaks per device kind for MFU / roofline estimates
_PEAK_F32 = {
    "TPU v4": 137.5e12 / 2, "TPU v5e": 197e12 / 2, "TPU v5p": 229e12,
    "TPU v5 lite": 197e12 / 2, "TPU v6e": 918e12 / 2,
    "TPU v6 lite": 918e12 / 2,
}
_PEAK_HBM = {
    "TPU v4": 1.2e12, "TPU v5e": 0.819e12, "TPU v5 lite": 0.819e12,
    "TPU v5p": 2.765e12, "TPU v6e": 1.64e12, "TPU v6 lite": 1.64e12,
}


def _timed_run(fn, *args, **kw):
    r = fn(*args, **kw)
    import jax
    jax.block_until_ready(r.xkj)
    t0 = time.time()
    r = fn(*args, **kw)
    jax.block_until_ready(r.xkj)
    return r, time.time() - t0


def main():
    import jax
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model
    from mcfost_tpu.mc.thermal_mc import run_thermal_mc

    para = Para()   # ref4.1 defaults: 100x70 grid, 50 lambda, 100 grains
    model, host = build_model(para, cache_dir=".mcfost_tpu_cache")

    n = 128000      # ref4.1 thermal packet count (src/ref4.1.para:4)
    batch = 32768
    key = jax.random.PRNGKey(2)

    # headline: thermal MC, MRW on (production configuration)
    print("bench: model built", file=sys.stderr)
    res, dt = _timed_run(run_thermal_mc, model, jax.random.PRNGKey(1), n,
                         batch=batch, max_iters=500000)
    print("bench: headline done", file=sys.stderr)
    pps = int(res.emitted) / dt
    n_iters_dev = int(res.n_iters)

    # like-for-like vs the reference anchor (MRW off), and the
    # production observable modes: SED mono and image mono+RT1 tally
    r2, dt2 = _timed_run(run_thermal_mc, model, jax.random.PRNGKey(1), n,
                         batch=batch, max_iters=500000, mrw=False,
                         age_cap=200000)
    mrw_off_pps = int(r2.emitted) / dt2
    print("bench: mrw-off done", file=sys.stderr)

    import numpy as np
    pe = np.asarray(model.prob_e_cell)
    if float(pe[:, -1].max()) <= 0.0:
        C = model.grid.n_cells
        cdf = np.tile(np.linspace(0, 1, C + 1,
                                  dtype=pe.dtype), (model.n_lambda, 1))
        model_m = model._replace(prob_e_cell=jax.device_put(cdf))
    else:
        model_m = model
    r3, dt3 = _timed_run(run_thermal_mc, model_m, jax.random.PRNGKey(1), n,
                         batch=batch, max_iters=500000, mono=True,
                         mrw=False)
    mono_pps = int(r3.emitted) / dt3
    print("bench: mono done", file=sys.stderr)
    r4, dt4 = _timed_run(run_thermal_mc, model_m, jax.random.PRNGKey(1), n,
                         batch=batch, max_iters=500000, mono=True,
                         mrw=False, rt=True, n_az_rt=45)
    mono_rt_pps = int(r4.emitted) / dt4
    print("bench: mono-rt done", file=sys.stderr)

    # ---- step-time breakdown (subtractive, fixed batch/iterations,
    # warm executable reused — n_iters is dynamic)
    sys.path.insert(0, "tools")
    from profile_kernel import time_iters
    iters = 400
    t_base = time_iters(model, key, batch, iters)
    print("bench: breakdown base done", file=sys.stderr)
    t_nopola = time_iters(model, key, batch, iters, pola=False)
    t_nomrw = time_iters(model, key, batch, iters, mrw=False)
    t_rt = time_iters(model, key, batch, iters, rt=True, n_az_rt=45)
    t_j = time_iters(model, key, batch, iters, jtally=True)
    breakdown = {
        "iter_us": round(t_base * 1e6, 1),
        "stokes_scatter_us": round((t_base - t_nopola) * 1e6, 1),
        "mrw_machinery_us": round((t_base - t_nomrw) * 1e6, 1),
        "rt1_tally_extra_us": round((t_rt - t_base) * 1e6, 1),
        "jtally_extra_us": round((t_j - t_base) * 1e6, 1),
    }

    # ---- MFU / HBM roofline from XLA cost analysis of one iteration
    mfu = None
    hbm_frac = None
    try:
        from mcfost_tpu.mc.thermal_mc import advance, init_state
        lowered = advance.lower(model, key, init_state(model, batch),
                                2_000_000_000, n_iters=1)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_it = float(ca.get("flops", 0.0))
        bytes_it = float(ca.get("bytes accessed", 0.0))
        kind = jax.devices()[0].device_kind
        peak = next((v for k, v in _PEAK_F32.items()
                     if kind.lower().startswith(k.lower())), None)
        bw = next((v for k, v in _PEAK_HBM.items()
                   if kind.lower().startswith(k.lower())), None)
        if peak and flops_it > 0:
            mfu = round(flops_it / t_base / peak, 5)
        if bw and bytes_it > 0:
            hbm_frac = round(bytes_it / t_base / bw, 3)
    except Exception:
        pass

    # ---- production-scale Voronoi throughput (VERDICT r4 next #6):
    # the 150k-particle synthetic discF disk (the real CI dump is 1.5e6
    # particles), thermal MC at a bench-sized packet count.  The
    # tessellation + model caches live in .mcfost_tpu_cache, so after
    # the first build this costs the MC run plus ~1 min of cache loads.
    voronoi = None
    try:
        sys.path.insert(0, "tests")
        from test_fixtures import _synth_phantom_dump
        from mcfost_tpu.config.para import read_para
        from mcfost_tpu.io.phantom import read_phantom
        vdump = os.path.join(".mcfost_tpu_cache", "bench_discF_150k")
        os.makedirs(".mcfost_tpu_cache", exist_ok=True)
        if not os.path.isfile(vdump):
            _synth_phantom_dump(vdump, n=150000)
        vpara = read_para("/root/reference/test_suite/test_data/"
                          "discF_00500/discF_00500.para")
        vpara.not_random_voronoi = True
        vmodel, vhost = build_model(vpara, cache_dir=".mcfost_tpu_cache",
                                    sph=read_phantom(vdump))
        rv, dtv = _timed_run(run_thermal_mc, vmodel,
                             jax.random.PRNGKey(1), 500000, batch=12288,
                             max_iters=500000, mrw=False)
        voronoi = {"n_cells": int(vmodel.grid.n_cells),
                   "voronoi_pps": round(int(rv.emitted) / dtv, 1)}
        print("bench: voronoi done", file=sys.stderr)
    except Exception as e:
        print(f"bench: voronoi skipped ({type(e).__name__})",
              file=sys.stderr)

    # ---- sharded drivers on this chip (1-device mesh: driver overhead)
    from mcfost_tpu.parallel.mesh import make_mesh, run_thermal_mc_sharded
    from mcfost_tpu.parallel.spatial import run_thermal_mc_spatial
    mesh1 = make_mesh(jax.devices()[:1])
    rs, dts = _timed_run(run_thermal_mc_sharded, model,
                         jax.random.PRNGKey(1), n, mesh1,
                         batch_per_device=batch)
    dp_pps = int(rs.emitted) / dts
    print("bench: sharded dp done", file=sys.stderr)
    rsp, dtsp = _timed_run(run_thermal_mc_spatial, model,
                           jax.random.PRNGKey(1), n, mesh1,
                           batch_per_device=batch, n_inner=64)
    sdd_pps = int(rsp.emitted) / dtsp
    print("bench: spatial dd done", file=sys.stderr)

    # ---- multi-device efficiency curve on a virtual CPU mesh
    # (subprocess: this process owns the TPU).  Shape-only: CPU device
    # speeds differ, but the curve exposes collective/driver scaling.
    # The curve is capped well inside any outer bench budget; a timed-out
    # or failed run falls back to the last committed curve so the JSON
    # line always carries one.
    curve = None
    curve_cache = ".bench_curve.json"
    try:
        out = subprocess.run(
            [sys.executable, "tools/scaling_curve.py"],
            capture_output=True, text=True, timeout=480,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()})
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                curve = json.loads(line)
        if curve is not None:
            with open(curve_cache, "w") as f:
                json.dump(curve, f)
    except Exception:
        pass
    if curve is None and os.path.exists(curve_cache):
        try:
            curve = json.load(open(curve_cache))
            curve["cached"] = True
        except Exception:
            pass

    print(json.dumps({
        "metric": "thermal_mc_packets_per_s",
        "value": round(pps, 1),
        "unit": "packets/s/chip",
        "vs_baseline": round(pps / 1000.0, 2),
        "mrw_off_pps": round(mrw_off_pps, 1),
        "mrw_off_vs_baseline": round(mrw_off_pps / 1000.0, 2),
        "mono_pps": round(mono_pps, 1),
        "mono_rt_pps": round(mono_rt_pps, 1),
        "kernel_iters_headline": n_iters_dev,
        "step_time_breakdown": breakdown,
        "mfu_est": mfu,
        "hbm_roof_frac": hbm_frac,
        "voronoi": voronoi,
        "sharding": {
            "dp_1dev_pps": round(dp_pps, 1),
            "dp_1dev_eff": round(dp_pps / pps, 3),
            "spatial_dd_1dev_pps": round(sdd_pps, 1),
            "spatial_dd_1dev_eff": round(sdd_pps / pps, 3),
        },
        "efficiency_curve": curve,
    }))


if __name__ == "__main__":
    main()
