"""Fused thermal Monte Carlo kernel (Bjorkman & Wood immediate reemission).

TPU-native re-design of the reference's packet loop (propagate_packet,
src/dust_transfer.f90:957-1211 + physical_length, optical_depth.f90:21-182):
instead of per-photon recursion, a fixed-width SoA batch of packets advances
in lock-step inside one ``lax.while_loop``.  Each iteration performs, fully
masked and branch-free, for every lane:

1. refill: dead lanes are re-emitted from the source CDFs while the photon
   budget lasts (replaces the OpenMP dynamic packet loop,
   dust_transfer.f90:563-603);
2. one cell-wall crossing (`cross_cell`) with optical-depth bookkeeping and
   the kappa*J path-length tally as a scatter-add (save_radiation_field,
   radiation_field.f90:31-55);
3. exit capture into the MC SED bins (capteur, output.f90:294-395);
4. interaction: Mie/HG scattering with Stokes update, or absorption with
   immediate reemission at a wavelength drawn from the temperature-corrected
   kappa dB/dT CDF (im_reemission_LTE, thermal_emission.f90:710-771).

All CDF inversions are explicit batched bisections (see mc/sampling.py).
The per-device tally arrays mirror the reference's per-thread tallies
(xKJ_abs, sed) and are psum-reduced across devices by the caller.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..grids import geometry as cyl
from .model import Model
from .sampling import bisect_cdf, cdapres, isotropic_direction, update_stokes


class MCState(NamedTuple):
    x: jax.Array; y: jax.Array; z: jax.Array
    u: jax.Array; v: jax.Array; w: jax.Array
    sI: jax.Array; sQ: jax.Array; sU: jax.Array; sV: jax.Array
    ilam: jax.Array            # (B,) i32
    ri: jax.Array; zj: jax.Array
    tau_rem: jax.Array
    alive: jax.Array           # (B,) bool
    fstar: jax.Array           # (B,) bool: packet emitted by a star
    fscat: jax.Array           # (B,) bool: packet has scattered
    emitted: jax.Array         # scalar i32
    nkill: jax.Array           # scalar i32: lanes killed by the age cap
    xkj: jax.Array             # (n_cells,) kappa*J path tally
    xj: jax.Array              # (L*n_cells,) per-lambda path tally
                               # (xJ_abs, radiation_field.f90:20) or (1,)
    nabs: jax.Array            # (n_cells,) absorption counts
    sed: jax.Array             # (L, n_capt, 8) MC SED: I,Q,U,V + 4 contribs
    xi: jax.Array              # RT tally, 2-D row-window layout:
                               # RT1 (L*C*n_az_rt*2, nRT*6) or
                               # RT2 (L*C*(n_theta_I*n_phi_I+1), 6) or
                               # (1, 1).  Row-indexed scatter-adds are
                               # ~6x faster than flat elementwise ones
                               # inside the while_loop; a trailing
                               # (nRT, 6) PAIR would tile-pad 28x on TPU
    age: jax.Array             # (B,) i32 iterations since lane emission
    it: jax.Array              # scalar i32
    ocell: jax.Array           # (B,) i32 origin cell (-1 star/ISM); only
                               # meaningful when the origin tally is on
    nsent: jax.Array           # (L,) packets emitted per lambda (mono
                               # received-budget mode) or (1,)
    orig: jax.Array            # (L*(C+1),) escaped energy by origin cell
                               # (slot C = star/ISM) — write_origin
                               # (output.f90:1366-1420) — or (1,)
    fe: jax.Array              # (Ef, 3+nRT*6) staged foreign RT events
                               # under rt_slab sharding, or (1, 1)
    fe_n: jax.Array            # scalar i32: valid rows in fe
    fe_lost: jax.Array         # scalar i32: foreign events dropped on
                               # fe overflow (0 in sane configs)


class MCResult(NamedTuple):
    xkj: jax.Array
    nabs: jax.Array
    sed: jax.Array
    emitted: jax.Array
    n_iters: jax.Array
    n_lost: jax.Array          # lanes still alive at the iteration cap
    xi: jax.Array = None       # RT1 tally when rt was enabled
    xj: jax.Array = None       # per-lambda J tally when jtally was enabled
    orig: jax.Array = None     # origin tally when origin was enabled
    nsent: jax.Array = None    # per-lambda emitted counts (mono mode)


def _emit(model: Model, rands, dtype, lam_forced=None, disk: bool = True):
    """Draw fresh packets for every lane (masked-in by the caller).

    Emission physics: wavelength from the global emission CDF
    (select_wl_em, thermal_emission.f90:364-400); star vs disk by
    frac_E_stars (emit_packet, dust_transfer.f90:876-944); star packets
    launched from the stellar surface with cosine-law directions
    (emit_packet_uniform_sphere, stars.f90:108-169).

    disk=False (thermal step): prob_e_cell is all zeros, so the disk
    branch is statically elided — it would otherwise cost a 14-step
    bisection over n_cells every iteration for nothing."""
    r_lam, r_sd, r1, r2, r3, r4, r5, r6 = rands
    L = model.n_lambda

    if lam_forced is None:
        ilam = _inv_cdf(model.emission_cdf, r_lam)
    else:
        ilam = lam_forced

    from_star = r_sd <= model.frac_e_stars[ilam]

    # --- star emission (single- or multi-star via cdf_star)
    S = model.star_r.shape[0]
    zn = 2.0 * r2 - 1.0
    srw = jnp.sqrt(jnp.maximum(1.0 - zn * zn, 0.0))
    arg = jnp.pi * (2.0 * r3 - 1.0)
    nx, ny, nz = srw * jnp.cos(arg), srw * jnp.sin(arg), zn
    if model.limb_mu_inv is not None:
        # limb-darkened exit cosine from the tabulated inverse CDF
        # (reference -limb_darkening, stars.f90 psi draw)
        nt = model.limb_mu_inv.shape[0]
        cospsi = model.limb_mu_inv[
            jnp.clip((r4 * nt).astype(jnp.int32), 0, nt - 1)]
    else:
        cospsi = jnp.sqrt(r4)
    phi = 2.0 * jnp.pi * r5
    us, vs, ws = cdapres(cospsi, phi, nx, ny, nz)
    # -spot: packets emitted inside the spot cap carry the Planck
    # intensity ratio as weight (dust_transfer.f90:896-921; star 1 only,
    # like the reference)
    if model.spot_corr is not None:
        in_spot = (nx * model.spot_dir[0] + ny * model.spot_dir[1]
                   + nz * model.spot_dir[2]) > model.spot_cos
        w_emit = jnp.where(from_star & in_spot,
                           _fg(model.spot_corr, ilam), 1.0)
    else:
        w_emit = jnp.ones_like(r_lam)
    if S == 1:
        rs = model.star_r[0] * (1.0 + 1e-6)
        xs = nx * rs + model.star_pos[0, 0]
        ys = ny * rs + model.star_pos[0, 1]
        zs = nz * rs + model.star_pos[0, 2]
    else:
        i_star = bisect_cdf(
            lambda k: _fg(model.cdf_star, ilam * (S + 1) + k), S, r1) - 1
        rs = model.star_r[i_star] * (1.0 + 1e-6)
        xs = nx * rs + _fg(model.star_pos, i_star * 3 + 0)
        ys = ny * rs + _fg(model.star_pos, i_star * 3 + 1)
        zs = nz * rs + _fg(model.star_pos, i_star * 3 + 2)

    if not disk:
        ri, zj = cyl.index_cell(model.grid, xs, ys, zs)
        valid = jnp.ones_like(from_star)
        if model.frac_e_ism is not None:
            # ISM packets: uniform point on the R_ISM sphere, inward
            # cosine-law direction, advanced to the grid boundary
            # (emit_packet_ISM, stars.f90:728-785); packets missing the
            # model count as emitted-and-escaped like the reference's
            # lintersect=false branch
            from_ism = (~from_star) \
                & (r_sd <= model.frac_e_stars[ilam]
                   + model.frac_e_ism[ilam])
            ui, vi, wi = cdapres(-jnp.sqrt(r4), phi, nx, ny, nz)
            xi0 = nx * model.r_ism
            yi0 = ny * model.r_ism
            zi0 = nz * model.r_ism
            xg, yg, zg, rig, zjg, hit = cyl.move_to_grid(
                model.grid, xi0, yi0, zi0, ui, vi, wi)
            xs = jnp.where(from_ism, xg, xs)
            ys = jnp.where(from_ism, yg, ys)
            zs = jnp.where(from_ism, zg, zs)
            us = jnp.where(from_ism, ui, us)
            vs = jnp.where(from_ism, vi, vs)
            ws = jnp.where(from_ism, wi, ws)
            ri = jnp.where(from_ism, rig, ri)
            zj = jnp.where(from_ism, zjg, zj)
            valid = jnp.where(from_ism, hit, valid)
            return (xs, ys, zs, us, vs, ws, ilam.astype(jnp.int32),
                    ri, zj, ~from_ism, valid, w_emit,
                    jnp.full_like(ilam, -1, jnp.int32))
        return (xs, ys, zs, us, vs, ws, ilam.astype(jnp.int32),
                ri, zj, jnp.ones_like(from_star), valid, w_emit,
                jnp.full_like(ilam, -1, jnp.int32))

    # --- disk thermal emission (SED/image steps; prob_e_cell is zeros in
    # step 1 so this branch is statically elided then).  The per-lambda
    # cell draw (select_cellule, thermal_emission.f90:2044) inverts the
    # (L, C+1) CDF in TWO dense levels — chunk then cell-within-chunk —
    # each a one-hot matmul + compare; the former 14-step serialized
    # bisection over the flat table cost ~60 ms/iteration at B=32k
    # (bench §profile: the whole mono-mode slowdown).
    n_cells = model.volume.shape[0]
    L_ = model.n_lambda
    cdf = model.prob_e_cell                     # (L, C+1)
    G = 128 if n_cells <= 16384 else 512
    H = -(-n_cells // G)
    bnd = jnp.minimum(jnp.arange(H + 1) * G, n_cells)
    hi_cdf = cdf[:, bnd]                        # (L, H+1), loop-invariant
    gidx = jnp.minimum(bnd[:-1, None] + jnp.arange(G + 1)[None, :],
                       n_cells)
    lo_raw = cdf[:, gidx]                       # (L, H, G+1)
    den = jnp.maximum(lo_raw[..., -1:] - lo_raw[..., :1], 1e-30)
    lo_cdf = ((lo_raw - lo_raw[..., :1]) / den).reshape(L_ * H, G + 1)
    oh_lam_d = _one_hot(ilam, L_, dtype)        # (B, L)
    hrows = oh_lam_d @ hi_cdf                   # (B, H+1)
    hi = _inv_cdf_rows(hrows, r1) - 1           # chunk in [0, H-1]
    oh_hi = _one_hot(hi, H + 1, dtype)
    c_lo = jnp.sum(oh_hi * hrows, axis=1)
    oh_hi1 = _one_hot(hi + 1, H + 1, dtype)
    c_hi = jnp.sum(oh_hi1 * hrows, axis=1)
    r_lo = jnp.clip((r1 - c_lo) / jnp.maximum(c_hi - c_lo, 1e-30),
                    0.0, 1.0)
    oh_lh = _one_hot(ilam * H + hi, L_ * H, dtype)
    lrows = oh_lh @ lo_cdf                      # (B, G+1)
    lo = _inv_cdf_rows(lrows, r_lo) - 1
    icell_d = jnp.clip(hi * G + lo, 0, n_cells - 1)
    ri_d, zj_d = cyl.cell_from_flat(model.grid, icell_d)
    xd, yd, zd = cyl.pos_in_cell(model.grid, ri_d, zj_d, r2, r3, r4)
    ud, vd, wd = isotropic_direction(r5, r6)

    x = jnp.where(from_star, xs, xd)
    y = jnp.where(from_star, ys, yd)
    z = jnp.where(from_star, zs, zd)
    u = jnp.where(from_star, us, ud)
    v = jnp.where(from_star, vs, vd)
    w = jnp.where(from_star, ws, wd)
    ri, zj = cyl.index_cell(model.grid, x, y, z)
    ri = jnp.where(from_star, ri, ri_d.astype(jnp.int32))
    zj = jnp.where(from_star, zj, zj_d.astype(jnp.int32))
    return (x, y, z, u, v, w, ilam.astype(jnp.int32), ri, zj, from_star,
            jnp.ones_like(from_star), w_emit,
            jnp.where(from_star, -1, icell_d.astype(jnp.int32)))


def _tau_draw(r):
    """Optical-depth target (dust_transfer.f90:1010-1017)."""
    r = jnp.clip(r, 0.0, 1.0 - 1e-7)
    return jnp.where(r > 1e-6, -jnp.log1p(-r), r)


def _hash32(x):
    """murmur3-style 32-bit finalizer (avalanching integer hash)."""
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
    return x ^ (x >> jnp.uint32(16))


def _iter_randoms(key, it, n, B, dtype):
    """(n, B) uniforms in [0, 1) for one MC iteration.

    Counter-based and stateless per (key, iteration) like the threefry
    fold_in it replaces, but through ``lax.rng_bit_generator`` — the XLA
    native generator costs ~0.3 ms where ``jax.random.uniform``'s threefry
    costs 6.3 ms/iteration at B=32k on a v5e (bench §profile; the RNG was
    the single largest block of the fused kernel).

    CRITICAL: the u32[4] state passed to rng_bit_generator contains the
    COUNTER as well as the key, so consecutive iteration numbers placed
    verbatim in one word produce overlapping (shifted) bit streams —
    heavy inter-iteration correlations that biased the MC SED by ~10%
    until every word was avalanche-hashed per iteration (overlap
    probability falls to ~2^-46 per pair)."""
    kd = key
    if jnp.issubdtype(kd.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(kd)
    kd = kd.astype(jnp.uint32).reshape(-1)
    itu = it.astype(jnp.uint32)
    rkey = jnp.stack([kd[0] ^ _hash32(itu + jnp.uint32(0x1234567)),
                      kd[-1] ^ _hash32(itu + jnp.uint32(0x89ABCDE)),
                      _hash32(itu + jnp.uint32(0xDEADBEE)),
                      _hash32(itu) ^ jnp.uint32(0x9E3779B9)])
    _, bits = jax.lax.rng_bit_generator(rkey, (n, B), dtype=jnp.uint32)
    return (bits >> jnp.uint32(8)).astype(dtype) * (1.0 / (1 << 24))


def _fg(tab, lin):
    """Flat gather: tab.reshape(-1)[lin].

    TPU perf note: XLA lowers a gather with *multiple* dynamic index
    vectors (tab[row, col]) ~50x slower than a single-vector 1D gather;
    every dynamic table lookup in the hot loop goes through here with a
    precomputed linear index."""
    return tab.reshape(-1)[lin]


# --------------------------------------------------------------------------
# Dense (gather-free) sampling primitives.
#
# A TPU gather/scatter over B random indices serializes to ~11 ns/lane
# (~360 us at B=32768), while dense compares and small matmuls stream at
# VPU/MXU speed — measured ~100x faster for the table sizes in this loop
# (L ~ 10^2 wavelengths, n_T = 100 temperatures, A ~ 180 angles).  Every
# CDF inversion and table lookup below therefore uses one of:
#   * _inv_cdf / _inv_cdf_rows : count-compare searchsorted;
#   * _one_hot @ table         : batched lookup as a matmul.
# --------------------------------------------------------------------------

def _one_hot(idx, n, dtype):
    return (idx[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(dtype)


def _inv_cdf(cdf, r):
    """Inverse-CDF draw in [0, n-1] from a shared (n+1,) table with
    cdf[0]=0, cdf[n]=1.  Equivalent to bisect_cdf(...)-1."""
    return jnp.sum(cdf[1:-1] < r[..., None], axis=-1).astype(jnp.int32)


def _inv_cdf_rows(rows, r):
    """Per-lane inverse CDF: rows (B, n+1) with rows[:,0]=0; smallest k in
    [1, n] with rows[:,k] >= r (bisect_cdf semantics, before the -1)."""
    n = rows.shape[-1] - 1
    return (jnp.sum(rows[..., 1:n] < r[..., None], axis=-1) + 1
            ).astype(jnp.int32)


def _count_below(rows_or_vec, vals):
    """Count of entries < vals per lane: the _row_searchsorted equivalent
    (first index i with tab[i] >= vals) without serialized gathers."""
    return jnp.sum(rows_or_vec < vals[..., None], axis=-1).astype(jnp.int32)


def _row_searchsorted(tab, p, vals):
    """Batched per-row searchsorted: first index i with tab[p, i] >= vals
    (the bucketed replacement for jnp.searchsorted on a shared table)."""
    import math
    n = tab.shape[1]
    flat = tab.reshape(-1)
    base = p * n
    lo = jnp.zeros(vals.shape, jnp.int32)
    hi = jnp.full(vals.shape, n, jnp.int32)
    for _ in range(int(math.ceil(math.log2(max(n, 2)))) + 1):
        mid = (lo + hi) // 2
        v = flat[base + jnp.clip(mid, 0, n - 1)]
        go_up = v < vals
        lo = jnp.where(go_up & (mid > lo), mid, lo)
        hi = jnp.where(go_up, hi, jnp.minimum(mid, hi))
    return hi


def init_state(model: Model, batch: int, n_capt: int = 10,
               rt: bool = False, n_az_rt: int = 45,
               jtally: bool = False, n_ct: int | None = None,
               rt2: bool = False, n_theta_i: int = 15,
               n_phi_i: int = 15, origin: bool = False,
               mono: bool = False, xi_rows: int | None = None,
               fe_cap: int = 0) -> MCState:
    """Fresh all-dead MC state (lanes are populated by refill).

    rt=True allocates the RT1 scattered-intensity tally
    (xI_scatt, reference dust_ray_tracing.f90:33): per (wavelength, cell,
    azimuth bin, z-sign) and per (observer direction, Stokes/contrib type).
    rt2=True allocates the RT2 specific-intensity tally instead
    (I_spec + I_spec_star, radiation_field.f90:91-130): per (wavelength,
    cell, theta_I, phi_I) direction bin plus one direct-star bin, by
    Stokes/contrib type.  Both are stored FLAT (1-D): a trailing (nRT, 6)
    axis pair would be tile-padded to (4,128) on TPU — a 28x HBM blowup.

    n_ct: cell extent of the tally arrays — n_cells by default.
    xi_rows: cell extent of the RT tally only (the per-device slab size
    under rt_slab sharding; other tallies stay full-size).
    fe_cap: rows of the foreign-event staging block (rt_slab mode)."""
    dtype = model.kappa.dtype
    n_cells = model.grid.n_cells if n_ct is None else n_ct
    n_xi = n_cells if xi_rows is None else xi_rows
    L = model.n_lambda
    B = batch
    # NB: every field gets its own buffer (donation forbids aliased args)
    zf = lambda: jnp.zeros(B, dtype)
    zi = lambda: jnp.zeros(B, jnp.int32)
    return MCState(
        x=zf(), y=zf(), z=zf(), u=zf(), v=zf(), w=jnp.ones(B, dtype),
        sI=zf(), sQ=zf(), sU=zf(), sV=zf(),
        ilam=zi(), ri=zi(), zj=jnp.ones(B, jnp.int32), tau_rem=zf(),
        alive=jnp.zeros(B, bool),
        fstar=jnp.zeros(B, bool),
        fscat=jnp.zeros(B, bool),
        emitted=jnp.zeros((), jnp.int32),
        nkill=jnp.zeros((), jnp.int32),
        xkj=jnp.zeros(n_cells, dtype),
        xj=(jnp.zeros(L * n_cells, dtype) if jtally
            else jnp.zeros(1, dtype)),
        nabs=jnp.zeros(n_cells, dtype),
        sed=jnp.zeros((L, n_capt, 8), dtype),
        xi=(jnp.zeros((L * n_cells * (n_theta_i * n_phi_i + 1), 6), dtype)
            if rt2 else
            jnp.zeros((L * n_xi * n_az_rt * 2,
                       model.rt_dirs.shape[0] * 6), dtype)
            if rt else jnp.zeros((1, 1), dtype)),
        age=jnp.zeros(B, jnp.int32),
        it=jnp.zeros((), jnp.int32),
        ocell=jnp.full(B, -1, jnp.int32),
        orig=(jnp.zeros(L * (n_cells + 1), dtype) if origin
              else jnp.zeros(1, dtype)),
        fe=(jnp.zeros((fe_cap, 3 + model.rt_dirs.shape[0] * 6),
                      jnp.float32) if fe_cap > 0
            else jnp.zeros((1, 1), jnp.float32)),
        fe_n=jnp.zeros((), jnp.int32),
        fe_lost=jnp.zeros((), jnp.int32),
        nsent=jnp.zeros(L if mono else 1, dtype),
    )


def make_mc_step(model: Model, key, n_packets, n_total=None,
                 pola: bool = True, mono: bool = False, rt: bool = False,
                 n_az_rt: int = 45, mrw: bool = True,
                 mrw_gamma: float = 2.0, jtally: bool = False,
                 scat_method: int = 2, nabs_tally: bool = False,
                 dark: bool = False, age_cap: int = 100000,
                 rt_slab=None, rt2: bool = False,
                 n_theta_i: int = 15, n_phi_i: int = 15,
                 origin: bool = False, mono_budget: str = "received",
                 rt_est: str = "collision", rt_compact: int = 1024,
                 emit_width: int | None = None):
    """Build the fused one-iteration MC body ``body(MCState) -> MCState``.

    Shared by the single/packet-DP driver (`advance`) and the spatially
    decomposed driver (parallel/spatial.py).

    n_packets: local emission budget of this device; n_total: global packet
    count setting the per-packet luminosity (equal when not sharded).

    rt_slab: None, or ``(dev_id, n_dev, slab)`` — cell-slab ownership of
    the RT1 scattered-intensity tally for spatial domain decomposition
    (SURVEY §2.7 north star).  Requires rt=True, rt_est="collision".
    Packets are advanced data-parallel everywhere (the per-cell model
    tables are O(C) scalars, replicated); the one SHARDED array is the
    (L*C*n_az*2)-row xi tally, of which this device stores only its slab.
    Collision events in an owned cell scatter into the local slab; events
    in a foreign cell are compacted into the ``fe`` staging block
    (payload: ilam, global cell, az bin, nRT*6 phase-weighted Stokes)
    which the spatial driver ring-routes to the owner each iteration —
    an arriving event is CONSUMED by a scatter, never queued, so the
    exchange cannot deadlock (the r4/r5 lane-routing schemes measured a
    1/n_dev duty cycle resp. a capacity gridlock; shipping the tally
    events decouples compute placement from tally placement).  Overflow
    past the fe block capacity is counted in fe_lost (visible in
    MCResult; zero in any sane configuration).
    """
    dtype = model.kappa.dtype
    grid = model.grid
    n_cells = grid.n_cells
    L = model.n_lambda
    nang = model.nang
    # static ablation knobs for kernel profiling (bench.py --profile):
    # comma list in MCFOST_TPU_ABLATE; each named block is statically
    # removed from the trace so its cost can be measured subtractively.
    abl = frozenset(
        s for s in os.environ.get("MCFOST_TPU_ABLATE", "").split(",") if s)

    n_budget = jnp.asarray(n_packets, jnp.int32)
    # luminosity carried by each packet (repartition_wl_em,
    # thermal_emission.f90:344-356)
    n_tot = n_budget if n_total is None else jnp.asarray(n_total, jnp.int32)
    l_packet = model.l_tot / n_tot.astype(dtype)

    def body(s: MCState):
        B = s.x.shape[0]
        n_capt = s.sed.shape[1]
        zf = jnp.zeros(B, dtype)
        if "rng" in abl:
            R = jnp.full((15, B), 0.5, dtype) + s.it.astype(dtype) * 1e-9
        else:
            R = _iter_randoms(key, s.it, 15, B, dtype)

        # ---- 1. refill dead lanes while budget lasts.  emit_width caps
        # refill to the first lanes so the spatial-DD driver can reserve
        # an immigration region whose dead slots routed-in packets can
        # always claim (refill would otherwise win every free slot while
        # the emission budget lasts and starve the ring merges)
        need = ~s.alive
        if emit_width is not None and emit_width < B:
            need = need & (jnp.arange(B) < emit_width)
        rank = jnp.cumsum(need.astype(jnp.int32))
        do_emit = need & (rank <= (n_budget - s.emitted))
        emitted = s.emitted + jnp.sum(do_emit.astype(jnp.int32))

        if mono:
            if mono_budget == "received":
                # stop-when-received criterion (dust_transfer.f90:567-589):
                # draw new packets from the per-lambda RECEIVED-count
                # deficit, so strongly-extincted bins keep getting packets
                # until their captured statistics match the others
                rec = jnp.sum(s.sed[:, :, 0], axis=1)          # (L,)
                target = n_budget.astype(dtype) / L
                deficit = jnp.maximum(target - rec, 0.0)
                deficit = jnp.where(jnp.sum(deficit) > 0.0, deficit, 1.0)
                cdf = jnp.concatenate(
                    [jnp.zeros(1, dtype),
                     jnp.cumsum(deficit) / jnp.sum(deficit)])
                lam_forced = _inv_cdf(cdf, R[0])
            else:
                # deterministic round-robin: equal per-lambda budget
                ordinal = s.emitted + rank - 1
                lam_forced = (ordinal % L).astype(jnp.int32)
        else:
            lam_forced = None
        if "emit" in abl:
            do_emit = do_emit & False
            (ex, ey, ez, eu, ev, ew, eilam, eri, ezj, efstar, evalid,
             ew_emit, eorig) = (s.x, s.y, s.z, s.u, s.v, s.w, s.ilam,
                                s.ri, s.zj, s.fstar, s.alive, s.sI, s.ocell)
        else:
            (ex, ey, ez, eu, ev, ew, eilam, eri, ezj, efstar, evalid,
             ew_emit, eorig) = _emit(model, R[:8], dtype, lam_forced,
                                     disk=mono)
        sel = lambda a, b: jnp.where(do_emit, a, b)
        x = sel(ex, s.x); y = sel(ey, s.y); z = sel(ez, s.z)
        u = sel(eu, s.u); v = sel(ev, s.v); w = sel(ew, s.w)
        ilam = sel(eilam, s.ilam)
        ri = sel(eri, s.ri); zj = sel(ezj, s.zj)
        sI = sel(ew_emit, s.sI)
        sQ = sel(zf, s.sQ); sU = sel(zf, s.sU); sV = sel(zf, s.sV)
        fstar = sel(efstar, s.fstar)
        fscat = sel(jnp.zeros(B, bool), s.fscat)
        ocell = sel(eorig, s.ocell) if origin else s.ocell
        if mono:
            # per-lambda emitted counts for the flux calibration
            oh_sent = _one_hot(ilam, L, dtype) * do_emit.astype(
                dtype)[:, None]
            nsent = s.nsent + jnp.sum(oh_sent, axis=0)
        else:
            nsent = s.nsent
        age = jnp.where(do_emit, 0, s.age)
        tau_rem = sel(_tau_draw(R[8]), s.tau_rem)
        # ISM packets that miss the model are emitted-and-escaped
        alive = s.alive | (do_emit & evalid)

        # ---- star kill: packets crossing the cavity that hit ANY star die
        # (physical_length star test, optical_depth.f90:91-97 via
        # intersect_stars looping all stars, stars.f90:812-938)
        in_cavity = alive & (ri == 0)
        hit_star = jnp.zeros(B, bool)
        for s_i in range(0 if "starkill" in abl else model.star_r.shape[0]):
            px = x - model.star_pos[s_i, 0]
            py = y - model.star_pos[s_i, 1]
            pz = z - model.star_pos[s_i, 2]
            t_ca = -(px * u + py * v + pz * w)
            d2 = px * px + py * py + pz * pz - t_ca * t_ca
            hit_star = hit_star | (in_cavity & (t_ca > 0)
                                   & (d2 < model.star_r[s_i] ** 2))
        alive = alive & ~hit_star

        # ---- 2. one wall crossing with tau bookkeeping
        inside = cyl.is_inside(grid, ri, zj)
        flat = jnp.clip(cyl.flat_index(grid, ri, zj), 0, n_cells - 1)
        act = alive
        tloc = flat
        n_ct = n_cells
        P = model.n_buckets
        # TPU cost model (measured, bench §profile): a data-dependent
        # gather of B rows costs ~90 ns/row (~3 ms at B=32k) regardless of
        # table size, while a one-hot compare + matmul over a C<=16k table
        # streams at VPU speed (~0.6 ms) and serves ALL per-cell columns in
        # one fused dot.  So for small/medium grids every per-cell lookup —
        # kappa_factor, volume, p_icell AND the running xkj tally — rides a
        # single one-hot matmul; big (Voronoi) grids keep the row gather.
        cell_tab = jnp.stack([model.kappa_factor, model.volume,
                              model.p_icell.astype(dtype)], axis=1)
        need_xkj = (not mono) and "xkjgather" not in abl
        dense_cells = n_cells <= 16384 \
            and "cellgather" not in abl and "nodense" not in abl
        if "cellgather" in abl:
            kfac = jnp.ones(B, dtype)
            vol_flat = jnp.ones(B, dtype)
            cvals = None
            xkj_flat = jnp.zeros(B, dtype)
        elif dense_cells:
            ctab = (jnp.concatenate([cell_tab, s.xkj[:, None]], axis=1)
                    if need_xkj else cell_tab)
            ohc = (flat[:, None]
                   == jnp.arange(n_cells, dtype=jnp.int32)).astype(dtype)
            cvals = ohc @ ctab                       # (B, 3|4)
            kfac, vol_flat = cvals[:, 0], cvals[:, 1]
            xkj_flat = cvals[:, 3] if need_xkj else jnp.zeros(B, dtype)
        else:
            cvals = cell_tab[flat]                   # (B, 3)
            kfac, vol_flat = cvals[:, 0], cvals[:, 1]
            # ONE gather of the running kappa*J tally, shared by the MRW
            # trigger and the reemission temperature (the reference reads
            # the same per-thread-stale xT_ech state,
            # thermal_emission.f90:683-702; here the value is stale by at
            # most the current iteration's same-cell deposits)
            xkj_flat = s.xkj[tloc] if need_xkj else jnp.zeros(B, dtype)
        if P == 1:
            p = jnp.zeros(B, jnp.int32)
            pL = ilam
        else:
            p = (jnp.zeros(B, jnp.int32) if cvals is None
                 else cvals[:, 2].astype(jnp.int32))
            pL = p * L + ilam                # linear (bucket, lambda) index
        # all lambda-dependent per-bucket values in one one-hot matmul
        oh_pl = _one_hot(pL, P * L, dtype)           # (B, P*L)
        lam_tab = jnp.stack([model.kappa.reshape(-1),
                             model.kappa_abs.reshape(-1),
                             model.albedo.reshape(-1)], axis=1)  # (P*L, 3)
        lvals = oh_pl @ lam_tab
        kap_l, kabs_l, alb_l = lvals[:, 0], lvals[:, 1], lvals[:, 2]
        opac = jnp.where(inside, kap_l * kfac, 0.0)

        # ---- Modified Random Walk (Min et al. 2009; the reference has it
        # wired but disabled, src/MRW.f90 + dust_transfer.f90:1024-1041):
        # deep in an optically thick cell, replace the many-interaction
        # random walk by one diffusion step to a sphere of radius d, with
        # the expected absorbed energy deposited at the Planck-mean opacity.
        n_T = model.tab_temp.shape[0]
        if not mono:
            if P == 1:
                qcool_rows = model.log_qcool[0]      # (n_T,) shared row
                kross_rows = model.kappa_ross[0]
                kabsp_rows = model.kappa_absp[0]
            else:
                oh_p = _one_hot(p, P, dtype)
                qcool_rows = oh_p @ model.log_qcool  # (B, n_T)
                kross_rows = oh_p @ model.kappa_ross
                kabsp_rows = oh_p @ model.kappa_absp
        if mrw and not mono:
            d_wall = cyl.distance_to_closest_wall(grid, ri, zj, x, y, z)
            qheat0 = xkj_flat * l_packet / jnp.maximum(vol_flat, 1e-30)
            logq0 = jnp.log(jnp.maximum(qheat0, 1e-300))
            ti0 = jnp.clip(_count_below(qcool_rows, logq0), 1, n_T - 1)
            oh_t0 = _one_hot(ti0, n_T, dtype)
            if P == 1:
                rkross = (oh_t0 @ kross_rows) * kfac
                dep_fac = oh_t0 @ kabsp_rows
            else:
                rkross = jnp.sum(oh_t0 * kross_rows, axis=1) * kfac
                dep_fac = jnp.sum(oh_t0 * kabsp_rows, axis=1)
            do_mrw = act & inside & (d_wall * rkross > mrw_gamma)
            # sphere-exit point and diffusion path length
            mu_u, mu_v, mu_w = isotropic_direction(R[1], R[2])
            nztab = model.zeta_inv.shape[0]
            yv = _one_hot(jnp.clip((R[3] * nztab).astype(jnp.int32),
                                   0, nztab - 1), nztab,
                          dtype) @ model.zeta_inv
            ct = (-jnp.log(jnp.maximum(yv, 1e-12))
                  * (3.0 / jnp.pi ** 2) * d_wall * d_wall * rkross)
            dep_mrw = dep_fac * ct * sI
            x_mrw = x + 0.999 * d_wall * mu_u
            y_mrw = y + 0.999 * d_wall * mu_v
            z_mrw = z + 0.999 * d_wall * mu_w
            # escape direction: cosine law about the sphere normal
            u_mrw, v_mrw, w_mrw = cdapres(jnp.sqrt(R[4]),
                                          2.0 * jnp.pi * R[5],
                                          mu_u, mu_v, mu_w)
        else:
            do_mrw = jnp.zeros(B, bool)
            dep_mrw = jnp.zeros(B, dtype)
        if "cross" in abl:
            x1, y1, z1, ri1, zj1 = x + 0.1 * u, y + 0.1 * v, z + 0.1 * w, \
                ri, zj
            l = jnp.full(B, 0.1, dtype)
        else:
            x1, y1, z1, ri1, zj1, l = cyl.cross_cell(grid, x, y, z, u, v,
                                                     w, ri, zj)
        dtau = l * opac
        interact = act & ~do_mrw & (dtau > tau_rem)
        l_eff = jnp.where(interact, tau_rem / jnp.maximum(opac, 1e-30), l)
        l_eff = jnp.where(do_mrw, 0.0, l_eff)

        # Voronoi grids have no stellar cavity: stars sit inside cells, so
        # the segment itself is tested against every star sphere
        # (intersect_stars along the step, optical_depth.f90:91-97)
        if cyl.is_voronoi(grid):
            seg_hit = jnp.zeros(B, bool)
            for s_i in range(model.star_r.shape[0]):
                pxs = x - model.star_pos[s_i, 0]
                pys = y - model.star_pos[s_i, 1]
                pzs = z - model.star_pos[s_i, 2]
                t_ca2 = -(pxs * u + pys * v + pzs * w)
                d2s = pxs * pxs + pys * pys + pzs * pzs - t_ca2 * t_ca2
                seg_hit = seg_hit | (act & (t_ca2 > 0) & (t_ca2 < l_eff)
                                     & (d2s < model.star_r[s_i] ** 2))
            act = act & ~seg_hit

        # kappa*J tally (radiation_field.f90:53; kappa_factor excluded —
        # it cancels against Qcool for uniform dust); MRW lanes deposit the
        # expected diffusion-walk absorption instead.  Mono/image mode
        # skips it entirely like the reference (save_radiation_field only
        # tallies kJ during etape 1, radiation_field.f90:37-55).
        dep_w = jnp.where(act & inside, kabs_l * l_eff * sI, 0.0)
        dep_w = jnp.where(do_mrw, dep_mrw, dep_w)
        if mono or "xkjscatter" in abl:
            xkj = s.xkj
        elif dense_cells:
            # scatter as a one-hot einsum: the serialized (B,)->(C,)
            # scatter-add costs ~0.5 ms/iter (55% of the whole thermal
            # iteration, bench §profile); the MXU contraction over the
            # same one-hot used for the gathers costs ~0.2 ms
            xkj = s.xkj + jnp.einsum("bc,b->c", ohc, dep_w)
        else:
            xkj = s.xkj.at[tloc].add(dep_w)

        # per-lambda mean-intensity path tally (xJ_abs,
        # radiation_field.f90:60-66): sum of l * Stokes I per (cell, lambda)
        if jtally and dense_cells:
            # (L, C) outer-product accumulation on the MXU: the B-element
            # scalar scatter into the (L*C,) table costs ~230 us/iter
            # serialized; one (L,B)@(B,C) matmul re-using the cell one-hot
            # streams at MXU speed (~120 us, bf16 inputs f32 accumulate —
            # the 2^-8 value rounding is far below MC noise)
            # fresh bf16 one-hot (NOT a cast of ohc/ohs: casting forces a
            # 229 MB materialized copy; a fresh iota-compare fuses into
            # the matmul tiles)
            oh_tj = (tloc[:, None]
                     == jnp.arange(n_ct, dtype=jnp.int32)
                     ).astype(jnp.bfloat16)
            wl_oh = _one_hot(ilam, L, jnp.bfloat16) \
                * jnp.where(act & inside, l_eff * sI,
                            0.0).astype(jnp.bfloat16)[:, None]
            xj = s.xj + jnp.einsum(
                "bl,bc->lc", wl_oh, oh_tj,
                preferred_element_type=jnp.float32).astype(
                s.xj.dtype).reshape(-1)
        elif jtally:
            xj = s.xj.at[ilam * n_ct + tloc].add(
                jnp.where(act & inside, l_eff * sI, 0.0))
        else:
            xj = s.xj

        # ---- RT2 specific-intensity tally (save_radiation_field RT2
        # branch, radiation_field.f90:91-130): raw Stokes binned over the
        # relative (theta, phi) direction bins; unscattered stellar packets
        # go to the per-cell direct-star bin (I_spec_star) for the exact-
        # angle convolution at image time (calc_Isca_rt2_star).
        # rt_est="collision" (default) replaces this per-crossing scatter
        # with the event-based deposit after the interaction draw, same
        # as RT1 (see the collision block below)
        if rt2 and rt_est == "track":
            xm2 = x + 0.5 * l_eff * u
            ym2 = y + 0.5 * l_eff * v
            zm2 = z + 0.5 * l_eff * w
            direct = fstar & ~fscat
            phi_pos2 = jnp.arctan2(xm2, ym2)
            phi_vol = jnp.arctan2(-u, -v)
            rel = jnp.mod(phi_vol - phi_pos2, 2.0 * jnp.pi)
            phi_b = jnp.clip((rel / (2.0 * jnp.pi)
                              * n_phi_i).astype(jnp.int32), 0, n_phi_i - 1)
            wmid = jnp.where(zm2 > 0.0, w, -w)   # midplane symmetry fold
            th_b = jnp.clip(((wmid + 1.0) * 0.5
                             * n_theta_i).astype(jnp.int32),
                            0, n_theta_i - 1)
            nb2 = n_theta_i * n_phi_i
            b2 = jnp.where(direct, nb2, th_b * n_phi_i + phi_b)
            base2 = (ilam * n_ct + tloc) * (nb2 + 1) + b2
            valid2 = (act & inside).astype(dtype) * l_eff
            fsv = fstar.astype(dtype)
            vals2 = jnp.stack(
                [sI, sQ, sU, sV, fsv * sI, (1.0 - fsv) * sI],
                axis=-1) * valid2[:, None]                      # (B, 6)
            xi = s.xi.at[base2].add(vals2, mode="promise_in_bounds")
        # ---- RT1 scattered-intensity tally (calc_xI_scatt(_pola),
        # dust_ray_tracing.f90:480-632; angles in angles_scatt_rt1 :409-476)
        # rt_est="track": the reference's own per-crossing track-length
        # estimator (save_radiation_field calls calc_xI_scatt for every
        # traversed cell, radiation_field.f90:63-90 — the path the
        # reference comments "slows down the SED calculation by a factor
        # of 5").  It costs one B-row scatter-add per iteration, which on
        # TPU serializes at ~110 ns/row (~3.6 ms at B=32k, 5x the whole
        # rest of the step).  rt_est="collision" (default) replaces it
        # with the event-based collision estimator below — see the block
        # after the interaction draw.
        elif rt and rt_est == "track":
            from .sampling import rotation_to_frame
            xm = x + 0.5 * l_eff * u
            ym = y + 0.5 * l_eff * v
            zm = z + 0.5 * l_eff * w
            phi_pos = jnp.arctan2(xm, ym)
            kphi = jnp.clip((jnp.mod(phi_pos, 2.0 * jnp.pi)
                             / (2.0 * jnp.pi) * n_az_rt).astype(jnp.int32),
                            0, n_az_rt - 1)
            psup = jnp.where(zm > 0.0, 0, 1)
            base = ((ilam * n_ct + tloc) * n_az_rt + kphi) * 2 + psup
            valid = (act & inside).astype(dtype) * l_eff
            n_rt = model.rt_dirs.shape[0]
            A1 = nang + 1
            # all observer directions at once: (B, nRT)
            do0 = model.rt_dirs[:, 0][None, :]
            do1 = model.rt_dirs[:, 1][None, :]
            do2 = model.rt_dirs[:, 2][None, :]
            u2, v2, w2 = u[:, None], v[:, None], w[:, None]
            if "rtangles" in abl:
                itr = jnp.ones((B, model.rt_dirs.shape[0]), jnp.int32)
            else:
                cos_sc = u2 * do0 + v2 * do1 + w2 * do2
                itr = jnp.clip(jnp.round(
                    jnp.arccos(jnp.clip(cos_sc, -1.0, 1.0))
                    * (nang / jnp.pi)).astype(jnp.int32), 1, nang)
            # dense Mueller lookup: the four (P*L, A1) tables ride ONE
            # one-hot matmul into per-lane rows, then a per-observer angle
            # one-hot selects s11/s12/s33/s34 — replaces four ~90 ns/row
            # serialized gathers (calc_xI_scatt tables,
            # dust_ray_tracing.f90:480-529)
            n_mt = 4 if pola else 1
            if "rtmueller" in abl:
                msel = jnp.ones((B, n_mt, n_rt), dtype) * 0.5
            else:
                mtabs = [model.s11_rt, model.s12_rt,
                         model.s33_rt, model.s34_rt][:n_mt]
                mr = (oh_pl @ jnp.concatenate(
                    [t.reshape(P * L, A1) for t in mtabs], axis=1)
                ).reshape(B, n_mt, A1)
                # per-observer one-hot multiply-reduce (NOT a batched
                # einsum: a (B,)-batched tiny matmul serializes on the MXU)
                msel = jnp.zeros((B, n_mt, n_rt), dtype)
                for o in range(n_rt):
                    oh_o = (itr[:, o, None]
                            == jnp.arange(A1,
                                          dtype=jnp.int32)).astype(dtype)
                    msel = msel.at[:, :, o].set(
                        jnp.sum(oh_o[:, None, :] * mr, axis=-1))
            s11c = msel[:, 0]
            if pola:
                if "rtpolarot" in abl:
                    cosw = jnp.ones((B, n_rt), dtype)
                    sinw = jnp.zeros((B, n_rt), dtype)
                else:
                    _, v1pj, v1pk = rotation_to_frame(u2, v2, w2,
                                                      -do0, -do1, -do2)
                    xnyp = jnp.sqrt(jnp.maximum(
                        v1pj * v1pj + v1pk * v1pk, 0.0))
                    costhet = jnp.where(xnyp < 1e-10, 1.0,
                                        -v1pj / jnp.maximum(xnyp, 1e-30))
                    theta = jnp.arccos(jnp.clip(costhet, -1.0, 1.0))
                    theta = jnp.where(theta >= jnp.pi, 0.0, theta) \
                        + 0.5 * jnp.pi
                    omega = jnp.where(v1pk < 0.0,
                                      -2.0 * theta, 2.0 * theta)
                    cosw = jnp.cos(omega)
                    sinw = jnp.sin(omega)
                # Mueller elements with the reference's RT sign
                # convention (calc_xI_scatt_pola :576-584)
                sm12 = -s11c * msel[:, 1]
                sm33 = -s11c * msel[:, 2]
                sm34 = -s11c * msel[:, 3]
                sm44 = sm33          # s44 = s33 for Mie spheres
                sQ2, sU2, sV2, sI2 = (sQ[:, None], sU[:, None],
                                      sV[:, None], sI[:, None])
                c2 = cosw * sQ2 - sinw * sU2
                c3 = sinw * sQ2 + cosw * sU2
                d1 = s11c * sI2 + sm12 * c2
                d2 = sm12 * sI2 + s11c * c2
                d3 = sm33 * c3 - sm34 * sV2
                d4 = sm34 * c3 + sm44 * sV2
                S1o = d1
                S2o = -cosw * d2 - sinw * d3
                S3o = -sinw * d2 + cosw * d3
                S4o = d4
            else:
                S1o = s11c * sI[:, None]
                S2o = jnp.zeros_like(S1o)
                S3o = jnp.zeros_like(S1o)
                S4o = jnp.zeros_like(S1o)
            fs = (fstar.astype(dtype) * valid)[:, None]
            fn = ((1.0 - fstar.astype(dtype)) * valid)[:, None]
            vw = valid[:, None]
            vals = jnp.stack([S1o * vw, S2o * vw, S3o * vw, S4o * vw,
                              S1o * fs, S1o * fn], axis=-1)   # (B, nRT, 6)
            if "rtscatter" in abl:
                xi = s.xi
            else:
                xi = s.xi.at[base].add(vals.reshape(B, n_rt * 6),
                                       mode="promise_in_bounds")
        else:
            xi = s.xi

        # dark-zone boundary: reflect the packet instead of entering
        # (physical_length, optical_depth.f90:104-112); statically elided
        # when the model has no dark zone (two per-cell gathers saved)
        if dark:
            flat1 = jnp.clip(cyl.flat_index(grid, ri1, zj1), 0, n_cells - 1)
            into_dark = (act & ~interact & ~do_mrw
                         & cyl.is_inside(grid, ri1, zj1)
                         & model.dark_zone[flat1] & ~model.dark_zone[flat])
            u = jnp.where(into_dark, -u, u)
            v = jnp.where(into_dark, -v, v)
            w = jnp.where(into_dark, -w, w)
        else:
            into_dark = jnp.zeros(B, bool)
        stay = interact | into_dark | do_mrw
        x = jnp.where(stay, jnp.where(interact, x + l_eff * u, x),
                      jnp.where(act, x1, x))
        y = jnp.where(stay, jnp.where(interact, y + l_eff * v, y),
                      jnp.where(act, y1, y))
        z = jnp.where(stay, jnp.where(interact, z + l_eff * w, z),
                      jnp.where(act, z1, z))
        if mrw and not mono:
            x = jnp.where(do_mrw, x_mrw, x)
            y = jnp.where(do_mrw, y_mrw, y)
            z = jnp.where(do_mrw, z_mrw, z)
        ri = jnp.where(stay | ~act, ri, ri1)
        zj = jnp.where(stay | ~act, zj, zj1)
        tau_rem = jnp.where(interact, 0.0,
                            jnp.where(act,
                                      jnp.maximum(tau_rem - dtau, 0.0),
                                      tau_rem))

        # ---- 3. exits -> MC SED capture (capteur, output.f90:294-395)
        exited = (act & ~interact & ~do_mrw
                  & cyl.has_exited(grid, ri, zj, z))
        wfold = jnp.abs(w)   # central symmetry fold
        capt = jnp.clip(((1.0 - wfold) * n_capt).astype(jnp.int32),
                        0, n_capt - 1)
        sed_idx = ilam * n_capt + capt
        # U changes sign under the central-symmetry fold
        # (capteur, output.f90:328-340)
        uf = jnp.where(w < 0, -sU, sU)
        ex_w = jnp.where(exited, sI, 0.0)
        contrib = jnp.stack([
            jnp.where(exited, sI, 0.0),
            jnp.where(exited, sQ, 0.0),
            jnp.where(exited, uf, 0.0),
            jnp.where(exited, sV, 0.0),
            jnp.where(fstar & ~fscat, ex_w, 0.0),
            jnp.where(fstar & fscat, ex_w, 0.0),
            jnp.where(~fstar & ~fscat, ex_w, 0.0),
            jnp.where(~fstar & fscat, ex_w, 0.0),
        ], axis=-1)                                   # (B, 8)
        # tally as an MXU matmul: the (L*n_capt) bin space is small, so
        # one-hot^T @ contrib replaces a serialized scatter-add
        if "sed" in abl:
            sed = s.sed + jnp.sum(contrib) * 0.0
        else:
            oh_sed = _one_hot(sed_idx, L * n_capt, dtype)
            sed = s.sed + jnp.einsum("bk,bc->kc", oh_sed, contrib).reshape(
                L, n_capt, 8)
        # escaped-energy-by-origin-cell tally (write_origin,
        # output.f90:1366-1420; slot n_cells = star/ISM origin)
        if origin:
            oc = jnp.where(ocell >= 0, ocell, n_cells)
            orig = s.orig.at[ilam * (n_cells + 1) + oc].add(
                jnp.where(exited, sI, 0.0))
        else:
            orig = s.orig
        act = act & ~exited

        # ---- 4. interactions
        interact = interact & act
        if mono:
            # forced scattering: weight by albedo, kill faint packets
            sI = jnp.where(interact, sI * alb_l, sI)
            sQ = jnp.where(interact, sQ * alb_l, sQ)
            sU = jnp.where(interact, sU * alb_l, sU)
            sV = jnp.where(interact, sV * alb_l, sV)
            faint = interact & (sI < 1e-12)
            act = act & ~faint
            interact = interact & ~faint
            do_scat = interact
            do_abs = jnp.zeros_like(interact)
        else:
            do_scat = interact & (R[9] < alb_l)
            do_abs = interact & ~do_scat

        # ---- RT1 tally, collision estimator (TPU-first redesign of
        # calc_xI_scatt, dust_ray_tracing.f90:480-632).  The track-length
        # estimator above deposits from EVERY crossing lane every
        # iteration — a B-row serialized scatter (~110 ns/row) that costs
        # 5x the rest of the step.  Scattering events are ~50x rarer than
        # crossings (measured ~2% of lanes/iteration on ref4.1), and at a
        # scattering event the interaction probability has already
        # sampled kappa_sca * dl, so depositing the packet Stokes times
        # the phase matrix at each EVENT estimates the same scattered
        # source function with kappa_sca folded in (the consumer drops
        # its kappa_sca factor, transfer/raytrace.py).  Events are
        # compacted to rt_compact lanes by a one-hot matmul (cheap, MXU)
        # and only those rows are scattered; overflow beyond rt_compact
        # is handled EXACTLY by another compaction pass (the inner
        # while_loop), and event-free iterations skip the scatter
        # entirely.  Event state here: x,y,z = interaction point,
        # u,v,w/Stokes/fstar not yet updated by the scattering draw;
        # in mono mode sI already carries the forced-scattering albedo
        # weight (= kappa_sca/kappa_ext), in thermal mode the
        # scatter-vs-absorb draw itself supplied the albedo factor.
        if rt2 and rt_est == "collision":
            # RT2 collision estimator: deposit the pre-scatter Stokes of
            # each scattering event into the incident-direction bin of
            # its cell (the interaction draw already sampled kext*l; the
            # consumer drops its kappa factor).  No Mueller work at MC
            # time — the phase convolution happens at image time.
            Ec2 = rt_compact
            ev2 = do_scat
            nb2c = n_theta_i * n_phi_i
            phi_pos2 = jnp.arctan2(x, y)
            phi_vol2 = jnp.arctan2(-u, -v)
            rel2 = jnp.mod(phi_vol2 - phi_pos2, 2.0 * jnp.pi)
            phi_b2 = jnp.clip((rel2 / (2.0 * jnp.pi)
                               * n_phi_i).astype(jnp.int32), 0,
                              n_phi_i - 1)
            wmid2 = jnp.where(z > 0.0, w, -w)     # midplane symmetry fold
            th_b2 = jnp.clip(((wmid2 + 1.0) * 0.5
                              * n_theta_i).astype(jnp.int32),
                             0, n_theta_i - 1)
            direct2 = fstar & ~fscat
            b2c = jnp.where(direct2, nb2c, th_b2 * n_phi_i + phi_b2)
            fsv2 = fstar.astype(jnp.float32)
            payload2 = jnp.stack(
                [ilam.astype(jnp.float32), tloc.astype(jnp.float32),
                 b2c.astype(jnp.float32),
                 sI.astype(jnp.float32), sQ.astype(jnp.float32),
                 sU.astype(jnp.float32), sV.astype(jnp.float32),
                 fsv2 * sI.astype(jnp.float32),
                 (1.0 - fsv2) * sI.astype(jnp.float32)], axis=1)
            rank2 = jnp.cumsum(ev2.astype(jnp.int32)) - 1
            count2 = jnp.sum(ev2.astype(jnp.int32))

            def _rt2_pass(carry):
                off, xi_in = carry
                oh2 = (((rank2 - off)[:, None]
                        == jnp.arange(Ec2, dtype=jnp.int32))
                       & ev2[:, None]).astype(jnp.float32)
                cp2 = jnp.einsum("be,bk->ek", oh2, payload2,
                                 precision=jax.lax.Precision.HIGHEST)
                row2 = ((jnp.round(cp2[:, 0]).astype(jnp.int32) * n_ct
                         + jnp.round(cp2[:, 1]).astype(jnp.int32))
                        * (nb2c + 1)
                        + jnp.round(cp2[:, 2]).astype(jnp.int32))
                row2 = jnp.clip(row2, 0, xi_in.shape[0] - 1)
                vals2E = cp2[:, 3:9]               # I,Q,U,V, fs*I, fn*I
                xi_out = xi_in.at[row2].add(
                    vals2E.astype(xi_in.dtype), mode="promise_in_bounds")
                return off + Ec2, xi_out

            _, xi = jax.lax.while_loop(
                lambda c: c[0] < count2, _rt2_pass,
                (jnp.zeros((), jnp.int32), xi))

        if rt and rt_est == "collision":
            Ec = rt_compact
            ev = do_scat
            phi_ev = jnp.arctan2(x, y)
            kphi_ev = jnp.clip(
                (jnp.mod(phi_ev, 2.0 * jnp.pi) / (2.0 * jnp.pi)
                 * n_az_rt).astype(jnp.int32), 0, n_az_rt - 1)
            psup_ev = jnp.where(z > 0.0, 0, 1)
            azk_ev = kphi_ev * 2 + psup_ev          # in [0, 2*n_az_rt)
            if rt_slab is not None:
                dev_id, n_dev_rt, slab_rt = rt_slab
                owned_ev = (tloc // slab_rt) == dev_id
                ev_l = ev & owned_ev
                ev_f = ev & ~owned_ev
                n_rows_loc = slab_rt
            else:
                ev_l = ev
                ev_f = None
                n_rows_loc = n_ct
            # payload columns must survive an exact f32 matmul: each key
            # component is < 2^24 (lambda index, global cell, az bin),
            # flags ride as 0/1
            payload = jnp.stack(
                [ilam.astype(jnp.float32),
                 tloc.astype(jnp.float32),
                 azk_ev.astype(jnp.float32),
                 pL.astype(jnp.float32),
                 sI.astype(jnp.float32), sQ.astype(jnp.float32),
                 sU.astype(jnp.float32), sV.astype(jnp.float32),
                 u.astype(jnp.float32), v.astype(jnp.float32),
                 w.astype(jnp.float32),
                 fstar.astype(jnp.float32)], axis=1)       # (B, 12)
            n_rt = model.rt_dirs.shape[0]
            A1c = nang + 1
            n_mt = 4 if pola else 1
            mtabs_c = [model.s11_rt, model.s12_rt,
                       model.s33_rt, model.s34_rt][:n_mt]
            mtab_cat = jnp.concatenate(
                [t.reshape(P * L, A1c).astype(jnp.float32)
                 for t in mtabs_c], axis=1)               # (P*L, n_mt*A1)

            def _compact_events(evmask, rank, E, off):
                """Compact up to E events starting at running-count
                ``off`` and evaluate their phase-matrix contributions:
                returns (ilamE, flatE, azkE, valsE) with exactly-zero
                rows past the event count."""
                oh = (((rank - off)[:, None]
                       == jnp.arange(E, dtype=jnp.int32))
                      & evmask[:, None]).astype(jnp.float32)   # (B, E)
                # HIGHEST precision: the TPU default truncates matmul
                # inputs to bf16, which CORRUPTS the integer key columns
                # (needs 14+ bits); the 3-pass f32 emulation is exact for
                # one-hot x int<2^24 products
                cp = jnp.einsum("be,bk->ek", oh, payload,
                                precision=jax.lax.Precision.HIGHEST)
                ilamE = jnp.round(cp[:, 0]).astype(jnp.int32)
                flatE = jnp.round(cp[:, 1]).astype(jnp.int32)
                azkE = jnp.round(cp[:, 2]).astype(jnp.int32)
                pLE = jnp.round(cp[:, 3]).astype(jnp.int32)
                sIe, sQe, sUe, sVe = cp[:, 4], cp[:, 5], cp[:, 6], cp[:, 7]
                ue, ve, we = cp[:, 8], cp[:, 9], cp[:, 10]
                fse = cp[:, 11]
                Ec_ = E
                mr = (_one_hot(pLE, P * L, jnp.float32) @ mtab_cat
                      ).reshape(Ec_, n_mt, A1c)
                do0 = model.rt_dirs[:, 0][None, :].astype(jnp.float32)
                do1 = model.rt_dirs[:, 1][None, :].astype(jnp.float32)
                do2 = model.rt_dirs[:, 2][None, :].astype(jnp.float32)
                u2, v2, w2 = ue[:, None], ve[:, None], we[:, None]
                cos_sc = u2 * do0 + v2 * do1 + w2 * do2
                itr = jnp.clip(jnp.round(
                    jnp.arccos(jnp.clip(cos_sc, -1.0, 1.0))
                    * (nang / jnp.pi)).astype(jnp.int32), 1, nang)
                msel = jnp.zeros((Ec_, n_mt, n_rt), jnp.float32)
                for o in range(n_rt):
                    oh_o = (itr[:, o, None]
                            == jnp.arange(A1c, dtype=jnp.int32)
                            ).astype(jnp.float32)
                    msel = msel.at[:, :, o].set(
                        jnp.sum(oh_o[:, None, :] * mr, axis=-1))
                s11c = msel[:, 0]
                if pola:
                    from .sampling import rotation_to_frame
                    _, v1pj, v1pk = rotation_to_frame(u2, v2, w2,
                                                      -do0, -do1, -do2)
                    xnyp = jnp.sqrt(jnp.maximum(
                        v1pj * v1pj + v1pk * v1pk, 0.0))
                    costhet = jnp.where(xnyp < 1e-10, 1.0,
                                        -v1pj / jnp.maximum(xnyp, 1e-30))
                    theta = jnp.arccos(jnp.clip(costhet, -1.0, 1.0))
                    theta = jnp.where(theta >= jnp.pi, 0.0, theta) \
                        + 0.5 * jnp.pi
                    omega = jnp.where(v1pk < 0.0,
                                      -2.0 * theta, 2.0 * theta)
                    cosw = jnp.cos(omega)
                    sinw = jnp.sin(omega)
                    sm12 = -s11c * msel[:, 1]
                    sm33 = -s11c * msel[:, 2]
                    sm34 = -s11c * msel[:, 3]
                    sm44 = sm33
                    sQ2, sU2, sV2, sI2 = (sQe[:, None], sUe[:, None],
                                          sVe[:, None], sIe[:, None])
                    c2 = cosw * sQ2 - sinw * sU2
                    c3 = sinw * sQ2 + cosw * sU2
                    d1 = s11c * sI2 + sm12 * c2
                    d2 = sm12 * sI2 + s11c * c2
                    d3 = sm33 * c3 - sm34 * sV2
                    d4 = sm34 * c3 + sm44 * sV2
                    S1o = d1
                    S2o = -cosw * d2 - sinw * d3
                    S3o = -sinw * d2 + cosw * d3
                    S4o = d4
                else:
                    S1o = s11c * sIe[:, None]
                    S2o = jnp.zeros_like(S1o)
                    S3o = jnp.zeros_like(S1o)
                    S4o = jnp.zeros_like(S1o)
                fs2 = fse[:, None] * S1o
                fn2 = (1.0 - fse[:, None]) * S1o
                valsE = jnp.stack([S1o, S2o, S3o, S4o, fs2, fn2],
                                  axis=-1).reshape(Ec_, n_rt * 6)
                # zero rows stay exactly zero: every val is linear in the
                # (zero) compacted Stokes
                return ilamE, flatE, azkE, valsE

            rank_l = jnp.cumsum(ev_l.astype(jnp.int32)) - 1
            count_l = jnp.sum(ev_l.astype(jnp.int32))


            def _rt_pass(carry):
                off, xi_in = carry
                ilamE, flatE, azkE, valsE = _compact_events(
                    ev_l, rank_l, Ec, off)
                if rt_slab is not None:
                    flatE = flatE - dev_id * slab_rt
                baseE = (ilamE * n_rows_loc + flatE) * (2 * n_az_rt) + azkE
                baseE = jnp.clip(baseE, 0,
                                 n_rows_loc * L * 2 * n_az_rt - 1)
                xi_out = xi_in.at[baseE].add(
                    valsE.astype(xi_in.dtype), mode="promise_in_bounds")
                return off + Ec, xi_out

            _, xi = jax.lax.while_loop(
                lambda c: c[0] < count_l, _rt_pass,
                (jnp.zeros((), jnp.int32), xi))

            if rt_slab is not None and n_dev_rt > 1:
                # stage foreign events for the driver's ring exchange:
                # [ilam, global cell, az bin, nRT*6 values] per row
                Ef = s.fe.shape[0]
                rank_f = jnp.cumsum(ev_f.astype(jnp.int32)) - 1
                count_f = jnp.sum(ev_f.astype(jnp.int32))
                ilamF, flatF, azkF, valsF = _compact_events(
                    ev_f, rank_f, Ef, jnp.zeros((), jnp.int32))
                fe = jnp.concatenate(
                    [ilamF[:, None].astype(jnp.float32),
                     flatF[:, None].astype(jnp.float32),
                     azkF[:, None].astype(jnp.float32), valsF], axis=1)
                fe_n = jnp.minimum(count_f, Ef)
                fe_lost = s.fe_lost + jnp.maximum(count_f - Ef, 0)
            else:
                fe, fe_n, fe_lost = s.fe, s.fe_n, s.fe_lost
        else:
            fe, fe_n, fe_lost = s.fe, s.fe_n, s.fe_lost

        A1 = nang + 1
        thfac = jnp.pi / nang
        if "scatsample" in abl:
            itheta = jnp.ones(B, jnp.int32)
            if pola:
                m12 = jnp.zeros(B, dtype)
                m33 = jnp.ones(B, dtype)
                m34 = jnp.zeros(B, dtype)
        elif scat_method == 1:
            # ---- 4a. scattering, method 1: draw a grain, use its Mueller
            # matrix (propagate_packet scatter branch,
            # dust_transfer.f90:1086-1153) — gather-based, kept for parity
            # runs; method 2 below is the TPU fast path
            K = model.tab_g.shape[0]
            kbase = pL * K
            igrain = bisect_cdf(
                lambda k: _fg(model.ksca_cdf, kbase + jnp.maximum(k - 1, 0))
                * (k > 0), K, R[10]) - 1
            row = igrain * L + ilam
            rbase = row * A1
            itheta = bisect_cdf(lambda k: _fg(model.prob_s11, rbase + k),
                                nang, R[11])
            if pola:
                frac = R[12]
                rth = rbase + itheta
                m12 = (_fg(model.tab_s12, rth) * frac
                       + _fg(model.tab_s12, rth - 1) * (1 - frac))
                m33 = (_fg(model.tab_s33, rth) * frac
                       + _fg(model.tab_s33, rth - 1) * (1 - frac))
                m34 = (_fg(model.tab_s34, rth) * frac
                       + _fg(model.tab_s34, rth - 1) * (1 - frac))
        else:
            # ---- 4a. scattering, method 2: bucket-mean phase matrix
            # (select_scattering_method, scattering.f90:39-66 — the
            # reference's own 2D default).  One one-hot matmul fetches the
            # theta-CDF row and the three Mueller-ratio rows per lane; the
            # draw is then a dense compare — zero serialized gathers.
            if pola:
                m2tab = jnp.concatenate(
                    [model.prob_s11_m2.reshape(P * L, A1),
                     model.s12_rt.reshape(P * L, A1),
                     model.s33_rt.reshape(P * L, A1),
                     model.s34_rt.reshape(P * L, A1)], axis=1)
            else:
                m2tab = model.prob_s11_m2.reshape(P * L, A1)
            mrows = oh_pl @ m2tab                    # (B, {1|4}*A1)
            itheta = _inv_cdf_rows(mrows[:, :A1], R[11])
            if pola:
                frac = R[12]
                oh_pair = (frac[:, None] * _one_hot(itheta, A1, dtype)
                           + (1.0 - frac)[:, None]
                           * _one_hot(itheta - 1, A1, dtype))
                m12 = jnp.sum(oh_pair * mrows[:, A1:2 * A1], axis=1)
                m33 = jnp.sum(oh_pair * mrows[:, 2 * A1:3 * A1], axis=1)
                m34 = jnp.sum(oh_pair * mrows[:, 3 * A1:], axis=1)

        c0 = jnp.cos((itheta - 1).astype(dtype) * thfac)
        c1 = jnp.cos(itheta.astype(dtype) * thfac)
        cospsi = c0 + R[12] * (c1 - c0)
        phi = jnp.pi * (2.0 * R[13] - 1.0)
        un, vn, wn = cdapres(cospsi, phi, u, v, w)
        if pola:
            one = jnp.ones_like(m12)
            nI, nQ, nU, nV = update_stokes(sI, sQ, sU, sV, u, v, w,
                                           un, vn, wn, one, m12, m33, m34)
        else:
            nI, nQ, nU, nV = sI, sQ, sU, sV

        # ---- 4b. absorption + immediate reemission (im_reemission_LTE,
        # thermal_emission.f90:710-771; Temp_LTE :649-706).  The heating
        # uses the shared pre-update tally gather plus the lane's own
        # deposit (same-iteration deposits by other lanes are picked up
        # next iteration — the per-thread staleness the reference already
        # tolerates in xT_ech).  Statically absent in mono mode (forced
        # scattering only).
        if mono or "reemit" in abl:
            lam_new = ilam
            ua, va, wa = u, v, w
            nabs = s.nabs
        else:
            qheat = (xkj_flat + dep_w) * l_packet \
                / jnp.maximum(vol_flat, 1e-30)
            logq = jnp.log(jnp.maximum(qheat, 1e-300))
            ti = jnp.clip(_count_below(qcool_rows, logq), 1, n_T - 1)
            oh_ti = _one_hot(ti, n_T, dtype)
            oh_tim = _one_hot(ti - 1, n_T, dtype)
            if P == 1:
                q1 = oh_ti @ qcool_rows
                q0 = oh_tim @ qcool_rows
            else:
                q1 = jnp.sum(oh_ti * qcool_rows, axis=1)
                q0 = jnp.sum(oh_tim * qcool_rows, axis=1)
            frac_t2 = jnp.clip((logq - q0) / jnp.maximum(q1 - q0, 1e-30),
                               0.0, 1.0)
            frac_t1 = 1.0 - frac_t2
            # interpolated reemission CDF row in one matmul: the
            # temperature interpolation weights ride inside the one-hot
            wrow = frac_t1[:, None] * oh_tim + frac_t2[:, None] * oh_ti
            if P == 1:
                cdfrow = wrow @ model.kdb_dt_cdf[0]  # (B, L)
            else:
                w2 = (oh_p[:, :, None]
                      * wrow[:, None, :]).reshape(B, P * n_T)
                cdfrow = w2 @ model.kdb_dt_cdf.reshape(P * n_T, L)
            lam_new = _count_below(cdfrow[:, :L - 1], R[10])
            ua, va, wa = isotropic_direction(R[11], R[13])
            if nabs_tally:
                nabs = s.nabs.at[tloc].add(jnp.where(do_abs, 1.0, 0.0))
            else:
                nabs = s.nabs

        # ---- merge interaction results
        u = jnp.where(do_scat, un, jnp.where(do_abs, ua, u))
        v = jnp.where(do_scat, vn, jnp.where(do_abs, va, v))
        w = jnp.where(do_scat, wn, jnp.where(do_abs, wa, w))
        sI = jnp.where(do_scat, nI, sI)
        sQ = jnp.where(do_scat, nQ, jnp.where(do_abs, 0.0, sQ))
        sU = jnp.where(do_scat, nU, jnp.where(do_abs, 0.0, sU))
        sV = jnp.where(do_scat, nV, jnp.where(do_abs, 0.0, sV))
        ilam = jnp.where(do_abs, lam_new.astype(jnp.int32), ilam)
        tau_rem = jnp.where(interact, _tau_draw(R[14]), tau_rem)
        fscat = jnp.where(do_scat, True, jnp.where(do_abs, False, fscat))
        fstar = jnp.where(do_abs, False, fstar)
        if mrw and not mono:
            # MRW exit: fresh wavelength from the local reemission CDF,
            # cosine direction off the diffusion sphere, unpolarised
            u = jnp.where(do_mrw, u_mrw, u)
            v = jnp.where(do_mrw, v_mrw, v)
            w = jnp.where(do_mrw, w_mrw, w)
            ilam = jnp.where(do_mrw, lam_new.astype(jnp.int32), ilam)
            sQ = jnp.where(do_mrw, 0.0, sQ)
            sU = jnp.where(do_mrw, 0.0, sU)
            sV = jnp.where(do_mrw, 0.0, sV)
            tau_rem = jnp.where(do_mrw, _tau_draw(R[6]), tau_rem)
            fscat = jnp.where(do_mrw, False, fscat)
            fstar = jnp.where(do_mrw, False, fstar)

        # straggler age cap on device: a packet random-walking for an
        # extreme number of steps is terminated with its remaining energy
        # DEPOSITED in the current cell (thermal mode) so energy is
        # conserved exactly — the packet merely stops redistributing it.
        # The count still reports as n_lost so the bias surface (local
        # deposit instead of continued transport) stays visible.  The
        # reference has no cap but also no lock-step cost for stragglers.
        age = jnp.where(act, age + 1, age)
        overage = act & (age > age_cap)
        if not mono and "xkjscatter" not in abl:
            inside_now = cyl.is_inside(grid, ri, zj)
            dep_late = jnp.where(overage & inside_now, sI, 0.0)
            tloc_now = jnp.clip(cyl.flat_index(grid, ri, zj),
                                0, n_cells - 1)
            xkj = xkj.at[tloc_now].add(dep_late)
        act = act & ~overage
        nkill = s.nkill + jnp.sum(overage.astype(jnp.int32))

        return MCState(x=x, y=y, z=z, u=u, v=v, w=w,
                       sI=sI, sQ=sQ, sU=sU, sV=sV,
                       ilam=ilam, ri=ri, zj=zj, tau_rem=tau_rem,
                       alive=act, fstar=fstar, fscat=fscat,
                       emitted=emitted, nkill=nkill, xkj=xkj, xj=xj,
                       nabs=nabs, sed=sed, xi=xi, age=age, it=s.it + 1,
                       ocell=ocell, orig=orig, fe=fe, fe_n=fe_n,
                       fe_lost=fe_lost, nsent=nsent)

    return body


@functools.partial(jax.jit, static_argnames=("pola", "mono",
                                             "rt", "n_az_rt", "mrw",
                                             "mrw_gamma", "jtally",
                                             "scat_method", "nabs_tally",
                                             "dark", "age_cap", "rt2",
                                             "n_theta_i", "n_phi_i",
                                             "origin", "mono_budget",
                                             "rt_est", "rt_compact"),
                   donate_argnums=(2,))
def advance(model: Model, key, state: MCState, n_packets,
            n_iters: int = 2000, pola: bool = True,
            mono: bool = False, rt: bool = False,
            n_az_rt: int = 45, mrw: bool = True,
            mrw_gamma: float = 2.0, jtally: bool = False,
            scat_method: int = 2, nabs_tally: bool = False,
            dark: bool = False, age_cap: int = 100000,
            rt2: bool = False, n_theta_i: int = 15,
            n_phi_i: int = 15, origin: bool = False,
            mono_budget: str = "received", stop_alive=0,
            rt_est: str = "collision",
            rt_compact: int = 1024) -> MCState:
    """Advance the MC by at most ``n_iters`` lock-step iterations.

    Device executions are kept short (the host driver loops) so single XLA
    invocations stay well under infrastructure deadlines and progress can be
    reported.  State is donated: the loop runs in place on device.

    stop_alive: once the emission budget is spent, return to the host as
    soon as the live-lane count drops to this value — the host compacts
    the batch immediately instead of burning the rest of the chunk at
    full width on a nearly-empty batch (the drain used to cost ~1.5 s of
    a 2.7 s headline run).

    mono=False: thermal step (etape 1) with B&W reemission.
    mono=True: monochromatic observable step — forced scattering with albedo
    weighting (dust_transfer.f90:1065-1077); model.prob_e_cell /
    frac_e_stars must describe the per-wavelength emission split.
    """
    n_budget = jnp.asarray(n_packets, jnp.int32)
    stop_al = jnp.asarray(stop_alive, jnp.int32)
    it_end = state.it + n_iters

    def cond(s: MCState):
        n_alive = jnp.sum(s.alive.astype(jnp.int32))
        spent = s.emitted >= n_budget
        return ((s.it < it_end)
                & ((n_alive > 0) | ~spent)
                & ~(spent & (n_alive <= stop_al) & (n_alive > 0)))

    body = make_mc_step(model, key, n_budget, pola=pola, mono=mono, rt=rt,
                        n_az_rt=n_az_rt, mrw=mrw, mrw_gamma=mrw_gamma,
                        jtally=jtally, scat_method=scat_method,
                        nabs_tally=nabs_tally, dark=dark, age_cap=age_cap,
                        rt2=rt2, n_theta_i=n_theta_i, n_phi_i=n_phi_i,
                        origin=origin, mono_budget=mono_budget,
                        rt_est=rt_est, rt_compact=rt_compact)
    return jax.lax.while_loop(cond, body, state)


@jax.jit
def _summary(state: MCState):
    """(it, emitted, n_alive) in one device round-trip."""
    return state.it, state.emitted, jnp.sum(state.alive.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("b_small",))
def _compact(state: MCState, b_small: int) -> MCState:
    """Pack the surviving lanes of a mostly-dead batch into a smaller batch.

    Straggler drain: once the photon budget is spent, a handful of
    deep-random-walk packets force full-width iterations; compaction keeps
    only the survivors so the tail runs at a fraction of the cost.  Tally
    arrays are carried over unchanged.  Jitted: eager per-field gathers
    over a tunnelled TPU would cost seconds of dispatch latency."""
    B = state.x.shape[0]
    idx = jnp.nonzero(state.alive, size=b_small, fill_value=0)[0]
    valid = jnp.arange(b_small) < jnp.sum(state.alive.astype(jnp.int32))

    def take(a):
        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == B:
            return a[idx]
        return a

    out = MCState(*[take(f) for f in state])
    return out._replace(alive=out.alive & valid)


def run_thermal_mc(model: Model, key, n_packets: int,
                   batch: int = 16384, n_capt: int = 10,
                   max_iters: int = 1000000, pola: bool = True,
                   mono: bool = False, iters_per_call: int = 2000,
                   rt: bool = False, n_az_rt: int = 45,
                   compact_tail: bool = True, mrw: bool = True,
                   mrw_gamma: float = 2.0, age_cap: int = 100000,
                   jtally: bool = False, scat_method: int = 2,
                   nabs_tally: bool = False, progress=None,
                   rt2: bool = False, n_theta_i: int = 15,
                   n_phi_i: int = 15, origin: bool = False,
                   mono_budget: str = "received",
                   rt_est: str = "collision",
                   rt_compact: int = 1024) -> MCResult:
    """Run the MC to completion by chunked device calls (see `advance`)."""
    state = init_state(model, batch, n_capt, rt=rt, n_az_rt=n_az_rt,
                       jtally=jtally, rt2=rt2, n_theta_i=n_theta_i,
                       n_phi_i=n_phi_i, origin=origin, mono=mono)
    # static dark-zone switch: the reflection test costs two per-cell
    # gathers per iteration, elided when the model has no dark zone
    dark = bool(jax.device_get(jnp.any(model.dark_zone)))
    done_iters = 0
    b_cur = batch

    def stop_for(b):
        # next-rung alive threshold: the device loop returns as soon as
        # compaction to a smaller ladder width becomes possible
        if not compact_tail:
            return 0
        return 3000 if b > 4096 else 768 if b > 1024 else \
            96 if b > 128 else 0

    # adaptive chunking: n_iters is a DYNAMIC argument of `advance`, so
    # the per-call iteration count can track a wall-clock target without
    # recompiling.  Big Voronoi grids (1.5e5 cells) cost ~10-50x more
    # per iteration than the ref4.1 grid; a fixed 2000-iteration call
    # there runs minutes and CRASHES the tunnelled TPU worker (watchdog).
    # Small grids skip the probe: an extra host round-trip costs ~0.1 s
    # over the tunnel, noticeable on a 1.7 s headline run.
    chunk_iters = (min(iters_per_call, 500)
                   if model.grid.n_cells > 50_000 else iters_per_call)
    target_s = 8.0
    import time as _time
    first_call = True
    while done_iters < max_iters:
        t_call = _time.time()
        state = advance(model, key, state, n_packets,
                        n_iters=min(chunk_iters,
                                    max_iters - done_iters),
                        pola=pola, mono=mono, rt=rt, n_az_rt=n_az_rt,
                        mrw=mrw, mrw_gamma=mrw_gamma, jtally=jtally,
                        scat_method=scat_method, nabs_tally=nabs_tally,
                        dark=dark, age_cap=age_cap, rt2=rt2,
                        n_theta_i=n_theta_i, n_phi_i=n_phi_i,
                        origin=origin, mono_budget=mono_budget,
                        rt_est=rt_est, rt_compact=rt_compact,
                        stop_alive=stop_for(b_cur))
        # ONE jitted summary + ONE transfer per chunk: eager per-field
        # reads over a tunnelled TPU cost ~0.1s dispatch latency each
        prev_iters = done_iters
        done_iters, emitted, n_alive = (
            int(v) for v in jax.device_get(_summary(state)))
        dt_call = _time.time() - t_call
        ran = max(done_iters - prev_iters, 1)
        if first_call:
            first_call = False          # compile time pollutes the probe
        elif ran >= chunk_iters // 2:   # untruncated-enough to time
            per_it = dt_call / ran
            chunk_iters = int(min(max(target_s / max(per_it, 1e-7), 100),
                                  iters_per_call))
        if progress is not None:
            progress(done_iters, emitted, n_alive)
        if compact_tail and emitted >= n_packets and n_alive > 0:
            # drain ladder: compact stragglers down the fixed widths —
            # every distinct batch size costs an XLA compile, so only
            # these three widths ever exist
            target = b_cur
            for b_new, thresh in ((4096, 3000), (1024, 768), (128, 96)):
                if n_alive <= thresh and target > b_new:
                    target = b_new
            if target < b_cur:
                state = _compact(state, target)
                b_cur = target
        if emitted >= n_packets and n_alive == 0:
            break
    return MCResult(xkj=state.xkj, nabs=state.nabs, sed=state.sed,
                    emitted=state.emitted, n_iters=state.it,
                    n_lost=jnp.sum(state.alive.astype(jnp.int32))
                    + state.nkill,
                    xi=state.xi, xj=state.xj, orig=state.orig,
                    nsent=state.nsent)


def mean_intensity(model: Model, wl_dlam_um, xj, n_packets):
    """Per-cell mean specific intensity J_lambda (L, n_cells) in
    W m^-2 m^-1 sr^-1 from the per-lambda path tally
    (J = sum l E_packet / (4 pi V), reference output.f90:2243-2330).

    wl_dlam_um: (L,) wavelength-bin widths [micron]."""
    import numpy as np

    from .. import constants as cst

    n_cells = model.grid.n_cells
    L = model.n_lambda
    l_packet = float(model.l_tot) / float(n_packets)      # W per packet
    xj2 = np.asarray(xj, np.float64).reshape(L, n_cells)
    V_m3 = np.asarray(model.volume, np.float64) * cst.AU3_to_m3
    dlam_m = np.asarray(wl_dlam_um, np.float64) * 1e-6
    return (xj2 * l_packet * cst.AU_to_m
            / (4.0 * np.pi * V_m3[None, :] * dlam_m[:, None]))


def final_temperature(model: Model, xkj, n_packets,
                      extra_heating=None) -> jax.Array:
    """Cell temperature from the summed kappa*J tally (Temp_finale via
    Temp_LTE with id=0, thermal_emission.f90:649-706,870).

    extra_heating: optional per-cell power [W] (viscous dissipation,
    Phantom dudt, ...) added to the MC heating — the reference's
    extra-heating channel in init_reemission (thermal_emission.f90:404)."""
    l_packet = model.l_tot / jnp.asarray(n_packets, xkj.dtype)
    heat = xkj * l_packet
    if extra_heating is not None:
        heat = heat + jnp.asarray(extra_heating, xkj.dtype)
    qheat = heat / model.volume
    logq = jnp.log(jnp.maximum(qheat, 1e-300))
    n_T = model.tab_temp.shape[0]
    p = model.p_icell
    ti = jnp.clip(_row_searchsorted(model.log_qcool, p, logq), 1, n_T - 1)
    q0 = _fg(model.log_qcool, p * n_T + ti - 1)
    q1 = _fg(model.log_qcool, p * n_T + ti)
    frac = jnp.clip((logq - q0) / jnp.maximum(q1 - q0, 1e-30), 0.0, 1.0)
    logT = (jnp.log(model.tab_temp[ti]) * frac
            + jnp.log(model.tab_temp[ti - 1]) * (1.0 - frac))
    t_min = model.tab_temp[0]
    cold = logq < model.log_qcool[p, 0]
    return jnp.where(cold, t_min, jnp.exp(logT))
