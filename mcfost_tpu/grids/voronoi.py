"""Voronoi mesh grid: tessellation binding + device-side traversal.

The reference builds a Voronoi mesh from SPH particles through libvoro++
(Voronoi_tesselation, src/Voronoi.f90:197-643 calling voro_C,
src/voro++_wrapper.cpp:43-277) and traverses it by finding the minimum
positive intersection with the bisector planes of a cell's neighbours
(cross_Voronoi_cell, src/Voronoi.f90:839-992).

TPU-native design:
* the tessellation runs in the native C++ component
  (native/voronoi.cpp, OpenMP) producing *fixed-width padded* neighbour
  lists — the TPU traversal then evaluates all MAX_NB candidate planes of
  every packet's cell branch-free in one vectorized reduction (the
  reference's per-neighbour scalar loop, Voronoi.f90:905-936, becomes a
  masked min over a (B, MAX_NB) array);
* bisector planes are not stored: normals/offsets are recomputed on the
  fly from two seed gathers, trading HBM for cheap VPU flops;
* point location for rays entering from outside uses a host-precomputed
  voxel -> nearest-seed table followed by a device-side plane-descent walk
  (replaces the kd-tree wall search, Voronoi.f90:1586-1640).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _np_dt(dtype):
    # numpy-side cast avoids one XLA convert_element_type
    # compilation per distinct array shape (slow over tunnels)
    return np.dtype(dtype.dtype if hasattr(dtype, 'dtype') else dtype)

_NATIVE = None


def _load_native():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE if _NATIVE is not False else None
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    so = os.path.join(here, "native", "libvoronoi.so")
    if not os.path.isfile(so):
        try:
            subprocess.run(["make", "-C", os.path.join(here, "native"),
                            "libvoronoi.so"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            _NATIVE = False
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.voronoi_tessellate.restype = ctypes.c_int
        lib.voronoi_tessellate.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
        ]
        _NATIVE = lib
        return lib
    except Exception:
        _NATIVE = False
        return None


NONE_NB = np.iinfo(np.int32).min


def tessellate(points: np.ndarray, bbox: np.ndarray, max_nb: int = 32):
    """Voronoi tessellation of `points` (N, 3) clipped to `bbox`
    [xmin, xmax, ymin, ymax, zmin, zmax].

    Returns (volumes (N,), neighbours (N, max_nb) int32, n_nb (N,),
    max_vertex_r (N,)).  Neighbour codes: >=0 seed id, -1..-6 box wall,
    NONE_NB padding.

    Results are cached on disk keyed by the SHA1 of (points, bbox) —
    the reference's tessellation cache (save_Voronoi_tesselation /
    read_saved_Voronoi_tesselation, Voronoi.f90:647-751).  Cache
    location: $MCFOST_TPU_VORONOI_CACHE, else ./.mcfost_tpu_cache when
    that directory exists; set MCFOST_TPU_NO_VORONOI_CACHE=1 to skip."""
    pts = np.ascontiguousarray(points, np.float64)
    n = pts.shape[0]
    bbox = np.ascontiguousarray(bbox, np.float64)

    cache_path = None
    if not os.environ.get("MCFOST_TPU_NO_VORONOI_CACHE"):
        cdir = os.environ.get("MCFOST_TPU_VORONOI_CACHE")
        if cdir is None and os.path.isdir(".mcfost_tpu_cache"):
            cdir = ".mcfost_tpu_cache"
        if cdir:
            import hashlib
            key = hashlib.sha1(pts.tobytes()
                               + bbox.tobytes()).hexdigest()[:16]
            cache_path = os.path.join(cdir, f"voronoi_{key}.npz")
            if os.path.isfile(cache_path):
                d = np.load(cache_path)
                if d["volumes"].shape[0] == n:
                    return (d["volumes"], d["neighbours"], d["n_nb"],
                            d["maxr"])

    lib = _load_native()
    if lib is None:
        raise RuntimeError("native libvoronoi.so unavailable")
    while True:
        volumes = np.zeros(n)
        neighbours = np.zeros((n, max_nb), np.int32)
        n_nb = np.zeros(n, np.int32)
        maxr = np.zeros(n)
        n_over = lib.voronoi_tessellate(n, pts.reshape(-1), bbox, max_nb,
                                        volumes, neighbours.reshape(-1),
                                        n_nb, maxr)
        if n_over == 0:
            if cache_path is not None:
                try:
                    np.savez_compressed(cache_path, volumes=volumes,
                                        neighbours=neighbours, n_nb=n_nb,
                                        maxr=maxr)
                except OSError:
                    pass
            return volumes, neighbours, n_nb, maxr
        max_nb *= 2


class VoronoiGrid(NamedTuple):
    """Device-side Voronoi grid.  Cell index is the flat seed index + 1
    (0 = outside, mirroring the cylindrical convention ri=0 = cavity:
    there is no cavity for Voronoi, so 0 only appears pre-entry)."""
    seeds: jax.Array           # (N, 3) [AU]
    neighbours: jax.Array      # (N, MAX_NB) i32 (NONE_NB padded)
    volume: jax.Array          # (N,) [AU^3]
    bbox: jax.Array            # (6,)
    lookup: jax.Array          # (G, G, G) i32 voxel -> seed guess
    inradius: jax.Array        # (N,) distance seed -> nearest bisector/2
    planes: jax.Array          # (N, MAX_NB, 4) bisector planes [nx ny nz
                               # d], precomputed so one crossing costs ONE
                               # contiguous row-gather instead of a B*W
                               # random gather of neighbour seeds (the
                               # latter measured ~35 ms/iter at B=12k on
                               # a 1.5e5-cell mesh)

    @property
    def n_cells(self) -> int:
        return self.seeds.shape[0]


def build_voronoi_grid(points: np.ndarray, bbox, max_nb: int = 32,
                       lookup_res: int = 64, jitter: float = 0.0,
                       dtype=jnp.float32) -> VoronoiGrid:
    """jitter > 0 adds a relative random displacement that removes exact
    cocircular degeneracies (the reference randomises particle positions
    by default for the same reason; -not_random_Voronoi disables it)."""
    bbox = np.asarray(bbox, np.float64)
    if jitter > 0:
        scale = jitter * (bbox[1::2] - bbox[0::2]).max()
        points = points + np.random.default_rng(42).normal(
            0.0, scale, points.shape)
    volumes, neighbours, n_nb, _ = tessellate(points, bbox, max_nb)
    # trim the padding to the actual maximum degree
    width = int(n_nb.max())
    neighbours = neighbours[:, :width]

    # voxel -> nearest seed lookup (host, scipy cKDTree)
    from scipy.spatial import cKDTree
    tree = cKDTree(points)
    gx = np.linspace(bbox[0], bbox[1], lookup_res)
    gy = np.linspace(bbox[2], bbox[3], lookup_res)
    gz = np.linspace(bbox[4], bbox[5], lookup_res)
    G = np.stack(np.meshgrid(gx, gy, gz, indexing="ij"), -1).reshape(-1, 3)
    _, idx = tree.query(G)
    lookup = idx.reshape(lookup_res, lookup_res, lookup_res).astype(np.int32)

    # distance to the closest bisector plane (half distance to the nearest
    # seed) — used by the MRW criterion
    d_nn, _ = tree.query(points, k=2)
    inradius = 0.5 * d_nn[:, 1]

    # precomputed bisector planes per (cell, slot): normal toward the
    # neighbour and offset, padded slots get an impossible plane
    pts64b = np.asarray(points, np.float64)
    nb_safe = np.maximum(neighbours, 0)
    q = pts64b[nb_safe]                               # (N, W, 3)
    p = pts64b[:, None, :]
    n_pl = q - p
    d_pl = 0.5 * np.sum(n_pl * (q + p), -1)
    invalid = neighbours < 0
    n_pl[invalid] = 0.0
    d_pl[invalid] = 1e30                              # never crossed
    planes = np.concatenate([n_pl, d_pl[..., None]], -1)

    grid = VoronoiGrid(
        seeds=jnp.asarray(np.asarray(points, _np_dt(dtype))),
        neighbours=jnp.asarray(neighbours),
        volume=jnp.asarray(np.asarray(volumes, _np_dt(dtype))),
        bbox=jnp.asarray(np.asarray(bbox, _np_dt(dtype))),
        lookup=jnp.asarray(lookup),
        inradius=jnp.asarray(np.asarray(inradius, _np_dt(dtype))),
        planes=jnp.asarray(np.asarray(planes, _np_dt(dtype))),
    )
    pts64 = np.asarray(points, np.float64)
    from . import geometry as _geom
    _geom.register_host(grid, dict(
        volume=np.asarray(volumes, np.float64),
        r_grid=np.sqrt(pts64[:, 0] ** 2 + pts64[:, 1] ** 2),
        z_grid=pts64[:, 2].copy(), seeds=pts64))
    return grid


def _neighbour_planes(grid: VoronoiGrid, icell):
    """Bisector plane set of cells `icell` (B,): normals (B, W, 3) toward
    the neighbour and offsets d with n.x <= d inside
    (plane normal r_neighbour - r_cell, reference Voronoi.f90:893-904).
    Two contiguous row-gathers (planes + neighbour codes); padded slots
    carry d=1e30 so they are never the minimum."""
    nb = grid.neighbours[icell]                       # (B, W)
    valid = nb >= 0
    pl = grid.planes[icell]                           # (B, W, 4)
    return nb, valid, pl[..., :3], pl[..., 3]


def cross_cell(grid: VoronoiGrid, x, y, z, u, v, w, icell):
    """One cell crossing: minimum positive intersection over the cell's
    bisector planes and the box walls (cross_Voronoi_cell,
    Voronoi.f90:839-992, vectorized over packets x planes).

    Returns (x1, y1, z1, inext, l).  inext < 0 means the ray exits the
    box (wall code)."""
    dtype = x.dtype
    big = jnp.asarray(np.asarray(1e30, _np_dt(dtype)))
    i0 = icell - 1                                    # internal 0-based
    nb, valid, n, d = _neighbour_planes(grid, i0)
    pos = jnp.stack([x, y, z], -1)                    # (B, 3)
    dirn = jnp.stack([u, v, w], -1)

    ndotu = jnp.sum(n * dirn[:, None, :], -1)         # (B, W)
    ndotp = jnp.sum(n * pos[:, None, :], -1)
    t = (d - ndotp) / jnp.where(jnp.abs(ndotu) < 1e-30, 1e-30, ndotu)
    t = jnp.where(valid & (ndotu > 1e-30) & (t > 0), t, big)

    # box walls: +x,-x walls code -1.. -6 match native/voronoi.cpp order
    # (-1:x0, -2:x1, -3:y0, -4:y1, -5:z0, -6:z1)
    bb = grid.bbox
    wall_n = jnp.asarray([[-1, 0, 0], [1, 0, 0], [0, -1, 0],
                          [0, 1, 0], [0, 0, -1], [0, 0, 1]], dtype)
    wall_d = jnp.stack([-bb[0], bb[1], -bb[2], bb[3], -bb[4], bb[5]])
    wu = wall_n @ dirn.T                              # (6, B)
    wp = wall_n @ pos.T
    tw = (wall_d[:, None] - wp) / jnp.where(jnp.abs(wu) < 1e-30, 1e-30, wu)
    tw = jnp.where((wu > 1e-30) & (tw > 0), tw, big).T   # (B, 6)

    t_all = jnp.concatenate([t, tw], axis=1)          # (B, W+6)
    codes = jnp.concatenate(
        [nb, jnp.broadcast_to(jnp.arange(-1, -7, -1, dtype=jnp.int32)[None],
                              (x.shape[0], 6))], axis=1)
    k = jnp.argmin(t_all, axis=1)
    l = jnp.take_along_axis(t_all, k[:, None], 1)[:, 0]
    nxt = jnp.take_along_axis(codes, k[:, None], 1)[:, 0]
    # overshoot guard (1 + 1e-5, Voronoi.f90:919) applied to the position
    eps = jnp.asarray(1e-5, dtype)
    x1 = x + l * u * (1 + eps)
    y1 = y + l * v * (1 + eps)
    z1 = z + l * w * (1 + eps)
    inext = jnp.where(nxt >= 0, nxt + 1, nxt)         # 1-based or wall code
    return x1, y1, z1, inext, l


def locate(grid: VoronoiGrid, x, y, z, n_steps: int = 64):
    """Point location: voxel-table guess + plane-descent walk
    (replaces index_cell via kd-tree, Voronoi.f90:1586-1640).

    The walk moves to any neighbour whose bisector plane is violated
    until none is (guaranteed descent of distance-to-seed)."""
    bb = grid.bbox
    G = grid.lookup.shape[0]
    gi = jnp.clip(((x - bb[0]) / (bb[1] - bb[0]) * (G - 1)).astype(jnp.int32),
                  0, G - 1)
    gj = jnp.clip(((y - bb[2]) / (bb[3] - bb[2]) * (G - 1)).astype(jnp.int32),
                  0, G - 1)
    gk = jnp.clip(((z - bb[4]) / (bb[5] - bb[4]) * (G - 1)).astype(jnp.int32),
                  0, G - 1)
    icell = grid.lookup[gi, gj, gk]                   # (B,) 0-based
    pos = jnp.stack([x, y, z], -1)

    def step(st):
        it, icell, moving = st
        nb, valid, n, d = _neighbour_planes(grid, icell)
        viol = jnp.sum(n * pos[:, None, :], -1) - d   # > 0 -> outside
        viol = jnp.where(valid, viol, -1.0)
        k = jnp.argmax(viol, axis=1)
        worst = jnp.take_along_axis(viol, k[:, None], 1)[:, 0]
        nxt = jnp.take_along_axis(nb, k[:, None], 1)[:, 0]
        move = worst > 0
        return (it + 1, jnp.where(move, nxt, icell), jnp.any(move))

    # the voxel guess converges in a handful of descent steps; a fixed
    # 64-step fori here ran EVERY kernel iteration through the emission
    # refill and dominated big-Voronoi step time (~70 of 146 ms/iter at
    # 1.5e5 cells) — the while exits as soon as every point settles
    _, icell, _ = jax.lax.while_loop(
        lambda st: st[2] & (st[0] < n_steps), step,
        (jnp.zeros((), jnp.int32), icell, jnp.asarray(True)))
    return icell + 1                                  # 1-based


def is_inside(grid: VoronoiGrid, icell):
    return icell >= 1


def has_exited(grid: VoronoiGrid, icell):
    return icell < 0


def flat_index(grid: VoronoiGrid, icell):
    return icell - 1


def pos_in_cell(grid: VoronoiGrid, icell, r1, r2, r3):
    """Emission position inside cell: seed + jitter within the cell
    inradius (pos_em_cell_Voronoi, Voronoi.f90 uses rejection sampling;
    the inradius ball is always inside the cell, so no rejection is
    needed on device)."""
    i0 = icell - 1
    s = grid.seeds[i0]
    rr = grid.inradius[i0] * r1 ** (1.0 / 3.0)
    zn = 2.0 * r2 - 1.0
    srw = jnp.sqrt(jnp.maximum(1.0 - zn * zn, 0.0))
    arg = 2.0 * jnp.pi * r3
    return (s[:, 0] + rr * srw * jnp.cos(arg),
            s[:, 1] + rr * srw * jnp.sin(arg),
            s[:, 2] + rr * zn)


def move_to_grid(grid: VoronoiGrid, x, y, z, u, v, w):
    """Advance rays from outside to the bounding box, then locate."""
    dtype = x.dtype
    bb = grid.bbox
    big = jnp.asarray(np.asarray(1e30, _np_dt(dtype)))
    lo = jnp.stack([bb[0], bb[2], bb[4]])
    hi = jnp.stack([bb[1], bb[3], bb[5]])
    pos = jnp.stack([x, y, z], -1)
    dirn = jnp.stack([u, v, w], -1)
    inv = 1.0 / jnp.where(jnp.abs(dirn) < 1e-30, 1e-30, dirn)
    t0 = (lo[None] - pos) * inv
    t1 = (hi[None] - pos) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=1)
    hit = (tmax > jnp.maximum(tmin, 0.0))
    t_entry = jnp.where(tmin > 0, tmin * (1 + 1e-5), 0.0)
    t_entry = jnp.where(hit, t_entry, 0.0)
    x1 = x + t_entry * u
    y1 = y + t_entry * v
    z1 = z + t_entry * w
    icell = jnp.where(hit, locate(grid, x1, y1, z1), -1)
    return x1, y1, z1, icell, hit
