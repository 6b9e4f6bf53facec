"""Voronoi tessellation + traversal tests.

The native C++ tessellation (native/voronoi.cpp) is checked against
scipy's Qhull on neighbour sets, and against exact invariants:
* cell volumes sum to the bounding-box volume;
* a regular lattice gives equal cubic cells;
* point location finds the nearest seed (Voronoi definition);
* ray traversal visits cells whose seeds are nearest along the path and
  path lengths sum to the chord length.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mcfost_tpu.grids import voronoi as vg


BBOX = np.array([-1.0, 1.0, -1.0, 1.0, -1.0, 1.0])


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    pts = rng.uniform(-0.95, 0.95, (400, 3))
    return pts


def test_volumes_sum_to_box(cloud):
    vol, nb, n_nb, _ = vg.tessellate(cloud, BBOX)
    assert vol.shape == (400,)
    assert np.all(vol > 0)
    box = np.prod(BBOX[1::2] - BBOX[0::2])
    assert vol.sum() == pytest.approx(box, rel=1e-6)


def test_lattice_cells_are_cubes():
    # tiny jitter breaks the exact 4-cocircular degeneracies of a perfect
    # lattice, mirroring the reference's default randomised Voronoi
    # (-not_random_Voronoi, init_mcfost.f90:1510)
    g = np.linspace(-0.75, 0.75, 4)
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    pts = pts + np.random.default_rng(0).normal(0, 1e-6, pts.shape)
    vol, nb, n_nb, _ = vg.tessellate(pts, BBOX)
    np.testing.assert_allclose(vol, 0.125, rtol=1e-4)
    assert vol.sum() == pytest.approx(8.0, rel=1e-9)
    # interior cells include their 6 axis neighbours (the jitter adds
    # micro-faces from near-tangent diagonal bisectors, which is fine)
    interior = np.where(np.all(np.abs(pts) < 0.6, axis=1))[0]
    for i in interior:
        d = np.linalg.norm(pts - pts[i], axis=1)
        axis_nb = set(np.argsort(d)[1:7])
        assert axis_nb <= set(int(j) for j in nb[i] if j >= 0)


def test_neighbours_match_qhull(cloud):
    from scipy.spatial import Voronoi as SciVor
    vol, nb, n_nb, _ = vg.tessellate(cloud, BBOX)
    sv = SciVor(cloud)
    qhull_nb = [set() for _ in range(len(cloud))]
    for (a, b) in sv.ridge_points:
        qhull_nb[a].add(b)
        qhull_nb[b].add(a)
    n_checked = 0
    for i in range(len(cloud)):
        ours = set(int(j) for j in nb[i] if j >= 0)
        # qhull neighbour sets are not box-clipped: ridges can lie fully
        # outside the bbox, so ours must be a subset; for seeds far from
        # the walls the sets must match exactly
        assert ours <= qhull_nb[i], f"cell {i}: extra neighbours"
        if np.all(np.abs(cloud[i]) < 0.5):
            missing = qhull_nb[i] - ours
            # any missing neighbour must be due to box clipping of a
            # far ridge — verify the bisector midpoint is outside the cell
            for m in missing:
                mid = 0.5 * (cloud[i] + cloud[m])
                d_mid = np.linalg.norm(mid - cloud[i])
                d_others = np.linalg.norm(cloud - mid, axis=1)
                d_others[i] = np.inf
                # midpoint closer to a third seed -> face clipped away: ok
                assert d_others.min() < d_mid
            n_checked += 1
    assert n_checked > 10


def test_locate_is_nearest_seed(cloud):
    grid = vg.build_voronoi_grid(cloud, BBOX)
    rng = np.random.default_rng(3)
    q = rng.uniform(-0.99, 0.99, (500, 3))
    icell = np.asarray(vg.locate(grid, jnp.asarray(q[:, 0], jnp.float32),
                                 jnp.asarray(q[:, 1], jnp.float32),
                                 jnp.asarray(q[:, 2], jnp.float32))) - 1
    from scipy.spatial import cKDTree
    _, true_idx = cKDTree(cloud).query(q)
    frac = np.mean(icell == true_idx)
    assert frac > 0.995      # f32 plane tests can tie on exact boundaries


def test_traversal_chord_and_cells(cloud):
    grid = vg.build_voronoi_grid(cloud, BBOX)
    rng = np.random.default_rng(11)
    B = 64
    # rays from outside the box through it
    origin = np.stack([np.full(B, -2.0), rng.uniform(-0.8, 0.8, B),
                       rng.uniform(-0.8, 0.8, B)], -1)
    dirn = np.stack([np.ones(B), np.zeros(B), np.zeros(B)], -1)

    x = jnp.asarray(origin[:, 0], jnp.float32)
    y = jnp.asarray(origin[:, 1], jnp.float32)
    z = jnp.asarray(origin[:, 2], jnp.float32)
    u = jnp.asarray(dirn[:, 0], jnp.float32)
    v = jnp.asarray(dirn[:, 1], jnp.float32)
    w = jnp.asarray(dirn[:, 2], jnp.float32)

    x, y, z, icell, hit = vg.move_to_grid(grid, x, y, z, u, v, w)
    assert bool(np.all(np.asarray(hit)))

    total_l = np.zeros(B)
    alive = np.asarray(hit)
    from scipy.spatial import cKDTree
    tree = cKDTree(cloud)
    for _ in range(200):
        x1, y1, z1, inext, l = vg.cross_cell(grid, x, y, z, u, v, w, icell)
        ln = np.asarray(l)
        total_l += np.where(alive, ln, 0.0)
        # the cell being crossed must be the nearest seed of the midpoint
        mids = np.stack([np.asarray(x) + 0.5 * ln * np.asarray(u),
                         np.asarray(y) + 0.5 * ln * np.asarray(v),
                         np.asarray(z) + 0.5 * ln * np.asarray(w)], -1)
        _, near = tree.query(mids)
        cur = np.asarray(icell) - 1
        ok = ~alive | (near == cur) | (ln < 1e-4)
        assert ok.mean() > 0.97
        x, y, z, icell = x1, y1, z1, inext
        alive = alive & (np.asarray(inext) >= 1)
        if not alive.any():
            break
    assert not alive.any()
    # chord length through the box: x from -1 to 1 -> 2.0
    np.testing.assert_allclose(total_l, 2.0, rtol=5e-3)


def test_tessellation_cache(tmp_path, monkeypatch):
    """Disk cache keyed on particle SHA1 (Voronoi.f90:647-751): second
    tessellation of the same cloud comes from the cache bit-for-bit."""
    import os
    from mcfost_tpu.grids.voronoi import tessellate
    monkeypatch.setenv("MCFOST_TPU_VORONOI_CACHE", str(tmp_path))
    rng = np.random.default_rng(11)
    pts = rng.uniform(-1, 1, (200, 3))
    bbox = np.array([-1.2, 1.2, -1.2, 1.2, -1.2, 1.2])
    v1, nb1, nn1, mr1 = tessellate(pts, bbox)
    files = [f for f in os.listdir(str(tmp_path))
             if f.startswith("voronoi_")]
    assert len(files) == 1
    # poison the library path indirectly: cached load must not need it
    v2, nb2, nn2, mr2 = tessellate(pts, bbox)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(nb1, nb2)
    # different cloud -> different cache entry
    tessellate(rng.uniform(-1, 1, (180, 3)), bbox)
    files = [f for f in os.listdir(str(tmp_path))
             if f.startswith("voronoi_")]
    assert len(files) == 2
