"""Atmosphere/MHD model inputs (VERDICT r2 item 10; reference
read_1d_models.f90, read_spherical_grid.f90, mhd2mcfost.f90)."""
import numpy as np
import pytest

from mcfost_tpu import constants as cst
from mcfost_tpu.io.atmos import (Atmos1D, MHDPoints, SphereMesh,
                                 read_mhd_ascii, read_model_1d,
                                 read_sphere_mesh, write_sphere_mesh)


def _write_model_1d(path, nr=30):
    rstar = 6.96e8
    r = np.geomspace(1.0, 10.0, nr)                     # Rstar units
    T = 6000.0 * r ** -0.6
    rho = 1e-6 * r ** -8.0
    ne = 1e18 * r ** -6.0
    vt = np.full(nr, 2e3)
    v = np.stack([1e4 * (1 - 1 / r), np.zeros(nr), np.zeros(nr)], 1)
    with open(path, "w") as f:
        f.write(f"{rstar}\n{nr}\n")
        for i in range(nr):
            f.write(f"{r[i]} {T[i]} {rho[i]} {ne[i]} {vt[i]} "
                    f"{v[i,0]} {v[i,1]} {v[i,2]} 1\n")
    return rstar, r, T


def test_read_model_1d(tmp_path):
    p = str(tmp_path / "atmos.dat")
    rstar, r, T = _write_model_1d(p)
    atm = read_model_1d(p)
    assert atm.rstar == rstar
    assert atm.r.shape == (30,)
    np.testing.assert_allclose(atm.r, r * rstar)        # scaled to m
    np.testing.assert_allclose(atm.T, T)
    assert (atm.nHtot > 0).all()
    assert atm.v.shape == (30, 3)


def test_sphere_mesh_roundtrip(tmp_path):
    n1, n2, n3 = 12, 8, 1
    rng = np.random.default_rng(0)
    sm = SphereMesh(
        r_walls=np.geomspace(1.0, 100.0, n1 + 1),
        th_walls=np.linspace(0.0, np.pi / 2, n2 + 1),
        phi_walls=np.array([0.0]),
        accretion_shock=True, T_hp=8000.0, T_preshock=1e6,
        T=rng.uniform(3e3, 8e3, (n1, n2, n3)),
        rho=rng.uniform(1e-12, 1e-8, (n1, n2, n3)),
        ne=rng.uniform(1e14, 1e18, (n1, n2, n3)),
        v=rng.normal(0, 1e4, (n1, n2, n3, 3)),
        vturb=np.full((n1, n2, n3), 1.5e3),
        dz=np.ones((n1, n2, n3), np.int32),
        gas_to_dust=100.0,
        rho_dust=rng.uniform(1e-16, 1e-12, (n1, n2, n3)))
    p = str(tmp_path / "mesh.bin")
    write_sphere_mesh(p, sm)
    back = read_sphere_mesh(p)
    np.testing.assert_allclose(back.r_walls, sm.r_walls)
    np.testing.assert_allclose(back.th_walls, sm.th_walls)
    np.testing.assert_allclose(back.T, sm.T)
    np.testing.assert_allclose(back.rho, sm.rho)
    np.testing.assert_allclose(back.ne, sm.ne)
    np.testing.assert_allclose(back.v, sm.v, rtol=1e-6)   # f32 round-trip
    assert back.accretion_shock and back.T_hp == 8000.0
    assert back.gas_to_dust == 100.0


def test_read_mhd_ascii(tmp_path):
    p = str(tmp_path / "mhd.dat")
    n = 50
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-10, 10, (n, 3))
    with open(p, "w") as f:
        f.write("# bifrost-like model\n")
        f.write("8000.0 1.0e6 1\n")
        for i in range(n):
            f.write(" ".join(str(v) for v in [
                xyz[i, 0], xyz[i, 1], xyz[i, 2], 5000.0, 1e-8, 1e-3,
                0.0, 0.0, -1e4, 2e3, 1, 0.5]) + "\n")
    m = read_mhd_ascii(p)
    assert m.T_hp == 8000.0 and m.accretion_shock
    assert m.xyz.shape == (n, 3)
    np.testing.assert_allclose(m.xyz, xyz)
    assert (m.dz == 1).all()
    assert m.h.shape == (n,)


def test_run_model_1d_pipeline(tmp_path):
    """-model_1d end-to-end: 1D spherical grid, imposed gas state,
    atomic cube written."""
    import os
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.runner import run_model_1d

    p = str(tmp_path / "atmos.dat")
    # disk-scale atmosphere (AU-scale radii in m)
    rstar = 10.0 * cst.AU_to_m
    nr = 20
    r = np.geomspace(1.0, 20.0, nr)
    T = 6000.0 * r ** -0.5
    rho = 1e-9 * r ** -6.0
    ne = 1e16 * r ** -4.0
    with open(p, "w") as f:
        f.write(f"{rstar}\n{nr}\n")
        for i in range(nr):
            f.write(f"{r[i]} {T[i]} {rho[i]} {ne[i]} 2e3 "
                    f"-1e4 0 0 1\n")

    para = Para()
    para.wavelengths.n_lambda = 8
    para.maps.nx = para.maps.ny = 21
    for sp in para.dust[0]:
        sp.n_grains = 4
    model, host, gas = run_model_1d(para, p, root_dir=str(tmp_path),
                                    verbose=False)
    assert np.isfinite(gas.T).all() and (gas.ne > 0).all()
    assert os.path.isfile(os.path.join(str(tmp_path), "data_atom",
                                       "atomic_maps.fits.gz"))
