"""Stellar-atmosphere / MHD model inputs for the atomic transfer path.

Three input families of the reference, all providing the FULL gas state
(T, rho, ne, v, vturb) instead of the analytic disk model:

* ``-model_1d``: 1D stellar atmospheres (MARCS/Kurucz/CMFGEN/MULTI in
  the reference's common text format, read_1d_models.f90:28-120);
* ``-sphere_mesh``: a structured spherical mesh in the reference's
  binary stream format (read_spherical_grid.f90:24-210);
* ``-mhd_voronoi``: MHD (e.g. Bifrost) points in the ascii format of
  mhd2mcfost.f90:21-167, tessellated into a Voronoi mesh.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants as cst

WGHT_PER_H = 1.4                       # mean atomic weight per H nucleus
MH_G = 1.008 * 1.66053906660e-24       # H mass [g]


@dataclass
class Atmos1D:
    rstar: float                       # [m] stellar radius
    r: np.ndarray                      # (N,) radius [m or Rstar units]
    T: np.ndarray                      # (N,) [K]
    rho: np.ndarray                    # (N,) [kg/m^3]
    ne: np.ndarray                     # (N,) [m^-3]
    vturb: np.ndarray                  # (N,) [m/s]
    v: np.ndarray                      # (N, 3) spherical comps [m/s]
    iz: np.ndarray                     # (N,) compute flag

    @property
    def nHtot(self) -> np.ndarray:
        return self.rho * 1e3 / MH_G / WGHT_PER_H      # [m^-3]


def read_model_1d(path: str) -> Atmos1D:
    """Common 1D atmosphere format (read_model_1d,
    read_1d_models.f90:28-120): rstar; nr; rows of
    r T rho ne vturb v1 v2 v3 iz."""
    with open(path) as f:
        toks = f.read().split()
    rstar = float(toks[0])
    nr = int(float(toks[1]))
    rows = np.asarray(toks[2:2 + 9 * nr], np.float64).reshape(nr, 9)
    r = rows[:, 0]
    if r.max() <= 100.0 * max(rstar, 1.0) and r.max() < 1e6:
        # radii given in units of rstar
        r = r * rstar
    return Atmos1D(rstar=rstar, r=r, T=rows[:, 1], rho=rows[:, 2],
                   ne=rows[:, 3], vturb=rows[:, 4], v=rows[:, 5:8],
                   iz=rows[:, 8].astype(int))


@dataclass
class SphereMesh:
    r_walls: np.ndarray                # (n_rad+1,) [AU]
    th_walls: np.ndarray               # (n_theta+1,) [rad] 0..pi or pi/2
    phi_walls: np.ndarray              # (n_az(+1),) [rad]
    accretion_shock: bool
    T_hp: float
    T_preshock: float
    T: np.ndarray                      # (n_rad, n_theta, n_az)
    rho: np.ndarray                    # same [kg/m^3]
    ne: np.ndarray                     # same [m^-3]
    v: np.ndarray                      # (n_rad, n_theta, n_az, 3) [m/s]
    vturb: np.ndarray
    dz: np.ndarray                     # compute flags
    gas_to_dust: float
    rho_dust: np.ndarray

    @property
    def nHtot(self) -> np.ndarray:
        return self.rho * 1e3 / MH_G / WGHT_PER_H


def read_sphere_mesh(path: str) -> SphereMesh:
    """Binary structured spherical model
    (read_spherical_grid_parameters + read_spherical_model,
    read_spherical_grid.f90:24-210): stream of
    [i32 n1][f64 walls1(n1+1)] [i32 n2][f64 walls2(n2+1)]
    [i32 n3][f64 walls3(n3 or n3+1)] [i32 acc][f64 T_hp][f64 T_preshock]
    then T, rho, ne (f64 cubes), v (f32 cube x3), vturb (f64), dz (i32),
    gas_to_dust (f64), rho_dust (f64)."""
    with open(path, "rb") as f:
        def ints(n):
            return np.fromfile(f, "<i4", n)

        def flts(n, dt="<f8"):
            return np.fromfile(f, dt, n)

        n1 = int(ints(1)[0])
        x1 = flts(n1 + 1)
        n2 = int(ints(1)[0])
        x2 = flts(n2 + 1)
        n3 = int(ints(1)[0])
        x3 = flts(n3 + 1 if n3 > 1 else n3)
        acc = int(ints(1)[0])
        t_hp = float(flts(1)[0])
        t_pre = float(flts(1)[0])
        shape = (n1, n2, n3)
        nsz = n1 * n2 * n3
        # Fortran column-major cubes
        def cube(dt="<f8"):
            return np.fromfile(f, dt, nsz).reshape(shape, order="F")
        T = cube()
        rho = cube()
        ne = cube()
        v = np.stack([cube("<f4") for _ in range(3)], -1).astype(np.float64)
        vt = cube()
        dz = cube("<i4")
        g2d = float(flts(1)[0])
        rho_d = cube()
    # theta walls come largest-first (pi..0); store ascending
    if x2[0] > x2[-1]:
        x2 = x2[::-1].copy()
    return SphereMesh(r_walls=x1, th_walls=x2, phi_walls=x3,
                      accretion_shock=acc == 1, T_hp=t_hp,
                      T_preshock=t_pre, T=T, rho=rho, ne=ne, v=v,
                      vturb=vt, dz=dz, gas_to_dust=g2d, rho_dust=rho_d)


def write_sphere_mesh(path: str, sm: SphereMesh):
    """Writer for round-trip tests and interop."""
    with open(path, "wb") as f:
        np.asarray([len(sm.r_walls) - 1], "<i4").tofile(f)
        np.asarray(sm.r_walls, "<f8").tofile(f)
        np.asarray([len(sm.th_walls) - 1], "<i4").tofile(f)
        # reference convention: theta stored largest-first
        np.asarray(sm.th_walls[::-1], "<f8").tofile(f)
        n3 = sm.T.shape[2]
        np.asarray([n3], "<i4").tofile(f)
        np.asarray(sm.phi_walls, "<f8").tofile(f)
        np.asarray([1 if sm.accretion_shock else 0], "<i4").tofile(f)
        np.asarray([sm.T_hp, sm.T_preshock], "<f8").tofile(f)
        for cube in (sm.T, sm.rho, sm.ne):
            np.asarray(cube, "<f8").ravel(order="F").tofile(f)
        for k in range(3):
            np.asarray(sm.v[..., k], "<f4").ravel(order="F").tofile(f)
        np.asarray(sm.vturb, "<f8").ravel(order="F").tofile(f)
        np.asarray(sm.dz, "<i4").ravel(order="F").tofile(f)
        np.asarray([sm.gas_to_dust], "<f8").tofile(f)
        np.asarray(sm.rho_dust, "<f8").ravel(order="F").tofile(f)


@dataclass
class MHDPoints:
    T_hp: float
    T_preshock: float
    accretion_shock: bool
    xyz: np.ndarray                    # (N, 3) [AU]
    T: np.ndarray
    mass_gas: np.ndarray
    ne_on_mass: np.ndarray
    v: np.ndarray                      # (N, 3) [m/s]
    vturb: np.ndarray
    dz: np.ndarray
    h: np.ndarray                      # smoothing length


def read_mhd_ascii(path: str) -> MHDPoints:
    """MHD/Bifrost-type point model (setup_mhd_to_mcfost,
    mhd2mcfost.f90:21-167): one skipped header line, then
    'T_hp T_preshock acspot', then rows of
    x y z T mass_gas ne_on_massgas vx vy vz vturb dz h."""
    with open(path) as f:
        f.readline()
        t_hp, t_pre, acc = f.readline().split()[:3]
        rows = np.loadtxt(f)
    if rows.ndim == 1:
        rows = rows[None, :]
    return MHDPoints(T_hp=float(t_hp), T_preshock=float(t_pre),
                     accretion_shock=int(float(acc)) == 1,
                     xyz=rows[:, 0:3], T=rows[:, 3], mass_gas=rows[:, 4],
                     ne_on_mass=rows[:, 5], v=rows[:, 6:9],
                     vturb=rows[:, 9], dz=rows[:, 10].astype(int),
                     h=rows[:, 11])
