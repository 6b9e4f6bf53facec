"""Atomic models: data structures, RH-style file reader, builtin hydrogen.

Covers the reference's atomic-model layer (read_model_atom,
src/gas/io_atom.f90:25-450; atom_type.f90): levels (E, g, ionization
stage), bound-bound transitions (oscillator strengths -> Einstein
coefficients, damping parameters), hydrogenic / tabulated bound-free
cross-sections, and electron-collision rate data.

The builtin hydrogen model mirrors the reference's treatment of H
(Johnson 1972 for oscillator strengths and collision rates, the same
source as Johnson_CI / Johnson_CE in src/gas/collision_atom.f90:86-207)
so that `-atom` runs need no external data directory, exactly like the
builtin CO molecule for `-mol`.

All arrays are flat numpy (host side); the device kernels consume only the
per-cell tables derived from them.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .. import constants as cst

# --- physical constants for atomic physics (SI) ---
M_ELECTRON = 9.1093837015e-31          # kg
E_CHARGE = 1.602176634e-19             # C
EPSILON_0 = 8.8541878128e-12           # F/m
AMU_KG = 1.66053906660e-27             # kg
E_RYDBERG = 2.1798723611035e-18        # J (infinite-mass Rydberg)
A_BOHR = 5.29177210903e-11             # m
E_ION_HMIN = 0.754 * E_CHARGE          # H- binding energy [J]
SIGMA_THOMSON = 6.6524587321e-29       # m^2

# classical radiative constant C1 = 2 pi e^2 / (eps0 m_e c)  [m^2 Hz]
# (io_atom.f90:20: Aji = C1/lambda^2 (gi/gj) f)
C1_RAD = (2.0 * np.pi * E_CHARGE ** 2
          / (EPSILON_0 * M_ELECTRON * cst.c_light))


@dataclass
class CollisionTable:
    """One block of electron-collision data (read_collisions keywords,
    collision_atom.f90:684-687): OMEGA (ions), CE (neutrals), CI
    (ionization); rates interpolated linearly in T."""
    kind: str                       # "OMEGA" | "CE" | "CI"
    i: int                          # lower level (0-based)
    j: int                          # upper level (0-based)
    temps: np.ndarray               # (nT,)
    rates: np.ndarray               # (nT,)


@dataclass
class AtomModel:
    id: str
    weight: float                   # atomic mass [amu]
    abund: float                    # n(elem)/n(H)
    # levels
    E: np.ndarray                   # (N,) level energy from ground [J]
    g: np.ndarray                   # (N,) statistical weight
    stage: np.ndarray               # (N,) ionization stage (0 = neutral)
    label: List[str] = field(default_factory=list)
    # bound-bound
    line_i: np.ndarray = None       # (L,) lower level index
    line_j: np.ndarray = None       # (L,) upper level index
    Aji: np.ndarray = None          # (L,) [1/s]
    Bji: np.ndarray = None          # (L,) [m^2/(J s)] intensity units
    Bij: np.ndarray = None
    fosc: np.ndarray = None
    lambda0: np.ndarray = None      # (L,) [nm]
    Grad: np.ndarray = None         # natural damping [1/s]
    cStark: np.ndarray = None       # quadratic Stark coefficient
    cvdW: np.ndarray = None         # (L, 4) van der Waals coefficients
    vdw_method: np.ndarray = None   # (L,) 'UNSOLD' | 'BARKLEM' per line
    voigt: np.ndarray = None        # (L,) bool
    # bound-free
    cont_i: np.ndarray = None       # (K,)
    cont_j: np.ndarray = None
    alpha0: np.ndarray = None       # (K,) threshold cross-section [m^2]
    cont_lambda0: np.ndarray = None  # (K,) threshold wavelength [nm]
    hydrogenic: np.ndarray = None   # (K,) bool: alpha ~ (nu0/nu)^3
    cont_lambda_file: list = field(default_factory=list)
    cont_alpha_file: list = field(default_factory=list)
    # collisions
    collisions: List[CollisionTable] = field(default_factory=list)
    johnson_collisions: bool = False   # builtin H: Johnson 1972 CE+CI

    @property
    def n_levels(self):
        return len(self.E)

    @property
    def n_lines(self):
        return len(self.line_i)

    @property
    def n_cont(self):
        return len(self.cont_i)


# ---------------------------------------------------------------------------
# Johnson (1972, ApJ 174, 227) hydrogen formulas — the same physics the
# reference uses for H collisions (collision_atom.f90:86-207) and that
# yields its oscillator strengths for hydrogenic transitions.
# ---------------------------------------------------------------------------

def _johnson_g(n: int, x):
    """Gaunt-factor expansion g(n, x) = g0 + g1/x + g2/x^2."""
    if n == 1:
        g0, g1, g2 = 1.1330, -0.4059, 0.07014
    elif n == 2:
        g0, g1, g2 = 1.0785, -0.2319, 0.02947
    else:
        g0 = 0.9935 + 0.2328 / n - 0.1296 / n ** 2
        g1 = -(0.6282 - 0.5598 / n + 0.5299 / n ** 2) / n
        g2 = (0.3887 - 1.181 / n + 1.470 / n ** 2) / n ** 2
    return g0 + g1 / x + g2 / x ** 2


def johnson_fosc(n: int, np_: int) -> float:
    """Absorption oscillator strength f(n -> n') for hydrogen
    (Johnson 1972 eq. 4-6)."""
    x = 1.0 - (n / np_) ** 2
    return (32.0 / (3.0 * np.sqrt(3.0) * np.pi)
            * n / np_ ** 3 / x ** 3 * _johnson_g(n, x))


def _e1(t):
    from scipy.special import exp1
    return exp1(t)


def _e2(t):
    from scipy.special import expn
    return expn(2, t)


def johnson_ce(T, n_levels: int, weight: float = 1.008) -> np.ndarray:
    """Electron-impact excitation rate coefficients C(n->n') [m^3/s]
    for hydrogen, vectorized over temperature (Johnson 1972 eq. 36;
    reference Johnson_CE, collision_atom.f90:151-207).

    Returns (nT, n_levels-1, n_levels-1): C[:, i, j] with j > i (0-based
    bound levels)."""
    T = np.atleast_1d(np.asarray(T, np.float64))
    nb = n_levels - 1                       # bound levels
    out = np.zeros((T.shape[0], nb, nb))
    deltam = 1.0 + M_ELECTRON / (weight * AMU_KG)
    C0 = np.sqrt(8.0 * cst.kb * T / (np.pi * M_ELECTRON))
    pia02x2 = 2.0 * np.pi * A_BOHR ** 2
    for i in range(1, nb + 1):
        n = float(i)
        if i == 1:
            rn, bn = 0.45, -0.603
        else:
            rn = 1.94 * n ** (-1.57)
            bn = (4.0 - 18.63 / n + 36.24 / n ** 2 - 28.09 / n ** 3) / n
        En = E_RYDBERG / deltam / n ** 2
        for jj in range(i + 1, nb + 1):
            npr = float(jj)
            x = 1.0 - (n / npr) ** 2
            f = johnson_fosc(i, jj)
            rnnp = rn * x
            Annp = 2.0 * n * n * f / x
            y = x * En / (cst.kb * T)
            Bnnp = (4.0 * n ** 4 / (npr ** 3 * x * x)
                    * (1.0 + 4.0 / (3.0 * x) + bn / x ** 2))
            z = rnnp + y
            S = (C0 * pia02x2 * n * n * y * y / x
                 * (Annp * ((1.0 / y + 0.5) * _e1(y)
                            - (1.0 / z + 0.5) * _e1(z))
                    + (Bnnp - Annp * np.log(2.0 * n * n / x))
                    * (_e2(y) / y - _e2(z) / z)))
            out[:, i - 1, jj - 1] = S
    return out


def johnson_ci(T, n_levels: int, weight: float = 1.008) -> np.ndarray:
    """Electron-impact ionization rate coefficients C(n->k) [m^3/s]
    (Johnson 1972 eq. 39; reference Johnson_CI,
    collision_atom.f90:86-148).  Returns (nT, n_levels-1)."""
    T = np.atleast_1d(np.asarray(T, np.float64))
    nb = n_levels - 1
    out = np.zeros((T.shape[0], nb))
    deltam = 1.0 + M_ELECTRON / (weight * AMU_KG)
    C0 = np.sqrt(8.0 * cst.kb * T / (np.pi * M_ELECTRON))
    pia02x2 = 2.0 * np.pi * A_BOHR ** 2

    def ksi(t):
        return np.exp(-t) / t - 2.0 * _e1(t) + _e2(t)

    for i in range(1, nb + 1):
        n = float(i)
        if i == 1:
            rn, bn = 0.45, -0.603
            g0, g1, g2 = 1.1330, -0.4059, 0.07014
        else:
            rn = 1.94 * n ** (-1.57)
            bn = (4.0 - 18.63 / n + 36.24 / n ** 2 - 28.09 / n ** 3) / n
            if i == 2:
                g0, g1, g2 = 1.0785, -0.2319, 0.02947
            else:
                g0 = 0.9935 + 0.2328 / n - 0.1296 / n ** 2
                g1 = -(0.6282 - 0.5598 / n + 0.5299 / n ** 2) / n
                g2 = (0.3887 - 1.181 / n + 1.470 / n ** 2) / n ** 2
        En = E_RYDBERG / deltam / n ** 2
        yn = En / (cst.kb * T)
        An = (32.0 / (3.0 * np.sqrt(3.0) * np.pi) * n
              * (g0 / 3.0 + g1 / 4.0 + g2 / 5.0))
        Bn = 2.0 / 3.0 * n * n * (5.0 + bn)
        zn = rn + yn
        out[:, i - 1] = (C0 * pia02x2 * (n * yn) ** 2
                         * (An * (_e1(yn) / yn - _e1(zn) / zn)
                            + (Bn - An * np.log(2.0 * n * n))
                            * (ksi(yn) - ksi(zn))))
    return out


# ---------------------------------------------------------------------------
# Builtin hydrogen model (no external data needed)
# ---------------------------------------------------------------------------

def hydrogen_model(n_bound: int = 5) -> AtomModel:
    """Hydrogen with `n_bound` bound levels + the H+ continuum level,
    matching the structure of the standard H_6.atom model the reference
    ships (ref4.1.para:70): energies E_n = Ryd (1 - 1/n^2), g = 2 n^2,
    all Lyman/Balmer/... lines, hydrogenic photoionization continua and
    Johnson 1972 collisions."""
    weight = 1.008
    deltam = 1.0 + M_ELECTRON / (weight * AMU_KG)
    ryd = E_RYDBERG / deltam
    N = n_bound + 1
    n = np.arange(1, n_bound + 1, dtype=np.float64)
    E = np.concatenate([ryd * (1.0 - 1.0 / n ** 2), [ryd]])
    g = np.concatenate([2.0 * n ** 2, [1.0]])
    stage = np.concatenate([np.zeros(n_bound, int), [1]])
    labels = [f"H I {int(k)}" for k in n] + ["H II"]

    li, lj, fosc = [], [], []
    for i in range(1, n_bound + 1):
        for j in range(i + 1, n_bound + 1):
            li.append(i - 1)
            lj.append(j - 1)
            fosc.append(johnson_fosc(i, j))
    li = np.array(li, int)
    lj = np.array(lj, int)
    fosc = np.array(fosc)
    lam0_m = cst.hp * cst.c_light / (E[lj] - E[li])
    Aji = C1_RAD / lam0_m ** 2 * (g[li] / g[lj]) * fosc
    Bji = lam0_m ** 3 / (2.0 * cst.hp * cst.c_light) * Aji
    Bij = (g[lj] / g[li]) * Bji
    # natural damping: sum of A out of the upper level (approx. the
    # standard GAMMA values in H atom files)
    Grad = np.zeros(len(li))
    for k in range(len(li)):
        Grad[k] = Aji[(lj == lj[k])].sum()

    # hydrogenic photoionization: sigma_n(nu_0) = n * 7.907e-22 m^2
    # (Kramers with Gaunt=1; Mihalas 1978 eq 4-114)
    ci = np.arange(n_bound, dtype=int)
    cj = np.full(n_bound, n_bound, dtype=int)
    alpha0 = 7.907e-22 * np.arange(1, n_bound + 1, dtype=np.float64)
    lam0c = cst.hp * cst.c_light / (E[cj] - E[ci]) / 1e-9   # nm

    return AtomModel(
        id="H", weight=weight, abund=1.0,
        E=E, g=g, stage=stage, label=labels,
        line_i=li, line_j=lj, Aji=Aji, Bji=Bji, Bij=Bij, fosc=fosc,
        lambda0=lam0_m / 1e-9, Grad=Grad,
        cStark=np.zeros(len(li)), cvdW=np.tile([1.0, 0.0, 1.0, 0.0],
                                               (len(li), 1)),
        voigt=np.ones(len(li), bool),
        cont_i=ci, cont_j=cj, alpha0=alpha0, cont_lambda0=lam0c,
        hydrogenic=np.ones(n_bound, bool),
        cont_lambda_file=[None] * n_bound,
        cont_alpha_file=[None] * n_bound,
        johnson_collisions=True)


# ---------------------------------------------------------------------------
# RH-style atom file reader
# ---------------------------------------------------------------------------

# solar abundances (Asplund et al. 2009) for elements whose models the
# reference ships; n(elem)/n(H)
SOLAR_ABUND = {
    "H": 1.0, "HE": 8.51e-2, "LI": 1.12e-11, "C": 2.69e-4, "N": 6.76e-5,
    "O": 4.90e-4, "NA": 1.74e-6, "MG": 3.98e-5, "AL": 2.82e-6,
    "SI": 3.24e-5, "S": 1.32e-5, "K": 1.07e-7, "CA": 2.19e-6,
    "CR": 4.37e-7, "FE": 3.16e-5, "NI": 1.66e-6,
}
ATOMIC_WEIGHT = {
    "H": 1.008, "HE": 4.003, "LI": 6.94, "C": 12.011, "N": 14.007,
    "O": 15.999, "NA": 22.990, "MG": 24.305, "AL": 26.982, "SI": 28.085,
    "S": 32.06, "K": 39.098, "CA": 40.078, "CR": 51.996, "FE": 55.845,
    "NI": 58.693,
}


def _data_lines(path: str):
    with open(path) as f:
        for raw in f:
            s = raw.strip()
            if not s or s.startswith("#") or s.startswith("*"):
                continue
            yield s


def read_atom_file(path: str) -> AtomModel:
    """Parse an RH-format atomic model (the format read_model_atom
    consumes, io_atom.f90:25-450): ID; Nlevel Nline Ncont; level rows
    (E[cm^-1] g 'label' stage no); line rows (j i f shape qwing vdw c1..c4
    Grad cStark); continuum rows (j i alpha0 Nlambda dep lambdamin
    [+ EXPLICIT table]); then TEMP/OMEGA/CE/CI collision blocks until END.
    """
    it = _data_lines(path)

    def next_tokens():
        return next(it).replace("'", " ").replace('"', " ").split()

    elem = next_tokens()[0].upper()
    nlevel, nline, ncont = [int(float(x)) for x in next_tokens()[:3]]

    E = np.zeros(nlevel)
    g = np.zeros(nlevel)
    stage = np.zeros(nlevel, int)
    labels = []
    for i in range(nlevel):
        t = next(it)
        # label is quoted; split around quotes
        if "'" in t:
            pre, lab, post = t.split("'")[0], t.split("'")[1], \
                t.split("'")[-1]
        else:
            parts = t.split()
            pre = " ".join(parts[:2])
            lab = " ".join(parts[2:-2])
            post = " ".join(parts[-2:])
        pt = pre.split()
        E[i] = float(pt[0]) * cst.hp * cst.c_light * 100.0   # cm^-1 -> J
        g[i] = float(pt[1])
        labels.append(lab.strip())
        stage[i] = int(float(post.split()[0]))

    li = np.zeros(nline, int)
    lj = np.zeros(nline, int)
    fosc = np.zeros(nline)
    Grad = np.zeros(nline)
    cStark = np.zeros(nline)
    cvdW = np.zeros((nline, 4))
    voigt = np.ones(nline, bool)
    vdw_method = np.full(nline, "UNSOLD", dtype="U8")
    for k in range(nline):
        t = next_tokens()
        j, i = int(float(t[0])), int(float(t[1]))
        li[k], lj[k] = min(i, j), max(i, j)
        fosc[k] = float(t[2])
        voigt[k] = t[3].upper() != "GAUSS"
        vdw_method[k] = t[5].upper()[:8]
        cvdW[k] = [float(x) for x in t[6:10]]
        Grad[k] = float(t[10])
        cStark[k] = float(t[11])
    lam0_m = cst.hp * cst.c_light / np.maximum(E[lj] - E[li], 1e-30)
    Aji = C1_RAD / lam0_m ** 2 * (g[li] / g[lj]) * fosc
    Bji = lam0_m ** 3 / (2.0 * cst.hp * cst.c_light) * Aji
    Bij = (g[lj] / g[li]) * Bji

    ci = np.zeros(ncont, int)
    cj = np.zeros(ncont, int)
    alpha0 = np.zeros(ncont)
    hyd = np.ones(ncont, bool)
    lamf, alpf = [], []
    for k in range(ncont):
        t = next_tokens()
        j, i = int(float(t[0])), int(float(t[1]))
        ci[k], cj[k] = min(i, j), max(i, j)
        alpha0[k] = float(t[2])
        nlam = int(float(t[3]))
        explicit = t[4].upper() == "EXPLICIT"
        hyd[k] = not explicit
        if explicit:
            rows = np.array([[float(x) for x in next_tokens()[:2]]
                             for _ in range(nlam)])
            lamf.append(rows[:, 0])
            alpf.append(rows[:, 1])
        else:
            lamf.append(None)
            alpf.append(None)
    lam0c = cst.hp * cst.c_light / np.maximum(E[cj] - E[ci], 1e-30) / 1e-9

    # collisions
    colls = []
    temps = None
    for s in it:
        key = s.split()[0].upper()
        if key == "END":
            break
        t = s.split()
        if key == "TEMP":
            ntmp = int(float(t[1]))
            temps = np.array([float(x) for x in t[2:2 + ntmp]])
        elif key in ("OMEGA", "CE", "CI", "CP", "CH0", "CH+", "CH", "CR"):
            if key in ("OMEGA", "CE", "CI") and temps is not None:
                i1, j1 = int(float(t[1])), int(float(t[2]))
                rates = np.array([float(x) for x in t[3:3 + len(temps)]])
                colls.append(CollisionTable(
                    kind=key, i=min(i1, j1), j=max(i1, j1),
                    temps=temps.copy(), rates=rates))

    return AtomModel(
        id=elem.capitalize(), weight=ATOMIC_WEIGHT.get(elem, 1.0),
        abund=SOLAR_ABUND.get(elem, 1e-12),
        E=E, g=g, stage=stage, label=labels,
        line_i=li, line_j=lj, Aji=Aji, Bji=Bji, Bij=Bij, fosc=fosc,
        lambda0=lam0_m / 1e-9, Grad=Grad, cStark=cStark, cvdW=cvdW,
        voigt=voigt, vdw_method=vdw_method,
        cont_i=ci, cont_j=cj, alpha0=alpha0, cont_lambda0=lam0c,
        hydrogenic=hyd, cont_lambda_file=lamf, cont_alpha_file=alpf,
        collisions=colls)


def get_atom(filename: str) -> AtomModel:
    """Resolve an atom by para-file name: look for the file (cwd,
    $MCFOST_UTILS/Atoms), else fall back to the builtin hydrogen when the
    name matches H_*.atom (the reference default)."""
    for base in (".", os.environ.get("MCFOST_UTILS", "") + "/Atoms"):
        p = os.path.join(base, filename)
        if os.path.isfile(p):
            return read_atom_file(p)
    name = os.path.basename(filename).upper()
    if name.startswith("H_") or name.startswith("H."):
        # H_6.atom -> 5 bound levels + continuum
        try:
            nl = int(name.split("_")[1].split(".")[0])
        except (ValueError, IndexError):
            nl = 6
        return hydrogen_model(n_bound=max(nl - 1, 2))
    raise FileNotFoundError(f"atomic model {filename} not found and no "
                            "builtin equivalent")
