"""Published radiative-transfer benchmark setups.

Mirrors src/benchmarks.f90: hard-coded configurations for the published
inter-code benchmarks, selected by positional CLI keyword instead of a
para file (init_mcfost.f90:430-460):

    python -m mcfost_tpu Pascucci | vanZadelhoff1 | vanZadelhoff2 |
                         Dutrey94 | HH30mol  [options]

* Pascucci et al. 2004 (continuum): the bundled Pascucci_3.0.para model —
  single 0.12 um astronomical-silicate grain forced to rho=3.6 g/cm3 and
  isotropic scattering (init_Pascucci_benchmark, benchmarks.f90:15-35).
* van Zadelhoff et al. 2002 problem 1 (NLTE line): fictitious 2-level
  molecule in a static 1/r^2 spherical cloud at 20 K, vturb=150 m/s
  (readMolecule_benchmark1 :84-155, init_benchmark_vanZadelhoff1 :293).
* van Zadelhoff 2 (AGB envelope, model_1.d reader :320-401).
* Dutrey et al. 1994 GG Tau disk / Pety et al. 2006 HH 30: imposed
  power-law temperature, molecular cubes (init_GG_Tau_mol :250,
  init_HH_30_mol :272).
"""
from __future__ import annotations

import os

import numpy as np

from . import constants as cst
from .config.para import (Para, Zone, DustSpecies, DustComponent, Star,
                          Molecule)
from .physics.molecules import MoleculeData

BENCHMARK_NAMES = ("Pascucci", "vanZadelhoff1", "vanZadelhoff2",
                   "water1", "water2", "water3", "Dutrey94", "HH30mol")


# ---------------------------------------------------------------------------
# Setups
# ---------------------------------------------------------------------------

def pascucci_para() -> Para:
    """The Pascucci et al. 2004 disk (values from src/Pascucci_3.0.para)."""
    p = Para()
    p.version = 3.0
    p.photons.n_eq_th = 1.28e6
    p.photons.n_lambda = 1.28e3
    p.wavelengths.n_lambda = 61
    p.wavelengths.lambda_min = 0.110662
    p.wavelengths.lambda_max = 2168.76
    p.grid.n_rad, p.grid.nz, p.grid.n_az, p.grid.n_rad_in = 100, 70, 1, 20
    p.maps.nx = p.maps.ny = 401
    p.maps.map_size = 700.0
    p.maps.imin, p.maps.imax, p.maps.n_incl = 12.5, 77.5, 2
    p.maps.distance = 140.0
    p.maps.disk_pa = 0.0
    z = Zone(geometry=1, dust_mass=1.1e-6, gas_to_dust=100.0,
             scale_height=99.73557010035817, ref_radius=500.0,
             rin=1.0, edge=0.0, rout=1000.0, rc=100.0,
             flaring_exp=1.125, surface_density_exp=0.125, gamma_exp=0.0)
    p.zones = [z]
    sp = DustSpecies(grain_type="Mie", n_components=1, mixing_rule=2,
                     porosity=0.0, mass_fraction=1.0, dhs_vmax=0.9,
                     components=[DustComponent("Draine_Si.dat", 1.0)],
                     heating_method=1, amin=0.12, amax=0.12, aexp=3.5,
                     n_grains=1)
    p.dust = [[sp]]
    p.stars = [Star(teff=5800.0, radius=1.0, mass=1.0)]
    # benchmark forcing (init_Pascucci_benchmark): isotropic scattering
    p.iso_scattering = True
    return p


def two_level_molecule(name="bench1", delta_e_cm=5.0, g2=3.0,
                       aul=1.0e-4, kul=2.0e-10) -> MoleculeData:
    """Fictitious 2-level molecule of van Zadelhoff benchmark 1
    (readMolecule_benchmark1: Delta_E [cm^-1], g2, Aul, Kul from
    mol_benchmark.dat; collision rate constant in temperature)."""
    e_ev = np.array([0.0, delta_e_cm / 8065.541])
    g = np.array([1.0, g2])
    freq = np.array([cst.c_light * delta_e_cm * 100.0])
    return MoleculeData(
        name=name, weight=1.0, level_energy=e_ev, g=g,
        trans_up=np.array([1]), trans_low=np.array([0]),
        Aul=np.array([aul]), freq=freq,
        coll_up=np.array([1]), coll_low=np.array([0]),
        coll_temps=np.array([1.0, 1000.0]),
        coll_rates=np.array([[kul, kul]]))


def vanzadelhoff1_para() -> Para:
    """Spherical 1/r^2 static cloud, T=20K (init_benchmark_vanZadelhoff1
    + the paper's model: r_in=1e13 m, r_out=7.8e16 m)."""
    p = Para()
    rin_au = 1.0e13 / cst.AU_to_m
    rout_au = 7.8e16 / cst.AU_to_m
    p.grid.geometry = 2                       # spherical
    p.grid.n_rad, p.grid.nz, p.grid.n_rad_in = 50, 20, 1
    z = Zone(geometry=3, dust_mass=1.0e-6, gas_to_dust=100.0,
             rin=rin_au, rout=rout_au, ref_radius=rin_au,
             surface_density_exp=-2.0)        # envelope, rho ~ r^-2
    p.zones = [z]
    p.stars = [Star(teff=5000.0, radius=1.0, mass=1.0)]
    p.mol.v_turb = 0.15                       # km/s
    p.mol.v_turb_unit = "km/s"
    p.mol.lte = False
    p.mol.molecules = [Molecule(filename="bench1", level_max=2,
                                abundance=1.0e-8, transitions=[1],
                                n_lines_rt=1, vmin=-1.0, vmax=1.0,
                                n_speed=21)]
    return p


def read_vanzadelhoff2_model(path: str):
    """model_1.d reader (init_benchmark_vanzadelhoff2, benchmarks.f90:
    320-401): 7 header lines then r[cm] nH2[cm^-3] junk T[K] v[km/s]
    vturb[km/s], outside-in."""
    rows = np.loadtxt(path, skiprows=7)
    rows = rows[::-1]                         # store inside-out
    r_au = rows[:, 0] * 1.0 / cst.AU_to_cm
    n_h2 = rows[:, 1] * 1e6                   # cm^-3 -> m^-3
    T = rows[:, 3]
    v = rows[:, 4] * 1e3
    vturb = rows[:, 5] * 1e3
    return r_au, n_h2, T, v, vturb


def run_vanzadelhoff2(r_au, n_h2, T_tab, v_tab, vturb_tab,
                      root_dir: str = ".", abundance: float = 1.0e-8,
                      nlev: int = 8, overrides=None, verbose: bool = True):
    """van Zadelhoff et al. 2002 problem 2: HCO+ NLTE in the inside-out
    collapsing AGB envelope of model_1.d (init_benchmark_vanzadelhoff2,
    benchmarks.f90:320-401: log-log density interpolation, linear T/v/
    vturb, radial infall velocity field).

    Molecule: LAMDA hco+ file from $MCFOST_UTILS when available, else the
    builtin spectroscopic-constant ladder (approximate collision rates).
    Writes the Tex(r) profile of the 1-0 and 4-3 transitions — the
    benchmark's published observable (vZ02 fig. 7)."""
    from .mc.model import build_model
    from .grids import geometry as geom
    from .io.fits import write_fits
    from .transfer.mol_nlte import nlte_populations

    p = Para()
    p.grid.geometry = 2
    p.grid.n_rad, p.grid.nz, p.grid.n_rad_in = 50, 20, 1
    z = Zone(geometry=3, dust_mass=1.0e-12, gas_to_dust=100.0,
             rin=float(r_au[0]), rout=float(r_au[-1]),
             ref_radius=float(r_au[0]), surface_density_exp=-2.0)
    p.zones = [z]
    p.stars = [Star(teff=4000.0, radius=1.0, mass=1.0)]
    p.mol.lte = False
    p.mol.molecules = [Molecule(filename="hco+@xpol", level_max=nlev,
                                abundance=abundance, transitions=[1, 4],
                                n_lines_rt=2, vmin=-4.0, vmax=4.0,
                                n_speed=31)]
    if overrides:
        overrides(p)
    model, host = build_model(p, cache_dir=os.path.join(
        root_dir, ".mcfost_tpu_cache"))

    # interpolate the table onto the grid (log-log density; linear T, v,
    # vturb — benchmarks.f90:352-386)
    rg = geom.host_arrays(model.grid, "r_grid")
    zg = geom.host_arrays(model.grid, "z_grid")
    rs = np.sqrt(rg ** 2 + zg ** 2)
    lr = np.log(np.clip(rs, r_au[0], r_au[-1]))
    n_cell = np.exp(np.interp(lr, np.log(r_au), np.log(n_h2)))   # m^-3
    T_cell = np.interp(lr, np.log(r_au), T_tab)
    v_cell = np.interp(lr, np.log(r_au), v_tab)                  # m/s
    vt_cell = np.interp(lr, np.log(r_au), vturb_tab) / 1e3       # km/s

    # impose the gas structure: rho_dust such that gas_number_density
    # returns exactly the table's n_H2; radial (infall) velocity in
    # cylindrical components
    mu_mH = 2.3 * 1.007825 / 6.022140857e23
    g2d = p.zones[0].gas_to_dust
    rho_dust = n_cell * mu_mH / 1e6 / g2d                        # g/cm^3
    vel = np.stack([v_cell * rg / np.maximum(rs, 1e-30),
                    np.zeros_like(v_cell),
                    v_cell * zg / np.maximum(rs, 1e-30)], 1)
    host = host._replace(rho_dust=rho_dust, velocity=vel)
    p.mol.v_turb = vt_cell
    p.mol.v_turb_unit = "km/s"

    from .physics.molecules import get_molecule, builtin_hcoplus
    try:
        mol = get_molecule("hco+@xpol")
    except Exception:
        if verbose:
            print("  no LAMDA hco+ file found: using the builtin "
                  "spectroscopic ladder (approximate collision rates)")
        mol = builtin_hcoplus(max(nlev, 8))

    pops, it, diff = nlte_populations(
        model, host, mol, T_cell, abundance, nlev=nlev, n_rays=48,
        initial="sobolev", verbose=verbose)
    if verbose:
        print(f"  vanZadelhoff2: {it} iterations, dpop={diff:.2e}")

    # Tex(r) of the 1-0 and 4-3 lines in the midplane row
    def tex_of(u_, l_):
        dE = (mol.level_energy[u_] - mol.level_energy[l_]) * 1.602176634e-19
        ratio = (pops[:, l_] * mol.g[u_]) / np.maximum(
            pops[:, u_] * mol.g[l_], 1e-300)
        return dE / (cst.kb * np.log(np.maximum(ratio, 1.0 + 1e-12)))

    tex10 = tex_of(1, 0)
    tex43 = tex_of(4, 3)
    d = os.path.join(root_dir, "data_benchmark")
    os.makedirs(d, exist_ok=True)
    shape = geom.cell_shape(model.grid)
    write_fits(os.path.join(d, "Tex_vz2.fits.gz"),
               np.stack([tex10, tex43]).reshape(
                   (2,) + shape).astype(np.float32),
               extensions=[rs.astype(np.float64)],
               keywords={"BUNIT": "K"})
    return pops, (tex10, tex43), T_cell, model, host


def water_para(nlev: int = 2) -> Para:
    """Spherical cloud geometry shared by the water benchmarks.

    The reference takes the geometry from a user para file and overrides
    the physics in init_benchmark_water1/2/3 (benchmarks.f90:527-575);
    here the standard benchmark cloud is built in: a uniform sphere to
    r_out = 0.1 pc resolved by 50 log rings."""
    p = Para()
    rout_au = 0.1 / cst.AU_to_pc                     # 0.1 pc cloud
    p.grid.geometry = 2
    p.grid.n_rad, p.grid.nz, p.grid.n_rad_in = 50, 20, 1
    z = Zone(geometry=3, dust_mass=1.0e-12, gas_to_dust=100.0,
             rin=10.0, rout=rout_au, ref_radius=10.0,
             surface_density_exp=0.0)         # uniform envelope
    p.zones = [z]
    p.stars = [Star(teff=4000.0, radius=1.0, mass=1.0)]
    p.mol.lte = False
    p.mol.v_turb = 0.0
    p.mol.v_turb_unit = "km/s"
    p.mol.molecules = [Molecule(filename="o-h2o", level_max=nlev,
                                abundance=1.0e-9, transitions=[1],
                                n_lines_rt=1, vmin=-5.0, vmax=5.0,
                                n_speed=31)]
    return p


def run_water(which: int, root_dir: str = ".", overrides=None,
              verbose: bool = True, nlev: int | None = None):
    """Water benchmarks 1-3 (van Zadelhoff et al. 2002 H2O problems;
    reference init_benchmark_water1/2/3, benchmarks.f90:527-575):

    1. static uniform cloud, n(H2)=1e4 cm^-3, Tkin=40 K, vturb=0,
       no CMB — the classic two-level 557 GHz ortho-H2O problem;
    2. same cloud with the linear radial velocity field
       v(r) = 1e5 * r[pc] m/s (benchmarks.f90:449-451);
    3. the AGB mc_100.d model (multi-level, file-driven structure)
       when the published table is present in root_dir, else the
       water-2 cloud with the 8-level ladder as the multi-level
       stress case (the reference's own water3 opacity coupling is
       marked broken upstream, mol_transfer.f90:916-931).
    """
    from .grids import geometry as geom
    from .io.fits import write_fits
    from .mc.model import build_model
    from .physics.molecules import builtin_ortho_h2o
    from .transfer.mol_nlte import nlte_populations

    nlev = nlev if nlev is not None else (2 if which in (1, 2) else 8)
    p = water_para(nlev)
    if overrides:
        overrides(p)
    model, host = build_model(p, cache_dir=os.path.join(
        root_dir, ".mcfost_tpu_cache"))
    rg = geom.host_arrays(model.grid, "r_grid")
    zg = geom.host_arrays(model.grid, "z_grid")
    rs = np.sqrt(rg ** 2 + zg ** 2)

    mu_mH = 2.3 * 1.007825 / 6.022140857e23       # g per H2 (+He)
    g2d = p.zones[0].gas_to_dust
    T_cell = np.full(model.grid.n_cells, 40.0)
    n_h2 = np.full(model.grid.n_cells, 1.0e4 * 1e6)     # m^-3
    vturb_kms = np.zeros(model.grid.n_cells)
    if which == 3 and os.path.isfile(os.path.join(root_dir, "mc_100.d")):
        # mc_100.d: radius[cm] n(H2)[cm^-3] Tkin Tdust Vrad[km/s]
        # FWHM[km/s], outside-in (benchmarks.f90:484-497)
        rows = np.loadtxt(os.path.join(root_dir, "mc_100.d"),
                          skiprows=1)[::-1]
        r_au = rows[:, 0] / cst.AU_to_cm
        lr = np.log(np.clip(rs, r_au[0], r_au[-1]))
        n_h2 = np.exp(np.interp(lr, np.log(r_au),
                                np.log(rows[:, 1] * 1e6)))
        T_cell = np.exp(np.interp(lr, np.log(r_au),
                                  np.log(rows[:, 2])))
        v_cell = np.interp(lr, np.log(r_au), rows[:, 4] * 1e3)
        vturb_kms = np.interp(lr, np.log(r_au),
                              rows[:, 5] / (2.0 * np.sqrt(np.log(2.0))))
    elif which >= 2:
        # v = 1e5 * r[pc] m/s, radial (init_benchmark_water2)
        v_cell = 1.0e5 * rs * cst.AU_to_pc
    else:
        v_cell = np.zeros(model.grid.n_cells)
    rho_dust = n_h2 * mu_mH / 1e6 / g2d                 # g/cm^3
    vel = np.stack([v_cell * rg / np.maximum(rs, 1e-30),
                    np.zeros_like(v_cell),
                    v_cell * zg / np.maximum(rs, 1e-30)], 1)
    host = host._replace(rho_dust=rho_dust, velocity=vel)
    p.mol.v_turb = vturb_kms
    p.mol.v_turb_unit = "km/s"

    mol = builtin_ortho_h2o(nlev)
    pops, it, diff = nlte_populations(
        model, host, mol, T_cell, p.mol.molecules[0].abundance,
        nlev=nlev, n_rays=48, initial="sobolev", verbose=verbose,
        cmb=False)
    if verbose:
        print(f"  water{which}: {it} iterations, dpop={diff:.2e}")

    # Tex(r) of the 557 GHz line — the benchmark's observable
    dE = (mol.level_energy[1] - mol.level_energy[0]) * 1.602176634e-19
    ratio = (pops[:, 0] * mol.g[1]) / np.maximum(
        pops[:, 1] * mol.g[0], 1e-300)
    tex = dE / (cst.kb * np.log(np.maximum(ratio, 1.0 + 1e-12)))
    d = os.path.join(root_dir, "data_benchmark")
    os.makedirs(d, exist_ok=True)
    shape = geom.cell_shape(model.grid)
    write_fits(os.path.join(d, f"Tex_water{which}.fits.gz"),
               tex.reshape(shape).astype(np.float32),
               extensions=[rs.astype(np.float64)],
               keywords={"BUNIT": "K"})
    return pops, tex, model, host


def mathis_isrf(lam_um: np.ndarray, chi: float = 1.0) -> np.ndarray:
    """Mathis, Mezger & Panagia (1983) interstellar radiation field as
    J_lambda [W m^-2 m^-1 sr^-1]: UV piecewise power laws (91.2-245 nm)
    plus three diluted blackbodies (7500/4000/3000 K), scaled by chi
    (-Mathis_field, init_mcfost.f90:1176-1184)."""
    lam_m = lam_um * 1e-6
    # diluted blackbodies
    J = np.zeros_like(lam_um, np.float64)
    for W, T in ((1.0e-14, 7500.0), (1.65e-13, 4000.0),
                 (4.0e-13, 3000.0)):
        x = cst.hp * cst.c_light / (lam_m * cst.kb * T)
        J += W * 2 * cst.hp * cst.c_light ** 2 / lam_m ** 5 \
            / np.maximum(np.expm1(np.minimum(x, 500.0)), 1e-300)
    # UV component (MMP83 table values, in erg cm^-3 A^-1 -> SI)
    lam_a = lam_um * 1e4            # Angstrom
    uv = np.zeros_like(lam_um, np.float64)
    m1 = (lam_a >= 912.0) & (lam_a < 1100.0)
    m2 = (lam_a >= 1100.0) & (lam_a < 1340.0)
    m3 = (lam_a >= 1340.0) & (lam_a < 2460.0)
    uv[m1] = 1.287e-9 * (lam_a[m1] / 1e4) ** 4.4172
    uv[m2] = 6.825e-13 * (lam_a[m2] / 1e4)
    uv[m3] = 2.373e-14 * (lam_a[m3] / 1e4) ** (-0.6678)
    # u_lambda [erg cm^-3 A^-1] -> J_lambda = c u / (4 pi) [SI]
    uv_si = uv * 1e-7 / 1e-6 * 1e10          # J m^-3 m^-1
    J += cst.c_light * uv_si / (4.0 * np.pi)
    return chi * J


def run_shg_benchmark(para, chi: float = 1.0, root_dir: str = "."):
    """-benchmark_SHG [-Mathis_field chi]: stochastic-heating benchmark —
    the para file's grain populations illuminated by the chi-scaled
    Mathis ISRF; writes P(T) and the emergent emissivity per size
    (lbenchmark_SHG, init_mcfost.f90:1173-1184; the Camps et al. 2015
    TRUST SHG setup)."""
    from .physics import stochastic as stoch
    from .physics.wavelengths import log_wavelength_grid
    from .dust.opacity import build_dust_model, build_grain_sizes
    from .io.fits import write_fits
    os.makedirs(root_dir, exist_ok=True)
    wl = log_wavelength_grid(200, 0.0912, 3000.0)
    grains = build_grain_sizes(para)
    dust = build_dust_model(para, wl, cache_dir=None, grains=grains)
    J = mathis_isrf(wl.lam, chi)[None, :]          # one "cell"
    sizes = grains.r_grain
    P_all, emis_all, tabs = [], [], None
    for k in range(sizes.size):
        fam = "PAH" if "PAH" in para.dust[0][0].components[0] \
            .optical_indices_file else "silicate"
        tab = stoch.build_nre_tables(float(sizes[k]), dust.c_abs[k],
                                     wl.lam, fam, float(grains.rho1g[k]))
        P, _, _ = stoch.solve_temperature_distribution(tab, J,
                                                       force_nre=True)
        P_all.append(P[0])
        emis_all.append(stoch.nre_emissivity(tab, P)[0])
        tabs = tab
    out = os.path.join(root_dir, "data_SHG")
    os.makedirs(out, exist_ok=True)
    write_fits(os.path.join(out, "Proba_Tdust.fits.gz"),
               np.stack(P_all).astype(np.float32),
               extensions=[tabs.T_bins.astype(np.float64),
                           sizes.astype(np.float64)])
    write_fits(os.path.join(out, "emissivity.fits.gz"),
               np.stack(emis_all).astype(np.float32),
               extensions=[wl.lam.astype(np.float64)],
               keywords={"CHI": chi})
    print(f"  SHG benchmark: {sizes.size} sizes, chi = {chi}; "
          f"wrote {out}/Proba_Tdust.fits.gz, emissivity.fits.gz")


def _impose_temperature(model, host, law):
    """Analytic Tdust/Tcin on the grid (ldust_mol benchmarks)."""
    from .grids import geometry as geom
    r = geom.host_arrays(model.grid, "r_grid")
    return law(np.maximum(r, 1e-6))


def run_benchmark(name: str, root_dir: str = ".", seed: int | None = None,
                  overrides=None, verbose: bool = True):
    """Entry point for the positional benchmark keywords."""
    from .mc.model import build_model
    from .runner import run_mol_step, run_thermal, run_sed_step
    os.makedirs(root_dir, exist_ok=True)

    if name == "Pascucci":
        para = pascucci_para()
        if overrides:
            overrides(para)
        T, sed_th, model, host, res = run_thermal(para, root_dir=root_dir,
                                                  seed=seed)
        run_sed_step(para, model, host, T, root_dir=root_dir, seed=seed)
        return T

    if name == "vanZadelhoff1":
        para = vanzadelhoff1_para()
        if overrides:
            overrides(para)
        model, host = build_model(para, cache_dir=os.path.join(
            root_dir, ".mcfost_tpu_cache"))
        T = np.full(model.grid.n_cells, 20.0)
        mol = two_level_molecule()
        from .transfer.mol_nlte import nlte_populations
        pops, it, diff = nlte_populations(
            model, host, mol, T, para.mol.molecules[0].abundance,
            nlev=2, n_rays=16, initial="lte", verbose=verbose)
        if verbose:
            print(f"  vanZadelhoff1: {it} iterations, dpop={diff:.2e}")
        # write the excitation-temperature profile, the benchmark's
        # published observable (van Zadelhoff 2002 fig. 3)
        from .io.fits import write_fits
        with np.errstate(divide="ignore"):
            ratio = (pops[:, 0] * mol.g[1]) / np.maximum(
                pops[:, 1] * mol.g[0], 1e-300)
            dE = (mol.level_energy[1] - mol.level_energy[0]) \
                * 1.602176634e-19
            tex = dE / (cst.kb * np.log(np.maximum(ratio, 1e-30)))
        d = os.path.join(root_dir, "data_benchmark")
        os.makedirs(d, exist_ok=True)
        from .grids import geometry as geom
        shape = geom.cell_shape(model.grid)
        write_fits(os.path.join(d, "Tex.fits.gz"),
                   tex.reshape(shape).astype(np.float32),
                   keywords={"BUNIT": "K"})
        return pops, tex, model, host

    if name == "vanZadelhoff2":
        path = os.path.join(root_dir, "model_1.d")
        if not os.path.isfile(path):
            raise FileNotFoundError(
                "vanZadelhoff2 needs the published model_1.d table next to "
                "root_dir (benchmarks.f90:338 reads it from cwd)")
        r_au, n_h2, T, v, vturb = read_vanzadelhoff2_model(path)
        return run_vanzadelhoff2(r_au, n_h2, T, v, vturb,
                                 root_dir=root_dir, overrides=overrides,
                                 verbose=verbose)

    if name in ("water1", "water2", "water3"):
        return run_water(int(name[-1]), root_dir=root_dir,
                         overrides=overrides, verbose=verbose)

    if name in ("Dutrey94", "HH30mol"):
        para = Para()
        para.grid.n_rad, para.grid.nz = 60, 30
        if name == "Dutrey94":
            # GG Tau ring (Dutrey et al. 1994): 13CO disk 38-300 AU
            para.zones = [Zone(geometry=1, dust_mass=1.0e-4,
                               scale_height=15.0, ref_radius=100.0,
                               rin=38.0, rout=300.0,
                               flaring_exp=1.125,
                               surface_density_exp=-1.375)]
            law = lambda r: 30.0 * (r / 100.0) ** -0.5   # noqa: E731
        else:
            # HH 30 (Pety et al. 2006)
            para.zones = [Zone(geometry=1, dust_mass=1.5e-5,
                               scale_height=15.0, ref_radius=100.0,
                               rin=4.0, rout=250.0,
                               flaring_exp=1.25,
                               surface_density_exp=-1.0)]
            law = lambda r: 12.0 * (r / 100.0) ** -0.55  # noqa: E731
            para.mol.v_turb = 0.23
            para.mol.v_turb_unit = "km/s"
        if overrides:
            overrides(para)
        model, host = build_model(para, cache_dir=os.path.join(
            root_dir, ".mcfost_tpu_cache"))
        T = _impose_temperature(model, host, law)
        run_mol_step(para, model, host, T, root_dir=root_dir,
                     verbose=verbose)
        return T

    raise ValueError(f"unknown benchmark {name!r}; "
                     f"one of {BENCHMARK_NAMES}")
