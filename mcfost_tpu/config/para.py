"""Parameter-file schema and parser.

Reads the reference's versioned ``.para`` format (current 4.1; spec:
reference docs/parameter_file.rst, parser: src/read_param.f90:16-110 and
read_para41x).  The configuration is represented as plain dataclasses; the
parser is token-positional like the reference (values are whitespace-split,
trailing comments on each line are ignored).

Formats 2.19 through 4.1 are parsed (the legacy ladder mirrors
read_param.f90's version dispatch); write_para emits the current 4.1
format (-get_para).
"""
from __future__ import annotations

import dataclasses

import numpy as np
from dataclasses import dataclass, field
from typing import List, Optional


def _to_bool(tok: str) -> bool:
    t = tok.strip().rstrip(",").lower()
    if t in ("t", ".true.", "true", "1"):
        return True
    if t in ("f", ".false.", "false", "0"):
        return False
    raise ValueError(f"cannot parse boolean token {tok!r}")


@dataclass
class Photons:
    # reference: src/ref4.1.para:3-6
    n_eq_th: float = 1.28e5        # thermal MC packets
    n_lambda: float = 1.28e3       # packets received per SED wavelength
    n_image: float = 1.28e6        # packets for images


@dataclass
class Wavelengths:
    # reference: src/ref4.1.para:8-12
    n_lambda: int = 50
    lambda_min: float = 0.1        # [micron]
    lambda_max: float = 3000.0     # [micron]
    compute_temp: bool = True
    compute_sed: bool = True
    default_grid: bool = True
    wavelength_file: str = ""
    separate_contributions: bool = False
    output_stokes: bool = False


@dataclass
class GridParams:
    # reference: src/ref4.1.para:14-16
    geometry: int = 1              # 1=cylindrical, 2=spherical, 3=Voronoi
    n_rad: int = 100
    nz: int = 70                   # nz (or n_theta for spherical)
    n_az: int = 1
    n_rad_in: int = 20             # subdivision of the innermost radial cell


@dataclass
class Maps:
    # reference: src/ref4.1.para:18-23
    nx: int = 301
    ny: int = 301
    map_size: float = 700.0        # [AU]
    imin: float = 0.0
    imax: float = 45.0
    n_incl: int = 3
    centered: bool = False
    az_min: float = 0.0
    az_max: float = 0.0
    n_az_angles: int = 1
    distance: float = 140.0        # [pc]
    disk_pa: float = -90.0         # [deg]
    zoom: float = 1.0              # legacy 2.x map zoom (also CLI -zoom)


@dataclass
class Zone:
    # reference: src/ref4.1.para:43-49; semantics docs/parameter_file.rst:292-311
    geometry: int = 1              # 1 disk, 2 tapered-edge, 3 envelope, 4 debris, 5 wall
    dust_mass: float = 1.0e-3      # [Msun]
    gas_to_dust: float = 100.0
    scale_height: float = 10.0     # H0 [AU] at rref
    ref_radius: float = 100.0      # [AU]
    vert_profile_exp: float = 2.0  # debris disks only
    rin: float = 1.0               # [AU]
    edge: float = 0.0              # [AU]
    rout: float = 300.0            # [AU]
    rc: float = 100.0              # tapered-edge / debris only [AU]
    flaring_exp: float = 1.125     # beta
    surface_density_exp: float = -0.5   # p1 (or -gamma)
    gamma_exp: float = 0.0         # p2 (-gamma_exp, or alpha_in/out for debris)

    @property
    def rmin(self) -> float:
        # reference: read_param sets rmin = rin - 5*edge when edge>0
        return self.rin if self.edge <= 0 else max(self.rin - 5.0 * self.edge, 0.0)

    @property
    def rmax(self) -> float:
        if self.geometry == 2 and self.rout <= 0:  # tapered edge
            return 8.0 * self.rc
        return self.rout


@dataclass
class DustComponent:
    optical_indices_file: str = "Draine_Si_sUV.dat"
    volume_fraction: float = 1.0


@dataclass
class DustSpecies:
    # reference: src/ref4.1.para:51-56
    grain_type: str = "Mie"        # Mie or DHS
    n_components: int = 1
    mixing_rule: int = 2           # 1 = EMT, 2 = coating
    porosity: float = 0.0
    mass_fraction: float = 1.0
    dhs_vmax: float = 0.9
    components: List[DustComponent] = field(default_factory=lambda: [DustComponent()])
    heating_method: int = 1        # 1 RE+LTE, 2 RE+nLTE, 3 nRE
    amin: float = 0.03             # [micron]
    amax: float = 1000.0           # [micron]
    aexp: float = 3.5
    n_grains: int = 100


@dataclass
class MoleculeSettings:
    lpop: bool = True
    laccurate_pop: bool = True
    lte: bool = True
    v_turb: float = 0.05
    v_turb_unit: str = "cs"        # "km/s" or "cs"
    molecules: List["Molecule"] = field(
        default_factory=lambda: [Molecule()])


@dataclass
class Molecule:
    filename: str = "co.dat"
    level_max: int = 6
    cst_abundance: bool = True
    abundance: float = 1.0e-4
    abundance_file: str = ""
    ray_tracing: bool = True
    n_lines_rt: int = 2
    transitions: List[int] = field(default_factory=lambda: [2, 3])
    vmin: float = -10.0            # km/s
    vmax: float = 10.0
    n_speed: int = 41


@dataclass
class AtomSettings:
    atoms: List["Atom"] = field(default_factory=list)


@dataclass
class Atom:
    filename: str = "H_6.atom"
    non_lte: bool = False
    initial_solution: int = 0
    vmax: float = 1000.0           # km/s
    n_points: int = 101
    images: bool = True
    n_lines: int = 1
    lines: List[tuple] = field(default_factory=lambda: [(3, 2)])


@dataclass
class Star:
    # reference: src/ref4.1.para:77-81
    teff: float = 5000.0
    radius: float = 2.0            # [Rsun]
    mass: float = 1.0              # [Msun]
    x: float = 0.0                 # [AU]
    y: float = 0.0
    z: float = 0.0
    auto_spectrum: bool = True
    spectrum_file: str = ""
    fuv: float = 0.0
    slope_fuv: float = 2.2
    # Extensions (CLI in the reference)
    blackbody: bool = True         # forced BB when no spectra data dir available
    mdot: float = 0.0              # accretion [Msun/yr]


@dataclass
class Physics:
    # reference: src/ref4.1.para:33-38
    settling_type: int = 0         # 0 none, 1 parametric, 2 Dubrulle, 3 Fromang
    exp_strat: float = 0.5
    a_strat: float = 1.0
    radial_migration: bool = False
    sublimate_dust: bool = False
    hydrostatic_eq: bool = False
    viscous_heating: bool = False
    alpha_viscosity: float = 1.0e-5


@dataclass
class Para:
    """Full configuration equivalent of a 4.1 parameter file."""
    version: float = 4.1
    photons: Photons = field(default_factory=Photons)
    wavelengths: Wavelengths = field(default_factory=Wavelengths)
    grid: GridParams = field(default_factory=GridParams)
    maps: Maps = field(default_factory=Maps)
    scattering_method: int = 0     # 0 auto, 1 per grain, 2 per cell
    aniso_method: int = 1          # 1 Mie phase function, 2 HG
    sym_image: bool = True
    sym_central: bool = True
    sym_axial: bool = True
    physics: Physics = field(default_factory=Physics)
    zones: List[Zone] = field(default_factory=lambda: [Zone()])
    # dust species, per zone: species[izone][ispecies]
    dust: List[List[DustSpecies]] = field(default_factory=lambda: [[DustSpecies()]])
    mol: MoleculeSettings = field(default_factory=MoleculeSettings)
    atoms: AtomSettings = field(default_factory=AtomSettings)
    stars: List[Star] = field(default_factory=lambda: [Star()])

    # Run-control knobs that are CLI flags in the reference
    # (reference: src/init_mcfost.f90:462-1530)
    n_T: int = 100
    T_min: float = 1.0
    T_max: float = 3000.0
    nang_scatt: int = 180
    cutoff: float = 7.0            # zmax = cutoff * H
    seed: int = 269753
    iso_scattering: bool = False
    hg_scattering: bool = False
    no_scattering: bool = False    # -no_scattering (init_mcfost.f90:804)
    qsca_equal_qabs: bool = False  # -qsca=qabs (init_mcfost.f90:807)
    # structural CLI extras (reference init_mcfost.f90 options):
    # -gap f r sigma (density.f90:911), -cavity h r beta (:901),
    # -puffed_up_rim h r dr (:533), -z_warp (:556)
    gap_gaussian: tuple | None = None       # (f, r[AU], sigma[AU])
    cavity: tuple | None = None             # (h[AU], r[AU], beta)
    puffed_rim: tuple | None = None         # (h_factor, r[AU], dr[AU])
    z_warp: float = 0.0
    limb_darkening: str | float | None = None  # -limb_darkening (input.f90:628)
    ism_model: int = 0             # -ISM_heating: 0 off, 1 ProDiMo, 2 Bate&Keto
    # -spot T_spot surf_fraction theta phi (init_mcfost.f90:1111-1126)
    spot: tuple | None = None
    # memory-tiering hints (-max_mem GB / -limit_mem n,
    # init_mcfost.f90:702,1242; the TPU build's p_icell bucket compression
    # already collapses per-cell tables, so these only cap MC batch sizes)
    max_mem_gb: float | None = None
    limit_mem: int = 0
    # -Mueller <file>: user-supplied opacity + Mueller matrix
    # (Mueller_input, scattering.f90:383-580)
    mueller_file: str | None = None
    fresnel_file: str | None = None       # -Fresnel / -Fresnel_size
    fresnel_per_size: bool = False
    # long-tail CLI controls (init_mcfost.f90:462-1530)
    max_err: float | None = None          # -max_err NLTE tolerance
    v_syst: float = 0.0                   # -v_syst [km/s] cube offset
    no_vr: bool = False                   # -no_vr: zero radial velocity
    no_vz: bool = False                   # -no_vz: zero vertical velocity
    tau_dark_zone: float | None = None    # -tau_dark_zone_eq_th
    tau_dark_zone_obs: float | None = None
    force_ne: bool = False                # -solve_ne (ignore ne.fits)
    atom_initial: str | None = None       # -escape_prob
    see_lte: bool = False                 # -see_lte
    level_dissolution: bool = True        # -level_dissolution
    # SPH particle-editing suboptions (mess_up_SPH.f90 family)
    sph_cuts: dict = field(default_factory=dict)
    # -only_top / -only_bottom: molecular emission from one disk half
    # (optical_depth.f90:517-519)
    mol_half: int = 0
    chi_ism: float = 1.0
    # ---- round-4 CLI long tail (init_mcfost.f90:462-1530) ----
    force_3d: bool = False            # -3D (l3D: no z symmetry)
    tilt_angle: float = 0.0           # -tilt [deg], about the x axis
    izone_tilt: int = 1               # -izone: which zone -tilt applies to
    remove_species: tuple | None = None  # -rs (ispecies, T_rm)
    killing_level: int | None = None  # -killing_level (n_dif_max_eq_th)
    weight_emission: bool = False     # -weight_emission
    approx_diffusion: bool = True     # -no_diff_approx disables
    only_diff_approx: bool = False    # -only_diff_approx
    force_diff_approx: bool = False   # -diff_approx
    pmax_overwrite: float | None = None  # -Pmax (scale -S12/S11 peak)
    fluffyness: float | None = None   # -fluffy (porosity fraction)
    grain_size_file: str | None = None  # -grain_size_distrib_file
    force_pah_eq: bool = False        # -force_PAH_equilibrium
    force_pah_out_eq: bool = False    # -force_PAH_out_equilibrium
    tmax_pah: float | None = None     # -Tmax_PAH
    force_pah: bool = False           # -pah
    correct_density: tuple | None = None   # (factor, Rin, Rout)
    correct_tgas: float | None = None      # -correct_Tgas
    z_scaling_env: float = 1.0        # -z_scaling_env
    chi_infall: float | None = None   # -chi_infall (radial infall / v_kep)
    vphi_kep: bool = False            # -vphi_Kep: force Keplerian v_phi
    cyl_rotation: bool = False        # -cylindrical_rotation
    old_pa: bool = False              # -old_PA (pre-2019 PA convention)
    split_image: bool = False         # -split_image (lsepar_ori)
    only_scatt: bool = False          # -only_scatt (dead in ref 4.1 too)
    n_mc_bins: tuple | None = None    # -n_MC_bins (ntheta, nazimuth)
    mol_cd: bool = False              # -mol_cd molecular column density
    write_abundance: bool = False     # -write_abundance
    write_velocity: bool = False      # -write_velocity
    average_grain_size: bool = False  # -average_grain_size
    tau_to_cell: bool = False         # -optical_depth_to_cell
    flux_fraction_surface: float | None = None  # -flux_fraction_surface
    prodimo_version: int = 5          # -prodimo1..4 override
    prodimo_fpah: float | None = None  # -prodimo_fPAH
    prodimo_input_dir: str | None = None  # -prodimo_input_dir
    tmp_dir: str = ""                 # -tmp_dir (cache/scratch)
    art_hv: float | None = None       # -art_line_resol [km/s]
    istep_start: int = 1              # -start_step / -healpix_nlte
    istep_end: int = 2                # -end_step
    forced_g: float | None = None     # -force_HG <g>
    no_rt: bool = False               # -no-rt: MC observables only
    output_rates: bool = False        # -output_rates (atomic NLTE)
    ng_nperiod: int | None = None     # -Ng_Nperiod
    n_rays_mc: int | None = None      # -Nrays_mc_step
    ndelay_iterate_ne: int = 0        # -Ndelay_iterate_ne

    @property
    def rmin(self) -> float:
        return min(z.rmin for z in self.zones)

    @property
    def rmax(self) -> float:
        return max(z.rmax for z in self.zones)


class _TokenReader:
    """Line-oriented token reader; each data line is whitespace split and
    trailing alphabetic comments are naturally skipped because we only
    consume as many leading tokens as requested."""

    def __init__(self, text: str):
        # Keep non-empty, non-comment lines
        self.lines = [
            ln for ln in text.splitlines()
            if ln.strip() and not ln.strip().startswith("#")
        ]
        self.pos = 0

    def line(self, n: int) -> List[str]:
        """Return first n tokens of the next line."""
        if self.pos >= len(self.lines):
            raise ValueError("unexpected end of parameter file")
        toks = self.lines[self.pos].split()
        self.pos += 1
        if len(toks) < n:
            raise ValueError(
                f"expected {n} tokens on line {self.pos}: {self.lines[self.pos-1]!r}")
        return toks[:n]

    def peek_float(self) -> float:
        return float(self.lines[self.pos].split()[0])


def parse_para(text: str) -> Para:
    """Parse a versioned parameter file (reference: src/read_param.f90:16-110).

    Supports the current 4.1 format plus the legacy layouts back to 2.19
    (read_para219/220/221/30/40, read_param.f90 version dispatch); the
    structural deltas are: pre-4.1 formats put the molecular velocity grid
    on the molecule-file line and lack the atoms section (<4.0), pre-2.21
    formats carry an MC-binning line in Maps and a Cavity section, and
    2.19 lacks the RT azimuth line.
    """
    rd = _TokenReader(text)
    version = float(rd.line(1)[0])
    if version < 2.10 - 1e-6:
        raise NotImplementedError(
            f"parameter file version {version} not supported (>=2.10);"
            " re-save the model with a newer reference format")
    p = Para(version=version)

    def vlt(x):
        return version < x - 1e-6

    def vge(x):
        return version >= x - 1e-6

    # Photons (2.10-2.14 carry an n_photons_loop multiplier,
    # read_param.f90 read_para210-214: n_photons_total = loop * eq_th;
    # 2.10 adds a checkpointing line, read_para210)
    n_loop = 1.0
    if vlt(2.15):
        n_loop = float(rd.line(1)[0])
    t = rd.line(1); p.photons.n_eq_th = float(t[0]) * n_loop
    t = rd.line(1); p.photons.n_lambda = float(t[0]) * n_loop
    t = rd.line(1); p.photons.n_image = float(t[0]) * n_loop
    if vlt(2.11):
        rd.line(1)   # checkpointing flag + interval (never implemented)

    # Wavelengths
    t = rd.line(3)
    p.wavelengths.n_lambda = int(float(t[0]))
    p.wavelengths.lambda_min = float(t[1])
    p.wavelengths.lambda_max = float(t[2])
    t = rd.line(3)
    p.wavelengths.compute_temp = _to_bool(t[0])
    p.wavelengths.compute_sed = _to_bool(t[1])
    p.wavelengths.default_grid = _to_bool(t[2])
    t = rd.line(1); p.wavelengths.wavelength_file = t[0]
    if vlt(2.14):
        rd.line(1)   # l_em_disk_image (obsolete, read_para213)
    t = rd.line(2)
    p.wavelengths.separate_contributions = _to_bool(t[0])
    p.wavelengths.output_stokes = _to_bool(t[1])
    if vlt(2.11):
        rd.line(2)   # tau_max @ lambda (obsolete, 2.10 only)

    # Grid
    t = rd.line(1); p.grid.geometry = int(float(t[0]))
    t = rd.line(4)
    p.grid.n_rad = int(float(t[0])); p.grid.nz = int(float(t[1]))
    p.grid.n_az = int(float(t[2])); p.grid.n_rad_in = int(float(t[3]))

    # Maps.  Format history (read_param.f90):
    #   2.10-2.13  "N_thet N_phi nx ny zoom" + capture-bin-of-interest line
    #   2.14       "nx ny zoom"  + MC binning line  (map size from size_neb)
    #   2.15-2.17  "nx ny size zoom" + MC binning line
    #   2.18-2.20  "nx ny size" + MC binning line
    #   2.21+      "nx ny size"
    if vlt(2.14):
        t = rd.line(5)
        p.maps.nx = int(float(t[2])); p.maps.ny = int(float(t[3]))
        p.maps.zoom = float(t[4])
        rd.line(1)   # capt_interet, delta_capt, angle, lonly_capt_interet
    elif vlt(2.15):
        t = rd.line(3)
        p.maps.nx = int(float(t[0])); p.maps.ny = int(float(t[1]))
        p.maps.zoom = float(t[2])
        rd.line(2)   # MC capture binning
    else:
        if vlt(2.18):
            t = rd.line(4)
            p.maps.zoom = float(t[3])
        else:
            t = rd.line(3)
        p.maps.nx = int(float(t[0])); p.maps.ny = int(float(t[1]))
        p.maps.map_size = float(t[2])
        if vlt(2.21):
            rd.line(2)   # MC capture binning, dropped 2.21
    t = rd.line(4)
    p.maps.imin = float(t[0]); p.maps.imax = float(t[1])
    p.maps.n_incl = int(float(t[2])); p.maps.centered = _to_bool(t[3])
    if version >= 2.20 - 1e-6:
        t = rd.line(3)
        p.maps.az_min = float(t[0]); p.maps.az_max = float(t[1])
        p.maps.n_az_angles = int(float(t[2]))
    t = rd.line(1); p.maps.distance = float(t[0])
    t = rd.line(1); p.maps.disk_pa = float(t[0])

    # Scattering method: 4.1 dropped the grain/cell line — its single
    # line is the PHASE-FUNCTION method (read_para41x,
    # read_param.f90:202-208: scattering_method forced 0 = auto)
    if version >= 4.1 - 1e-6:
        p.scattering_method = 0
        t = rd.line(1); p.aniso_method = int(float(t[0]))
    else:
        t = rd.line(1); p.scattering_method = int(float(t[0]))
        t = rd.line(1); p.aniso_method = int(float(t[0]))

    # Symmetries
    t = rd.line(1); p.sym_image = _to_bool(t[0])
    t = rd.line(1); p.sym_central = _to_bool(t[0])
    t = rd.line(1); p.sym_axial = _to_bool(t[0])

    # Disk physics ("#Dust global properties" pre-2.18).  Deltas:
    #   2.10-2.14  global gas-to-dust line first; settling flag is a bool
    #              (lvariable_dust); no migration/hydrostatic lines;
    #              2.10-2.13 end with a "T_min, T_max, n_T" line
    #   2.15       like 2.16+ but settling still a bool, and no
    #              migration/hydrostatic lines (added 2.18)
    global_g2d = None
    if vlt(2.15):
        global_g2d = float(rd.line(1)[0])

    def settle(tok):
        # bool (pre-2.16 lvariable_dust) or int (settling type 0-3)
        if tok.upper().lstrip(".") [:1] in ("T", "F"):
            return 1 if _to_bool(tok) else 0
        return int(float(tok))
    t = rd.line(3)
    p.physics.settling_type = settle(t[0])
    p.physics.exp_strat = float(t[1]); p.physics.a_strat = float(t[2])
    if vge(2.18):
        t = rd.line(1); p.physics.radial_migration = _to_bool(t[0])
    t = rd.line(1); p.physics.sublimate_dust = _to_bool(t[0])
    if vge(2.18):
        t = rd.line(1); p.physics.hydrostatic_eq = _to_bool(t[0])
    t = rd.line(2)
    p.physics.viscous_heating = _to_bool(t[0])
    p.physics.alpha_viscosity = float(t[1])
    if vlt(2.14):
        t = rd.line(3)   # T_min, T_max, n_T (moved out of the file in 2.14)
        p.T_min = float(t[0]); p.T_max = float(t[1])
        p.n_T = int(float(t[2]))

    # Zones.  Radii-line history (read_param.f90):
    #   2.10-2.14  "rin rout size_neb edge"   (map_size = 2*size_neb)
    #   2.15-2.17  "rin rout edge"
    #   2.18+      "rin edge rout rc"
    t = rd.line(1); n_zones = int(float(t[0]))
    p.zones = []
    for _ in range(n_zones):
        z = Zone()
        t = rd.line(1); z.geometry = int(float(t[0]))
        if vlt(2.15):
            t = rd.line(1)
            z.dust_mass = float(t[0]); z.gas_to_dust = global_g2d
        else:
            t = rd.line(2)
            z.dust_mass = float(t[0]); z.gas_to_dust = float(t[1])
        if vge(2.19):
            t = rd.line(3)
            z.scale_height = float(t[0]); z.ref_radius = float(t[1])
            z.vert_profile_exp = float(t[2])
        else:
            t = rd.line(2)
            z.scale_height = float(t[0]); z.ref_radius = float(t[1])
        if vlt(2.15):
            t = rd.line(4)
            z.rin = float(t[0]); z.rout = float(t[1]); z.edge = float(t[3])
            z.rc = z.rout
            p.maps.map_size = 2.0 * float(t[2])
        elif vlt(2.18):
            t = rd.line(3)
            z.rin = float(t[0]); z.rout = float(t[1]); z.edge = float(t[2])
            z.rc = z.rout
        else:
            t = rd.line(4)
            z.rin = float(t[0]); z.edge = float(t[1])
            z.rout = float(t[2]); z.rc = float(t[3])
        t = rd.line(1); z.flaring_exp = float(t[0])
        if vge(2.17):
            t = rd.line(2)
            z.surface_density_exp = float(t[0]); z.gamma_exp = float(t[1])
        else:
            t = rd.line(1)
            z.surface_density_exp = float(t[0]); z.gamma_exp = 0.0
        p.zones.append(z)

    # Cavity section (pre-2.21 formats only; now a CLI flag -cavity)
    if version < 2.21 - 1e-6:
        t = rd.line(1); has_cavity = _to_bool(t[0])
        t = rd.line(2); h_cav, r_cav = float(t[0]), float(t[1])
        t = rd.line(1); beta_cav = float(t[0])
        if has_cavity:
            p.cavity = (h_cav, r_cav, beta_cav)

    # Grain properties (per zone).  Species-line history (read_param.f90):
    #   2.10-2.12  "file porosity mass_fraction"  (one Mie component)
    #   2.13-2.15  "n_comp mixing porosity mass_frac" + component lines
    #   2.16       + leading grain type (Mie|DHS), no Vmax
    #   2.17+      + trailing DHS Vmax
    p.dust = []
    for _iz in range(n_zones):
        t = rd.line(1); n_species = int(float(t[0]))
        species = []
        for _ in range(n_species):
            s = DustSpecies()
            if vlt(2.13):
                t = rd.line(3)
                s.grain_type = "Mie"; s.n_components = 1; s.mixing_rule = 1
                s.porosity = float(t[1]); s.mass_fraction = float(t[2])
                s.components = [DustComponent(optical_indices_file=t[0],
                                              volume_fraction=1.0)]
            else:
                if vlt(2.16):
                    t = rd.line(4)
                    s.grain_type = "Mie"
                    t = ["Mie"] + t
                elif vlt(2.17):
                    t = rd.line(5)
                else:
                    t = rd.line(6)
                s.grain_type = t[0]
                s.n_components = int(float(t[1]))
                s.mixing_rule = int(float(t[2]))
                s.porosity = float(t[3])
                s.mass_fraction = float(t[4])
                if len(t) > 5:
                    s.dhs_vmax = float(t[5])
                s.components = []
                for _c in range(s.n_components):
                    t = rd.line(2)
                    s.components.append(
                        DustComponent(optical_indices_file=t[0],
                                      volume_fraction=float(t[1])))
            t = rd.line(1); s.heating_method = int(float(t[0]))
            t = rd.line(4)
            s.amin = float(t[0]); s.amax = float(t[1])
            s.aexp = float(t[2]); s.n_grains = int(float(t[3]))
            species.append(s)
        p.dust.append(species)

    # Molecular RT settings
    legacy_mol = version < 4.1 - 1e-6
    if vlt(2.11):
        # 2.10 (read_para210): "vmax, v_turb, n_speed" first, then
        # "lpop, lprecise_pop, LTE, width", then exactly one molecule
        # with no per-molecule velocity line
        t = rd.line(3)
        vmax210 = float(t[0]); p.mol.v_turb = float(t[1])
        p.mol.v_turb_unit = "km/s"
        n_speed210 = int(float(t[2]))
        t = rd.line(4)
        p.mol.lpop = _to_bool(t[0]); p.mol.laccurate_pop = _to_bool(t[1])
        p.mol.lte = _to_bool(t[2])
        m = Molecule()
        t = rd.line(2); m.filename = t[0]; m.level_max = int(float(t[1]))
        m.vmax = vmax210; m.vmin = -vmax210
        m.n_speed = 2 * n_speed210 + 1
        t = rd.line(3)
        m.cst_abundance = _to_bool(t[0]); m.abundance = float(t[1])
        m.abundance_file = t[2]
        t = rd.line(2)
        m.ray_tracing = _to_bool(t[0]); m.n_lines_rt = int(float(t[1]))
        t = rd.line(m.n_lines_rt)
        m.transitions = [int(float(x)) for x in t]
        p.mol.molecules = [m]

        # Stars (2.10: 7-token star line, no fUV line)
        t = rd.line(1); n_stars = int(float(t[0]))
        p.stars = []
        for _ in range(n_stars):
            s = Star()
            t = rd.line(7)
            s.teff = float(t[0]); s.radius = float(t[1])
            s.mass = float(t[2])
            s.x = float(t[3]); s.y = float(t[4]); s.z = float(t[5])
            s.auto_spectrum = _to_bool(t[6])
            t = rd.line(1); s.spectrum_file = t[0]
            s.fuv = 0.0; s.slope_fuv = 2.2
            p.stars.append(s)
        return p
    if legacy_mol:
        # "lpop, laccurate_pop, LTE, profile width [km/s]"
        t = rd.line(4)
        p.mol.lpop = _to_bool(t[0]); p.mol.laccurate_pop = _to_bool(t[1])
        p.mol.lte = _to_bool(t[2])
        t = rd.line(1)
        p.mol.v_turb = float(t[0]); p.mol.v_turb_unit = "km/s"
    else:
        t = rd.line(3)
        p.mol.lpop = _to_bool(t[0]); p.mol.laccurate_pop = _to_bool(t[1])
        p.mol.lte = _to_bool(t[2])
        t = rd.line(2)
        p.mol.v_turb = float(t[0]); p.mol.v_turb_unit = t[1]
    t = rd.line(1); n_mol = int(float(t[0]))
    p.mol.molecules = []
    for _ in range(n_mol):
        m = Molecule()
        t = rd.line(2); m.filename = t[0]; m.level_max = int(float(t[1]))
        if legacy_mol:
            # symmetric velocity grid "vmax [km/s], n bins in (0, vmax]"
            t = rd.line(2)
            m.vmax = float(t[0]); m.vmin = -m.vmax
            m.n_speed = 2 * int(float(t[1])) + 1
        t = rd.line(3)
        m.cst_abundance = _to_bool(t[0]); m.abundance = float(t[1])
        m.abundance_file = t[2]
        t = rd.line(2)
        m.ray_tracing = _to_bool(t[0]); m.n_lines_rt = int(float(t[1]))
        t = rd.line(m.n_lines_rt)
        m.transitions = [int(float(x)) for x in t]
        if not legacy_mol:
            t = rd.line(3)
            m.vmin = float(t[0]); m.vmax = float(t[1])
            m.n_speed = int(float(t[2]))
        p.mol.molecules.append(m)

    # Atoms (4.0 addition)
    if version >= 4.0 - 1e-6:
        t = rd.line(1); n_atoms = int(float(t[0]))
        p.atoms.atoms = []
        for _ in range(n_atoms):
            a = Atom()
            t = rd.line(1); a.filename = t[0]
            t = rd.line(1); a.non_lte = _to_bool(t[0])
            t = rd.line(1); a.initial_solution = int(float(t[0]))
            t = rd.line(2); a.vmax = float(t[0]); a.n_points = int(float(t[1]))
            t = rd.line(2); a.images = _to_bool(t[0]); a.n_lines = int(float(t[1]))
            a.lines = []
            for _l in range(a.n_lines):
                t = rd.line(2)
                a.lines.append((int(float(t[0])), int(float(t[1]))))
            p.atoms.atoms.append(a)

    # Stars (2.11 carries fUV on the star line, read_para211; the
    # separate "fUV, slope_fUV" line exists from 2.12)
    t = rd.line(1); n_stars = int(float(t[0]))
    p.stars = []
    for _ in range(n_stars):
        s = Star()
        t = rd.line(8 if vlt(2.12) else 7)
        s.teff = float(t[0]); s.radius = float(t[1]); s.mass = float(t[2])
        s.x = float(t[3]); s.y = float(t[4]); s.z = float(t[5])
        s.auto_spectrum = _to_bool(t[6])
        if vlt(2.12):
            s.fuv = float(t[7]); s.slope_fuv = 2.2
        t = rd.line(1); s.spectrum_file = t[0]
        if vge(2.12):
            t = rd.line(2); s.fuv = float(t[0]); s.slope_fuv = float(t[1])
        p.stars.append(s)

    return p


def read_para(path: str) -> Para:
    with open(path) as f:
        p = parse_para(f.read())
    # remember where the file came from so sibling inputs (lambda files,
    # spectra) can be resolved relative to it
    p.source_path = path
    return p


def default_ref_para() -> Para:
    """The ref4.1 disk model (reference: src/ref4.1.para), as built-in defaults."""
    return Para()


def write_para(para: Para, path: str):
    """Write a 4.1-format parameter file from the configuration
    (the -get_para role; format contract docs/parameter_file.rst +
    src/ref4.1.para)."""
    def b(v):
        return "T" if v else "F"
    w = para.wavelengths
    g = para.grid
    m = para.maps
    lines = []
    a = lines.append
    a("4.1                       mcfost version")
    a("")
    a("#Number of photon packages")
    a(f"  {para.photons.n_eq_th:.6g}   nbr_photons_eq_th")
    a(f"  {para.photons.n_lambda:.6g}   nbr_photons_lambda")
    a(f"  {para.photons.n_image:.6g}   nbr_photons_image")
    a("")
    a("#Wavelength")
    a(f"  {w.n_lambda} {w.lambda_min:g} {w.lambda_max:g}   "
      "n_lambda, lambda_min, lambda_max [mum]")
    a(f"  {b(w.compute_temp)} {b(w.compute_sed)} {b(w.default_grid)}   "
      "compute temperature?, compute sed?, use default wavelength grid?")
    a(f"  {w.wavelength_file or 'IMLup.lambda'}   wavelength file")
    a(f"  {b(w.separate_contributions)} {b(w.output_stokes)}   "
      "separation of different contributions?, stokes parameters?")
    a("")
    a("#Grid geometry and size")
    a(f"  {g.geometry}   1 = cylindrical, 2 = spherical")
    a(f"  {g.n_rad} {g.nz} {g.n_az} {g.n_rad_in}   "
      "n_rad, nz (or n_theta), n_az, n_rad_in")
    a("")
    a("#Maps")
    a(f"  {m.nx} {m.ny} {m.map_size:g}   grid (nx,ny), size [AU]")
    a(f"  {m.imin:g} {m.imax:g} {m.n_incl} {b(m.centered)}   "
      "RT: imin, imax, n_incl, centered ?")
    a(f"  {m.az_min:g} {m.az_max:g} {m.n_az_angles}   "
      "RT: az_min, az_max, n_az angles")
    a(f"  {m.distance:g}   distance (pc)")
    a(f"  {m.disk_pa:g}   disk PA")
    a("")
    a("#Scattering method")
    a(f"  {para.aniso_method}   1=exact phase function, 2=hg")
    a("")
    a("#Symmetries")
    a(f"  {b(para.sym_image)}   image symmetry")
    a(f"  {b(para.sym_central)}   central symmetry")
    a(f"  {b(para.sym_axial)}   axial symmetry")
    a("")
    a("#Disk physics")
    ph = para.physics
    a(f"  {ph.settling_type} {ph.exp_strat:g} {ph.a_strat:g}   "
      "dust_settling, exp_strat, a_strat")
    a(f"  {b(ph.radial_migration)}   dust radial migration")
    a(f"  {b(ph.sublimate_dust)}   sublimate dust")
    a(f"  {b(ph.hydrostatic_eq)}   hydrostatic equilibrium")
    a(f"  {b(ph.viscous_heating)} {ph.alpha_viscosity:g}   "
      "viscous heating, alpha_viscosity")
    a("")
    a("#Number of zones")
    a(f"  {len(para.zones)}")
    a("")
    a("#Density structure")
    for z in para.zones:
        a(f"  {z.geometry}   zone type")
        a(f"  {z.dust_mass:g} {z.gas_to_dust:g}   dust mass, gas-to-dust")
        a(f"  {z.scale_height:g} {z.ref_radius:g} {z.vert_profile_exp:g}"
          "   scale height, ref radius, profile exp")
        a(f"  {z.rin:g} {z.edge:g} {z.rout:g} {z.rc:g}   "
          "Rin, edge, Rout, Rc")
        a(f"  {z.flaring_exp:g}   flaring exponent")
        a(f"  {z.surface_density_exp:g} {z.gamma_exp:g}   "
          "surface density exponent, -gamma_exp")
    a("")
    a("#Grain properties")
    for iz, species in enumerate(para.dust):
        a(f"  {len(species)}   number of species")
        for sp in species:
            a(f"  {sp.grain_type} {sp.n_components} {sp.mixing_rule} "
              f"{sp.porosity:g} {sp.mass_fraction:g} {sp.dhs_vmax:g}   "
              "grain type, n_components, mixing rule, porosity, "
              "mass fraction, Vmax")
            for c in sp.components:
                a(f"  {c.optical_indices_file}  {c.volume_fraction:g}")
            a(f"  {sp.heating_method}   heating method")
            a(f"  {sp.amin:g} {sp.amax:g} {sp.aexp:g} {sp.n_grains}   "
              "amin, amax, aexp, n_grains")
    a("")
    a("#Molecular RT settings")
    mo = para.mol
    a(f"  {b(mo.lpop)} {b(mo.laccurate_pop)} {b(mo.lte)}   "
      "lpop, laccurate_pop, LTE")
    vt = mo.v_turb if np.isscalar(mo.v_turb) else float(np.mean(mo.v_turb))
    a(f"  {vt:g} {mo.v_turb_unit}   turbulence velocity, unit")
    a(f"  {len(mo.molecules)}   number of molecules")
    for mm in mo.molecules:
        a(f"  {mm.filename} {mm.level_max}   molecular data file, level_max")
        a(f"  {b(mm.cst_abundance)} {mm.abundance:g} "
          f"{mm.abundance_file or 'abundance.fits.gz'}   "
          "cst molecule abundance?, abundance, abundance file")
        a(f"  {b(mm.ray_tracing)} {mm.n_lines_rt}   "
          "ray tracing?, number of lines in ray-tracing")
        a("  " + " ".join(str(t) for t in mm.transitions)
          + "   transition numbers")
        a(f"  {mm.vmin:g} {mm.vmax:g} {mm.n_speed}   "
          "vmin, vmax [km/s], n_speed")
    a("")
    a("#Atoms settings")
    a(f"  {len(para.atoms.atoms)}   n_atoms")
    for at in para.atoms.atoms:
        a(f"  {at.filename}")
        a(f"  {b(at.non_lte)}   non-LTE?")
        a(f"  {at.initial_solution}   initial solution")
        a(f"  {at.vmax:g} {at.n_points}   vmax, n_points")
        a(f"  {b(at.images)} {at.n_lines}   images (T) or total flux "
          "(F)? number of lines")
        for (ju, jl) in at.lines:
            a(f"  {ju} {jl}")
    a("")
    a("#Star properties")
    a(f"  {len(para.stars)}   n_stars")
    for st in para.stars:
        a(f"  {st.teff:g} {st.radius:g} {st.mass:g} {st.x:g} {st.y:g} "
          f"{st.z:g} {b(st.auto_spectrum)}   "
          "Teff, Rstar, Mstar, x, y, z, automatic spectrum?")
        a(f"  {st.spectrum_file or 'lte4000-3.5.NextGen.fits.gz'}")
        a(f"  {st.fuv:g} {st.slope_fuv:g}   fUV, slope_fUV")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path
