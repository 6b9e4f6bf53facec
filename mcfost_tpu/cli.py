"""Command-line interface.

Usage mirrors the reference (``mcfost <para> [options]``,
reference src/init_mcfost.f90:392-460):

    python -m mcfost_tpu <para-file> [options]

Implemented modes (subset growing toward the reference's ~190 flags,
docs/options.rst):
  (none)        thermal MC + temperature + MC SED (etape 1 + SED step)
  -img <lam>    monochromatic image at <lam> micron (MC observables)
  -mol          molecular line cubes (LTE populations, Tgas = Tdust)
  -seed <n>     RNG seed
  -root_dir <d> output root directory
  -n_rad/-nz/-n_az <n>  grid overrides
  -nphot_th / -nphot_sed <n>  packet-count overrides
  -no_sed       skip the SED step
"""
from __future__ import annotations

import math
import os
import sys
import time


def _backup_dir(path: str, no_backup: bool):
    """Never overwrite existing outputs: move them to <dir>_old first
    (reference behaviour, docs/running.rst:60-65; -no_backup disables)."""
    if no_backup or not os.path.isdir(path):
        return
    import shutil
    old = path + "_old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(path, old)


def main(argv=None):
    # the -safe_stop budget is scoped to THIS run: clear it on exit so
    # later in-process runs (test harness, library use) are unaffected
    try:
        return _main(argv)
    finally:
        os.environ.pop("MCFOST_TPU_SAFE_STOP_S", None)
        os.environ.pop("MCFOST_TPU_START_TIME", None)


def _main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0

    from .config.para import read_para, default_ref_para

    para_file = None
    if not argv[0].startswith("-"):
        para_file = argv.pop(0)

    # positional benchmark keywords (init_mcfost.f90:430-460)
    from .benchmarks import BENCHMARK_NAMES, run_benchmark
    bench_name = next((b for b in BENCHMARK_NAMES
                       if para_file and para_file.startswith(b)), None)
    if bench_name is not None:
        root = "."
        seed = None
        for j, a in enumerate(argv):
            if a == "-root_dir":
                root = argv[j + 1]
            elif a == "-seed":
                seed = int(argv[j + 1])
        print(f"mcfost_tpu: running {bench_name} benchmark")
        run_benchmark(bench_name, root_dir=root, seed=seed)
        return 0

    para = read_para(para_file) if para_file else default_ref_para()

    root_dir = "."
    seed = None
    do_sed = True
    do_mol = False
    do_diag = []
    img_lambda = None
    n_per_lambda = None
    output_j = False
    output_uv = False
    phantom_file = None
    do_atom = False
    hydro_spec = None
    scale_length = 1.0
    do_prodimo = False
    do_astrochem = False
    ml_model_path = None
    do_ml = False
    from .physics.chemistry import ChemistrySettings
    chem = ChemistrySettings()
    jy = False
    casa = False
    safe_stop_s = None
    not_random_voronoi = False
    spatial_dd = False
    rt_scheme = "rt1"
    want_origin = False
    want_reemission = False
    iterate_ne = 0
    healpix_lorder = None
    ng_norder = 2
    t_file = None
    no_backup = False
    img_lambda_op = None
    stop_after_init = False
    header_only = False
    phantom_multi = None
    phantom_avg = False
    seb_c_grid = False
    bench_shg = False
    mathis_field = 1.0
    p2m = False

    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-seed":
            i += 1; seed = int(argv[i])
        elif a == "-root_dir":
            i += 1; root_dir = argv[i]
        elif a == "-n_rad":
            i += 1; para.grid.n_rad = int(argv[i])
        elif a == "-nz":
            i += 1; para.grid.nz = int(argv[i])
        elif a == "-n_az":
            i += 1; para.grid.n_az = int(argv[i])
        elif a == "-resol":
            para.maps.nx = int(argv[i + 1])
            para.maps.ny = int(argv[i + 2]); i += 2
        elif a == "-nphot_img":
            i += 1; para.photons.n_image = float(argv[i])
        elif a == "-nphot_th":
            i += 1; para.photons.n_eq_th = float(argv[i])
        elif a == "-nphot_sed":
            i += 1; para.photons.n_lambda = float(argv[i])
        elif a == "-img":
            i += 1; img_lambda = float(argv[i])
        elif a == "-phantom":
            i += 1; phantom_file = argv[i]
        elif a == "-gadget2":
            i += 1; hydro_spec = ("gadget2", argv[i])
        elif a == "-density_file":
            i += 1; hydro_spec = ("density_file", argv[i])
        elif a == "-sigma_file":
            i += 1; hydro_spec = ("sigma_file", argv[i])
        elif a == "-fargo3d":
            hydro_spec = ("fargo3d", argv[i + 1], argv[i + 2]); i += 2
        elif a in ("-athena++", "-athena"):
            i += 1; hydro_spec = ("athena", argv[i])
        elif a == "-idefix":
            i += 1; hydro_spec = ("idefix", argv[i])
        elif a == "-pluto":
            hydro_spec = ("pluto", argv[i + 1], argv[i + 2]); i += 2
        elif a == "-scale_length_units":
            i += 1; scale_length = float(argv[i])
        elif a == "-model_1d":
            i += 1; hydro_spec = ("model_1d", argv[i])
        elif a == "-sphere_mesh":
            i += 1; hydro_spec = ("sphere_mesh", argv[i])
        elif a == "-hydro_regrid":
            # extension (not a reference flag): force the pre-r5
            # regrid-onto-para-grid behavior for structured hydro input
            # instead of adopting the snapshot's own mesh
            para.hydro_regrid = True
        elif a == "-mhd_voronoi":
            i += 1; hydro_spec = ("mhd_voronoi", argv[i])
        elif a == "-mol":
            do_mol = True
        elif a == "-atom":
            do_atom = True
        elif a == "-disk_struct":
            # the reference stops after init with -disk_struct
            # (lstop_after_init, init_mcfost.f90:621-624); +disk_struct
            # writes the same files and continues
            do_diag.append("disk"); stop_after_init = True
        elif a == "-dust_prop":
            do_diag.append("dust"); stop_after_init = True
        elif a in ("-tau_map", "-optical_depth_map"):
            do_diag.append("tau")
        elif a in ("-cd", "-column_density"):
            do_diag.append("cd")
        elif a == "-tau=1_surface":
            do_diag.append(("tausurf", 1.0))
        elif a == "-tau_surface":
            i += 1; do_diag.append(("tausurf", float(argv[i])))
        elif a == "-no_sed":
            do_sed = False
        elif a == "-prodimo":
            do_prodimo = True
        elif a == "-astrochem":
            do_astrochem = True
        elif a == "-ML":
            do_ml = True
            if i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                i += 1; ml_model_path = argv[i]
        elif a == "-output_J":
            output_j = True
        elif a == "-output_UV_field":
            output_uv = True
        elif a in ("-iso", "-isotropic"):
            para.iso_scattering = True
        elif a in ("-hg", "-HG"):
            para.hg_scattering = True
        elif a in ("-no_scattering", "-no_scatt"):
            para.no_scattering = True
        elif a == "-qsca=qabs":
            para.qsca_equal_qabs = True
        elif a == "-zoom":
            i += 1; para.maps.map_size = para.maps.map_size / float(argv[i])
        elif a == "-PA":
            i += 1; para.maps.disk_pa = float(argv[i])
        elif a == "-Tfile":
            i += 1; t_file = argv[i]
        elif a == "-no_backup":
            no_backup = True
        elif a == "-op":
            # opacity-only mode: dust properties at one wavelength
            # (lopacite_only, init_mcfost.f90:499-510)
            i += 1; img_lambda_op = float(argv[i])
            do_diag.append("dust")
            do_sed = False
            do_mol = False
        elif a == "-max_mem":
            i += 1; para.max_mem_gb = float(argv[i])
        elif a == "-limit_mem":
            i += 1; para.limit_mem = int(argv[i])
        elif a == "-setup":
            # offline variant of the reference's data-dir setup
            # (init_mcfost.f90:394): create/inspect $MCFOST_UTILS; this
            # build has no network egress so nothing is downloaded
            base = os.environ.get("MCFOST_UTILS", "")
            if not base:
                print("error: MCFOST_UTILS is not set; point it at a "
                      "directory holding Dust/ Molecules/ Atoms/ "
                      "Stellar_Spectra/ data")
                return 1
            os.makedirs(base, exist_ok=True)
            for sub in ("Dust", "Molecules", "Atoms", "Stellar_Spectra",
                        "Lambda"):
                d_ = os.path.join(base, sub)
                os.makedirs(d_, exist_ok=True)
                n_ = len(os.listdir(d_))
                print(f"  {sub}/: {n_} files"
                      + ("  (empty - populate manually; no network "
                         "egress in this build)" if n_ == 0 else ""))
            return 0
        elif a == "-get_para":
            # print the default parameter file version (the reference
            # copies its bundled ref<version>.para)
            from .config.para import write_para
            write_para(para, "ref4.1_default.para")
            print("wrote ref4.1_default.para")
            return 0
        elif a == "-gap":
            para.gap_gaussian = (float(argv[i + 1]), float(argv[i + 2]),
                                 float(argv[i + 3])); i += 3
        elif a == "-cavity":
            para.cavity = (float(argv[i + 1]), float(argv[i + 2]),
                           float(argv[i + 3])); i += 3
        elif a == "-puffed_up_rim":
            para.puffed_rim = (float(argv[i + 1]), float(argv[i + 2]),
                               float(argv[i + 3])); i += 3
        elif a == "-z_warp":
            i += 1; para.z_warp = float(argv[i])
        elif a == "-freeze_out":
            i += 1; chem.freeze_out = True
            chem.T_freeze_out = float(argv[i])
        elif a in ("-freeze_out_depletion", "-freeze-out_depletion"):
            i += 1; chem.freeze_out_depletion = float(argv[i])
        elif a == "-photodissociation":
            chem.photo_dissociation = True
            if i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                i += 1; chem.photodissociation_factor = float(argv[i])
        elif a == "-photodesorption":
            chem.photo_desorption = True
        elif a == "-casa":
            casa = True
        elif a == "-Jy":
            jy = True
        elif a == "-safe_stop":
            safe_stop_s = 3600.0
            if i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                i += 1; safe_stop_s = float(argv[i])
        elif a == "-not_random_Voronoi":
            not_random_voronoi = True
        elif a == "-ISM_heating":
            para.ism_model = 1
            if i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                i += 1; para.chi_ism = float(argv[i])
        elif a == "-ISM_heating_Bate":
            para.ism_model = 2
        elif a in ("-Mueller", "-mueller", "-phase_function"):
            i += 1; para.mueller_file = argv[i]
        elif a == "-Fresnel":
            i += 1; para.fresnel_file = argv[i]
        elif a == "-Fresnel_size":
            i += 1; para.fresnel_file = argv[i]
            para.fresnel_per_size = True
        elif a == "-zeeman_polarisation":
            # mirror the reference exactly: the flag exists and errors
            # (init_mcfost.f90:881-882 "Zeeman polarisation not yet!")
            raise SystemExit("Zeeman polarisation not yet!")
        # ---- observable/physics toggles (init_mcfost.f90:462-1530) ----
        elif a == "-pola":
            para.wavelengths.output_stokes = True
        elif a == "-no_SED":
            para.wavelengths.compute_sed = False
        elif a == "-no_T":
            para.wavelengths.compute_temp = False
        elif a in ("-mc", "-rt"):
            pass        # MC SED always captured; RT always on
        elif a == "-no-rt":
            # MC observables only, no ray-traced pass
            # (lscatt_ray_tracing=.false. + loutput_mc,
            # init_mcfost.f90:828-833)
            para.no_rt = True
        elif a == "-output_rates":
            para.output_rates = True
        elif a == "-nT":
            i += 1; para.n_T = int(argv[i])
        elif a == "-cutoff":
            i += 1; para.cutoff = float(argv[i])
        elif a == "-max_err":
            i += 1; para.max_err = float(argv[i])
        elif a == "-chi_ISM":
            i += 1; para.chi_ism = float(argv[i])
        elif a == "-v_syst":
            i += 1; para.v_syst = float(argv[i])     # km/s cube offset
        elif a in ("-no_vr", "-no_vz"):
            setattr(para, a[1:], True)
        elif a == "-tau_dark_zone_eq_th":
            i += 1; para.tau_dark_zone = float(argv[i])
        elif a == "-tau_dark_zone_obs":
            i += 1; para.tau_dark_zone_obs = float(argv[i])
        elif a == "-Mdot":
            istar = int(argv[i + 1]); mdot = float(argv[i + 2]); i += 2
            para.stars[min(istar, len(para.stars)) - 1].mdot = mdot
        elif a == "-age":
            i += 1
            print("WARNING: -age needs the Siess isochrone tables "
                  "(offline build); star parameters unchanged")
        elif a == "-img_offset":
            i += 3
            print("WARNING: IMAGE OFFSET NOT YET")   # init_mcfost.f90:484
        elif a == "-checkpoint":
            raise SystemExit("checkpointing is not yet implemented")
        elif a == "-safe_stop_time":
            i += 1; safe_stop_s = float(argv[i]) * 86400.0
        elif a in ("-v", "-version"):
            print("mcfost_tpu 4.1.12-tpu (reference parity: mcfost 4.1)")
            return 0
        # ---- atomic-loop controls ----
        elif a == "-solve_ne":
            para.force_ne = True        # ignore a stored ne.fits.gz
        elif a == "-escape_prob":
            para.atom_initial = "escape"
        elif a == "-see_lte":
            if para.atoms.atoms:
                para.atoms.atoms[0].non_lte = False
            para.see_lte = True
        elif a == "-level_dissolution":
            para.level_dissolution = True
        # ---- SPH / Voronoi particle editing (mess_up_SPH.f90:17-174) ----
        elif a == "-delete_Hill_sphere":
            para.sph_cuts["delete_hill_sphere"] = True
        elif a == "-mask_inside_rsph":
            i += 1; para.sph_cuts["delete_inside_r"] = float(argv[i])
        elif a in ("-delete_outside_rsph", "-mask_outside_rsph"):
            i += 1; para.sph_cuts["rmax"] = float(argv[i])
        elif a in ("-delete_above_latitude", "-mask_above_latitude"):
            i += 1
            para.sph_cuts["latitude_max"] = math.radians(float(argv[i]))
        elif a == "-centre_on_sink":
            i += 1; para.sph_cuts["centre_on_sink"] = int(argv[i])
        elif a == "-planet_az":
            i += 1; para.sph_cuts["planet_az"] = float(argv[i])
        elif a == "-scale_mass_units":
            i += 1; para.sph_cuts["scale_mass"] = float(argv[i])
        elif a == "-limb_darkening":
            i += 1; para.limb_darkening = argv[i]
        elif a == "-iterate_ne":
            # re-solve ne from the NLTE ionization every n MALI
            # iterations (atom_transfer.f90:155-165)
            iterate_ne = 3
            if i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                i += 1; iterate_ne = int(argv[i])
        elif a == "-healpix_lorder":
            i += 1; healpix_lorder = int(argv[i])
        elif a == "-Ng_Norder":
            i += 1; ng_norder = int(argv[i])
        elif a == "-origin":
            # escaped-energy-by-origin-cell map (write_origin,
            # output.f90:1366); image mode
            want_origin = True
        elif a == "-reemission_stats":
            want_reemission = True
        elif a == "-spot":
            # hot/cold photospheric spot on star 1: T_spot, surface
            # fraction, theta, phi (reference init_mcfost.f90:1111-1126)
            para.spot = (float(argv[i + 1]), float(argv[i + 2]),
                         float(argv[i + 3]), float(argv[i + 4])); i += 4
        elif a == "-only_top":
            para.mol_half = 1
        elif a == "-only_bottom":
            para.mol_half = 2
        elif a == "-star_bb":
            for st_ in para.stars:
                st_.auto_spectrum = False
                st_.blackbody = True
        elif a in ("-scatt_method", "-scattering_method"):
            i += 1; para.scattering_method = int(argv[i])
        elif a == "-aggregate":
            # the reference's own GMM path is disabled
            # (mueller_gmm: "needs to be updated", scattering.f90:619)
            print("error: GMM aggregates are disabled in the reference "
                  "(mueller_gmm needs to be updated, scattering.f90:619) "
                  "and are not implemented here either")
            return 1
        elif a == "-mol_LTE":
            para.mol.lte = True
        elif a == "-mol_NLTE":
            para.mol.lte = False
        elif a == "-rt2":
            # RT2 ray-traced observables: per-cell specific intensity
            # convolved with the phase matrix per viewing direction (the
            # reference's 2D default scheme, dust_ray_tracing.f90:717-1240)
            rt_scheme = "rt2"
        elif a == "-rt1":
            rt_scheme = "rt1"
        elif a == "-spatial_dd":
            # cell-sharded thermal MC (tallies split over devices, packets
            # ring-routed to their owner slab) for models whose per-cell
            # arrays exceed one chip's HBM — parallel/spatial.py
            spatial_dd = True
        # ---- aliases of existing flags (init_mcfost.f90 case lists) ----
        elif a == "-df":
            i += 1; hydro_spec = ("density_file", argv[i])
        elif a == "-sigma":
            i += 1; hydro_spec = ("sigma_file", argv[i])
        elif a == "-gadget":
            i += 1; hydro_spec = ("gadget2", argv[i])
        elif a == "-fargo":
            hydro_spec = ("fargo3d", argv[i + 1], argv[i + 2]); i += 2
        elif a == "-ml":
            do_ml = True
            if i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                i += 1; ml_model_path = argv[i]
        elif a in ("-Astrochem", "-AstroChem"):
            do_astrochem = True
        elif a in ("-photo_dissociation", "-photo-dissociation"):
            chem.photo_dissociation = True
        elif a in ("-photo_dissociation_factor", "-photo-dissociation-factor",
                   "-photodissociation-factor"):
            i += 1; chem.photo_dissociation = True
            chem.photodissociation_factor = float(argv[i])
        elif a in ("-photo_desorption", "-photo-desorption"):
            chem.photo_desorption = True
        elif a == "-freeze-out":
            i += 1; chem.freeze_out = True
            chem.T_freeze_out = float(argv[i])
        elif a in ("-phase-function", "-phase_function_file",
                   "-phase-function-file"):
            i += 1; para.mueller_file = argv[i]
        elif a in ("-vphi_Kep", "-vphi_kep"):
            para.vphi_kep = True
        elif a in ("-cylindrical_rotation", "-cyl_rotation", "-cyl_rot"):
            para.cyl_rotation = True
        elif a in ("-output_UV",):
            output_uv = True
        elif a in ("-output_J1", "-output_J_step1", "-output_J_step_th"):
            # J after the thermal step (loutput_J_step1); in this build
            # the thermal step is where J is tallied, same array
            output_j = True
        elif a in ("-ds", "-output_density_grid"):
            do_diag.append("disk"); stop_after_init = True
        elif a in ("+disk_struct", "+ds"):
            do_diag.append("disk")      # and continue with the run
        elif a == "+dust_prop":
            do_diag.append("dust")
        elif a in ("-tau_to_cell", "-optical_depth_to_cell"):
            para.tau_to_cell = True; do_diag.append("tau_cell")
        elif a in ("-mol_cd", "-mol_column_density"):
            para.mol_cd = True
        elif a == "-write_velocity":
            para.write_velocity = True; do_diag.append("disk")
        elif a == "-write_abundance":
            para.write_abundance = True
        elif a == "-average_grain_size":
            para.average_grain_size = True; do_diag.append("dust")
        elif a == "-tmp_dir":
            i += 1; para.tmp_dir = argv[i]
        elif a == "-old_PA":
            para.old_pa = True
        # ---- geometry modifiers ----
        elif a == "-3D":
            # l3D: disable the z/central/image symmetries (the grid keeps
            # the para file's n_az, as in the reference)
            para.force_3d = True
            para.sym_image = para.sym_central = para.sym_axial = False
        elif a == "-warp":
            i += 1; para.z_warp = float(argv[i])
            para.force_3d = True
            para.sym_image = para.sym_central = para.sym_axial = False
            if para.grid.n_az == 1:
                print("WARNING : forcing 3D mode")
        elif a == "-tilt":
            i += 1; para.tilt_angle = float(argv[i])
            para.force_3d = True
            para.sym_image = para.sym_central = para.sym_axial = False
            if para.grid.n_az == 1:
                print("WARNING : forcing 3D mode")
        elif a == "-izone":
            i += 1; para.izone_tilt = int(argv[i])
            if para.izone_tilt < 1:
                print("error: izone must be a positive integer"); return 1
        elif a == "-rs":
            para.remove_species = (int(argv[i + 1]), float(argv[i + 2]))
            i += 2
        elif a == "-z_scaling_env":
            i += 1; para.z_scaling_env = float(argv[i])
        elif a == "-correct_density":
            para.correct_density = (float(argv[i + 1]), float(argv[i + 2]),
                                    float(argv[i + 3])); i += 3
        # ---- MC / transfer controls ----
        elif a == "-killing_level":
            i += 1; para.killing_level = int(argv[i])
        elif a == "-weight_emission":
            # the machinery exists in the reference but its weights stay
            # unity: define_proba_weight_emission's body is fully
            # commented out (thermal_emission.f90:2090-2135), so the flag
            # is behaviourally a no-op there; mirrored here
            para.weight_emission = True
            print("WARNING: -weight_emission accepted; emission weights "
                  "are unity (as in the reference, whose "
                  "define_proba_weight_emission body is commented out)")
        elif a == "-no_diff_approx":
            para.approx_diffusion = False
        elif a == "-diff_approx":
            para.force_diff_approx = True
        elif a == "-only_diff_approx":
            para.only_diff_approx = True
        elif a == "-n_MC_bins":
            para.n_mc_bins = (int(argv[i + 1]), int(argv[i + 2])); i += 2
        elif a == "-only_scatt":
            # parsed but never read in the reference 4.1 either
            # (lonly_scatt is set at init_mcfost.f90:1092 and never used)
            para.only_scatt = True
            print("WARNING: -only_scatt is accepted but inert "
                  "(as in the reference, where lonly_scatt is never read)")
        elif a == "-split_image":
            para.split_image = True
        elif a == "-electron_scatt":
            # mirror the reference: the flag exists and errors
            # (init_mcfost.f90:735 "option -electron_scatt not yet")
            raise SystemExit("option -electron_scatt not yet")
        elif a == "-calc_jnu_atom":
            raise SystemExit("option -calc_jnu_atom not yet")
        # ---- dust / grain controls ----
        elif a == "-pah":
            # reference consumes emissivity model + grain type
            # (init_mcfost.f90 case("-pah"): model_pah, pah_grain)
            para.force_pah = True
            para.pah_model = argv[i + 1]
            para.pah_grain = argv[i + 2]
            i += 2
        elif a == "-Tmax_PAH":
            i += 1; para.tmax_pah = float(argv[i])
        elif a == "-force_PAH_equilibrium":
            para.force_pah_eq = True
        elif a == "-force_PAH_out_equilibrium":
            para.force_pah_out_eq = True
            if para.force_pah_eq:
                print("ERROR: cannot force eq. and out eq."); return 1
        elif a == "-grain_size_distrib_file":
            i += 1; para.grain_size_file = argv[i]
        elif a in ("-fluffy", "-fluffyness"):
            i += 1; para.fluffyness = float(argv[i])
        elif a == "-Pmax":
            i += 1; para.pmax_overwrite = float(argv[i])
        elif a == "-force_HG":
            i += 1; para.hg_scattering = True
            para.forced_g = float(argv[i])
        elif a == "-force_hg":
            i += 1; para.hg_scattering = True
            para.forced_g = float(argv[i])
        # ---- atomic NLTE loop controls ----
        elif a == "-start_step":
            i += 1; para.istep_start = int(argv[i])
        elif a == "-end_step":
            i += 1; para.istep_end = int(argv[i])
            if para.istep_end > 2:
                print("error: last step of non-LTE loop is capped at 2!")
                return 1
        elif a == "-healpix_nlte":
            para.istep_start = 1; para.istep_end = 1
        elif a == "-art_line_resol":
            i += 1; para.art_hv = float(argv[i])
        elif a == "-Ng_Nperiod":
            i += 1; para.ng_nperiod = int(argv[i])
        elif a == "-Nrays_mc_step":
            i += 1; para.n_rays_mc = int(argv[i])
            if para.n_rays_mc <= 0:
                print("error: N_rayons_mc must be > 0"); return 1
        elif a == "-Ndelay_iterate_ne":
            i += 1; para.ndelay_iterate_ne = int(argv[i])
        # ---- molecular physics ----
        elif a == "-correct_Tgas":
            i += 1; para.correct_tgas = float(argv[i])
        elif a == "-chi_infall":
            i += 1; para.chi_infall = float(argv[i])
        # ---- ProDiMo coupling variants ----
        elif a in ("-prodimo1", "-prodimo2", "-prodimo3", "-prodimo4"):
            do_prodimo = True; para.prodimo_version = int(a[-1])
        elif a == "-prodimo_input_dir":
            i += 1; para.prodimo_input_dir = argv[i]
        elif a == "-prodimo_fPAH":
            i += 1; para.prodimo_fpah = float(argv[i])
        elif a in ("-p2m", "-prodimo2mcfost"):
            p2m = True
        # ---- SPH / Voronoi particle handling ----
        elif a in ("-phantom-multi", "-phantom-add", "-phantom-avg"):
            n_files = int(argv[i + 1]); i += 1
            phantom_multi = [argv[i + 1 + k] for k in range(n_files)]
            i += n_files
            phantom_avg = (a == "-phantom-avg")
        elif a == "-SPH_amin":
            i += 1; para.sph_cuts["sph_amin"] = float(argv[i])
        elif a == "-SPH_amax":
            i += 1; para.sph_cuts["sph_amax"] = float(argv[i])
        elif a == "-force_Mgas":
            para.sph_cuts["force_mgas"] = True
        elif a in ("-limits", "-limits_file"):
            i += 1; para.sph_cuts["limits_file"] = argv[i]
        elif a == "-keep_particles":
            i += 1; f_ = float(argv[i])
            if not 0.0 <= f_ <= 1.0:
                print("error: keep_particles value must between 0 and 1")
                return 1
            para.sph_cuts["keep_particles"] = f_
        elif a in ("-fix_star", "-fix_stars"):
            para.sph_cuts["fix_stars"] = True
        elif a == "-ignore_dust":
            para.sph_cuts["ignore_dust"] = True
        elif a == "-ignore_sink":
            para.sph_cuts["ignore_sink"] = True
        elif a == "-no_internal_energy":
            para.sph_cuts["no_internal_energy"] = True
        elif a == "-turn-off_planets":
            para.sph_cuts["turn_off_planets"] = True
        elif a == "-turn-off_Lacc":
            para.sph_cuts["turn_off_lacc"] = True
        elif a == "-planet":
            i += 1; para.sph_cuts["which_planet"] = int(argv[i])
        elif a == "-delta_planet_az":
            para.sph_cuts["delta_planet_az"] = (int(argv[i + 1]),
                                                float(argv[i + 2])); i += 2
        elif a in ("-expand_z", "-expand-z", "-ez"):
            i += 1; para.sph_cuts["expand_z"] = float(argv[i])
        elif a == "-random_az":
            para.sph_cuts["random_az"] = True
        elif a == "-random_gap":
            i += 1; para.sph_cuts["random_gap"] = float(argv[i])
        elif a == "-random_outside_gap":
            i += 1; para.sph_cuts["random_outside_gap"] = float(argv[i])
        elif a == "-correct_density_elongated_cells":
            i += 1
            para.sph_cuts["correct_elongated"] = float(argv[i])
        elif a == "-header_only":
            header_only = True
        # ---- special / collaborator modes ----
        elif a == "-Seb_C":
            seb_c_grid = True
        elif a == "-read_Seb_C":
            hydro_spec = ("seb_charnoz", "twhydra_simuturb_mcfost.dat")
        elif a == "-read_Seb_C2":
            i += 1; hydro_spec = ("seb_charnoz", argv[i])
        elif a == "-benchmark_SHG":
            bench_shg = True
        elif a == "-Mathis_field":
            if not bench_shg:
                print("error: Mathis field can only be used with the "
                      "SHG benchmark"); return 1
            i += 1; mathis_field = float(argv[i])
        elif a == "-flux_fraction_surface":
            # energy-fraction surface maps of the molecular line cube
            # (emission_line_energy_fraction_surface_map,
            # mol_transfer.f90:1215-1320; init_mcfost.f90:1292-1296)
            i += 1; para.flux_fraction = float(argv[i])
        else:
            # Unknown flags are a hard error: a physics-changing reference
            # flag silently ignored would compute the wrong model
            # (reference errors out too, init_mcfost.f90 default case).
            print(f"error: unknown option {a} "
                  "(refusing to run a possibly different model)")
            return 1
        i += 1
    # reset any budget left by a previous in-process run (the fixture
    # harness calls cli.main repeatedly; a stale expired budget would
    # silently truncate later NLTE loops)
    os.environ.pop("MCFOST_TPU_SAFE_STOP_S", None)
    os.environ.pop("MCFOST_TPU_START_TIME", None)
    if safe_stop_s is not None:
        os.environ["MCFOST_TPU_SAFE_STOP_S"] = str(safe_stop_s)
        os.environ["MCFOST_TPU_START_TIME"] = str(time.time())
    if not_random_voronoi:
        os.environ["MCFOST_TPU_NOT_RANDOM_VORONOI"] = "1"

    # -pah: force stochastic (nRE) heating for PAH populations; -force_
    # PAH_equilibrium treats them as RE+LTE instead (init_mcfost.f90:
    # 519,1151-1153)
    if getattr(para, "force_pah", False):
        for sp_l in para.dust:
            for sp_ in sp_l:
                if "PAH" in sp_.components[0].optical_indices_file:
                    sp_.heating_method = 3
    if getattr(para, "force_pah_eq", False):
        for sp_l in para.dust:
            for sp_ in sp_l:
                if sp_.heating_method == 3:
                    sp_.heating_method = 1

    # -SPH_amin/-SPH_amax clamp the grain-size range mapped onto the SPH
    # dust (lforce_SPH_amin/amax, init_mcfost.f90:981-992); -fluffy
    # divides the sizes by the fluffyness (SPH2mcfost.f90:451-453).
    # Applied once here to the para species bounds, the size axis the
    # TPU build draws its distribution from.
    _amin = para.sph_cuts.pop("sph_amin", None)
    _amax = para.sph_cuts.pop("sph_amax", None)
    _fluf = getattr(para, "fluffyness", None)
    if _amin or _amax or _fluf:
        for sp_l in para.dust:
            for sp_ in sp_l:
                if _amin:
                    sp_.amin = _amin
                if _amax:
                    sp_.amax = _amax
                if _fluf:
                    print("WARNING: Grain sizes are adjusted for "
                          "fluffyness")
                    sp_.amin /= _fluf
                    sp_.amax /= _fluf

    import jax
    import numpy as np
    from .runner import run_thermal, run_sed_step

    if header_only:
        # -header_only: print the hydro dump header and stop
        # (lheader_only + lstop_after_init, init_mcfost.f90:1492-1495)
        if phantom_file is None:
            print("error: -header_only needs a -phantom dump"); return 1
        from .io.phantom import print_header
        print_header(phantom_file)
        return 0

    if seb_c_grid:
        # -Seb_C: print the cylindrical cell-edge table and stop
        # (lSeb_Charnoz, cylindrical_grid.f90:658-670)
        from .grids.cylindrical import build_cylindrical_grid
        g = build_cylindrical_grid(para)
        r_lim = np.asarray(g.r_lim, np.float64)
        zmax = np.asarray(g.zmax, np.float64)
        nz = para.grid.nz
        print("# n_rad nz")
        print(para.grid.n_rad, nz)
        print("# ir\tiz\tRmin\t\tdeltaR\t\t\tZmin\t\tdeltaZ")
        for ir in range(para.grid.n_rad):
            dz = zmax[ir] / nz
            for iz in range(nz):
                print(f"{ir+1:3d}   {iz+1:3d}   {r_lim[ir]:16.9e}   "
                      f"{r_lim[ir+1]-r_lim[ir]:16.9e}   "
                      f"{iz*dz:16.9e}   {dz:16.9e}")
        return 1

    if bench_shg:
        # -benchmark_SHG [-Mathis_field W]: stochastic-heating benchmark —
        # a single PAH population illuminated by the Mathis ISRF
        # (lbenchmark_SHG/lMathis_field, init_mcfost.f90:1173-1184;
        # the Camps et al. 2015 TRUST SHG setup)
        from .benchmarks import run_shg_benchmark
        run_shg_benchmark(para, chi=mathis_field, root_dir=root_dir)
        return 0

    if phantom_multi is not None:
        # -phantom-multi/-add/-avg: merge N phantom dumps into one
        # particle set (init_mcfost.f90:964-980); -avg averages the
        # per-particle fields of time-matched dumps instead of stacking
        from .io.phantom import read_phantom_merged
        sph_merged = read_phantom_merged(phantom_multi, avg=phantom_avg)
        from .runner import run_sph
        print(f"mcfost_tpu: Voronoi thermal MC from {len(phantom_multi)} "
              f"merged dumps ({sph_merged.xyz.shape[0]} gas particles)")
        run_sph(para, sph_merged, root_dir=root_dir, seed=seed)
        return 0

    if p2m:
        # -p2m / -prodimo2mcfost: read the ProDiMo-computed gas state
        # (T_gas + molecular abundance) back and ray-trace lines on it
        # (lProDiMo2mcfost, init_mcfost.f90:1105-1110, io_prodimo.f90:1291)
        from .io.prodimo import read_prodimo_output
        from .runner import run_mol_step
        pdir = para.prodimo_input_dir or "."
        pfile = os.path.join(pdir, "forMCFOST.fits.gz")
        if not os.path.exists(pfile):
            print(f"error: -p2m needs {pfile} (ProDiMo output grid)")
            return 1
        print(f"mcfost_tpu: ProDiMo gas state from {pfile}")
        T, sed_th, model, host, res = run_thermal(
            para, root_dir=root_dir, seed=seed, verbose=False)
        t_gas, abundance = read_prodimo_output(pfile)
        run_mol_step(para, model, host,
                     t_gas.reshape(np.asarray(T).shape), root_dir=root_dir,
                     chem=chem, abundance=abundance)
        return 0

    t_start = time.time()
    if img_lambda is not None:
        # image mode reuses the previous thermal run's temperature
        # (reference -img flow, dust_transfer.f90:223)
        from .runner import run_image
        print(f"mcfost_tpu: image at {img_lambda} micron")
        _backup_dir(os.path.join(root_dir, f"data_{img_lambda:g}"),
                    no_backup)
        run_image(para, img_lambda, root_dir=root_dir, seed=seed,
                  jy=jy, casa=casa, scheme=rt_scheme, origin=want_origin,
                  t_file=t_file)
        print(f"total: {time.time()-t_start:.1f}s")
        return 0

    if do_diag and (stop_after_init or not (do_sed or do_mol)):
        # diagnostics-only modes don't need the MC; -disk_struct and
        # -dust_prop stop after init like the reference (+ds continues)
        from .mc.model import build_model
        from .io import diagnostics as diag
        from .runner import _cache_dir
        model, host = build_model(para, cache_dir=_cache_dir(para, root_dir))
        if "disk" in do_diag:
            diag.write_disk_struct(model, host, root_dir)
        if "dust" in do_diag:
            diag.write_dust_prop(model, host, root_dir)
        if "tau" in do_diag:
            from .physics.diffusion import threshold_lambda_index
            diag.write_tau_map(model, host,
                               threshold_lambda_index(host.wl.lam), root_dir)
        if "cd" in do_diag:
            diag.write_column_density(model, host, root_dir)
        if "tau_cell" in do_diag:
            from .physics.diffusion import threshold_lambda_index
            diag.write_tau_to_cell(
                model, host, threshold_lambda_index(host.wl.lam), root_dir)
        for it_ in do_diag:
            if isinstance(it_, tuple) and it_[0] == "tausurf":
                from .physics.diffusion import threshold_lambda_index
                diag.write_tau_surface(
                    model, host, threshold_lambda_index(host.wl.lam),
                    tau_s=it_[1], root_dir=root_dir)
        print(f"total: {time.time()-t_start:.1f}s")
        return 0

    if phantom_file is not None:
        from .runner import run_phantom, run_mol_step
        print(f"mcfost_tpu: Voronoi thermal MC from {phantom_file}")
        T, model, host, _res = run_phantom(para, phantom_file,
                                           root_dir=root_dir, seed=seed)
        if do_sed and para.wavelengths.compute_sed:
            print("mcfost_tpu: SED step (MC + ray-traced)")
            run_sed_step(para, model, host, T, root_dir=root_dir,
                         seed=seed, jy=jy)
        if do_mol:
            mode = "LTE" if (para.mol.lte or not para.mol.lpop) else "NLTE"
            print(f"mcfost_tpu: molecular line transfer ({mode})")
            run_mol_step(para, model, host, T, root_dir=root_dir, chem=chem)
        print(f"total: {time.time()-t_start:.1f}s")
        return 0

    hydro = None
    if hydro_spec is not None and hydro_spec[0] in ("model_1d",
                                                    "sphere_mesh",
                                                    "mhd_voronoi"):
        # full-gas-state atmosphere inputs -> atomic transfer directly
        from .runner import (run_model_1d, run_mhd_voronoi,
                             run_sphere_mesh)
        kind, path = hydro_spec
        print(f"mcfost_tpu: atomic transfer on {kind} model {path}")
        fn = {"model_1d": run_model_1d, "sphere_mesh": run_sphere_mesh,
              "mhd_voronoi": run_mhd_voronoi}[kind]
        fn(para, path, root_dir=root_dir, iterate_ne=iterate_ne,
           healpix_lorder=healpix_lorder, ng_order=ng_norder)
        print(f"total: {time.time()-t_start:.1f}s")
        return 0
    if hydro_spec is not None:
        from .io import hydro as hyd
        kind = hydro_spec[0]
        print(f"mcfost_tpu: reading {kind} model")
        if kind == "gadget2":
            from .runner import run_sph
            sph = hyd.read_gadget2(hydro_spec[1],
                                   scale_length_au=scale_length)
            print(f"mcfost_tpu: Voronoi thermal MC from {hydro_spec[1]} "
                  f"({sph.xyz.shape[0]} gas particles)")
            run_sph(para, sph, root_dir=root_dir, seed=seed)
            print(f"total: {time.time()-t_start:.1f}s")
            return 0
        elif kind == "density_file":
            hydro = hyd.read_density_file(hydro_spec[1], para)
        elif kind == "seb_charnoz":
            hydro = hyd.read_seb_charnoz(hydro_spec[1], para)
        elif kind == "sigma_file":
            sig = hyd.read_sigma_file(hydro_spec[1], para)
            # defer rho build to the grid: pass a callable-free triple by
            # precomputing on a throwaway grid
            from .grids.cylindrical import build_cylindrical_grid
            g = build_cylindrical_grid(para)
            rho = hyd.density_from_sigma(
                sig, para, np.asarray(g.r_grid, np.float64),
                np.asarray(g.z_grid, np.float64))
            hydro = (rho, None, None)
        elif kind == "fargo3d":
            hydro = hyd.read_fargo3d(hydro_spec[1], hydro_spec[2],
                                     scale_length_au=scale_length)
        elif kind == "athena":
            hydro = hyd.read_athena(hydro_spec[1],
                                    scale_length_au=scale_length)
        elif kind == "idefix":
            hydro = hyd.read_idefix(hydro_spec[1],
                                    scale_length_au=scale_length)
        elif kind == "pluto":
            hydro = hyd.read_pluto(hydro_spec[1], int(hydro_spec[2]),
                                   scale_length_au=scale_length)

    need_j = do_prodimo or do_astrochem or do_ml
    _backup_dir(os.path.join(root_dir, "data_th"), no_backup)
    print("mcfost_tpu: thermal Monte Carlo")
    T, sed_th, model, host, res = run_thermal(
        para, root_dir=root_dir, seed=seed,
        output_j=output_j or need_j, output_uv=output_uv, hydro=hydro,
        spatial_dd=spatial_dd, reemission_stats=want_reemission)
    print(f"  T range: {T.min():.1f} .. {T.max():.1f} K")
    if need_j:
        from .mc import thermal_mc
        from .io import prodimo as pdm
        J = np.asarray(thermal_mc.mean_intensity(
            model, host.wl.dlam, res.xj, int(res.emitted)))
        if do_prodimo:
            p = pdm.write_for_prodimo(model, host, T, J,
                                      int(res.emitted), root_dir)
            print(f"  wrote {p}")
        if do_astrochem:
            p = pdm.write_astrochem_grid(model, host, T, J, root_dir)
            print(f"  wrote {p}")
        if do_ml:
            tg = pdm.predict_gas_temperature(model, host, T, J,
                                             ml_model_path)
            from .io.fits import write_fits
            out = os.path.join(root_dir, "data_th", "Tgas_ML.fits.gz")
            write_fits(out, tg.reshape(T.shape).astype(np.float32),
                       keywords={"BUNIT": "K"})
            print(f"  wrote {out}")
    if do_diag:
        from .io import diagnostics as diag
        if "disk" in do_diag:
            diag.write_disk_struct(model, host, root_dir)
        if "dust" in do_diag:
            diag.write_dust_prop(model, host, root_dir)
        if "tau" in do_diag:
            from .physics.diffusion import threshold_lambda_index
            diag.write_tau_map(model, host,
                               threshold_lambda_index(host.wl.lam), root_dir)
        if "cd" in do_diag:
            diag.write_column_density(model, host, root_dir)
        if "tau_cell" in do_diag:
            from .physics.diffusion import threshold_lambda_index
            diag.write_tau_to_cell(
                model, host, threshold_lambda_index(host.wl.lam), root_dir)
        for it_ in do_diag:
            if isinstance(it_, tuple) and it_[0] == "tausurf":
                from .physics.diffusion import threshold_lambda_index
                diag.write_tau_surface(
                    model, host, threshold_lambda_index(host.wl.lam),
                    tau_s=it_[1], root_dir=root_dir)

    if do_sed and para.wavelengths.compute_sed:
        print("mcfost_tpu: SED step (MC + ray-traced)")
        run_sed_step(para, model, host, T, root_dir=root_dir, seed=seed,
                     jy=jy, scheme=rt_scheme)

    if do_mol:
        from .runner import run_mol_step
        mode = "LTE" if (para.mol.lte or not para.mol.lpop) else "NLTE"
        print(f"mcfost_tpu: molecular line transfer ({mode})")
        t0 = time.time()
        run_mol_step(para, model, host, T, root_dir=root_dir, chem=chem)
        print(f"  lines: {time.time()-t0:.1f}s")

    if do_atom:
        from .gas.atom_transfer import atom_cube
        print("mcfost_tpu: atomic line transfer (H, NLTE)")
        t0 = time.time()
        atom_cube(model, host, T.reshape(-1), root_dir=root_dir,
                  iterate_ne=iterate_ne, healpix_lorder=healpix_lorder,
                  ng_order=ng_norder)
        print(f"  atomic lines: {time.time()-t0:.1f}s")

    print(f"total: {time.time()-t_start:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
