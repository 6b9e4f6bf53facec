"""Molecular line transfer validation.

* built-in CO model against known spectroscopy (nu(1-0), A(1-0));
* LTE populations against direct Boltzmann ratios;
* optically thin line flux against the analytic total line luminosity
  (sum over cells of n_u A h nu V / 4 pi d^2);
* Keplerian kinematics: the red/blue channel asymmetry flips sides.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from mcfost_tpu import constants as cst
from mcfost_tpu.config.para import Para
from mcfost_tpu.mc.model import build_model
from mcfost_tpu.physics.molecules import builtin_co, lte_populations
from mcfost_tpu.transfer.mol import MolRT, gas_number_density, mol_cube


def test_builtin_co_spectroscopy():
    co = builtin_co()
    # CO J=1-0: 115.2712 GHz, A = 7.203e-8 s^-1
    assert np.isclose(co.freq[0], 115.2712e9, rtol=1e-3)
    assert np.isclose(co.Aul[0], 7.2e-8, rtol=0.05)
    # CO J=2-1: 230.538 GHz
    assert np.isclose(co.freq[1], 230.538e9, rtol=1e-3)
    # A(2-1) ~ 6.91e-7
    assert np.isclose(co.Aul[1], 6.91e-7, rtol=0.05)


def test_lte_populations_boltzmann():
    co = builtin_co()
    T = np.array([50.0])
    n = np.array([1.0])
    pop = lte_populations(co, T, n)[0]
    assert np.isclose(pop.sum(), 1.0)
    # check n2/n1 against the Boltzmann factor on level energies
    dE = (co.level_energy[2] - co.level_energy[1]) * 1.602176634e-19
    expect = co.g[2] / co.g[1] * np.exp(-dE / (cst.kb * 50.0))
    assert np.isclose(pop[2] / pop[1], expect, rtol=1e-5)


@pytest.fixture(scope="module")
def setup():
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 16, 8, 2
    para.wavelengths.n_lambda = 16
    para.zones[0].dust_mass = 1e-9        # thin continuum AND thin lines
    para.mol.molecules[0].abundance = 1e-6
    para.maps.nx = para.maps.ny = 81
    para.maps.n_incl = 2
    para.maps.imax = 60.0
    for sp in para.dust[0]:
        sp.n_grains = 10
        sp.amax = 10.0
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    T = np.full(model.grid.n_cells, 30.0)
    return para, model, host, T


def test_thin_line_flux(setup):
    para, model, host, T = setup
    cube, cont, rt = mol_cube(model, host, T, root_dir="/tmp/mol_run",
                              verbose=False)
    # analytic: total line flux [W/m^2] = sum n_u A h nu V / (4 pi d^2)
    co = rt.mol
    n_mol = gas_number_density(host) * para.mol.molecules[0].abundance
    pops = lte_populations(co, T, n_mol)
    V_m3 = np.asarray(model.grid.volume, np.float64) * cst.AU3_to_m3
    d2_m = (para.maps.distance * cst.pc_to_AU * cst.AU_to_m) ** 2
    m = para.mol.molecules[0]
    vgrid = np.linspace(m.vmin * 1e3, m.vmax * 1e3, m.n_speed)
    dv = vgrid[1] - vgrid[0]
    for t, itr in enumerate([tr - 1 for tr in m.transitions[:2]]):
        up = co.trans_up[itr]
        lum = (pops[:, up] * co.Aul[itr] * cst.hp * co.freq[itr]
               * V_m3).sum()
        expect = lum / (4 * np.pi * d2_m)
        # cube is nu.F_nu per channel; line flux = sum (cube/nu) dnu
        # = sum cube * dv / c  (after continuum subtraction)
        for i_rt in range(cube.shape[0]):
            chans = cube[i_rt, :, t].sum(axis=(1, 2))
            contl = cont[i_rt, t].sum()
            flux = ((chans - contl) * dv / cst.c_light).sum()
            assert np.isclose(flux, expect, rtol=0.15), (
                t, i_rt, flux / expect)


def test_keplerian_channel_asymmetry(setup):
    para, model, host, T = setup
    cube, cont, rt = mol_cube(model, host, T, root_dir="/tmp/mol_run",
                              verbose=False)
    # inclined view (i_rt=1, 60 deg): blue channel flux concentrated on one
    # side of the image, red on the other; the blue-red difference cancels
    # the (flat) continuum and CMB backgrounds exactly
    nv = cube.shape[1]
    # channels at ~ +/-2 km/s: emitted by a broad swath of the outer disk
    ch = 4
    diff = cube[1, nv // 2 - ch, 0] - cube[1, nv // 2 + ch, 0]   # (ny, nx)
    nx = diff.shape[1]
    dl = diff[:, :nx // 2].sum()
    dr = diff[:, nx // 2:].sum()
    assert dl * dr < 0, (dl, dr)    # opposite sides
    # the channel's line signal splits cleanly between the two sides
    assert abs(dl) > 0.2 * np.abs(diff).sum(), (dl, np.abs(diff).sum())
    # face-on view: line symmetric around the central channel
    chans0 = cube[0, :, 0].sum(axis=(1, 2))
    line0 = chans0 - chans0[[0, -1]].mean()
    assert line0[nv // 2] > 0.5 * line0.max()


def test_only_top_bottom_split(setup):
    """-only_top/-only_bottom (optical_depth.f90:517-519): with the line
    optically thin, the two half-disk line contributions add up to the
    full one, measured against a no-line baseline ray."""
    import jax.numpy as jnp
    from mcfost_tpu.transfer.mol import MolRT, integrate_mol_rays
    from mcfost_tpu.physics.molecules import get_molecule
    para, model, host, T = setup
    mol = get_molecule("co.dat")
    dt = model.kappa.dtype

    def run(ab, half=0):
        rt = MolRT(model, host, mol, T, np.array([0]), abundance=ab,
                   v_turb=0.05, v_turb_unit="cs")
        args = (model, rt.kappa_mol, rt.emis_mol, rt.kappa_cont,
                rt.emis_cont, rt.dv_line, rt.norme_m1, rt.sigma2_m1,
                rt.vfield, rt.cmb,
                jnp.asarray(np.linspace(-3e3, 3e3, 11), dt),
                jnp.asarray([50.0], dt), jnp.asarray([0.0], dt),
                jnp.asarray([500.0], dt), jnp.asarray([0.0], dt),
                jnp.asarray([0.0], dt), jnp.asarray([-1.0], dt))
        I, _ = integrate_mol_rays(*args, nv=11, nt=1, half=half)
        return float(np.asarray(I).sum())

    base = run(1e-30)               # no line: continuum + CMB only
    ab = 1e-7                       # tau_line ~ 0.1: thin but resolvable
    full = run(ab) - base
    top = run(ab, half=1) - base
    bot = run(ab, half=2) - base
    assert full > 0
    # each half drops the other half's line but keeps the midplane cell
    # (its zmid = 0 belongs to both signs, like the reference's z0 test
    # on the double-sign midplane cell of the 2D grid)
    assert 0.5 * full < top < 0.98 * full, top / full
    assert 0.5 * full < bot < 0.98 * full, bot / full
    # symmetric disk seen face-on: the two halves agree
    assert abs(top / bot - 1.0) < 0.05
    # halves overlap ONLY in the midplane cell: full <= top+bot <= 2 full
    assert full < top + bot < 2.0 * full


def test_flux_fraction_surface(setup, tmp_path):
    """-flux_fraction_surface: the surface where a given fraction of each
    pixel's line energy has been accumulated along the ray
    (emission_line_energy_fraction_surface_map,
    mol_transfer.f90:1215-1320).  Deeper fractions must lie deeper along
    the ray, and found points must be inside the model."""
    import glob
    import jax.numpy as jnp
    from mcfost_tpu.grids import geometry as geom
    from mcfost_tpu.transfer.mol import flux_fraction_surface, MolRT
    from mcfost_tpu.physics.molecules import get_molecule

    para, model, host, T = setup
    cube, cont, rt = mol_cube(model, host, T, root_dir=str(tmp_path),
                              verbose=False, flux_fraction=0.5)
    files = glob.glob(str(tmp_path) + "/data_*/f0.5_surface.fits.gz")
    assert files, "f<frac>_surface.fits.gz not written"
    from mcfost_tpu.io.fits import read_fits
    arr = read_fits(files[0])[0][1]
    n_incl, n_az = para.maps.n_incl, para.maps.n_az_angles
    assert arr.shape == (para.maps.nx, para.maps.ny, n_incl, n_az, 3)[::-1] \
        or arr.shape == (3, n_az, n_incl, para.maps.ny, para.maps.nx)
    assert np.isfinite(arr).all()
    rmax = geom.model_extent(model.grid)[1]
    rr = np.sqrt((arr ** 2).sum(axis=0))
    found = rr > 0
    assert found.sum() > 10, "no pixels reached the fraction surface"
    # bound: the grid's bounding sphere (|xyz| includes the z extent, so
    # it exceeds the cylindrical rmax near the surface layers)
    assert (rr[found] <= rmax * 1.5).all(), "surface outside the model"

    # monotonicity: the 0.9-fraction point lies deeper along the ray
    # than the 0.2-fraction point wherever both exist
    m = para.mol.molecules[0]
    tab_speed = jnp.asarray(
        np.linspace(m.vmin * 1e3, m.vmax * 1e3, m.n_speed),
        model.kappa.dtype)
    dirs = np.asarray(model.rt_dirs, np.float64)
    u, v, w = dirs[0]
    npx = npy = 21
    pix = para.maps.map_size / npx
    az = np.arctan2(u, -v)
    xpl = np.array([np.cos(az), np.sin(az), 0.0])
    ypl = -np.cross(xpl, [u, v, w])
    center = np.array([u, v, w]) * 10.0 * rmax
    corner = center - 0.5 * npx * pix * xpl - 0.5 * npy * pix * ypl
    ix, iy = np.meshgrid(np.arange(npx) + 0.5, np.arange(npy) + 0.5,
                         indexing="ij")
    px = corner[0] + ix * pix * xpl[0] + iy * pix * ypl[0]
    py = corner[1] + ix * pix * xpl[1] + iy * pix * ypl[1]
    pz = corner[2] + ix * pix * xpl[2] + iy * pix * ypl[2]
    dtype = model.kappa.dtype
    n = px.size
    args = (jnp.asarray(px.ravel(), dtype), jnp.asarray(py.ravel(), dtype),
            jnp.asarray(pz.ravel(), dtype),
            jnp.full(n, -u, dtype), jnp.full(n, -v, dtype),
            jnp.full(n, -w, dtype))
    p2, f2 = flux_fraction_surface(model, rt, tab_speed, 0.2, *args)
    p9, f9 = flux_fraction_surface(model, rt, tab_speed, 0.9, *args)
    both = np.asarray(f2) & np.asarray(f9)
    assert both.sum() > 5
    # depth along the march = projection on the travel direction (-u,-v,-w)
    d2 = -(np.asarray(p2) @ np.array([u, v, w]))
    d9 = -(np.asarray(p9) @ np.array([u, v, w]))
    assert (d9[both] >= d2[both] - 1e-6).all()
