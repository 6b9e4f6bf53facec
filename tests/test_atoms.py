"""Atomic line transfer physics validation.

The reference has no unit tests; these validate the gas subsystem against
analytic atomic physics: Voigt vs the scipy Faddeeva oracle, Saha
ionization, detailed balance of the SEE, and the end-to-end -atom
pipeline."""
import numpy as np
import pytest

import jax.numpy as jnp

from mcfost_tpu import constants as cst
from mcfost_tpu.gas.atom import (hydrogen_model, johnson_fosc, johnson_ce,
                                 johnson_ci)
from mcfost_tpu.gas.broadening import voigt
from mcfost_tpu.gas.lte import lte_pops, saha_phi
from mcfost_tpu.gas.electron import solve_ne
from mcfost_tpu.gas.see import collision_matrix, solve_see
from mcfost_tpu.gas.atom_transfer import bnu, continuum_rates, GasState


def test_voigt_vs_scipy():
    """Humlicek w4 vs scipy.special.wofz across all four regions."""
    from scipy.special import wofz
    a = np.array([1e-4, 1e-3, 0.01, 0.1, 0.5, 2.0, 20.0])
    x = np.linspace(-40.0, 40.0, 401)
    A, X = np.meshgrid(a, x, indexing="ij")
    ours = np.asarray(voigt(jnp.asarray(A), jnp.asarray(X)))
    ref = np.real(wofz(X + 1j * A))
    assert np.max(np.abs(ours - ref)) < 2e-4


def test_hydrogen_oscillator_strengths():
    """Johnson 1972 fits vs exact H values (Wiese et al.): Ly-alpha
    f=0.4162, H-alpha f=0.6407 — the fit is good to a few %."""
    assert abs(johnson_fosc(1, 2) - 0.4162) / 0.4162 < 0.02
    assert abs(johnson_fosc(2, 3) - 0.6407) / 0.6407 < 0.05
    assert abs(johnson_fosc(1, 3) - 0.0791) / 0.0791 < 0.05


def test_hydrogen_model_structure():
    atom = hydrogen_model(5)
    assert atom.n_levels == 6
    assert atom.n_lines == 10            # C(5,2)
    assert atom.n_cont == 5
    # H-alpha wavelength 656.3 nm, Ly-alpha 121.6 nm
    lam = atom.lambda0
    ha = lam[(atom.line_i == 1) & (atom.line_j == 2)][0]
    lya = lam[(atom.line_i == 0) & (atom.line_j == 1)][0]
    assert abs(ha - 656.3) < 1.0
    assert abs(lya - 121.57) < 0.2
    # A(2->1) Ly-alpha ~ 4.70e8 1/s
    alya = atom.Aji[(atom.line_i == 0) & (atom.line_j == 1)][0]
    assert abs(alya - 4.70e8) / 4.70e8 < 0.05


def test_saha_lte_pops():
    """H ionization fraction from lte_pops matches the direct Saha
    solution."""
    atom = hydrogen_model(3)
    T = np.array([6000.0, 10000.0, 20000.0])
    ne = np.full(3, 1e19)
    ntot = np.full(3, 1e20)
    pops = lte_pops(atom, T, ne, ntot)
    assert np.allclose(pops.sum(1), ntot, rtol=1e-10)
    # direct Saha: np/n1 summed over bound Boltzmann factors
    chi = 2.1798723611035e-18 * (1 - 1/1e9)  # ~ Rydberg
    for k, t in enumerate(T):
        phi = saha_phi(np.array([t]))[0]
        n = np.arange(1, 4)
        wb = 2.0 * n ** 2 * np.exp(-atom.E[:3] / (cst.kb * t))
        wp = 1.0 * np.exp(-atom.E[3] / (cst.kb * t)) / (ne[k] * phi)
        frac = wp / (wb.sum() + wp)
        assert abs(pops[k, -1] / ntot[k] - frac) / max(frac, 1e-12) < 1e-8


def test_electron_density_hot_limit():
    """At 15000 K / 1e18 m^-3 both H and He are singly ionized (Saha at
    low density): ne = (1 + A_He) nH."""
    T = np.array([15000.0])
    nH = np.array([1e18])
    ne = solve_ne(T, nH)
    assert abs(ne[0] / nH[0] - 1.0851) < 0.02


def test_electron_density_metal_floor():
    """At 1000 K, H is neutral; electrons come from alkalis/metals:
    ne << nH but > 0."""
    ne = solve_ne(np.array([1000.0]), np.array([1e18]))
    assert 0 < ne[0] < 1e14


def test_johnson_collision_magnitudes():
    """Rate coefficients at 1e4 K have the expected order of magnitude
    (~1e-14..1e-12 m^3/s for low transitions)."""
    ce = johnson_ce(np.array([1e4]), 4)
    ci = johnson_ci(np.array([1e4]), 4)
    # Ly-alpha excitation ~ 2-5e-13 cm^3/s = 2-5e-19 m^3/s at 1e4 K
    assert 5e-20 < ce[0, 0, 1] < 5e-18
    assert ci[0, 0] > 0
    assert np.all(ce >= 0) and np.all(ci >= 0)


def test_see_detailed_balance():
    """With J = B_nu(T) in every transition, the SEE solution equals the
    Saha-Boltzmann populations (detailed balance)."""
    atom = hydrogen_model(4)
    C = 3
    T = np.array([5000.0, 8000.0, 12000.0])
    ne = np.full(C, 1e18)
    ntot = np.full(C, 1e19)
    nstar = lte_pops(atom, T, ne, ntot)

    # line rates with J = B
    nu0 = cst.c_light / (atom.lambda0 * 1e-9)
    B = np.stack([bnu(T, nu) for nu in nu0], 1)          # (C, L)
    Rij = atom.Bij[None, :] * B
    Rji = atom.Aji[None, :] + atom.Bji[None, :] * B

    # continuum rates with J = B on the integration grid
    lam_um = np.geomspace(0.02, 0.09, 200)
    nu_w = cst.c_light / (lam_um * 1e-6)
    J = bnu(T[:, None], nu_w[None, :])

    class _G:
        pass
    gas = _G()
    gas.T = T
    Rcij, Rcji = continuum_rates(atom, gas, nstar, lam_um, J)

    Cmat = collision_matrix(atom, T, ne, nstar)
    pops, _ = solve_see(atom, ntot, Cmat, Rij, Rji, Rcij, Rcji, nstar)
    assert np.allclose(pops, nstar, rtol=2e-2)


def test_see_two_level_radiative():
    """Two-level atom, no collisions, fixed J: n2/n1 = B12 J/(A21+B21 J)."""
    atom = hydrogen_model(2)
    # keep only the one line; kill collisions and continua
    atom.johnson_collisions = False
    C = 1
    T = np.array([8000.0])
    ntot = np.array([1e15])
    nstar = np.array([[1e15, 1.0, 1.0]])
    J = 1e-10
    Rij = np.array([[atom.Bij[0] * J]])
    Rji = np.array([[atom.Aji[0] + atom.Bji[0] * J]])
    Rcij = np.zeros((C, atom.n_cont))
    Rcji = np.zeros((C, atom.n_cont))
    Cmat = np.zeros((C, 3, 3))
    pops, _ = solve_see(atom, ntot, Cmat, Rij, Rji, Rcij, Rcji, nstar)
    expect = atom.Bij[0] * J / (atom.Aji[0] + atom.Bji[0] * J)
    assert abs(pops[0, 1] / pops[0, 0] - expect) / expect < 1e-6


def test_collision_dominated_lte():
    """Collision-dominated gas (huge ne) with zero radiation relaxes the
    SEE to Boltzmann ratios among bound levels."""
    atom = hydrogen_model(3)
    C = 1
    T = np.array([10000.0])
    ne = np.array([1e24])
    ntot = np.array([1e20])
    nstar = lte_pops(atom, T, ne, ntot)
    Cmat = collision_matrix(atom, T, ne, nstar)
    L, K = atom.n_lines, atom.n_cont
    z = np.zeros((C, L))
    zk = np.zeros((C, K))
    pops, _ = solve_see(atom, ntot, Cmat, z, z, zk, zk, nstar)
    # bound-level ratios should be Boltzmann
    r_ours = pops[0, 1] / pops[0, 0]
    r_lte = nstar[0, 1] / nstar[0, 0]
    assert abs(r_ours - r_lte) / r_lte < 1e-3


@pytest.fixture(scope="module")
def tiny_model():
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 10, 7, 2
    para.wavelengths.n_lambda = 10
    para.maps.nx = para.maps.ny = 16
    for sp in para.dust[0]:
        sp.n_grains = 4
    model, host = build_model(para, cache_dir=".mcfost_tpu_cache")
    return model, host


def test_atom_cube_end_to_end(tiny_model, tmp_path):
    """-atom pipeline runs: LTE H-alpha channel maps + spectra exist and
    are finite; line-center flux differs from continuum."""
    model, host = tiny_model
    import os
    from mcfost_tpu.config.para import Atom
    from mcfost_tpu.gas.atom_transfer import atom_cube
    T_dust = np.full(model.grid.n_cells, 300.0)
    if not host.para.atoms.atoms:
        host.para.atoms.atoms = [Atom()]
    host.para.atoms.atoms[0].n_points = 11
    host.para.atoms.atoms[0].vmax = 500.0
    cube, cont, rt, pops = atom_cube(model, host, T_dust,
                                     root_dir=str(tmp_path), verbose=False)
    assert np.all(np.isfinite(cube))
    assert np.all(np.isfinite(cont))
    assert cube.max() > 0
    assert os.path.exists(os.path.join(str(tmp_path), "data_atom",
                                       "atomic_maps.fits.gz"))
    assert os.path.exists(os.path.join(str(tmp_path), "data_atom",
                                       "flux.fits.gz"))


def test_nlte_hot_dense_approaches_lte(tiny_model):
    """MALI loop on a small model: in a collision-dominated state the
    NLTE populations stay near LTE (sanity anchor for the solver)."""
    model, host = tiny_model
    from mcfost_tpu.gas.atom import hydrogen_model
    from mcfost_tpu.gas.atom_transfer import GasState, nlte_pops_atom
    from mcfost_tpu.gas.lte import lte_pops
    atom = hydrogen_model(3)
    T_dust = np.full(model.grid.n_cells, 5000.0)
    gas = GasState(model, host, T_dust)
    # collision-dominated requires ne q21 >> A21 ~ 5e8/s: q21 ~ 1e-18
    # m^3/s so ne = 1e28 m^-3
    gas.ne = np.full(model.grid.n_cells, 1e28)
    pops, nit, dm = nlte_pops_atom(model, host, atom, gas, T_dust,
                                   max_iter=8, n_rays=4)
    nstar = lte_pops(atom, gas.T, gas.ne, atom.abund * gas.nHtot)
    # bound-level ratio close to Boltzmann in the dense cells
    sel = gas.nHtot > np.percentile(gas.nHtot, 90)
    r = pops[sel, 1] / np.maximum(pops[sel, 0], 1e-300)
    rl = nstar[sel, 1] / np.maximum(nstar[sel, 0], 1e-300)
    assert np.median(np.abs(r / rl - 1.0)) < 0.2


def test_line_overlap_partners_blend():
    """Two lines 20 km/s apart must join one overlap group; distant
    lines must not (make_wavelengths_nlte role, wavelengths_gas.f90)."""
    from mcfost_tpu.gas.atom_transfer import line_overlap_partners
    from mcfost_tpu import constants as cst
    lam0 = np.array([500.0, 500.0 + 500.0 * 20e3 / cst.c_light, 650.0])
    prt, dvs, wts = line_overlap_partners(lam0, vth_max=5e3, vspan=2e4)
    G = prt.shape[1]
    assert G == 2
    # line 0's partner is line 1 with ~ +/-20 km/s offset
    assert prt[0, 1] == 1 and abs(abs(dvs[0, 1]) - 20e3) < 1e3
    assert prt[1, 1] == 0
    # isolated line 2: padded partner with zero weight
    assert wts[2, 1] == 0.0 and prt[2, 1] == 2


def test_blend_raises_total_opacity():
    """With overlap on, the intensity in the blend region differs from
    isolated-line treatment (two-line blend test, VERDICT r2 item 9)."""
    import jax.numpy as jnp
    from mcfost_tpu.gas.atom_transfer import (AtomRT, GasState,
                                              integrate_atom_rays,
                                              line_overlap_partners)
    from mcfost_tpu.gas.atom import get_atom
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model
    from mcfost_tpu.gas.lte import lte_pops

    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 10, 6, 2
    para.wavelengths.n_lambda = 8
    para.zones[0].dust_mass = 1e-8
    for sp in para.dust[0]:
        sp.n_grains = 4
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    T = np.full(model.grid.n_cells, 4000.0)
    gas = GasState(model, host, T)
    atom = get_atom("H_6.atom")
    ntot = atom.abund * gas.nHtot
    pops = lte_pops(atom, gas.T, gas.ne, ntot)

    # pick the two closest H lines (a natural blend candidate)
    rt = AtomRT(model, host, atom, gas, pops, np.arange(atom.n_lines), T)
    lam = np.asarray(rt.lambda0)
    order = np.argsort(lam)
    gaps = np.diff(lam[order]) / lam[order][:-1] * 3e5       # km/s
    k = int(np.argmin(gaps))
    pair = np.array([order[k], order[k + 1]])

    rt2 = AtomRT(model, host, atom, gas, pops, pair, T)
    dtype = model.kappa.dtype
    nv = 31
    vmax = 3.0e3 * max(gaps[k], 10.0)       # cover both line centres
    tab = jnp.asarray(np.linspace(-vmax, vmax, nv), dtype)
    C = model.grid.n_cells
    x0 = model.grid.r_grid
    y0 = jnp.zeros(C, dtype)
    z0 = model.grid.z_grid
    u = jnp.full(C, 1.0, dtype)
    v = jnp.zeros(C, dtype)
    w = jnp.zeros(C, dtype)

    I_iso, _, _ = integrate_atom_rays(
        rt2 and model, rt2.chi0, rt2.eta0, rt2.adamp, rt2.vth_j,
        rt2.chi_c, rt2.eta_c, rt2.vfield, rt2.star_bnu, tab,
        x0, y0, z0, u, v, w, nl=2, nv=nv)
    vthm = float(np.asarray(rt2.vth_j).max())
    prt, dvs, wts = line_overlap_partners(rt2.lambda0, vthm, float(vmax))
    assert prt.shape[1] == 2, "expected the pair to blend"
    I_bl, _, _ = integrate_atom_rays(
        model, rt2.chi0, rt2.eta0, rt2.adamp, rt2.vth_j,
        rt2.chi_c, rt2.eta_c, rt2.vfield, rt2.star_bnu, tab,
        x0, y0, z0, u, v, w, nl=2, nv=nv,
        partners=jnp.asarray(prt), dv_off=jnp.asarray(dvs, dtype),
        wt_off=jnp.asarray(wts, dtype), n_overlap=2)
    a = np.asarray(I_iso, np.float64)
    b = np.asarray(I_bl, np.float64)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-300)
    assert rel.max() > 1e-4, ("blend changed nothing", rel.max())


def test_iterate_ne_converges():
    """-iterate_ne: the MALI loop re-solves ne from the NLTE ionization;
    the run converges and ne stays positive/finite."""
    from mcfost_tpu.gas.atom_transfer import GasState, nlte_pops_atom
    from mcfost_tpu.gas.atom import get_atom
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model

    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 10, 6, 2
    para.wavelengths.n_lambda = 8
    para.zones[0].dust_mass = 1e-7
    for sp in para.dust[0]:
        sp.n_grains = 4
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    T = np.full(model.grid.n_cells, 5000.0)
    gas = GasState(model, host, T)
    atom = get_atom("H_6.atom")
    ne0 = gas.ne.copy()
    pops, it, dM = nlte_pops_atom(model, host, atom, gas, T,
                                  max_iter=8, n_rays=4, iterate_ne=2)
    assert np.isfinite(gas.ne).all() and (gas.ne > 0).all()
    assert not np.allclose(gas.ne, ne0), "ne never updated"
    assert np.isfinite(pops).all()
    # charge conservation bound: at most H+ + metal electrons
    assert (gas.ne < 1.3 * gas.nHtot).all()


def test_abo_broadening():
    """ABO van der Waals coefficient: K T^{(1-alpha)/2} n_H with the
    Anstee-O'Mara normalization (abo.f90 get_barklem_cross_data)."""
    from mcfost_tpu.gas.abo import abo_gamma_coeff, barklem_sigma_alpha
    from mcfost_tpu import constants as cst
    # Na D-like: sigma ~ 407 a0^2, alpha ~ 0.237 -> at T = 5000 K,
    # n_H = 1e21 m^-3, Gamma ~ 1e8..1e9 rad/s (published magnitudes)
    K = abo_gamma_coeff(407.0, 0.237, 23.0)
    G = K * 5000.0 ** (0.5 * (1 - 0.237)) * 1e21
    assert 1e7 < G < 1e10, G
    # temperature scaling exponent (1-alpha)/2
    G2 = K * 10000.0 ** (0.5 * (1 - 0.237)) * 1e21
    assert np.isclose(G2 / G, 2.0 ** (0.5 * (1 - 0.237)))
    # no MCFOST_UTILS tables in this environment -> graceful None
    import os
    if not os.environ.get("MCFOST_UTILS"):
        assert barklem_sigma_alpha(2.0, 2.5, "sp") is None


def test_abo_line_damping_branch():
    """Lines marked BARKLEM with sigma > 20 take the ABO branch and give
    larger damping than the Unsold fallback for typical parameters."""
    from mcfost_tpu.gas.atom import hydrogen_model
    from mcfost_tpu.gas.broadening import line_damping
    atom = hydrogen_model(4)
    atom.vdw_method = np.full(atom.n_lines, "UNSOLD", dtype="U8")
    T = np.array([5000.0])
    ne = np.array([1e16])
    nH1 = np.array([1e20])
    vth = np.array([1e4])
    a_uns = line_damping(atom, T, ne, nH1, vth).copy()
    atom.vdw_method = np.full(atom.n_lines, "BARKLEM", dtype="U8")
    atom.cvdW = np.tile([400.0, 0.25, 1.0, 0.0], (atom.n_lines, 1))
    a_abo = line_damping(atom, T, ne, nH1, vth)
    assert np.isfinite(a_abo).all()
    assert (a_abo >= a_uns * 0.999).all()
    assert (a_abo > a_uns).any()


def test_accretion_shock_cells():
    """is_inshock physics (stars.f90:940-1016): infalling dense columns
    flag the shock with T_hp from (3/4 F_acc/sigma)^(1/4)."""
    from mcfost_tpu.gas.atom_transfer import (GasState,
                                              accretion_shock_cells,
                                              shock_boundary_bnu)
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.mc.model import build_model
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 10, 6, 2
    para.wavelengths.n_lambda = 6
    for sp in para.dust[0]:
        sp.n_grains = 4
    model, host = build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")
    C = model.grid.n_cells
    T = np.full(C, 4000.0)
    # free-fall onto the star at 300 km/s in dense gas
    vfield = np.zeros((C, 3))
    vfield[:, 0] = -3e5
    nH = np.full(C, 1e19)
    gas = GasState(model, host, T, nHtot=nH, ne=np.full(C, 1e15),
                   vfield=vfield)
    inshock, t_hp, t_pre = accretion_shock_cells(gas, model, T_star=4000.0)
    # F_acc = 0.5 rho v^3: rho = 1.4*1.008*mH*1e19 ~ 2.36e-8 kg/m^3
    # -> Facc ~ 3.2e8 W/m^2 -> T_hp ~ (0.75*F/sigma)^0.25 ~ 8.1e3 K
    assert inshock.all()
    assert 6000 < np.median(t_hp) < 12000, np.median(t_hp)
    # strong-shock jump temperature ~ 1e6 K at 300 km/s
    assert 5e5 < np.median(t_pre) < 3e6, np.median(t_pre)
    nu0 = np.array([4.57e14])       # H alpha
    sb = np.array([1e-10])
    bb = shock_boundary_bnu(nu0, inshock, t_hp, t_pre, sb)
    assert bb.shape == (C, 1)
    assert (bb > 1e-10).all()       # hotter than the photosphere value
    # no infall -> no shock
    gas.vfield[:, 0] = +3e5
    ins2, _, _ = accretion_shock_cells(gas, model, T_star=4000.0)
    assert not ins2.any()


def test_background_continuum_balmer_jump_and_dissolution():
    """Hydrogenic bf with Seaton Gaunt factor + HM88 level dissolution
    (reference H_bf_Xsection gas_contopac.f90:380-412 and f_dissolve
    occupation_probability.f90:92-130)."""
    import numpy as np
    from mcfost_tpu.gas.contopac import (gaunt_bf, hydrogenic_bf_sigma,
                                         wocc_n, dissolve_fraction,
                                         metal_bf)

    # Lyman-edge cross-section ~6.3e-22 m^2 at 91.2 nm
    sig = hydrogenic_bf_sigma(np.array([0.09117]), 1.0, 1.0)
    assert 5.5e-22 < sig[0] < 7.5e-22
    # Balmer edge (n=2) at 364.6 nm: ~1.4e-21 m^2
    sig2 = hydrogenic_bf_sigma(np.array([0.3645]), 2.0, 1.0)
    assert 1.0e-21 < sig2[0] < 2.0e-21
    # Gaunt factor is order unity and clipped
    g = gaunt_bf(np.array([0.0, 5.0, 100.0]), 2.0)
    assert np.all((g >= 0.0) & (g <= 2.0))

    # occupation probability: ~1 at low density, < 1 at high density,
    # and decreasing with principal quantum number
    T = np.array([8000.0])
    w_lo = wocc_n(T, np.array([1e16]), 8.0, nH1=np.array([1e18]))
    w_hi = wocc_n(T, np.array([1e22]), 8.0, nH1=np.array([1e24]))
    assert w_lo[0] > 0.98
    assert w_hi[0] < w_lo[0]
    w_n2 = wocc_n(T, np.array([1e21]), 2.0, nH1=np.array([1e23]))
    w_n10 = wocc_n(T, np.array([1e21]), 10.0, nH1=np.array([1e23]))
    assert w_n10[0] < w_n2[0]

    # dissolve fraction: 0 blueward-of-edge rows are 1, redward in (0,1),
    # decaying away from the edge
    lam = np.array([0.36, 0.37, 0.40, 0.60])
    fd = dissolve_fraction(lam, T, np.array([1e20]), np.array([1e22]),
                           2.0, 3.4, 0.3646)
    assert fd[0, 0] == 1.0                  # blueward: full edge
    assert 0.0 <= fd[0, 2] <= 1.0
    assert fd[0, 3] <= fd[0, 1] + 1e-12     # decays redward

    # metal bf: nonzero between the metal edges and the Lyman edge at
    # stellar-photosphere conditions, zero far in the IR
    lam2 = np.array([0.15, 0.5, 5.0])
    chi = metal_bf(lam2, np.array([6000.0]), np.array([1e19]),
                   np.array([1e23]))
    assert chi[0, 0] > 0.0
    assert chi[0, 2] == 0.0


def test_atom_bf_opacity_pseudo_continuum(tmp_path):
    """The Balmer edge continues redward with dissolve weight < 1 at
    high electron density and ~0 at low density."""
    import numpy as np
    from mcfost_tpu.gas.atom import hydrogen_model
    from mcfost_tpu.gas.atom_transfer import atom_bf_opacity

    atom = hydrogen_model(4)

    class G:
        pass
    C = 2
    g = G()
    g.T = np.array([8000.0, 8000.0])
    g.ne = np.array([1e16, 1e21])
    g.nHtot = np.array([1e18, 1e23])
    pops = np.tile(np.array([1e18, 1e12, 1e10, 1e9, 1e8])[None, :C + 3],
                   (C, 1))
    pops = np.zeros((C, atom.n_levels))
    pops[:, 0] = g.nHtot * 0.9
    pops[:, 1] = g.nHtot * 1e-6
    pops[:, -1] = g.nHtot * 0.1
    lam = np.array([0.3, 0.40, 0.50])
    chi = atom_bf_opacity(atom, pops, g, lam)
    assert np.all(chi[:, 0] > 0)            # blueward of Balmer edge
    # pseudo-continuum at 400nm: present at high ne, negligible at low
    assert chi[1, 1] > 0
    rel_hi = chi[1, 1] / chi[1, 0]
    rel_lo = chi[0, 1] / max(chi[0, 0], 1e-300)
    assert rel_hi > rel_lo


def test_atom_restart_ne_and_pops(tiny_model, tmp_path):
    """ne.fits.gz and pops_<atom>.fits.gz restart (reference
    read_electron + initial_solution=1, atom_transfer.f90:1120-1132):
    the second run reuses the written electron density and starts the
    NLTE iteration from the stored populations."""
    import os
    from mcfost_tpu.config.para import Atom
    from mcfost_tpu.gas.atom_transfer import atom_cube
    model, host = tiny_model
    T_dust = np.full(model.grid.n_cells, 300.0)
    host.para.atoms.atoms = [Atom()]
    a = host.para.atoms.atoms[0]
    a.n_points = 7
    a.vmax = 500.0
    a.non_lte = True
    root = str(tmp_path)
    cube, cont, rt, pops1 = atom_cube(model, host, T_dust, root_dir=root,
                                      verbose=False, n_rays=4)
    ne_p = os.path.join(root, "data_atom", "ne.fits.gz")
    pp = os.path.join(root, "data_atom", "pops_H.fits.gz")
    assert os.path.isfile(ne_p) and os.path.isfile(pp)
    # restart from the stored populations
    a.initial_solution = 1
    cube2, cont2, rt2, pops2 = atom_cube(model, host, T_dust,
                                         root_dir=root, verbose=False,
                                         n_rays=4)
    # converged restart stays at the stored solution (same fixed point)
    rel = np.abs(pops2 - pops1) / np.maximum(np.abs(pops1), 1e-300)
    assert np.median(rel) < 0.35


def test_adaptive_line_grids_wing_convergence(tiny_model):
    """Adaptive NLTE wavelength grids (VERDICT r4 next #5,
    make_wavelengths_nlte, gas/wavelengths_gas.f90): per-line axes put
    log-spaced wing channels out to the Voigt damping wing, so the
    profile-weighted Jbar of a damped Balmer-type line converges — the
    adaptive default must agree with a brute-force dense wide grid far
    better than the old fixed 21-point +-4vth axis, which cannot see the
    wings at all."""
    from mcfost_tpu.gas.atom import hydrogen_model
    from mcfost_tpu.gas.atom_transfer import (AtomRT, GasState,
                                              adaptive_line_grids,
                                              channel_weights,
                                              jbar_lambda)
    from mcfost_tpu.gas.lte import lte_pops
    model, host = tiny_model
    atom = hydrogen_model(3)
    T_dust = np.full(model.grid.n_cells, 6000.0)
    gas = GasState(model, host, T_dust)
    gas.ne = np.full(model.grid.n_cells, 1e20)
    # crank the natural damping so the wings genuinely matter (the tiny
    # disk's vdW/Stark terms alone give a ~ 5e-4: wings under the core
    # floor; a Balmer line in a dense atmosphere reaches a ~ 0.1)
    atom.Grad = atom.Grad * 300.0
    nstar = lte_pops(atom, gas.T, gas.ne, atom.abund * gas.nHtot)
    rt = AtomRT(model, host, atom, gas, nstar,
                np.arange(atom.n_lines), T_dust)

    # grid structure: per-line axes, increasing, wings scale with damping
    tab = adaptive_line_grids(rt)
    assert tab.ndim == 2 and tab.shape[0] == atom.n_lines
    assert np.all(np.diff(tab, axis=1) > 0)
    vth_max = float(np.asarray(rt.vth_j).max())
    a_max = np.asarray(rt.adamp, np.float64).max(axis=0)
    # strongest-damped line gets the widest wings (when above the floor)
    if tab[:, -1].max() > 1.01 * tab[:, -1].min():
        assert np.argmax(tab[:, -1]) == np.argmax(a_max)
    assert tab[:, -1].max() > 8.0 * vth_max     # beyond the fixed axis
    w = channel_weights(tab)
    assert np.allclose(w.sum(1), tab[:, -1] - tab[:, 0], rtol=1e-12)

    # Jbar convergence: dense wide linear reference vs adaptive vs
    # fixed-21
    j_ref, _ = jbar_lambda(model, rt, n_rays=2, adaptive=False, nv=801)
    # widen the fixed reference axis to the adaptive extent by art_hv
    import mcfost_tpu.gas.atom_transfer as at
    xw = tab[:, -1].max() / vth_max
    tab_ref = np.broadcast_to(
        np.linspace(-xw * vth_max, xw * vth_max, 1601),
        (atom.n_lines, 1601)).copy()
    # monkey-free dense run: call the internals via adaptive grids with
    # a huge linear axis
    orig = at.adaptive_line_grids
    at.adaptive_line_grids = lambda *a, **k: tab_ref
    try:
        j_dense, _ = jbar_lambda(model, rt, n_rays=2, adaptive=True)
    finally:
        at.adaptive_line_grids = orig
    j_adap, _ = jbar_lambda(model, rt, n_rays=2, adaptive=True)
    j_fix21, _ = jbar_lambda(model, rt, n_rays=2, adaptive=False, nv=21)

    sel = j_dense > np.percentile(j_dense, 50)
    err_adap = np.median(np.abs(j_adap[sel] - j_dense[sel])
                         / j_dense[sel])
    err_fix = np.median(np.abs(j_fix21[sel] - j_dense[sel])
                        / j_dense[sel])
    assert err_adap < 0.05, f"adaptive grid not converged: {err_adap:.3f}"
    assert err_adap < 0.5 * max(err_fix, 1e-9) or err_fix < 0.01, \
        (err_adap, err_fix)
