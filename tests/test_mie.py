"""Mie kernel validation against analytic limits and classic benchmark values."""
import numpy as np

from mcfost_tpu.dust.mie import mie_batch


def test_rayleigh_limit():
    m = 1.5 + 0.0j
    x = np.array([1e-3])
    out = mie_batch(x, np.array([m]))
    lor = (m ** 2 - 1) / (m ** 2 + 2)
    qsca_ray = 8.0 / 3.0 * x ** 4 * np.abs(lor) ** 2
    assert np.allclose(out["qsca"], qsca_ray, rtol=1e-4)
    assert abs(out["gsca"][0]) < 1e-3


def _mie_direct(x, m):
    """Independent oracle: a_n/b_n from scipy spherical Bessel functions."""
    from scipy.special import spherical_jn, spherical_yn
    nmax = int(x + 4 * x ** (1 / 3) + 2) + 10
    n = np.arange(1, nmax + 1)
    psi = x * spherical_jn(n, x)
    psi1 = x * spherical_jn(n - 1, x)
    chi = -x * spherical_yn(n, x)
    chi1 = -x * spherical_yn(n - 1, x)
    xi, xi1 = psi - 1j * chi, psi1 - 1j * chi1
    mx = m * x
    nmx = int(max(nmax, abs(mx)) + 16)
    D = np.zeros(nmax + 2, complex)
    Dn = 0.0
    for k in range(nmx, 0, -1):
        Dn = k / mx - 1 / (Dn + k / mx)
        if k - 1 <= nmax + 1:
            D[k - 1] = Dn
    Dn = D[1:nmax + 1]
    da, db = Dn / m + n / x, Dn * m + n / x
    an = (da * psi - psi1) / (da * xi - xi1)
    bn = (db * psi - psi1) / (db * xi - xi1)
    qext = 2 / x ** 2 * np.sum((2 * n + 1) * (an + bn).real)
    qsca = 2 / x ** 2 * np.sum((2 * n + 1) * (np.abs(an) ** 2 + np.abs(bn) ** 2))
    return qext, qsca


def test_against_direct_bessel_solution():
    # x=10, m=1.5 canonical value 2.8820 (Wiscombe/van de Hulst)
    out = mie_batch(np.array([10.0]), np.array([1.5 + 0.0j]))
    assert np.isclose(out["qext"][0], 2.8820, rtol=1e-3)
    for x, m in [(1.0, 1.5 + 0.0j), (1.0, 1.5 + 0.5j), (3.0, 1.33 + 0.01j),
                 (25.0, 1.7 + 0.1j), (100.0, 1.4 + 0.001j)]:
        qe, qs = _mie_direct(x, m)
        out = mie_batch(np.array([x]), np.array([m]))
        assert np.isclose(out["qext"][0], qe, rtol=1e-5), (x, m)
        assert np.isclose(out["qsca"][0], qs, rtol=1e-5), (x, m)


def test_geometric_limit():
    out = mie_batch(np.array([3000.0]), np.array([1.5 + 0.05j]))
    assert np.isclose(out["qext"][0], 2.0, rtol=0.05)
    assert 0 < out["qsca"][0] < out["qext"][0]


def test_phase_function_normalisation():
    # integral of s11 sin(theta) dtheta must equal Qsca with the reference's
    # normalisation (src/scattering.f90:665-675 verification comment)
    for x, m in [(0.5, 1.5 + 0.01j), (5.0, 1.7 + 0.3j), (50.0, 1.4 + 0.001j)]:
        out = mie_batch(np.array([x]), np.array([m]), nang=721)
        th = out["theta"]
        norm = np.trapezoid(out["s11"][0] * np.sin(th), th)
        assert np.isclose(norm, out["qsca"][0], rtol=2e-2), (x, m)


def test_energy_and_batch_consistency():
    # batch results identical to single calls
    xs = np.array([0.01, 0.5, 3.0, 40.0, 300.0])
    ms = np.array([1.5 + 0.1j] * 5)
    batch = mie_batch(xs, ms)
    for i, x in enumerate(xs):
        single = mie_batch(np.array([x]), ms[i:i + 1])
        assert np.isclose(batch["qext"][i], single["qext"][0], rtol=1e-12)
        assert np.allclose(batch["s11"][i], single["s11"][0], rtol=1e-10)
    assert np.all(batch["qext"] >= batch["qsca"])
    assert np.all(batch["qsca"] > 0)
    assert np.all((batch["gsca"] > -1) & (batch["gsca"] < 1))


def test_scattering_override_flags():
    """-iso / -hg / -no_scattering / -qsca=qabs transform the dust optics
    (init_mcfost.f90:804-809 + lisotropic; previously parsed but unused)."""
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.dust.opacity import build_dust_model
    from mcfost_tpu.physics.wavelengths import log_wavelength_grid

    def build(**kw):
        para = Para()
        for sp in para.dust[0]:
            sp.n_grains = 4
            sp.amax = 10.0
        for k, v in kw.items():
            setattr(para, k, v)
        wl = log_wavelength_grid(8, 0.1, 1000.0)
        return build_dust_model(para, wl)

    base = build()
    iso = build(iso_scattering=True)
    # isotropic: s11 flat in angle, no polarization, same scattered energy
    s = iso.s11_rt[0, 0]
    pos = s > 0
    assert pos.any()
    assert np.allclose(s[pos], s[pos][0], rtol=1e-6)
    assert np.allclose(iso.s12_rt, 0.0)
    assert np.allclose(np.asarray(iso.albedo), np.asarray(base.albedo),
                       rtol=1e-6)

    nos = build(no_scattering=True)
    assert np.allclose(np.asarray(nos.albedo), 0.0)

    qq = build(qsca_equal_qabs=True)
    assert np.allclose(np.asarray(qq.albedo), 0.5, atol=1e-6)

    hg = build(hg_scattering=True)
    # forward-peaked: more weight at theta=0 than the mean
    s11h = hg.s11_rt[0, 0]
    assert s11h[0] > s11h[len(s11h) // 2]
    assert np.allclose(hg.s12_rt, 0.0)


def test_mueller_input_file(tmp_path):
    """-Mueller: user-supplied dustkapscatmat optics replace the Mie
    tables (Mueller_input, scattering.f90:383-580)."""
    import os
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.dust.opacity import build_dust_model
    from mcfost_tpu.dust.mueller_input import read_mueller_file
    from mcfost_tpu.physics.wavelengths import log_wavelength_grid

    # synthesize a format-1 file: Rayleigh-like matrix, albedo 0.3
    W, A = 5, 19
    lam = np.geomspace(0.2, 500.0, W)
    kabs = 700.0 * (lam / 1.0) ** -1.0
    ksca = 300.0 * (lam / 1.0) ** -1.0
    ang = np.linspace(0, 180, A)
    mu = np.cos(np.deg2rad(ang))
    f11 = 0.75 * (1 + mu ** 2)
    p = str(tmp_path / "dustkapscatmat_x.inp")
    with open(p, "w") as f:
        f.write("# synthetic\n1\n%d\n%d\n" % (W, A))
        for w in range(W):
            f.write(f"{lam[w]} {kabs[w]} {ksca[w]} 0.0\n")
        for a_ in ang:
            f.write(f"{a_}\n")
        for w in range(W):
            for k in range(A):
                f12 = -0.75 * (mu[k] ** 2 - 1)
                f.write(f"{f11[k]} {f12} {f11[k]} {1.5*mu[k]} 0.0 "
                        f"{1.5*mu[k]}\n")

    mf = read_mueller_file(p)
    assert mf.lam_um.shape == (W,) and mf.f11.shape == (W, A)

    para = Para()
    para.wavelengths.n_lambda = 8
    for sp_ in para.dust[0]:
        sp_.n_grains = 4
    para.mueller_file = p
    wl = log_wavelength_grid(8, 0.3, 300.0)
    dm = build_dust_model(para, wl)
    # albedo 0.3 everywhere, from the file
    assert np.allclose(np.asarray(dm.albedo), 0.3, atol=1e-3)
    # kappa follows the file's 1/lambda shape
    k = np.asarray(dm.kappa)[0]
    r = k[0] / k[-1]
    expect = (wl.lam[-1] / wl.lam[0])
    assert abs(r / expect - 1) < 0.1, (r, expect)
    # phase matrix: Rayleigh s12 ratio at 90 deg ~ -(-1)... = 1 in our
    # sign convention (s12_rt stores -f12/f11 applied with a minus later)
    s12r = np.asarray(dm.s12_rt)[0, 0]
    A1 = s12r.shape[0]
    assert abs(abs(s12r[A1 // 2]) - 1.0) < 0.05


def test_fresnel_input_per_size(tmp_path):
    """-Fresnel and -Fresnel_size 4x4 matrix files replace the Mie
    optics per grain (Fresnel_input(_size), scattering.f90:727-960)."""
    import numpy as np
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.dust.opacity import build_dust_model, build_grain_sizes
    from mcfost_tpu.physics.wavelengths import log_wavelength_grid

    para = Para()
    para.wavelengths.n_lambda = 6
    for sp in para.dust[0]:
        sp.n_grains = 3
        sp.amax = 1.0
    grains = build_grain_sizes(para)

    def write_matrix(path, qsca=0.8, fwd=4.0):
        ang = np.linspace(0, 180, 19)
        with open(path, "w") as f:
            f.write("  Qext  Qsca  <cos(theta)>\n")
            f.write(f"  1.60  {qsca}  0.55\n\n")
            f.write(" Mueller Scattering Matrix\n")
            for a in ang:
                m11 = 1.0 + fwd * np.exp(-a / 30.0)     # forward peaked
                f.write(f" {a:6.1f} {m11:.6e} {-0.3*m11:.6e} 0.0 0.0\n")
                f.write(f" {-0.3*m11:.6e} {m11:.6e} 0.0 0.0\n")
                f.write(f" 0.0 0.0 {0.9*m11:.6e} {0.05*m11:.6e}\n")
                f.write(f" 0.0 0.0 {-0.05*m11:.6e} {0.9*m11:.6e}\n")

    mfile = str(tmp_path / "fresnel.dat")
    write_matrix(mfile)
    wl = log_wavelength_grid(6, 0.3, 100.0)
    para.fresnel_file = mfile
    dust = build_dust_model(para, wl, cache_dir=None, grains=grains)
    # albedo = qsca/qext = 0.5 at every wavelength, every bucket
    assert np.allclose(np.asarray(dust.albedo), 0.5, atol=1e-3)
    # polarization ratio -s12/s11 = 0.3 at all angles where defined
    r12 = -np.asarray(dust.s12_rt)[0, 0]
    assert np.allclose(r12[1:], 0.3, atol=0.02)

    # per-size index: wrong size must raise the reference's error
    import pytest as _pt
    idx = str(tmp_path / "index.dat")
    with open(idx, "w") as f:
        for k, r in enumerate(grains.r_grain):
            f.write(f"{r * (1.5 if k == 1 else 1.0):.8e} fresnel.dat\n")
    para.fresnel_per_size = True
    para.fresnel_file = idx
    with _pt.raises(ValueError, match="sizes do not match"):
        build_dust_model(para, wl, cache_dir=None, grains=grains)
    # correct index works
    with open(idx, "w") as f:
        for r in grains.r_grain:
            f.write(f"{r:.8e} fresnel.dat\n")
    dust2 = build_dust_model(para, wl, cache_dir=None, grains=grains)
    assert np.allclose(np.asarray(dust2.albedo), 0.5, atol=1e-3)
