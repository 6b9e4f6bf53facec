"""Draine/DustEM tabulated-opacity readers (read_opacity.f90 /
read_DustEM.f90 roles) and their wiring into the dust build."""
import numpy as np

from mcfost_tpu.dust import opacity_files as opf


def _write_draine(path, na=3, nl=5):
    sizes = [0.001, 0.01, 0.1]
    lams = [0.1, 1.0, 10.0, 100.0, 1000.0]
    lines = ["# Draine-style Q table", "# comment",
             f" {na}   NRAD", f" {nl}   NWAV"]
    for a in sizes:
        lines.append("")
        lines.append(f" {a}  radius(micron)")
        lines.append(" lambda Q_ext Q_abs Q_sca g")
        for lam in lams:
            qs = 0.4 / (1 + lam / (10 * a))
            qe = qs + 0.5 / (1 + lam / (20 * a))
            lines.append(f" {lam} {qe} {qe-qs} {qs} 0.3")
    path.write_text("\n".join(lines))
    return np.array(sizes), np.array(lams)


def test_draine_reader(tmp_path):
    p = tmp_path / "PAHneu.dat"
    sizes, lams = _write_draine(p)
    t = opf.read_draine_opacity_file(str(p))
    assert t.r_grain.shape == (3,)
    assert t.lam.shape == (5,)
    np.testing.assert_allclose(t.r_grain, sizes)
    np.testing.assert_allclose(t.lam, lams)
    assert np.all(t.qext >= t.qsca)
    assert np.allclose(t.g, 0.3)


def test_dustem_reader(tmp_path):
    d = tmp_path / "oprop"
    d.mkdir()
    lams = np.array([0.1, 1.0, 10.0])
    (d / "LAMBDA.DAT").write_text("3\n" + "\n".join(str(v) for v in lams))
    na = 2
    sizes = np.array([0.001, 0.01])
    qabs = np.array([[0.5, 0.3, 0.1], [0.6, 0.4, 0.2]])   # (na, nl)
    qsca = qabs * 0.5
    body = [str(na), " ".join(str(s) for s in sizes)]
    for j in range(3):
        body.append(" ".join(str(qabs[i, j]) for i in range(na)))
    for j in range(3):
        body.append(" ".join(str(qsca[i, j]) for i in range(na)))
    (d / "Q_PAH0.DAT").write_text("\n".join(body))
    t = opf.read_dustem(str(tmp_path), "PAH0")
    np.testing.assert_allclose(t.r_grain, sizes)
    np.testing.assert_allclose(t.qsca, qsca)
    np.testing.assert_allclose(t.qext, qabs + qsca)


def test_tabulated_optics_energy():
    sizes = np.array([0.001, 0.1])
    lams = np.array([0.1, 1.0, 100.0])
    t = opf.OpacityTable("t", sizes, lams,
                         qext=np.full((2, 3), 1.0),
                         qsca=np.full((2, 3), 0.4),
                         g=np.full((2, 3), 0.5))
    out = opf.tabulated_optics(t, np.array([0.01]), np.array([1.0, 10.0]),
                               91)
    assert np.allclose(out["qext"], 1.0)
    assert np.allclose(out["qsca"], 0.4)
    # HG s11 normalised so that the phase-CDF integral gives qsca:
    theta = np.linspace(0, np.pi, 91)
    s11 = out["s11"][0]
    integ = 0.5 * np.trapezoid(s11 * np.sin(theta), theta)
    assert abs(integ - 0.4) < 0.01


def test_build_dust_model_with_table(tmp_path):
    from mcfost_tpu.config.para import Para
    from mcfost_tpu.dust.opacity import build_dust_model
    from mcfost_tpu.physics.wavelengths import log_wavelength_grid
    import os
    p = tmp_path / "Qtab.dat"
    _write_draine(p)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        para = Para()
        para.dust[0][0].components[0].optical_indices_file = "Qtab.dat"
        para.dust[0][0].n_grains = 4
        para.dust[0][0].amin = 0.001
        para.dust[0][0].amax = 0.1
        wl = log_wavelength_grid(6, 0.2, 500.0)
        dm = build_dust_model(para, wl)
        assert np.all(np.isfinite(np.asarray(dm.c_ext)))
    finally:
        os.chdir(cwd)
