"""Legacy parameter-file formats (2.10 .. 4.1).

The reference dispatches 15+ versioned layouts (src/read_param.f90:16-110);
every file shipped in src/legacy_parameter_files/ must parse.
"""
import glob

import pytest

from mcfost_tpu.config.para import read_para

LEGACY = "/root/reference/src/legacy_parameter_files"

ALL_LEGACY = sorted(
    f.rsplit("/", 1)[-1] for f in glob.glob(f"{LEGACY}/*.para"))


@pytest.mark.parametrize("name", ALL_LEGACY)
def test_parse_legacy(name):
    p = read_para(f"{LEGACY}/{name}")
    assert 1000 < p.stars[0].teff < 11000
    assert p.zones[0].rin > 0
    assert p.grid.n_rad in (100, 140) and p.grid.nz in (40, 50, 60, 70)
    if "multi" in name or "2zones" in name:
        assert len(p.zones) == 2
    if p.version >= 3.0:
        # legacy symmetric velocity grid mapped onto vmin/vmax
        m = p.mol.molecules[0]
        assert m.vmin == -m.vmax and m.n_speed == 41
    assert p.stars[0].spectrum_file.endswith(".fits.gz")


def test_legacy_cavity_section_consumed():
    # pre-2.21 files carry a cavity section; parse must stay aligned
    p = read_para(f"{LEGACY}/ref2.20.para")
    assert p.cavity is None          # 'F' cavity flag in the ref file
    assert p.stars[0].radius == 2.0  # stars section reached correctly


def test_pre215_map_size_from_size_neb():
    # pre-2.15 formats define the map size as 2*size_neb on the zone
    # radii line (read_param.f90:3684)
    p = read_para(f"{LEGACY}/ref2.14.para")
    assert p.maps.map_size == 3000.0
    p = read_para(f"{LEGACY}/ref2.10.para")
    assert p.maps.map_size == 700.0      # 2 * 350 (size_neb)
    assert p.photons.n_eq_th == 128 * 10000   # n_loop multiplier
    assert len(p.mol.molecules) == 1
    assert p.stars[0].fuv == 0.0


def test_legacy_global_gas_to_dust():
    # 2.10-2.14: per-zone g2d comes from the global dust-properties line
    p = read_para(f"{LEGACY}/ref2.13.para")
    assert p.zones[0].gas_to_dust == 100.0
    assert p.T_max == 1500.0 and p.n_T == 100   # legacy T-table line
    # 2.13 species line: n_comp/mixing/porosity/massfrac + component
    assert p.dust[0][0].components[0].volume_fraction == 0.8


def test_211_star_line_fuv():
    p = read_para(f"{LEGACY}/ref2.11.para")
    assert p.stars[0].fuv == 0.0 and p.stars[0].slope_fuv == 2.2
    assert len(p.mol.molecules) == 2


def test_too_old_rejected():
    from mcfost_tpu.config.para import parse_para
    with pytest.raises(NotImplementedError):
        parse_para("2.05\n")


def test_para_writer_roundtrip(tmp_path):
    """-get_para: the 4.1 writer round-trips through our own parser."""
    from mcfost_tpu.config.para import Para, write_para, read_para, Atom
    p = Para()
    p.atoms.atoms = [Atom()]
    p.zones[0].dust_mass = 3.3e-4
    p.stars[0].teff = 4321.0
    path = str(tmp_path / "out.para")
    write_para(p, path)
    q = read_para(path)
    assert q.zones[0].dust_mass == 3.3e-4
    assert q.stars[0].teff == 4321.0
    assert q.mol.molecules[0].transitions == p.mol.molecules[0].transitions
    assert q.atoms.atoms[0].lines == p.atoms.atoms[0].lines


def test_safe_stop_budget_scoped_to_run(tmp_path):
    """-safe_stop must not leak an (expired) wall-clock budget into later
    in-process work (it truncated NLTE loops run after the fixtures)."""
    import os
    from mcfost_tpu import cli
    from mcfost_tpu.utils.safestop import safe_stop_requested
    rc = cli.main(["-get_para"])
    assert rc == 0
    os.remove("ref4.1_default.para")
    # a run that parses -safe_stop and exits early (unknown-mode error is
    # fine; the env handling happens around the whole run)
    cli.main(["-safe_stop", "0.001", "-get_para"])
    assert "MCFOST_TPU_SAFE_STOP_S" not in os.environ
    assert not safe_stop_requested()
    if os.path.isfile("ref4.1_default.para"):
        os.remove("ref4.1_default.para")
