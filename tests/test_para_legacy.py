"""Legacy parameter-file formats (2.19 .. 4.1).

The reference dispatches 15+ versioned layouts (src/read_param.f90:16-110);
we cover 2.19+ — which includes every format the reference's own golden
test suite uses (ref3.0* fixtures) — and reject older ones clearly.
"""
import glob

import pytest

from mcfost_tpu.config.para import read_para

LEGACY = "/root/reference/src/legacy_parameter_files"


@pytest.mark.parametrize("name", [
    "ref2.19.para", "ref2.19_3D.para", "ref2.19_multi.para",
    "ref2.20.para", "ref2.21.para",
    "ref3.0.para", "ref3.0_3D.para", "ref3.0_multi.para",
    "ref4.0.para", "ref4.0_multi.para",
])
def test_parse_legacy(name):
    p = read_para(f"{LEGACY}/{name}")
    assert 1000 < p.stars[0].teff < 10000
    assert p.zones[0].rin > 0
    assert p.grid.n_rad == 100 and p.grid.nz in (50, 70)
    if "multi" in name:
        assert len(p.zones) == 2
    if p.version >= 3.0:
        # legacy symmetric velocity grid mapped onto vmin/vmax
        m = p.mol.molecules[0]
        assert m.vmin == -m.vmax and m.n_speed == 41


def test_legacy_cavity_section_consumed():
    # pre-2.21 files carry a cavity section; parse must stay aligned
    p = read_para(f"{LEGACY}/ref2.20.para")
    assert p.cavity is None          # 'F' cavity flag in the ref file
    assert p.stars[0].radius == 2.0  # stars section reached correctly


def test_too_old_rejected():
    with pytest.raises(NotImplementedError):
        read_para(f"{LEGACY}/ref2.18.para")


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
