"""Full-resolution fixture regression on real TPU hardware.

Each reference fixture runs at its para file's OWN photon counts and grid
(no reductions) and is compared against the committed
tests/goldens_full/<model>.npz with the reference test-suite thresholds —
T 5%, SED 10% (contributions 15%), images 13% and polarized flux 15%,
matching test_suite/test_mcfost.py:68-245 (the toy CPU harness in
test_fixtures.py keeps looser pola because of its 427x-reduced packet
counts).

Run:  MCFOST_TPU_TESTS=1 python -m pytest tests/ -m tpu
Regenerate goldens:  python tools/make_full_goldens.py  (then commit)
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from full_goldens import (GOLDEN_DIR, MODELS, collect_payload,  # noqa: E402
                          compare_payload, run_fixture_full)

pytestmark = [pytest.mark.tpu, pytest.mark.slow]


def _on_tpu():
    import jax
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


@pytest.mark.parametrize("model_name,do_mol", MODELS,
                         ids=[m for m, _ in MODELS])
def test_full_resolution_golden(model_name, do_mol, tmp_path):
    if not _on_tpu():
        pytest.skip("full-resolution sweep runs on TPU hardware")
    gpath = os.path.join(GOLDEN_DIR, f"{model_name}.npz")
    if not os.path.isfile(gpath):
        pytest.skip(f"no committed golden: run tools/make_full_goldens.py")
    out = str(tmp_path / model_name)
    r = run_fixture_full(model_name, do_mol, out)
    if r is None:
        pytest.skip("fixture not present")
    payload = collect_payload(model_name, do_mol, out)
    g = np.load(gpath)
    fails = compare_payload(model_name, payload, g)
    assert not fails, "; ".join(fails)
