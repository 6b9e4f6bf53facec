#!/usr/bin/env python
"""Generate the full-resolution fixture goldens on the real TPU.

Runs every reference fixture at its para file's own photon counts/grids
(tools/full_goldens.py) and writes tests/goldens_full/<model>.npz.
Re-run (and re-commit) whenever an intentional physics change shifts the
MC beyond the reference thresholds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.full_goldens import (GOLDEN_DIR, MODELS, collect_payload,
                                run_fixture_full)


def main():
    only = sys.argv[1:] or None
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for model_name, do_mol in MODELS:
        if only and model_name not in only:
            continue
        t0 = time.time()
        out = f"/tmp/goldens_full/{model_name}"
        r = run_fixture_full(model_name, do_mol, out)
        if r is None:
            print(f"{model_name}: fixture missing, skipped", flush=True)
            continue
        payload = collect_payload(model_name, do_mol, out)
        path = os.path.join(GOLDEN_DIR, f"{model_name}.npz")
        np.savez_compressed(path, **payload)
        print(f"{model_name}: golden written ({time.time()-t0:.0f}s) "
              f"-> {path}", flush=True)


if __name__ == "__main__":
    main()
