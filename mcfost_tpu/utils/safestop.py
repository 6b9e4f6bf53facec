"""Wall-clock budget guard (reference -safe_stop, gas/atom_transfer.f90:797-802
and utils.f90 lsafe_stop: exit iterative loops cleanly before a queue kills
the job, writing whatever has converged so far)."""
from __future__ import annotations

import os
import time


def safe_stop_requested() -> bool:
    """True when the CLI's -safe_stop budget has been exhausted."""
    budget = os.environ.get("MCFOST_TPU_SAFE_STOP_S")
    if not budget:
        return False
    start = float(os.environ.get("MCFOST_TPU_START_TIME", "0") or 0.0)
    return (time.time() - start) > float(budget)
