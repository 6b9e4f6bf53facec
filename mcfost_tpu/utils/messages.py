"""Uniform user-facing messages (the reference's messages module,
src/messages.f90: error() prints and stops, warning() prints)."""
from __future__ import annotations

import sys


class McfostError(RuntimeError):
    """Fatal configuration/physics error (error(), messages.f90:10-24)."""


def error(msg: str, msg2: str | None = None):
    print(f" ERROR: {msg}", file=sys.stderr)
    if msg2:
        print(f"        {msg2}", file=sys.stderr)
    raise McfostError(msg)


def warning(msg: str, msg2: str | None = None):
    print(f" WARNING: {msg}")
    if msg2:
        print(f"          {msg2}")
