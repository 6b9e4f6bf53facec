"""Minimal FITS writer/reader (no astropy dependency in this environment).

Produces files compatible with the reference's outputs (gzipped FITS images
with float32/float64 data and simple keyword headers; conventions:
docs/outputs.rst:1-199).  Supports:

* primary HDU + image extensions (NAXIS up to 6);
* BITPIX -32 / -64 / 32;
* optional gzip when the filename ends with .gz.

FITS layout: 2880-byte header blocks of 80-char cards, then big-endian data
padded to 2880 bytes.  Data are written in Fortran order so that axis 1 is
the fastest — matching both the FITS convention and the reference's writers
(e.g. ecriture_temperature, output.f90:2523).
"""
from __future__ import annotations

import gzip
import io
import numpy as np

_BLOCK = 2880


def _card(key: str, value, comment: str = "") -> bytes:
    if isinstance(value, bool):
        v = "T" if value else "F"
        s = f"{key:<8}= {v:>20}"
    elif isinstance(value, (int, np.integer)):
        s = f"{key:<8}= {value:>20d}"
    elif isinstance(value, float):
        s = f"{key:<8}= {value:>20.14G}"
    elif value is None:
        s = f"{key:<80}"[:80]
        return s.encode("ascii")
    else:
        s = f"{key:<8}= '{value}'"
    if comment:
        s += f" / {comment}"
    return f"{s:<80}"[:80].encode("ascii")


def _pad(b: bytes) -> bytes:
    n = len(b) % _BLOCK
    return b if n == 0 else b + b" " * (_BLOCK - n)


def _pad0(b: bytes) -> bytes:
    n = len(b) % _BLOCK
    return b if n == 0 else b + b"\0" * (_BLOCK - n)


def _header(cards) -> bytes:
    out = b"".join(cards) + f"{'END':<80}".encode("ascii")
    return _pad(out)


def _dtype_bitpix(arr: np.ndarray):
    if arr.dtype == np.float32:
        return -32, ">f4"
    if arr.dtype == np.float64:
        return -64, ">f8"
    if arr.dtype in (np.int32, np.dtype("int32")):
        return 32, ">i4"
    return -32, ">f4"


def _image_hdu(arr: np.ndarray, primary: bool, keywords=None) -> bytes:
    arr = np.asarray(arr)
    bitpix, be = _dtype_bitpix(arr)
    if arr.dtype not in (np.float32, np.float64, np.int32):
        arr = arr.astype(np.float32)
        bitpix, be = -32, ">f4"
    # FITS NAXIS1 is the fastest axis = last numpy axis
    shape = arr.shape[::-1]
    cards = []
    if primary:
        cards.append(_card("SIMPLE", True, "mcfost_tpu"))
    else:
        cards.append(_card("XTENSION", "IMAGE"))
    cards.append(_card("BITPIX", bitpix))
    cards.append(_card("NAXIS", len(shape)))
    for i, n in enumerate(shape):
        cards.append(_card(f"NAXIS{i+1}", int(n)))
    if not primary:
        cards.append(_card("PCOUNT", 0))
        cards.append(_card("GCOUNT", 1))
    if primary:
        cards.append(_card("EXTEND", True))
    for k, v in (keywords or {}).items():
        if isinstance(v, tuple):
            cards.append(_card(k, v[0], v[1]))
        else:
            cards.append(_card(k, v))
    data = arr.astype(be).tobytes()
    return _header(cards) + _pad0(data)


def write_fits(path: str, data, extensions=None, keywords=None):
    """Write data (primary HDU) plus optional image extensions."""
    buf = io.BytesIO()
    buf.write(_image_hdu(np.asarray(data), primary=True, keywords=keywords))
    for ext in (extensions or []):
        buf.write(_image_hdu(np.asarray(ext), primary=False))
    raw = buf.getvalue()
    if path.endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(raw)
    else:
        with open(path, "wb") as f:
            f.write(raw)


def read_fits(path: str):
    """Read all image HDUs; returns list of (header dict, ndarray)."""
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            raw = f.read()
    else:
        with open(path, "rb") as f:
            raw = f.read()
    pos = 0
    hdus = []
    while pos < len(raw):
        # header
        header = {}
        end = False
        while not end:
            block = raw[pos:pos + _BLOCK]
            pos += _BLOCK
            for i in range(0, _BLOCK, 80):
                card = block[i:i + 80].decode("ascii", errors="replace")
                key = card[:8].strip()
                if key == "END":
                    end = True
                    break
                if "=" in card[8:10]:
                    val = card[10:].split("/")[0].strip()
                    if val.startswith("'"):
                        header[key] = val.strip("'").strip()
                    elif val in ("T", "F"):
                        header[key] = val == "T"
                    else:
                        try:
                            header[key] = int(val)
                        except ValueError:
                            try:
                                header[key] = float(val)
                            except ValueError:
                                header[key] = val
        naxis = header.get("NAXIS", 0)
        shape = [header[f"NAXIS{i+1}"] for i in range(naxis)][::-1]
        bitpix = header.get("BITPIX", -32)
        dt = {-32: ">f4", -64: ">f8", 32: ">i4", 16: ">i2", 8: "u1"}[bitpix]
        count = int(np.prod(shape)) if shape else 0
        nbytes = count * np.dtype(dt).itemsize
        data = None
        if count:
            data = np.frombuffer(raw[pos:pos + nbytes], dtype=dt).reshape(shape)
            pos += ((nbytes + _BLOCK - 1) // _BLOCK) * _BLOCK
        hdus.append((header, data))
        if pos >= len(raw) or not raw[pos:pos + 8].strip():
            break
    return hdus
