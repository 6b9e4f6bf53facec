"""Tabulated-opacity inputs: Draine/Misselt Q tables and DustEM files.

Reference: src/read_opacity.f90 (draine_load :144-185, get_draine_dim,
Misselt format) and src/read_DustEM.f90 (LAMBDA.DAT + Q_<name>.DAT +
G_<name>.DAT).  These replace the Mie pipeline for populations whose
"optical indices" file is actually a cross-section table (the PAH files
PAHneu.dat/PAHion.dat are of this kind), providing Qext/Qsca/g on a
(size, lambda) grid that build_dust_model interpolates onto the model's
grains and wavelengths.  The phase function for tabulated populations is
Henyey-Greenstein in g (the reference's opacity-file path carries no
Mueller matrix either).
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class OpacityTable:
    name: str
    r_grain: np.ndarray        # (na,) [micron]
    lam: np.ndarray            # (nl,) [micron]
    qext: np.ndarray           # (na, nl)
    qsca: np.ndarray           # (na, nl)
    g: np.ndarray              # (na, nl)


def read_draine_opacity_file(path: str) -> OpacityTable:
    """Draine-format Q table (draine_load, read_opacity.f90:144-185):
    header lines, then na, n_lambda, then per-size blocks of
    'a_um' + rows of (lambda, Q_ext, junk, Q_sca, g)."""
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    # skip leading comment/header lines until an int line (na)
    i = 0
    while i < len(lines):
        toks = lines[i].split()
        if len(toks) >= 1:
            try:
                na = int(float(toks[0]))
                if na > 0 and float(toks[0]) == na:
                    break
            except ValueError:
                pass
        i += 1
    nl = int(float(lines[i + 1].split()[0]))
    i += 2
    r = np.zeros(na)
    qext = np.zeros((na, nl))
    qsca = np.zeros((na, nl))
    g = np.zeros((na, nl))
    lam = np.zeros(nl)
    for ia in range(na):
        while not lines[i].split():
            i += 1
        r[ia] = float(lines[i].split()[0])
        i += 1
        while not lines[i].split() or not _is_float(lines[i].split()[0]):
            i += 1
        for j in range(nl):
            t = lines[i].split()
            lam[j], qext[ia, j] = float(t[0]), float(t[1])
            qsca[ia, j], g[ia, j] = float(t[3]), float(t[4])
            i += 1
    order = np.argsort(lam)
    return OpacityTable(name=os.path.basename(path), r_grain=r,
                        lam=lam[order], qext=qext[:, order],
                        qsca=qsca[:, order], g=g[:, order])


def _is_float(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


def read_dustem(dustem_dir: str, name: str) -> OpacityTable:
    """DustEM oprop tables (read_DustEM_cross_sections,
    read_DustEM.f90:92-140): LAMBDA.DAT (n_lambda + values) and
    Q_<name>.DAT / G_<name>.DAT (na, sizes row, then Qabs rows, Qsca
    rows / g rows per lambda)."""
    def _read_values(path):
        vals = []
        with open(path) as f:
            for ln in f:
                ln = ln.split("#")[0].strip()
                if ln:
                    vals.extend(float(t) for t in ln.split())
        return np.array(vals)

    lam_v = _read_values(os.path.join(dustem_dir, "oprop", "LAMBDA.DAT"))
    nl = int(lam_v[0])
    lam = lam_v[1:1 + nl]

    qv = _read_values(os.path.join(dustem_dir, "oprop", f"Q_{name}.DAT"))
    na = int(qv[0])
    sizes = qv[1:1 + na]
    rest = qv[1 + na:]
    qabs = rest[:nl * na].reshape(nl, na).T
    qsca = rest[nl * na:2 * nl * na].reshape(nl, na).T

    gpath = os.path.join(dustem_dir, "oprop", f"G_{name}.DAT")
    if os.path.isfile(gpath):
        gv = _read_values(gpath)
        g = gv[1 + na:][:nl * na].reshape(nl, na).T
    else:
        g = np.zeros_like(qabs)
    return OpacityTable(name=name, r_grain=sizes, lam=lam,
                        qext=qabs + qsca, qsca=qsca, g=g)


def try_read(filename: str, search_dirs=()) -> OpacityTable | None:
    """Opacity-table dispatch for build_dust_model: returns None when the
    file is absent or is a plain (n,k) optical-indices file."""
    for d in ("",) + tuple(search_dirs):
        path = os.path.join(d, filename) if d else filename
        if not os.path.isfile(path):
            continue
        try:
            return read_draine_opacity_file(path)
        except (ValueError, IndexError):
            return None
    return None


def tabulated_optics(table: OpacityTable, a_um: np.ndarray,
                     lam_um: np.ndarray, nang_plus1: int) -> dict:
    """Interpolate a Q table onto (grains, wavelengths) and synthesize the
    HG Mueller tables, same output contract as mie_batch."""
    K, L, A = len(a_um), len(lam_um), nang_plus1
    la = np.log(np.maximum(table.r_grain, 1e-30))
    ll = np.log(table.lam)

    def interp2(q):
        # bilinear in log-size / log-lambda
        out = np.zeros((K, L))
        qi = np.stack([np.interp(np.log(lam_um), ll, q[ia])
                       for ia in range(len(la))])          # (na, L)
        for j in range(L):
            out[:, j] = np.interp(np.log(np.maximum(a_um, 1e-30)),
                                  la, qi[:, j])
        return out

    qext = interp2(table.qext)
    qsca = np.minimum(interp2(table.qsca), qext)
    g = np.clip(interp2(table.g), -0.99, 0.99)
    theta = np.linspace(0.0, np.pi, A)
    ct = np.cos(theta)
    # HG phase function scaled so the CDF assembly reproduces qsca
    s11 = (1 - g[..., None] ** 2) / np.maximum(
        (1 + g[..., None] ** 2 - 2 * g[..., None] * ct) ** 1.5, 1e-30)
    norm = np.trapezoid(s11 * np.sin(theta), theta, axis=-1)
    s11 = s11 * (2.0 * qsca[..., None] / np.maximum(norm[..., None], 1e-30))
    zero = np.zeros_like(s11)
    return {"qext": qext.ravel(), "qsca": qsca.ravel(), "gsca": g.ravel(),
            "s11": s11.reshape(-1, A), "s12": zero.reshape(-1, A),
            "s33": s11.reshape(-1, A), "s34": zero.reshape(-1, A)}


def read_dustem_heat_capacity(dustem_dir: str, name: str,
                              rho1g: float) -> tuple | None:
    """Tabulated specific heat (T [K], C [erg/g/K]) from
    DustEM/hcap/C_<name>.DAT (read_DustEM_specific_heat,
    read_DustEM.f90:202-235: rows of log10 T, log10 C_volumic; divided by
    the bulk density to get the massic capacity).  None when absent."""
    path = os.path.join(dustem_dir, "hcap", f"C_{name}.DAT")
    if not os.path.isfile(path):
        return None
    vals = []
    with open(path) as f:
        for ln in f:
            ln = ln.split("#")[0].strip()
            if ln:
                vals.extend(float(t) for t in ln.split())
    na = int(vals[0])
    nT = int(vals[1 + na])
    rows = np.asarray(vals[2 + na:2 + na + 2 * nT]).reshape(nT, 2)
    T = 10.0 ** rows[:, 0]
    C = 10.0 ** rows[:, 1] / max(rho1g, 1e-30)       # erg/K/g
    return T, C


def read_misselt_heat_capacity(path: str) -> tuple | None:
    """Misselt-format opacity files carry a specific-heat section after a
    'specific heat' marker: rows of (T [K], C [erg/g/K])
    (Misselt_specific_heat, PAH.f90:220-239).  None when not found."""
    if not os.path.isfile(path):
        return None
    T, C = [], []
    in_sh = False
    with open(path) as f:
        for ln in f:
            low = ln.lower()
            if "heat" in low and ("specific" in low or "capacit" in low):
                in_sh = True
                continue
            if not in_sh:
                continue
            ls = ln.split("#")[0].strip()
            if not ls:
                continue
            toks = ls.split()
            try:
                t, c = float(toks[0]), float(toks[1])
            except (ValueError, IndexError):
                break
            T.append(t)
            C.append(c)
    if not T:
        return None
    return np.asarray(T), np.asarray(C)
