"""User-supplied opacity + Mueller-matrix input files.

Covers the reference's Mueller_input (scattering.f90:383-580): the
RADMC-3D-style "dustkapscatmat" text format — comment lines, a format
code (1 = with scattering matrix, 3 = opacities only), n_lambda
[, n_angles], per-wavelength rows (lambda[um] kabs ksca g [cm^2/g]),
then the angle grid and the 6 matrix elements per (wavelength, angle).

When a file is given (-Mueller), it REPLACES the Mie/DHS optics of the
whole dust population: per-bucket kappa/albedo/g and the cell-mean phase
matrices come from the file, interpolated onto the model's wavelength and
scattering-angle grids.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class MuellerFile:
    lam_um: np.ndarray           # (W,)
    kabs: np.ndarray             # (W,) [cm^2/g]
    ksca: np.ndarray             # (W,)
    g: np.ndarray                # (W,)
    angles: np.ndarray | None    # (A,) [deg]
    f11: np.ndarray | None       # (W, A) [sr^-1 normalised]
    f12: np.ndarray | None
    f22: np.ndarray | None
    f33: np.ndarray | None
    f34: np.ndarray | None
    f44: np.ndarray | None


def read_mueller_file(path: str) -> MuellerFile:
    """Parse the dustkapscatmat format (Mueller_input,
    scattering.f90:383-580)."""
    vals: list[str] = []
    with open(path) as f:
        for line in f:
            ls = line.strip()
            if not ls or ls.startswith("#"):
                continue
            vals.extend(ls.split())
    pos = 0

    def take(n):
        nonlocal pos
        out = np.asarray(vals[pos:pos + n], np.float64)
        pos += n
        return out

    iformat = int(take(1)[0])
    with_scat = iformat == 1
    nlam = int(take(1)[0])
    nang = int(take(1)[0]) if with_scat else 0
    rows = take(4 * nlam).reshape(nlam, 4)
    lam, kabs, ksca, g = rows.T
    if not with_scat:
        return MuellerFile(lam, kabs, ksca, g, None, None, None, None,
                           None, None, None)
    angles = take(nang)
    mat = take(6 * nlam * nang).reshape(nlam, nang, 6)
    return MuellerFile(lam, kabs, ksca, g, angles,
                       f11=mat[..., 0], f12=mat[..., 1], f22=mat[..., 2],
                       f33=mat[..., 3], f34=mat[..., 4], f44=mat[..., 5])


def apply_mueller_input(tabs: dict, mf: MuellerFile, lam_um: np.ndarray,
                        nang_scatt: int) -> dict:
    """Override the assembled per-bucket dust tables with the file's
    optics (the reference uses the file instead of Mie for every grain
    of the population, scattering.f90:480-580).

    tabs: output of assemble_mix_tables; modified copies are returned.
    The absolute kappa normalisation keeps the model's own scale (dust
    density x opacity_norm) by preserving the ratio structure: albedo,
    g and the phase matrices come from the file; kappa keeps the model's
    wavelength-integrated level scaled to the file's spectral SHAPE."""
    P, L = tabs["kappa"].shape
    A1 = nang_scatt + 1
    llog = np.log(lam_um)
    flog = np.log(mf.lam_um)
    order = np.argsort(flog)

    def ilog(y, floor=1e-300):
        return np.exp(np.interp(llog, flog[order],
                                np.log(np.maximum(y[order], floor))))

    kabs = ilog(mf.kabs)
    ksca = ilog(mf.ksca)
    kext = kabs + ksca
    # keep the model's absolute kappa level (the para's dust mass sets
    # column density); adopt the file's spectral shape and albedo
    ref = tabs["kappa"].mean(0)
    scale = (ref * np.gradient(lam_um)).sum() \
        / np.maximum((kext * np.gradient(lam_um)).sum(), 1e-300)
    out = dict(tabs)
    out["kappa"] = np.broadcast_to(kext * scale, (P, L)).copy()
    out["kappa_abs"] = np.broadcast_to(kabs * scale, (P, L)).copy()
    out["albedo"] = np.broadcast_to(
        ksca / np.maximum(kext, 1e-300), (P, L)).copy()
    out["g_cell"] = np.broadcast_to(ilog(mf.g, 1e-30), (P, L)).copy()

    if mf.f11 is None:
        return out

    # interpolate the matrix onto (model lambda, model angle) grids
    theta = np.linspace(0.0, 180.0, A1)
    ang = mf.angles

    def onto(mfm):
        # (W, Af) -> (L, A1): angle linear, wavelength log-nearest
        tmp = np.stack([np.interp(theta, ang, mfm[w])
                        for w in range(mfm.shape[0])])      # (W, A1)
        iw = np.clip(np.searchsorted(flog[order], llog), 0,
                     len(flog) - 1)
        return tmp[order][iw]                               # (L, A1)

    s11 = np.maximum(onto(mf.f11), 0.0)
    s11_raw = s11.copy()

    def r(m):
        return np.where(s11_raw > 0,
                        onto(m) / np.maximum(s11_raw, 1e-300), 0.0)
    # normalise s11 so the angular sum matches ksca in the internal
    # convention (same construction as assemble_mix_tables)
    th_r = np.deg2rad(theta)
    wsin = np.sin(th_r) * (np.pi / nang_scatt)
    wsin[0] = 0.0
    norm = (s11 * wsin[None, :]).sum(-1)
    ksca_int = out["kappa"][0] * out["albedo"][0]
    s11 = s11 * (ksca_int / np.maximum(norm, 1e-300))[:, None]

    dtheta = np.pi / nang_scatt
    out["s11_rt"] = np.broadcast_to(
        s11 / np.maximum(ksca_int[:, None], 1e-300)
        * (dtheta / (2.0 * np.pi)), (P, L, A1)).copy()
    out["s12_rt"] = np.broadcast_to(-r(mf.f12), (P, L, A1)).copy()
    out["s33_rt"] = np.broadcast_to(r(mf.f33), (P, L, A1)).copy()
    out["s34_rt"] = np.broadcast_to(r(mf.f34), (P, L, A1)).copy()

    cum = np.cumsum(s11 * wsin[None, :], axis=-1)
    cum[:, 0] = 0.0
    missing = np.maximum(ksca_int - cum[:, -1], 0.0)
    prob = cum + missing[:, None]
    prob[:, 0] = 0.0
    prob = prob / np.maximum(prob[:, -1:], 1e-300)
    out["prob_s11_m2"] = np.broadcast_to(prob, (P, L, A1)).copy()
    return out


def read_fresnel_matrix(path: str):
    """Parse the Fresnel 4x4 ASCII format (Fresnel_input,
    scattering.f90:727-860): a header line, 'Qext Qsca <cos>' values,
    banner lines, then per scattering angle four rows holding the 4x4
    Mueller matrix (first row prefixed by the angle in degrees).

    Returns (qext, qsca, g, angles_deg (A,), M (A, 4, 4)).  The format
    is wavelength-independent (one matrix for the whole run)."""
    nums: list[float] = []
    with open(path) as f:
        for line in f:
            for tok in line.split():
                try:
                    nums.append(float(tok))
                except ValueError:
                    pass
    if len(nums) < 3 + 17:
        raise ValueError(f"{path}: not a Fresnel matrix file")
    qext, qsca, g = nums[0], nums[1], nums[2]
    body = np.asarray(nums[3:], np.float64)
    if body.size % 17:
        raise ValueError(f"{path}: matrix block is not (angle + 16) rows")
    body = body.reshape(-1, 17)
    angles = body[:, 0]
    M = body[:, 1:].reshape(-1, 4, 4)
    return qext, qsca, g, angles, M


def read_fresnel_size_index(path: str):
    """Per-size index file (-Fresnel_size; Fresnel_input_size,
    scattering.f90:860-960): one 'size_um path' row per grain size,
    sorted by increasing size."""
    entries = []
    with open(path) as f:
        for line in f:
            t = line.split()
            if len(t) >= 2:
                entries.append((float(t[0]), t[1]))
    return entries


def apply_fresnel_per_grain(qext, qsca, gsca, s11, s12, s33, s34,
                            r_grain, para):
    """Replace the Mie optics of every grain with the Fresnel file(s)
    (-Fresnel: one matrix for all grains; -Fresnel_size: one file per
    size, validated against the grain grid like the reference's
    size-mismatch error).  The matrix is normalised so its angular
    integral reproduces the file's Qsca in the internal convention
    (the reference's somme_prob normalisation)."""
    import os
    K, L, A = s11.shape
    theta = np.linspace(0.0, 180.0, A)
    w = np.sin(np.deg2rad(theta)) * (np.pi / (A - 1))
    w[0] = 0.0

    if getattr(para, "fresnel_per_size", False):
        entries = read_fresnel_size_index(para.fresnel_file)
        if len(entries) < K:
            raise ValueError(
                f"-Fresnel_size index has {len(entries)} rows for "
                f"{K} grain sizes")
        base = os.path.dirname(os.path.abspath(para.fresnel_file))
        per_grain = []
        for k in range(K):
            size, p = entries[k]
            if abs(size - r_grain[k]) > 1e-5 * max(r_grain[k], 1e-30):
                raise ValueError(
                    f"grain size in index is {size}, expected "
                    f"{r_grain[k]} (reference: 'Grain sizes do not "
                    "match')")
            if not os.path.isabs(p):
                p = os.path.join(base, p)
            per_grain.append(read_fresnel_matrix(p))
    else:
        per_grain = [read_fresnel_matrix(para.fresnel_file)] * K

    for k in range(K):
        qe, qs, g, ang, M = per_grain[k]
        m11 = np.interp(theta, ang, M[:, 0, 0])
        scale = qs / max((m11 * w).sum(), 1e-300)
        m11 = m11 * scale
        qext[k, :] = qe
        qsca[k, :] = qs
        gsca[k, :] = g
        s11[k] = m11[None, :]
        s12[k] = (np.interp(theta, ang, M[:, 0, 1]) * scale)[None, :]
        s33[k] = (np.interp(theta, ang, M[:, 2, 2]) * scale)[None, :]
        s34[k] = (np.interp(theta, ang, M[:, 2, 3]) * scale)[None, :]
    return qext, qsca, gsca, s11, s12, s33, s34
