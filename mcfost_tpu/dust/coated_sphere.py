"""Coated-sphere and Distribution-of-Hollow-Spheres (DHS) cross sections.

Covers the reference's ``coated_sphere.f90`` capability surface
(mueller_coated_sphere: src/coated_sphere.f90:20-128, mueller_DHS
:132-265, dmilay :269-905) with a different algorithm: instead of the
Toon & Ackerman DMiLay routine, the two-layer Mie coefficients are
computed from the Bohren & Huffman (1983, §8.2) stratified-sphere
solution rewritten entirely in *ratio variables* (logarithmic
derivatives and cross-argument Riccati-Bessel ratios), which stays in
float64 range for arbitrarily absorbing shells and arbitrarily small
cores — the regimes where the textbook BHCOAT overflows.

The per-order effective log-derivatives reduce exactly to the
homogeneous-Mie ones when core and shell indices coincide or when the
core vanishes, which is what the unit tests pin.

Batch layout matches dust/mie.py: a flat list of (core size parameter,
shell size parameter, core index, shell index) evaluated together, with
the same output normalisation (s11 ~ |S|^2 / (0.5 x^2)).
"""
from __future__ import annotations

import numpy as np

_TINY = 1e-12


def _coated_chunk(xc, y, m1, m2, mu):
    """Two-layer Mie for a chunk of pairs up to the chunk-wide max order.

    xc: (P,) core size parameter; y: (P,) shell (outer) size parameter;
    m1/m2: (P,) complex core/shell indices; mu: (A,) cos(theta).
    Returns qext, qsca, gqsc (g*qsca), S1, S2 — all relative to y
    (qext normalised by 0.5*y^2 convention like bhmie).
    """
    P, A = xc.shape[0], mu.shape[0]
    xc = np.maximum(xc, 1e-9)
    z1x = m1 * xc          # core index * core radius
    z2x = m2 * xc          # shell index * core radius
    z2y = m2 * y           # shell index * outer radius

    nstop = np.floor(y + 4.0 * y ** (1.0 / 3.0) + 2.0).astype(np.int64)
    nstop = np.maximum(nstop, 1)
    nmax = int(nstop.max())
    nmx = int(max(nmax, np.abs(z2y).max(), np.abs(z1x).max()) + 16)

    # --- logarithmic derivatives D1_n(z) = psi'_n/psi_n, downward (stable)
    def log_deriv(z):
        D = np.zeros((nmax + 1, P), dtype=np.complex128)
        Dn = np.zeros(P, dtype=np.complex128)
        for n in range(nmx, 0, -1):
            k = n / z
            Dn = k - 1.0 / (Dn + k)
            if n - 1 <= nmax:
                D[n - 1] = Dn
        return D

    D1_1x = log_deriv(z1x)
    D1_2x = log_deriv(z2x)
    D1_2y = log_deriv(z2y)

    # --- psi, chi, xi at real y: upward, as in homogeneous Mie
    psi_nm1 = np.sin(y)
    psi_nm2 = np.cos(y)
    chi_nm1 = np.cos(y)
    chi_nm2 = -np.sin(y)
    xi_nm1 = psi_nm1 - 1j * chi_nm1

    # --- chi-ratio state c_n(z) = chi_n/chi_{n-1} (upward, dominant
    # solution => stable) and psi-ratio r_n(z) = psi_n/psi_{n-1} from D1:
    # r_n = 1/(D1_n + n/z).  D2_n = chi'_n/chi_n = 1/c_n - n/z.
    c_2x = np.full(P, 0.0, dtype=np.complex128)   # set at n=1
    c_2y = np.full(P, 0.0, dtype=np.complex128)
    # cross-argument ratio ru_n = u_n(z2x)/u_n(z2y), u_n = psi_n/chi_n.
    # ru_0 = tan(z2x)/tan(z2y), computed overflow-safely via exp scaling.
    def safe_tan(z):
        # tan for complex z without overflow: saturates to +/- i
        im = np.clip(z.imag, -30.0, 30.0)
        zz = z.real + 1j * im
        return np.tan(zz)

    ru = safe_tan(z2x) / safe_tan(z2y)

    inv_y = 1.0 / y

    qsca = np.zeros(P)
    qext = np.zeros(P)
    gsum = np.zeros(P)
    S1 = np.zeros((P, A), dtype=np.complex128)
    S2 = np.zeros((P, A), dtype=np.complex128)
    pi_nm1 = np.zeros((P, A))
    pi_n = np.ones((P, A))
    an_prev = np.zeros(P, dtype=np.complex128)
    bn_prev = np.zeros(P, dtype=np.complex128)

    np_err = np.seterr(over="ignore", invalid="ignore", divide="ignore")
    for n in range(1, nmax + 1):
        en = float(n)
        live = n <= nstop

        psi = (2 * en - 1.0) * psi_nm1 * inv_y - psi_nm2
        chi = (2 * en - 1.0) * chi_nm1 * inv_y - chi_nm2
        xi = psi - 1j * chi

        # chi ratios (upward): c_1 = chi_1/chi_0 = 1/z + tan(z)
        if n == 1:
            c_2x = 1.0 / z2x + safe_tan(z2x)
            c_2y = 1.0 / z2y + safe_tan(z2y)
        else:
            c_2x = (2 * en - 1.0) / z2x - 1.0 / c_2x
            c_2y = (2 * en - 1.0) / z2y - 1.0 / c_2y
        D2_2x = 1.0 / c_2x - en / z2x
        D2_2y = 1.0 / c_2y - en / z2y

        # advance ru_n = ru_{n-1} * (r_n(z2x)/r_n(z2y)) * (c_n(z2y)/c_n(z2x))
        r_2x = 1.0 / (D1_2x[n] + en / z2x)
        r_2y = 1.0 / (D1_2y[n] + en / z2y)
        ru = ru * (r_2x / r_2y) * (c_2y / c_2x)

        # A_n/u_n(z2y) and B_n/u_n(z2y) in pure ratio form
        num_a = m2 * D1_1x[n] - m1 * D1_2x[n]
        den_a = m2 * D1_1x[n] - m1 * D2_2x
        num_b = m2 * D1_2x[n] - m1 * D1_1x[n]
        den_b = m2 * D2_2x - m1 * D1_1x[n]
        Au = ru * num_a / den_a
        Bu = ru * num_b / den_b
        Au = np.where(np.isfinite(Au), Au, 0.0)
        Bu = np.where(np.isfinite(Bu), Bu, 0.0)

        # effective log-derivatives at the outer surface
        Dt = (D1_2y[n] - Au * D2_2y) / (1.0 - Au)
        Gt = (D1_2y[n] - Bu * D2_2y) / (1.0 - Bu)

        da = Dt / m2 + en * inv_y
        db = Gt * m2 + en * inv_y
        an = (da * psi - psi_nm1) / (da * xi - xi_nm1)
        bn = (db * psi - psi_nm1) / (db * xi - xi_nm1)
        an = np.where(live & np.isfinite(an), an, 0.0)
        bn = np.where(live & np.isfinite(bn), bn, 0.0)

        f = 2 * en + 1.0
        qsca += f * (np.abs(an) ** 2 + np.abs(bn) ** 2)
        qext += f * (an.real + bn.real)
        gsum += (f / (en * (en + 1.0))) * (
            an.real * bn.real + an.imag * bn.imag)
        if n > 1:
            gsum += ((en - 1.0) * (en + 1.0) / en) * (
                an_prev.real * an.real + an_prev.imag * an.imag
                + bn_prev.real * bn.real + bn_prev.imag * bn.imag)

        tau_n = en * mu[None, :] * pi_n - (en + 1.0) * pi_nm1
        fn = f / (en * (en + 1.0))
        S1 += (fn * an)[:, None] * pi_n + (fn * bn)[:, None] * tau_n
        S2 += (fn * an)[:, None] * tau_n + (fn * bn)[:, None] * pi_n

        pi_np1 = ((2 * en + 1.0) * mu[None, :] * pi_n
                  - (en + 1.0) * pi_nm1) / en
        pi_nm1, pi_n = pi_n, pi_np1
        psi_nm2, psi_nm1 = psi_nm1, psi
        chi_nm2, chi_nm1 = chi_nm1, chi
        xi_nm1 = xi
        an_prev, bn_prev = an, bn
    np.seterr(**np_err)

    y2 = y * y
    return (2.0 / y2 * qext, 2.0 / y2 * qsca, 4.0 / y2 * gsum, S1, S2)


def coated_batch(x_core: np.ndarray, x_shell: np.ndarray,
                 m_core: np.ndarray, m_shell: np.ndarray, nang: int = 181):
    """Coated-sphere efficiencies + Mueller tables for a batch of grains.

    All efficiencies are relative to the *outer* geometric cross section;
    s11..s34 use the same normalisation as mie_batch (0.5*x_shell^2).
    Capability parity: mueller_coated_sphere (src/coated_sphere.f90:20-128).
    """
    x_core = np.asarray(x_core, np.float64).ravel()
    x_shell = np.asarray(x_shell, np.float64).ravel()
    m_core = np.asarray(m_core, np.complex128).ravel()
    m_shell = np.asarray(m_shell, np.complex128).ravel()
    theta = np.linspace(0.0, np.pi, nang)
    mu = np.cos(theta)
    P = x_shell.shape[0]

    nstop = np.floor(x_shell + 4.0 * x_shell ** (1.0 / 3.0) + 2).astype(int)
    order = np.argsort(nstop)
    qext = np.zeros(P); qsca = np.zeros(P); gqsc = np.zeros(P)
    S1 = np.zeros((P, nang), np.complex128)
    S2 = np.zeros((P, nang), np.complex128)
    i = 0
    while i < P:
        j = i + 1
        n0 = nstop[order[i]]
        while (j < P and nstop[order[j]] <= max(2 * n0, n0 + 64)
               and (j - i) * max(nstop[order[j]], 1) < 2.0e7):
            j += 1
        idx = order[i:j]
        qe, qs, gq, s1, s2 = _coated_chunk(
            x_core[idx], x_shell[idx], m_core[idx], m_shell[idx], mu)
        qext[idx] = qe; qsca[idx] = qs; gqsc[idx] = gq
        S1[idx] = s1; S2[idx] = s2
        i = j

    gsca = np.where(qsca > 0, gqsc / np.maximum(qsca, _TINY), 0.0)
    factor = 1.0 / (0.5 * x_shell * x_shell)
    i1 = np.abs(S2) ** 2
    i2 = np.abs(S1) ** 2
    return dict(qext=qext, qsca=qsca, gsca=gsca,
                s11=0.5 * (i1 + i2) * factor[:, None],
                s12=0.5 * (i1 - i2) * factor[:, None],
                s33=(S2 * np.conj(S1)).real * factor[:, None],
                s34=(S2 * np.conj(S1)).imag * factor[:, None],
                theta=theta)


def _gauss_legendre(a: float, b: float, n: int):
    xg, wg = np.polynomial.legendre.leggauss(n)
    f = 0.5 * (b - a) * xg + 0.5 * (b + a)
    w = 0.5 * (b - a) * wg
    return f, w / w.sum()


def dhs_batch(x: np.ndarray, m: np.ndarray, fmax: float = 0.8,
              nang: int = 181):
    """Distribution of Hollow Spheres (Min et al. 2005) efficiencies.

    x: volume-equivalent size parameters; m: material indices.  Averages
    vacuum-core coated spheres over hollow-volume fraction f in
    (0, fmax) with Gauss-Legendre weights; the per-f shell radius keeps
    the material volume fixed (rshell = a/(1-f)^(1/3)), and every
    cross section is re-normalised to the volume-equivalent geometric
    section pi*a^2 — the same contract as the reference's mueller_DHS
    (src/coated_sphere.f90:132-265).  Output dict matches mie_batch.
    """
    x = np.asarray(x, np.float64).ravel()
    m = np.asarray(m, np.complex128).ravel()
    P = x.shape[0]
    theta = np.linspace(0.0, np.pi, nang)

    # per-pair number of hollow fractions (coated_sphere.f90:159)
    n_vf = np.clip(x, 20, 100).astype(int)
    # bucket identical n_vf values so the f-grid is shared
    qext = np.zeros(P); qsca = np.zeros(P); gqsc = np.zeros(P)
    S11 = np.zeros((P, nang)); S12 = np.zeros((P, nang))
    S33 = np.zeros((P, nang)); S34 = np.zeros((P, nang))

    for nv in np.unique(n_vf):
        sel = np.nonzero(n_vf == nv)[0]
        f, wf = _gauss_legendre(0.0, fmax, int(nv))
        # flatten (pair, fraction) into one coated batch
        xs = x[sel]
        rshell = xs[:, None] / (1.0 - f[None, :]) ** (1.0 / 3.0)
        rcore = rshell * f[None, :] ** (1.0 / 3.0)
        mm = np.broadcast_to(m[sel][:, None], rshell.shape)
        out = coated_batch(rcore.ravel(), rshell.ravel(),
                           np.ones(rcore.size, np.complex128), mm.ravel(),
                           nang=nang)
        npair = sel.size
        qe = out["qext"].reshape(npair, nv)
        qs = out["qsca"].reshape(npair, nv)
        gs = out["gsca"].reshape(npair, nv)
        # area-weighted averages back to the volume-equivalent section
        area = rshell ** 2 * wf[None, :]          # ~ pi rshell^2 wf
        ce = (area * qe).sum(1); cs = (area * qs).sum(1)
        cg = (area * gs * qs).sum(1)
        x2 = xs ** 2
        qext[sel] = np.maximum(ce, 0.0) / x2
        qsca[sel] = np.maximum(cs, 0.0) / x2
        gqsc[sel] = cg / x2
        # Mueller elements: out's s11 are |S|^2/(0.5 rshell^2); undo the
        # per-f normalisation, average |S|^2*wf, renorm by 0.5 x^2
        scale = (0.5 * rshell ** 2 * wf[None, :])[..., None]
        renorm = 1.0 / (0.5 * x2)[:, None]
        for key, acc in (("s11", S11), ("s12", S12),
                         ("s33", S33), ("s34", S34)):
            v = out[key].reshape(npair, nv, nang)
            acc[sel] = (v * scale).sum(1) * renorm

    gsca = np.where(qsca > 0, gqsc / np.maximum(qsca, _TINY), 0.0)
    return dict(qext=qext, qsca=qsca, gsca=gsca,
                s11=S11, s12=S12, s33=S33, s34=S34, theta=theta)
