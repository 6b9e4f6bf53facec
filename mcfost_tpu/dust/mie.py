"""Vectorized Mie scattering (Bohren & Huffman algorithm).

Computes extinction/scattering efficiencies, asymmetry parameter and the
amplitude functions S1/S2 on a regular scattering-angle grid for a *batch*
of (size parameter, refractive index) pairs.

This is a from-scratch NumPy float64 implementation of the textbook
algorithm (Bohren & Huffman 1983, App. A) — the same physics the reference
evaluates one grain at a time in ``bhmie`` (reference: src/scattering.f90:70-310),
re-organised for batch table building: pairs are bucketed by series length
``nstop`` so the sequential Riccati–Bessel recurrences are vectorized across
pairs of similar cost, with masked accumulation beyond each pair's own
``nstop``.

Everything runs host-side (one-time table build); results are cached by the
caller.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE = None


def _load_native():
    """Load (building if needed) the native C++ Mie kernel (native/mie.cpp);
    returns None if unavailable so the NumPy path is used."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE if _NATIVE is not False else None
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    so = os.path.join(here, "native", "libmie.so")
    if not os.path.isfile(so):
        try:
            subprocess.run(["make", "-C", os.path.join(here, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            _NATIVE = False
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.mie_batch_c.restype = ctypes.c_int
        lib.mie_batch_c.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
        ]
        _NATIVE = lib
        return lib
    except Exception:
        _NATIVE = False
        return None


def _mie_chunk(x: np.ndarray, m: np.ndarray, mu: np.ndarray):
    """Mie for a chunk of pairs iterated to the chunk-wide max order.

    x: (P,) real size parameters; m: (P,) complex refractive indices;
    mu: (A,) cos(theta) grid.
    Returns qext (P,), qsca (P,), gsca (P,), S1 (P,A), S2 (P,A) complex.
    """
    P, A = x.shape[0], mu.shape[0]
    y = m * x
    nstop = np.floor(x + 4.0 * x ** (1.0 / 3.0) + 2.0).astype(np.int64)
    nstop = np.maximum(nstop, 1)
    nmax = int(nstop.max())
    nmx = int(max(nmax, np.abs(y).max()) + 15)

    # Logarithmic derivative D_n(y) by downward recurrence
    D = np.zeros((P, nmax + 1), dtype=np.complex128)
    Dn = np.zeros(P, dtype=np.complex128)
    for n in range(nmx, 0, -1):
        k = n / y
        Dn = k - 1.0 / (Dn + k)
        if n - 1 <= nmax:
            D[:, n - 1] = Dn
    # D[:, n] = D_{n+1}?  Indexing: after loop iteration n, Dn = D_{n-1}.
    # We stored Dn into D[:, n-1], i.e. D[:, j] = D_j with D_0 unused? No:
    # D_j for j=0..nmax where D[:, j] = D_{j}. At iteration n we computed
    # D_{n-1} from D_n, stored at column n-1.  So D[:, j] == D_j.  We need
    # D_n for n=1..nstop: columns 1..nstop.

    # Riccati-Bessel upward recurrences, vectorized over pairs & angles
    psi_nm2 = np.cos(x)            # psi_{-1}
    psi_nm1 = np.sin(x)            # psi_0
    chi_nm2 = -np.sin(x)           # chi_{-1}
    chi_nm1 = np.cos(x)            # chi_0
    xi_nm1 = psi_nm1 - 1j * chi_nm1

    qsca = np.zeros(P)
    qext = np.zeros(P)
    gsum = np.zeros(P)
    S1 = np.zeros((P, A), dtype=np.complex128)
    S2 = np.zeros((P, A), dtype=np.complex128)

    pi_nm1 = np.zeros((P, A))      # pi_0
    pi_n = np.ones((P, A))         # pi_1

    an_prev = np.zeros(P, dtype=np.complex128)
    bn_prev = np.zeros(P, dtype=np.complex128)

    inv_x = 1.0 / x
    # overflow/invalid beyond a pair's own nstop is expected and masked out
    np_err = np.seterr(over="ignore", invalid="ignore")
    for n in range(1, nmax + 1):
        en = float(n)
        live = (n <= nstop)

        psi = (2.0 * en - 1.0) * psi_nm1 * inv_x - psi_nm2
        chi = (2.0 * en - 1.0) * chi_nm1 * inv_x - chi_nm2
        xi = psi - 1j * chi

        Dn = D[:, n]
        da = Dn / m + en * inv_x
        db = Dn * m + en * inv_x
        an = (da * psi - psi_nm1) / (da * xi - xi_nm1)
        bn = (db * psi - psi_nm1) / (db * xi - xi_nm1)
        an = np.where(live, an, 0.0)
        bn = np.where(live, bn, 0.0)

        f = (2.0 * en + 1.0)
        qsca += f * (np.abs(an) ** 2 + np.abs(bn) ** 2)
        qext += f * (an.real + bn.real)
        gsum += (f / (en * (en + 1.0))) * (an.real * bn.real + an.imag * bn.imag)
        if n > 1:
            gsum += ((en - 1.0) * (en + 1.0) / en) * (
                an_prev.real * an.real + an_prev.imag * an.imag
                + bn_prev.real * bn.real + bn_prev.imag * bn.imag)

        # angle functions
        tau_n = en * mu[None, :] * pi_n - (en + 1.0) * pi_nm1
        fn = f / (en * (en + 1.0))
        S1 += (fn * an)[:, None] * pi_n + (fn * bn)[:, None] * tau_n
        S2 += (fn * an)[:, None] * tau_n + (fn * bn)[:, None] * pi_n

        # advance recurrences
        pi_np1 = ((2.0 * en + 1.0) * mu[None, :] * pi_n - (en + 1.0) * pi_nm1) / en
        pi_nm1, pi_n = pi_n, pi_np1
        psi_nm2, psi_nm1 = psi_nm1, psi
        chi_nm2, chi_nm1 = chi_nm1, chi
        xi_nm1 = xi
        an_prev, bn_prev = an, bn

    np.seterr(**np_err)
    x2 = x * x
    qsca_out = 2.0 / x2 * qsca
    qext_out = 2.0 / x2 * qext
    gsca = np.where(qsca > 0, 2.0 * gsum / np.maximum(qsca, 1e-300), 0.0)
    return qext_out, qsca_out, gsca, S1, S2


def mie_batch(x: np.ndarray, m: np.ndarray, nang: int = 181):
    """Mie properties for a batch of (x, m) pairs on ``nang`` angles 0..180 deg.

    Pairs are bucketed by nstop octave so that small-x pairs don't pay the
    cost (or the overflow risk) of large-x series lengths.

    Returns dict with qext, qsca, gsca (all (P,)) and s11,s12,s33,s34
    ((P, nang)), where the Mueller elements are normalised like the
    reference's mueller_Mie (src/scattering.f90:352-371): S11 such that
    (1/x^2)*integral over solid angle equals Qsca (factor 1/(0.5 x^2)).
    """
    x = np.asarray(x, dtype=np.float64).ravel()
    m = np.asarray(m, dtype=np.complex128).ravel()
    P = x.shape[0]
    theta = np.linspace(0.0, np.pi, nang)
    mu = np.cos(theta)

    lib = _load_native()
    if lib is not None:
        qext = np.zeros(P); qsca = np.zeros(P); gsca = np.zeros(P)
        s11 = np.zeros((P, nang)); s12 = np.zeros((P, nang))
        s33 = np.zeros((P, nang)); s34 = np.zeros((P, nang))
        lib.mie_batch_c(P, np.ascontiguousarray(x),
                        np.ascontiguousarray(m.real),
                        np.ascontiguousarray(m.imag), nang,
                        qext, qsca, gsca, s11, s12, s33, s34)
        return dict(qext=qext, qsca=qsca, gsca=gsca,
                    s11=s11, s12=s12, s33=s33, s34=s34, theta=theta)

    nstop = np.floor(x + 4.0 * x ** (1.0 / 3.0) + 2.0).astype(np.int64)
    order = np.argsort(nstop)
    qext = np.zeros(P)
    qsca = np.zeros(P)
    gsca = np.zeros(P)
    S1 = np.zeros((P, nang), dtype=np.complex128)
    S2 = np.zeros((P, nang), dtype=np.complex128)

    # buckets: pairs whose nstop is within 2x of the bucket minimum,
    # additionally capped so chunk memory stays modest.
    i = 0
    while i < P:
        j = i + 1
        n0 = nstop[order[i]]
        # memory cap: P_chunk * nmax complex128 for D
        while (j < P and nstop[order[j]] <= max(2 * n0, n0 + 64)
               and (j - i) * max(nstop[order[j]], 1) < 4.0e7):
            j += 1
        idx = order[i:j]
        qe, qs, g, s1, s2 = _mie_chunk(x[idx], m[idx], mu)
        qext[idx] = qe
        qsca[idx] = qs
        gsca[idx] = g
        S1[idx] = s1
        S2[idx] = s2
        i = j

    # Mueller matrix elements, normalised as the reference does
    # (src/scattering.f90:352-371): factor = 1/(0.5 x^2)
    factor = 1.0 / (0.5 * x * x)
    i1 = np.abs(S2) ** 2
    i2 = np.abs(S1) ** 2
    s11 = 0.5 * (i1 + i2) * factor[:, None]
    s12 = 0.5 * (i1 - i2) * factor[:, None]
    s = S2 * np.conj(S1)
    s33 = s.real * factor[:, None]
    s34 = s.imag * factor[:, None]
    return dict(qext=qext, qsca=qsca, gsca=gsca,
                s11=s11, s12=s12, s33=s33, s34=s34, theta=theta)
