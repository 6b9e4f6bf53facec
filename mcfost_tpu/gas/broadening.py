"""Voigt profiles and line damping.

Covers the reference's voigts.f90 (Voigt function) and gas/broad.f90
(natural + van der Waals + quadratic Stark damping).

TPU-native: the Voigt function is the Humlicek (1982) w4 rational
approximation, fully branch-free via jnp.where over its four regions, so
one call evaluates H(a, x) for entire (cell, line, channel) tensors on
device inside the jitted formal solver.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from .atom import AtomModel, A_BOHR, M_ELECTRON, AMU_KG


def humlicek_w(a, x):
    """Complex probability function w(z), z = x + i a (a >= 0), Humlicek
    (1982, JQSRT 27, 437) w4 algorithm.  Returns Re(w) = Voigt H(a, x)
    and Im(w) (dispersion profile), both normalized so H(0, 0) = 1."""
    z = x + 1j * a
    s = jnp.abs(x) + a
    t = a - 1j * x

    # region I: |x| + a >= 15
    w1 = t * 0.5641896 / (0.5 + t * t)
    # region II: 5.5 <= s < 15
    u = t * t
    w2 = t * (1.410474 + u * 0.5641896) / (0.75 + u * (3.0 + u))
    # region III: s < 5.5, a >= 0.195 |x| - 0.176
    w3 = ((16.4955 + t * (20.20933 + t * (11.96482
          + t * (3.778987 + t * 0.5642236))))
          / (16.4955 + t * (38.82363 + t * (39.27121
             + t * (21.69274 + t * (6.699398 + t))))))
    # region IV: s < 5.5, a < 0.195 |x| - 0.176
    w4 = jnp.exp(u) - (t * (36183.31 - u * (3321.9905 - u * (1540.787
        - u * (219.0313 - u * (35.76683 - u * (1.320522 - u * 0.56419))))))
        / (32066.6 - u * (24322.84 - u * (9022.228 - u * (2186.181
           - u * (364.2191 - u * (61.57037 - u * (1.841439 - u))))))))

    w = jnp.where(s >= 15.0, w1,
                  jnp.where(s >= 5.5, w2,
                            jnp.where(a >= 0.195 * jnp.abs(x) - 0.176,
                                      w3, w4)))
    return w


def voigt(a, x):
    """Voigt function H(a, x), area-normalized to sqrt(pi)
    (i.e. integral over x of H = sqrt(pi))."""
    return jnp.real(humlicek_w(a, x))


def line_damping(atom: AtomModel, T: np.ndarray, ne: np.ndarray,
                 nH1: np.ndarray, vth: np.ndarray) -> np.ndarray:
    """Damping parameter a = Gamma / (4 pi dnu_D) per (cell, line)
    (gas/broad.f90: natural Grad + Unsold van der Waals + quadratic
    Stark).

    vth: (C,) thermal+turbulent most-probable speed [m/s].
    Returns (C, L)."""
    T = np.maximum(np.asarray(T, np.float64), 1.0)
    C = T.shape[0]
    L = atom.n_lines
    lam0 = atom.lambda0 * 1e-9                       # m
    dnuD = vth[:, None] / lam0[None, :]              # (C, L)

    gamma = np.broadcast_to(atom.Grad[None, :], (C, L)).copy()

    # Unsold van der Waals broadening by neutral hydrogen
    # (Mihalas 1978 eq. 9-50; broad.f90 UNSOLD branch):
    # C6 from the difference of mean-square radii of upper/lower level,
    # Gamma_vdW = 8.08 vrel^(3/5) C6^(2/5) nH
    ryd = 2.1798723611035e-18
    E_ion = np.zeros(L)
    for k in range(L):
        # ionization energy of the stage the line belongs to: energy gap
        # from line level to the next-stage minimum
        st = atom.stage[atom.line_i[k]]
        above = atom.E[atom.stage == st + 1]
        E_ion[k] = above.min() if above.size else ryd
    with np.errstate(divide="ignore", invalid="ignore"):
        nstar2_l = ryd / np.maximum(E_ion - atom.E[atom.line_i], 1e-30)
        nstar2_u = ryd / np.maximum(E_ion - atom.E[atom.line_j], 1e-30)
    z = atom.stage[atom.line_i] + 1.0
    r2_l = nstar2_l / (2.0 * z ** 2) * (5.0 * nstar2_l + 1.0)
    r2_u = nstar2_u / (2.0 * z ** 2) * (5.0 * nstar2_u + 1.0)
    dr2 = np.maximum(r2_u - r2_l, 0.0)
    # vrel for H perturbers
    mu = (atom.weight * 1.008) / (atom.weight + 1.008) * AMU_KG
    vrel = np.sqrt(8.0 * cst.kb * T / (np.pi * mu))  # (C,)
    # Gamma_vdW [rad/s] = 8.08 * vrel^0.6 * (C6[cm^6/s])^0.4 * nH[m^-3]
    # with the mixed-unit constant absorbed: use the standard cgs recipe
    # then convert: nH[cm^-3] = nH[m^-3] * 1e-6, Gamma stays 1/s.
    C6_cgs = 6.46e-34 * dr2                          # cm^6 / s
    g_vdw = (8.08 * (vrel[:, None] * 1e2) ** 0.6
             * C6_cgs[None, :] ** 0.4 * (nH1[:, None] * 1e-6))
    # per-line multiplier from the atom file (cvdW[0] scales the H term)
    g_vdw = g_vdw * atom.cvdW[None, :, 0]

    # ABO (Anstee-Barklem-O'Mara) broadening for lines marked BARKLEM
    # with (sigma[a0^2], alpha) in cvdW[0:2] (broad.f90:107-110 BARKLEM
    # branch; sigma > 20 distinguishes a cross-section from an Unsold
    # enhancement factor)
    if atom.vdw_method is not None:
        from .abo import abo_gamma_coeff
        is_abo = (np.char.startswith(atom.vdw_method.astype("U8"),
                                     "BARKLEM")
                  & (atom.cvdW[:, 0] > 20.0))
        if is_abo.any():
            K = abo_gamma_coeff(atom.cvdW[:, 0], atom.cvdW[:, 1],
                                atom.weight)
            g_abo = (K[None, :]
                     * T[:, None] ** (0.5 - 0.5 * atom.cvdW[None, :, 1])
                     * nH1[:, None])
            g_vdw = np.where(is_abo[None, :], g_abo, g_vdw)
    gamma = gamma + g_vdw

    # quadratic Stark: Gamma_S = cStark * ne, with the classical
    # T^(1/6) scaling when the file gives a positive coefficient
    # (broad.f90 Stark branch)
    cs = atom.cStark[None, :]
    g_stark = np.where(cs > 0,
                       cs * (ne[:, None] * 1e-6)
                       * (T[:, None] / 1e4) ** (1.0 / 6.0),
                       0.0)
    gamma = gamma + g_stark

    return gamma / (4.0 * np.pi * np.maximum(dnuD, 1e-30))
