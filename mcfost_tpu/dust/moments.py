"""Grain-size-distribution reconstruction from dust moments.

Phantom dumps with dust nucleation carry the first four moments
K0..K3 of the grain size distribution per particle; the reference fits a
generalized Gamma distribution to them (reconstruct_gamma_dist,
src/reconstruct_from_moments.f90:39-132, used by SPH2mcfost.f90:381)
with a MINPACK fsolve.  Here the 2x2 (or 1x1) nonlinear moment match is
solved by a damped Newton iteration with a numerical Jacobian — no
external solver needed.

Moment convention (same as the reference): mu(k) = K_k are moments of
a^(k/3) against the distribution, so theta is reconstructed with the
Gamma(d/p + k/(3p)) ladder.
"""
from __future__ import annotations

import math

import numpy as np


def _gamma_ratio(a: float, b: float) -> float:
    """Gamma(a)/Gamma(b) via lgamma (overflow-safe)."""
    return math.exp(math.lgamma(max(a, 1e-12)) - math.lgamma(max(b, 1e-12)))


def gamma_func(x, beta: float, theta: float, d_on_p: float, p: float):
    """Generalized Gamma distribution
    f(x) = beta p / Gamma(d/p) x^(d-1) theta^-d exp(-(x/theta)^p)
    (reference gamma_func, reconstruct_from_moments.f90:135-185)."""
    x = np.asarray(x, np.float64)
    d_on_p = abs(d_on_p)
    p = abs(p)
    d = d_on_p * p
    if beta <= 0.0 or theta <= 0.0:
        return np.zeros_like(x)
    expterm = np.exp(-np.clip((x / theta) ** p, 0.0, 600.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        out = (beta * p / math.gamma(min(d_on_p, 170.0)) * x ** (d - 1.0)
               * theta ** (-d) * expterm)
    return np.where(np.isfinite(out), out, 0.0)


def gamma_func_moment(mu, d_on_p: float, p: float, k: int) -> float:
    """Analytic k-th moment of the generalized Gamma distribution whose
    0th/1st moments are mu[0]/mu[1] (gamma_func_moment,
    reconstruct_from_moments.f90:211-240)."""
    d_on_p = abs(d_on_p)
    p = abs(p)
    theta = (mu[1] / mu[0]
             * _gamma_ratio(d_on_p, d_on_p + 1.0 / (3.0 * p))) ** 3
    ratio = _gamma_ratio(d_on_p + k / (3.0 * p), d_on_p)
    return mu[0] * theta ** (k / 3.0) * ratio


def _residual(mu, lam, n: int) -> np.ndarray:
    """r_k = moment(k+1)/mu[k+2] - 1 for k = 1..n (the reference matches
    moments 2 and 3 given 0 and 1)."""
    p = abs(lam[1]) if n > 1 else 1.0
    return np.array([gamma_func_moment(mu, lam[0], p, k + 1) / mu[k + 1]
                     - 1.0 for k in range(1, n + 1)])


def _newton(mu, lam0, n: int, tol: float = 1e-2, max_iter: int = 60):
    lam = np.asarray(lam0, np.float64).copy()
    r = _residual(mu, lam, n)
    for _ in range(max_iter):
        if np.abs(r).max() < tol:
            return lam, r, True
        J = np.zeros((n, n))
        for j in range(n):
            h = max(1e-6, 1e-6 * abs(lam[j]))
            lp = lam.copy()
            lp[j] += h
            J[:, j] = (_residual(mu, lp, n) - r) / h
        try:
            step = np.linalg.solve(J, -r)
        except np.linalg.LinAlgError:
            return lam, r, False
        # damped line search
        t = 1.0
        for _ in range(20):
            cand = lam.copy()
            cand[:n] = lam[:n] + t * step
            rc = _residual(mu, cand, n)
            if np.isfinite(rc).all() and np.abs(rc).max() < np.abs(r).max():
                lam, r = cand, rc
                break
            t *= 0.5
        else:
            return lam, r, False
    return lam, r, np.abs(r).max() < tol


def reconstruct_gamma_dist(mu, guess=None, verbose: bool = False):
    """Fit (d_on_p, p) so the generalized Gamma matches moments mu[2],
    mu[3] given mu[0], mu[1] (reconstruct_gamma_dist,
    reconstruct_from_moments.f90:39-132 incl. its fallback ladder).

    Returns (lambsol (2,), residuals (2,), ierr) with the reference's
    ierr convention: 1 = converged, 5 = gave up on K3 (1-parameter fit).
    """
    mu = np.asarray(mu, np.float64)
    if mu[0] <= 0.0:
        return np.zeros(2), np.zeros(2), 1

    guesses = [np.array(guess, np.float64)] if guess is not None else []
    guesses += [np.array([2.0, 0.5]), np.array([1.1, 2.0])]
    for g in guesses:
        lam, r, ok = _newton(mu, g, 2)
        lam = np.abs(lam)
        if ok and np.abs(r).max() <= 0.1 and lam[0] * lam[1] <= 30.0:
            return lam, r, 1

    # one-parameter fallback: fix p = 1 (the reference's "gave up on k_3")
    lam, r, ok = _newton(mu, np.array([1.5, 1.0]), 1)
    lam = np.abs(lam)
    lam[1] = 1.0
    r2 = np.array([r[0],
                   gamma_func_moment(mu, lam[0], 1.0, 3) / mu[3] - 1.0])
    return lam, r2, 5


def size_distribution_from_moments(mu, a_grid) -> np.ndarray:
    """n(a) on ``a_grid`` from the four moments (gamma_func_from_moments,
    reconstruct_from_moments.f90:188-207)."""
    mu = np.asarray(mu, np.float64)
    lam, _, _ = reconstruct_gamma_dist(mu)
    d_on_p, p = abs(lam[0]), abs(lam[1])
    theta = (mu[1] / mu[0]
             * _gamma_ratio(d_on_p, d_on_p + 1.0 / (3.0 * p))) ** 3
    return gamma_func(a_grid, mu[0], theta, d_on_p, p)
