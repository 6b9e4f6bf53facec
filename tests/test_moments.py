"""Moment reconstruction of grain-size distributions (VERDICT r2 item 10;
reference reconstruct_from_moments.f90:39-240)."""
import math

import numpy as np

from mcfost_tpu.dust.moments import (gamma_func, gamma_func_moment,
                                     reconstruct_gamma_dist,
                                     size_distribution_from_moments)


def _moments_of(d_on_p, p, theta=2.0, beta=3.0):
    """Exact K_k moments of a generalized Gamma via the analytic ladder."""
    def ratio(a, b):
        return math.exp(math.lgamma(a) - math.lgamma(b))
    return np.array([beta * theta ** (k / 3.0)
                     * ratio(d_on_p + k / (3.0 * p), d_on_p)
                     for k in range(4)])


def test_moment_ladder_consistency():
    mu = _moments_of(2.0, 1.0)
    for k in range(4):
        got = gamma_func_moment(mu, 2.0, 1.0, k)
        assert np.isclose(got, mu[k], rtol=1e-10), (k, got, mu[k])


def test_reconstruct_roundtrip():
    """Moments generated from a known (d/p, p) must be recovered."""
    for d_on_p, p in [(2.0, 1.0), (1.5, 2.0), (3.0, 0.8)]:
        mu = _moments_of(d_on_p, p)
        lam, res, ierr = reconstruct_gamma_dist(mu)
        assert ierr in (1, 5)
        # the fitted distribution reproduces moments 2 and 3
        for k in (2, 3):
            got = gamma_func_moment(mu, lam[0], lam[1], k)
            assert abs(got / mu[k] - 1.0) < 0.12, (d_on_p, p, k, got, mu[k])


def test_size_distribution_integrates_to_moments():
    mu = _moments_of(2.0, 1.0, theta=1.5, beta=2.0)
    a = np.linspace(1e-4, 60.0, 20000)
    n = size_distribution_from_moments(mu, a)
    assert (n >= 0).all()
    k0 = np.trapezoid(n, a)
    k1 = np.trapezoid(n * a ** (1.0 / 3.0), a)
    assert abs(k0 / mu[0] - 1.0) < 0.05, (k0, mu[0])
    assert abs(k1 / mu[1] - 1.0) < 0.05, (k1, mu[1])


def test_degenerate_moments():
    lam, res, ierr = reconstruct_gamma_dist([0.0, 0.0, 0.0, 0.0])
    assert ierr == 1 and np.all(lam == 0.0)
