"""Vectorized sampling primitives for the MC transport kernel.

All functions are pure jnp ops over packet batches:

* ``bisect_cdf``: batched inverse-CDF lookup via explicit log2(N) bisection
  with scalar gathers (cheap on TPU; avoids materialising whole CDF rows per
  packet).  Replaces the reference's per-packet dichotomies
  (select_wl_em thermal_emission.f90:364-400, angle_diff_theta
  scattering.f90:1387-1429, im_reemission_LTE:739-765).
* direction updates: ``cdapres`` (scattering frame rotation, reference
  utils.f90:1636-1688), ``rotation`` (utils.f90:553-599) and the Stokes
  update (scattering.f90:1187-1298).
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


def bisect_cdf(get: Callable, n: int, rand: jax.Array) -> jax.Array:
    """Generic batched bisection: smallest k in [1, n] with cdf(k) >= rand,
    assuming cdf(0)=0 and cdf(n)=1.  ``get(k)`` must accept an int32 array of
    indices (batch shape) and return cdf values at those indices."""
    lo = jnp.zeros_like(rand, dtype=jnp.int32)
    hi = jnp.full_like(lo, n)
    for _ in range(int(math.ceil(math.log2(max(n, 2)))) + 1):
        mid = (lo + hi) // 2
        v = get(mid)
        go_up = v < rand
        lo = jnp.where(go_up & (mid > lo), mid, lo)
        hi = jnp.where(go_up, hi, jnp.minimum(mid, hi))
    return jnp.maximum(hi, 1)


def isotropic_direction(r1, r2):
    """Uniform direction on the sphere (reference random_numbers.f90:33-53)."""
    w = 2.0 * r1 - 1.0
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    phi = jnp.pi * (2.0 * r2 - 1.0)
    return s * jnp.cos(phi), s * jnp.sin(phi), w


def cdapres(cospsi, phi, u0, v0, w0):
    """Direction cosines after scattering by angle (psi, phi) about (u0,v0,w0)
    (reference utils.f90:1636-1688)."""
    cpsi = cospsi
    spsi = jnp.sqrt(jnp.maximum(1.0 - cpsi * cpsi, 0.0))
    a = spsi * jnp.cos(phi)
    b = spsi * jnp.sin(phi)
    near_pole = jnp.abs(w0) > 0.999999
    c = jnp.sqrt(jnp.maximum(1.0 - w0 * w0, 1e-12))
    cm1 = 1.0 / c
    aw0 = a * w0
    u1 = (aw0 * u0 - b * v0) * cm1 + cpsi * u0
    v1 = (aw0 * v0 + b * u0) * cm1 + cpsi * v0
    w1 = cpsi * w0 - a * c
    u1 = jnp.where(near_pole, a, u1)
    v1 = jnp.where(near_pole, b, v1)
    w1 = jnp.where(near_pole, cpsi * jnp.sign(w0), w1)
    # renormalise to kill float32 drift
    norm = jax.lax.rsqrt(u1 * u1 + v1 * v1 + w1 * w1)
    return u1 * norm, v1 * norm, w1 * norm


def rotation_to_frame(xi, yi, zi, u1, v1, w1):
    """Rotate vector (xi,yi,zi) into the frame where (u1,v1,w1) -> (1,0,0)
    (reference utils.f90:553-599)."""
    near_pole = w1 > 0.999999999
    tiny = jnp.abs(u1) < 1e-30
    theta = jnp.arctan2(v1, jnp.where(tiny, 1.0, u1))
    cost = jnp.where(tiny, 0.0, jnp.cos(theta))
    sint = jnp.where(tiny, 1.0, jnp.sin(theta))
    sing = jnp.sqrt(jnp.maximum(1.0 - w1 * w1, 0.0))
    cost = jnp.where(near_pole, 1.0, cost)
    sint = jnp.where(near_pole, 0.0, sint)
    sing = jnp.where(near_pole, 0.0, sing)
    prod = cost * xi + sint * yi
    xf = sing * prod + w1 * zi
    yf = cost * yi - sint * xi
    zf = sing * zi - w1 * prod
    return xf, yf, zf


def update_stokes(I, Q, U, V, u0, v0, w0, u1, v1, w1,
                  m11, m12, m33, m34):
    """Stokes vector update on scattering (reference update_Stokes,
    scattering.f90:1187-1298), vectorized.

    The Mueller matrix is block-diagonal (Mie spheres): diag(m11, m22=m11*?,
    ...) — here we take s22=s11 and s44=s33 as the reference does for Mie
    (scattering.f90:371-372), with elements already normalised to s11=1.
    Returns the renormalised Stokes so the packet keeps its energy
    (scattering.f90:1291-1294)."""
    v1pi, v1pj, v1pk = rotation_to_frame(u0, v0, w0, u1, v1, w1)
    xnyp = jnp.sqrt(jnp.maximum(v1pk * v1pk + v1pj * v1pj, 0.0))
    costhet = jnp.where(xnyp < 1e-10, 1.0, -v1pj / jnp.maximum(xnyp, 1e-30))
    theta = jnp.arccos(jnp.clip(costhet, -1.0, 1.0))
    theta = jnp.where(theta >= jnp.pi, 0.0, theta)
    omega = 2.0 * (theta + 0.5 * jnp.pi)
    omega = jnp.where(v1pk < 0.0, -omega, omega)
    cosw = jnp.cos(omega)
    sinw = jnp.sin(omega)

    # S' = RPO * M * ROP * S with rotation matrices about the beam
    # ROP: Q' = cosw*Q - sinw*U ; U' = sinw*Q + cosw*U
    q1 = cosw * Q - sinw * U
    u1s = sinw * Q + cosw * U
    # M (s11=1): I2 = I + m12 q1 ; Q2 = m12 I + q1 ; U2 = m33 u1s + m34 V
    # V2 = -m34 u1s + m33 V   (M(3,4)=-s34, M(4,3)=+s34 per reference
    # get_Mueller_matrix_per_grain, scattering.f90:1313-1320)
    I2 = m11 * I + m12 * q1
    Q2 = m12 * I + m11 * q1
    U2 = m33 * u1s - m34 * V
    V2 = m34 * u1s + m33 * V
    # RPO: Q'' = cosw*Q2 + sinw*U2 ; U'' = -sinw*Q2 + cosw*U2
    Q3 = cosw * Q2 + sinw * U2
    U3 = -sinw * Q2 + cosw * U2
    # energy renormalisation (packet leaves with the energy it came with,
    # times the phase-function weight m11 which is 1 here)
    scale = jnp.where(I2 > 1e-30, m11 * I / jnp.maximum(I2, 1e-30), 1.0)
    return I2 * scale, Q3 * scale, U3 * scale, V2 * scale
