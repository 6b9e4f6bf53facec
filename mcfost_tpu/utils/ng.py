"""Ng acceleration of fixed-point (lambda) iterations.

Same role as the reference's Ng_accelerate/Accelerate
(src/utils.f90:418-518), used by the molecular and atomic NLTE loops:
given the last N+2 iterates of a vector sequence x_k = F(x_{k-1}),
extrapolate the fixed point by the least-squares combination of the
last N residual differences (Ng 1974, order N=2 by default).
"""
from __future__ import annotations

import numpy as np


def ng_accelerate(history: list[np.ndarray], order: int = 2) -> np.ndarray:
    """history: iterates oldest..newest, each shape (...,); needs
    order+2 entries.  Returns the accelerated iterate (same shape)."""
    if len(history) < order + 2:
        raise ValueError(f"need {order + 2} iterates, got {len(history)}")
    xs = [h.reshape(-1).astype(np.float64) for h in history[-(order + 2):]]
    x_new = xs[-1]
    d_new = x_new - xs[-2]
    # residual-difference basis
    cols = []
    for k in range(order):
        dk = xs[-2 - k] - xs[-3 - k]
        cols.append(d_new - dk)
    A = np.stack(cols, axis=1)                      # (M, order)
    # weighted least squares, weights 1/|x| (relative residuals, as the
    # reference weights by 1/population)
    w = 1.0 / np.maximum(np.abs(x_new), 1e-300)
    Aw = A * w[:, None]
    M = Aw.T @ A
    b = Aw.T @ d_new
    try:
        c = np.linalg.solve(M + 1e-12 * np.eye(order) * np.trace(M), b)
    except np.linalg.LinAlgError:
        return history[-1]
    acc = x_new.copy()
    for k in range(order):
        acc = acc - c[k] * (x_new - xs[-2 - k])
    if not np.all(np.isfinite(acc)):
        return history[-1]
    return acc.reshape(history[-1].shape)
