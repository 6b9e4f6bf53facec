"""Independent 1D spherical NLTE reference solver for benchmark validation.

The published van Zadelhoff et al. (2002) benchmark curves cannot be
fetched in this offline environment, so the role they play — an
INDEPENDENT method agreeing within the inter-code spread (~10-15%) — is
filled by this from-scratch 1D discrete-ordinates ALI solver: impact-
parameter ray tracing on radial shells with Gauss-Legendre angle
quadrature and explicit frequency integration over the line profile,
iterated with a diagonal accelerated-Lambda operator.  It shares no code
or discretization with the production solver (transfer/mol_nlte.py:
cell-centred ray fans on the 2D/3D grids, staged MC iteration), so
agreement between the two is a genuine cross-method check, which
tests/test_benchmarks.py enforces quantitatively.

Physics identical to the benchmark spec (benchmarks.f90:293-316): 2-level
molecule, static spherical cloud, thermal+turbulent Doppler profile.
"""
from __future__ import annotations

import numpy as np

from .. import constants as cst


def solve_two_level_1d(r, n_h2, T, abundance, mol, vturb=150.0,
                       n_mu=16, n_nu=16, max_iter=200, tol=1e-6,
                       cmb: bool = True):
    """1D spherical 2-level NLTE: returns (pops (K, 2), tex (K,)).

    r: (K,) shell radii [AU] (cell centres, log-spaced); n_h2 (K,) [m^-3];
    T (K,) kinetic temperature; abundance: n_mol/n_H2; mol: a
    physics.molecules.MoleculeData with 1 transition; vturb [m/s].
    """
    K = len(r)
    r = np.asarray(r, np.float64)
    nu0 = float(mol.freq[0])
    Aul = float(mol.Aul[0])
    Bul = float(mol.Bul[0])
    Blu = float(mol.Blu[0])
    gu, gl = float(mol.g[1]), float(mol.g[0])
    dE = (mol.level_energy[1] - mol.level_energy[0]) * 1.602176634e-19

    # collision rates at T (downward), upward by detailed balance
    Cul = np.interp(T, mol.coll_temps, mol.coll_rates[0]) * 1e-6  # m^3/s
    Cul = Cul * n_h2                                              # 1/s
    Clu = Cul * (gu / gl) * np.exp(-dE / (cst.kb * T))

    n_mol = n_h2 * abundance
    # walls between shells (log-mid), extended to 0 and outer edge
    rw = np.zeros(K + 1)
    rw[1:-1] = np.sqrt(r[:-1] * r[1:])
    rw[0] = r[0] ** 2 / rw[1]
    rw[-1] = r[-1] ** 2 / rw[-2]

    # Doppler width and frequency quadrature (units of Doppler widths)
    mH = 1.007825 / 6.022140857e23 * 1e-3
    vth = np.sqrt(2.0 * cst.kb * T / (mol.weight * mH) + vturb ** 2)
    x, wx = np.polynomial.hermite.hermgauss(n_nu)   # int e^-x^2 f dx
    wx = wx / np.sqrt(np.pi)                        # sum wx = 1

    # impact parameters: one per wall + a few inside the core
    p_core = rw[0] * np.array([0.0, 0.3, 0.6, 0.9])
    p_all = np.concatenate([p_core, np.sqrt(rw[:-1] * rw[1:])])
    p_all.sort()

    # LTE start
    b = (gu / gl) * np.exp(-dE / (cst.kb * T))
    fu = b / (1.0 + b)
    pops = np.stack([n_mol * (1 - fu), n_mol * fu], 1)

    def emis_opac(pops):
        phi0 = cst.c_light / (vth * nu0 * np.sqrt(np.pi))   # peak [1/Hz]
        # per frequency point: phi = phi0 * e^{-x^2}; with hermgauss the
        # e^{-x^2} weight is in wx, so J_bar = sum wx J(x); the
        # opacity per point still needs its own profile value
        hnu4pi = cst.hp * nu0 / (4 * np.pi)
        chi0 = hnu4pi * (pops[:, 0] * Blu - pops[:, 1] * Bul) * phi0
        eta0 = hnu4pi * pops[:, 1] * Aul * phi0
        return np.maximum(chi0, 0.0), eta0

    xcmb = cst.hp * nu0 / (cst.kb * cst.T_Cmb)
    I_cmb = (2 * cst.hp * nu0 ** 3 / cst.c_light ** 2
             / np.expm1(min(xcmb, 300.0))) if cmb else 0.0
    n_ray = len(p_all)
    for it in range(max_iter):
        chi0, eta0 = emis_opac(pops)
        # chi0 in SI per metre: Blu [m^2/(J s)] * n [m^-3] * hnu/4pi [J]
        # * phi [1/Hz] -> [1/m]; path lengths below in AU -> convert
        chi0_au = chi0 * cst.AU_to_m
        eta0_au = eta0 * cst.AU_to_m
        # per (ray, shell): frequency-integrated intensity and local
        # 1-e^-tau (for the diagonal Lambda), averaged over the
        # inbound/outbound passes
        J_ray = np.full((n_ray, K), np.nan)
        L_ray = np.full((n_ray, K), np.nan)
        for ip, p in enumerate(p_all):
            ks = np.where(rw[1:] > p)[0]
            if ks.size == 0:
                continue
            zs = np.sqrt(np.maximum(rw[ks + 1] ** 2 - p * p, 0.0))
            z_in = np.sqrt(np.maximum(rw[ks] ** 2 - p * p, 0.0))
            ds = zs - z_in                   # (nk,) [AU]
            order = ks[::-1]                 # outside-in then inside-out
            seg = np.concatenate([order, order[::-1]])
            dseg = np.concatenate([ds[::-1], ds])
            Jacc = np.zeros(K)
            Lacc = np.zeros(K)
            cnt = np.zeros(K)
            for ix in range(n_nu):
                fprof = np.exp(-x[ix] ** 2)
                chi_seg = np.maximum(chi0_au[seg] * fprof, 1e-30)
                eta_seg = eta0_au[seg] * fprof
                S = eta_seg / chi_seg
                tau_seg = chi_seg * dseg
                I = I_cmb
                for j in range(len(seg)):
                    e = np.exp(-tau_seg[j])
                    I = I * e + S[j] * (1.0 - e)
                    k_here = seg[j]
                    Jacc[k_here] += wx[ix] * I
                    Lacc[k_here] += wx[ix] * (1.0 - e)
                    if ix == 0:
                        cnt[k_here] += 1.0
            hit = cnt > 0
            J_ray[ip, hit] = Jacc[hit] / cnt[hit]
            L_ray[ip, hit] = Lacc[hit] / cnt[hit]
        # angle quadrature per shell: rays with p < r_k sample
        # mu = sqrt(1-(p/r_k)^2); trapezoidal weights over mu in [0,1]
        Jbar = np.zeros(K)
        Lam = np.zeros(K)
        for k in range(K):
            sel = np.where(p_all < rw[k + 1])[0]
            sel = sel[np.isfinite(J_ray[sel, k])]
            if sel.size == 0:
                Jbar[k] = I_cmb
                continue
            mu = np.sqrt(np.maximum(
                1.0 - (p_all[sel] / max(r[k], p_all[sel].max() + 1e-30))
                ** 2, 0.0))
            o = np.argsort(mu)
            mu_s = mu[o]
            # trapezoid over [0, 1]
            edges_mu = np.concatenate([[0.0], 0.5 * (mu_s[1:] + mu_s[:-1]),
                                       [1.0]])
            wmu = np.diff(edges_mu)
            Jbar[k] = np.sum(wmu * J_ray[sel[o], k]) / wmu.sum()
            Lam[k] = np.sum(wmu * L_ray[sel[o], k]) / wmu.sum()
        Lam = np.clip(Lam, 0.0, 0.999)

        # ALI statistical equilibrium: rates with Jeff = Jbar - Lam*S
        chi0, eta0 = emis_opac(pops)
        S_line = np.where(chi0 > 0, eta0 / np.maximum(chi0, 1e-300), 0.0)
        Jeff = np.maximum(Jbar - Lam * S_line, 0.0)
        # 2-level SEE with the ALI-corrected radiative rates:
        # nl (Blu Jeff + Clu) = nu (Aul(1-Lam) + Bul Jeff + Cul)
        up = Blu * Jeff + Clu
        dn = Aul * (1.0 - Lam) + Bul * Jeff + Cul
        fu_new = up / np.maximum(up + dn, 1e-300)
        pops_new = np.stack([n_mol * (1 - fu_new), n_mol * fu_new], 1)
        diff = np.max(np.abs(pops_new - pops)
                      / np.maximum(pops[:, :1], 1e-300))
        pops = pops_new
        if diff < tol:
            break

    with np.errstate(divide="ignore"):
        ratio = (pops[:, 0] * gu) / np.maximum(pops[:, 1] * gl, 1e-300)
        tex = dE / (cst.kb * np.log(np.maximum(ratio, 1.0 + 1e-12)))
    return pops, tex
