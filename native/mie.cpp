// Fast batched Mie scattering (Bohren & Huffman algorithm), OpenMP parallel.
//
// Native table-builder for the dust layer: computes Qext, Qsca, g and the
// four independent Mueller elements S11/S12/S33/S34 on a regular scattering
// angle grid for a batch of (size parameter, refractive index) pairs.
// Same physics as the reference's bhmie (reference: src/scattering.f90:70-310)
// and the NumPy fallback in mcfost_tpu/dust/mie.py, written from the
// textbook recurrences (Bohren & Huffman 1983, App. A).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC mie.cpp -o libmie.so
//
// C ABI (ctypes): all arrays preallocated by the caller.
//   mie_batch_c(n_pairs, x[n], m_re[n], m_im[n], nang,
//               qext[n], qsca[n], gsca[n],
//               s11[n*nang], s12[n*nang], s33[n*nang], s34[n*nang])

#include <cmath>
#include <complex>
#include <cstdint>
#include <vector>

using cplx = std::complex<double>;

extern "C" int mie_batch_c(int64_t n_pairs, const double *x,
                           const double *m_re, const double *m_im, int nang,
                           double *qext, double *qsca, double *gsca,
                           double *s11, double *s12, double *s33,
                           double *s34) {
#pragma omp parallel for schedule(dynamic, 4)
  for (int64_t p = 0; p < n_pairs; ++p) {
    const double xp = x[p];
    const cplx m(m_re[p], m_im[p]);
    const cplx y = m * xp;
    const int nstop =
        std::max(1, (int)std::floor(xp + 4.0 * std::cbrt(xp) + 2.0));
    const int nmx = (int)(std::max((double)nstop, std::abs(y)) + 15);

    // logarithmic derivative D_n(y), downward recurrence
    std::vector<cplx> D((size_t)nstop + 1);
    cplx Dn = 0.0;
    for (int n = nmx; n >= 1; --n) {
      const cplx k = (double)n / y;
      Dn = k - 1.0 / (Dn + k);
      if (n - 1 <= nstop) D[(size_t)(n - 1)] = Dn;
    }

    // angle grid
    std::vector<double> mu((size_t)nang);
    const double dth = M_PI / (nang - 1);
    for (int a = 0; a < nang; ++a) mu[(size_t)a] = std::cos(a * dth);

    std::vector<cplx> S1((size_t)nang, 0.0), S2((size_t)nang, 0.0);
    std::vector<double> pi_nm1((size_t)nang, 0.0), pi_n((size_t)nang, 1.0);

    double qs = 0.0, qe = 0.0, gs = 0.0;
    cplx an_prev = 0.0, bn_prev = 0.0;

    double psi_nm2 = std::cos(xp), psi_nm1 = std::sin(xp);
    double chi_nm2 = -std::sin(xp), chi_nm1 = std::cos(xp);
    cplx xi_nm1(psi_nm1, -chi_nm1);
    const double inv_x = 1.0 / xp;

    for (int n = 1; n <= nstop; ++n) {
      const double en = n;
      const double psi = (2.0 * en - 1.0) * psi_nm1 * inv_x - psi_nm2;
      const double chi = (2.0 * en - 1.0) * chi_nm1 * inv_x - chi_nm2;
      const cplx xi(psi, -chi);

      const cplx Dv = D[(size_t)n];
      const cplx da = Dv / m + en * inv_x;
      const cplx db = Dv * m + en * inv_x;
      const cplx an = (da * psi - psi_nm1) / (da * xi - xi_nm1);
      const cplx bn = (db * psi - psi_nm1) / (db * xi - xi_nm1);

      const double f = 2.0 * en + 1.0;
      qs += f * (std::norm(an) + std::norm(bn));
      qe += f * (an.real() + bn.real());
      gs += (f / (en * (en + 1.0))) *
            (an.real() * bn.real() + an.imag() * bn.imag());
      if (n > 1)
        gs += ((en - 1.0) * (en + 1.0) / en) *
              (an_prev.real() * an.real() + an_prev.imag() * an.imag() +
               bn_prev.real() * bn.real() + bn_prev.imag() * bn.imag());

      const double fn = f / (en * (en + 1.0));
      const cplx fa = fn * an, fb = fn * bn;
      for (int a = 0; a < nang; ++a) {
        const double pin = pi_n[(size_t)a];
        const double tau = en * mu[(size_t)a] * pin -
                           (en + 1.0) * pi_nm1[(size_t)a];
        S1[(size_t)a] += fa * pin + fb * tau;
        S2[(size_t)a] += fa * tau + fb * pin;
        const double pi_np1 =
            ((2.0 * en + 1.0) * mu[(size_t)a] * pin -
             (en + 1.0) * pi_nm1[(size_t)a]) / en;
        pi_nm1[(size_t)a] = pin;
        pi_n[(size_t)a] = pi_np1;
      }

      psi_nm2 = psi_nm1; psi_nm1 = psi;
      chi_nm2 = chi_nm1; chi_nm1 = chi;
      xi_nm1 = xi;
      an_prev = an; bn_prev = bn;
    }

    const double x2 = xp * xp;
    qsca[p] = 2.0 / x2 * qs;
    qext[p] = 2.0 / x2 * qe;
    gsca[p] = qs > 0.0 ? 2.0 * gs / qs : 0.0;

    // Mueller elements, reference normalisation (scattering.f90:352-371)
    const double factor = 1.0 / (0.5 * x2);
    for (int a = 0; a < nang; ++a) {
      const double i1 = std::norm(S2[(size_t)a]);
      const double i2 = std::norm(S1[(size_t)a]);
      const cplx sc = S2[(size_t)a] * std::conj(S1[(size_t)a]);
      s11[p * nang + a] = 0.5 * (i1 + i2) * factor;
      s12[p * nang + a] = 0.5 * (i1 - i2) * factor;
      s33[p * nang + a] = sc.real() * factor;
      s34[p * nang + a] = sc.imag() * factor;
    }
  }
  return 0;
}
