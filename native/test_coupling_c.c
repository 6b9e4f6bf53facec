/* Round-trip test of the C-ABI live coupling (VERDICT r4 next #8):
 * generate a particle disk in C, init from a para file, run the thermal
 * MC, and sanity-check the returned per-particle temperatures and
 * Planck-mean opacities.  Exit 0 on success. */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

extern int mcfost_write_default_para(const char *path);
extern int mcfost_init(const char *para_path, long n_packets);
extern long mcfost_run_phantom(int n_part, const double *xyz,
                               const double *h, const double *mass_g,
                               int n_star, const double *star_xyz,
                               const double *star_mass_msun,
                               const double *dudt_w, double *t_out_k);
extern int mcfost_diffusion_opacity(int n_part, const double *t_k,
                                    double *kappa_out);
extern void mcfost_finalize(void);

int main(void)
{
    const int n = 400;
    double *xyz = malloc(3 * n * sizeof(double));
    double *h = malloc(n * sizeof(double));
    double *mass = malloc(n * sizeof(double));
    double *T = malloc(n * sizeof(double));
    double *kap = malloc(n * sizeof(double));
    double star_xyz[3] = {0.0, 0.0, 0.0};
    double star_mass[1] = {1.0};
    srand(7);
    for (int i = 0; i < n; i++) {
        double r = 5.0 * exp(((double)rand() / RAND_MAX)
                             * log(80.0 / 5.0));
        double phi = 2.0 * M_PI * (double)rand() / RAND_MAX;
        double z = 0.05 * r
            * (((double)rand() / RAND_MAX) * 2.0 - 1.0);
        xyz[3 * i + 0] = r * cos(phi);
        xyz[3 * i + 1] = r * sin(phi);
        xyz[3 * i + 2] = z;
        h[i] = 2.0;
        mass[i] = 1e-4 * 1.989e33 / n;     /* 1e-4 Msun of gas [g] */
        T[i] = 0.0;
    }

    if (mcfost_write_default_para("/tmp/coupling_c.para") != 0)
        return 10;
    if (mcfost_init("/tmp/coupling_c.para", 4000) != 0)
        return 11;
    long n_used = mcfost_run_phantom(n, xyz, h, mass, 1, star_xyz,
                                     star_mass, NULL, T);
    if (n_used < 4000) {
        fprintf(stderr, "run failed: n_used=%ld\n", n_used);
        return 12;
    }
    int warm = 0;
    for (int i = 0; i < n; i++) {
        if (!(T[i] > 0.0 && T[i] < 3000.0)) {
            fprintf(stderr, "bad T[%d]=%f\n", i, T[i]);
            return 13;
        }
        if (T[i] > 2.74)
            warm++;
    }
    if (warm < n * 3 / 4) {
        fprintf(stderr, "too few heated particles: %d\n", warm);
        return 14;
    }
    if (mcfost_diffusion_opacity(n, T, kap) != 0)
        return 15;
    int kpos = 0;
    for (int i = 0; i < n; i++) {
        if (!(kap[i] >= 0.0 && isfinite(kap[i])))
            return 16;
        if (kap[i] > 0.0)
            kpos++;
    }
    if (kpos < n / 2)
        return 17;
    printf("coupling_c ok: n_used=%ld warm=%d/%d kappa>0=%d\n",
           n_used, warm, n, kpos);
    mcfost_finalize();
    return 0;
}
