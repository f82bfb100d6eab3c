// plkcore: native host-side numerical kernels for plancklens_tpu.
//
// C++/OpenMP equivalents of the reference's in-repo Fortran layer
// (reference: plancklens/wigners/wigners.f90, plancklens/n1/n1f.f90):
//   - Gauss-Legendre nodes/weights by vectorised Newton iteration (get_xgwg role)
//   - Wigner small-d synthesis/analysis via scaled Jacobi three-term recursions
//     (wignerpos / wignercoeff roles)
//
// These serve the host-side precompute paths (quadrature grids, recursion seeds) and the
// CPU fallback when no accelerator is present; the TPU compute path is the JAX/Pallas one.
// Exposed with a plain C ABI for ctypes binding (no pybind11 in this environment).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// P_n and P_n' at x by upward recursion.
inline void legendre_pn(int n, double x, double* pn, double* dpn) {
    double p0 = 1.0, p1 = x;
    for (int l = 2; l <= n; ++l) {
        double p2 = ((2.0 * l - 1.0) * x * p1 - (l - 1.0) * p0) / l;
        p0 = p1;
        p1 = p2;
    }
    *pn = p1;
    *dpn = n * (x * p1 - p0) / (x * x - 1.0);
}

}  // namespace

extern "C" {

// n-point Gauss-Legendre rule on (-1, 1); x ascending, w the weights.
// Newton iteration from the Tricomi initial guess; each node independent (OpenMP).
void plk_gauleg(int n, double* x, double* w) {
#pragma omp parallel for schedule(static)
    for (int k = 0; k < n; ++k) {
        double xk = std::cos(M_PI * (k + 0.75) / (n + 0.5));
        double pn = 0.0, dpn = 1.0;
        for (int it = 0; it < 100; ++it) {
            legendre_pn(n, xk, &pn, &dpn);
            double dx = pn / dpn;
            xk -= dx;
            if (std::abs(dx) < 1e-15) break;
        }
        legendre_pn(n, xk, &pn, &dpn);
        x[n - 1 - k] = xk;
        w[n - 1 - k] = 2.0 / ((1.0 - xk * xk) * dpn * dpn);
    }
}

// Wigner small-d synthesis: xi_i = sum_l cl_l (2l+1)/(4pi) d^l_{s1 s2}(x_i).
// Scaled-Jacobi three-term recursion per node, vectorised over nodes with OpenMP.
void plk_wignerpos(int nx, int lmax, const double* cl, const double* x,
                   int s1, int s2, double* xi) {
    const int a = std::abs(s1 - s2);
    const int b = std::abs(s1 + s2);
    const int l0 = (a + b) / 2;
    const double sgn = (s1 > s2 && ((s1 - s2) % 2)) ? -1.0 : 1.0;
    if (l0 > lmax) {
        std::memset(xi, 0, sizeof(double) * nx);
        return;
    }
    const int K = lmax - l0;
    // scaled-Jacobi recursion coefficients (match ops/wigner.py::_jacobi_rec_coeffs)
    std::vector<double> At(K > 1 ? K - 1 : 0), Bt(At.size()), Ct(At.size());
    {
        std::vector<double> rho(K + 2, 1.0);
        for (int k = 1; k <= K + 1; ++k)
            rho[k] = std::sqrt((double)k * (k + a + b) / ((double)(k + a) * (k + b)));
        for (int k = 1; k < K; ++k) {
            double tkab = 2.0 * k + a + b;
            double A = (tkab + 1.0) * (tkab + 2.0) / (2.0 * (k + 1.0) * (k + a + b + 1.0));
            double B = (tkab + 1.0) * ((double)a * a - (double)b * b)
                       / (2.0 * (k + 1.0) * (k + a + b + 1.0) * tkab);
            double C = (k + (double)a) * (k + (double)b) * (tkab + 2.0)
                       / ((k + 1.0) * (k + a + b + 1.0) * tkab);
            At[k - 1] = A * rho[k + 1];
            Bt[k - 1] = B * rho[k + 1];
            Ct[k - 1] = C * rho[k + 1] * rho[k];
        }
    }
    double lnr0 = 0.5 * (std::lgamma(a + b + 1.0) - std::lgamma(a + 1.0) - std::lgamma(b + 1.0));
    std::vector<double> clm(K + 1);
    for (int k = 0; k <= K; ++k)
        clm[k] = cl[l0 + k] * (2.0 * (l0 + k) + 1.0) / (4.0 * M_PI);

#pragma omp parallel for schedule(static)
    for (int i = 0; i < nx; ++i) {
        const double xv = x[i];
        // guard the 0 * log(0) = NaN at the poles x = +-1 (ops/wigner.py:110-114)
        double lnpref = lnr0;
        if (a > 0) lnpref += a * std::log(std::sqrt(0.5 * (1.0 - xv)));
        if (b > 0) lnpref += b * std::log(std::sqrt(0.5 * (1.0 + xv)));
        const double pref = sgn * std::exp(lnpref);
        double p0 = pref;
        double acc = clm[0] * p0;
        if (K >= 1) {
            double r1_over_r0 = std::sqrt((1.0 + a + b) / ((1.0 + a) * (1.0 + b)));
            double p1 = r1_over_r0 * ((a + 1.0) + 0.5 * (a + b + 2.0) * (xv - 1.0)) * pref;
            acc += clm[1] * p1;
            for (int k = 1; k < K; ++k) {
                double p2 = (At[k - 1] * xv + Bt[k - 1]) * p1 - Ct[k - 1] * p0;
                acc += clm[k + 1] * p2;
                p0 = p1;
                p1 = p2;
            }
        }
        xi[i] = acc;
    }
}

// Wigner small-d analysis: cl_l = 2 pi sum_i xi_i d^l_{s1 s2}(x_i), l = 0..lmax.
void plk_wignercoeff(int nx, int lmax, const double* xi, const double* x,
                     int s1, int s2, double* cl) {
    const int a = std::abs(s1 - s2);
    const int b = std::abs(s1 + s2);
    const int l0 = (a + b) / 2;
    const double sgn = (s1 > s2 && ((s1 - s2) % 2)) ? -1.0 : 1.0;
    std::memset(cl, 0, sizeof(double) * (lmax + 1));
    if (l0 > lmax) return;
    const int K = lmax - l0;
    std::vector<double> At(K > 1 ? K - 1 : 0), Bt(At.size()), Ct(At.size());
    {
        std::vector<double> rho(K + 2, 1.0);
        for (int k = 1; k <= K + 1; ++k)
            rho[k] = std::sqrt((double)k * (k + a + b) / ((double)(k + a) * (k + b)));
        for (int k = 1; k < K; ++k) {
            double tkab = 2.0 * k + a + b;
            double A = (tkab + 1.0) * (tkab + 2.0) / (2.0 * (k + 1.0) * (k + a + b + 1.0));
            double B = (tkab + 1.0) * ((double)a * a - (double)b * b)
                       / (2.0 * (k + 1.0) * (k + a + b + 1.0) * tkab);
            double C = (k + (double)a) * (k + (double)b) * (tkab + 2.0)
                       / ((k + 1.0) * (k + a + b + 1.0) * tkab);
            At[k - 1] = A * rho[k + 1];
            Bt[k - 1] = B * rho[k + 1];
            Ct[k - 1] = C * rho[k + 1] * rho[k];
        }
    }
    double lnr0 = 0.5 * (std::lgamma(a + b + 1.0) - std::lgamma(a + 1.0) - std::lgamma(b + 1.0));

#ifdef _OPENMP
    int nthreads = omp_get_max_threads();
#else
    int nthreads = 1;
#endif
    std::vector<double> partial((size_t)nthreads * (K + 1), 0.0);
#pragma omp parallel
    {
#ifdef _OPENMP
        double* acc = &partial[(size_t)omp_get_thread_num() * (K + 1)];
#else
        double* acc = partial.data();
#endif
#pragma omp for schedule(static)
        for (int i = 0; i < nx; ++i) {
            const double xv = x[i];
            const double w = 2.0 * M_PI * xi[i];
            // guard the 0 * log(0) = NaN at the poles x = +-1 (ops/wigner.py:110-114)
            double lnpref = lnr0;
            if (a > 0) lnpref += a * std::log(std::sqrt(0.5 * (1.0 - xv)));
            if (b > 0) lnpref += b * std::log(std::sqrt(0.5 * (1.0 + xv)));
            const double pref = sgn * std::exp(lnpref);
            double p0 = pref;
            acc[0] += w * p0;
            if (K >= 1) {
                double r1_over_r0 = std::sqrt((1.0 + a + b) / ((1.0 + a) * (1.0 + b)));
                double p1 = r1_over_r0 * ((a + 1.0) + 0.5 * (a + b + 2.0) * (xv - 1.0)) * pref;
                acc[1] += w * p1;
                for (int k = 1; k < K; ++k) {
                    double p2 = (At[k - 1] * xv + Bt[k - 1]) * p1 - Ct[k - 1] * p0;
                    acc[k + 1] += w * p2;
                    p0 = p1;
                    p1 = p2;
                }
            }
        }
    }
    for (int t = 0; t < nthreads; ++t)
        for (int k = 0; k <= K; ++k)
            cl[l0 + k] += partial[(size_t)t * (K + 1) + k];
}

int plk_version() { return 1; }

}  // extern "C"
