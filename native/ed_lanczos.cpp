// Matrix-free Lanczos exact-diagonalization oracle for spin chains.
//
// Native test-oracle component: the Python dense oracles (ed/exact.py,
// ports of the reference tutorials' ED cells) are limited to N <= ~14 by
// the 4^N dense matrix; this C++ module computes ground-state energies up
// to N ~ 24 with O(2^N) memory via plain Lanczos iteration (no external
// LAPACK/BLAS dependency — the tridiagonal minimum eigenvalue is found by
// Sturm-sequence bisection).
//
// Conventions match the JAX package and the reference: basis state s in
// [0, 2^N), bit i of s = spin at site i (0=down, 1=up), z = 2*bit - 1.
//
//   TFIM (OBC):  H = -sum_i Jz_i z_i z_{i+1} - Bx sum_i x_i
//   J1J2:        H = sum_i J1 S_i.S_{i+1} + J2 S_i.S_{i+2} + Bz_i S^z_i
//                with the spin-exchange elements -J1/2 (Marshall) / +J1/2,
//                +J2/2 (cf. /root/reference/J1J2/TrainingRNN_J1J2.py:12-93).
//
// Exposed C ABI (ctypes):
//   int tfim1d_ground_energy(int n, double bx, const double* jz,
//                            int max_iter, double* out_energy);
//   int j1j2_ground_energy(int n, double j1, double j2, double bz,
//                          int periodic, int marshall, int max_iter,
//                          double* out_energy);
// Return 0 on success.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

namespace {

using std::size_t;

// Minimum eigenvalue of a symmetric tridiagonal matrix (diag a, offdiag b)
// via Sturm-sequence bisection.
double tridiag_min_eig(const std::vector<double>& a,
                       const std::vector<double>& b) {
  const int m = static_cast<int>(a.size());
  double lo = a[0], hi = a[0];
  for (int i = 0; i < m; ++i) {
    const double bl = i > 0 ? std::fabs(b[i - 1]) : 0.0;
    const double br = i < m - 1 ? std::fabs(b[i]) : 0.0;
    lo = std::min(lo, a[i] - bl - br);
    hi = std::max(hi, a[i] + bl + br);
  }
  // count of eigenvalues < x
  auto count_below = [&](double x) {
    int cnt = 0;
    double d = 1.0;
    for (int i = 0; i < m; ++i) {
      const double b2 = i > 0 ? b[i - 1] * b[i - 1] : 0.0;
      d = a[i] - x - (d != 0.0 ? b2 / d : b2 / 1e-300);
      if (d < 0.0) ++cnt;
    }
    return cnt;
  };
  for (int it = 0; it < 200 && hi - lo > 1e-13 * (1.0 + std::fabs(lo));
       ++it) {
    const double mid = 0.5 * (lo + hi);
    if (count_below(mid) >= 1) {
      hi = mid;
    } else {
      lo = mid;
    }
  }
  return 0.5 * (lo + hi);
}

// Plain Lanczos for the minimum eigenvalue of a symmetric operator given by
// `matvec(in, out)`.  No reorthogonalization — ghost eigenvalues duplicate
// converged extremes but do not move the minimum.
template <typename MatVec>
int lanczos_min_eig(size_t dim, MatVec matvec, int max_iter, double* out) {
  std::vector<double> v_prev(dim, 0.0), v(dim), w(dim);
  std::mt19937_64 rng(12345);
  std::uniform_real_distribution<double> u(-1.0, 1.0);
  double nrm = 0.0;
  for (size_t i = 0; i < dim; ++i) {
    v[i] = u(rng);
    nrm += v[i] * v[i];
  }
  nrm = std::sqrt(nrm);
  for (size_t i = 0; i < dim; ++i) v[i] /= nrm;

  std::vector<double> alpha, beta;
  double prev_min = 1e300;
  const int m = max_iter > 0 ? max_iter : 300;
  for (int k = 0; k < m; ++k) {
    matvec(v.data(), w.data());
    const double bk = beta.empty() ? 0.0 : beta.back();
    double ak = 0.0;
    for (size_t i = 0; i < dim; ++i) {
      w[i] -= bk * v_prev[i];
      ak += w[i] * v[i];
    }
    alpha.push_back(ak);
    double bnew = 0.0;
    for (size_t i = 0; i < dim; ++i) {
      w[i] -= ak * v[i];
      bnew += w[i] * w[i];
    }
    bnew = std::sqrt(bnew);
    // Krylov exhaustion (invariant subspace found): must bail BEFORE the
    // v[i] /= bnew below regardless of k, or tiny dimensions (dim <= 10)
    // divide by ~0 and poison the recurrence with inf/NaN.
    if (bnew < 1e-12) {
      *out = tridiag_min_eig(alpha, beta);
      return 0;
    }
    if (k >= 9 && k % 5 == 4) {
      const double cur = tridiag_min_eig(alpha, beta);
      if (std::fabs(cur - prev_min) < 1e-11 * (1.0 + std::fabs(cur))) {
        *out = cur;
        return 0;
      }
      prev_min = cur;
    }
    beta.push_back(bnew);
    v_prev.swap(v);
    v.swap(w);
    for (size_t i = 0; i < dim; ++i) v[i] /= bnew;
  }
  beta.pop_back();
  *out = tridiag_min_eig(alpha, beta);
  return 0;
}

}  // namespace

extern "C" {

int tfim1d_ground_energy(int n, double bx, const double* jz, int max_iter,
                         double* out_energy) {
  if (n < 2 || n > 28) return 1;
  const size_t dim = size_t{1} << n;
  std::vector<double> diag(dim);
  for (size_t s = 0; s < dim; ++s) {
    double d = 0.0;
    for (int i = 0; i < n - 1; ++i) {
      const double zi = (s >> i) & 1 ? 1.0 : -1.0;
      const double zj = (s >> (i + 1)) & 1 ? 1.0 : -1.0;
      d += -jz[i] * zi * zj;
    }
    diag[s] = d;
  }
  auto matvec = [&](const double* in, double* out) {
    for (size_t s = 0; s < dim; ++s) {
      double acc = diag[s] * in[s];
      for (int i = 0; i < n; ++i) acc += -bx * in[s ^ (size_t{1} << i)];
      out[s] = acc;
    }
  };
  return lanczos_min_eig(dim, matvec, max_iter, out_energy);
}

int tfim2d_ground_energy(int nx, int ny, double bx, double jz, int max_iter,
                         double* out_energy) {
  // 2D OBC lattice, flat index i = y*nx + x (matching ed/exact.py and the
  // snake/2DRNN sample layouts); H = -Jz sum_<ij> z_i z_j - Bx sum_i x_i.
  const int n = nx * ny;
  if (n < 2 || n > 28) return 1;
  const size_t dim = size_t{1} << n;
  std::vector<double> diag(dim);
  for (size_t s = 0; s < dim; ++s) {
    double d = 0.0;
    for (int y = 0; y < ny; ++y) {
      for (int x = 0; x < nx; ++x) {
        const int i = y * nx + x;
        const double zi = (s >> i) & 1 ? 1.0 : -1.0;
        if (x + 1 < nx) {
          const double zr = (s >> (i + 1)) & 1 ? 1.0 : -1.0;
          d += -jz * zi * zr;
        }
        if (y + 1 < ny) {
          const double zd = (s >> (i + nx)) & 1 ? 1.0 : -1.0;
          d += -jz * zi * zd;
        }
      }
    }
    diag[s] = d;
  }
  auto matvec = [&](const double* in, double* out) {
    for (size_t s = 0; s < dim; ++s) {
      double acc = diag[s] * in[s];
      for (int i = 0; i < n; ++i) acc += -bx * in[s ^ (size_t{1} << i)];
      out[s] = acc;
    }
  };
  return lanczos_min_eig(dim, matvec, max_iter, out_energy);
}

int j1j2_ground_energy(int n, double j1, double j2, double bz, int periodic,
                       int marshall, int max_iter, double* out_energy) {
  if (n < 3 || n > 28) return 1;
  const size_t dim = size_t{1} << n;
  const int lim1 = periodic ? n : n - 1;
  const int lim2 = periodic ? n : n - 2;
  const double el1 = marshall ? -j1 / 2.0 : j1 / 2.0;
  const double el2 = j2 / 2.0;

  std::vector<double> diag(dim);
  for (size_t s = 0; s < dim; ++s) {
    double d = 0.0;
    for (int i = 0; i < n; ++i) d += bz * (((s >> i) & 1) - 0.5);
    for (int i = 0; i < lim1; ++i) {
      const int j = (i + 1) % n;
      const bool eq = ((s >> i) & 1) == ((s >> j) & 1);
      d += eq ? 0.25 * j1 : -0.25 * j1;
    }
    if (j2 != 0.0) {
      for (int i = 0; i < lim2; ++i) {
        const int j = (i + 2) % n;
        const bool eq = ((s >> i) & 1) == ((s >> j) & 1);
        d += eq ? 0.25 * j2 : -0.25 * j2;
      }
    }
    diag[s] = d;
  }
  auto matvec = [&](const double* in, double* out) {
    for (size_t s = 0; s < dim; ++s) {
      double acc = diag[s] * in[s];
      for (int i = 0; i < lim1; ++i) {
        const int j = (i + 1) % n;
        if ((((s >> i) ^ (s >> j)) & 1) != 0) {
          acc += el1 * in[s ^ (size_t{1} << i) ^ (size_t{1} << j)];
        }
      }
      if (j2 != 0.0) {
        for (int i = 0; i < lim2; ++i) {
          const int j = (i + 2) % n;
          if ((((s >> i) ^ (s >> j)) & 1) != 0) {
            acc += el2 * in[s ^ (size_t{1} << i) ^ (size_t{1} << j)];
          }
        }
      }
      out[s] = acc;
    }
  };
  return lanczos_min_eig(dim, matvec, max_iter, out_energy);
}

}  // extern "C"
