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
//   *_ground_state variants additionally fill a caller-allocated 2^N
//   eigenvector (two-pass Lanczos: replay the seeded Krylov recurrence,
//   accumulate x = sum_k y_k q_k) and its residual ||Hx - lambda x||.
//   For a DEGENERATE ground level the vector is one member of the
//   degenerate subspace (whichever the seeded start vector selects).
// Return 0 on success, 1 on invalid arguments, 2 on allocation
// failure (the work vectors are multi-GiB near the size cap), 3 on
// any other internal error.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>
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

// Ground eigenvector of a symmetric tridiagonal matrix by inverse
// iteration: solve (T - shift I) z = y with partial-pivot Gaussian
// elimination on the tridiagonal band (one superdiagonal of fill), shift
// a hair off the converged eigenvalue to keep the system nonsingular.
std::vector<double> tridiag_ground_vec(const std::vector<double>& a,
                                       const std::vector<double>& b,
                                       double lambda) {
  const int m = static_cast<int>(a.size());
  std::vector<double> y(m, 1.0 / std::sqrt(static_cast<double>(m)));
  const double shift = lambda - 1e-11 * (1.0 + std::fabs(lambda));
  for (int pass = 0; pass < 3; ++pass) {
    // band rows over columns (i, i+1, i+2): [d, e, f]; sub[i] is row i's
    // entry in column i-1 before elimination
    std::vector<double> d(m), e(m, 0.0), f(m, 0.0), sub(m, 0.0), r(y);
    for (int i = 0; i < m; ++i) d[i] = a[i] - shift;
    for (int i = 0; i + 1 < m; ++i) {
      e[i] = b[i];
      sub[i + 1] = b[i];
    }
    for (int i = 0; i + 1 < m; ++i) {
      if (std::fabs(sub[i + 1]) > std::fabs(d[i])) {
        std::swap(d[i], sub[i + 1]);
        std::swap(e[i], d[i + 1]);
        std::swap(f[i], e[i + 1]);
        std::swap(r[i], r[i + 1]);
      }
      const double piv = d[i] != 0.0 ? d[i] : 1e-300;
      const double factor = sub[i + 1] / piv;
      d[i + 1] -= factor * e[i];
      e[i + 1] -= factor * f[i];
      r[i + 1] -= factor * r[i];
    }
    for (int i = m - 1; i >= 0; --i) {
      double acc = r[i];
      if (i + 1 < m) acc -= e[i] * y[i + 1];
      if (i + 2 < m) acc -= f[i] * y[i + 2];
      y[i] = acc / (d[i] != 0.0 ? d[i] : 1e-300);
    }
    double nrm = 0.0;
    for (int i = 0; i < m; ++i) nrm += y[i] * y[i];
    nrm = std::sqrt(nrm);
    for (int i = 0; i < m; ++i) y[i] /= nrm;
  }
  return y;
}

// Plain Lanczos for the minimum eigenpair of a symmetric operator given by
// `matvec(in, out)`.  No reorthogonalization — ghost eigenvalues duplicate
// converged extremes but do not move the minimum.  When `out_vec` is
// non-null, a second pass regenerates the (deterministic, seeded) Krylov
// basis and accumulates the ground eigenvector x = sum_k y_k q_k; the
// replay reuses the recorded alpha/beta so the basis is bit-identical to
// pass 1.  `out_resid` (optional) receives ||H x - lambda x||.
template <typename MatVec>
int lanczos_ground(size_t dim, MatVec matvec, int max_iter, double* out,
                   double* out_vec = nullptr, double* out_resid = nullptr) {
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
  bool exhausted = false;
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
      exhausted = true;
      break;
    }
    if (k >= 9 && k % 5 == 4) {
      const double cur = tridiag_min_eig(alpha, beta);
      if (std::fabs(cur - prev_min) < 1e-11 * (1.0 + std::fabs(cur))) {
        exhausted = true;
        break;
      }
      prev_min = cur;
    }
    beta.push_back(bnew);
    v_prev.swap(v);
    v.swap(w);
    for (size_t i = 0; i < dim; ++i) v[i] /= bnew;
  }
  if (!exhausted && beta.size() == alpha.size()) beta.pop_back();
  const double lambda = tridiag_min_eig(alpha, beta);
  *out = lambda;
  if (out_vec == nullptr) return 0;

  // --- pass 2: replay the recurrence, accumulate x = sum_k y_k q_k ------
  const std::vector<double> y = tridiag_ground_vec(alpha, beta, lambda);
  const int steps = static_cast<int>(alpha.size());
  std::fill(v_prev.begin(), v_prev.end(), 0.0);
  std::mt19937_64 rng2(12345);
  nrm = 0.0;
  for (size_t i = 0; i < dim; ++i) {
    v[i] = u(rng2);
    nrm += v[i] * v[i];
  }
  nrm = std::sqrt(nrm);
  for (size_t i = 0; i < dim; ++i) v[i] /= nrm;

  std::vector<double> x(dim, 0.0);
  for (int k = 0; k < steps; ++k) {
    const double yk = y[k];
    for (size_t i = 0; i < dim; ++i) x[i] += yk * v[i];
    if (k + 1 >= steps) break;
    matvec(v.data(), w.data());
    const double bk = k > 0 ? beta[k - 1] : 0.0;
    for (size_t i = 0; i < dim; ++i) w[i] -= bk * v_prev[i];
    const double ak = alpha[k];
    const double bnew = beta[k];
    for (size_t i = 0; i < dim; ++i) w[i] -= ak * v[i];
    v_prev.swap(v);
    v.swap(w);
    for (size_t i = 0; i < dim; ++i) v[i] /= bnew;
  }
  // normalize (lost orthogonality can leave ||x|| slightly off 1)
  nrm = 0.0;
  for (size_t i = 0; i < dim; ++i) nrm += x[i] * x[i];
  nrm = std::sqrt(nrm);
  if (nrm < 1e-300) return 2;
  for (size_t i = 0; i < dim; ++i) x[i] /= nrm;

  if (out_resid != nullptr) {
    matvec(x.data(), w.data());
    double r2 = 0.0;
    for (size_t i = 0; i < dim; ++i) {
      const double ri = w[i] - lambda * x[i];
      r2 += ri * ri;
    }
    *out_resid = std::sqrt(r2);
  }
  std::memcpy(out_vec, x.data(), dim * sizeof(double));
  return 0;
}

}  // namespace

namespace {

int tfim1d_impl(int n, double bx, const double* jz, int max_iter,
                double* out_energy, double* out_vec, double* out_resid) {
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
  return lanczos_ground(dim, matvec, max_iter, out_energy, out_vec,
                        out_resid);
}

int tfim2d_impl(int nx, int ny, double bx, double jz,
                             int max_iter, double* out_energy,
                             double* out_vec, double* out_resid) {
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
  return lanczos_ground(dim, matvec, max_iter, out_energy, out_vec,
                        out_resid);
}

int j1j2_impl(int n, double j1, double j2, double bz,
                           int periodic, int marshall, int max_iter,
                           double* out_energy, double* out_vec,
                           double* out_resid) {
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
  return lanczos_ground(dim, matvec, max_iter, out_energy, out_vec,
                        out_resid);
}

// The work vectors are multi-GiB near the n <= 28 cap; an allocation
// failure must come back through the C ABI as a return code, not an
// exception crossing the language boundary (std::terminate).
template <typename Fn>
int guarded(Fn fn) {
  try {
    return fn();
  } catch (const std::bad_alloc&) {
    return 2;  // out of memory
  } catch (...) {
    return 3;
  }
}

}  // namespace

extern "C" {

int tfim1d_ground_energy(int n, double bx, const double* jz, int max_iter,
                         double* out_energy) {
  return guarded([&] {
    return tfim1d_impl(n, bx, jz, max_iter, out_energy, nullptr, nullptr);
  });
}

// Two-pass Lanczos ground STATE: fills out_vec (caller-allocated, 2^n
// doubles, ed/exact.py basis order) and out_resid = ||H x - lambda x||.
int tfim1d_ground_state(int n, double bx, const double* jz, int max_iter,
                        double* out_energy, double* out_vec,
                        double* out_resid) {
  return guarded([&] {
    return tfim1d_impl(n, bx, jz, max_iter, out_energy, out_vec, out_resid);
  });
}

int tfim2d_ground_energy(int nx, int ny, double bx, double jz, int max_iter,
                         double* out_energy) {
  return guarded([&] {
    return tfim2d_impl(nx, ny, bx, jz, max_iter, out_energy,
                                  nullptr, nullptr);
  });
}

int tfim2d_ground_state(int nx, int ny, double bx, double jz, int max_iter,
                        double* out_energy, double* out_vec,
                        double* out_resid) {
  return guarded([&] {
    return tfim2d_impl(nx, ny, bx, jz, max_iter, out_energy,
                                  out_vec, out_resid);
  });
}

int j1j2_ground_energy(int n, double j1, double j2, double bz, int periodic,
                       int marshall, int max_iter, double* out_energy) {
  return guarded([&] {
    return j1j2_impl(n, j1, j2, bz, periodic, marshall, max_iter,
                                out_energy, nullptr, nullptr);
  });
}

int j1j2_ground_state(int n, double j1, double j2, double bz, int periodic,
                      int marshall, int max_iter, double* out_energy,
                      double* out_vec, double* out_resid) {
  return guarded([&] {
    return j1j2_impl(n, j1, j2, bz, periodic, marshall, max_iter,
                                out_energy, out_vec, out_resid);
  });
}

}  // extern "C"
