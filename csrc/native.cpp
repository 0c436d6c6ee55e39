// mixedfem_tpu native helpers (C++17, no external deps).
//
// The TPU compute path is JAX/XLA/Pallas; these are the host-side runtime
// pieces that the reference implements natively too: the uniform-grid
// broadphase pair generation (the reference uses ipc-toolkit's TBB
// broadphase, src/variables/mixed_collision.cpp:116-118) and a fast MEDIT
// .mesh parser (the reference uses libigl's readMESH). Exposed with a C ABI
// for ctypes; the Python side falls back to numpy when the library is not
// built.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmfem_native.so native.cpp

#include <cstdint>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

inline int64_t cell_key(const double* p, int dim, double inv_cell) {
  // pack up to 3 signed 21-bit cell coordinates into one int64
  int64_t key = 0;
  for (int k = 0; k < dim; ++k) {
    int64_t c = (int64_t)std::floor(p[k] * inv_cell);
    key = key * 2097152 + (c & 0x1FFFFF);
  }
  return key;
}

}  // namespace

extern "C" {

// All (i, j) pairs with P_i and Q_j in the same or adjacent grid cells.
// P: (np x dim), Q: (nq x dim) row-major doubles. Writes into out_i/out_j
// (capacity max_pairs). Returns the pair count, or -(needed) if the buffers
// are too small (caller retries with a bigger allocation).
long long grid_pairs(const double* P, long long np, const double* Q,
                     long long nq, int dim, double cell, long long* out_i,
                     long long* out_j, long long max_pairs) {
  const double inv_cell = 1.0 / cell;
  std::unordered_map<int64_t, std::vector<int64_t>> buckets;
  buckets.reserve((size_t)nq * 2);
  std::vector<int64_t> cq((size_t)nq * dim);
  for (long long j = 0; j < nq; ++j) {
    for (int k = 0; k < dim; ++k)
      cq[(size_t)j * dim + k] =
          (int64_t)std::floor(Q[(size_t)j * dim + k] * inv_cell);
    int64_t key = 0;
    for (int k = 0; k < dim; ++k) key = key * 2097152 + (cq[(size_t)j * dim + k] & 0x1FFFFF);
    buckets[key].push_back(j);
  }

  const int noff = (dim == 3) ? 27 : 9;
  long long count = 0;
  for (long long i = 0; i < np; ++i) {
    int64_t base[3] = {0, 0, 0};
    for (int k = 0; k < dim; ++k)
      base[k] = (int64_t)std::floor(P[(size_t)i * dim + k] * inv_cell);
    for (int o = 0; o < noff; ++o) {
      int64_t c[3];
      if (dim == 3) {
        c[0] = base[0] + (o % 3) - 1;
        c[1] = base[1] + ((o / 3) % 3) - 1;
        c[2] = base[2] + (o / 9) - 1;
      } else {
        c[0] = base[0] + (o % 3) - 1;
        c[1] = base[1] + (o / 3) - 1;
      }
      int64_t key = 0;
      for (int k = 0; k < dim; ++k) key = key * 2097152 + (c[k] & 0x1FFFFF);
      auto it = buckets.find(key);
      if (it == buckets.end()) continue;
      for (int64_t j : it->second) {
        if (count < max_pairs) {
          out_i[count] = i;
          out_j[count] = j;
        }
        ++count;
      }
    }
  }
  if (count > max_pairs) return -count;
  return count;
}

// Fast MEDIT .mesh parser: fills V (nv x 3 doubles) and T (nt x 4 int64,
// zero-based). Two-phase: call with V == nullptr to query (nv, nt).
long long parse_mesh(const char* path, double* V, long long* T,
                     long long* nv_out, long long* nt_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char word[256];
  long long nv = 0, nt = 0;
  double* vptr = V;
  long long* tptr = T;
  while (std::fscanf(f, "%255s", word) == 1) {
    if (std::strcmp(word, "Vertices") == 0) {
      if (std::fscanf(f, "%lld", &nv) != 1) break;
      if (V) {
        for (long long i = 0; i < nv; ++i) {
          double x, y, z, ref;
          if (std::fscanf(f, "%lf %lf %lf %lf", &x, &y, &z, &ref) != 4) break;
          *vptr++ = x;
          *vptr++ = y;
          *vptr++ = z;
        }
      } else {
        for (long long i = 0; i < nv * 4; ++i) {
          double d;
          if (std::fscanf(f, "%lf", &d) != 1) break;
        }
      }
    } else if (std::strcmp(word, "Tetrahedra") == 0) {
      if (std::fscanf(f, "%lld", &nt) != 1) break;
      if (T) {
        for (long long i = 0; i < nt; ++i) {
          long long a, b, c, d, ref;
          if (std::fscanf(f, "%lld %lld %lld %lld %lld", &a, &b, &c, &d,
                          &ref) != 5)
            break;
          *tptr++ = a - 1;
          *tptr++ = b - 1;
          *tptr++ = c - 1;
          *tptr++ = d - 1;
        }
      } else {
        for (long long i = 0; i < nt * 5; ++i) {
          long long v;
          if (std::fscanf(f, "%lld", &v) != 1) break;
        }
      }
    }
  }
  std::fclose(f);
  *nv_out = nv;
  *nt_out = nt;
  return 0;
}

// Incomplete Cholesky IC(0) on the LOWER-triangular CSR of an SPD matrix
// (the host-side analog of Eigen::IncompleteCholesky used by the
// reference's "eigen-pcg-IC" solver, linear_solver_factory.cpp:115-130).
// `indptr` (n+1) / `indices` (nnz, ascending per row, diagonal last in its
// row) give the pattern; `data` holds A's lower triangle on entry and L on
// exit (A ~= L L^T restricted to the pattern). Like Eigen's implementation,
// a diagonal shift sigma*max|diag| is applied and grown on pivot breakdown.
// Returns the shift used (>= 0), or -1.0 if factorization keeps breaking.
double ichol0(long long n, const long long* indptr,
              const long long* indices, double* data) {
  std::vector<double> a0(data, data + indptr[n]);
  double dmax = 0.0;
  for (long long i = 0; i < n; ++i) {
    double d = std::fabs(a0[indptr[i + 1] - 1]);
    if (d > dmax) dmax = d;
  }
  double sigma = 0.0;
  for (int attempt = 0; attempt < 12; ++attempt) {
    std::memcpy(data, a0.data(), sizeof(double) * (size_t)indptr[n]);
    if (sigma > 0.0)
      for (long long i = 0; i < n; ++i) data[indptr[i + 1] - 1] += sigma * dmax;
    bool ok = true;
    for (long long i = 0; i < n && ok; ++i) {
      const long long ri0 = indptr[i], ri1 = indptr[i + 1];
      if (ri1 <= ri0 || indices[ri1 - 1] != i) return -1.0;  // bad pattern
      for (long long p = ri0; p < ri1 - 1; ++p) {
        const long long k = indices[p];
        // sparse dot of L-rows i and k over columns < k
        double s = 0.0;
        long long pi = ri0, pk = indptr[k];
        const long long ki1 = indptr[k + 1] - 1;  // k's diagonal position
        while (pi < p && pk < ki1) {
          const long long ci = indices[pi], ck = indices[pk];
          if (ci == ck) { s += data[pi++] * data[pk++]; }
          else if (ci < ck) ++pi;
          else ++pk;
        }
        data[p] = (data[p] - s) / data[ki1];
      }
      double s = 0.0;
      for (long long p = ri0; p < ri1 - 1; ++p) s += data[p] * data[p];
      const double piv = data[ri1 - 1] - s;
      if (piv <= 0.0 || !std::isfinite(piv)) { ok = false; break; }
      data[ri1 - 1] = std::sqrt(piv);
    }
    if (ok) return sigma;
    sigma = (sigma == 0.0) ? 1e-3 : sigma * 10.0;
  }
  return -1.0;
}

// Apply the IC(0) preconditioner: x <- (L L^T)^{-1} x, with L the
// lower-triangular CSR factor from ichol0. Forward substitution in row
// order, then the L^T backward solve as a column sweep over L's rows.
void ichol_solve(long long n, const long long* indptr,
                 const long long* indices, const double* data, double* x) {
  for (long long i = 0; i < n; ++i) {
    double s = x[i];
    const long long r1 = indptr[i + 1] - 1;
    for (long long p = indptr[i]; p < r1; ++p) s -= data[p] * x[indices[p]];
    x[i] = s / data[r1];
  }
  for (long long i = n - 1; i >= 0; --i) {
    const long long r1 = indptr[i + 1] - 1;
    const double xi = x[i] / data[r1];
    x[i] = xi;
    for (long long p = indptr[i]; p < r1; ++p) x[indices[p]] -= data[p] * xi;
  }
}

}  // extern "C"
