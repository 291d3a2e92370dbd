// Native deformation-gradient extraction (ACAP GetRS equivalent).
//
// The reference ships a prebuilt native module (ACAP/pyACAPv1.zip, missing
// blob) called per edit frame on CPU threads (edittool/__init__.py:109).
// This is the same contract, reimplemented: per-vertex one-ring
// deformation gradient T = A B^{-1} between a reference and a deformed
// mesh, factored T = R S by a scaled Newton polar iteration. OpenMP over
// vertices. Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// The JAX implementation (gaussianmesh_tpu/edit/deform.py) is the on-TPU
// hot path; this native version serves host-side pipelines (mesh tooling,
// environments without an accelerator) and is kept numerically identical
// (same eps, same iteration) — tests assert parity with the JAX version.
//
// Build: ./build.sh  (g++ -O3 -fopenmp -shared)

#include <cmath>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct M3 {
  double m[9];  // row-major
};

inline M3 matmul(const M3& a, const M3& b) {
  M3 r{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a.m[i * 3 + k] * b.m[k * 3 + j];
      r.m[i * 3 + j] = s;
    }
  return r;
}

inline M3 transpose(const M3& a) {
  M3 r{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r.m[i * 3 + j] = a.m[j * 3 + i];
  return r;
}

inline double det3(const M3& a) {
  const double* m = a.m;
  return m[0] * (m[4] * m[8] - m[5] * m[7]) -
         m[1] * (m[3] * m[8] - m[5] * m[6]) +
         m[2] * (m[3] * m[7] - m[4] * m[6]);
}

inline bool inv3(const M3& a, M3* out, double eps = 1e-12) {
  const double* m = a.m;
  double d = det3(a);
  if (std::fabs(d) <= eps) return false;
  double id = 1.0 / d;
  out->m[0] = (m[4] * m[8] - m[5] * m[7]) * id;
  out->m[1] = (m[2] * m[7] - m[1] * m[8]) * id;
  out->m[2] = (m[1] * m[5] - m[2] * m[4]) * id;
  out->m[3] = (m[5] * m[6] - m[3] * m[8]) * id;
  out->m[4] = (m[0] * m[8] - m[2] * m[6]) * id;
  out->m[5] = (m[2] * m[3] - m[0] * m[5]) * id;
  out->m[6] = (m[3] * m[7] - m[4] * m[6]) * id;
  out->m[7] = (m[1] * m[6] - m[0] * m[7]) * id;
  out->m[8] = (m[0] * m[4] - m[1] * m[3]) * id;
  return true;
}

// Higham scaled-Newton polar factor; mirrors
// gaussianmesh_tpu.utils.maths.polar_decompose_rs (7 iterations).
inline void polar_rs(const M3& a, M3* r, M3* s, int iters = 7) {
  double da = det3(a);
  M3 x;
  bool ok = std::fabs(da) > 1e-9;
  if (!ok) {
    for (int i = 0; i < 9; ++i) x.m[i] = (i % 4 == 0) ? 1.0 : 0.0;
  } else {
    double sign = da < 0 ? -1.0 : 1.0;
    for (int i = 0; i < 9; ++i) x.m[i] = a.m[i] * sign;
  }
  for (int it = 0; it < iters; ++it) {
    M3 inv;
    double d = det3(x);
    if (!inv3(x, &inv)) break;
    double sc = std::pow(std::fabs(d), -1.0 / 3.0);
    sc = sc < 0.1 ? 0.1 : (sc > 10.0 ? 10.0 : sc);
    M3 invt = transpose(inv);
    for (int i = 0; i < 9; ++i)
      x.m[i] = 0.5 * (x.m[i] * sc + invt.m[i] / sc);
  }
  *r = x;
  M3 base = a;
  if (!ok) {
    for (int i = 0; i < 9; ++i) base.m[i] = (i % 4 == 0) ? 1.0 : 0.0;
  }
  M3 st = matmul(transpose(x), base);
  M3 stt = transpose(st);
  for (int i = 0; i < 9; ++i) s->m[i] = 0.5 * (st.m[i] + stt.m[i]);
}

}  // namespace

extern "C" {

// v_ref, v_def: (n, 3) float32; neighbors: (n, max_degree) int32;
// mask: (n, max_degree) uint8; R_out, S_out: (n, 9) float32 row-major.
void acap_get_rs(const float* v_ref, const float* v_def, int n_vertices,
                 const int* neighbors, const unsigned char* mask,
                 int max_degree, float* R_out, float* S_out,
                 int n_threads) {
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel for schedule(static)
#endif
  for (int v = 0; v < n_vertices; ++v) {
    double B[9] = {1e-8, 0, 0, 0, 1e-8, 0, 0, 0, 1e-8};
    double A[9] = {0};
    double ering_sq = 0.0;
    const float* pr = v_ref + 3 * v;
    const float* pd = v_def + 3 * v;
    for (int k = 0; k < max_degree; ++k) {
      if (!mask[v * max_degree + k]) continue;
      int j = neighbors[v * max_degree + k];
      double er[3] = {v_ref[3 * j] - pr[0], v_ref[3 * j + 1] - pr[1],
                      v_ref[3 * j + 2] - pr[2]};
      double ed[3] = {v_def[3 * j] - pd[0], v_def[3 * j + 1] - pd[1],
                      v_def[3 * j + 2] - pd[2]};
      for (int i = 0; i < 3; ++i)
        for (int jj = 0; jj < 3; ++jj) {
          B[i * 3 + jj] += er[i] * er[jj];
          A[i * 3 + jj] += ed[i] * er[jj];
        }
      ering_sq += er[0] * er[0] + er[1] * er[1] + er[2] * er[2];
    }
    M3 t;
    if (ering_sq > 1e-12) {
      M3 bm, am, binv;
      std::memcpy(bm.m, B, sizeof(B));
      std::memcpy(am.m, A, sizeof(A));
      inv3(bm, &binv);
      t = matmul(am, binv);
    } else {
      for (int i = 0; i < 9; ++i) t.m[i] = (i % 4 == 0) ? 1.0 : 0.0;
    }
    M3 r, s;
    polar_rs(t, &r, &s);
    for (int i = 0; i < 9; ++i) {
      R_out[v * 9 + i] = static_cast<float>(r.m[i]);
      S_out[v * 9 + i] = static_cast<float>(s.m[i]);
    }
  }
}

}  // extern "C"
