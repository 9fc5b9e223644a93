// sug_tpu native point ops: farthest-point sampling + batched point-to-point
// ICP fitness for the OFFLINE splitter's host path.
//
// The online (training) FPS/ICP run as jitted jax on the device
// (ops/geometry.py, data/offline_splitter.py). The offline splitter is a
// preprocessing tool (reference dataset_splitter.py:31-84 runs open3d ICP on
// the host); these C++ kernels let it run at full host speed WITHOUT
// attaching to the TPU (on this dev box only one process may hold the chip,
// so a splitter run would otherwise block training). Multithreaded over
// clouds; FPS reproduces the jax implementation bit-exactly (same f32
// arithmetic order, same first-index argmax tie-break).
//
// Exposed through the same C ABI / ctypes binding as loader.cpp.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int n_workers(int64_t jobs) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 1;
  return (int)std::min<int64_t>(jobs, hw);
}

template <typename Fn>
void parallel_for(int64_t n, Fn fn) {
  int T = n_workers(n);
  if (T <= 1) {
    for (int64_t i = 0; i < n; i++) fn(i);
    return;
  }
  std::vector<std::thread> pool;
  for (int t = 0; t < T; t++) {
    pool.emplace_back([=] {
      for (int64_t i = t; i < n; i += T) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

// --------------------------------------------------------------------------
// 3x3 linear algebra for the Kabsch step (double internally; the f32 SVD of
// the jax path differs only at the 1e-6 level, far below the 0.15 inlier
// threshold the fitness is computed with)
// --------------------------------------------------------------------------

using Mat3 = double[3][3];

void mat_mul(const Mat3 a, const Mat3 b, Mat3 out) {
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += a[i][k] * b[k][j];
      out[i][j] = s;
    }
}

double det3(const Mat3 m) {
  return m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1]) -
         m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0]) +
         m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]);
}

// cyclic-Jacobi eigendecomposition of a symmetric 3x3: A = V diag(w) V^T
void sym_eig3(const Mat3 A, Mat3 V, double w[3]) {
  Mat3 a;
  std::memcpy(a, A, sizeof(Mat3));
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) V[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 50; sweep++) {
    double off = a[0][1] * a[0][1] + a[0][2] * a[0][2] + a[1][2] * a[1][2];
    if (off < 1e-30) break;
    for (int p = 0; p < 2; p++)
      for (int q = p + 1; q < 3; q++) {
        if (std::abs(a[p][q]) < 1e-300) continue;
        double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < 3; k++) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; k++) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; k++) {
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = c * vkp - s * vkq;
          V[k][q] = s * vkp + c * vkq;
        }
      }
  }
  for (int i = 0; i < 3; i++) w[i] = a[i][i];
  // sort descending (columns of V follow)
  for (int i = 0; i < 2; i++)
    for (int j = i + 1; j < 3; j++)
      if (w[j] > w[i]) {
        std::swap(w[i], w[j]);
        for (int k = 0; k < 3; k++) std::swap(V[k][i], V[k][j]);
      }
}

void cross(const double u[3], const double v[3], double out[3]) {
  out[0] = u[1] * v[2] - u[2] * v[1];
  out[1] = u[2] * v[0] - u[0] * v[2];
  out[2] = u[0] * v[1] - u[1] * v[0];
}

// Kabsch: rotation R minimizing ||R*src_c - dst_c|| from the 3x3 covariance
// H = src_c^T W dst_c (same convention as the jax path: H=U S V^T, then
// R = V diag(1,1,sign(det(V)det(U))) U^T).
void kabsch(const Mat3 H, Mat3 R) {
  Mat3 HtH;  // = V S^2 V^T
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += H[k][i] * H[k][j];
      HtH[i][j] = s;
    }
  Mat3 V;
  double w[3];
  sym_eig3(HtH, V, w);
  double s0 = std::sqrt(std::max(w[0], 0.0));
  if (s0 < 1e-12) {  // H ~ 0 (no inlier correspondences): no rotation
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) R[i][j] = (i == j) ? 1.0 : 0.0;
    return;
  }
  // U columns: u_i = H v_i / s_i; rebuild degenerate directions by cross
  // products (planar/linear correspondence sets)
  double U[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int col = 0; col < 3; col++) {
    double s = std::sqrt(std::max(w[col], 0.0));
    if (s > 1e-9 * (s0 > 0 ? s0 : 1.0)) {
      for (int i = 0; i < 3; i++) {
        double acc = 0;
        for (int k = 0; k < 3; k++) acc += H[i][k] * V[k][col];
        U[i][col] = acc / s;
      }
    } else if (col == 2) {
      double u0[3] = {U[0][0], U[1][0], U[2][0]};
      double u1[3] = {U[0][1], U[1][1], U[2][1]};
      double u2[3];
      cross(u0, u1, u2);
      for (int i = 0; i < 3; i++) U[i][2] = u2[i];
    } else {
      // rank<=1: any orthonormal completion
      double u0[3] = {U[0][0], U[1][0], U[2][0]};
      double e[3] = {0, 0, 0};
      e[std::abs(u0[0]) < 0.9 ? 0 : 1] = 1.0;
      double u1[3];
      cross(u0, e, u1);
      double n = std::sqrt(u1[0] * u1[0] + u1[1] * u1[1] + u1[2] * u1[2]);
      for (int i = 0; i < 3; i++) U[i][col] = u1[i] / (n > 0 ? n : 1.0);
    }
  }
  Mat3 Um;
  std::memcpy(Um, U, sizeof(Mat3));
  double sign = (det3(V) * det3(Um)) >= 0 ? 1.0 : -1.0;
  // R = V diag(1,1,sign) U^T
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      R[i][j] = V[i][0] * Um[j][0] + V[i][1] * Um[j][1] +
                sign * V[i][2] * Um[j][2];
}

}  // namespace

extern "C" {

// Farthest-point sampling over a batch of clouds.
//   pts:       (B, N, 3) f32
//   start_idx: (B,) i32 first centroid per cloud (NULL -> 0)
//   out_idx:   (B, npoint) i32
// Bit-exact vs ops/geometry.farthest_point_sample on the same inputs: the
// running min-distance is kept in f32, distances are computed in the same
// (x² then sum) f32 order, and argmax takes the FIRST maximum.
void sug_fps(const float* pts, int64_t B, int64_t N, int npoint,
             const int32_t* start_idx, int32_t* out_idx) {
  parallel_for(B, [&](int64_t b) {
    const float* p = pts + b * N * 3;
    int32_t* out = out_idx + (int64_t)b * npoint;
    std::vector<float> dists((size_t)N, 1e10f);
    int32_t far_i = start_idx ? start_idx[b] : 0;
    for (int i = 0; i < npoint; i++) {
      out[i] = far_i;
      const float cx = p[3 * far_i], cy = p[3 * far_i + 1], cz = p[3 * far_i + 2];
      float best = -1.0f;
      int32_t best_i = 0;
      for (int64_t n = 0; n < N; n++) {
        float dx = p[3 * n] - cx, dy = p[3 * n + 1] - cy, dz = p[3 * n + 2] - cz;
        float d = dx * dx + dy * dy + dz * dz;
        float m = dists[n] < d ? dists[n] : d;
        dists[n] = m;
        if (m > best) {  // strict: first index wins ties, like jnp.argmax
          best = m;
          best_i = (int32_t)n;
        }
      }
      far_i = best_i;
    }
  });
}

// Batched point-to-point ICP fitness (inlier fraction), mirroring
// data/offline_splitter._icp_fitness_batch: align `anchor` (P,3) onto each
// of `clouds` (M,P,3) with `iters` fixed Kabsch iterations (nearest-neighbor
// correspondences, inliers = nnd < max_corr), then return the final inlier
// fraction per cloud in out_fitness (M,).
void sug_icp_fitness(const float* anchor, const float* clouds, int64_t M,
                     int64_t P, int iters, float max_corr, float* out_fitness) {
  const double thr2 = (double)max_corr * (double)max_corr;
  parallel_for(M, [&](int64_t m) {
    const float* tgt = clouds + m * P * 3;
    std::vector<double> src((size_t)P * 3);
    for (int64_t i = 0; i < P * 3; i++) src[i] = anchor[i];
    std::vector<int32_t> nn((size_t)P);
    std::vector<double> nnd2((size_t)P);

    auto find_nn = [&] {
      for (int64_t i = 0; i < P; i++) {
        double bx = src[3 * i], by = src[3 * i + 1], bz = src[3 * i + 2];
        double best = 1e30;
        int32_t bi = 0;
        for (int64_t j = 0; j < P; j++) {
          double dx = bx - tgt[3 * j], dy = by - tgt[3 * j + 1],
                 dz = bz - tgt[3 * j + 2];
          double d = dx * dx + dy * dy + dz * dz;
          if (d < best) {
            best = d;
            bi = (int32_t)j;
          }
        }
        nn[i] = bi;
        nnd2[i] = best;
      }
    };

    for (int it = 0; it < iters; it++) {
      find_nn();
      // weighted centroids over inliers (w in {0,1}; wsum floored at 1
      // like the jax path)
      double ca[3] = {0, 0, 0}, cb[3] = {0, 0, 0}, wsum = 0;
      for (int64_t i = 0; i < P; i++) {
        if (nnd2[i] < thr2) {
          wsum += 1.0;
          for (int c = 0; c < 3; c++) {
            ca[c] += src[3 * i + c];
            cb[c] += tgt[3 * nn[i] + c];
          }
        }
      }
      double denom = wsum > 1.0 ? wsum : 1.0;
      for (int c = 0; c < 3; c++) {
        ca[c] /= denom;
        cb[c] /= denom;
      }
      Mat3 H = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
      for (int64_t i = 0; i < P; i++) {
        if (nnd2[i] >= thr2) continue;
        for (int r = 0; r < 3; r++)
          for (int c = 0; c < 3; c++)
            H[r][c] += (src[3 * i + r] - ca[r]) * (tgt[3 * nn[i] + c] - cb[c]);
      }
      Mat3 R;
      kabsch(H, R);
      double t[3];
      for (int r = 0; r < 3; r++)
        t[r] = cb[r] - (R[r][0] * ca[0] + R[r][1] * ca[1] + R[r][2] * ca[2]);
      for (int64_t i = 0; i < P; i++) {
        double x = src[3 * i], y = src[3 * i + 1], z = src[3 * i + 2];
        for (int r = 0; r < 3; r++)
          src[3 * i + r] = R[r][0] * x + R[r][1] * y + R[r][2] * z + t[r];
      }
    }
    find_nn();
    int64_t inl = 0;
    for (int64_t i = 0; i < P; i++)
      if (nnd2[i] < thr2) inl++;
    out_fitness[m] = (float)((double)inl / (double)P);
  });
}

}  // extern "C"
