// Single-core CPU baseline for the Bellman TRM subproblem.
//
// This reimplements the reference's nested-loop dynamic program
// (HelpFunctions.jl:20-124) in portable C++ as a stand-in for "single-core
// Julia" when benchmarking the TPU path (the container has no Julia; Julia's
// devectorized loops compile to comparable machine code).  It is a baseline
// measurement tool, not part of the solve path.
//
// Usage: bellman_baseline <nt> <L> <M> <B> <iters>
// Prints: seconds-per-DP-build (best of iters) on stdout.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <limits>
#include <random>
#include <vector>

int main(int argc, char** argv) {
  if (argc < 6) {
    std::fprintf(stderr, "usage: %s nt L M B iters\n", argv[0]);
    return 1;
  }
  const int nt = std::atoi(argv[1]);
  const int L = std::atoi(argv[2]);
  const int M = std::atoi(argv[3]);
  const int B = std::atoi(argv[4]);
  const int iters = std::atoi(argv[5]);

  std::mt19937_64 rng(0);
  std::normal_distribution<double> gauss(0.0, 1.0);
  std::uniform_int_distribution<int> ulevel(0, L - 1);

  // Synthetic problem data in the same shape the DP consumes.
  std::vector<double> levels(L * M);
  for (int l = 0; l < L; ++l)
    for (int m = 0; m < M; ++m) levels[l * M + m] = (l + m) % 5 - 2;
  std::vector<double> grad(nt * M);
  for (auto& g : grad) g = gauss(rng);
  std::vector<double> u_old(nt * M);
  for (int i = 0; i < nt; ++i) {
    int l = ulevel(rng);
    for (int m = 0; m < M; ++m) u_old[i * M + m] = levels[l * M + m];
  }
  std::vector<double> jump(L * L);
  for (int l = 0; l < L; ++l)
    for (int j = 0; j < L; ++j) {
      double s = 0.0;
      for (int m = 0; m < M; ++m)
        s += std::abs(levels[j * M + m] - levels[l * M + m]);
      jump[l * L + j] = 1e-4 * s;
    }
  const double tau = 2.0 / nt;
  const double INF = std::numeric_limits<double>::infinity();

  // Tables: phi double-buffered over time parity, U argmin successors.
  std::vector<double> phi(2 * (B + 1) * L);
  std::vector<int32_t> U((size_t)(nt - 1) * (B + 1) * L);
  std::vector<double> stage(L), jrow(L);
  std::vector<int> btilde(L);

  double best = 1e300;
  double sink = 0.0;
  for (int it = 0; it < iters; ++it) {
    auto t0 = std::chrono::steady_clock::now();

    // Terminal layer i = nt-1 (exact-budget seed).
    double* cur = phi.data();
    double* nxt = phi.data() + (B + 1) * L;
    for (int k = 0; k < (B + 1) * L; ++k) cur[k] = INF;
    for (int l = 0; l < L; ++l) {
      double sc = 0.0;
      int b = 0;
      for (int m = 0; m < M; ++m) {
        sc += tau * grad[(nt - 1) * M + m] * levels[l * M + m];
        b += (int)std::lround(std::abs(levels[l * M + m] - u_old[(nt - 1) * M + m]));
      }
      if (b <= B) cur[b * L + l] = sc;
    }

    // Backward sweep.
    for (int i = nt - 2; i >= 0; --i) {
      for (int k = 0; k < (B + 1) * L; ++k) nxt[k] = INF;
      for (int l = 0; l < L; ++l) {
        double sc = 0.0;
        int bt = 0;
        for (int m = 0; m < M; ++m) {
          sc += tau * grad[i * M + m] * levels[l * M + m];
          bt += (int)std::lround(std::abs(levels[l * M + m] - u_old[i * M + m]));
        }
        int32_t* Ui = U.data() + ((size_t)i * (B + 1) + 0) * L;
        for (int j = 0; j < L; ++j) {
          const double c2 = sc + jump[l * L + j];
          for (int b = 0; b <= B - bt; ++b) {
            const double val = c2 + cur[b * L + j];
            double& slot = nxt[(b + bt) * L + l];
            if (slot > val) {
              slot = val;
              Ui[(b + bt) * L + l] = j;
            }
          }
        }
      }
      std::swap(cur, nxt);
    }
    for (int k = 0; k < (B + 1) * L; ++k)
      if (cur[k] < 1e290) sink += cur[k];

    double dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    if (dt < best) best = dt;
  }
  std::fprintf(stderr, "# sink=%g\n", sink);
  std::printf("%.9f\n", best);
  return 0;
}
