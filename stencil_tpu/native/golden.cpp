// Native golden-model verifier.
//
// C++ twin of stencil_tpu/ops/golden.py — the independent float64 naive
// implementation used for differential checking (the analog of the
// reference's host-side verifier, /root/reference/src/stencil/stencil.cpp:75-151,
// which is also plain C++ on the MPE). The Python golden model is the
// definition of correctness; this implementation exists so that large-grid
// checks (4096^2 x hundreds of sweeps) run at native speed. It is loaded
// via ctypes (stencil_tpu/native/__init__.py) and cross-checked against the
// NumPy implementation in tests.
//
// Semantics (must match ops/golden.py exactly):
//   - arrays are padded by `radius` ghost layers per side, C order
//   - ghost cells hold per-dimension Dirichlet face values; faces are
//     filled in increasing dimension order, so the highest dimension wins
//     in corner regions (core/grid.py fill order)
//   - dynamic dims (per-dim mode mask: 0=Dirichlet, 1=periodic,
//     2=Neumann) refresh instead: periodic ghost slabs are re-copied
//     from the opposite interior band, Neumann ghost slabs mirror the
//     face-adjacent interior band (zero-flux reflection), after EVERY
//     sweep, in increasing dim order spanning the full extent of the
//     other dims (core/grid.py refresh_dynamic / refresh_dynamic_np)
//   - each sweep: out[p] = sum_k w_k * in[p + off_k] over the interior,
//     accumulated in tap order; uniform-weight specs accumulate the taps
//     first and apply a single final multiply (reference arithmetic,
//     stencil.cpp:85-125)
//   - sweeps ping-pong between two padded buffers

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Geometry {
  int ndim;
  int radius;
  std::vector<int64_t> interior;   // interior extents
  std::vector<int64_t> padded;     // interior + 2*radius
  std::vector<int64_t> stride;     // C-order strides of padded
  int64_t padded_size;
};

Geometry make_geometry(const int64_t* shape, int ndim, int radius) {
  Geometry g;
  g.ndim = ndim;
  g.radius = radius;
  g.interior.assign(shape, shape + ndim);
  g.padded.resize(ndim);
  for (int d = 0; d < ndim; ++d) g.padded[d] = shape[d] + 2 * radius;
  g.stride.assign(ndim, 1);
  for (int d = ndim - 2; d >= 0; --d)
    g.stride[d] = g.stride[d + 1] * g.padded[d + 1];
  g.padded_size = g.stride[0] * g.padded[0];
  return g;
}

// Refresh the ghost slabs of dynamic dims: periodic (mode 1) wrap-copies
// from the opposite interior bands, Neumann (mode 2) mirror-copies the
// face-adjacent interior bands (ghost layer j = interior layer j-1,
// symmetric reflection). Increasing dim order, full extent of the other
// dims (so corner regions become the doubly-wrapped/mirrored values
// transitively). Runs after every sweep — ghosts must hold data derived
// from the CURRENT iterate.
void dynamic_fill(double* buf, const Geometry& g, const int32_t* modes) {
  if (!modes) return;
  const int r = g.radius;
  for (int d = 0; d < g.ndim; ++d) {
    if (!modes[d]) continue;
    const int64_t n = g.interior[d];
    const int64_t inner = g.stride[d];           // contiguous run length
    const int64_t span = g.padded[d] * inner;    // dim-d block size
    const int64_t outer = g.padded_size / span;
    const bool mirror = modes[d] == 2;
    for (int64_t o = 0; o < outer; ++o) {
      for (int64_t gd = 0; gd < r; ++gd) {
        double* lo_dst = buf + o * span + gd * inner;
        const double* lo_src = mirror
            ? buf + o * span + (2 * r - 1 - gd) * inner
            : lo_dst + n * inner;
        std::memcpy(lo_dst, lo_src, inner * sizeof(double));
        double* hi_dst = buf + o * span + (n + r + gd) * inner;
        const double* hi_src = mirror
            ? buf + o * span + (n + r - 1 - gd) * inner
            : hi_dst - n * inner;
        std::memcpy(hi_dst, hi_src, inner * sizeof(double));
      }
    }
  }
}

// Fill ghost faces of non-dynamic dims: increasing dim order, later
// dims overwrite corners.
void fill_bc(double* buf, const Geometry& g, const double* bc /* ndim*2 */,
             const int32_t* modes) {
  const int r = g.radius;
  for (int d = 0; d < g.ndim; ++d) {
    if (modes && modes[d]) continue;
    const double lo = bc[2 * d], hi = bc[2 * d + 1];
    // iterate all padded indices with index[d] < r (lo) or >= padded-r (hi)
    std::vector<int64_t> idx(g.ndim, 0);
    const int64_t n = g.padded_size;
    for (int64_t flat = 0; flat < n; ++flat) {
      int64_t rem = flat;
      int64_t id_d = 0;
      for (int dd = 0; dd < g.ndim; ++dd) {
        int64_t v = rem / g.stride[dd];
        rem -= v * g.stride[dd];
        if (dd == d) id_d = v;
      }
      if (id_d < r) buf[flat] = lo;
      else if (id_d >= g.padded[d] - r) buf[flat] = hi;
    }
  }
}

// One sweep over interior rows [row_lo, row_hi) of the leading dim.
void sweep_range(const double* in, double* out, const Geometry& g,
                 const int64_t* tap_flat, const double* weights,
                 int num_taps, bool uniform, double uw,
                 int64_t row_lo, int64_t row_hi) {
  const int r = g.radius;
  const int ndim = g.ndim;
  if (ndim == 2) {
    const int64_t W = g.interior[1], s0 = g.stride[0];
    for (int64_t i = row_lo; i < row_hi; ++i) {
      const int64_t base = (i + r) * s0 + r;
      for (int64_t j = 0; j < W; ++j) {
        const int64_t p = base + j;
        double acc = 0.0;
        if (uniform) {
          for (int t = 0; t < num_taps; ++t) acc += in[p + tap_flat[t]];
          acc *= uw;
        } else {
          for (int t = 0; t < num_taps; ++t)
            acc += weights[t] * in[p + tap_flat[t]];
        }
        out[p] = acc;
      }
    }
  } else {  // ndim == 3
    const int64_t H = g.interior[1], W = g.interior[2];
    const int64_t s0 = g.stride[0], s1 = g.stride[1];
    for (int64_t i = row_lo; i < row_hi; ++i) {
      for (int64_t j = 0; j < H; ++j) {
        const int64_t base = (i + r) * s0 + (j + r) * s1 + r;
        for (int64_t kk = 0; kk < W; ++kk) {
          const int64_t p = base + kk;
          double acc = 0.0;
          if (uniform) {
            for (int t = 0; t < num_taps; ++t) acc += in[p + tap_flat[t]];
            acc *= uw;
          } else {
            for (int t = 0; t < num_taps; ++t)
              acc += weights[t] * in[p + tap_flat[t]];
          }
          out[p] = acc;
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success. `input`/`output` are interior-shaped (C order,
// float64). bc is ndim pairs (lo, hi). `modes` is an ndim per-dim BC
// mode mask: 0 = Dirichlet, 1 = periodic (wrap), 2 = Neumann (mirror);
// NULL = all Dirichlet. Dynamic dims need interior extent >= radius.
int stencil_golden_iterate(const double* input, double* output,
                           const int64_t* shape, int ndim,
                           const int64_t* offsets /* num_taps * ndim */,
                           const double* weights, int num_taps,
                           int radius, const double* bc, int64_t iterations,
                           int num_threads, const int32_t* modes) {
  if (ndim != 2 && ndim != 3) return 1;
  if (modes)
    for (int d = 0; d < ndim; ++d)
      if (modes[d] && shape[d] < radius) return 2;
  Geometry g = make_geometry(shape, ndim, radius);

  // flat tap offsets in padded coordinates
  std::vector<int64_t> tap_flat(num_taps);
  for (int t = 0; t < num_taps; ++t) {
    int64_t f = 0;
    for (int d = 0; d < ndim; ++d) f += offsets[t * ndim + d] * g.stride[d];
    tap_flat[t] = f;
  }
  bool uniform = true;
  for (int t = 1; t < num_taps; ++t)
    if (weights[t] != weights[0]) { uniform = false; break; }
  const double uw = weights[0];

  std::vector<double> a(g.padded_size, 0.0), b(g.padded_size, 0.0);
  fill_bc(a.data(), g, bc, modes);
  fill_bc(b.data(), g, bc, modes);

  // embed interior into a
  {
    const int r = g.radius;
    if (ndim == 2) {
      for (int64_t i = 0; i < g.interior[0]; ++i)
        std::memcpy(&a[(i + r) * g.stride[0] + r],
                    &input[i * g.interior[1]],
                    g.interior[1] * sizeof(double));
    } else {
      for (int64_t i = 0; i < g.interior[0]; ++i)
        for (int64_t j = 0; j < g.interior[1]; ++j)
          std::memcpy(&a[(i + r) * g.stride[0] + (j + r) * g.stride[1] + r],
                      &input[(i * g.interior[1] + j) * g.interior[2]],
                      g.interior[2] * sizeof(double));
    }
  }

  double* cur = a.data();
  double* nxt = b.data();
  if (num_threads <= 0)
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (num_threads < 1) num_threads = 1;
  const int64_t lead = g.interior[0];
  num_threads = static_cast<int>(
      std::min<int64_t>(num_threads, lead));

  dynamic_fill(cur, g, modes);  // seed the dynamic ghosts of sweep 1
  for (int64_t it = 0; it < iterations; ++it) {
    if (num_threads == 1 || lead < 16) {
      sweep_range(cur, nxt, g, tap_flat.data(), weights, num_taps, uniform,
                  uw, 0, lead);
    } else {
      std::vector<std::thread> pool;
      const int64_t chunk = (lead + num_threads - 1) / num_threads;
      for (int tIdx = 0; tIdx < num_threads; ++tIdx) {
        const int64_t lo = tIdx * chunk;
        const int64_t hi = std::min(lead, lo + chunk);
        if (lo >= hi) break;
        pool.emplace_back(sweep_range, cur, nxt, std::cref(g),
                          tap_flat.data(), weights, num_taps, uniform, uw,
                          lo, hi);
      }
      for (auto& th : pool) th.join();
    }
    std::swap(cur, nxt);
    dynamic_fill(cur, g, modes);  // ghosts now reflect the NEW iterate
  }

  // extract interior
  {
    const int r = g.radius;
    if (ndim == 2) {
      for (int64_t i = 0; i < g.interior[0]; ++i)
        std::memcpy(&output[i * g.interior[1]],
                    &cur[(i + r) * g.stride[0] + r],
                    g.interior[1] * sizeof(double));
    } else {
      for (int64_t i = 0; i < g.interior[0]; ++i)
        for (int64_t j = 0; j < g.interior[1]; ++j)
          std::memcpy(&output[(i * g.interior[1] + j) * g.interior[2]],
                      &cur[(i + r) * g.stride[0] + (j + r) * g.stride[1] + r],
                      g.interior[2] * sizeof(double));
    }
  }
  return 0;
}

}  // extern "C"
