// Native host-side planning engine for ska_sdp_cip_tpu.
//
// The TPU gridder's execution plan requires, per visibility sample:
// wavelength-scaled uv coordinates, w-flip, footprint cells, fractional
// offsets, and a (tile, w-bin) sort — O(nrow * nchan) host work that
// dominates time-to-first-image at production scale (1e8+ samples).
// The reference performs the analogous binning with a Python
// multiprocessing pool (reference: src/ska_sdp_cip/uvw_tiling/
// tiling_plan.py:84-134); here it is a multithreaded C++ engine
// exposed through a C ABI for ctypes (no pybind11 in this
// environment). Python falls back to the numpy implementation when
// the shared library is absent.
//
// Build: make -C native   (produces libcipnative.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr double kSpeedOfLight = 299792458.0;

int num_threads() {
    unsigned n = std::thread::hardware_concurrency();
    return n ? static_cast<int>(n) : 1;
}

// Run fn(t, begin, end) over [0, n) split across threads.
template <typename Fn>
void parallel_for(int64_t n, Fn fn) {
    int nt = num_threads();
    if (n < 1 << 16 || nt == 1) {
        fn(0, 0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t begin = t * chunk;
        int64_t end = std::min(n, begin + chunk);
        if (begin >= end) break;
        threads.emplace_back([=] { fn(t, begin, end); });
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Min/max of |w| in wavelengths over all (row, chan) samples.
void cip_w_minmax(const double* uvw, int64_t nrow, const double* freqs,
                  int64_t nchan, double* wmin_out, double* wmax_out) {
    int nt = num_threads();
    std::vector<double> mins(nt, 1e300), maxs(nt, -1e300);
    parallel_for(nrow, [&](int t, int64_t begin, int64_t end) {
        double lo = 1e300, hi = -1e300;
        for (int64_t r = begin; r < end; ++r) {
            double w = uvw[3 * r + 2];
            for (int64_t c = 0; c < nchan; ++c) {
                double wl = std::fabs(w * freqs[c] / kSpeedOfLight);
                lo = std::min(lo, wl);
                hi = std::max(hi, wl);
            }
        }
        mins[t] = lo;
        maxs[t] = hi;
    });
    double lo = 1e300, hi = -1e300;
    for (int t = 0; t < nt; ++t) {
        lo = std::min(lo, mins[t]);
        hi = std::max(hi, maxs[t]);
    }
    *wmin_out = (nrow && nchan) ? lo : 0.0;
    *wmax_out = (nrow && nchan) ? hi : 0.0;
}

// Fused per-sample plan arrays (flattened row-major over (row, chan)):
// flip flag, footprint start cells (alloc frame), fractional offsets,
// |w| in wavelengths, and the (tile, wbin) lexicographic sort key.
void cip_plan_arrays(const double* uvw, int64_t nrow, const double* freqs,
                     int64_t nchan, double inv_du, int64_t ngrid,
                     int64_t support, int64_t tile_cells_x,
                     int64_t tile_cells_y, int64_t ntiles_y,
                     int wstacking, double w0_plane, double inv_dw,
                     int64_t nplanes,
                     uint8_t* flip, int32_t* x0, int32_t* y0, float* fx,
                     float* fy, float* ws, int64_t* key) {
    const int64_t half = support / 2;
    const double half_grid = static_cast<double>(ngrid) / 2.0;
    parallel_for(nrow, [&](int, int64_t begin, int64_t end) {
        for (int64_t r = begin; r < end; ++r) {
            const double bu = uvw[3 * r + 0];
            const double bv = uvw[3 * r + 1];
            const double bw = uvw[3 * r + 2];
            for (int64_t c = 0; c < nchan; ++c) {
                const int64_t i = r * nchan + c;
                const double scale = freqs[c] / kSpeedOfLight;
                double u = bu * scale, v = bv * scale, w = bw * scale;
                const bool neg = w < 0.0;
                if (neg) { u = -u; v = -v; w = -w; }
                flip[i] = neg ? 1 : 0;
                ws[i] = static_cast<float>(w);

                double x = std::fmod(u * inv_du + half_grid, (double)ngrid);
                if (x < 0) x += ngrid;
                x += support;
                double y = std::fmod(v * inv_du + half_grid, (double)ngrid);
                if (y < 0) y += ngrid;
                y += support;

                const int64_t cx = (int64_t)std::floor(x) - half + 1;
                const int64_t cy = (int64_t)std::floor(y) - half + 1;
                x0[i] = (int32_t)cx;
                y0[i] = (int32_t)cy;
                fx[i] = (float)(x - (double)cx);
                fy[i] = (float)(y - (double)cy);

                // Floor binning: data bin q = floor((w - wmin)/dw);
                // the gridder maps bin q to plane window [q, q + W).
                int64_t bin = 0;
                if (wstacking) {
                    bin = (int64_t)std::floor((w - w0_plane) * inv_dw);
                    bin = std::max<int64_t>(0,
                          std::min<int64_t>(bin, nplanes - 1));
                }
                const int64_t tid = (cx / tile_cells_x) * ntiles_y
                                  + (cy / tile_cells_y);
                key[i] = tid * nplanes + bin;
            }
        }
    });
}

// Parallel stable argsort of int64 keys (LSD radix, 8 bits/pass).
// order[i] receives the index of the i-th smallest key. Keys are
// non-negative (tile ids and bins).
void cip_argsort_i64(const int64_t* keys, int64_t n, int64_t* order) {
    std::vector<int64_t> idx_a(n), idx_b(n);
    std::vector<int64_t> key_a(n), key_b(n);
    for (int64_t i = 0; i < n; ++i) { idx_a[i] = i; key_a[i] = keys[i]; }

    int64_t maxkey = 0;
    for (int64_t i = 0; i < n; ++i) maxkey = std::max(maxkey, key_a[i]);

    const int kRadix = 256;
    int passes = 0;
    while ((maxkey >> (8 * passes)) != 0 && passes < 8) ++passes;
    if (passes == 0) passes = 1;

    int nt = num_threads();
    std::vector<int64_t> hist(static_cast<size_t>(nt) * kRadix);

    int64_t* ka = key_a.data(); int64_t* kb = key_b.data();
    int64_t* ia = idx_a.data(); int64_t* ib = idx_b.data();

    for (int p = 0; p < passes; ++p) {
        const int shift = 8 * p;
        std::fill(hist.begin(), hist.end(), 0);
        int64_t chunk = (n + nt - 1) / nt;
        parallel_for(n, [&](int t, int64_t begin, int64_t end) {
            int64_t* h = &hist[static_cast<size_t>(t) * kRadix];
            for (int64_t i = begin; i < end; ++i)
                ++h[(ka[i] >> shift) & 0xFF];
        });
        // Exclusive prefix over (digit, thread) in digit-major order
        int64_t sum = 0;
        for (int d = 0; d < kRadix; ++d) {
            for (int t = 0; t < nt; ++t) {
                int64_t& h = hist[static_cast<size_t>(t) * kRadix + d];
                int64_t cur = h; h = sum; sum += cur;
            }
        }
        parallel_for(n, [&](int t, int64_t begin, int64_t end) {
            int64_t* h = &hist[static_cast<size_t>(t) * kRadix];
            for (int64_t i = begin; i < end; ++i) {
                int64_t pos = h[(ka[i] >> shift) & 0xFF]++;
                kb[pos] = ka[i];
                ib[pos] = ia[i];
            }
        });
        std::swap(ka, kb);
        std::swap(ia, ib);
        (void)chunk;
    }
    std::memcpy(order, ia, sizeof(int64_t) * n);
}

// Parallel gather: out[i] = src[order[i]] for f32 / i32 / u8 columns.
void cip_gather_f32(const float* src, const int64_t* order, int64_t n,
                    float* out) {
    parallel_for(n, [&](int, int64_t b, int64_t e) {
        for (int64_t i = b; i < e; ++i) out[i] = src[order[i]];
    });
}
void cip_gather_i32(const int32_t* src, const int64_t* order, int64_t n,
                    int32_t* out) {
    parallel_for(n, [&](int, int64_t b, int64_t e) {
        for (int64_t i = b; i < e; ++i) out[i] = src[order[i]];
    });
}
void cip_gather_u8(const uint8_t* src, const int64_t* order, int64_t n,
                   uint8_t* out) {
    parallel_for(n, [&](int, int64_t b, int64_t e) {
        for (int64_t i = b; i < e; ++i) out[i] = src[order[i]];
    });
}

}  // extern "C"
