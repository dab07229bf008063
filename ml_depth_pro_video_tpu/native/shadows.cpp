// Shadow-column cleanup hot loop: drop XZ-grid cells whose points form
// tall near-vertical streaks (monocular depth "shadows").
//
// Parity target: geom/clean.py::clean_shadows (itself behavioral parity
// with /root/reference/pointcloud_cleaner.py:142-309). The numpy
// version is fully vectorized but still the DOMINANT host stage of the
// frames->floorplan pipeline (1.57 s/frame of the 2.54 s total,
// scripts/pipeline_stage_budget.out): one np.lexsort over millions of
// rows plus ~15 full-array passes. This kernel does ONE parallel
// stable sort by (cell, y, original-index) — the exact lexsort order —
// then processes cells across threads, computing the true per-cell
// pair-angle median directly (np.median semantics, including the
// even-count two-middle average and the zero-length-pair NaN rule:
// any duplicate-point pair keeps the cell).
//
// Build: compiled together with the other sources into geom-native.so.
// Binding: ctypes (ml_depth_pro_video_tpu/native/__init__.py).

#include <cstdint>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

struct Rec {
    int64_t cell;
    double y;
    int64_t idx;
};

inline bool rec_less(const Rec& a, const Rec& b) {
    if (a.cell != b.cell) return a.cell < b.cell;
    if (a.y != b.y) return a.y < b.y;
    return a.idx < b.idx;  // lexsort stability tiebreak
}

// chunked parallel merge sort (same std::thread style as bpa.cpp — no
// extra build flags); ping-pong merges into a scratch buffer
void parallel_sort(std::vector<Rec>& v) {
    const size_t n = v.size();
    unsigned hw = std::thread::hardware_concurrency();
    size_t nt = hw ? hw : 1;
    if (nt > 1 && n < 1u << 16) nt = 1;
    if (nt == 1) {
        std::sort(v.begin(), v.end(), rec_less);
        return;
    }
    std::vector<size_t> bounds(nt + 1);
    for (size_t t = 0; t <= nt; ++t) bounds[t] = n * t / nt;
    {
        std::vector<std::thread> th;
        th.reserve(nt);
        for (size_t t = 0; t < nt; ++t)
            th.emplace_back([&, t] {
                std::sort(v.begin() + bounds[t], v.begin() + bounds[t + 1],
                          rec_less);
            });
        for (auto& x : th) x.join();
    }
    std::vector<Rec> tmp(n);
    std::vector<size_t> cur(bounds);
    Rec* src = v.data();
    Rec* dst = tmp.data();
    size_t runs = nt;
    while (runs > 1) {
        size_t out_runs = (runs + 1) / 2;
        std::vector<size_t> nb(out_runs + 1);
        std::vector<std::thread> th;
        th.reserve(out_runs);
        for (size_t r = 0; r < out_runs; ++r) {
            size_t a0 = cur[2 * r];
            size_t a1 = cur[2 * r + 1];
            size_t a2 = (2 * r + 2 <= runs) ? cur[2 * r + 2] : a1;
            nb[r] = a0;
            th.emplace_back([=] {
                std::merge(src + a0, src + a1, src + a1, src + a2,
                           dst + a0, rec_less);
            });
        }
        nb[out_runs] = cur[runs];
        for (auto& x : th) x.join();
        std::swap(src, dst);
        cur.assign(nb.begin(), nb.end());
        runs = out_runs;
    }
    if (src != v.data()) std::memcpy(v.data(), src, n * sizeof(Rec));
}

}  // namespace

extern "C" {

// points: (n, 3) float64 row-major. keep_out: n uint8 (1 = keep).
// Mirrors clean_shadows' cell sizing, qualification, and median rule.
void clean_shadows_mask(const double* pts, int64_t n,
                        double shadow_height_threshold,
                        double max_shadow_angle_deg,
                        int32_t min_points_per_column,
                        uint8_t* keep_out) {
    std::memset(keep_out, 1, (size_t)n);
    if (n == 0) return;

    double x_min = pts[0], x_max = pts[0];
    double z_min = pts[2], z_max = pts[2];
    for (int64_t i = 1; i < n; ++i) {
        const double x = pts[3 * i], z = pts[3 * i + 2];
        if (x < x_min) x_min = x;
        if (x > x_max) x_max = x;
        if (z < z_min) z_min = z;
        if (z > z_max) z_max = z;
    }
    double area = (x_max - x_min) * (z_max - z_min);
    if (area < 1e-9) area = 1e-9;
    const double density = (double)n / area;
    double cell_size = 1.0 / std::sqrt(std::max(density / 10.0, 1e-12));
    if (cell_size < 0.05) cell_size = 0.05;

    int64_t nx = (int64_t)std::ceil((x_max - x_min) / cell_size);
    int64_t nz = (int64_t)std::ceil((z_max - z_min) / cell_size);
    if (nx < 1) nx = 1;
    if (nz < 1) nz = 1;

    std::vector<Rec> rec((size_t)n);
    for (int64_t i = 0; i < n; ++i) {
        // numpy: xi = min(int64((x - x_min)/cell_size), nx-1)
        int64_t xi = (int64_t)((pts[3 * i] - x_min) / cell_size);
        int64_t zi = (int64_t)((pts[3 * i + 2] - z_min) / cell_size);
        if (xi > nx - 1) xi = nx - 1;
        if (zi > nz - 1) zi = nz - 1;
        rec[(size_t)i] = {xi * nz + zi, pts[3 * i + 1], i};
    }
    parallel_sort(rec);

    // segment boundaries (cells are contiguous after the sort)
    std::vector<int64_t> starts;
    starts.reserve((size_t)(n / 8) + 2);
    starts.push_back(0);
    for (int64_t i = 1; i < n; ++i)
        if (rec[(size_t)i].cell != rec[(size_t)i - 1].cell)
            starts.push_back(i);
    starts.push_back(n);
    const size_t n_seg = starts.size() - 1;

    const int64_t min_pts = std::max(min_points_per_column, 3);
    const double deg = 180.0 / M_PI;

    unsigned hw = std::thread::hardware_concurrency();
    size_t nt = hw ? hw : 1;
    if (n_seg < 64) nt = 1;

    auto worker = [&](size_t t, size_t T) {
        std::vector<double> angles;
        for (size_t s = t; s < n_seg; s += T) {
            const int64_t a = starts[s], b = starts[s + 1];
            const int64_t cnt = b - a;
            if (cnt < min_pts) continue;
            if (rec[(size_t)(b - 1)].y - rec[(size_t)a].y
                    <= shadow_height_threshold)
                continue;
            angles.clear();
            bool has_zero = false;
            for (int64_t i = a; i + 1 < b; ++i) {
                const int64_t p = rec[(size_t)i].idx;
                const int64_t q = rec[(size_t)(i + 1)].idx;
                const double vy = rec[(size_t)(i + 1)].y - rec[(size_t)i].y;
                const double dx = pts[3 * q] - pts[3 * p];
                const double dz = pts[3 * q + 2] - pts[3 * p + 2];
                const double n2 = vy * vy + dx * dx + dz * dz;
                if (n2 == 0.0) {
                    // duplicate-point pair: the reference's 0/0 makes
                    // the angle median NaN and NaN < t is False — the
                    // cell is ALWAYS kept
                    has_zero = true;
                    break;
                }
                double c = vy / std::sqrt(n2);
                if (c > 1.0) c = 1.0;
                if (c < -1.0) c = -1.0;
                angles.push_back(std::acos(c) * deg);
            }
            if (has_zero || angles.empty()) continue;
            // np.median: middle element (odd) / mean of the two middle
            // elements (even)
            const size_t m = angles.size();
            const size_t mid = m / 2;
            std::nth_element(angles.begin(), angles.begin() + mid,
                             angles.end());
            double med = angles[mid];
            if (m % 2 == 0) {
                const double lo = *std::max_element(angles.begin(),
                                                    angles.begin() + mid);
                med = 0.5 * (lo + med);
            }
            if (med < max_shadow_angle_deg)
                for (int64_t i = a; i < b; ++i)
                    keep_out[rec[(size_t)i].idx] = 0;
        }
    };
    if (nt == 1) {
        worker(0, 1);
    } else {
        std::vector<std::thread> th;
        th.reserve(nt);
        for (size_t t = 0; t < nt; ++t) th.emplace_back(worker, t, nt);
        for (auto& x : th) x.join();
    }
}

}  // extern "C"
