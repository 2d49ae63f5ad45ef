// Native trajectory-file parsing + sliding-window extraction.
//
// C++ engine behind grouptraj.data (the reference's data layer is pure
// numpy-in-Python, materialized eagerly at startup — trajectories_GCN.py:
// 105-189; this reproduces its exact semantics natively: tab/whitespace
// parsing, per-frame grouping, full-presence filtering, 4-decimal
// round-half-even before the relative transform, quadratic poly_fit
// non-linearity flag, strict min_ped filtering).
//
// Exposed as a flat C ABI consumed via ctypes (no pybind11 in this image):
//   gt_load_file(...)   -> opaque handle with all windows of one file
//   gt_num_windows / gt_window_peds / gt_seq_len
//   gt_copy_window(...) -> fills caller-allocated float32 buffers
//   gt_free(...)
//
// Build: g++ -O3 -march=native -shared -fPIC -o _windowing.so windowing.cpp

#include <algorithm>
#include <cfenv>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

struct Window {
  int n_peds = 0;
  int seq_len = 0;
  // ped-major [n, T] layouts
  std::vector<float> xy;     // [n, T, 2]
  std::vector<float> rel;    // [n, T, 2]
  std::vector<float> group;  // [n, T]
  std::vector<float> nonlin; // [n]
};

struct Dataset {
  std::vector<Window> windows;
};

// numpy-compatible round-half-even to 4 decimals (np.around semantics)
inline double round4(double x) { return std::rint(x * 1e4) / 1e4; }

// Residual of a degree-2 least-squares fit over the last n points of y
// sampled at t = 0..n-1 (numpy.polyfit(..., full=True)[1] semantics).
double quad_residual(const double* y, int n) {
  // normal equations for basis [t^2, t, 1]
  double s[5] = {0, 0, 0, 0, 0};  // sums of t^k, k=0..4
  double b[3] = {0, 0, 0};        // sums of y*t^2, y*t, y
  for (int i = 0; i < n; ++i) {
    double t = static_cast<double>(i);
    double t2 = t * t;
    s[0] += 1.0; s[1] += t; s[2] += t2; s[3] += t2 * t; s[4] += t2 * t2;
    b[0] += y[i] * t2; b[1] += y[i] * t; b[2] += y[i];
  }
  // solve A c = b, A = [[s4,s3,s2],[s3,s2,s1],[s2,s1,s0]] via Cramer
  double a11 = s[4], a12 = s[3], a13 = s[2];
  double a21 = s[3], a22 = s[2], a23 = s[1];
  double a31 = s[2], a32 = s[1], a33 = s[0];
  double det = a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31) +
               a13 * (a21 * a32 - a22 * a31);
  if (std::fabs(det) < 1e-12) return 0.0;
  double c0 = (b[0] * (a22 * a33 - a23 * a32) - a12 * (b[1] * a33 - a23 * b[2]) +
               a13 * (b[1] * a32 - a22 * b[2])) / det;
  double c1 = (a11 * (b[1] * a33 - a23 * b[2]) - b[0] * (a21 * a33 - a23 * a31) +
               a13 * (a21 * b[2] - b[1] * a31)) / det;
  double c2 = (a11 * (a22 * b[2] - b[1] * a32) - a12 * (a21 * b[2] - b[1] * a31) +
               b[0] * (a21 * a32 - a22 * a31)) / det;
  double res = 0.0;
  for (int i = 0; i < n; ++i) {
    double t = static_cast<double>(i);
    double fit = c0 * t * t + c1 * t + c2;
    double d = y[i] - fit;
    res += d * d;
  }
  return res;
}

struct Row {
  double frame, ped;
  std::vector<double> vals;  // x, y[, group, ...]
};

bool parse_file(const char* path, std::vector<Row>& rows, int& n_cols) {
  FILE* f = std::fopen(path, "r");
  if (!f) return false;
  char line[4096];
  n_cols = 0;
  while (std::fgets(line, sizeof(line), f)) {
    Row r;
    char* p = line;
    std::vector<double> vals;
    while (*p) {
      while (*p == '\t' || *p == ' ' || *p == '\r' || *p == '\n') ++p;
      if (!*p) break;
      char* end = nullptr;
      double v = std::strtod(p, &end);
      if (end == p) break;
      vals.push_back(v);
      p = end;
    }
    if (vals.size() < 4) continue;
    r.frame = vals[0];
    r.ped = vals[1];
    r.vals.assign(vals.begin() + 2, vals.end());
    n_cols = std::max<int>(n_cols, static_cast<int>(vals.size()));
    rows.push_back(std::move(r));
  }
  std::fclose(f);
  return true;
}

}  // namespace

extern "C" {

void* gt_load_file(const char* path, int obs_len, int pred_len, int skip,
                   double threshold, int min_ped, int group_required) {
  std::vector<Row> rows;
  int n_cols = 0;
  if (!parse_file(path, rows, n_cols)) return nullptr;
  const int seq_len = obs_len + pred_len;
  const bool has_group = n_cols >= 5;
  if (!has_group && group_required) return nullptr;  // "dataset has no labeling"

  // unique sorted frames + per-frame row indices (matches np.unique order)
  std::map<double, std::vector<int>> frame_rows;
  for (int i = 0; i < static_cast<int>(rows.size()); ++i)
    frame_rows[rows[i].frame].push_back(i);
  std::vector<double> frames;
  frames.reserve(frame_rows.size());
  for (auto& kv : frame_rows) frames.push_back(kv.first);
  const int n_frames = static_cast<int>(frames.size());

  auto* ds = new Dataset();
  // reference loop bound: ceil((len(frames)-seq_len+1)/skip)*skip + 1
  int num_seq = static_cast<int>(
      std::ceil(static_cast<double>(n_frames - seq_len + 1) / skip));
  for (int idx = 0; idx < num_seq * skip + 1; idx += skip) {
    if (idx >= n_frames) continue;
    int hi = std::min(idx + seq_len, n_frames);
    // gather rows of this window grouped per ped (frame order preserved)
    std::map<double, std::vector<int>> ped_rows;  // np.unique-sorted peds
    for (int fi = idx; fi < hi; ++fi)
      for (int ri : frame_rows[frames[fi]])
        ped_rows[rows[ri].ped].push_back(ri);

    Window w;
    w.seq_len = seq_len;
    std::vector<double> ys(seq_len);
    for (auto& kv : ped_rows) {
      auto& idxs = kv.second;
      // pad_front/pad_end from global frame positions
      auto pos = [&](double fr) {
        return static_cast<int>(std::lower_bound(frames.begin(), frames.end(),
                                                 fr) - frames.begin());
      };
      int pad_front = pos(rows[idxs.front()].frame) - idx;
      int pad_end = pos(rows[idxs.back()].frame) - idx + 1;
      if (pad_end - pad_front != seq_len ||
          static_cast<int>(idxs.size()) != seq_len)
        continue;
      // rounded values, then xy/rel/group
      std::vector<double> xs(seq_len), yss(seq_len), gs(seq_len);
      for (int t = 0; t < seq_len; ++t) {
        const Row& r = rows[idxs[t]];
        xs[t] = round4(r.vals[0]);
        yss[t] = round4(r.vals[1]);
        gs[t] = has_group ? round4(r.vals[2]) : 0.0;
      }
      for (int t = 0; t < seq_len; ++t) {
        w.xy.push_back(static_cast<float>(xs[t]));
        w.xy.push_back(static_cast<float>(yss[t]));
        double rx = t == 0 ? 0.0 : xs[t] - xs[t - 1];
        double ry = t == 0 ? 0.0 : yss[t] - yss[t - 1];
        w.rel.push_back(static_cast<float>(rx));
        w.rel.push_back(static_cast<float>(ry));
        w.group.push_back(static_cast<float>(gs[t]));
      }
      double res = quad_residual(xs.data() + (seq_len - pred_len), pred_len) +
                   quad_residual(yss.data() + (seq_len - pred_len), pred_len);
      w.nonlin.push_back(res >= threshold ? 1.0f : 0.0f);
      ++w.n_peds;
    }
    if (w.n_peds > min_ped) ds->windows.push_back(std::move(w));
  }
  return ds;
}

int gt_num_windows(void* h) {
  return h ? static_cast<int>(static_cast<Dataset*>(h)->windows.size()) : -1;
}

int gt_window_peds(void* h, int i) {
  auto* ds = static_cast<Dataset*>(h);
  if (!ds || i < 0 || i >= static_cast<int>(ds->windows.size())) return -1;
  return ds->windows[i].n_peds;
}

int gt_copy_window(void* h, int i, float* xy, float* rel, float* group,
                   float* nonlin) {
  auto* ds = static_cast<Dataset*>(h);
  if (!ds || i < 0 || i >= static_cast<int>(ds->windows.size())) return -1;
  const Window& w = ds->windows[i];
  std::memcpy(xy, w.xy.data(), w.xy.size() * sizeof(float));
  std::memcpy(rel, w.rel.data(), w.rel.size() * sizeof(float));
  std::memcpy(group, w.group.data(), w.group.size() * sizeof(float));
  std::memcpy(nonlin, w.nonlin.data(), w.nonlin.size() * sizeof(float));
  return 0;
}

void gt_free(void* h) { delete static_cast<Dataset*>(h); }

}  // extern "C"
