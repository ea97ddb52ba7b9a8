// Native costmap runtime: obstacle extraction, clustering, feasibility.
//
// Parity: the reference's per-cycle C++ costmap path —
//   costmap_2d::Costmap2D scans (MpcLocalPlannerROS::updateObstacleContainerWithCostmap),
//   costmap_converter::CostmapToPolygonsDBSMCCH (cluster -> convex hull),
//   base_local_planner::CostmapModel::footprintCost (feasibility veto).
// This is host-side per-cycle work (SURVEY.md hot spot #4) feeding the
// device-resident solver; exposed through ctypes (mpc_local_planner_tpu/
// native.py) with a pure-Python fallback when the library is not built.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr uint8_t kLethal = 254;

struct Pt {
  double x, y;
};

inline bool in_map(int x, int y, int W, int H) {
  return x >= 0 && y >= 0 && x < W && y < H;
}

double cross(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// Andrew monotone chain; returns hull in counter-clockwise order.
std::vector<Pt> convex_hull(std::vector<Pt> pts) {
  if (pts.size() < 3) return pts;
  std::sort(pts.begin(), pts.end(), [](const Pt& a, const Pt& b) {
    return a.x < b.x || (a.x == b.x && a.y < b.y);
  });
  std::vector<Pt> h(2 * pts.size());
  size_t k = 0;
  for (size_t i = 0; i < pts.size(); ++i) {
    while (k >= 2 && cross(h[k - 2], h[k - 1], pts[i]) <= 0) k--;
    h[k++] = pts[i];
  }
  for (size_t i = pts.size() - 1, t = k + 1; i-- > 0;) {
    while (k >= t && cross(h[k - 2], h[k - 1], pts[i]) <= 0) k--;
    h[k++] = pts[i];
  }
  h.resize(k - 1);
  return h;
}

// 8-connected flood-fill clustering of cells >= threshold (the DBSCAN-on-
// grid analog shared by the polygon / line / dynamic-obstacle converters).
std::vector<std::vector<Pt>> cluster_cells(const uint8_t* data, int H, int W,
                                           double ox, double oy, double res,
                                           uint8_t threshold,
                                           int min_cluster) {
  std::vector<int32_t> label(static_cast<size_t>(H) * W, -1);
  std::vector<std::vector<Pt>> clusters;
  std::vector<int> stack;
  for (int y0 = 0; y0 < H; ++y0) {
    for (int x0 = 0; x0 < W; ++x0) {
      const int idx0 = y0 * W + x0;
      if (data[idx0] < threshold || label[idx0] >= 0) continue;
      std::vector<Pt> cells;
      stack.clear();
      stack.push_back(idx0);
      label[idx0] = 1;
      while (!stack.empty()) {
        const int idx = stack.back();
        stack.pop_back();
        const int cy = idx / W, cx = idx % W;
        cells.push_back({ox + (cx + 0.5) * res, oy + (cy + 0.5) * res});
        for (int dy = -1; dy <= 1; ++dy) {
          for (int dx = -1; dx <= 1; ++dx) {
            const int nx2 = cx + dx, ny2 = cy + dy;
            if (!in_map(nx2, ny2, W, H)) continue;
            const int nidx = ny2 * W + nx2;
            if (data[nidx] >= threshold && label[nidx] < 0) {
              label[nidx] = 1;
              stack.push_back(nidx);
            }
          }
        }
      }
      if (static_cast<int>(cells.size()) >= min_cluster)
        clusters.push_back(std::move(cells));
    }
  }
  return clusters;
}

// Distance from point p to the infinite line through (a, b).
inline double line_point_dist(const Pt& a, const Pt& b, const Pt& p) {
  const double vx = b.x - a.x, vy = b.y - a.y;
  const double L = std::sqrt(vx * vx + vy * vy);
  if (L < 1e-12) return std::hypot(p.x - a.x, p.y - a.y);
  return std::fabs(vx * (p.y - a.y) - vy * (p.x - a.x)) / L;
}

}  // namespace

extern "C" {

// Extract lethal cells as world-frame point obstacles near the robot.
// Cells within force_inclusion_dist bypass the behind-the-robot filter
// (parity: force_inclusion_dist in updateObstacleContainerWithCostmap).
// Returns the number of points written to out_xy (2 doubles each).
int mpc_costmap_extract_points(const uint8_t* data, int H, int W, double ox,
                               double oy, double res, const double* pose,
                               double behind_dist, double cutoff_dist,
                               uint8_t threshold, double* out_xy,
                               int max_out, double force_inclusion_dist) {
  const double px = pose[0], py = pose[1], pth = pose[2];
  const double ch = std::cos(pth), sh = std::sin(pth);
  const double cutoff2 = cutoff_dist * cutoff_dist;
  const double behind2 = behind_dist * behind_dist;
  const double force2 = force_inclusion_dist * force_inclusion_dist;
  int n = 0;
  for (int y = 0; y < H && n < max_out; ++y) {
    for (int x = 0; x < W && n < max_out; ++x) {
      if (data[y * W + x] < threshold) continue;
      // boundary filter: interior cells of a solid lethal block are never
      // the nearest-distance minimizer, so only surface cells (those with a
      // free 4-neighbor, or on the map edge) are emitted as obstacles
      const bool boundary =
          (x == 0 || data[y * W + x - 1] < threshold) ||
          (x == W - 1 || data[y * W + x + 1] < threshold) ||
          (y == 0 || data[(y - 1) * W + x] < threshold) ||
          (y == H - 1 || data[(y + 1) * W + x] < threshold);
      if (!boundary) continue;
      const double wx = ox + (x + 0.5) * res;
      const double wy = oy + (y + 0.5) * res;
      const double dx = wx - px, dy = wy - py;
      const double d2 = dx * dx + dy * dy;
      if (d2 > cutoff2) continue;
      const double forward = dx * ch + dy * sh;
      if (forward < 0.0 && d2 > behind2 && d2 > force2) continue;
      out_xy[2 * n] = wx;
      out_xy[2 * n + 1] = wy;
      ++n;
    }
  }
  return n;
}

// Cluster lethal cells (8-connected flood fill) and emit one convex-hull
// polygon per cluster (parity: CostmapToPolygonsDBSMCCH). Vertices are
// written consecutively; per-polygon vertex counts go to out_counts.
// Returns the number of polygons (capped by max_polys / max_total_verts).
int mpc_costmap_extract_polygons(const uint8_t* data, int H, int W, double ox,
                                 double oy, double res, uint8_t threshold,
                                 int min_cluster, double* out_verts,
                                 int* out_counts, int max_polys,
                                 int max_total_verts) {
  auto clusters =
      cluster_cells(data, H, W, ox, oy, res, threshold, min_cluster);
  int n_poly = 0, n_vert = 0;
  for (auto& cells : clusters) {
    if (n_poly >= max_polys) break;
    std::vector<Pt> hull = convex_hull(cells);
    const int nv = static_cast<int>(hull.size());
    if (n_vert + nv > max_total_verts) break;
    for (int i = 0; i < nv; ++i) {
      out_verts[2 * (n_vert + i)] = hull[i].x;
      out_verts[2 * (n_vert + i) + 1] = hull[i].y;
    }
    out_counts[n_poly] = nv;
    n_vert += nv;
    ++n_poly;
  }
  return n_poly;
}

// Footprint cost of a pose: max cell cost under a disc footprint, or -1 on
// collision / off-map (parity: CostmapModel::footprintCost, disc model).
double mpc_costmap_footprint_cost(const uint8_t* data, int H, int W, double ox,
                                  double oy, double res, double x, double y,
                                  double radius) {
  const int mx = static_cast<int>((x - ox) / res);
  const int my = static_cast<int>((y - oy) / res);
  if (radius <= 0.0) {
    if (!in_map(mx, my, W, H)) return -1.0;
    const uint8_t c = data[my * W + mx];
    return c >= kLethal ? -1.0 : static_cast<double>(c);
  }
  const int r = std::max(1, static_cast<int>(std::ceil(radius / res)));
  double worst = 0.0;
  for (int dy = -r; dy <= r; ++dy) {
    for (int dx = -r; dx <= r; ++dx) {
      if (dx * dx + dy * dy > r * r) continue;
      const int cx = mx + dx, cy = my + dy;
      const uint8_t c =
          in_map(cx, cy, W, H) ? data[cy * W + cx] : kLethal;
      if (c >= kLethal) return -1.0;
      worst = std::max(worst, static_cast<double>(c));
    }
  }
  return worst;
}

// Feasibility of a pose trajectory (parity: isPoseTrajectoryFeasible).
// xs: n poses (x, y, theta). Returns 1 if feasible, 0 otherwise.
// Extract line-segment obstacles: cluster lethal cells, then repeatedly fit
// the dominant line per cluster by exhaustive hull-vertex-pair scoring
// (deterministic RANSAC analog), emit the inlier-spanning segment, and
// remove its inliers (parity: costmap_converter ::
// CostmapToLinesDBSRANSAC — DBSCAN clusters + RANSAC line fits).
// out_segs: 4 doubles (x1, y1, x2, y2) per line. Returns the line count.
int mpc_costmap_extract_lines(const uint8_t* data, int H, int W, double ox,
                              double oy, double res, uint8_t threshold,
                              int min_cluster, double inlier_dist,
                              int min_inliers, double* out_segs,
                              int max_out) {
  auto clusters =
      cluster_cells(data, H, W, ox, oy, res, threshold, min_cluster);
  int n_out = 0;
  std::vector<char> used;
  std::vector<int> inliers;
  for (auto& cells : clusters) {
    used.assign(cells.size(), 0);
    int remaining = static_cast<int>(cells.size());
    while (remaining >= min_inliers && n_out < max_out) {
      // candidate lines: pairs of hull vertices of the remaining cells
      std::vector<Pt> rem;
      rem.reserve(remaining);
      for (size_t i = 0; i < cells.size(); ++i)
        if (!used[i]) rem.push_back(cells[i]);
      std::vector<Pt> hull = convex_hull(rem);
      if (hull.size() < 2) break;
      int best = -1;
      size_t bi = 0, bj = 1;
      for (size_t i = 0; i < hull.size(); ++i) {
        for (size_t j = i + 1; j < hull.size(); ++j) {
          int cnt = 0;
          for (const Pt& p : rem)
            if (line_point_dist(hull[i], hull[j], p) <= inlier_dist) ++cnt;
          if (cnt > best) {
            best = cnt;
            bi = i;
            bj = j;
          }
        }
      }
      if (best < min_inliers) break;
      // segment endpoints = extreme projections of the inliers; mark used
      const Pt a = hull[bi], b = hull[bj];
      double vx = b.x - a.x, vy = b.y - a.y;
      const double L = std::sqrt(vx * vx + vy * vy);
      if (L < 1e-12) break;
      vx /= L;
      vy /= L;
      double tmin = 1e300, tmax = -1e300;
      inliers.clear();
      for (size_t i = 0; i < cells.size(); ++i) {
        if (used[i]) continue;
        if (line_point_dist(a, b, cells[i]) <= inlier_dist) {
          const double t = (cells[i].x - a.x) * vx + (cells[i].y - a.y) * vy;
          tmin = std::min(tmin, t);
          tmax = std::max(tmax, t);
          inliers.push_back(static_cast<int>(i));
        }
      }
      for (int i : inliers) used[i] = 1;
      remaining -= static_cast<int>(inliers.size());
      out_segs[4 * n_out + 0] = a.x + tmin * vx;
      out_segs[4 * n_out + 1] = a.y + tmin * vy;
      out_segs[4 * n_out + 2] = a.x + tmax * vx;
      out_segs[4 * n_out + 3] = a.y + tmax * vy;
      ++n_out;
    }
  }
  return n_out;
}

// Cluster lethal cells and report per-cluster centroid + bounding radius
// (the blob-detection front end of costmap_converter ::
// CostmapToDynamicObstacles). out: 3 doubles (cx, cy, radius) per cluster.
int mpc_costmap_cluster_centroids(const uint8_t* data, int H, int W,
                                  double ox, double oy, double res,
                                  uint8_t threshold, int min_cluster,
                                  double* out, int max_out) {
  auto clusters =
      cluster_cells(data, H, W, ox, oy, res, threshold, min_cluster);
  int n = 0;
  for (auto& cells : clusters) {
    if (n >= max_out) break;
    double sx = 0, sy = 0;
    for (const Pt& p : cells) {
      sx += p.x;
      sy += p.y;
    }
    const double cx = sx / cells.size(), cy = sy / cells.size();
    double r2 = 0;
    for (const Pt& p : cells) {
      const double dx = p.x - cx, dy = p.y - cy;
      r2 = std::max(r2, dx * dx + dy * dy);
    }
    out[3 * n + 0] = cx;
    out[3 * n + 1] = cy;
    out[3 * n + 2] = std::sqrt(r2) + 0.5 * res;  // cover the cell extent
    ++n;
  }
  return n;
}

// Frame-to-frame centroid tracker assigning constant velocities to moving
// blobs (parity: costmap_converter :: CostmapToDynamicObstacles — blob
// tracking with velocity estimation; Kalman filter replaced by exponential
// velocity smoothing). Tracks are 6 doubles: (id, x, y, vx, vy, age).
// Greedy nearest-neighbor association within gate_dist. Unmatched current
// centroids open new tracks (ids from *next_id, incremented); unmatched
// previous tracks are dropped. Returns the new track count.
// Tracks are 8-double rows (id, x, y, vx, vy, age, missed, radius).
// Centroids are 3-double rows (x, y, bounding radius). Matching gates
// against the constant-velocity PREDICTED track position; unmatched tracks
// coast on that prediction for up to max_missed frames before being
// dropped (parity: CostmapToDynamicObstacles' Kalman tracks surviving
// missed detections — one clustering flicker must not reset a moving
// obstacle's velocity to zero).
int mpc_tracker_update(const double* prev, int n_prev, const double* cur,
                       int n_cur, double dt, double gate_dist,
                       double vel_alpha, int* next_id, double* out,
                       int max_out, int max_missed) {
  std::vector<char> prev_used(n_prev, 0);
  int n_out = 0;
  for (int c = 0; c < n_cur && n_out < max_out; ++c) {
    const double cx = cur[3 * c], cy = cur[3 * c + 1], cr = cur[3 * c + 2];
    int best = -1;
    double best_d2 = gate_dist * gate_dist;
    for (int p = 0; p < n_prev; ++p) {
      if (prev_used[p]) continue;
      const double px = prev[8 * p + 1] + dt * prev[8 * p + 3];
      const double py = prev[8 * p + 2] + dt * prev[8 * p + 4];
      const double dx = cx - px, dy = cy - py;
      const double d2 = dx * dx + dy * dy;
      if (d2 < best_d2) {
        best_d2 = d2;
        best = p;
      }
    }
    double* o = out + 8 * n_out;
    if (best >= 0 && dt > 1e-9) {
      prev_used[best] = 1;
      const double mvx = (cx - prev[8 * best + 1]) / dt;
      const double mvy = (cy - prev[8 * best + 2]) / dt;
      o[0] = prev[8 * best + 0];
      o[1] = cx;
      o[2] = cy;
      o[3] = vel_alpha * mvx + (1.0 - vel_alpha) * prev[8 * best + 3];
      o[4] = vel_alpha * mvy + (1.0 - vel_alpha) * prev[8 * best + 4];
      o[5] = prev[8 * best + 5] + 1.0;
      o[6] = 0.0;
      o[7] = cr;
    } else {
      o[0] = static_cast<double>((*next_id)++);
      o[1] = cx;
      o[2] = cy;
      o[3] = 0.0;
      o[4] = 0.0;
      o[5] = 0.0;
      o[6] = 0.0;
      o[7] = cr;
    }
    ++n_out;
  }
  for (int p = 0; p < n_prev && n_out < max_out; ++p) {
    if (prev_used[p] || prev[8 * p + 6] + 1.0 > max_missed) continue;
    double* o = out + 8 * n_out;
    o[0] = prev[8 * p + 0];
    o[1] = prev[8 * p + 1] + dt * prev[8 * p + 3];
    o[2] = prev[8 * p + 2] + dt * prev[8 * p + 4];
    o[3] = prev[8 * p + 3];
    o[4] = prev[8 * p + 4];
    o[5] = prev[8 * p + 5] + 1.0;
    o[6] = prev[8 * p + 6] + 1.0;
    o[7] = prev[8 * p + 7];
    ++n_out;
  }
  return n_out;
}

int mpc_costmap_trajectory_feasible(const uint8_t* data, int H, int W,
                                    double ox, double oy, double res,
                                    const double* xs, int n, double radius,
                                    int check_poses,
                                    double min_resolution_angular) {
  const int count = check_poses < 0 ? n : std::min(check_poses, n);
  for (int i = 0; i < count; ++i) {
    if (mpc_costmap_footprint_cost(data, H, W, ox, oy, res, xs[3 * i],
                                   xs[3 * i + 1], radius) < 0.0)
      return 0;
    if (i + 1 < count) {
      double dth = xs[3 * (i + 1) + 2] - xs[3 * i + 2];
      dth = std::fmod(dth + M_PI, 2.0 * M_PI);
      if (dth < 0) dth += 2.0 * M_PI;
      dth = std::fabs(dth - M_PI);
      if (dth > min_resolution_angular) {
        const double mxp = 0.5 * (xs[3 * i] + xs[3 * (i + 1)]);
        const double myp = 0.5 * (xs[3 * i + 1] + xs[3 * (i + 1) + 1]);
        if (mpc_costmap_footprint_cost(data, H, W, ox, oy, res, mxp, myp,
                                       radius) < 0.0)
          return 0;
      }
    }
  }
  return 1;
}

}  // extern "C"
