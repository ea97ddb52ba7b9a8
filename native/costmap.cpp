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

}  // namespace

extern "C" {

// Extract lethal cells as world-frame point obstacles near the robot.
// Returns the number of points written to out_xy (2 doubles each).
int mpc_costmap_extract_points(const uint8_t* data, int H, int W, double ox,
                               double oy, double res, const double* pose,
                               double behind_dist, double cutoff_dist,
                               uint8_t threshold, double* out_xy,
                               int max_out) {
  const double px = pose[0], py = pose[1], pth = pose[2];
  const double ch = std::cos(pth), sh = std::sin(pth);
  const double cutoff2 = cutoff_dist * cutoff_dist;
  int n = 0;
  for (int y = 0; y < H && n < max_out; ++y) {
    for (int x = 0; x < W && n < max_out; ++x) {
      if (data[y * W + x] < threshold) continue;
      const double wx = ox + (x + 0.5) * res;
      const double wy = oy + (y + 0.5) * res;
      const double dx = wx - px, dy = wy - py;
      const double d2 = dx * dx + dy * dy;
      if (d2 > cutoff2) continue;
      const double forward = dx * ch + dy * sh;
      if (forward < 0.0 && d2 > behind_dist * behind_dist) continue;
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
  std::vector<int32_t> label(static_cast<size_t>(H) * W, -1);
  int n_poly = 0, n_vert = 0;
  std::vector<int> stack;
  for (int y0 = 0; y0 < H; ++y0) {
    for (int x0 = 0; x0 < W; ++x0) {
      const int idx0 = y0 * W + x0;
      if (data[idx0] < threshold || label[idx0] >= 0) continue;
      if (n_poly >= max_polys) return n_poly;
      // flood fill
      std::vector<Pt> cells;
      stack.clear();
      stack.push_back(idx0);
      label[idx0] = n_poly;
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
              label[nidx] = n_poly;
              stack.push_back(nidx);
            }
          }
        }
      }
      if (static_cast<int>(cells.size()) < min_cluster) continue;
      std::vector<Pt> hull = convex_hull(cells);
      const int nv = static_cast<int>(hull.size());
      if (n_vert + nv > max_total_verts) return n_poly;
      for (int i = 0; i < nv; ++i) {
        out_verts[2 * (n_vert + i)] = hull[i].x;
        out_verts[2 * (n_vert + i) + 1] = hull[i].y;
      }
      out_counts[n_poly] = nv;
      n_vert += nv;
      ++n_poly;
    }
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
