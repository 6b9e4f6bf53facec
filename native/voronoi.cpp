// 3D Voronoi tessellation by half-space clipping, OpenMP parallel.
//
// Native replacement for the reference's voro++ wrapper
// (reference: src/voro++_wrapper.cpp:43-277 calling libvoro++): for each
// seed particle it computes the Voronoi cell volume and the face-neighbour
// list needed by the device-side traversal (mcfost_tpu/grids/voronoi.py).
//
// Algorithm (same family as voro++): every cell starts as the bounding
// box and is cut by the bisector planes of nearby seeds, visited in
// order of increasing distance from a uniform-grid spatial index; cutting
// stops once the next candidate is farther than twice the radius of the
// farthest remaining vertex (security-radius criterion), which bounds the
// work per cell by its true number of faces.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC voronoi.cpp -o libvoronoi.so
//
// C ABI (ctypes):
//   voronoi_tessellate(n, pts[3n], bbox[6], max_nb,
//                      volumes[n], neighbours[n*max_nb], n_nb[n],
//                      max_vertex_r[n])
// neighbours: >=0 seed index; -1..-6 box walls (-1-w); INT_MIN none.
// Returns 0, or k>0 = number of cells whose neighbour list overflowed
// max_nb (caller should retry with a larger max_nb).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator*(double s, V3 a) { return {s * a.x, s * a.y, s * a.z}; }
static inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

struct Face {
  int neighbour;            // seed id, or -1-w for box wall w
  std::vector<V3> v;        // polygon vertices (ordered)
};

// Clip a convex polyhedron (face soup) by half-space dot(n,x) <= d.
// Returns false if the cell was fully outside (degenerate).
bool clip(std::vector<Face> &faces, V3 n, double d, int nb_id, double eps) {
  // quick reject/accept
  bool any_out = false, any_in = false;
  for (const auto &f : faces)
    for (const auto &p : f.v) {
      if (dot(n, p) - d > eps) any_out = true;
      else any_in = true;
    }
  if (!any_out) return true;    // plane does not cut the cell
  if (!any_in) { faces.clear(); return false; }

  std::vector<V3> ring;         // intersection points forming the new face
  for (auto &f : faces) {
    std::vector<V3> out;
    const size_t m = f.v.size();
    for (size_t i = 0; i < m; ++i) {
      const V3 &a = f.v[i];
      const V3 &b = f.v[(i + 1) % m];
      const double da = dot(n, a) - d;
      const double db = dot(n, b) - d;
      if (da <= eps) out.push_back(a);
      if ((da < -eps && db > eps) || (da > eps && db < -eps)) {
        const double t = da / (da - db);
        V3 p = a + t * (b - a);
        out.push_back(p);
        ring.push_back(p);
      }
    }
    f.v.swap(out);
  }
  faces.erase(std::remove_if(faces.begin(), faces.end(),
                             [](const Face &f) { return f.v.size() < 3; }),
              faces.end());
  if (ring.size() >= 3) {
    // order the ring points around the plane normal
    V3 c{0, 0, 0};
    for (const auto &p : ring) c = c + p;
    c = (1.0 / ring.size()) * c;
    // plane basis
    V3 ax = std::fabs(n.x) < 0.9 ? V3{1, 0, 0} : V3{0, 1, 0};
    V3 e1 = cross(n, ax);
    const double l1 = std::sqrt(dot(e1, e1));
    e1 = (1.0 / std::max(l1, 1e-300)) * e1;
    V3 e2 = cross(n, e1);
    std::sort(ring.begin(), ring.end(), [&](const V3 &a, const V3 &b) {
      const V3 ra = a - c, rb = b - c;
      return std::atan2(dot(ra, e2), dot(ra, e1)) <
             std::atan2(dot(rb, e2), dot(rb, e1));
    });
    // drop duplicate consecutive points
    std::vector<V3> uniq;
    for (const auto &p : ring) {
      if (uniq.empty()) { uniq.push_back(p); continue; }
      const V3 dlt = p - uniq.back();
      if (dot(dlt, dlt) > eps * eps) uniq.push_back(p);
    }
    if (uniq.size() >= 3) faces.push_back(Face{nb_id, std::move(uniq)});
  }
  return !faces.empty();
}

double cell_volume(const std::vector<Face> &faces, V3 p0) {
  // p0 is strictly inside the convex cell: each face contributes the
  // volume of its pyramid to p0, |.| taken per face so mixed polygon
  // windings cannot cancel
  double vol = 0.0;
  for (const auto &f : faces) {
    double fv = 0.0;
    for (size_t i = 1; i + 1 < f.v.size(); ++i) {
      const V3 a = f.v[0] - p0, b = f.v[i] - p0, c = f.v[i + 1] - p0;
      fv += dot(a, cross(b, c));
    }
    vol += std::fabs(fv);
  }
  return vol / 6.0;
}

// uniform-grid spatial index
struct GridIndex {
  double x0, y0, z0, hx, hy, hz;
  int nx, ny, nz;
  std::vector<int> start;     // CSR offsets (nx*ny*nz + 1)
  std::vector<int> ids;

  int bin(double x, double y, double z) const {
    int i = std::min(nx - 1, std::max(0, (int)((x - x0) / hx)));
    int j = std::min(ny - 1, std::max(0, (int)((y - y0) / hy)));
    int k = std::min(nz - 1, std::max(0, (int)((z - z0) / hz)));
    return (k * ny + j) * nx + i;
  }
};

GridIndex build_index(int64_t n, const double *pts, const double *bbox) {
  GridIndex g;
  const int target = std::max(1, (int)std::cbrt((double)n / 4.0));
  g.nx = g.ny = g.nz = target;
  g.x0 = bbox[0]; g.y0 = bbox[2]; g.z0 = bbox[4];
  g.hx = (bbox[1] - bbox[0]) / g.nx;
  g.hy = (bbox[3] - bbox[2]) / g.ny;
  g.hz = (bbox[5] - bbox[4]) / g.nz;
  const int nbins = g.nx * g.ny * g.nz;
  std::vector<int> count(nbins, 0);
  for (int64_t i = 0; i < n; ++i)
    count[g.bin(pts[3 * i], pts[3 * i + 1], pts[3 * i + 2])]++;
  g.start.assign(nbins + 1, 0);
  for (int b = 0; b < nbins; ++b) g.start[b + 1] = g.start[b] + count[b];
  g.ids.resize(n);
  std::vector<int> cur(g.start.begin(), g.start.end() - 1);
  for (int64_t i = 0; i < n; ++i) {
    const int b = g.bin(pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]);
    g.ids[cur[b]++] = (int)i;
  }
  return g;
}

}  // namespace

extern "C" int voronoi_tessellate(int64_t n, const double *pts,
                                  const double *bbox, int max_nb,
                                  double *volumes, int *neighbours,
                                  int *n_nb, double *max_vertex_r) {
  const GridIndex g = build_index(n, pts, bbox);
  const double diag = std::sqrt(
      (bbox[1] - bbox[0]) * (bbox[1] - bbox[0]) +
      (bbox[3] - bbox[2]) * (bbox[3] - bbox[2]) +
      (bbox[5] - bbox[4]) * (bbox[5] - bbox[4]));
  const double eps = 1e-12 * diag;
  int n_overflow = 0;

#pragma omp parallel for schedule(dynamic, 16) reduction(+ : n_overflow)
  for (int64_t i = 0; i < n; ++i) {
    const V3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};

    // initial cell = bounding box (walls -1..-6)
    std::vector<Face> faces;
    const double X0 = bbox[0], X1 = bbox[1], Y0 = bbox[2], Y1 = bbox[3],
                 Z0 = bbox[4], Z1 = bbox[5];
    faces.push_back({-1, {{X0, Y0, Z0}, {X0, Y1, Z0}, {X0, Y1, Z1}, {X0, Y0, Z1}}});
    faces.push_back({-2, {{X1, Y0, Z0}, {X1, Y0, Z1}, {X1, Y1, Z1}, {X1, Y1, Z0}}});
    faces.push_back({-3, {{X0, Y0, Z0}, {X0, Y0, Z1}, {X1, Y0, Z1}, {X1, Y0, Z0}}});
    faces.push_back({-4, {{X0, Y1, Z0}, {X1, Y1, Z0}, {X1, Y1, Z1}, {X0, Y1, Z1}}});
    faces.push_back({-5, {{X0, Y0, Z0}, {X1, Y0, Z0}, {X1, Y1, Z0}, {X0, Y1, Z0}}});
    faces.push_back({-6, {{X0, Y0, Z1}, {X0, Y1, Z1}, {X1, Y1, Z1}, {X1, Y0, Z1}}});

    // gather candidates ring by ring from the spatial index, sorted by
    // distance; stop via the security-radius criterion
    struct Cand { double d2; int id; };
    std::vector<Cand> cands;
    const int bi = std::min(g.nx - 1, std::max(0, (int)((p.x - g.x0) / g.hx)));
    const int bj = std::min(g.ny - 1, std::max(0, (int)((p.y - g.y0) / g.hy)));
    const int bk = std::min(g.nz - 1, std::max(0, (int)((p.z - g.z0) / g.hz)));
    const double hmin = std::min(g.hx, std::min(g.hy, g.hz));
    const int rmax_ring =
        std::max(g.nx, std::max(g.ny, g.nz));

    auto max_r2 = [&]() {
      double m = 0.0;
      for (const auto &f : faces)
        for (const auto &v : f.v) {
          const V3 d = v - p;
          m = std::max(m, dot(d, d));
        }
      return m;
    };

    double security2 = std::numeric_limits<double>::max();
    for (int ring = 0; ring <= rmax_ring; ++ring) {
      // no candidate of this or any later ring can be nearer than
      // (ring-1)*hmin: once that exceeds the security radius, the cell
      // is complete
      if (ring > 0) {
        const double ring_min = (ring - 1) * hmin;
        if (ring_min * ring_min > security2) break;
      }
      cands.clear();
      // collect the shell of bins at Chebyshev distance `ring`
      for (int dk = -ring; dk <= ring; ++dk)
        for (int dj = -ring; dj <= ring; ++dj)
          for (int di = -ring; di <= ring; ++di) {
            if (std::max(std::abs(di), std::max(std::abs(dj), std::abs(dk)))
                != ring)
              continue;
            const int ii = bi + di, jj = bj + dj, kk = bk + dk;
            if (ii < 0 || ii >= g.nx || jj < 0 || jj >= g.ny || kk < 0 ||
                kk >= g.nz)
              continue;
            const int b = (kk * g.ny + jj) * g.nx + ii;
            for (int s = g.start[b]; s < g.start[b + 1]; ++s) {
              const int id = g.ids[s];
              if (id == (int)i) continue;
              const V3 q{pts[3 * id], pts[3 * id + 1], pts[3 * id + 2]};
              const V3 d = q - p;
              const double d2 = dot(d, d);
              if (d2 < eps * eps) continue;   // duplicate seed
              cands.push_back({d2, id});
            }
          }
      std::sort(cands.begin(), cands.end(),
                [](const Cand &a, const Cand &b) { return a.d2 < b.d2; });
      for (const auto &c : cands) {
        if (c.d2 > security2) continue;   // cannot cut; later rings may
                                          // still hold nearer seeds
        const V3 q{pts[3 * c.id], pts[3 * c.id + 1], pts[3 * c.id + 2]};
        const V3 nv = q - p;
        // bisector plane: dot(nv, x) <= dot(nv, (p+q)/2)
        const double d = 0.5 * (dot(nv, q) + dot(nv, p));
        if (!clip(faces, nv, d, c.id, eps)) break;
        security2 = 4.0 * max_r2();
      }
    }

    volumes[i] = cell_volume(faces, p);
    max_vertex_r[i] = std::sqrt(max_r2());
    int cnt = 0;
    int *nb = neighbours + (size_t)i * max_nb;
    for (int s = 0; s < max_nb; ++s) nb[s] = std::numeric_limits<int>::min();
    for (const auto &f : faces) {
      if (cnt >= max_nb) { n_overflow++; break; }
      nb[cnt++] = f.neighbour;
    }
    n_nb[i] = cnt;
  }
  return n_overflow;
}
