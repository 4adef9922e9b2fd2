// Native geometry core: C++ twins of the host-side scene-construction
// pipeline (the reference keeps these in PyFleX/core/: convex.h hull
// building, voxelize.cpp triangle voxelization, sdf.cpp distance fields,
// helpers.h:154-260 CreateParticleShape voxel fill).
//
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).
// The Python package loads this library when present and falls back to
// the NumPy implementations in core/geometry.py otherwise; both paths
// produce identical occupancy (parity-tested in tests/test_native.py).
//
// Build: make -C dyn_res_pile_manip_tpu/native

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

inline Vec3 sub(const Vec3 &a, const Vec3 &b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
inline Vec3 cross(const Vec3 &a, const Vec3 &b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
inline double dot(const Vec3 &a, const Vec3 &b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

// Solve the 3x3 system N p = d for the intersection of three planes.
bool plane_triple(const double *n0, const double *n1, const double *n2,
                  double d0, double d1, double d2, Vec3 *out) {
  const double a = n0[0], b = n0[1], c = n0[2];
  const double d = n1[0], e = n1[1], f = n1[2];
  const double g = n2[0], h = n2[1], i = n2[2];
  const double det =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g);
  if (std::fabs(det) < 1e-9) return false;
  const double inv = 1.0 / det;
  out->x = inv * ((e * i - f * h) * d0 - (b * i - c * h) * d1 +
                  (b * f - c * e) * d2);
  out->y = inv * (-(d * i - f * g) * d0 + (a * i - c * g) * d1 -
                  (a * f - c * d) * d2);
  out->z = inv * ((d * h - e * g) * d0 - (a * h - b * g) * d1 +
                  (a * e - b * d) * d2);
  return true;
}

}  // namespace

extern "C" {

// Vertices of the polytope {x : n_i . x <= d_i} by plane-triple
// intersection. normals: (P,3) row-major, offsets: (P,).
// out_verts: capacity max_verts*3. Returns the vertex count (deduped).
int kdop_vertices(const double *normals, const double *offsets, int n_planes,
                  double *out_verts, int max_verts) {
  std::vector<Vec3> verts;
  for (int i = 0; i < n_planes; ++i) {
    for (int j = i + 1; j < n_planes; ++j) {
      for (int k = j + 1; k < n_planes; ++k) {
        Vec3 p;
        if (!plane_triple(normals + 3 * i, normals + 3 * j, normals + 3 * k,
                          offsets[i], offsets[j], offsets[k], &p)) {
          continue;
        }
        bool inside = true;
        for (int q = 0; q < n_planes; ++q) {
          const double nd = normals[3 * q] * p.x + normals[3 * q + 1] * p.y +
                            normals[3 * q + 2] * p.z;
          if (nd > offsets[q] + 1e-6 * (1.0 + std::fabs(offsets[q]))) {
            inside = false;
            break;
          }
        }
        if (!inside) continue;
        bool dup = false;
        for (const Vec3 &v : verts) {
          if (std::fabs(v.x - p.x) < 1e-9 && std::fabs(v.y - p.y) < 1e-9 &&
              std::fabs(v.z - p.z) < 1e-9) {
            dup = true;
            break;
          }
        }
        if (!dup) verts.push_back(p);
      }
    }
  }
  const int n = static_cast<int>(verts.size());
  const int m = n < max_verts ? n : max_verts;
  for (int i = 0; i < m; ++i) {
    out_verts[3 * i] = verts[i].x;
    out_verts[3 * i + 1] = verts[i].y;
    out_verts[3 * i + 2] = verts[i].z;
  }
  return n;
}

// Occupancy of a convex solid on the CreateParticleShape grid
// (helpers.h:170-250 layout): the chunk is rescaled so its largest AABB
// edge equals `scale`, grid of max_dim^3 voxels of size `spacing` starting
// at grid_lower (computed here exactly as the NumPy path does).
// Outputs: occupancy (max_dim^3 uint8, x-major), centers_lower (3).
// Returns max_dim, or -1 on capacity overflow.
int convex_fill_grid(const double *normals, const double *offsets,
                     int n_planes, const double *mesh_lower,
                     const double *mesh_upper, double scale, double spacing,
                     uint8_t *occupancy, int max_dim_cap,
                     double *grid_lower_out) {
  const double ex = mesh_upper[0] - mesh_lower[0];
  const double ey = mesh_upper[1] - mesh_lower[1];
  const double ez = mesh_upper[2] - mesh_lower[2];
  const double max_edge = std::fmax(ex, std::fmax(ey, ez));
  const double s = scale / max_edge;
  const double edges[3] = {ex * s, ey * s, ez * s};
  const double spacing_eps = spacing * (1.0 - 1e-4);

  long d[3];
  for (int a = 0; a < 3; ++a) {
    d[a] = spacing > edges[a]
               ? 1
               : std::max(1L, static_cast<long>(edges[a] / spacing_eps));
  }
  int max_dim = static_cast<int>(std::max(d[0], std::max(d[1], d[2]))) + 4;
  if (max_dim > max_dim_cap) return -1;

  double grid_lower[3];
  for (int a = 0; a < 3; ++a) {
    grid_lower[a] = -2.0 * spacing -
                    0.5 * (spacing - (edges[a] - (d[a] - 1) * spacing));
    grid_lower_out[a] = grid_lower[a];
  }

  std::memset(occupancy, 0, static_cast<size_t>(max_dim) * max_dim * max_dim);
  for (int gx = 0; gx < max_dim; ++gx) {
    for (int gy = 0; gy < max_dim; ++gy) {
      for (int gz = 0; gz < max_dim; ++gz) {
        const double cx = grid_lower[0] + spacing * (gx + 0.5);
        const double cy = grid_lower[1] + spacing * (gy + 0.5);
        const double cz = grid_lower[2] + spacing * (gz + 0.5);
        // back to the chunk's original frame
        const double ox = cx / s + mesh_lower[0];
        const double oy = cy / s + mesh_lower[1];
        const double oz = cz / s + mesh_lower[2];
        bool inside = true;
        for (int q = 0; q < n_planes; ++q) {
          const double nd = normals[3 * q] * ox + normals[3 * q + 1] * oy +
                            normals[3 * q + 2] * oz;
          if (nd > offsets[q] + 1e-9) {
            inside = false;
            break;
          }
        }
        if (inside) {
          occupancy[(static_cast<size_t>(gx) * max_dim + gy) * max_dim + gz] =
              1;
        }
      }
    }
  }
  return max_dim;
}

// Triangle-mesh voxelization by x-axis ray parity (the approach of the
// reference's core/voxelize.cpp): a voxel center is inside if a ray along
// +x crosses the surface an odd number of times.
// vertices: (V,3), indices: (T,3) int32. Grid: dims (dx,dy,dz) voxels of
// size `spacing` from `lower`. occupancy: dx*dy*dz uint8, x-major.
void voxelize_mesh(const double *vertices, int n_vertices,
                   const int32_t *indices, int n_tris, const double *lower,
                   double spacing, int dx, int dy, int dz,
                   uint8_t *occupancy) {
  (void)n_vertices;
  std::memset(occupancy, 0, static_cast<size_t>(dx) * dy * dz);
  // For each (y,z) voxel-center ray, collect crossings with all triangles.
  std::vector<double> hits;
  for (int gy = 0; gy < dy; ++gy) {
    // tiny irrational offsets keep rays off triangle edges
    const double py = lower[1] + spacing * (gy + 0.5) + 1.2345e-7;
    for (int gz = 0; gz < dz; ++gz) {
      const double pz = lower[2] + spacing * (gz + 0.5) + 2.7183e-7;
      hits.clear();
      for (int t = 0; t < n_tris; ++t) {
        const double *a = vertices + 3 * indices[3 * t];
        const double *b = vertices + 3 * indices[3 * t + 1];
        const double *c = vertices + 3 * indices[3 * t + 2];
        // 2D point-in-triangle in the (y,z) plane
        const double d1 = (b[1] - a[1]) * (pz - a[2]) -
                          (b[2] - a[2]) * (py - a[1]);
        const double d2 = (c[1] - b[1]) * (pz - b[2]) -
                          (c[2] - b[2]) * (py - b[1]);
        const double d3 = (a[1] - c[1]) * (pz - c[2]) -
                          (a[2] - c[2]) * (py - c[1]);
        const bool neg = (d1 < 0) || (d2 < 0) || (d3 < 0);
        const bool pos = (d1 > 0) || (d2 > 0) || (d3 > 0);
        if (neg && pos) continue;
        // barycentric interpolation of the x crossing
        const double det = (b[1] - a[1]) * (c[2] - a[2]) -
                           (c[1] - a[1]) * (b[2] - a[2]);
        if (std::fabs(det) < 1e-14) continue;
        const double w1 = ((py - a[1]) * (c[2] - a[2]) -
                           (pz - a[2]) * (c[1] - a[1])) / det;
        const double w2 = ((b[1] - a[1]) * (pz - a[2]) -
                           (b[2] - a[2]) * (py - a[1])) / det;
        const double x = a[0] + w1 * (b[0] - a[0]) + w2 * (c[0] - a[0]);
        hits.push_back(x);
      }
      if (hits.empty()) continue;
      for (int gx = 0; gx < dx; ++gx) {
        const double px = lower[0] + spacing * (gx + 0.5);
        int crossings = 0;
        for (double h : hits) {
          if (h > px) ++crossings;
        }
        if (crossings & 1) {
          occupancy[(static_cast<size_t>(gx) * dy + gy) * dz + gz] = 1;
        }
      }
    }
  }
}

// Chamfer-style unsigned distance transform of an occupancy grid in voxel
// units (the role of the reference's core/sdf.cpp MakeSDF): two-pass 3D
// chamfer sweep; occupied voxels get distance 0, free voxels the distance
// to the nearest occupied voxel (approximate, a-b-c metric 1, sqrt2, sqrt3).
void occupancy_sdf(const uint8_t *occupancy, int dx, int dy, int dz,
                   float *dist) {
  const float INF = 1e9f;
  const float W[3] = {1.0f, 1.41421356f, 1.73205081f};
  const size_t n = static_cast<size_t>(dx) * dy * dz;
  for (size_t i = 0; i < n; ++i) dist[i] = occupancy[i] ? 0.0f : INF;
  auto at = [&](int x, int y, int z) -> float & {
    return dist[(static_cast<size_t>(x) * dy + y) * dz + z];
  };
  // forward + backward sweeps over the 26-neighborhood half-masks
  for (int pass = 0; pass < 2; ++pass) {
    const int x0 = pass == 0 ? 0 : dx - 1, x1 = pass == 0 ? dx : -1;
    const int step = pass == 0 ? 1 : -1;
    for (int x = x0; x != x1; x += step) {
      for (int y = (pass == 0 ? 0 : dy - 1); y != (pass == 0 ? dy : -1);
           y += step) {
        for (int z = (pass == 0 ? 0 : dz - 1); z != (pass == 0 ? dz : -1);
             z += step) {
          float best = at(x, y, z);
          for (int ox = -1; ox <= 1; ++ox) {
            for (int oy = -1; oy <= 1; ++oy) {
              for (int oz = -1; oz <= 1; ++oz) {
                if (ox == 0 && oy == 0 && oz == 0) continue;
                // only the half already visited in this pass
                if (step * (ox * 9 + oy * 3 + oz) >= 0) continue;
                const int nx = x + ox, ny = y + oy, nz = z + oz;
                if (nx < 0 || ny < 0 || nz < 0 || nx >= dx || ny >= dy ||
                    nz >= dz) {
                  continue;
                }
                const int m = std::abs(ox) + std::abs(oy) + std::abs(oz);
                const float cand = at(nx, ny, nz) + W[m - 1];
                if (cand < best) best = cand;
              }
            }
          }
          at(x, y, z) = best;
        }
      }
    }
  }
}

}  // extern "C"
