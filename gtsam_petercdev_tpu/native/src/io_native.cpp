// Native dataset I/O: fast g2o/TORO and BAL parsers.
//
// The reference's dataset layer (gtsam/slam/dataset.cpp readG2o/load2D,
// gtsam/sfm/SfmData.cpp FromBalFile) is C++; this is its TPU-framework
// analog. Parsing is the host-side bottleneck for large datasets
// (City10000: 10^5 lines), so it stays native: one mmap-free streaming pass
// with strtod, zero allocations per line beyond vector growth.
//
// Exposed as a C ABI consumed via ctypes (gtsam_petercdev_tpu/native/__init__.py).

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Vertex2 { long id; double x, y, th; };
struct Vertex3 { long id; double t[3]; double q[4]; };  // q = (w,x,y,z)
struct Edge2 { long i, j; double m[3]; double info[9]; };
struct Edge3 {
  long i, j;
  double t[3];
  double q[4];        // (w,x,y,z); for EDGE3 (euler) converted here
  double info[36];    // row-major 6x6 in the FILE's block order
  int kind;           // 0 = EDGE_SE3:QUAT (t,R file order), 1 = EDGE3 TORO
};

struct G2oData {
  std::vector<Vertex2> v2;
  std::vector<Vertex3> v3;
  std::vector<Edge2> e2;
  std::vector<Edge3> e3;
};

void sym_from_upper(const double* vals, int d, double* M) {
  int idx = 0;
  for (int i = 0; i < d; ++i)
    for (int j = i; j < d; ++j) {
      M[i * d + j] = vals[idx];
      M[j * d + i] = vals[idx];
      ++idx;
    }
}

// yaw-pitch-roll (TORO convention, dataset.cpp:803) -> quaternion (w,x,y,z)
void ypr_to_quat(double yaw, double pitch, double roll, double* q) {
  const double cy = cos(yaw * 0.5), sy = sin(yaw * 0.5);
  const double cp = cos(pitch * 0.5), sp = sin(pitch * 0.5);
  const double cr = cos(roll * 0.5), sr = sin(roll * 0.5);
  q[0] = cr * cp * cy + sr * sp * sy;
  q[1] = sr * cp * cy - cr * sp * sy;
  q[2] = cr * sp * cy + sr * cp * sy;
  q[3] = cr * cp * sy - sr * sp * cy;
}

bool read_doubles(char* s, double* out, int n) {
  char* p = s;
  for (int k = 0; k < n; ++k) {
    char* end = nullptr;
    out[k] = strtod(p, &end);
    if (end == p) return false;
    p = end;
  }
  return true;
}

}  // namespace

extern "C" {

void* g2o_parse(const char* path) {
  FILE* f = fopen(path, "r");
  if (!f) return nullptr;
  auto* d = new G2oData();
  char line[4096];
  while (fgets(line, sizeof(line), f)) {
    char tag[64];
    int consumed = 0;
    if (sscanf(line, "%63s%n", tag, &consumed) != 1) continue;
    char* rest = line + consumed;
    if (!strcmp(tag, "VERTEX_SE2") || !strcmp(tag, "VERTEX2")) {
      double v[4];
      if (read_doubles(rest, v, 4)) {
        d->v2.push_back({(long)v[0], v[1], v[2], v[3]});
      }
    } else if (!strcmp(tag, "VERTEX_SE3:QUAT")) {
      double v[8];
      if (read_doubles(rest, v, 8)) {
        Vertex3 vx;
        vx.id = (long)v[0];
        vx.t[0] = v[1]; vx.t[1] = v[2]; vx.t[2] = v[3];
        // file stores qx qy qz qw -> (w,x,y,z)
        vx.q[0] = v[7]; vx.q[1] = v[4]; vx.q[2] = v[5]; vx.q[3] = v[6];
        d->v3.push_back(vx);
      }
    } else if (!strcmp(tag, "VERTEX3")) {
      double v[7];
      if (read_doubles(rest, v, 7)) {
        Vertex3 vx;
        vx.id = (long)v[0];
        vx.t[0] = v[1]; vx.t[1] = v[2]; vx.t[2] = v[3];
        ypr_to_quat(v[6], v[5], v[4], vx.q);  // roll,pitch,yaw in file order
        d->v3.push_back(vx);
      }
    } else if (!strcmp(tag, "EDGE_SE2") || !strcmp(tag, "EDGE2")) {
      double v[11];
      if (read_doubles(rest, v, 11)) {
        Edge2 e;
        e.i = (long)v[0]; e.j = (long)v[1];
        e.m[0] = v[2]; e.m[1] = v[3]; e.m[2] = v[4];
        const double* iv = v + 5;
        if (!strcmp(tag, "EDGE_SE2")) {
          sym_from_upper(iv, 3, e.info);
        } else {  // TORO ordering (dataset.cpp load2D TORO branch)
          double M[9] = {iv[0], iv[1], iv[4],
                         iv[1], iv[2], iv[5],
                         iv[4], iv[5], iv[3]};
          memcpy(e.info, M, sizeof(M));
        }
        d->e2.push_back(e);
      }
    } else if (!strcmp(tag, "EDGE_SE3:QUAT")) {
      double v[30];
      if (read_doubles(rest, v, 30)) {
        Edge3 e;
        e.i = (long)v[0]; e.j = (long)v[1];
        e.t[0] = v[2]; e.t[1] = v[3]; e.t[2] = v[4];
        e.q[0] = v[8]; e.q[1] = v[5]; e.q[2] = v[6]; e.q[3] = v[7];
        sym_from_upper(v + 9, 6, e.info);
        e.kind = 0;
        d->e3.push_back(e);
      }
    } else if (!strcmp(tag, "EDGE3")) {
      double v[29];
      if (read_doubles(rest, v, 29)) {
        Edge3 e;
        e.i = (long)v[0]; e.j = (long)v[1];
        e.t[0] = v[2]; e.t[1] = v[3]; e.t[2] = v[4];
        ypr_to_quat(v[7], v[6], v[5], e.q);
        sym_from_upper(v + 8, 6, e.info);
        e.kind = 1;
        d->e3.push_back(e);
      }
    }
  }
  fclose(f);
  return d;
}

void g2o_free(void* h) { delete static_cast<G2oData*>(h); }

long g2o_counts(void* h, long* out4) {
  auto* d = static_cast<G2oData*>(h);
  out4[0] = (long)d->v2.size();
  out4[1] = (long)d->v3.size();
  out4[2] = (long)d->e2.size();
  out4[3] = (long)d->e3.size();
  return 0;
}

void g2o_get_v2(void* h, long* ids, double* xyt) {
  auto* d = static_cast<G2oData*>(h);
  for (size_t k = 0; k < d->v2.size(); ++k) {
    ids[k] = d->v2[k].id;
    xyt[3 * k] = d->v2[k].x;
    xyt[3 * k + 1] = d->v2[k].y;
    xyt[3 * k + 2] = d->v2[k].th;
  }
}

void g2o_get_v3(void* h, long* ids, double* t, double* q) {
  auto* d = static_cast<G2oData*>(h);
  for (size_t k = 0; k < d->v3.size(); ++k) {
    ids[k] = d->v3[k].id;
    memcpy(t + 3 * k, d->v3[k].t, 3 * sizeof(double));
    memcpy(q + 4 * k, d->v3[k].q, 4 * sizeof(double));
  }
}

void g2o_get_e2(void* h, long* ij, double* m, double* info) {
  auto* d = static_cast<G2oData*>(h);
  for (size_t k = 0; k < d->e2.size(); ++k) {
    ij[2 * k] = d->e2[k].i;
    ij[2 * k + 1] = d->e2[k].j;
    memcpy(m + 3 * k, d->e2[k].m, 3 * sizeof(double));
    memcpy(info + 9 * k, d->e2[k].info, 9 * sizeof(double));
  }
}

void g2o_get_e3(void* h, long* ij, double* t, double* q, double* info,
                int* kind) {
  auto* d = static_cast<G2oData*>(h);
  for (size_t k = 0; k < d->e3.size(); ++k) {
    ij[2 * k] = d->e3[k].i;
    ij[2 * k + 1] = d->e3[k].j;
    memcpy(t + 3 * k, d->e3[k].t, 3 * sizeof(double));
    memcpy(q + 4 * k, d->e3[k].q, 4 * sizeof(double));
    memcpy(info + 36 * k, d->e3[k].info, 36 * sizeof(double));
    kind[k] = d->e3[k].kind;
  }
}

// --- BAL (sfm/SfmData.cpp FromBalFile) --------------------------------------

struct BalData {
  long n_cams = 0, n_pts = 0, n_obs = 0;
  std::vector<long> cam_idx, pt_idx;
  std::vector<double> uv;       // [n_obs, 2]
  std::vector<double> cameras;  // [n_cams, 9] R(rodrigues 3), t(3), f, k1, k2
  std::vector<double> points;   // [n_pts, 3]
};

void* bal_parse(const char* path) {
  FILE* f = fopen(path, "r");
  if (!f) return nullptr;
  auto* d = new BalData();
  if (fscanf(f, "%ld %ld %ld", &d->n_cams, &d->n_pts, &d->n_obs) != 3) {
    fclose(f);
    delete d;
    return nullptr;
  }
  d->cam_idx.resize(d->n_obs);
  d->pt_idx.resize(d->n_obs);
  d->uv.resize(2 * d->n_obs);
  for (long k = 0; k < d->n_obs; ++k) {
    if (fscanf(f, "%ld %ld %lf %lf", &d->cam_idx[k], &d->pt_idx[k],
               &d->uv[2 * k], &d->uv[2 * k + 1]) != 4) break;
  }
  d->cameras.resize(9 * d->n_cams);
  for (long k = 0; k < 9 * d->n_cams; ++k)
    if (fscanf(f, "%lf", &d->cameras[k]) != 1) break;
  d->points.resize(3 * d->n_pts);
  for (long k = 0; k < 3 * d->n_pts; ++k)
    if (fscanf(f, "%lf", &d->points[k]) != 1) break;
  fclose(f);
  return d;
}

void bal_free(void* h) { delete static_cast<BalData*>(h); }

void bal_counts(void* h, long* out3) {
  auto* d = static_cast<BalData*>(h);
  out3[0] = d->n_cams;
  out3[1] = d->n_pts;
  out3[2] = d->n_obs;
}

void bal_get(void* h, long* cam_idx, long* pt_idx, double* uv, double* cameras,
             double* points) {
  auto* d = static_cast<BalData*>(h);
  memcpy(cam_idx, d->cam_idx.data(), d->n_obs * sizeof(long));
  memcpy(pt_idx, d->pt_idx.data(), d->n_obs * sizeof(long));
  memcpy(uv, d->uv.data(), 2 * d->n_obs * sizeof(double));
  memcpy(cameras, d->cameras.data(), 9 * d->n_cams * sizeof(double));
  memcpy(points, d->points.data(), 3 * d->n_pts * sizeof(double));
}

}  // extern "C"
