// C ABI shim: engine-side octree SDF evaluation without Python/JAX.
//
// Native equivalent of the reference's SdfLibUnity shared library
// (reference: src/tools/SdfLibUnity/SdfExportFunc.h:16-59 — createOctreeSdf,
// getDistance(AndGradient), saveSdf/loadSdf, getOctreeData/Size/
// getStartGridSize/getBBMinPoint/getBBSize, deleteSdf). Loads the cereal
// PortableBinaryArchive .bin container written by sdflib_tpu.io
// (and by the reference itself) and evaluates the flat-array octree with
// the identical descent + tricubic polynomial semantics as the JAX query
// path (sdflib_tpu/sdf/octree.py): leaf bit 31, 29-bit children index,
// roundFloat >= 0.5 child selection, out-of-box = box SDF + minBorderValue.
//
// Build: g++ -O2 -shared -fPIC -fopenmp -o _sdflib_c.so sdflib_c.cpp
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

constexpr uint32_t IS_LEAF = 0x80000000u;
constexpr uint32_t MARK = 0x40000000u;
constexpr uint32_t CHILD_MASK = ~(IS_LEAF | MARK);

struct OctreeSdf {
  float bb_min[3];
  float bb_max[3];
  int32_t start_grid_size;
  uint32_t max_depth;
  float value_range;
  float min_border_value;
  std::vector<uint32_t> data;
};

// ---- tricubic polynomial, coefficient index c = i + 4j + 16k ------------
inline float tricubic_eval(const float* c, float x, float y, float z) {
  float xp[4] = {1.f, x, x * x, x * x * x};
  float yp[4] = {1.f, y, y * y, y * y * y};
  float zp[4] = {1.f, z, z * z, z * z * z};
  float acc = 0.f;
  for (int k = 0; k < 4; ++k)
    for (int j = 0; j < 4; ++j) {
      float w = yp[j] * zp[k];
      const float* row = c + 4 * j + 16 * k;
      acc += w * (row[0] * xp[0] + row[1] * xp[1] + row[2] * xp[2] +
                  row[3] * xp[3]);
    }
  return acc;
}

inline void tricubic_grad(const float* c, float x, float y, float z,
                          float g[3]) {
  float xp[4] = {1.f, x, x * x, x * x * x};
  float yp[4] = {1.f, y, y * y, y * y * y};
  float zp[4] = {1.f, z, z * z, z * z * z};
  float dx[4] = {0.f, 1.f, 2.f * x, 3.f * x * x};
  float dy[4] = {0.f, 1.f, 2.f * y, 3.f * y * y};
  float dz[4] = {0.f, 1.f, 2.f * z, 3.f * z * z};
  g[0] = g[1] = g[2] = 0.f;
  for (int k = 0; k < 4; ++k)
    for (int j = 0; j < 4; ++j)
      for (int i = 0; i < 4; ++i) {
        float cv = c[i + 4 * j + 16 * k];
        g[0] += cv * dx[i] * yp[j] * zp[k];
        g[1] += cv * xp[i] * dy[j] * zp[k];
        g[2] += cv * xp[i] * yp[j] * dz[k];
      }
}

// Axis-aligned box SDF (utils/Mesh.h:42-63 semantics).
inline float box_distance(const OctreeSdf& o, const float p[3]) {
  float q[3], mx = -1e30f;
  for (int a = 0; a < 3; ++a) {
    float cmid = 0.5f * (o.bb_min[a] + o.bb_max[a]);
    float half = 0.5f * (o.bb_max[a] - o.bb_min[a]);
    q[a] = std::fabs(p[a] - cmid) - half;
    mx = std::max(mx, q[a]);
  }
  float ox = std::max(q[0], 0.f), oy = std::max(q[1], 0.f),
        oz = std::max(q[2], 0.f);
  return std::sqrt(ox * ox + oy * oy + oz * oz) + std::min(mx, 0.f);
}

inline const float* descend(const OctreeSdf& o, const float p[3],
                            float frac_out[3]) {
  const int s = o.start_grid_size;
  const float size = o.bb_max[0] - o.bb_min[0];
  const float cell = size / static_cast<float>(s);
  int ic[3];
  float frac[3];
  for (int a = 0; a < 3; ++a) {
    float f = (p[a] - o.bb_min[a]) / cell;
    float fl = std::floor(f);
    int i = static_cast<int>(fl);
    i = i < 0 ? 0 : (i >= s ? s - 1 : i);
    ic[a] = i;
    frac[a] = f - fl;
  }
  uint32_t node = o.data[(ic[2] * s + ic[1]) * s + ic[0]];
  while (!(node & IS_LEAF)) {
    uint32_t child = (frac[2] >= 0.5f ? 4u : 0u) |
                     (frac[1] >= 0.5f ? 2u : 0u) |
                     (frac[0] >= 0.5f ? 1u : 0u);
    node = o.data[(node & CHILD_MASK) + child];
    for (int a = 0; a < 3; ++a) {
      frac[a] *= 2.f;
      frac[a] -= std::floor(frac[a]);
    }
  }
  std::memcpy(frac_out, frac, sizeof(frac));
  return reinterpret_cast<const float*>(o.data.data() + (node & CHILD_MASK));
}

inline bool in_box(const OctreeSdf& o, const float p[3]) {
  for (int a = 0; a < 3; ++a)
    if (p[a] < o.bb_min[a] || p[a] > o.bb_max[a]) return false;
  return true;
}

inline float distance_one(const OctreeSdf& o, const float p[3]) {
  if (!in_box(o, p)) return box_distance(o, p) + o.min_border_value;
  float frac[3];
  const float* c = descend(o, p, frac);
  return tricubic_eval(c, frac[0], frac[1], frac[2]);
}

}  // namespace

extern "C" {

// loadSdf role (SdfExportFunc.h) — .bin container (OCTREE format only).
void* sdflib_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto fail = [&]() -> void* {
    std::fclose(f);
    return nullptr;
  };
  uint8_t endian;
  int32_t fmt;
  if (std::fread(&endian, 1, 1, f) != 1 || endian != 1) return fail();
  if (std::fread(&fmt, 4, 1, f) != 1 || fmt != 1 /* OCTREE */) return fail();
  auto* o = new OctreeSdf();
  uint64_t n = 0;
  bool ok = std::fread(o->bb_min, 4, 3, f) == 3 &&
            std::fread(o->bb_max, 4, 3, f) == 3 &&
            std::fread(&o->start_grid_size, 4, 1, f) == 1 &&
            std::fread(&o->max_depth, 4, 1, f) == 1 &&
            std::fread(&o->value_range, 4, 1, f) == 1 &&
            std::fread(&o->min_border_value, 4, 1, f) == 1 &&
            std::fread(&n, 8, 1, f) == 1;
  if (ok) {
    o->data.resize(n);
    ok = std::fread(o->data.data(), 4, n, f) == n;
  }
  std::fclose(f);
  if (!ok) {
    delete o;
    return nullptr;
  }
  return o;
}

// createOctreeSdf-from-memory role: engine already holds the flat array.
void* sdflib_create_from_data(const uint32_t* data, uint64_t n,
                              const float bb_min[3], float bb_size,
                              int32_t start_grid_size, uint32_t max_depth,
                              float value_range, float min_border_value) {
  auto* o = new OctreeSdf();
  for (int a = 0; a < 3; ++a) {
    o->bb_min[a] = bb_min[a];
    o->bb_max[a] = bb_min[a] + bb_size;
  }
  o->start_grid_size = start_grid_size;
  o->max_depth = max_depth;
  o->value_range = value_range;
  o->min_border_value = min_border_value;
  o->data.assign(data, data + n);
  return o;
}

int sdflib_save(void* h, const char* path) {
  auto* o = static_cast<OctreeSdf*>(h);
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint8_t endian = 1;
  int32_t fmt = 1;
  uint64_t n = o->data.size();
  std::fwrite(&endian, 1, 1, f);
  std::fwrite(&fmt, 4, 1, f);
  std::fwrite(o->bb_min, 4, 3, f);
  std::fwrite(o->bb_max, 4, 3, f);
  std::fwrite(&o->start_grid_size, 4, 1, f);
  std::fwrite(&o->max_depth, 4, 1, f);
  std::fwrite(&o->value_range, 4, 1, f);
  std::fwrite(&o->min_border_value, 4, 1, f);
  std::fwrite(&n, 8, 1, f);
  std::fwrite(o->data.data(), 4, n, f);
  std::fclose(f);
  return 0;
}

void sdflib_delete(void* h) { delete static_cast<OctreeSdf*>(h); }

float sdflib_get_distance(void* h, float x, float y, float z) {
  const float p[3] = {x, y, z};
  return distance_one(*static_cast<OctreeSdf*>(h), p);
}

float sdflib_get_distance_gradient(void* h, float x, float y, float z,
                                   float grad_out[3]) {
  auto& o = *static_cast<OctreeSdf*>(h);
  const float p[3] = {x, y, z};
  if (!in_box(o, p)) {
    // gradient of the box SDF via central differences (out-of-box only)
    const float e = 1e-4f;
    for (int a = 0; a < 3; ++a) {
      float pp[3] = {x, y, z}, pm[3] = {x, y, z};
      pp[a] += e;
      pm[a] -= e;
      grad_out[a] = (box_distance(o, pp) - box_distance(o, pm)) / (2 * e);
    }
    return box_distance(o, p) + o.min_border_value;
  }
  float frac[3];
  const float* c = descend(o, p, frac);
  float g[3];
  tricubic_grad(c, frac[0], frac[1], frac[2], g);
  float len = std::sqrt(g[0] * g[0] + g[1] * g[1] + g[2] * g[2]);
  float inv = len > 1e-30f ? 1.f / len : 0.f;
  for (int a = 0; a < 3; ++a) grad_out[a] = g[a] * inv;
  return tricubic_eval(c, frac[0], frac[1], frac[2]);
}

void sdflib_get_distance_batch(void* h, const float* pts, uint64_t n,
                               float* out) {
  auto& o = *static_cast<OctreeSdf*>(h);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < static_cast<int64_t>(n); ++i) {
    out[i] = distance_one(o, pts + 3 * i);
  }
}

const uint32_t* sdflib_octree_data(void* h) {
  return static_cast<OctreeSdf*>(h)->data.data();
}

uint64_t sdflib_octree_data_size(void* h) {
  return static_cast<OctreeSdf*>(h)->data.size();
}

int32_t sdflib_start_grid_size(void* h) {
  return static_cast<OctreeSdf*>(h)->start_grid_size;
}

void sdflib_bb_min(void* h, float out[3]) {
  std::memcpy(out, static_cast<OctreeSdf*>(h)->bb_min, 12);
}

float sdflib_bb_size(void* h) {
  auto* o = static_cast<OctreeSdf*>(h);
  return o->bb_max[0] - o->bb_min[0];
}

}  // extern "C"
