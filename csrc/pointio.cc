// Native data-path kernels for the df3d input pipeline.
//
// TPU-native counterpart of the reference's host-side native code paths:
// the CPU spconv voxel generator run inside dataloader workers
// (reference: pcdet data_processor.py wraps spconv Point2VoxelCPU3d, itself
// C++), KITTI .bin decoding, sweep transforms, and the points-in-box tests
// used by gt-database creation (roiaware_pool3d CPU kernels).
//
// Exposed through ctypes (df3d/data/native.py). Built with `make -C csrc`.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Read a float32 .bin point file. Returns number of floats read (or -1).
// Caller supplies a buffer of `cap` floats.
int64_t read_point_bin(const char* path, float* out, int64_t cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t n = (int64_t)fread(out, sizeof(float), (size_t)cap, f);
  fclose(f);
  return n;
}

// Apply a 4x4 row-major transform to xyz of an (n, stride) point array
// in-place (sweep -> key-frame accumulation).
void transform_points(float* pts, int64_t n, int64_t stride, const float* tm) {
  for (int64_t i = 0; i < n; ++i) {
    float* p = pts + i * stride;
    float x = p[0], y = p[1], z = p[2];
    p[0] = tm[0] * x + tm[1] * y + tm[2] * z + tm[3];
    p[1] = tm[4] * x + tm[5] * y + tm[6] * z + tm[7];
    p[2] = tm[8] * x + tm[9] * y + tm[10] * z + tm[11];
  }
}

// CPU hard voxelizer with reference semantics: ARRIVAL order voxel slots,
// first max_points points per voxel, mean feature.
// points (n, f); outputs: voxel features mean (max_voxels, f), coords zyx
// (max_voxels, 3) int32, num_points per voxel, returns num voxels.
int64_t cpu_voxelize(const float* pts, int64_t n, int64_t f,
                     const float* voxel_size, const float* range_min,
                     const int32_t* grid,  // (z, y, x)
                     int64_t max_voxels, int64_t max_points,
                     float* out_feats, int32_t* out_coords,
                     int32_t* out_npoints) {
  std::unordered_map<int64_t, int64_t> slot_of;
  slot_of.reserve((size_t)max_voxels * 2);
  int64_t nv = 0;
  const int64_t zg = grid[0], yg = grid[1], xg = grid[2];
  memset(out_feats, 0, sizeof(float) * (size_t)(max_voxels * f));
  memset(out_npoints, 0, sizeof(int32_t) * (size_t)max_voxels);
  for (int64_t i = 0; i < max_voxels * 3; ++i) out_coords[i] = -1;

  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + i * f;
    int64_t cx = (int64_t)floorf((p[0] - range_min[0]) / voxel_size[0]);
    int64_t cy = (int64_t)floorf((p[1] - range_min[1]) / voxel_size[1]);
    int64_t cz = (int64_t)floorf((p[2] - range_min[2]) / voxel_size[2]);
    if (cx < 0 || cx >= xg || cy < 0 || cy >= yg || cz < 0 || cz >= zg)
      continue;
    int64_t key = (cz * yg + cy) * xg + cx;
    auto it = slot_of.find(key);
    int64_t s;
    if (it == slot_of.end()) {
      if (nv >= max_voxels) continue;
      s = nv++;
      slot_of.emplace(key, s);
      out_coords[s * 3 + 0] = (int32_t)cz;
      out_coords[s * 3 + 1] = (int32_t)cy;
      out_coords[s * 3 + 2] = (int32_t)cx;
    } else {
      s = it->second;
    }
    if (out_npoints[s] >= max_points) continue;
    for (int64_t c = 0; c < f; ++c) out_feats[s * f + c] += p[c];
    out_npoints[s] += 1;
  }
  for (int64_t s = 0; s < nv; ++s) {
    int32_t cnt = out_npoints[s] > 0 ? out_npoints[s] : 1;
    for (int64_t c = 0; c < f; ++c) out_feats[s * f + c] /= (float)cnt;
  }
  return nv;
}

// Points-in-rotated-boxes membership (gt-database creation / collision
// checks; reference roiaware_pool3d CPU kernel). boxes (m, 7) gravity
// center. out (n,) int32 = box index or -1.
void points_in_boxes_cpu(const float* pts, int64_t n, int64_t stride,
                         const float* boxes, int64_t m, int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + i * stride;
    out[i] = -1;
    for (int64_t b = 0; b < m; ++b) {
      const float* box = boxes + b * 7;
      float dx = p[0] - box[0], dy = p[1] - box[1], dz = p[2] - box[2];
      if (fabsf(dz) > box[5] * 0.5f) continue;
      float c = cosf(-box[6]), s = sinf(-box[6]);
      float lx = dx * c - dy * s, ly = dx * s + dy * c;
      if (fabsf(lx) <= box[3] * 0.5f && fabsf(ly) <= box[4] * 0.5f) {
        out[i] = (int32_t)b;
        break;
      }
    }
  }
}

// Camera-FOV crop for KITTI: keep points whose projection falls inside the
// image (proj = 3x4 row-major lidar->image). Writes a keep mask.
void fov_mask(const float* pts, int64_t n, int64_t stride, const float* proj,
              int32_t img_h, int32_t img_w, uint8_t* keep) {
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + i * stride;
    float u = proj[0] * p[0] + proj[1] * p[1] + proj[2] * p[2] + proj[3];
    float v = proj[4] * p[0] + proj[5] * p[1] + proj[6] * p[2] + proj[7];
    float w = proj[8] * p[0] + proj[9] * p[1] + proj[10] * p[2] + proj[11];
    if (w <= 0.1f) { keep[i] = 0; continue; }
    u /= w; v /= w;
    keep[i] = (u >= 0 && u < img_w && v >= 0 && v < img_h) ? 1 : 0;
  }
}

}  // extern "C"
