// Native data-loader kernels for mhada_tpu.
//
// The SceneFlow pipeline parses .pfm/.flo flow files, bilinearly rescales
// flow fields, and builds forward/backward consistency masks for every
// training sample (reference datasets.py:201-231 does this in Python/torch
// inside DataLoader workers; flowlib.py:34-115 parses the files in pure
// Python).  These C implementations keep loader threads off the Python
// interpreter so host-side decode overlaps TPU steps.
//
// Build: see Makefile (g++ -O3 -shared -fPIC).  Python binding: ctypes
// (mhada_tpu/data/native.py) with a numpy fallback when the library is
// unavailable.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- PFM ----

// Query dims: returns 0 on success. channels is 3 ("PF") or 1 ("Pf").
int pfm_header(const char* path, int* height, int* width, int* channels,
               float* scale) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char tag[8] = {0};
  if (fscanf(f, "%7s", tag) != 1) { fclose(f); return -2; }
  int ch;
  if (strcmp(tag, "PF") == 0) ch = 3;
  else if (strcmp(tag, "Pf") == 0) ch = 1;
  else { fclose(f); return -3; }
  int w, h;
  float sc;
  if (fscanf(f, "%d %d %f", &w, &h, &sc) != 3) { fclose(f); return -4; }
  *height = h; *width = w; *channels = ch; *scale = sc;
  fclose(f);
  return 0;
}

// Read pixel data into out (h*w*c floats, top-down row order like the
// Python reader: PFM stores rows bottom-up; negative scale = little-endian).
int pfm_read(const char* path, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char tag[8] = {0};
  int w, h;
  float sc;
  if (fscanf(f, "%7s %d %d %f", tag, &w, &h, &sc) != 4) {
    fclose(f);
    return -2;
  }
  int ch = (strcmp(tag, "PF") == 0) ? 3 : 1;
  fgetc(f);  // single whitespace after the scale line
  const size_t row = static_cast<size_t>(w) * ch;
  std::vector<float> buf(row);
  const bool swap = sc > 0;  // big-endian file on little-endian host
  for (int y = h - 1; y >= 0; --y) {
    if (fread(buf.data(), 4, row, f) != row) { fclose(f); return -3; }
    if (swap) {
      for (size_t i = 0; i < row; ++i) {
        uint32_t v;
        memcpy(&v, &buf[i], 4);
        v = __builtin_bswap32(v);
        memcpy(&buf[i], &v, 4);
      }
    }
    memcpy(out + static_cast<size_t>(y) * row, buf.data(), row * 4);
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------- FLO ----

int flo_header(const char* path, int* height, int* width) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  float magic;
  int32_t w, h;
  if (fread(&magic, 4, 1, f) != 1 || magic != 202021.25f) {
    fclose(f);
    return -2;
  }
  if (fread(&w, 4, 1, f) != 1 || fread(&h, 4, 1, f) != 1) {
    fclose(f);
    return -3;
  }
  *width = w; *height = h;
  fclose(f);
  return 0;
}

int flo_read(const char* path, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  float magic;
  int32_t w, h;
  if (fread(&magic, 4, 1, f) != 1 || fread(&w, 4, 1, f) != 1 ||
      fread(&h, 4, 1, f) != 1) {
    fclose(f);
    return -2;
  }
  const size_t n = static_cast<size_t>(w) * h * 2;
  const size_t got = fread(out, 4, n, f);
  fclose(f);
  return got == n ? 0 : -3;
}

// ------------------------------------------------ flow resize + rescale --

// torch bilinear (align_corners=False, src clamped at 0) + flow-vector
// rescaling by the size ratio (reference datasets.py:205-221).
// in: (h, w, 2); out: (oh, ow, 2).
void resize_flow(const float* in, int h, int w, float* out, int oh, int ow) {
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> wx(ow);
  const double sx = static_cast<double>(w) / ow;
  for (int o = 0; o < ow; ++o) {
    double src = (o + 0.5) * sx - 0.5;
    if (src < 0) src = 0;
    int i0 = static_cast<int>(src);
    if (i0 > w - 1) i0 = w - 1;
    x0[o] = i0;
    x1[o] = i0 + 1 < w ? i0 + 1 : w - 1;
    wx[o] = static_cast<float>(src - i0);
  }
  const double sy = static_cast<double>(h) / oh;
  const float rx = static_cast<float>(ow) / w;
  const float ry = static_cast<float>(oh) / h;
  for (int o = 0; o < oh; ++o) {
    double src = (o + 0.5) * sy - 0.5;
    if (src < 0) src = 0;
    int y0 = static_cast<int>(src);
    if (y0 > h - 1) y0 = h - 1;
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    const float fy = static_cast<float>(src - y0);
    const float* r0 = in + static_cast<size_t>(y0) * w * 2;
    const float* r1 = in + static_cast<size_t>(y1) * w * 2;
    float* dst = out + static_cast<size_t>(o) * ow * 2;
    for (int x = 0; x < ow; ++x) {
      const int a = x0[x] * 2, b = x1[x] * 2;
      const float fx = wx[x];
      for (int c = 0; c < 2; ++c) {
        const float top = r0[a + c] + (r0[b + c] - r0[a + c]) * fx;
        const float bot = r1[a + c] + (r1[b + c] - r1[a + c]) * fx;
        dst[x * 2 + c] = (top + (bot - top) * fy) * (c == 0 ? rx : ry);
      }
    }
  }
}

// ----------------------------------------- forward/backward consistency --

// grid_sample bilinear zero-padding semantics with the reference warp's
// normalise/unnormalise coordinate rule (reference utilities.py:121-151).
// f01, f10: (h, w, 2); mask out: (h, w).
void flow_warp_mask(const float* f01, const float* f10, int h, int w,
                    float threshold, float* mask) {
  const float mw = static_cast<float>(w > 1 ? w - 1 : 1);
  const float mh = static_cast<float>(h > 1 ? h - 1 : 1);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const size_t i = (static_cast<size_t>(y) * w + x) * 2;
      // sample location (normalise to [-1,1] then back — the reference's
      // rule shifts edge samples by up to half a pixel; keep it)
      const float vx = x + f10[i];
      const float vy = y + f10[i + 1];
      const float nx = 2.0f * vx / mw - 1.0f;
      const float ny = 2.0f * vy / mh - 1.0f;
      const float px = ((nx + 1.0f) * w - 1.0f) * 0.5f;
      const float py = ((ny + 1.0f) * h - 1.0f) * 0.5f;

      const float fx0 = floorf(px), fy0 = floorf(py);
      const float wx1 = px - fx0, wy1 = py - fy0;
      float acc[2] = {0.0f, 0.0f};
      for (int dy = 0; dy < 2; ++dy) {
        for (int dx = 0; dx < 2; ++dx) {
          const int xi = static_cast<int>(fx0) + dx;
          const int yi = static_cast<int>(fy0) + dy;
          if (xi < 0 || xi > w - 1 || yi < 0 || yi > h - 1) continue;
          const float wgt = (dx ? wx1 : 1.0f - wx1) * (dy ? wy1 : 1.0f - wy1);
          const size_t j = (static_cast<size_t>(yi) * w + xi) * 2;
          // field being warped is grid + f01
          acc[0] += wgt * (xi + f01[j]);
          acc[1] += wgt * (yi + f01[j + 1]);
        }
      }
      const float err = fabsf(acc[0] - x) + fabsf(acc[1] - y);
      mask[static_cast<size_t>(y) * w + x] = err < threshold ? 1.0f : 0.0f;
    }
  }
}

}  // extern "C"
