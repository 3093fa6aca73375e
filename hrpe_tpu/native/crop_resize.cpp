// Fused square-pad crop + bilinear resize for the input pipeline.
//
// The reference's per-sample preprocessing is PIL/torch on the Python side
// (square canvas paste in roboutils.py:142-173 + F.interpolate resize in
// augmentations.py:219-228). This C++ kernel does both in ONE pass per
// output pixel (no intermediate canvas allocation), OpenMP-parallel over
// the batch — the host-side feeding path for the TPU step.
//
// Geometry contract (must match hrpe_tpu/data/bbox.py + augment.py):
//   canvas side L = max(bbox_w, bbox_h), crop pasted centered;
//   resize L x L -> S x S with the align_corners=False convention
//   (src = (dst + 0.5) * L / S - 0.5); zero padding outside the source.
//
// Build: cc -O3 -fopenmp -shared -fPIC crop_resize.cpp -o libcrop_resize.so

#include <cstdint>
#include <cmath>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// imgs:   B x H x W x 3 uint8 (contiguous)
// bboxes: B x 4 float  (x1, y1, x2, y2) integer-valued pixel boxes
// out:    B x S x S x 3 uint8
void crop_resize_batch(const uint8_t* imgs, int B, int H, int W,
                       const float* bboxes, uint8_t* out, int S) {
#pragma omp parallel for schedule(static)
  for (int b = 0; b < B; ++b) {
    const uint8_t* img = imgs + (size_t)b * H * W * 3;
    uint8_t* dst = out + (size_t)b * S * S * 3;
    const float x1 = bboxes[b * 4 + 0];
    const float y1 = bboxes[b * 4 + 1];
    const float x2 = bboxes[b * 4 + 2];
    const float y2 = bboxes[b * 4 + 3];
    const float bw = x2 - x1;
    const float bh = y2 - y1;
    const float L = std::max(bw, bh);
    const float ox = std::floor((L - bw) / 2.0f);
    const float oy = std::floor((L - bh) / 2.0f);
    const float scale = L / (float)S;

    for (int j = 0; j < S; ++j) {
      // canvas y -> source y
      const float cy = ((float)j + 0.5f) * scale - 0.5f;
      const float sy = cy - oy + y1;
      const int y0 = (int)std::floor(sy);
      const float fy = sy - (float)y0;
      for (int i = 0; i < S; ++i) {
        const float cx = ((float)i + 0.5f) * scale - 0.5f;
        const float sx = cx - ox + x1;
        const int x0 = (int)std::floor(sx);
        const float fx = sx - (float)x0;

        // clamp-free zero-padded bilinear; samples outside the crop
        // region of the source read as 0 (matches the zero canvas)
        for (int c = 0; c < 3; ++c) {
          float acc = 0.0f;
          for (int dy = 0; dy < 2; ++dy) {
            const int yy = y0 + dy;
            const float wy = dy ? fy : 1.0f - fy;
            if (yy < (int)y1 || yy >= (int)y2 || yy < 0 || yy >= H) continue;
            for (int dx = 0; dx < 2; ++dx) {
              const int xx = x0 + dx;
              const float wx = dx ? fx : 1.0f - fx;
              if (xx < (int)x1 || xx >= (int)x2 || xx < 0 || xx >= W) continue;
              acc += wy * wx * (float)img[((size_t)yy * W + xx) * 3 + c];
            }
          }
          dst[((size_t)j * S + i) * 3 + c] =
              (uint8_t)std::min(255.0f, std::max(0.0f, acc + 0.5f));
        }
      }
    }
  }
}

// Photometric batch op: per-image channel gains with clipping
// (train-time color jitter, ref dream.py:346-354).
void channel_gain_batch(uint8_t* imgs, int B, int H, int W,
                        const float* gains /* B x 3 */) {
#pragma omp parallel for schedule(static)
  for (int b = 0; b < B; ++b) {
    uint8_t* img = imgs + (size_t)b * H * W * 3;
    const float g0 = gains[b * 3], g1 = gains[b * 3 + 1], g2 = gains[b * 3 + 2];
    const size_t n = (size_t)H * W;
    for (size_t p = 0; p < n; ++p) {
      float r = img[p * 3 + 0] * g0;
      float g = img[p * 3 + 1] * g1;
      float bl = img[p * 3 + 2] * g2;
      img[p * 3 + 0] = (uint8_t)std::min(255.0f, std::max(0.0f, r));
      img[p * 3 + 1] = (uint8_t)std::min(255.0f, std::max(0.0f, g));
      img[p * 3 + 2] = (uint8_t)std::min(255.0f, std::max(0.0f, bl));
    }
  }
}

}  // extern "C"
