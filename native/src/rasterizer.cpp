// Native z-buffer rasterizer for template rendering.
//
// Host-runtime analog of the reference's native layer (the reference
// renders templates with BlenderProc and runs its point-cloud ops in
// C++/CUDA/OpenCL; here the offline template-render stage is the
// host-side hot loop, so it gets the native implementation while all
// on-device compute stays in XLA/Pallas).
//
// Semantics match sam6d_tpu/pipeline/renderer.py::rasterize_numpy:
// perspective-correct barycentric interpolation in 1/z, per-pixel
// z-test, pixel centers at +0.5.

#include <cmath>
#include <cstdint>
#include <limits>

extern "C" {

// verts_cam: (V,3) row-major camera-frame vertices.
// faces: (F,3) int32 triangle indices.
// K: (3,3) row-major intrinsics.
// attrs: (V,A) per-vertex attributes.
// Outputs (caller-allocated, any contents): attr_img (H,W,A) zeroed
// here, depth (H,W) set to +inf here, mask (H,W) zeroed here.
void sam6d_rasterize(const float* verts_cam, int V, const int* faces,
                     int F, const float* K, int H, int W,
                     const float* attrs, int A, float* attr_img,
                     float* depth, uint8_t* mask) {
  const float inf = std::numeric_limits<float>::infinity();
  for (long i = 0; i < (long)H * W; ++i) {
    depth[i] = inf;
    mask[i] = 0;
  }
  for (long i = 0; i < (long)H * W * A; ++i) attr_img[i] = 0.f;

  const float fx = K[0], cx = K[2], fy = K[4], cy = K[5];

  for (int t = 0; t < F; ++t) {
    const int i0 = faces[3 * t], i1 = faces[3 * t + 1], i2 = faces[3 * t + 2];
    if (i0 < 0 || i0 >= V || i1 < 0 || i1 >= V || i2 < 0 || i2 >= V) continue;
    const float z0 = verts_cam[3 * i0 + 2];
    const float z1 = verts_cam[3 * i1 + 2];
    const float z2 = verts_cam[3 * i2 + 2];
    if (z0 <= 1e-6f || z1 <= 1e-6f || z2 <= 1e-6f) continue;  // cull

    const float ax = fx * verts_cam[3 * i0] / z0 + cx;
    const float ay = fy * verts_cam[3 * i0 + 1] / z0 + cy;
    const float bx = fx * verts_cam[3 * i1] / z1 + cx;
    const float by = fy * verts_cam[3 * i1 + 1] / z1 + cy;
    const float cx2 = fx * verts_cam[3 * i2] / z2 + cx;
    const float cy2 = fy * verts_cam[3 * i2 + 1] / z2 + cy;

    const float det = (bx - ax) * (cy2 - ay) - (by - ay) * (cx2 - ax);
    if (std::fabs(det) < 1e-12f) continue;
    const float inv_det = 1.0f / det;

    int x0 = (int)std::floor(std::fmin(ax, std::fmin(bx, cx2)));
    int x1 = (int)std::ceil(std::fmax(ax, std::fmax(bx, cx2)));
    int y0 = (int)std::floor(std::fmin(ay, std::fmin(by, cy2)));
    int y1 = (int)std::ceil(std::fmax(ay, std::fmax(by, cy2)));
    if (x0 < 0) x0 = 0;
    if (y0 < 0) y0 = 0;
    if (x1 > W - 1) x1 = W - 1;
    if (y1 > H - 1) y1 = H - 1;
    if (x1 < x0 || y1 < y0) continue;

    const float iz0 = 1.0f / z0, iz1 = 1.0f / z1, iz2 = 1.0f / z2;
    const float* a0 = attrs + (long)i0 * A;
    const float* a1 = attrs + (long)i1 * A;
    const float* a2 = attrs + (long)i2 * A;

    for (int y = y0; y <= y1; ++y) {
      const float gy = y + 0.5f;
      for (int x = x0; x <= x1; ++x) {
        const float gx = x + 0.5f;
        const float w1 =
            ((gx - ax) * (cy2 - ay) - (gy - ay) * (cx2 - ax)) * inv_det;
        const float w2 =
            ((bx - ax) * (gy - ay) - (by - ay) * (gx - ax)) * inv_det;
        const float w0 = 1.0f - w1 - w2;
        if (w0 < 0.f || w1 < 0.f || w2 < 0.f) continue;
        const float iz = w0 * iz0 + w1 * iz1 + w2 * iz2;
        const float zpix = 1.0f / (iz > 1e-12f ? iz : 1e-12f);
        const long pix = (long)y * W + x;
        if (zpix < depth[pix]) {
          depth[pix] = zpix;
          mask[pix] = 1;
          float* out = attr_img + pix * A;
          const float c0 = w0 * iz0 * zpix;
          const float c1 = w1 * iz1 * zpix;
          const float c2 = w2 * iz2 * zpix;
          for (int k = 0; k < A; ++k)
            out[k] = c0 * a0[k] + c1 * a1[k] + c2 * a2[k];
        }
      }
    }
  }
}

}  // extern "C"
