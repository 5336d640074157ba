// Native synthetic-crop renderer: the host-side data-generation hot loop.
//
// Port of flope_tpu/data/synthetic.py::render_flower_crop +
// _orientation_shading: each crop is a disc whose per-pixel color encodes the
// flower's camera-frame rotation (d = u*R[:,0] + v*R[:,1], 128 + 100*d).
// The numpy version costs ~16 ms/crop at 256^2 on this 1-CPU host (~32 s per
// 2048-crop training set); this renders the whole batch in one C pass.
//
// Built on demand by flope_tpu/native/build.py (g++ -O3 -shared), loaded via
// ctypes; flope_tpu.data falls back to the numpy renderer when no toolchain
// is available. Float story: the numpy path computes pixel offsets in
// float32 then shades in float64 — reproduced exactly here so outputs agree
// to the last uint8 step (parity-tested in tests/test_native.py).

#include <cstddef>
#include <cstdint>

extern "C" {

// rotations: (n, 9) row-major 3x3; offsets: (n, 2) fractional center offsets;
// fills: (n,) disc radius as a fraction of size/2; out: (n, size, size, 3).
void render_crops(const double* rotations, const double* offsets,
                  const double* fills, int n, int size, std::uint8_t* out) {
  for (int i = 0; i < n; ++i) {
    const double* R = rotations + static_cast<std::size_t>(i) * 9;
    // Column 0 and 1 of R drive the shading.
    const double r00 = R[0], r10 = R[3], r20 = R[6];
    const double r01 = R[1], r11 = R[4], r21 = R[7];
    const double u = size / 2.0 + offsets[i * 2 + 0] * size;
    const double v = size / 2.0 + offsets[i * 2 + 1] * size;
    const double r = fills[i] * size / 2.0;
    // numpy compares float32 (dx^2 + dy^2) against r^2 cast to float32.
    const float r2f = static_cast<float>(r * r);
    std::uint8_t* o =
        out + static_cast<std::size_t>(i) * size * size * 3;
    for (int y = 0; y < size; ++y) {
      // Match numpy: mgrid is float32, (xs - u) and /r happen in float32.
      const float dyf = static_cast<float>(y) - static_cast<float>(v);
      const float bf = dyf / static_cast<float>(r);
      const float dy2 = dyf * dyf;
      for (int x = 0; x < size; ++x) {
        const float dxf = static_cast<float>(x) - static_cast<float>(u);
        std::uint8_t* px = o + (static_cast<std::size_t>(y) * size + x) * 3;
        if (dxf * dxf + dy2 < r2f) {
          const float af = dxf / static_cast<float>(r);
          const double a = static_cast<double>(af);
          const double b = static_cast<double>(bf);
          for (int c = 0; c < 3; ++c) {
            double d = a * (c == 0 ? r00 : c == 1 ? r10 : r20) +
                       b * (c == 0 ? r01 : c == 1 ? r11 : r21);
            if (d > 1.0) d = 1.0;
            if (d < -1.0) d = -1.0;
            double s = 128.0 + 100.0 * d;
            if (s < 0.0) s = 0.0;
            if (s > 255.0) s = 255.0;
            px[c] = static_cast<std::uint8_t>(s);
          }
        } else {
          px[0] = px[1] = px[2] = 0;
        }
      }
    }
  }
}

}  // extern "C"
