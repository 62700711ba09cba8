// First-party rasterisation kernels for skeleton rendering.
//
// The reference rasterises OpenPose skeletons with OpenCV's C++ primitives
// (cv2.fillConvexPoly / cv2.circle / cv2.line — reference
// DWPose/skeleton_extraction.py:16-100). This module is the framework's own
// native raster path: the same primitives (rotated-ellipse fill, filled
// circle, thick line) on uint8 HWC canvases, exposed through a C ABI and
// loaded via ctypes (no pybind11 dependency). It removes the OpenCV
// dependency from the render hot loop and batches whole videos per call.
//
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct Canvas {
  uint8_t* data;
  int h, w, c;
  inline void blend_set(int x, int y, const double* color) {
    if (x < 0 || y < 0 || x >= w || y >= h) return;
    uint8_t* px = data + (static_cast<int64_t>(y) * w + x) * c;
    for (int i = 0; i < c; ++i)
      px[i] = static_cast<uint8_t>(std::clamp(color[i], 0.0, 255.0));
  }
};

// horizontal span fill
inline void fill_span(Canvas& cv, int y, int x0, int x1, const double* color) {
  if (y < 0 || y >= cv.h) return;
  x0 = std::max(x0, 0);
  x1 = std::min(x1, cv.w - 1);
  for (int x = x0; x <= x1; ++x) cv.blend_set(x, y, color);
}

}  // namespace

extern "C" {

// Filled rotated ellipse centred at (cx, cy), semi-axes (a, b), rotation
// `angle_deg`. Scanline fill of the implicit equation — equivalent to
// cv2.ellipse2Poly(...,1 deg) + fillConvexPoly for the solid-fill case.
void fill_rotated_ellipse(uint8_t* canvas, int h, int w, int c,
                          double cx, double cy, double a, double b,
                          double angle_deg, const double* color) {
  Canvas cv{canvas, h, w, c};
  // OpenCV's ellipse2Poly + fillConvexPoly rounds vertices outward; dilate
  // the implicit ellipse by half a pixel to match its coverage.
  a += 0.5;
  b += 0.5;
  const double th = angle_deg * M_PI / 180.0;
  const double ct = std::cos(th), st = std::sin(th);
  const double ext = std::max(a, b) + 1.0;
  const int y0 = static_cast<int>(std::floor(cy - ext));
  const int y1 = static_cast<int>(std::ceil(cy + ext));
  const int x0 = static_cast<int>(std::floor(cx - ext));
  const int x1 = static_cast<int>(std::ceil(cx + ext));
  for (int y = std::max(y0, 0); y <= std::min(y1, h - 1); ++y) {
    int sx = -1;
    for (int x = std::max(x0, 0); x <= std::min(x1, w - 1); ++x) {
      const double dx = x - cx, dy = y - cy;
      const double u = (dx * ct + dy * st) / a;
      const double v = (-dx * st + dy * ct) / b;
      const bool inside = u * u + v * v <= 1.0;
      if (inside && sx < 0) sx = x;
      if ((!inside || x == std::min(x1, w - 1)) && sx >= 0) {
        fill_span(cv, y, sx, inside ? x : x - 1, color);
        sx = -1;
      }
    }
  }
}

// Filled circle (cv2.circle thickness=-1 equivalent).
void fill_circle(uint8_t* canvas, int h, int w, int c,
                 int cx, int cy, int radius, const double* color) {
  Canvas cv{canvas, h, w, c};
  const int r2 = radius * radius;
  for (int dy = -radius; dy <= radius; ++dy) {
    const int y = cy + dy;
    const int half = static_cast<int>(std::sqrt(static_cast<double>(r2 - dy * dy)));
    fill_span(cv, y, cx - half, cx + half, color);
  }
}

// Thick line with round caps (cv2.line equivalent up to cap rounding).
void draw_line(uint8_t* canvas, int h, int w, int c,
               int x0, int y0, int x1, int y1, int thickness,
               const double* color) {
  Canvas cv{canvas, h, w, c};
  const double dx = x1 - x0, dy = y1 - y0;
  const double len = std::sqrt(dx * dx + dy * dy);
  // OpenCV rounds a thickness-t line outward to ~t+1 pixels across; match
  // that coverage so renders agree with the cv2 path.
  const double r = (thickness + 1) * 0.5;
  if (len < 1e-9) {
    fill_circle(canvas, h, w, c, x0, y0, std::max(1, thickness / 2), color);
    return;
  }
  const int bx0 = std::max(0, static_cast<int>(std::floor(std::min(x0, x1) - r - 1)));
  const int bx1 = std::min(w - 1, static_cast<int>(std::ceil(std::max(x0, x1) + r + 1)));
  const int by0 = std::max(0, static_cast<int>(std::floor(std::min(y0, y1) - r - 1)));
  const int by1 = std::min(h - 1, static_cast<int>(std::ceil(std::max(y0, y1) + r + 1)));
  for (int y = by0; y <= by1; ++y) {
    for (int x = bx0; x <= bx1; ++x) {
      // distance from (x,y) to the segment
      double t = ((x - x0) * dx + (y - y0) * dy) / (len * len);
      t = std::clamp(t, 0.0, 1.0);
      const double px = x0 + t * dx, py = y0 + t * dy;
      const double d2 = (x - px) * (x - px) + (y - py) * (y - py);
      if (d2 <= r * r) cv.blend_set(x, y, color);
    }
  }
}

// Multiply every pixel by `factor` (the reference's canvas*0.6 dim,
// skeleton_extraction.py:46).
void scale_canvas(uint8_t* canvas, int64_t n, double factor) {
  for (int64_t i = 0; i < n; ++i)
    canvas[i] = static_cast<uint8_t>(canvas[i] * factor);
}

}  // extern "C"
