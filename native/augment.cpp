// Host-side training augmentation: the pixel-bandwidth half of the SSD
// pipeline (photometric distort + mean-fill canvas expansion), native.
//
// Design split: RANDOMNESS stays in numpy (data/transforms.py
// draw_photometric_params / draw_expand_params draw with the reference's
// exact rng order, utils/augmentations.py:324-410), and this code applies
// the drawn parameters to the pixels — so the native and numpy backends
// consume identical random streams and the parameter distributions are
// reference-exact by construction. Box geometry (crop/mirror/IoU logic)
// is cheap index math and stays in numpy.
//
// Pixel math mirrors the numpy path: float32 BGR 0..255, brightness add,
// contrast multiply (before or after the HSV stage), saturation/hue in
// cv2's float-HSV convention (H in degrees [0,360), S in [0,1], V = max
// channel, single wrap of H after the shift), no clipping anywhere — the
// reference pipeline normalizes unclipped floats. The HSV round-trip is
// reimplemented (cv2 is not linked here); it matches cv2 to float
// rounding (tests assert <0.1/255 max delta).
//
// One call = one image, single-threaded: the BatchLoader's worker pool
// already parallelizes across images, and ctypes releases the GIL for
// the duration of the call — a plain thread pool gets real speedup.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// cv2's float BGR2HSV conventions exactly (color_hsv float path):
// S = diff/(|V|+eps), hue sector scale 60/(diff+eps) — negative values
// (possible after the unclipped brightness/contrast jitter) behave
// identically to OpenCV's.
inline void bgr2hsv(float b, float g, float r, float* h, float* s,
                    float* v) {
  const float eps = 1.1920929e-7f;  // FLT_EPSILON
  float mx = std::max(b, std::max(g, r));
  float mn = std::min(b, std::min(g, r));
  float diff = mx - mn;
  *v = mx;
  *s = diff / (std::fabs(mx) + eps);
  float k = 60.f / (diff + eps);
  float hh;
  if (mx == r)
    hh = (g - b) * k;
  else if (mx == g)
    hh = (b - r) * k + 120.f;
  else
    hh = (r - g) * k + 240.f;
  if (hh < 0.f) hh += 360.f;
  *h = hh;
}

inline void hsv2bgr(float h, float s, float v, float* b, float* g,
                    float* r) {
  float hh = h / 60.f;
  int sector = static_cast<int>(std::floor(hh));
  float f = hh - sector;
  sector = ((sector % 6) + 6) % 6;  // S>1 / wrapped H stay well-defined
  float p = v * (1.f - s);
  float q = v * (1.f - s * f);
  float t = v * (1.f - s * (1.f - f));
  switch (sector) {
    case 0: *r = v; *g = t; *b = p; break;
    case 1: *r = q; *g = v; *b = p; break;
    case 2: *r = p; *g = v; *b = t; break;
    case 3: *r = p; *g = q; *b = v; break;
    case 4: *r = t; *g = p; *b = v; break;
    default: *r = v; *g = p; *b = q; break;
  }
}

inline void photometric_px(float* b, float* g, float* r, int has_bright,
                           float bright, int contrast_first,
                           int has_contrast, float contrast, int has_sat,
                           float sat, int has_hue, float hue) {
  if (has_bright) {
    *b += bright;
    *g += bright;
    *r += bright;
  }
  if (contrast_first && has_contrast) {
    *b *= contrast;
    *g *= contrast;
    *r *= contrast;
  }
  if (has_sat || has_hue) {
    float hh, ss, vv;
    bgr2hsv(*b, *g, *r, &hh, &ss, &vv);
    if (has_sat) ss *= sat;
    if (has_hue) {
      hh += hue;
      if (hh > 360.f) hh -= 360.f;
      if (hh < 0.f) hh += 360.f;
    }
    hsv2bgr(hh, ss, vv, b, g, r);
  }
  if (!contrast_first && has_contrast) {
    *b *= contrast;
    *g *= contrast;
    *r *= contrast;
  }
}

// Bilinear sample coefficients for one output axis (half-pixel centers,
// cv2 INTER_LINEAR semantics — same as preprocess.cpp's resize).
struct AxisMap2 {
  std::vector<int> lo, hi;
  std::vector<float> frac;
};

inline AxisMap2 make_axis2(int in_n, int out_n) {
  AxisMap2 m;
  m.lo.resize(out_n);
  m.hi.resize(out_n);
  m.frac.resize(out_n);
  const float scale = static_cast<float>(in_n) / out_n;
  for (int i = 0; i < out_n; ++i) {
    float s = (i + 0.5f) * scale - 0.5f;
    int lo = static_cast<int>(std::floor(s));
    float f = s - lo;
    if (lo < 0) {
      lo = 0;
      f = 0.f;
    }
    int hi = std::min(lo + 1, in_n - 1);
    if (lo > in_n - 1) lo = in_n - 1;
    m.lo[i] = lo;
    m.hi[i] = hi;
    m.frac[i] = f;
  }
  return m;
}

}  // namespace

extern "C" {

// The whole SSD augmentation pixel pipeline, fused: photometric ->
// expand -> crop -> mirror -> bilinear resize -> (normalize | round to
// uint8), touching each source pixel once and materializing NO
// intermediate canvas (the reference/numpy path allocates a mean-filled
// canvas up to 4x the image plus a cropped copy). Geometry and all rng
// draws come from the caller (data/transforms.py draw_* helpers).
//
// src: u8 [h, w, 3] BGR. Expand canvas is (eh, ew) with the image
// pasted at (top, left) — pass eh=h, ew=w, top=left=0 for no expansion.
// Crop rect [cx0, cy0, cx1, cy1] is in canvas coords (full canvas for
// no crop). Output (oh, ow): u8_out!=0 writes out_u8 (rounded, clipped,
// channel-flipped when to_rgb) — the in-graph-normalize training path —
// else writes out_f32 normalized with mean/std (BGR stats, flipped
// order on output when to_rgb).
void yolo_tpu_augment_one(
    const uint8_t* src, int h, int w,
    int has_bright, float bright, int contrast_first, int has_contrast,
    float contrast, int has_sat, float sat, int has_hue, float hue,
    int eh, int ew, int top, int left,
    int cx0, int cy0, int cx1, int cy1,
    int mirror, int oh, int ow,
    const float* mean, const float* stdv, int to_rgb, int u8_out,
    float* out_f32, uint8_t* out_u8) {
  (void)eh;
  (void)ew;
  const int cw = cx1 - cx0, ch = cy1 - cy0;
  // canvas region where crop overlaps the pasted image
  const int ix0 = std::max(cx0, left), iy0 = std::max(cy0, top);
  const int ix1 = std::min(cx1, left + w), iy1 = std::min(cy1, top + h);
  const int tw = std::max(0, ix1 - ix0), th = std::max(0, iy1 - iy0);

  // photometric over just the needed source region (<= the image size,
  // never the canvas size)
  std::vector<float> tmp(static_cast<size_t>(tw) * th * 3);
  for (int y = 0; y < th; ++y) {
    const uint8_t* row =
        src + (static_cast<size_t>(iy0 - top + y) * w + (ix0 - left)) * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * tw * 3;
    for (int x = 0; x < tw; ++x) {
      float b = row[x * 3 + 0];
      float g = row[x * 3 + 1];
      float r = row[x * 3 + 2];
      photometric_px(&b, &g, &r, has_bright, bright, contrast_first,
                     has_contrast, contrast, has_sat, sat, has_hue, hue);
      trow[x * 3 + 0] = b;
      trow[x * 3 + 1] = g;
      trow[x * 3 + 2] = r;
    }
  }

  AxisMap2 ym = make_axis2(ch, oh);
  AxisMap2 xm = make_axis2(cw, ow);
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3] = {1.f / stdv[0], 1.f / stdv[1], 1.f / stdv[2]};

  // fetch (crop coords) -> photometric'd pixel or the mean fill
  auto fetch = [&](int cy, int cx, int c) -> float {
    const int gy = cy0 + cy, gx = cx0 + cx;  // canvas coords
    if (gy >= iy0 && gy < iy1 && gx >= ix0 && gx < ix1) {
      return tmp[((static_cast<size_t>(gy - iy0)) * tw + (gx - ix0)) * 3 +
                 c];
    }
    return mean[c];
  };

  for (int y = 0; y < oh; ++y) {
    const int sy0 = ym.lo[y], sy1 = ym.hi[y];
    const float fy = ym.frac[y];
    for (int x = 0; x < ow; ++x) {
      int lo = xm.lo[x], hi = xm.hi[x];
      const float fx = xm.frac[x];
      if (mirror) {  // resize(flip(crop)): flipped column indices
        lo = cw - 1 - lo;
        hi = cw - 1 - hi;
      }
      for (int c = 0; c < 3; ++c) {
        const float topv =
            fetch(sy0, lo, c) * (1 - fx) + fetch(sy0, hi, c) * fx;
        const float botv =
            fetch(sy1, lo, c) * (1 - fx) + fetch(sy1, hi, c) * fx;
        const float v = topv * (1 - fy) + botv * fy;
        const int oc = to_rgb ? 2 - c : c;
        const size_t idx = (static_cast<size_t>(y) * ow + x) * 3 + oc;
        if (u8_out) {
          float q = std::nearbyint(v);  // ties-to-even, np.rint parity
          out_u8[idx] = static_cast<uint8_t>(
              std::min(255.f, std::max(0.f, q)));
        } else {
          out_f32[idx] = (v * inv255 - mean[c]) * inv_std[c];
        }
      }
    }
  }
}

}  // extern "C"
