// Host-side image preprocessing for the streaming detection pipeline.
//
// Native equivalent of the reference's camera-input path
// (c_embedding/yolo_forward.c:57-85 pixel_norm_quantize: RGB -> normalized
// -> int8 quantize) plus the eval-path resize+normalize
// (reference data/__init__.py:30-46), fused into one pass so a frame is
// touched once: bilinear resize (half-pixel centers, cv2 INTER_LINEAR
// semantics), /255, per-channel mean/std (BGR stats), optional BGR->RGB
// flip, and either float32 output or direct int8 quantization at a
// power-of-two activation scale (round-half-away, int8 saturation).
//
// Exposed via a plain C ABI for ctypes. Multi-frame batches fan out over
// a persistent thread pool.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct ThreadPool {
  explicit ThreadPool(int n) : stop_(false), pending_(0) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.back());
            jobs_.pop_back();
          }
          job();
          if (--pending_ == 0) {
            std::unique_lock<std::mutex> lk(mu_);
            done_cv_.notify_all();
          }
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void run(std::function<void()> job) {
    ++pending_;
    {
      std::unique_lock<std::mutex> lk(mu_);
      jobs_.push_back(std::move(job));
    }
    cv_.notify_one();
  }
  void wait() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_.load() == 0; });
  }

  std::vector<std::thread> workers_;
  std::vector<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  std::atomic<int> pending_;
};

ThreadPool* pool() {
  static ThreadPool p(std::max(2u, std::thread::hardware_concurrency()));
  return &p;
}

// Bilinear sample coefficients for one output axis (half-pixel centers).
struct AxisMap {
  std::vector<int> lo, hi;
  std::vector<float> frac;
};

AxisMap make_axis(int in_n, int out_n) {
  AxisMap m;
  m.lo.resize(out_n);
  m.hi.resize(out_n);
  m.frac.resize(out_n);
  const float scale = static_cast<float>(in_n) / out_n;
  for (int i = 0; i < out_n; ++i) {
    float src = (i + 0.5f) * scale - 0.5f;
    int lo = static_cast<int>(std::floor(src));
    float f = src - lo;
    if (lo < 0) { lo = 0; f = 0.f; }
    int hi = std::min(lo + 1, in_n - 1);
    if (lo > in_n - 1) lo = in_n - 1;
    m.lo[i] = lo;
    m.hi[i] = hi;
    m.frac[i] = f;
  }
  return m;
}

// One frame: u8 HWC(BGR) -> resized+normalized output.
// out_f32 (if non-null): float32 [oh, ow, 3]; out_i8 likewise int8.
// s2d != 0: out_i8 is the padded space-to-depth serving layout
// [oh/2+3, ow/2+3, 12] (pad 3 pixels each side, block channel order
// (py, px, c)) that feeds the fused MXU conv1+pool directly
// (yolo_tpu.quant.fixed_point.s2d_input semantics); caller must have
// zeroed the buffer (the padding ring is never written here).
void preprocess_one(const uint8_t* src, int ih, int iw, int oh, int ow,
                    const float* mean, const float* stdv, int to_rgb,
                    float* out_f32, int8_t* out_i8, float act_scale,
                    int s2d) {
  AxisMap ym = make_axis(ih, oh);
  AxisMap xm = make_axis(iw, ow);
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3] = {1.f / stdv[0], 1.f / stdv[1], 1.f / stdv[2]};
  const int wb = (ow + 6) / 2;

  for (int y = 0; y < oh; ++y) {
    const uint8_t* r0 = src + static_cast<size_t>(ym.lo[y]) * iw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(ym.hi[y]) * iw * 3;
    const float fy = ym.frac[y];
    for (int x = 0; x < ow; ++x) {
      const int x0 = xm.lo[x] * 3, x1 = xm.hi[x] * 3;
      const float fx = xm.frac[x];
      for (int c = 0; c < 3; ++c) {
        float top = r0[x0 + c] * (1 - fx) + r0[x1 + c] * fx;
        float bot = r1[x0 + c] * (1 - fx) + r1[x1 + c] * fx;
        float v = top * (1 - fy) + bot * fy;
        v = (v * inv255 - mean[c]) * inv_std[c];
        int oc = to_rgb ? 2 - c : c;
        if (out_f32) {
          out_f32[(static_cast<size_t>(y) * ow + x) * 3 + oc] = v;
        }
        if (out_i8) {
          float q = std::nearbyint(v * act_scale);  // ties-to-even like
          q = std::min(127.f, std::max(-128.f, q)); // the Python fake-quant
          size_t idx;
          if (s2d) {
            const int yp = y + 3, xp = x + 3;
            idx = ((static_cast<size_t>(yp >> 1) * wb + (xp >> 1)) * 12) +
                  ((yp & 1) * 2 + (xp & 1)) * 3 + oc;
          } else {
            idx = (static_cast<size_t>(y) * ow + x) * 3 + oc;
          }
          out_i8[idx] = static_cast<int8_t>(q);
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Batch preprocess: n frames, each u8 [ih, iw, 3] BGR (contiguous,
// per-frame pointers), into out [n, oh, ow, 3] float32 (normalized) or
// int8 (quantized at act_scale = 2^sa). Either out pointer may be null.
void yolo_tpu_preprocess_batch(const uint8_t** frames, const int* ihs,
                               const int* iws, int n, int oh, int ow,
                               const float* mean, const float* stdv,
                               int to_rgb, float* out_f32, int8_t* out_i8,
                               float act_scale) {
  ThreadPool* p = pool();
  for (int i = 0; i < n; ++i) {
    const uint8_t* f = frames[i];
    int ih = ihs[i], iw = iws[i];
    float* of = out_f32 ? out_f32 + static_cast<size_t>(i) * oh * ow * 3
                        : nullptr;
    int8_t* oi = out_i8 ? out_i8 + static_cast<size_t>(i) * oh * ow * 3
                        : nullptr;
    p->run([=] {
      preprocess_one(f, ih, iw, oh, ow, mean, stdv, to_rgb, of, oi,
                     act_scale, /*s2d=*/0);
    });
  }
  p->wait();
}

// Like yolo_tpu_preprocess_batch with int8 output, but written in the
// padded space-to-depth serving layout [n, oh/2+3, ow/2+3, 12] that the
// fused MXU conv1+pool consumes directly (zero on-device transform).
// out_i8 must be zero-initialized (the padding ring stays untouched).
void yolo_tpu_preprocess_batch_s2d(const uint8_t** frames, const int* ihs,
                                   const int* iws, int n, int oh, int ow,
                                   const float* mean, const float* stdv,
                                   int to_rgb, int8_t* out_i8,
                                   float act_scale) {
  ThreadPool* p = pool();
  const size_t frame_sz =
      static_cast<size_t>((oh + 6) / 2) * ((ow + 6) / 2) * 12;
  for (int i = 0; i < n; ++i) {
    const uint8_t* f = frames[i];
    int ih = ihs[i], iw = iws[i];
    int8_t* oi = out_i8 + static_cast<size_t>(i) * frame_sz;
    p->run([=] {
      preprocess_one(f, ih, iw, oh, ow, mean, stdv, to_rgb, nullptr, oi,
                     act_scale, /*s2d=*/1);
    });
  }
  p->wait();
}

int yolo_tpu_version() { return 4; }

}  // extern "C"
