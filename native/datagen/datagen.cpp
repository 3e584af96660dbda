// High-throughput moving-multi-object sequence generator.
//
// Native (C++) implementation of the host-side data pipeline that the
// reference implements in numpy behind a per-step tf.py_func host callback
// (reference: sqair/data/data.py:204-242, trajectory.py, template.py,
// create_seq_mnist.py).  Semantics mirror sqair_tpu/data/moving_mnist.py's
// create_seq_dataset: static non-overlapping placement, noisy-acceleration
// trajectories with elastic bouncing, max-composite rendering.  The RNG is
// a counter-based PCG (not numpy-compatible); parity with the numpy path is
// contractual (shapes, ranges, dynamics), not bitwise.
//
// Exposed C API (ctypes-friendly), all buffers caller-allocated:
//   sqair_generate_sequences(...)  -> 0 on success
//   sqair_datagen_version()        -> ABI version int
//
// Build: make -C native/datagen   (g++ -O3 -shared -fPIC -pthread)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------------- PCG32
struct Pcg32 {
  uint64_t state;
  uint64_t inc;
  explicit Pcg32(uint64_t seed, uint64_t seq = 0xda3e39cb94b95bdbULL) {
    state = 0U;
    inc = (seq << 1u) | 1u;
    next();
    state += seed;
    next();
  }
  uint32_t next() {
    uint64_t old = state;
    state = old * 6364136223846793005ULL + inc;
    uint32_t xorshifted = static_cast<uint32_t>(((old >> 18u) ^ old) >> 27u);
    uint32_t rot = static_cast<uint32_t>(old >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((-rot) & 31));
  }
  // uniform in [0, 1)
  double uniform() { return next() * (1.0 / 4294967296.0); }
  double uniform(double lo, double hi) { return lo + (hi - lo) * uniform(); }
  // integer in [0, n)
  uint32_t below(uint32_t n) { return n ? next() % n : 0; }
  // standard normal (Box-Muller)
  double normal() {
    double u1 = 1.0 - uniform();  // (0, 1]
    double u2 = uniform();
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(2.0 * M_PI * u2);
  }
};

struct TemplateBox {
  int y0, x0, h, w;  // tight bbox inside the [th, tw] template
};

// tight bounding box of nonzero pixels (reference data.py:56-61)
TemplateBox tight_box(const float* tmpl, int th, int tw) {
  int ymin = th, ymax = -1, xmin = tw, xmax = -1;
  for (int y = 0; y < th; ++y)
    for (int x = 0; x < tw; ++x)
      if (tmpl[y * tw + x] > 0.f) {
        ymin = std::min(ymin, y);
        ymax = std::max(ymax, y);
        xmin = std::min(xmin, x);
        xmax = std::max(xmax, x);
      }
  if (ymax < 0) return {0, 0, th, tw};  // empty template: keep full box
  return {ymin, xmin, ymax - ymin + 1, xmax - xmin + 1};
}

struct ObjState {
  double pos[2], vel[2], acc[2];
};

// one trajectory step: pos+=vel, vel+=acc, acc+=noise, elastic bounce,
// clamps (reference trajectory.py:118-143)
void traj_step(ObjState& s, Pcg32& rng, const double lo[2], const double hi[2],
               double max_speed, double max_acc, double noise_std) {
  for (int d = 0; d < 2; ++d) {
    s.pos[d] += s.vel[d];
    s.vel[d] += s.acc[d];
    s.acc[d] += noise_std * rng.normal();
  }
  for (int d = 0; d < 2; ++d) {
    if (s.pos[d] < lo[d]) {
      s.pos[d] = 2 * lo[d] - s.pos[d];
      s.vel[d] = -s.vel[d];
      s.acc[d] = -s.acc[d];
    } else if (s.pos[d] > hi[d]) {
      s.pos[d] = 2 * hi[d] - s.pos[d];
      s.vel[d] = -s.vel[d];
      s.acc[d] = -s.acc[d];
    }
    s.pos[d] = std::min(std::max(s.pos[d], lo[d]), hi[d]);
    s.vel[d] = std::min(std::max(s.vel[d], -max_speed), max_speed);
    s.acc[d] = std::min(std::max(s.acc[d], -max_acc), max_acc);
  }
}

struct GenParams {
  const float* templates;  // [n_templates, th, tw], values in [0, 255]
  int n_templates, th, tw;
  int n_samples, T, H, W;
  int min_obj, max_obj;
  uint64_t seed;
  double noise_std, max_speed, max_acc;
  uint8_t* out_imgs;    // [T, N, H, W]
  float* out_coords;    // [T, N, max_obj, 4] (y, x, h, w)
  uint8_t* out_nums;    // [N]
};

void generate_sample(const GenParams& p, int i) {
  Pcg32 rng(p.seed, /*seq=*/0x9E3779B97F4A7C15ULL ^ (uint64_t)i);
  const int max_tries = 5;

  int n = p.min_obj + (int)rng.below((uint32_t)(p.max_obj - p.min_obj + 1));
  p.out_nums[i] = (uint8_t)n;

  // choose distinct templates and non-overlapping integer positions
  std::vector<int> tmpl_idx(n);
  std::vector<TemplateBox> boxes(n);
  std::vector<ObjState> objs(n);

  for (bool placed = false; !placed;) {
    placed = true;
    std::vector<uint8_t> occupancy((size_t)p.H * p.W, 0);
    for (int j = 0; j < n; ++j) {
      tmpl_idx[j] = (int)rng.below((uint32_t)p.n_templates);
      const float* t = p.templates + (size_t)tmpl_idx[j] * p.th * p.tw;
      boxes[j] = tight_box(t, p.th, p.tw);
      int tries = 0;
      int y, x;
      bool free_spot = false;
      while (tries <= max_tries) {
        y = (int)std::lround(rng.uniform() * (p.H - boxes[j].h));
        x = (int)std::lround(rng.uniform() * (p.W - boxes[j].w));
        free_spot = true;
        for (int yy = y; yy < y + boxes[j].h && free_spot; ++yy)
          for (int xx = x; xx < x + boxes[j].w; ++xx)
            if (occupancy[(size_t)yy * p.W + xx]) {
              free_spot = false;
              break;
            }
        if (free_spot) break;
        ++tries;
      }
      if (!free_spot) {
        placed = false;  // resample the whole canvas (data.py:117-169)
        break;
      }
      for (int yy = y; yy < y + boxes[j].h; ++yy)
        for (int xx = x; xx < x + boxes[j].w; ++xx)
          occupancy[(size_t)yy * p.W + xx] = 1;
      objs[j].pos[0] = y;
      objs[j].pos[1] = x;
      objs[j].vel[0] = rng.uniform(-p.max_speed, p.max_speed);
      objs[j].vel[1] = rng.uniform(-p.max_speed, p.max_speed);
      objs[j].acc[0] = rng.uniform(-p.max_acc, p.max_acc);
      objs[j].acc[1] = rng.uniform(-p.max_acc, p.max_acc);
    }
  }

  // simulate + render
  std::vector<float> canvas((size_t)p.H * p.W);
  for (int t = 0; t < p.T; ++t) {
    std::fill(canvas.begin(), canvas.end(), 0.f);
    for (int j = 0; j < n; ++j) {
      const TemplateBox& b = boxes[j];
      double lo[2] = {0.0, 0.0};
      double hi[2] = {(double)(p.H - b.h), (double)(p.W - b.w)};
      if (t > 0) traj_step(objs[j], rng, lo, hi, p.max_speed, p.max_acc, p.noise_std);

      int y = (int)std::lround(objs[j].pos[0]);
      int x = (int)std::lround(objs[j].pos[1]);
      // trimmed template paste
      const float* full = p.templates + (size_t)tmpl_idx[j] * p.th * p.tw;
      for (int yy = 0; yy < b.h; ++yy)
        for (int xx = 0; xx < b.w; ++xx) {
          int cy = y + yy, cx = x + xx;
          if (cy < 0 || cy >= p.H || cx < 0 || cx >= p.W) continue;
          float v = full[(b.y0 + yy) * p.tw + (b.x0 + xx)];
          float& c = canvas[(size_t)cy * p.W + cx];
          c = std::max(c, v);
        }

      float* coord = p.out_coords +
                     (((size_t)t * p.n_samples + i) * p.max_obj + j) * 4;
      coord[0] = (float)objs[j].pos[0];
      coord[1] = (float)objs[j].pos[1];
      coord[2] = (float)b.h;
      coord[3] = (float)b.w;
    }
    uint8_t* out = p.out_imgs + ((size_t)t * p.n_samples + i) * p.H * p.W;
    for (size_t k = 0; k < canvas.size(); ++k)
      out[k] = (uint8_t)std::min(std::max(canvas[k], 0.f), 255.f);
  }
}

}  // namespace

extern "C" {

int sqair_datagen_version() { return 1; }

// Returns 0 on success, negative on invalid arguments.
int sqair_generate_sequences(
    const float* templates, int n_templates, int th, int tw,
    int n_samples, int T, int H, int W,
    int min_obj, int max_obj, uint64_t seed,
    double noise_std, double max_speed, double max_acc,
    int n_threads,
    uint8_t* out_imgs, float* out_coords, uint8_t* out_nums) {
  if (!templates || !out_imgs || !out_coords || !out_nums) return -1;
  if (n_templates <= 0 || n_samples <= 0 || T <= 0 || max_obj < min_obj ||
      min_obj < 0 || th > H || tw > W)
    return -2;

  GenParams p{templates, n_templates, th,       tw,       n_samples,
              T,         H,           W,        min_obj,  max_obj,
              seed,      noise_std,   max_speed, max_acc, out_imgs,
              out_coords, out_nums};

  std::memset(out_coords, 0,
              (size_t)T * n_samples * std::max(max_obj, 1) * 4 * sizeof(float));

  if (n_threads <= 0)
    n_threads = (int)std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min(n_threads, n_samples);

  std::atomic<int> next(0);
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int w = 0; w < n_threads; ++w)
    workers.emplace_back([&]() {
      for (int i = next.fetch_add(1); i < p.n_samples; i = next.fetch_add(1))
        generate_sample(p, i);
    });
  for (auto& t : workers) t.join();
  return 0;
}

}  // extern "C"
