// Native terrain toolkit: procedural heightfield generators and
// heightfield -> trimesh conversion.
//
// TPU-native replacement for the C++ side of isaacgym.terrain_utils
// (reference mini_gym/utils/terrain.py:38-41, :119-164; SURVEY.md §2.1 N9).
// Host/init-time only: the generated int16 grid is uploaded to HBM once.
// Python binds via ctypes (rapid_locomotion_rl_tpu/envs/terrain_native.py)
// with a NumPy fallback when the shared library is unavailable.
//
// All functions operate on a row-major int16 height grid of shape
// [width, length] whose values are in `vertical_scale` meters.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// xorshift-based deterministic RNG so results are reproducible from a seed
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ull) {}
  uint64_t next() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  int64_t randint(int64_t lo, int64_t hi) {  // [lo, hi)
    return lo + static_cast<int64_t>(uniform() * (hi - lo));
  }
};

void random_uniform_terrain(int16_t* hf, int64_t width, int64_t length,
                            double min_height, double max_height, double step,
                            double downsampled_scale, double vertical_scale,
                            double horizontal_scale, uint64_t seed) {
  Rng rng(seed);
  const int64_t lo = static_cast<int64_t>(min_height / vertical_scale);
  const int64_t hi = static_cast<int64_t>(max_height / vertical_scale);
  const int64_t step_i =
      std::max<int64_t>(1, static_cast<int64_t>(step / vertical_scale));
  const int64_t nlevels = (hi - lo) / step_i + 1;
  const int64_t ds = std::max<int64_t>(
      1, static_cast<int64_t>(downsampled_scale / horizontal_scale));
  const int64_t cw = width / ds + 2, cl = length / ds + 2;

  // coarse grid then nearest-neighbor upsample (matches the python impl)
  std::vector<int16_t> coarse(cw * cl);
  for (auto& v : coarse)
    v = static_cast<int16_t>(lo + rng.randint(0, nlevels) * step_i);
  for (int64_t i = 0; i < width; ++i) {
    const int64_t ci = i / ds;
    for (int64_t j = 0; j < length; ++j) {
      hf[i * length + j] = static_cast<int16_t>(
          hf[i * length + j] + coarse[ci * cl + j / ds]);
    }
  }
}

void pyramid_sloped_terrain(int16_t* hf, int64_t width, int64_t length,
                            double slope, double platform_size,
                            double vertical_scale, double horizontal_scale) {
  const double cx = (width - 1) / 2.0, cy = (length - 1) / 2.0;
  const double max_h = slope * (width / 2.0) * horizontal_scale;
  const int64_t half_plat =
      static_cast<int64_t>(platform_size / horizontal_scale / 2.0);
  int16_t apex = 0;
  for (int64_t i = 0; i < width; ++i) {
    const double fx = 1.0 - std::abs(i - cx) / cx;
    for (int64_t j = 0; j < length; ++j) {
      const double fy = 1.0 - std::abs(j - cy) / cy;
      const double ramp = std::min(fx, fy);
      hf[i * length + j] = static_cast<int16_t>(
          hf[i * length + j] + ramp * max_h / vertical_scale);
    }
  }
  const int64_t x1 = static_cast<int64_t>(cx) - half_plat;
  const int64_t x2 = static_cast<int64_t>(cx) + half_plat;
  const int64_t y1 = static_cast<int64_t>(cy) - half_plat;
  const int64_t y2 = static_cast<int64_t>(cy) + half_plat;
  apex = slope >= 0 ? INT16_MIN : INT16_MAX;
  for (int64_t i = x1; i < x2; ++i)
    for (int64_t j = y1; j < y2; ++j)
      apex = slope >= 0 ? std::max(apex, hf[i * length + j])
                        : std::min(apex, hf[i * length + j]);
  for (int64_t i = x1; i < x2; ++i)
    for (int64_t j = y1; j < y2; ++j) hf[i * length + j] = apex;
}

void pyramid_stairs_terrain(int16_t* hf, int64_t width, int64_t length,
                            double step_width, double step_height,
                            double platform_size, double vertical_scale,
                            double horizontal_scale) {
  const int64_t sw =
      std::max<int64_t>(1, static_cast<int64_t>(step_width / horizontal_scale));
  const int64_t sh = static_cast<int64_t>(step_height / vertical_scale);
  const int64_t half_plat =
      static_cast<int64_t>(platform_size / horizontal_scale / 2.0);
  int64_t x1 = 0, x2 = width, y1 = 0, y2 = length;
  int64_t h = 0;
  while ((x2 - x1) > 2 * half_plat && (y2 - y1) > 2 * half_plat) {
    x1 += sw; x2 -= sw; y1 += sw; y2 -= sw; h += sh;
    for (int64_t i = std::max<int64_t>(x1, 0);
         i < std::min<int64_t>(x2, width); ++i)
      for (int64_t j = std::max<int64_t>(y1, 0);
           j < std::min<int64_t>(y2, length); ++j)
        hf[i * length + j] = static_cast<int16_t>(h);
  }
}

void discrete_obstacles_terrain(int16_t* hf, int64_t width, int64_t length,
                                double max_height, double min_size,
                                double max_size, int64_t num_rects,
                                double platform_size, double vertical_scale,
                                double horizontal_scale, uint64_t seed) {
  Rng rng(seed);
  const int64_t h_i = static_cast<int64_t>(max_height / vertical_scale);
  const int64_t heights[4] = {-h_i, -h_i / 2, h_i / 2, h_i};
  const int64_t min_i = static_cast<int64_t>(min_size / horizontal_scale);
  const int64_t max_i = static_cast<int64_t>(max_size / horizontal_scale);
  for (int64_t r = 0; r < num_rects; ++r) {
    const int64_t w = rng.randint(min_i, max_i + 1);
    const int64_t l = rng.randint(min_i, max_i + 1);
    const int64_t x = rng.randint(0, std::max<int64_t>(width - w, 1));
    const int64_t y = rng.randint(0, std::max<int64_t>(length - l, 1));
    const int16_t h = static_cast<int16_t>(heights[rng.randint(0, 4)]);
    for (int64_t i = x; i < std::min(x + w, width); ++i)
      for (int64_t j = y; j < std::min(y + l, length); ++j)
        hf[i * length + j] = h;
  }
  const int64_t cx = width / 2, cy = length / 2;
  const int64_t half =
      static_cast<int64_t>(platform_size / horizontal_scale / 2.0);
  for (int64_t i = cx - half; i < cx + half; ++i)
    for (int64_t j = cy - half; j < cy + half; ++j)
      hf[i * length + j] = 0;
}

void stepping_stones_terrain(int16_t* hf, int64_t width, int64_t length,
                             double stone_size, double stone_distance,
                             double max_height, double platform_size,
                             double depth, double vertical_scale,
                             double horizontal_scale, uint64_t seed) {
  Rng rng(seed);
  const int64_t stone =
      std::max<int64_t>(1, static_cast<int64_t>(stone_size / horizontal_scale));
  const int64_t dist = static_cast<int64_t>(stone_distance / horizontal_scale);
  const int64_t h_i = static_cast<int64_t>(max_height / vertical_scale);
  const int16_t pit = static_cast<int16_t>(depth / vertical_scale);
  for (int64_t i = 0; i < width * length; ++i) hf[i] = pit;
  for (int64_t y = 0; y < length; y += stone + dist) {
    int64_t x = rng.randint(0, stone) - stone;
    for (; x < width; x += stone + dist) {
      const int16_t h =
          h_i > 0 ? static_cast<int16_t>(rng.randint(-h_i, h_i + 1)) : 0;
      for (int64_t i = std::max<int64_t>(x, 0);
           i < std::min(x + stone, width); ++i)
        for (int64_t j = y; j < std::min(y + stone, length); ++j)
          hf[i * length + j] = h;
    }
  }
  const int64_t cx = width / 2, cy = length / 2;
  const int64_t half =
      static_cast<int64_t>(platform_size / horizontal_scale / 2.0);
  for (int64_t i = cx - half; i < cx + half; ++i)
    for (int64_t j = cy - half; j < cy + half; ++j)
      hf[i * length + j] = 0;
}

// Heightfield -> triangle mesh with slope-threshold vertical correction
// (terrain_utils.convert_heightfield_to_trimesh analogue; reference
// terrain.py:38-41). Writes [rows*cols, 3] float32 vertices and
// [2*(rows-1)*(cols-1), 3] uint32 triangles.
void heightfield_to_trimesh(const int16_t* hf, int64_t rows, int64_t cols,
                            double horizontal_scale, double vertical_scale,
                            double slope_threshold, float* vertices,
                            uint32_t* triangles) {
  const double corr = slope_threshold * horizontal_scale / vertical_scale;
  for (int64_t i = 0; i < rows; ++i) {
    for (int64_t j = 0; j < cols; ++j) {
      double x = i * horizontal_scale;
      double y = j * horizontal_scale;
      const double z = hf[i * cols + j] * vertical_scale;
      // move vertices horizontally at steep steps to make walls vertical
      if (i + 1 < rows &&
          hf[(i + 1) * cols + j] - hf[i * cols + j] > corr)
        x += horizontal_scale;
      else if (i > 0 && hf[(i - 1) * cols + j] - hf[i * cols + j] > corr)
        x -= horizontal_scale;
      if (j + 1 < cols &&
          hf[i * cols + j + 1] - hf[i * cols + j] > corr)
        y += horizontal_scale;
      else if (j > 0 && hf[i * cols + j - 1] - hf[i * cols + j] > corr)
        y -= horizontal_scale;
      float* v = vertices + 3 * (i * cols + j);
      v[0] = static_cast<float>(x);
      v[1] = static_cast<float>(y);
      v[2] = static_cast<float>(z);
    }
  }
  int64_t t = 0;
  for (int64_t i = 0; i + 1 < rows; ++i) {
    for (int64_t j = 0; j + 1 < cols; ++j) {
      const uint32_t a = static_cast<uint32_t>(i * cols + j);
      const uint32_t b = a + 1;
      const uint32_t c = a + static_cast<uint32_t>(cols);
      const uint32_t d = c + 1;
      triangles[3 * t + 0] = a; triangles[3 * t + 1] = c;
      triangles[3 * t + 2] = b; ++t;
      triangles[3 * t + 0] = b; triangles[3 * t + 1] = c;
      triangles[3 * t + 2] = d; ++t;
    }
  }
}

}  // extern "C"
