// Multi-threaded G-buffer batch decoding (native input-pipeline hot path).
//
// The reference decoded EXRs one-by-one from a Python generator
// (/root/reference/realtime_style_transfer/dataloaders/hdrScreenshots.py:46-57).
// Here a C++ thread pool decodes a whole batch of per-channel EXRs directly into
// a caller-owned float32 buffer — the Python caller releases the GIL for the
// duration (ctypes), so decode genuinely overlaps the training step.
//
// Plane selection: for each EXR, the named channels ("R", "G", "B" or just "R")
// are copied in the order requested, so the output layout matches the model's
// channel stacking exactly.

#include <atomic>
#include <mutex>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

// from exr_decoder.cpp
extern "C" {
int exr_read_info(const char* path, int* width, int* height, int* num_channels,
                  char* names_buf, int names_cap);
int exr_read(const char* path, float* out);
const char* exr_last_error();
}

namespace {

thread_local std::string g_batch_error;

// Decode one EXR and copy the requested planes ("R[,G,B]") into dst (plane-major).
int decode_into(const char* path, int num_planes, float* dst, int h, int w) {
  int fw = 0, fh = 0, fc = 0;
  char names[8192];
  if (exr_read_info(path, &fw, &fh, &fc, names, sizeof(names)) != 0) {
    g_batch_error = std::string(path) + ": " + exr_last_error();
    return -1;
  }
  if (fw != w || fh != h) {
    g_batch_error = std::string(path) + ": expected " + std::to_string(w) + "x" +
                    std::to_string(h) + ", got " + std::to_string(fw) + "x" +
                    std::to_string(fh);
    return -1;
  }
  std::vector<float> all(static_cast<size_t>(fc) * h * w);
  if (exr_read(path, all.data()) != 0) {
    g_batch_error = std::string(path) + ": " + exr_last_error();
    return -1;
  }
  // channel names arrive '\n'-joined in FILE order (alphabetical)
  std::vector<std::string> file_names;
  {
    std::string s(names);
    size_t pos = 0;
    while (pos <= s.size()) {
      size_t nl = s.find('\n', pos);
      if (nl == std::string::npos) {
        file_names.push_back(s.substr(pos));
        break;
      }
      file_names.push_back(s.substr(pos, nl - pos));
      pos = nl + 1;
    }
  }
  const char* want3[3] = {"R", "G", "B"};
  for (int p = 0; p < num_planes; ++p) {
    const char* want = num_planes >= 3 ? want3[p] : "R";
    int idx = -1;
    for (size_t i = 0; i < file_names.size(); ++i) {
      if (file_names[i] == want) {
        idx = static_cast<int>(i);
        break;
      }
    }
    if (idx < 0) {
      g_batch_error = std::string(path) + ": missing channel " + want;
      return -1;
    }
    std::memcpy(dst + static_cast<size_t>(p) * h * w,
                all.data() + static_cast<size_t>(idx) * h * w,
                sizeof(float) * h * w);
  }
  return 0;
}

}  // namespace

extern "C" {

const char* gbuffer_batch_last_error() { return g_batch_error.c_str(); }

// Decode num_exrs EXR files in parallel. plane_counts[i] planes are taken from
// exr_paths[i] (R,G,B for >=3, else R) and written consecutively into out as
// (total_planes, h, w) plane-major. Returns 0, or -1 with the first error.
int gbuffer_batch_read(const char** exr_paths, const int* plane_counts,
                       int num_exrs, float* out, int h, int w,
                       int num_threads) {
  std::vector<size_t> offsets(num_exrs);
  size_t total = 0;
  for (int i = 0; i < num_exrs; ++i) {
    offsets[i] = total;
    total += static_cast<size_t>(plane_counts[i]) * h * w;
  }

  std::atomic<int> next(0);
  std::atomic<bool> failed(false);
  std::string first_error;
  std::mutex err_mu;

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= num_exrs || failed.load()) return;
      if (decode_into(exr_paths[i], plane_counts[i], out + offsets[i], h, w) !=
          0) {
        std::lock_guard<std::mutex> lock(err_mu);
        if (!failed.exchange(true)) first_error = g_batch_error;
      }
    }
  };

  int n_threads = num_threads > 0 ? num_threads : 1;
  if (n_threads > num_exrs) n_threads = num_exrs;
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();

  if (failed.load()) {
    g_batch_error = first_error;
    return -1;
  }
  return 0;
}

}  // extern "C"
