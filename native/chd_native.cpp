// chd_native: native runtime components for the chd_tpu framework.
//
// The reference's native layer was its IPOPT solver front-end
// (towr_phys_optim/), which this framework replaces with on-device JAX. The
// remaining host-side hot paths are ingest I/O: parsing thousands of tiny
// per-frame OpenPose JSON files (reference hot loop:
// src/utils/openpose_utils.py:70-76 via json.load per frame) and large
// whitespace-float solution/motion files (towr_utils.load_results:51-122).
// This library does both with a specialized scanner, multithreaded over
// files, exposed through a plain C ABI for ctypes.
//
// Build: make -C native   →  libchd_native.so

#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

namespace {

// Read a whole file into a string; returns false on failure.
bool slurp(const char* path, std::string* out) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f.good()) return false;
  std::streamsize n = f.tellg();
  f.seekg(0);
  out->resize(static_cast<size_t>(n));
  return static_cast<bool>(f.read(&(*out)[0], n));
}

// Scan an OpenPose keypoint JSON: find the FIRST person's
// "pose_keypoints_2d" array and parse its floats. Returns number of values
// parsed (0 when no person present). Tolerant of whitespace/formatting.
int parse_keypoint_json(const std::string& text, double* out, int max_vals) {
  const char* key = "\"pose_keypoints_2d\"";
  size_t pos = text.find(key);
  if (pos == std::string::npos) return 0;
  pos = text.find('[', pos);
  if (pos == std::string::npos) return 0;
  const char* p = text.c_str() + pos + 1;
  int count = 0;
  while (*p && *p != ']' && count < max_vals) {
    char* end = nullptr;
    double v = strtod(p, &end);
    if (end == p) {  // skip separators
      ++p;
      continue;
    }
    out[count++] = v;
    p = end;
  }
  return count;
}

}  // namespace

extern "C" {

// Parse `num_files` OpenPose JSON files (NUL-separated concatenated paths)
// into out[num_files * num_joints * 3]. Frames with no detected person are
// zero-filled (reference load_keypoint_file:63-65). Returns 0 on success,
// else the 1-based index of the first unreadable file.
int chd_load_keypoint_dir(const char* paths, int num_files, int num_joints,
                          double* out) {
  std::vector<const char*> files(num_files);
  const char* p = paths;
  for (int i = 0; i < num_files; ++i) {
    files[i] = p;
    p += strlen(p) + 1;
  }
  const int vals_per_frame = num_joints * 3;
  std::atomic<int> error{0};

  int n_threads = std::min<int>(std::thread::hardware_concurrency(), 16);
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  std::atomic<int> next{0};
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&]() {
      std::string buf;
      for (;;) {
        int i = next.fetch_add(1);
        if (i >= num_files || error.load() != 0) break;
        buf.clear();
        if (!slurp(files[i], &buf)) {
          int expected = 0;
          error.compare_exchange_strong(expected, i + 1);
          break;
        }
        double* dst = out + static_cast<int64_t>(i) * vals_per_frame;
        memset(dst, 0, sizeof(double) * vals_per_frame);
        parse_keypoint_json(buf, dst, vals_per_frame);
      }
    });
  }
  for (auto& w : workers) w.join();
  return error.load();
}

// Parse up to `max_vals` whitespace-separated floats from `path` into `out`,
// skipping any non-numeric tokens (header labels like "base_lin"). Returns
// the number of floats parsed, or -1 if the file can't be read.
int64_t chd_parse_floats(const char* path, double* out, int64_t max_vals) {
  std::string text;
  if (!slurp(path, &text)) return -1;
  const char* p = text.c_str();
  const char* end_text = p + text.size();
  int64_t count = 0;
  while (p < end_text && count < max_vals) {
    if (isspace(static_cast<unsigned char>(*p))) {
      ++p;
      continue;
    }
    char* end = nullptr;
    double v = strtod(p, &end);
    if (end == p) {  // non-numeric token: skip to next whitespace
      while (p < end_text && !isspace(static_cast<unsigned char>(*p))) ++p;
      continue;
    }
    out[count++] = v;
    p = end;
  }
  return count;
}

// Library version/sanity probe.
int chd_native_version() { return 1; }

}  // extern "C"
