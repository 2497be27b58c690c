// Native data loader for xchu_slam_tpu.
//
// The reference's data path is rosbag replay into PCL containers (C++);
// the TPU-native equivalent is a host-side native loader that reads KITTI
// velodyne .bin scans, strips non-finite points, optionally range-crops, and
// stages them into a fixed-capacity pinned buffer ready for a single
// host->device transfer. Exposed through a plain C ABI consumed via ctypes
// (no pybind11 in this image).
//
// Also provides a background prefetcher: a reader thread that loads scan k+1
// while the device works on scan k (the rosbag-replay producer/consumer
// pattern without ROS).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Read one KITTI velodyne .bin file (float32 x,y,z,intensity records).
// Fills out_xyz [capacity*3], out_intensity [capacity], zero-pads the tail,
// and returns the number of valid points written (<= capacity).
// Points with non-finite coordinates are dropped; if min_range/max_range > 0
// an annulus crop on horizontal range is applied during the scan.
int64_t xst_read_velodyne(const char* path, float* out_xyz,
                          float* out_intensity, int64_t capacity,
                          float min_range, float max_range) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const int64_t n_rec = bytes / (4 * sizeof(float));
  std::vector<float> raw(static_cast<size_t>(n_rec) * 4);
  const size_t got = std::fread(raw.data(), sizeof(float), raw.size(), f);
  std::fclose(f);
  const int64_t n = static_cast<int64_t>(got / 4);

  const bool crop = min_range > 0.0f || max_range > 0.0f;
  const float min2 = min_range * min_range;
  const float max2 = max_range > 0.0f ? max_range * max_range : 3.4e38f;
  int64_t w = 0;
  for (int64_t i = 0; i < n && w < capacity; ++i) {
    const float x = raw[4 * i], y = raw[4 * i + 1], z = raw[4 * i + 2];
    const float it = raw[4 * i + 3];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    if (crop) {
      const float r2 = x * x + y * y;
      if (r2 <= min2 || r2 >= max2) continue;
    }
    out_xyz[3 * w] = x;
    out_xyz[3 * w + 1] = y;
    out_xyz[3 * w + 2] = z;
    out_intensity[w] = it;
    ++w;
  }
  // zero-pad the tail so the fixed-shape device buffer is fully defined
  std::memset(out_xyz + 3 * w, 0, sizeof(float) * 3 * (capacity - w));
  std::memset(out_intensity + w, 0, sizeof(float) * (capacity - w));
  return w;
}

// ---------------------------------------------------------------------------
// Double-buffered background prefetcher over a list of files.
// ---------------------------------------------------------------------------

struct Prefetcher {
  std::vector<std::string> files;
  int64_t capacity;
  float min_range, max_range;

  std::vector<float> xyz[2];
  std::vector<float> inten[2];
  int64_t count[2];
  int64_t loaded_idx[2];

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  int64_t next_to_load = 0;     // file index the worker should load next
  int64_t consumed = 0;         // file index the consumer wants next
  bool stop = false;
  bool slot_ready[2] = {false, false};

  void run() {
    while (true) {
      int64_t idx;
      int slot;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] {
          if (stop) return true;
          if (next_to_load >= static_cast<int64_t>(files.size())) return false;
          const int s = next_to_load % 2;
          return !slot_ready[s];
        });
        if (stop) return;
        idx = next_to_load++;
        slot = idx % 2;
      }
      count[slot] = xst_read_velodyne(files[idx].c_str(), xyz[slot].data(),
                                      inten[slot].data(), capacity, min_range,
                                      max_range);
      loaded_idx[slot] = idx;
      {
        std::lock_guard<std::mutex> lk(mu);
        slot_ready[slot] = true;
      }
      cv.notify_all();
    }
  }
};

void* xst_prefetcher_create(const char** paths, int64_t n_paths,
                            int64_t capacity, float min_range,
                            float max_range) {
  auto* p = new Prefetcher();
  p->files.reserve(n_paths);
  for (int64_t i = 0; i < n_paths; ++i) p->files.emplace_back(paths[i]);
  p->capacity = capacity;
  p->min_range = min_range;
  p->max_range = max_range;
  for (int s = 0; s < 2; ++s) {
    p->xyz[s].resize(static_cast<size_t>(capacity) * 3);
    p->inten[s].resize(static_cast<size_t>(capacity));
    p->count[s] = 0;
    p->loaded_idx[s] = -1;
  }
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocks until scan `idx` is loaded, copies it out, frees the slot.
// Returns the valid-point count, or -2 when idx is out of range.
int64_t xst_prefetcher_get(void* handle, int64_t idx, float* out_xyz,
                           float* out_intensity) {
  auto* p = static_cast<Prefetcher*>(handle);
  if (idx < 0 || idx >= static_cast<int64_t>(p->files.size())) return -2;
  const int slot = idx % 2;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->cv.wait(lk, [&] { return p->slot_ready[slot] &&
                                p->loaded_idx[slot] == idx; });
  }
  const int64_t n = p->count[slot];
  std::memcpy(out_xyz, p->xyz[slot].data(),
              sizeof(float) * 3 * p->capacity);
  std::memcpy(out_intensity, p->inten[slot].data(),
              sizeof(float) * p->capacity);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->slot_ready[slot] = false;
  }
  p->cv.notify_all();
  return n;
}

void xst_prefetcher_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
