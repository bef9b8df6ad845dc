// Native async KITTI scan loader (SURVEY.md C1 native equivalent).
//
// The reference's C++ loader reads velodyne .bin files synchronously inside
// the frame loop; at a 100 fps target the host must instead stream ~200 MB/s
// of scans while the device computes.  This library runs a small thread pool
// that reads ahead `queue_depth` frames, pads each raw (N,4) float32 scan to
// the pipeline's fixed (n_max, 4) shape with the 1e6 sentinel, and builds the
// validity mask — so Python's per-frame work is a single queue pop into
// preallocated buffers that feed jax.device_put directly.
//
// C ABI only (consumed via ctypes; no pybind11 in this environment).

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <dirent.h>
#include <sys/stat.h>

namespace {

constexpr float kPadSentinel = 1e6f;

struct Frame {
  int index = -1;
  int n_valid = 0;
  std::vector<float> points;   // n_max * 4
  std::vector<uint8_t> mask;   // n_max
};

struct Loader {
  std::vector<std::string> files;
  int n_max = 0;
  int queue_depth = 4;

  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  std::deque<Frame> ready;     // ordered by index
  int next_to_read = 0;        // next file index a worker may claim
  int next_to_serve = 0;       // next index the consumer expects
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  ~Loader() {
    stop.store(true);
    cv_space.notify_all();
    cv_ready.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
  }
};

bool read_scan(const std::string& path, int n_max, Frame* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long bytes = ftell(f);
  fseek(f, 0, SEEK_SET);
  long n_pts = bytes / (4 * sizeof(float));
  long n = n_pts < n_max ? n_pts : n_max;

  out->points.assign(static_cast<size_t>(n_max) * 4, kPadSentinel);
  out->mask.assign(n_max, 0);
  size_t got = fread(out->points.data(), 4 * sizeof(float), n, f);
  fclose(f);
  if (static_cast<long>(got) != n) return false;
  std::memset(out->mask.data(), 1, n);
  out->n_valid = static_cast<int>(n);
  return true;
}

void worker_loop(Loader* L) {
  while (!L->stop.load()) {
    int idx;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_space.wait(lk, [&] {
        return L->stop.load() ||
               (L->next_to_read < static_cast<int>(L->files.size()) &&
                L->next_to_read - L->next_to_serve < L->queue_depth);
      });
      if (L->stop.load()) return;
      idx = L->next_to_read++;
    }
    Frame fr;
    fr.index = idx;
    if (!read_scan(L->files[idx], L->n_max, &fr)) fr.n_valid = -1;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      // Insert ordered by index so the consumer pops strictly in order.
      auto it = L->ready.begin();
      while (it != L->ready.end() && it->index < fr.index) ++it;
      L->ready.insert(it, std::move(fr));
    }
    L->cv_ready.notify_all();
  }
}

}  // namespace

extern "C" {

void* velo_loader_open(const char* velo_dir, int n_max, int queue_depth,
                       int n_threads) {
  auto* L = new Loader();
  L->n_max = n_max;
  L->queue_depth = queue_depth > 0 ? queue_depth : 4;

  DIR* d = opendir(velo_dir);
  if (!d) {
    delete L;
    return nullptr;
  }
  while (dirent* e = readdir(d)) {
    std::string name(e->d_name);
    if (name.size() > 4 && name.substr(name.size() - 4) == ".bin")
      L->files.push_back(std::string(velo_dir) + "/" + name);
  }
  closedir(d);
  std::sort(L->files.begin(), L->files.end());
  if (L->files.empty()) {
    delete L;
    return nullptr;
  }
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    L->workers.emplace_back(worker_loop, L);
  return L;
}

int velo_loader_count(void* h) {
  return static_cast<int>(static_cast<Loader*>(h)->files.size());
}

// Blocking: fills out_points (n_max*4 floats) and out_mask (n_max bytes) with
// the next frame in order. Returns the number of valid points, -1 on read
// error, -2 when the sequence is exhausted.
int velo_loader_next(void* h, float* out_points, uint8_t* out_mask) {
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_to_serve >= static_cast<int>(L->files.size())) return -2;
  int want = L->next_to_serve;
  L->cv_ready.wait(lk, [&] {
    return L->stop.load() ||
           (!L->ready.empty() && L->ready.front().index == want);
  });
  if (L->stop.load()) return -2;
  Frame fr = std::move(L->ready.front());
  L->ready.pop_front();
  L->next_to_serve++;
  lk.unlock();
  L->cv_space.notify_all();

  std::memcpy(out_points, fr.points.data(), fr.points.size() * sizeof(float));
  std::memcpy(out_mask, fr.mask.data(), fr.mask.size());
  return fr.n_valid;
}

void velo_loader_close(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
