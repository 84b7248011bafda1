// Native frame-feed runtime: multithreaded prefetching image loader.
//
// The reference's data path is synchronous C++ imread in the driver loop
// (Examples/MultiAgent/generic_split_seq.cc main loop); at TPU tracking
// rates the host-side decode becomes the bottleneck, so this runtime decodes
// frames ahead on a worker pool and hands them to Python in order through a
// bounded queue (ctypes binding in io/native_loader.py; cv2-based fallback
// when the library is not built).
//
// Build: make -C native   (g++ -O2 -shared, links OpenCV imgcodecs)

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct Frame {
  std::vector<float> data;
  int h = 0, w = 0;
  bool ok = false;
};

struct Loader {
  std::vector<std::string> paths;
  float depth_scale;   // 0 => grayscale u8 -> float; >0 => 16-bit depth/scale
  size_t queue_cap;
  std::vector<std::thread> workers;

  std::mutex mu;
  std::condition_variable cv_produced;
  std::condition_variable cv_space;
  std::map<size_t, Frame> ready;   // decoded frames awaiting consumption
  size_t next_to_take = 0;         // producer: next index to claim
  size_t next_to_emit = 0;         // consumer: next index to deliver
  bool stop = false;

  void worker() {
    for (;;) {
      size_t idx;
      {
        std::lock_guard<std::mutex> lk(mu);
        if (stop || next_to_take >= paths.size()) return;
        idx = next_to_take++;
      }
      Frame f = decode(paths[idx]);
      {
        std::unique_lock<std::mutex> lk(mu);
        // bound memory: don't run more than queue_cap frames ahead
        cv_space.wait(lk, [&] {
          return stop || idx < next_to_emit + queue_cap;
        });
        if (stop) return;
        ready.emplace(idx, std::move(f));
      }
      cv_produced.notify_all();
    }
  }

  Frame decode(const std::string& path) {
    Frame f;
    if (depth_scale > 0.0f) {
      cv::Mat img = cv::imread(path, cv::IMREAD_UNCHANGED);
      if (img.empty()) return f;
      cv::Mat f32;
      img.convertTo(f32, CV_32F, 1.0 / depth_scale);
      f.h = f32.rows;
      f.w = f32.cols;
      f.data.assign((float*)f32.datastart, (float*)f32.dataend);
    } else {
      cv::Mat img = cv::imread(path, cv::IMREAD_GRAYSCALE);
      if (img.empty()) return f;
      cv::Mat f32;
      img.convertTo(f32, CV_32F);  // 0..255 float, matching ops.orb input
      f.h = f32.rows;
      f.w = f32.cols;
      f.data.assign((float*)f32.datastart, (float*)f32.dataend);
    }
    f.ok = true;
    return f;
  }
};

}  // namespace

extern "C" {

void* loader_create(const char** paths, int64_t n, int n_threads,
                    int64_t queue_cap, float depth_scale) {
  auto* L = new Loader();
  L->paths.assign(paths, paths + n);
  L->depth_scale = depth_scale;
  L->queue_cap = queue_cap > 0 ? (size_t)queue_cap : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

// Blocks until frame `next_to_emit` is decoded; copies into out (row-major
// float32, capacity out_cap floats). Returns: >=0 pixel count written,
// -1 end of sequence, -2 decode failure, -3 buffer too small.
int64_t loader_next(void* handle, float* out, int64_t out_cap,
                    int32_t* h_out, int32_t* w_out) {
  auto* L = (Loader*)handle;
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_to_emit >= L->paths.size()) return -1;
  size_t idx = L->next_to_emit;
  L->cv_produced.wait(lk, [&] { return L->stop || L->ready.count(idx); });
  if (L->stop) return -1;
  Frame f = std::move(L->ready[idx]);
  L->ready.erase(idx);
  L->next_to_emit++;
  lk.unlock();
  L->cv_space.notify_all();
  if (!f.ok) return -2;
  int64_t n = (int64_t)f.data.size();
  if (n > out_cap) return -3;
  std::memcpy(out, f.data.data(), n * sizeof(float));
  *h_out = f.h;
  *w_out = f.w;
  return n;
}

void loader_destroy(void* handle) {
  auto* L = (Loader*)handle;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_produced.notify_all();
  L->cv_space.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
