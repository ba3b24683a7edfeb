// sfio — native IO runtime for the data pipeline.
//
// The reference feeds its trainer with torch DataLoader worker *processes*
// (core/mf_datasets.py:1453). Here the host pipeline is thread-based
// (data/loader.py); this library supplies the GIL-free leaf operations:
// batched file reads + Middlebury .flo / binary PPM decoding on a C++ thread
// pool, exposed through a minimal C ABI consumed via ctypes
// (streamflow_tpu/runtime/__init__.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread sfio.cpp -o libsfio.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct ThreadPool {
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] { Loop(); });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return done_ || !q_.empty(); });
        if (done_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool done_ = false;
};

ThreadPool* Pool() {
  static ThreadPool pool(std::max(2u, std::thread::hardware_concurrency()));
  return &pool;
}

bool ReadFile(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(size));
  size_t got = std::fread(out->data(), 1, out->size(), f);
  std::fclose(f);
  return got == out->size();
}

// Decode a Middlebury .flo (magic 202021.25, int32 w/h, float32 wh*2) into
// dst (must hold h*w*2 floats). Returns 0 on success.
int DecodeFlo(const uint8_t* buf, size_t len, float* dst, int32_t* w,
              int32_t* h) {
  if (len < 12) return 1;
  float magic;
  std::memcpy(&magic, buf, 4);
  if (magic != 202021.25f) return 2;
  std::memcpy(w, buf + 4, 4);
  std::memcpy(h, buf + 8, 4);
  size_t want = 12 + static_cast<size_t>(*w) * (*h) * 2 * 4;
  if (len < want) return 3;
  std::memcpy(dst, buf + 12, static_cast<size_t>(*w) * (*h) * 2 * 4);
  return 0;
}

// Decode binary PPM (P6, maxval 255) into dst (h*w*3 uint8).
int DecodePpm(const uint8_t* buf, size_t len, uint8_t* dst, int32_t* w,
              int32_t* h) {
  if (len < 2 || buf[0] != 'P' || buf[1] != '6') return 1;
  size_t pos = 2;
  auto skip_ws = [&] {
    while (pos < len) {
      if (buf[pos] == '#') {
        while (pos < len && buf[pos] != '\n') ++pos;
      } else if (buf[pos] == ' ' || buf[pos] == '\n' || buf[pos] == '\t' ||
                 buf[pos] == '\r') {
        ++pos;
      } else {
        break;
      }
    }
  };
  auto read_int = [&]() -> long {
    skip_ws();
    long v = 0;
    bool any = false;
    while (pos < len && buf[pos] >= '0' && buf[pos] <= '9') {
      v = v * 10 + (buf[pos] - '0');
      ++pos;
      any = true;
    }
    return any ? v : -1;
  };
  long wv = read_int(), hv = read_int(), maxv = read_int();
  if (wv <= 0 || hv <= 0 || maxv != 255) return 2;
  ++pos;  // single whitespace after maxval
  size_t want = static_cast<size_t>(wv) * hv * 3;
  if (len - pos < want) return 3;
  std::memcpy(dst, buf + pos, want);
  *w = static_cast<int32_t>(wv);
  *h = static_cast<int32_t>(hv);
  return 0;
}

}  // namespace

extern "C" {

// Probe a .flo header: returns 0 and fills w/h.
int sfio_flo_header(const char* path, int32_t* w, int32_t* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  uint8_t hdr[12];
  size_t got = std::fread(hdr, 1, 12, f);
  std::fclose(f);
  if (got != 12) return 2;
  float magic;
  std::memcpy(&magic, hdr, 4);
  if (magic != 202021.25f) return 3;
  std::memcpy(w, hdr + 4, 4);
  std::memcpy(h, hdr + 8, 4);
  return 0;
}

// Decode one .flo into caller-provided dst (h*w*2 floats).
int sfio_read_flo(const char* path, float* dst, int32_t w, int32_t h) {
  std::vector<uint8_t> buf;
  if (!ReadFile(path, &buf)) return 1;
  int32_t rw, rh;
  int rc = DecodeFlo(buf.data(), buf.size(), dst, &rw, &rh);
  if (rc) return rc;
  return (rw == w && rh == h) ? 0 : 4;
}

// Batched .flo decode on the thread pool. paths: array of n C strings;
// dst: n contiguous (h*w*2) float blocks. Returns count of failures.
int sfio_read_flo_batch(const char** paths, int n, float* dst, int32_t w,
                        int32_t h) {
  std::atomic<int> failures{0};
  std::atomic<int> remaining{n};
  std::mutex mu;
  std::condition_variable cv;
  size_t stride = static_cast<size_t>(w) * h * 2;
  for (int i = 0; i < n; ++i) {
    Pool()->Submit([&, i] {
      if (sfio_read_flo(paths[i], dst + stride * i, w, h) != 0) {
        failures.fetch_add(1);
      }
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return remaining.load() == 0; });
  return failures.load();
}

int sfio_ppm_header(const char* path, int32_t* w, int32_t* h) {
  std::vector<uint8_t> buf;
  if (!ReadFile(path, &buf)) return 1;
  // decode header only: reuse DecodePpm bounds logic with a probe buffer
  if (buf.size() < 2 || buf[0] != 'P' || buf[1] != '6') return 2;
  // cheap re-parse
  std::vector<uint8_t> tmp(1);
  int32_t rw = 0, rh = 0;
  // parse dims without copying payload
  size_t pos = 2;
  auto skip_ws = [&] {
    while (pos < buf.size()) {
      if (buf[pos] == '#') {
        while (pos < buf.size() && buf[pos] != '\n') ++pos;
      } else if (isspace(buf[pos])) {
        ++pos;
      } else
        break;
    }
  };
  auto read_int = [&]() -> long {
    skip_ws();
    long v = 0;
    bool any = false;
    while (pos < buf.size() && isdigit(buf[pos])) {
      v = v * 10 + (buf[pos] - '0');
      ++pos;
      any = true;
    }
    return any ? v : -1;
  };
  long wv = read_int(), hv = read_int();
  if (wv <= 0 || hv <= 0) return 3;
  *w = static_cast<int32_t>(wv);
  *h = static_cast<int32_t>(hv);
  return 0;
}

int sfio_read_ppm(const char* path, uint8_t* dst, int32_t w, int32_t h) {
  std::vector<uint8_t> buf;
  if (!ReadFile(path, &buf)) return 1;
  int32_t rw, rh;
  int rc = DecodePpm(buf.data(), buf.size(), dst, &rw, &rh);
  if (rc) return rc;
  return (rw == w && rh == h) ? 0 : 4;
}

}  // extern "C"
