// Native async PNG writer.
//
// The MS-COCO eval loop writes 10k PNGs; at SDXL sizes a Python/PIL encode
// costs ~100ms+ per 1024^2 image — a double-digit share of a >=1 img/s/chip
// budget.  This worker-pool encoder overlaps zlib compression + disk IO with
// TPU compute.  The reference has no native code at all (SURVEY.md §2); this
// is the TPU build's runtime-side native layer (host IO), exposed to Python
// via ctypes (cfgpp_tpu/native/__init__.py), with a PIL fallback when the
// shared library is unavailable.
//
// Build: g++ -O2 -shared -fPIC -o libimageio.so imageio.cpp -lz -lpthread

#include <png.h>
#include <zlib.h>

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

void put_u32_be(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
  put_u32_be(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(len + 4));
  put_u32_be(out, crc);
}

// Encode 8-bit RGB rows (no interlace, filter 0 per row) into a PNG buffer.
bool encode_png(const uint8_t* rgb, int h, int w, std::vector<uint8_t>& out) {
  const int stride = w * 3;
  std::vector<uint8_t> raw(static_cast<size_t>(h) * (stride + 1));
  for (int y = 0; y < h; ++y) {
    raw[static_cast<size_t>(y) * (stride + 1)] = 0;  // filter type 0
    std::memcpy(&raw[static_cast<size_t>(y) * (stride + 1) + 1],
                rgb + static_cast<size_t>(y) * stride, stride);
  }
  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> compressed(bound);
  // level 4: within ~2% of level 6 size on noisy images at ~2x the speed.
  if (compress2(compressed.data(), &bound, raw.data(),
                static_cast<uLong>(raw.size()), 4) != Z_OK) {
    return false;
  }
  compressed.resize(bound);

  out.clear();
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", compressed.data(), compressed.size());
  put_chunk(out, "IEND", nullptr, 0);
  return true;
}

bool write_file(const char* path, const std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  size_t n = std::fwrite(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return n == buf.size();
}

struct Job {
  std::string path;
  std::vector<uint8_t> rgb;
  int h, w;
};

class Pool {
 public:
  explicit Pool(int n_threads) : stop_(false), errors_(0), pending_(0) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { Run(); });
    }
  }

  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void Submit(Job job) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      queue_.push_back(std::move(job));
      ++pending_;
    }
    cv_.notify_one();
  }

  // Block until the queue drains; returns the number of failed writes.
  int Wait() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
    return errors_;
  }

 private:
  void Run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (queue_.empty()) {
          if (stop_) return;
          continue;
        }
        job = std::move(queue_.front());
        queue_.pop_front();
      }
      std::vector<uint8_t> png;
      bool ok = encode_png(job.rgb.data(), job.h, job.w, png) &&
                write_file(job.path.c_str(), png);
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (!ok) ++errors_;
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::deque<Job> queue_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  int errors_;
  int pending_;
};

}  // namespace

extern "C" {

int imageio_save_png(const char* path, const uint8_t* rgb, int h, int w) {
  std::vector<uint8_t> png;
  if (!encode_png(rgb, h, w, png)) return 1;
  return write_file(path, png) ? 0 : 2;
}

void* imageio_pool_create(int n_threads) {
  if (n_threads <= 0) n_threads = 4;
  return new Pool(n_threads);
}

int imageio_pool_submit(void* pool, const char* path, const uint8_t* rgb,
                        int h, int w) {
  if (!pool) return 1;
  Job job;
  job.path = path;
  job.h = h;
  job.w = w;
  job.rgb.assign(rgb, rgb + static_cast<size_t>(h) * w * 3);
  static_cast<Pool*>(pool)->Submit(std::move(job));
  return 0;
}

int imageio_pool_wait(void* pool) {
  if (!pool) return -1;
  return static_cast<Pool*>(pool)->Wait();
}

void imageio_pool_destroy(void* pool) {
  delete static_cast<Pool*>(pool);
}

}  // extern "C"

namespace {

// ---------- threaded PNG reader pool (the data-loader analog of the
// reference's DataLoader(num_workers=4) in utils/calculate_metrics.py) ----

struct ReadJob {
  std::string path;
  int state = 0;           // 0 pending, 1 ok, 2 failed
  uint32_t w = 0, h = 0;
  std::vector<uint8_t> rgb;
};

class ReadPool {
 public:
  explicit ReadPool(int n_threads) : stop_(false), next_(0) {
    for (int i = 0; i < n_threads; ++i)
      workers_.emplace_back([this] { Run(); });
  }
  ~ReadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  int Submit(const char* path) {
    std::unique_lock<std::mutex> lk(mu_);
    int id = static_cast<int>(jobs_.size());
    jobs_.emplace_back(new ReadJob());
    jobs_.back()->path = path;
    queue_.push_back(id);
    cv_.notify_one();
    return id;
  }

  // blocks until job `id` finishes; 0 = ok
  int Dims(int id, uint32_t* w, uint32_t* h) {
    std::unique_lock<std::mutex> lk(mu_);
    if (id < 0 || id >= static_cast<int>(jobs_.size())) return -1;
    done_cv_.wait(lk, [&] { return jobs_[id]->state != 0; });
    if (jobs_[id]->state != 1) return 1;
    *w = jobs_[id]->w;
    *h = jobs_[id]->h;
    return 0;
  }

  int CopyOut(int id, uint8_t* dst) {
    std::unique_lock<std::mutex> lk(mu_);
    if (id < 0 || id >= static_cast<int>(jobs_.size())) return -1;
    done_cv_.wait(lk, [&] { return jobs_[id]->state != 0; });
    ReadJob* j = jobs_[id].get();
    if (j->state != 1) return 1;
    std::memcpy(dst, j->rgb.data(), j->rgb.size());
    j->rgb.clear();
    j->rgb.shrink_to_fit();
    return 0;
  }

 private:
  void Run() {
    for (;;) {
      int id;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        id = queue_.front();
        queue_.pop_front();
      }
      std::string path;
      {
        std::unique_lock<std::mutex> lk(mu_);
        path = jobs_[id]->path;
      }
      // decode outside the lock (libpng simplified API)
      png_image image;
      std::memset(&image, 0, sizeof image);
      image.version = PNG_IMAGE_VERSION;
      std::vector<uint8_t> rgb;
      bool ok = false;
      uint32_t w = 0, h = 0;
      if (png_image_begin_read_from_file(&image, path.c_str())) {
        image.format = PNG_FORMAT_RGB;
        rgb.resize(PNG_IMAGE_SIZE(image));
        if (png_image_finish_read(&image, nullptr, rgb.data(), 0, nullptr)) {
          ok = true;
          w = image.width;
          h = image.height;
        }
      }
      png_image_free(&image);
      {
        std::unique_lock<std::mutex> lk(mu_);
        ReadJob* j = jobs_[id].get();
        if (ok) {
          j->rgb = std::move(rgb);
          j->w = w;
          j->h = h;
          j->state = 1;
        } else {
          j->state = 2;
        }
        done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::vector<std::unique_ptr<ReadJob>> jobs_;
  std::deque<int> queue_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  int next_;
};

}  // namespace

extern "C" {

void* imageio_read_pool_create(int n_threads) {
  if (n_threads <= 0) n_threads = 4;
  return new ReadPool(n_threads);
}

int imageio_read_submit(void* pool, const char* path) {
  if (!pool) return -1;
  return static_cast<ReadPool*>(pool)->Submit(path);
}

int imageio_read_dims(void* pool, int job_id, uint32_t* w, uint32_t* h) {
  if (!pool) return -1;
  return static_cast<ReadPool*>(pool)->Dims(job_id, w, h);
}

int imageio_read_copy(void* pool, int job_id, uint8_t* dst) {
  if (!pool) return -1;
  return static_cast<ReadPool*>(pool)->CopyOut(job_id, dst);
}

void imageio_read_pool_destroy(void* pool) {
  delete static_cast<ReadPool*>(pool);
}

}  // extern "C"
