// Native threaded patch-loading pipeline for noise_flow_tpu.
//
// Replaces the reference's 4-stage Python thread/queue pipeline
// (ref:sidd/ImageLoader.py, PatchSampler.py, MiniBatchSampler.py) with a
// GIL-free C++ pipeline over the preprocessed .npy cache
// (noise_flow_tpu/data/cache.py):
//
//   worker threads: read image pair (.npy mmap-style fread) -> extract the
//   patch grid -> push patches to a bounded ring
//   batcher: assemble [B, ph, ph, 4] minibatches + conditioning vectors
//   consumer (Python via ctypes): nf_loader_next() copies one batch out
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). Build:
//   g++ -O3 -std=c++17 -shared -fPIC -pthread patch_loader.cc -o libnfloader.so

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kChannels = 4;

// ---------------------------------------------------------------------------
// minimal .npy reader: v1.0/2.0, little-endian float32, C-order
// ---------------------------------------------------------------------------

struct NpyArray {
  std::vector<int64_t> shape;
  std::vector<float> data;
};

bool read_npy_f32(const std::string& path, NpyArray* out, std::string* err) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) { *err = "open failed: " + path; return false; }
  unsigned char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    *err = "bad npy magic: " + path; std::fclose(f); return false;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (std::fread(b, 1, 2, f) != 2) { *err = "short header"; std::fclose(f); return false; }
    hlen = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (std::fread(b, 1, 4, f) != 4) { *err = "short header"; std::fclose(f); return false; }
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
  }
  std::string header(hlen, '\0');
  if (std::fread(&header[0], 1, hlen, f) != hlen) {
    *err = "short header dict"; std::fclose(f); return false;
  }
  if (header.find("'<f4'") == std::string::npos) {
    *err = "dtype must be little-endian float32: " + path;
    std::fclose(f); return false;
  }
  if (header.find("'fortran_order': True") != std::string::npos) {
    *err = "fortran order unsupported: " + path; std::fclose(f); return false;
  }
  auto lp = header.find("'shape':");
  lp = header.find('(', lp);
  auto rp = header.find(')', lp);
  if (lp == std::string::npos || rp == std::string::npos) {
    *err = "shape parse failure"; std::fclose(f); return false;
  }
  out->shape.clear();
  int64_t cur = -1;
  for (size_t i = lp + 1; i <= rp; ++i) {
    char c = header[i];
    if (c >= '0' && c <= '9') {
      cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
    } else if (cur >= 0) {
      out->shape.push_back(cur);
      cur = -1;
    }
  }
  int64_t n = 1;
  for (auto d : out->shape) n *= d;
  out->data.resize(n);
  if (std::fread(out->data.data(), sizeof(float), n, f) != size_t(n)) {
    *err = "short data: " + path; std::fclose(f); return false;
  }
  std::fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// pipeline
// ---------------------------------------------------------------------------

struct Patch {
  std::vector<float> x, y;  // noise, clean: [ph, ph, 4]
  float nlf0, nlf1, iso, cam;
};

struct ImageMeta {
  std::string noise_path, clean_path;
  float nlf0, nlf1, iso, cam;
};

class Loader {
 public:
  Loader(std::vector<ImageMeta> images, int patch, int n_patches_per_image,
         int batch_size, int n_threads, bool shuffle, unsigned seed,
         bool random_sampling)
      : images_(std::move(images)), patch_(patch),
        n_ppi_(n_patches_per_image), batch_(batch_size),
        n_threads_(n_threads), shuffle_(shuffle),
        random_sampling_(random_sampling), stop_(false) {
    reset(seed);
  }

  ~Loader() { shutdown(); }

  void reset(unsigned seed) {
    shutdown();
    {
      std::lock_guard<std::mutex> lk(mu_);
      patches_.clear();
      work_.clear();
      err_.clear();
      for (size_t i = 0; i < images_.size(); ++i) work_.push_back(i);
      if (shuffle_) {
        std::mt19937 rng(seed);
        std::shuffle(work_.begin(), work_.end(), rng);
      }
      seed_ = seed;
      produced_ = 0;
      stop_ = false;
    }
    for (int t = 0; t < n_threads_; ++t)
      threads_.emplace_back([this, t] { worker(t); });
  }

  // 0 = batch filled, 1 = epoch exhausted, 2 = error (see last_error)
  int next(float* x, float* y, float* nlf0, float* nlf1, float* iso,
           float* cam) {
    const size_t psz = size_t(patch_) * patch_ * kChannels;
    std::vector<Patch> got;
    got.reserve(batch_);
    std::unique_lock<std::mutex> lk(mu_);
    cv_out_.wait(lk, [this] {
      return patches_.size() >= size_t(batch_) || all_produced() ||
             !err_.empty();
    });
    if (!err_.empty()) return 2;
    if (patches_.size() < size_t(batch_)) return 1;  // epoch done (remainder dropped)
    for (int i = 0; i < batch_; ++i) {
      got.push_back(std::move(patches_.front()));
      patches_.pop_front();
    }
    lk.unlock();
    cv_space_.notify_all();
    for (int i = 0; i < batch_; ++i) {
      std::memcpy(x + i * psz, got[i].x.data(), psz * sizeof(float));
      std::memcpy(y + i * psz, got[i].y.data(), psz * sizeof(float));
      nlf0[i] = got[i].nlf0;
      nlf1[i] = got[i].nlf1;
      iso[i] = got[i].iso;
      cam[i] = got[i].cam;
    }
    return 0;
  }

  int64_t patches_per_epoch() const {
    // uniform grid: min(n_ppi, grid) per image; random: n_ppi per image
    int64_t total = 0;
    for (const auto& im : images_) {
      (void)im;
      total += n_ppi_;  // refined after first image read; kept simple here
    }
    return total;
  }

  const char* last_error() {
    std::lock_guard<std::mutex> lk(mu_);
    return err_.c_str();
  }

 private:
  bool all_produced() const {
    return produced_ == int64_t(images_.size()) && in_flight_ == 0;
  }

  void shutdown() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_work_.notify_all();
    cv_space_.notify_all();
    for (auto& t : threads_) if (t.joinable()) t.join();
    threads_.clear();
    in_flight_ = 0;
  }

  void worker(int tid) {
    std::mt19937 rng(seed_ + 0x9e3779b9u * (tid + 1));
    for (;;) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (stop_) return;
        if (work_.empty()) return;
        idx = work_.front();
        work_.pop_front();
        ++in_flight_;
      }
      process(images_[idx], &rng);
      {
        std::lock_guard<std::mutex> lk(mu_);
        --in_flight_;
        ++produced_;
      }
      cv_out_.notify_all();
    }
  }

  void process(const ImageMeta& im, std::mt19937* rng) {
    NpyArray noise, clean;
    std::string err;
    if (!read_npy_f32(im.noise_path, &noise, &err) ||
        !read_npy_f32(im.clean_path, &clean, &err)) {
      std::lock_guard<std::mutex> lk(mu_);
      err_ = err;
      cv_out_.notify_all();
      return;
    }
    // accept [H,W,4] or [1,H,W,4]
    int64_t h, w;
    if (noise.shape.size() == 4) { h = noise.shape[1]; w = noise.shape[2]; }
    else { h = noise.shape[0]; w = noise.shape[1]; }
    const int ph = patch_;
    std::vector<std::pair<int, int>> coords;
    if (random_sampling_) {
      std::uniform_int_distribution<int> di(0, int(h) - ph),
          dj(0, int(w) - ph);
      for (int k = 0; k < n_ppi_; ++k) coords.push_back({di(*rng), dj(*rng)});
    } else {
      // non-overlapping grid, centered run like the reference
      // (ref:sidd/sidd_utils.py:830-846, 305-307)
      for (int i = 0; i + ph <= h; i += ph)
        for (int j = 0; j + ph <= w; j += ph) coords.push_back({i, j});
      if (int(coords.size()) > n_ppi_) {
        int off = int(coords.size() - n_ppi_) / 2;
        coords = std::vector<std::pair<int, int>>(
            coords.begin() + off, coords.begin() + off + n_ppi_);
      }
      if (shuffle_) std::shuffle(coords.begin(), coords.end(), *rng);
    }
    const size_t row = size_t(w) * kChannels;
    const size_t prow = size_t(ph) * kChannels;
    for (auto [pi, pj] : coords) {
      Patch p;
      p.x.resize(size_t(ph) * prow);
      p.y.resize(size_t(ph) * prow);
      for (int r = 0; r < ph; ++r) {
        std::memcpy(&p.x[r * prow],
                    &noise.data[(size_t(pi) + r) * row + size_t(pj) * kChannels],
                    prow * sizeof(float));
        std::memcpy(&p.y[r * prow],
                    &clean.data[(size_t(pi) + r) * row + size_t(pj) * kChannels],
                    prow * sizeof(float));
      }
      p.nlf0 = im.nlf0; p.nlf1 = im.nlf1; p.iso = im.iso; p.cam = im.cam;
      std::unique_lock<std::mutex> lk(mu_);
      cv_space_.wait(lk, [this] {
        return patches_.size() < kMaxBuffered || stop_;
      });
      if (stop_) return;
      patches_.push_back(std::move(p));
      lk.unlock();
      cv_out_.notify_all();
    }
  }

  static constexpr size_t kMaxBuffered = 4096;

  std::vector<ImageMeta> images_;
  const int patch_, n_ppi_, batch_, n_threads_;
  const bool shuffle_, random_sampling_;

  std::mutex mu_;
  std::condition_variable cv_out_, cv_work_, cv_space_;
  std::deque<Patch> patches_;
  std::deque<size_t> work_;
  std::vector<std::thread> threads_;
  std::string err_;
  unsigned seed_ = 0;
  int64_t produced_ = 0;
  int64_t in_flight_ = 0;
  std::atomic<bool> stop_;
};

}  // namespace

extern "C" {

void* nf_loader_create(const char** noise_paths, const char** clean_paths,
                       const float* nlf0, const float* nlf1, const float* iso,
                       const float* cam, int n_images, int patch,
                       int n_patches_per_image, int batch_size, int n_threads,
                       int shuffle, unsigned seed, int random_sampling) {
  std::vector<ImageMeta> ims(n_images);
  for (int i = 0; i < n_images; ++i) {
    ims[i] = {noise_paths[i], clean_paths[i], nlf0[i], nlf1[i], iso[i],
              cam[i]};
  }
  return new Loader(std::move(ims), patch, n_patches_per_image, batch_size,
                    n_threads, shuffle != 0, seed, random_sampling != 0);
}

int nf_loader_next(void* h, float* x, float* y, float* nlf0, float* nlf1,
                   float* iso, float* cam) {
  return static_cast<Loader*>(h)->next(x, y, nlf0, nlf1, iso, cam);
}

void nf_loader_reset(void* h, unsigned seed) {
  static_cast<Loader*>(h)->reset(seed);
}

const char* nf_loader_error(void* h) {
  return static_cast<Loader*>(h)->last_error();
}

void nf_loader_destroy(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
