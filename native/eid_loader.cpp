// Native host-side data-loading engine for eeg_image_decode_tpu.
//
// The training-path bottleneck this removes: batched row gather
// (``array[indices]``) runs single-threaded under the Python GIL and blocks
// the dispatch thread between steps. Here a persistent worker pool does the
// gather with all cores, asynchronously — Python submits batch i+1's gather,
// keeps driving the device on batch i, and waits on a ticket only when the
// staging buffer is actually needed (see data/native_loader.py for the
// ctypes binding and data/loader.py for the integration).
//
// Also provides a dependency-free .npy reader over mmap so EEG tensors
// stream from disk without materializing in the Python heap first
// (madvise(WILLNEED) warms the pages the next epoch will touch).
//
// Replaces what the torch reference gets from DataLoader worker *processes*
// (num_workers=64, SURVEY.md §2.2) with threads in-process: no fork, no
// pickle, shared memory by construction.
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread -std=c++17
//        eid_loader.cpp -o libeid_loader.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct GatherJob {
  const uint8_t* src;
  uint8_t* dst;
  const int64_t* idx;
  int64_t n_idx;
  int64_t row_bytes;
  int64_t next_row = 0;          // work-stealing cursor
  std::atomic<int64_t> taken{0};
  std::atomic<int64_t> done_rows{0};
  int64_t ticket;
};

struct Pool {
  std::vector<std::thread> workers;
  std::deque<GatherJob*> queue;
  std::mutex mu;
  std::condition_variable cv;        // workers wait for jobs
  std::condition_variable done_cv;   // waiters wait for completions
  std::vector<int64_t> completed;    // finished tickets (bounded by waiters)
  int64_t next_ticket = 1;
  bool stop = false;

  explicit Pool(int n_threads) {
    for (int i = 0; i < n_threads; ++i) {
      workers.emplace_back([this] { this->worker(); });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& t : workers) t.join();
    for (auto* j : queue) delete j;
  }

  // Each worker grabs CHUNK rows at a time from the front job; the job
  // leaves the queue when fully claimed and is deleted by whoever finishes
  // its last row.
  static constexpr int64_t kChunk = 64;

  void worker() {
    for (;;) {
      GatherJob* job = nullptr;
      int64_t begin = 0, end = 0;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop) return;
        job = queue.front();
        begin = job->next_row;
        end = std::min(begin + kChunk, job->n_idx);
        job->next_row = end;
        if (job->next_row >= job->n_idx) queue.pop_front();
      }
      for (int64_t r = begin; r < end; ++r) {
        std::memcpy(job->dst + r * job->row_bytes,
                    job->src + job->idx[r] * job->row_bytes,
                    static_cast<size_t>(job->row_bytes));
      }
      // cache before fetch_add: the thread that completes the job deletes
      // it, so no job field may be read after our own fetch_add
      const int64_t total = job->n_idx;
      const int64_t ticket = job->ticket;
      int64_t finished =
          job->done_rows.fetch_add(end - begin) + (end - begin);
      if (finished == total) {
        {
          std::lock_guard<std::mutex> lk(mu);
          completed.push_back(ticket);
        }
        done_cv.notify_all();
        delete job;
      }
    }
  }

  int64_t submit(const uint8_t* src, uint8_t* dst, const int64_t* idx,
                 int64_t n_idx, int64_t row_bytes) {
    auto* job = new GatherJob();
    job->src = src;
    job->dst = dst;
    job->idx = idx;
    job->n_idx = n_idx;
    job->row_bytes = row_bytes;
    int64_t ticket;
    {
      std::lock_guard<std::mutex> lk(mu);
      ticket = next_ticket++;
      job->ticket = ticket;
      if (n_idx == 0) {
        completed.push_back(ticket);
        delete job;
      } else {
        queue.push_back(job);
      }
    }
    cv.notify_all();
    return ticket;
  }

  void wait(int64_t ticket) {
    std::unique_lock<std::mutex> lk(mu);
    done_cv.wait(lk, [this, ticket] {
      for (size_t i = 0; i < completed.size(); ++i) {
        if (completed[i] == ticket) {
          completed.erase(completed.begin() + i);
          return true;
        }
      }
      return false;
    });
  }
};

struct NpyMap {
  int fd = -1;
  uint8_t* base = nullptr;   // whole file
  size_t file_bytes = 0;
  uint8_t* data = nullptr;   // payload past the header
  int64_t shape[8];
  int ndim = 0;
  char descr[16];            // e.g. "<f4"
};

}  // namespace

extern "C" {

void* eid_pool_create(int n_threads) {
  if (n_threads <= 0)
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads <= 0) n_threads = 4;
  return new Pool(n_threads);
}

void eid_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Asynchronous row gather: dst[r] = src[idx[r]] for r < n_idx. src, dst and
// idx must stay alive until eid_gather_wait returns for this ticket.
int64_t eid_gather_submit(void* pool, const void* src, void* dst,
                          const int64_t* idx, int64_t n_idx,
                          int64_t row_bytes) {
  return static_cast<Pool*>(pool)->submit(
      static_cast<const uint8_t*>(src), static_cast<uint8_t*>(dst), idx,
      n_idx, row_bytes);
}

void eid_gather_wait(void* pool, int64_t ticket) {
  static_cast<Pool*>(pool)->wait(ticket);
}

void eid_gather_rows(void* pool, const void* src, void* dst,
                     const int64_t* idx, int64_t n_idx, int64_t row_bytes) {
  auto* p = static_cast<Pool*>(pool);
  p->wait(p->submit(static_cast<const uint8_t*>(src),
                    static_cast<uint8_t*>(dst), idx, n_idx, row_bytes));
}

// ——— .npy over mmap ———————————————————————————————————————————————

// Returns a handle, or nullptr on any parse/IO failure. Only C-contiguous
// (fortran_order: False) little-endian arrays are supported — that is what
// numpy.save writes for the preprocessing artifacts.
void* eid_npy_map(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 10) {
    close(fd);
    return nullptr;
  }
  auto* base = static_cast<uint8_t*>(
      mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0));
  if (base == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  auto fail = [&]() -> void* {
    munmap(base, st.st_size);
    close(fd);
    return nullptr;
  };
  if (std::memcmp(base, "\x93NUMPY", 6) != 0) return fail();
  uint8_t major = base[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = base[8] | (base[9] << 8);
    header_off = 10;
  } else {
    header_len = base[8] | (base[9] << 8) | (base[10] << 16) |
                 (static_cast<size_t>(base[11]) << 24);
    header_off = 12;
  }
  if (header_off + header_len > static_cast<size_t>(st.st_size)) return fail();
  std::string hdr(reinterpret_cast<const char*>(base) + header_off,
                  header_len);

  auto find_value = [&](const char* key) -> std::string {
    size_t k = hdr.find(key);
    if (k == std::string::npos) return "";
    size_t colon = hdr.find(':', k);
    if (colon == std::string::npos) return "";
    return hdr.substr(colon + 1);
  };
  std::string descr = find_value("'descr'");
  size_t q0 = descr.find('\'');
  size_t q1 = descr.find('\'', q0 + 1);
  if (q0 == std::string::npos || q1 == std::string::npos) return fail();
  descr = descr.substr(q0 + 1, q1 - q0 - 1);
  if (descr.size() >= sizeof(NpyMap::descr)) return fail();
  if (!descr.empty() && descr[0] == '>') return fail();  // big-endian

  if (find_value("'fortran_order'").find("True") != std::string::npos)
    return fail();

  std::string shape = find_value("'shape'");
  size_t p0 = shape.find('(');
  size_t p1 = shape.find(')', p0);
  if (p0 == std::string::npos || p1 == std::string::npos) return fail();
  shape = shape.substr(p0 + 1, p1 - p0 - 1);

  auto* m = new NpyMap();
  m->fd = fd;
  m->base = base;
  m->file_bytes = st.st_size;
  m->data = base + header_off + header_len;
  std::snprintf(m->descr, sizeof(m->descr), "%s", descr.c_str());
  size_t pos = 0;
  while (pos < shape.size() && m->ndim < 8) {
    while (pos < shape.size() && !isdigit(shape[pos])) ++pos;
    if (pos >= shape.size()) break;
    m->shape[m->ndim++] = std::strtoll(shape.c_str() + pos, nullptr, 10);
    while (pos < shape.size() && isdigit(shape[pos])) ++pos;
  }

  // Reject files whose payload is shorter than the header promises (e.g. a
  // concurrent writer's half-written cache): touching pages past EOF through
  // the mapping would SIGBUS instead of raising a catchable Python error.
  size_t itemsize = 0;
  for (char ch : descr) {
    if (isdigit(ch)) itemsize = itemsize * 10 + (ch - '0');
  }
  size_t n_elems = 1;
  for (int i = 0; i < m->ndim; ++i) n_elems *= m->shape[i];
  if (itemsize == 0 ||
      header_off + header_len + n_elems * itemsize >
          static_cast<size_t>(st.st_size)) {
    delete m;
    return fail();
  }
  return m;
}

int eid_npy_ndim(void* h) { return static_cast<NpyMap*>(h)->ndim; }

void eid_npy_shape(void* h, int64_t* out) {
  auto* m = static_cast<NpyMap*>(h);
  for (int i = 0; i < m->ndim; ++i) out[i] = m->shape[i];
}

const char* eid_npy_descr(void* h) { return static_cast<NpyMap*>(h)->descr; }

const void* eid_npy_data(void* h) { return static_cast<NpyMap*>(h)->data; }

// Hint the kernel to prefetch a row range (e.g. the rows the next epoch's
// permutation will touch) — async readahead, no blocking.
void eid_npy_willneed(void* h, int64_t row_bytes, int64_t row0,
                      int64_t n_rows) {
  auto* m = static_cast<NpyMap*>(h);
  uint8_t* p = m->data + row0 * row_bytes;
  size_t page = sysconf(_SC_PAGESIZE);
  uintptr_t a = reinterpret_cast<uintptr_t>(p) & ~(page - 1);
  size_t len = reinterpret_cast<uintptr_t>(p) + n_rows * row_bytes - a;
  madvise(reinterpret_cast<void*>(a), len, MADV_WILLNEED);
}

void eid_npy_unmap(void* h) {
  auto* m = static_cast<NpyMap*>(h);
  munmap(m->base, m->file_bytes);
  close(m->fd);
  delete m;
}

}  // extern "C"
