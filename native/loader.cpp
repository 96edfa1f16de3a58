// Native .xalm data-loader: mmap + parallel tensor materialization.
//
// TPU-host counterpart of the reference's native container I/O layer
// (reference src/xalm.h:26-47 seek/read loader, src/buffer.h aligned
// buffers, and the mmap variant sketched at xalm.h:195-289). The JSON
// header is parsed in Python (xalm_tpu/io/container.py); this module owns
// the byte movement:
//
//  - xalm_map / xalm_unmap: mmap a container read-only with MADV_WILLNEED
//  - xalm_copy_batch: thread-pool memcpy of N tensor blobs from the map
//    into caller-provided (numpy) buffers — big tensors are split across
//    workers so one 500 MB embed table doesn't serialize the load
//  - xalm_prefault: touch every page in parallel to pull a cold file
//    through the page cache at disk speed before the copy pass
//  - xalm_alloc / xalm_free: 64-byte-aligned host allocations
//    (reference buffer.h:18-50)
//
// All functions are exported with C linkage for the ctypes binding in
// xalm_tpu/native.py.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include "task_pool.hpp"

namespace {

struct MappedFile {
  void* base = nullptr;
  std::uint64_t size = 0;
};

constexpr std::uint64_t kChunk = 8ull << 20;  // split copies into 8 MiB jobs

}  // namespace

extern "C" {

// Map a file read-only. Returns a handle, or null on failure.
void* xalm_map(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (::fstat(fd, &st) != 0 || st.st_size <= 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, static_cast<std::size_t>(st.st_size), PROT_READ,
                      MAP_PRIVATE, fd, 0);
  ::close(fd);  // mapping keeps its own reference
  if (base == MAP_FAILED) return nullptr;
  ::madvise(base, static_cast<std::size_t>(st.st_size), MADV_WILLNEED);
  auto* mf = new MappedFile{base, static_cast<std::uint64_t>(st.st_size)};
  return mf;
}

std::uint64_t xalm_map_size(void* handle) {
  return handle ? static_cast<MappedFile*>(handle)->size : 0;
}

void xalm_unmap(void* handle) {
  if (!handle) return;
  auto* mf = static_cast<MappedFile*>(handle);
  ::munmap(mf->base, static_cast<std::size_t>(mf->size));
  delete mf;
}

// Copy n blobs (offsets/sizes into the map) into dests[i] using a worker
// pool. Large blobs are chunked so every worker stays busy. Returns 0 on
// success, -1 on a bounds violation (nothing is copied in that case).
int xalm_copy_batch(void* handle, const std::uint64_t* offsets,
                    const std::uint64_t* sizes, std::uint8_t** dests,
                    std::int32_t n, std::int32_t n_threads) {
  if (!handle || n < 0) return -1;
  auto* mf = static_cast<MappedFile*>(handle);
  for (std::int32_t i = 0; i < n; ++i) {
    // overflow-safe: offsets[i] + sizes[i] can wrap in uint64
    if (offsets[i] > mf->size || sizes[i] > mf->size - offsets[i]) return -1;
  }
  const auto* base = static_cast<const std::uint8_t*>(mf->base);
  if (n_threads <= 1) {
    for (std::int32_t i = 0; i < n; ++i)
      std::memcpy(dests[i], base + offsets[i], sizes[i]);
    return 0;
  }
  xalm::TaskPool pool(static_cast<std::size_t>(n_threads));
  for (std::int32_t i = 0; i < n; ++i) {
    for (std::uint64_t at = 0; at < sizes[i]; at += kChunk) {
      const std::uint64_t len = std::min(kChunk, sizes[i] - at);
      const std::uint8_t* src = base + offsets[i] + at;
      std::uint8_t* dst = dests[i] + at;
      pool.enqueue([src, dst, len] { std::memcpy(dst, src, len); });
    }
  }
  pool.wait_all();
  return 0;
}

// Touch every page of the mapping in parallel (cold-cache readahead).
// Returns a byte checksum so the reads cannot be optimized away.
std::uint64_t xalm_prefault(void* handle, std::int32_t n_threads) {
  if (!handle) return 0;
  auto* mf = static_cast<MappedFile*>(handle);
  const auto* base = static_cast<const std::uint8_t*>(mf->base);
  const std::uint64_t page = 4096;
  std::atomic<std::uint64_t> sum{0};
  auto touch = [&](std::uint64_t from, std::uint64_t to) {
    std::uint64_t local = 0;
    for (std::uint64_t at = from; at < to; at += page) local += base[at];
    sum.fetch_add(local, std::memory_order_relaxed);
  };
  if (n_threads <= 1) {
    touch(0, mf->size);
    return sum.load();
  }
  xalm::TaskPool pool(static_cast<std::size_t>(n_threads));
  // page-aligned stripes: every worker samples at page offsets 0, 4096, ...
  // so the checksum equals "sum of byte 0 of every page" for any size/count
  std::uint64_t stripe =
      (mf->size + static_cast<std::uint64_t>(n_threads) - 1) / n_threads;
  stripe = (stripe + page - 1) / page * page;
  for (std::int32_t t = 0; t < n_threads; ++t) {
    const std::uint64_t from = t * stripe;
    const std::uint64_t to = std::min(mf->size, from + stripe);
    if (from < to) pool.enqueue([&touch, from, to] { touch(from, to); });
  }
  pool.wait_all();
  return sum.load();
}

// 64-byte-aligned allocation (reference buffer.h alignment contract,
// widened from 16 to a cache line / VPU-friendly 64).
void* xalm_alloc(std::uint64_t size) {
  void* p = nullptr;
  if (posix_memalign(&p, 64, static_cast<std::size_t>(size)) != 0) return nullptr;
  return p;
}

void xalm_free(void* p) { std::free(p); }

}  // extern "C"
