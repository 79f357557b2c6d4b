// Lock-free shared-memory IPC primitives for the real-time robot runtime.
//
// Native (C++) equivalents of the reference's pure-Python shared-memory stack
// (umi/shared_memory/shared_memory_ring_buffer.py:13-221 SPMC ring with a
// monotonic atomic counter; shared_memory_queue.py:10-181 SPSC queue) — the
// per-device camera/controller processes exchange fixed-size records through
// these at 100-500 Hz. This implementation uses POSIX shm + C++11 atomics
// with acquire/release ordering: a single writer publishes a slot by
// incrementing the global counter AFTER the payload store (release); readers
// snapshot the counter (acquire), copy, and re-check the counter to detect
// torn reads on wrap-around.
//
// C ABI for ctypes binding (unified_video_action_tpu/ipc/shm.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct RingHeader {
  std::atomic<uint64_t> counter;  // number of records ever written
  uint64_t slot_bytes;
  uint64_t n_slots;
  uint64_t magic;
};

struct QueueHeader {
  std::atomic<uint64_t> head;  // next write index
  std::atomic<uint64_t> tail;  // next read index
  uint64_t slot_bytes;
  uint64_t n_slots;
  uint64_t magic;
};

constexpr uint64_t kRingMagic = 0x52494E4755564131ull;   // "RINGUVA1"
constexpr uint64_t kQueueMagic = 0x5155455545555641ull;  // "QUEEUUVA"

void* map_shm(const char* name, size_t total, bool create) {
  int flags = create ? (O_CREAT | O_RDWR) : O_RDWR;
  int fd = shm_open(name, flags, 0600);
  if (fd < 0) return nullptr;
  if (create && ftruncate(fd, (off_t)total) != 0) {
    close(fd);
    return nullptr;
  }
  void* p = mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  return p == MAP_FAILED ? nullptr : p;
}

inline uint8_t* ring_slot(RingHeader* h, uint64_t idx) {
  return reinterpret_cast<uint8_t*>(h + 1) + (idx % h->n_slots) * h->slot_bytes;
}

inline uint8_t* queue_slot(QueueHeader* h, uint64_t idx) {
  return reinterpret_cast<uint8_t*>(h + 1) + (idx % h->n_slots) * h->slot_bytes;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// SPMC ring buffer
// ---------------------------------------------------------------------------

void* uva_ring_create(const char* name, uint64_t slot_bytes, uint64_t n_slots) {
  size_t total = sizeof(RingHeader) + slot_bytes * n_slots;
  shm_unlink(name);
  auto* h = static_cast<RingHeader*>(map_shm(name, total, true));
  if (!h) return nullptr;
  h->counter.store(0, std::memory_order_relaxed);
  h->slot_bytes = slot_bytes;
  h->n_slots = n_slots;
  h->magic = kRingMagic;
  return h;
}

void* uva_ring_open(const char* name) {
  // map header first to learn the size
  auto* probe = static_cast<RingHeader*>(map_shm(name, sizeof(RingHeader), false));
  if (!probe || probe->magic != kRingMagic) return nullptr;
  uint64_t slot_bytes = probe->slot_bytes, n_slots = probe->n_slots;
  munmap(probe, sizeof(RingHeader));
  return map_shm(name, sizeof(RingHeader) + slot_bytes * n_slots, false);
}

// single-writer put: copy payload, then publish with a release increment.
int uva_ring_put(void* ring, const void* data, uint64_t len) {
  auto* h = static_cast<RingHeader*>(ring);
  if (len > h->slot_bytes) return -1;
  uint64_t c = h->counter.load(std::memory_order_relaxed);
  std::memcpy(ring_slot(h, c), data, len);
  h->counter.store(c + 1, std::memory_order_release);
  return 0;
}

uint64_t uva_ring_count(void* ring) {
  return static_cast<RingHeader*>(ring)->counter.load(std::memory_order_acquire);
}

// copy the newest k records (newest last). Returns number copied, or -1 if a
// torn read was detected (writer lapped the reader); caller retries.
int64_t uva_ring_get_last_k(void* ring, void* out, uint64_t k) {
  auto* h = static_cast<RingHeader*>(ring);
  uint64_t c = h->counter.load(std::memory_order_acquire);
  if (c == 0) return 0;
  if (k > c) k = c;
  if (k > h->n_slots) return -1;
  auto* dst = static_cast<uint8_t*>(out);
  uint64_t start = c - k;
  for (uint64_t i = 0; i < k; ++i) {
    std::memcpy(dst + i * h->slot_bytes, ring_slot(h, start + i), h->slot_bytes);
  }
  // torn-read check: writer may have wrapped past [start, c) during the copy
  uint64_t c2 = h->counter.load(std::memory_order_acquire);
  if (c2 > start + h->n_slots) return -1;
  return (int64_t)k;
}

uint64_t uva_ring_slot_bytes(void* ring) {
  return static_cast<RingHeader*>(ring)->slot_bytes;
}

void uva_ring_close(void* ring) {
  auto* h = static_cast<RingHeader*>(ring);
  munmap(h, sizeof(RingHeader) + h->slot_bytes * h->n_slots);
}

void uva_shm_unlink(const char* name) { shm_unlink(name); }

// ---------------------------------------------------------------------------
// SPSC queue
// ---------------------------------------------------------------------------

void* uva_queue_create(const char* name, uint64_t slot_bytes, uint64_t n_slots) {
  size_t total = sizeof(QueueHeader) + slot_bytes * n_slots;
  shm_unlink(name);
  auto* h = static_cast<QueueHeader*>(map_shm(name, total, true));
  if (!h) return nullptr;
  h->head.store(0, std::memory_order_relaxed);
  h->tail.store(0, std::memory_order_relaxed);
  h->slot_bytes = slot_bytes;
  h->n_slots = n_slots;
  h->magic = kQueueMagic;
  return h;
}

void* uva_queue_open(const char* name) {
  auto* probe = static_cast<QueueHeader*>(map_shm(name, sizeof(QueueHeader), false));
  if (!probe || probe->magic != kQueueMagic) return nullptr;
  uint64_t slot_bytes = probe->slot_bytes, n_slots = probe->n_slots;
  munmap(probe, sizeof(QueueHeader));
  return map_shm(name, sizeof(QueueHeader) + slot_bytes * n_slots, false);
}

// returns 0 on success, -1 if full
int uva_queue_push(void* q, const void* data, uint64_t len) {
  auto* h = static_cast<QueueHeader*>(q);
  if (len > h->slot_bytes) return -1;
  uint64_t head = h->head.load(std::memory_order_relaxed);
  uint64_t tail = h->tail.load(std::memory_order_acquire);
  if (head - tail >= h->n_slots) return -1;  // full
  std::memcpy(queue_slot(h, head), data, len);
  h->head.store(head + 1, std::memory_order_release);
  return 0;
}

// returns 0 on success, -1 if empty
int uva_queue_pop(void* q, void* out) {
  auto* h = static_cast<QueueHeader*>(q);
  uint64_t tail = h->tail.load(std::memory_order_relaxed);
  uint64_t head = h->head.load(std::memory_order_acquire);
  if (tail == head) return -1;  // empty
  std::memcpy(out, queue_slot(h, tail), h->slot_bytes);
  h->tail.store(tail + 1, std::memory_order_release);
  return 0;
}

uint64_t uva_queue_size(void* q) {
  auto* h = static_cast<QueueHeader*>(q);
  return h->head.load(std::memory_order_acquire) -
         h->tail.load(std::memory_order_acquire);
}

void uva_queue_close(void* q) {
  auto* h = static_cast<QueueHeader*>(q);
  munmap(h, sizeof(QueueHeader) + h->slot_bytes * h->n_slots);
}

}  // extern "C"
