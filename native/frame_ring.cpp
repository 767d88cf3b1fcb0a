// Native host runtime: multi-stream frame ring buffers with fused batch
// assembly (the framework's data-loader core).
//
// The reference's hot loop reads one frame at a time with synchronous
// cv2.VideoCapture.read and converts color in Python (SURVEY.md section 3.1).
// Here, N decoder threads (Python, cv2 -- decode itself already releases the
// GIL) push BGR frames into per-stream single-producer/single-consumer ring
// buffers; the compute thread pops one aligned, contiguous (S, H, W, 3) RGB
// batch per step. The memory traffic -- ring copy-in and batch gather with
// the BGR->RGB swizzle fused -- happens here in C++, off the GIL, so host
// preprocessing overlaps device compute.
//
// Plain C API consumed via ctypes (no pybind11 in the image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Ring {
  // SPSC ring of frames; head = next write, tail = next read.
  std::vector<uint8_t> data;
  std::atomic<uint64_t> head{0};
  std::atomic<uint64_t> tail{0};
  std::atomic<uint64_t> dropped{0};
  std::atomic<int> finished{0};
};

struct Pool {
  int n_streams = 0;
  int height = 0;
  int width = 0;
  int depth = 0;  // frames per ring
  size_t frame_bytes = 0;
  std::vector<Ring> rings;
};

inline uint8_t* slot(Pool* p, int s, uint64_t idx) {
  return p->rings[s].data.data() + (idx % p->depth) * p->frame_bytes;
}

}  // namespace

extern "C" {

void* fr_create(int n_streams, int height, int width, int depth) {
  auto* p = new Pool();
  p->n_streams = n_streams;
  p->height = height;
  p->width = width;
  p->depth = depth;
  p->frame_bytes = static_cast<size_t>(height) * width * 3;
  p->rings = std::vector<Ring>(n_streams);
  for (auto& r : p->rings) r.data.resize(p->frame_bytes * depth);
  return p;
}

void fr_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Producer side: copy a BGR HxWx3 frame into stream s's ring.
// Returns 1 on success, 0 if the ring is full (frame dropped, counted).
int fr_push(void* pool, int s, const uint8_t* frame_bgr) {
  auto* p = static_cast<Pool*>(pool);
  Ring& r = p->rings[s];
  uint64_t head = r.head.load(std::memory_order_relaxed);
  uint64_t tail = r.tail.load(std::memory_order_acquire);
  if (head - tail >= static_cast<uint64_t>(p->depth)) {
    r.dropped.fetch_add(1, std::memory_order_relaxed);
    return 0;
  }
  std::memcpy(slot(p, s, head), frame_bgr, p->frame_bytes);
  r.head.store(head + 1, std::memory_order_release);
  return 1;
}

void fr_mark_finished(void* pool, int s) {
  static_cast<Pool*>(pool)->rings[s].finished.store(1,
                                                    std::memory_order_release);
}

// How many frames are ready on stream s.
int fr_available(void* pool, int s) {
  auto* p = static_cast<Pool*>(pool);
  Ring& r = p->rings[s];
  return static_cast<int>(r.head.load(std::memory_order_acquire) -
                          r.tail.load(std::memory_order_relaxed));
}

int fr_finished(void* pool, int s) {
  auto* p = static_cast<Pool*>(pool);
  Ring& r = p->rings[s];
  return r.finished.load(std::memory_order_acquire) &&
         fr_available(pool, s) == 0;
}

uint64_t fr_dropped(void* pool, int s) {
  return static_cast<Pool*>(pool)->rings[s].dropped.load(
      std::memory_order_relaxed);
}

// Consumer side: gather the oldest frame of every stream into one contiguous
// (S, H, W, 3) RGB batch (BGR->RGB swizzle fused into the copy). A stream
// with no ready frame repeats its previous batch content if `valid_out[s]`
// from the last call is carried by the caller -- here we simply report
// validity and leave the slot untouched when empty.
// Returns the number of valid streams gathered.
int fr_pop_batch(void* pool, uint8_t* batch_rgb, uint8_t* valid_out,
                 int consume) {
  auto* p = static_cast<Pool*>(pool);
  int n_valid = 0;
  const size_t fb = p->frame_bytes;
  for (int s = 0; s < p->n_streams; ++s) {
    Ring& r = p->rings[s];
    uint64_t tail = r.tail.load(std::memory_order_relaxed);
    uint64_t head = r.head.load(std::memory_order_acquire);
    if (head == tail) {
      valid_out[s] = 0;
      continue;
    }
    const uint8_t* src = slot(p, s, tail);
    uint8_t* dst = batch_rgb + static_cast<size_t>(s) * fb;
    const size_t npix = fb / 3;
    for (size_t i = 0; i < npix; ++i) {  // fused BGR->RGB swizzle
      dst[3 * i + 0] = src[3 * i + 2];
      dst[3 * i + 1] = src[3 * i + 1];
      dst[3 * i + 2] = src[3 * i + 0];
    }
    if (consume) r.tail.store(tail + 1, std::memory_order_release);
    valid_out[s] = 1;
    ++n_valid;
  }
  return n_valid;
}

}  // extern "C"
