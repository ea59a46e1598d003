// Native host-side hot paths for gst_plugins_rs_tpu.
//
// The reference does its host-side buffer management in compiled Rust
// (stride repacking in burn-yoloxinference imp.rs:435-448, interleaving in
// hrtfrender imp.rs:214-219, ring buffers in audioecho/ring_buffer.rs and
// the threadshare data queues).  This module provides the C++ equivalents
// for the host control plane: tight repack/interleave loops and a lock-free
// single-producer single-consumer byte ring for the stream scheduler.
// Exposed through ctypes (see gst_plugins_rs_tpu/utils/native.py).

#include <atomic>
#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// Copy a strided image plane into a tightly packed buffer.
// src: height rows of row_bytes valid bytes at src_stride intervals.
void repack_strided(const uint8_t *src, uint8_t *dst, size_t height,
                    size_t row_bytes, size_t src_stride) {
  if (row_bytes == src_stride) {
    std::memcpy(dst, src, height * row_bytes);
    return;
  }
  for (size_t y = 0; y < height; ++y) {
    std::memcpy(dst + y * row_bytes, src + y * src_stride, row_bytes);
  }
}

// Insert stride padding (packed -> strided), zero-filling the padding.
void unpack_strided(const uint8_t *src, uint8_t *dst, size_t height,
                    size_t row_bytes, size_t dst_stride) {
  for (size_t y = 0; y < height; ++y) {
    std::memcpy(dst + y * dst_stride, src + y * row_bytes, row_bytes);
    if (dst_stride > row_bytes)
      std::memset(dst + y * dst_stride + row_bytes, 0, dst_stride - row_bytes);
  }
}

// Deinterleave float32 audio: [frames, channels] -> channels x [frames].
void deinterleave_f32(const float *src, float *dst, size_t frames,
                      size_t channels) {
  for (size_t c = 0; c < channels; ++c) {
    float *out = dst + c * frames;
    const float *in = src + c;
    for (size_t n = 0; n < frames; ++n)
      out[n] = in[n * channels];
  }
}

// Interleave float32 audio: channels x [frames] -> [frames, channels].
void interleave_f32(const float *src, float *dst, size_t frames,
                    size_t channels) {
  for (size_t c = 0; c < channels; ++c) {
    const float *in = src + c * frames;
    float *out = dst + c;
    for (size_t n = 0; n < frames; ++n)
      out[n * channels] = in[n];
  }
}

// ---------------------------------------------------------------------------
// Lock-free SPSC byte ring (threadshare dataqueue analog for the host
// scheduler's producer/consumer stages).
// ---------------------------------------------------------------------------
struct SpscRing {
  uint8_t *buf;
  size_t capacity; // power of two
  std::atomic<size_t> head; // write index
  std::atomic<size_t> tail; // read index
};

SpscRing *ring_new(size_t capacity_pow2) {
  auto *r = new SpscRing();
  r->buf = new uint8_t[capacity_pow2];
  r->capacity = capacity_pow2;
  r->head.store(0);
  r->tail.store(0);
  return r;
}

void ring_free(SpscRing *r) {
  if (!r)
    return;
  delete[] r->buf;
  delete r;
}

size_t ring_readable(const SpscRing *r) {
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

size_t ring_writable(const SpscRing *r) {
  return r->capacity - ring_readable(r);
}

// Returns bytes actually written (0 if not enough space for all-or-nothing).
size_t ring_write(SpscRing *r, const uint8_t *data, size_t len) {
  if (ring_writable(r) < len)
    return 0;
  size_t head = r->head.load(std::memory_order_relaxed);
  size_t mask = r->capacity - 1;
  size_t pos = head & mask;
  size_t first = len < (r->capacity - pos) ? len : (r->capacity - pos);
  std::memcpy(r->buf + pos, data, first);
  if (len > first)
    std::memcpy(r->buf, data + first, len - first);
  r->head.store(head + len, std::memory_order_release);
  return len;
}

// Returns bytes actually read (0 if fewer than len available).
size_t ring_read(SpscRing *r, uint8_t *out, size_t len) {
  if (ring_readable(r) < len)
    return 0;
  size_t tail = r->tail.load(std::memory_order_relaxed);
  size_t mask = r->capacity - 1;
  size_t pos = tail & mask;
  size_t first = len < (r->capacity - pos) ? len : (r->capacity - pos);
  std::memcpy(out, r->buf + pos, first);
  if (len > first)
    std::memcpy(out + first, r->buf, len - first);
  r->tail.store(tail + len, std::memory_order_release);
  return len;
}

} // extern "C"
