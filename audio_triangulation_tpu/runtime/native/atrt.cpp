// atrt: native host-side streaming runtime for the TPU audio-triangulation
// framework.
//
// This is the TPU-host re-expression of the reference firmware's acquisition
// and scheduling layers (capability parity, new design):
//
//   - reference L1 (src/components/dma_sampler.c): chained-DMA ADC ingest
//     with zero CPU -> here: a lock-free SPSC ring buffer a producer thread
//     (audio driver / socket / file reader) fills while the consumer drains,
//     plus per-channel rolling rings
//   - reference L3 detector (src/components/rolling_buffer.c): O(1) running
//     sum / sum-of-squares halves, trigger when the summed outgoing variance
//     exceeds threshold + incoming variance (src/sample_compute.h:78-90) ->
//     identical int64 math here, run at ingest rate on the host so only
//     event frames are shipped to the accelerator
//   - reference L2 (protothreads): cooperative producer/consumer handoff ->
//     here: an SPSC event queue between the ingest thread and the Python
//     feeder that batches frames for device transfer
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>
#include <vector>

namespace {

struct ChannelRing {
  std::vector<int16_t> buf;
  int head = 0;
  bool full = false;
  int64_t inc_total = 0, inc_power = 0;
  int64_t out_total = 0, out_power = 0;

  void init(int n) {
    buf.assign(n, 0);
    head = 0;
    full = false;
    inc_total = inc_power = out_total = out_power = 0;
  }

  inline void push(int16_t s) {
    const int n = (int)buf.size();
    const int half = n >> 1;
    int mid = head - half;
    if (mid < 0) mid += n;
    const int64_t m = buf[mid];
    const int64_t o = buf[head];
    out_total += m - o;
    out_power += m * m - o * o;
    inc_total += (int64_t)s - m;
    inc_power += (int64_t)s * s - m * m;
    buf[head] = s;
    if (++head >= n) {
      head = 0;
      full = true;
    }
  }

  inline int64_t incoming_power(int half_bits) const {
    return (inc_power << half_bits) - inc_total * inc_total;
  }
  inline int64_t outgoing_power(int half_bits) const {
    return (out_power << half_bits) - out_total * out_total;
  }

  // unroll oldest->newest into dst
  void write_out(int16_t* dst) const {
    const int n = (int)buf.size();
    std::memcpy(dst, buf.data() + head, (n - head) * sizeof(int16_t));
    std::memcpy(dst + (n - head), buf.data(), head * sizeof(int16_t));
  }
};

struct EventQueue {
  // SPSC queue of frames [channels * frame_size]
  std::vector<int16_t> storage;
  std::vector<int64_t> stamps;
  int capacity = 0;
  int slot_len = 0;
  std::atomic<uint64_t> head{0};  // consumer
  std::atomic<uint64_t> tail{0};  // producer

  void init(int cap, int slot) {
    capacity = cap;
    slot_len = slot;
    storage.assign((size_t)cap * slot, 0);
    stamps.assign(cap, 0);
    head.store(0);
    tail.store(0);
  }
  bool push(const int16_t* frame, int64_t stamp) {
    const uint64_t t = tail.load(std::memory_order_relaxed);
    if (t - head.load(std::memory_order_acquire) >= (uint64_t)capacity)
      return false;  // full: drop (caller counts)
    std::memcpy(&storage[(t % capacity) * slot_len], frame,
                slot_len * sizeof(int16_t));
    stamps[t % capacity] = stamp;
    tail.store(t + 1, std::memory_order_release);
    return true;
  }
  bool pop(int16_t* out, int64_t* stamp) {
    const uint64_t h = head.load(std::memory_order_relaxed);
    if (tail.load(std::memory_order_acquire) == h) return false;
    std::memcpy(out, &storage[(h % capacity) * slot_len],
                slot_len * sizeof(int16_t));
    *stamp = stamps[h % capacity];
    head.store(h + 1, std::memory_order_release);
    return true;
  }
};

struct Runtime {
  int channels = 0;
  int frame_size = 0;
  int frame_bits = 0;
  int64_t threshold = 0;
  int64_t sample_count = 0;
  int64_t suppress_until = 0;  // post-event ring-refill holdoff
  int64_t events_detected = 0;
  int64_t events_dropped = 0;
  std::vector<ChannelRing> rings;
  std::vector<int16_t> scratch;
  EventQueue queue;
};

inline int ilog2(int v) {
  int b = 0;
  while ((1 << b) < v) ++b;
  return b;
}

}  // namespace

extern "C" {

void* atrt_create(int channels, int frame_size, long long threshold,
                  int queue_capacity) {
  auto* rt = new (std::nothrow) Runtime();
  if (!rt) return nullptr;
  rt->channels = channels;
  rt->frame_size = frame_size;
  rt->frame_bits = ilog2(frame_size);
  rt->threshold = threshold;
  rt->rings.resize(channels);
  for (auto& r : rt->rings) r.init(frame_size);
  rt->scratch.assign((size_t)channels * frame_size, 0);
  rt->queue.init(queue_capacity, channels * frame_size);
  rt->suppress_until = frame_size - 1;
  return rt;
}

void atrt_destroy(void* h) { delete static_cast<Runtime*>(h); }

// Push n interleaved sample tuples (n * channels int16 values).  Runs the
// detector per tuple; triggered frames are copied into the event queue.
// Returns the number of events detected in this call.
int atrt_push(void* h, const int16_t* interleaved, int n) {
  auto* rt = static_cast<Runtime*>(h);
  const int c = rt->channels;
  const int half_bits = rt->frame_bits - 1;
  int events = 0;
  for (int i = 0; i < n; ++i) {
    const int16_t* tuple = interleaved + (size_t)i * c;
    bool all_full = true;
    for (int m = 0; m < c; ++m) {
      rt->rings[m].push(tuple[m]);
      all_full &= rt->rings[m].full;
    }
    const int64_t t = rt->sample_count++;
    if (!all_full || t < rt->suppress_until) continue;
    int64_t inc = 0, out = 0;
    for (int m = 0; m < c; ++m) {
      inc += rt->rings[m].incoming_power(half_bits);
      out += rt->rings[m].outgoing_power(half_bits);
    }
    if (out > rt->threshold + inc) {
      for (int m = 0; m < c; ++m)
        rt->rings[m].write_out(&rt->scratch[(size_t)m * rt->frame_size]);
      ++rt->events_detected;
      if (!rt->queue.push(rt->scratch.data(), t))
        ++rt->events_dropped;
      else
        ++events;
      // reference semantics: rings are re-initialized after a capture
      // (sample_compute.h:55-57) -> a full fresh frame before re-arming
      for (auto& r : rt->rings) r.init(rt->frame_size);
      rt->suppress_until = rt->sample_count + rt->frame_size - 1;
    }
  }
  return events;
}

// Pop one event frame ([channels * frame_size] int16, channel-major) and its
// trigger sample index.  Returns 1 on success, 0 if the queue is empty.
int atrt_poll(void* h, int16_t* frame_out, long long* stamp_out) {
  auto* rt = static_cast<Runtime*>(h);
  int64_t stamp = 0;
  if (!rt->queue.pop(frame_out, &stamp)) return 0;
  *stamp_out = stamp;
  return 1;
}

long long atrt_sample_count(void* h) {
  return static_cast<Runtime*>(h)->sample_count;
}
long long atrt_events_detected(void* h) {
  return static_cast<Runtime*>(h)->events_detected;
}
long long atrt_events_dropped(void* h) {
  return static_cast<Runtime*>(h)->events_dropped;
}

// Expose the detector powers for observability (vga_text.h parity).
void atrt_powers(void* h, long long* incoming_out, long long* outgoing_out) {
  auto* rt = static_cast<Runtime*>(h);
  const int half_bits = rt->frame_bits - 1;
  for (int m = 0; m < rt->channels; ++m) {
    incoming_out[m] = rt->rings[m].incoming_power(half_bits);
    outgoing_out[m] = rt->rings[m].outgoing_power(half_bits);
  }
}

}  // extern "C"
