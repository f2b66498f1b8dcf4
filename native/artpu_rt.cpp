// artpu_rt — native real-time runtime for the autorally_tpu control loop.
//
// The reference's runtime fabric is ROS TCP pub/sub between processes
// (pose in with tcpNoDelay, autorally_plant.cpp:65-66; chassisCommand out)
// plus boost-mutex shared state between the ROS callback thread and the
// optimizer thread (autorally_plant.h:133), paced by usleep polling
// (run_control_loop.cuh:304-312).  This library provides the TPU
// framework's equivalents as native primitives:
//
//  - a lock-free single-producer/single-consumer ring buffer for
//    fixed-size float records (pose stream in, control stream out) —
//    replaces the mutex-guarded plant handoff with wait-free exchange
//  - a monotonic-deadline pacer using clock_nanosleep(TIMER_ABSTIME) —
//    replaces the reference's 50 us usleep polling loop with precise
//    period scheduling and missed-tick accounting
//  - a UDP receiver thread and sender for binary float records — the
//    transport role ROS plays for the reference (pose estimates in,
//    actuation commands out), without a ROS dependency
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <ctime>
#include <memory>
#include <thread>
#include <vector>

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// SPSC ring buffer of fixed-size float records
// ---------------------------------------------------------------------------

struct Ring {
  std::vector<float> data;
  size_t capacity;     // number of records
  size_t record_len;   // floats per record
  std::atomic<uint64_t> head{0};  // next write slot (producer)
  std::atomic<uint64_t> tail{0};  // next read slot (consumer)
  std::atomic<uint64_t> dropped{0};
  // Per-slot seqlock: 2*n+1 while record n is being written into the
  // slot, 2*(n+1) once it is complete.  Lets the consumer *prove* the
  // record it copied is the un-torn record `tail` — the previous
  // head-distance heuristic could not distinguish "producer is
  // overwriting this slot right now" from "ring is exactly full and the
  // producer is idle", which livelocked pop on a full, quiescent ring.
  std::unique_ptr<std::atomic<uint64_t>[]> seq;
};

void* artpu_ring_create(size_t capacity, size_t record_len) {
  Ring* r = new Ring();
  r->capacity = capacity;
  r->record_len = record_len;
  r->data.resize(capacity * record_len);
  r->seq.reset(new std::atomic<uint64_t>[capacity]);
  for (size_t i = 0; i < capacity; i++)
    r->seq[i].store(0, std::memory_order_relaxed);
  return r;
}

void artpu_ring_destroy(void* h) { delete static_cast<Ring*>(h); }

// Producer: push one record.  Overwrites the oldest record when full
// (latest-wins semantics for pose streams).  Returns 1 if a record was
// dropped to make room (0 if the CAS lost — the consumer popped the
// oldest record instead, so nothing was lost).  Tail is advanced with
// CAS because the consumer also advances it.
int artpu_ring_push(void* h, const float* rec) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  int dropped = 0;
  if (head - tail >= r->capacity) {
    // drop the oldest; if the CAS loses, the consumer popped it instead
    if (r->tail.compare_exchange_strong(tail, tail + 1,
                                        std::memory_order_acq_rel)) {
      r->dropped.fetch_add(1, std::memory_order_relaxed);
      dropped = 1;
    }
  }
  size_t slot = head % r->capacity;
  r->seq[slot].store(2 * head + 1, std::memory_order_relaxed);  // writing
  std::atomic_thread_fence(std::memory_order_release);
  std::memcpy(&r->data[slot * r->record_len], rec,
              r->record_len * sizeof(float));
  r->seq[slot].store(2 * (head + 1), std::memory_order_release);
  r->head.store(head + 1, std::memory_order_release);
  return dropped;
}

// Consumer: pop the oldest record.  Returns 1 on success, 0 if empty.
// Torn-read safety via the per-slot seqlock: the copy is valid iff the
// slot's sequence read before and after the copy both equal
// 2*(tail+1) — i.e. the slot held the completed record `tail` for the
// whole copy.  Any mismatch means the producer overwrote (or is
// overwriting) the slot with record tail+capacity; in that case the
// producer has already CAS-advanced tail, so the reload makes progress
// (no livelock on a full, idle ring — its records validate and pop).
// The record is then claimed by CAS so a concurrent producer drop of
// the same record is never double-counted.
int artpu_ring_pop(void* h, float* out) {
  Ring* r = static_cast<Ring*>(h);
  for (;;) {
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    uint64_t head = r->head.load(std::memory_order_acquire);
    if (tail >= head) return 0;
    size_t slot = tail % r->capacity;
    uint64_t s1 = r->seq[slot].load(std::memory_order_acquire);
    std::memcpy(out, &r->data[slot * r->record_len],
                r->record_len * sizeof(float));
    std::atomic_thread_fence(std::memory_order_acquire);
    uint64_t s2 = r->seq[slot].load(std::memory_order_relaxed);
    if (s1 != s2 || s1 != 2 * (tail + 1)) continue;  // torn/stale; retry
    if (r->tail.compare_exchange_strong(tail, tail + 1,
                                        std::memory_order_acq_rel))
      return 1;
    // the producer dropped this record while we copied; retry
  }
}

// Consumer: drain everything, keep only the newest record (pose streams
// want the freshest estimate).  Returns number of records drained.
int artpu_ring_pop_latest(void* h, float* out) {
  int n = 0;
  while (artpu_ring_pop(h, out)) n++;
  return n;
}

uint64_t artpu_ring_dropped(void* h) {
  return static_cast<Ring*>(h)->dropped.load(std::memory_order_relaxed);
}

// ---------------------------------------------------------------------------
// monotonic-deadline pacer
// ---------------------------------------------------------------------------

struct Pacer {
  struct timespec next;
  int64_t period_ns;
  uint64_t ticks = 0;
  uint64_t missed = 0;
};

static inline int64_t ts_to_ns(const struct timespec& ts) {
  return int64_t(ts.tv_sec) * 1000000000LL + ts.tv_nsec;
}

static inline struct timespec ns_to_ts(int64_t ns) {
  struct timespec ts;
  ts.tv_sec = ns / 1000000000LL;
  ts.tv_nsec = ns % 1000000000LL;
  return ts;
}

void* artpu_pace_create(int64_t period_ns) {
  Pacer* p = new Pacer();
  p->period_ns = period_ns;
  clock_gettime(CLOCK_MONOTONIC, &p->next);
  p->next = ns_to_ts(ts_to_ns(p->next) + period_ns);
  return p;
}

void artpu_pace_destroy(void* h) { delete static_cast<Pacer*>(h); }

// Sleep until the next deadline; returns the number of whole periods
// missed (0 = on time).  Deadlines are absolute, so jitter does not
// accumulate (unlike sleep(period - elapsed) schemes).
int artpu_pace_wait(void* h) {
  Pacer* p = static_cast<Pacer*>(h);
  while (clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &p->next, nullptr))
    ;  // retry on EINTR
  struct timespec now;
  clock_gettime(CLOCK_MONOTONIC, &now);
  int64_t next_ns = ts_to_ns(p->next) + p->period_ns;
  int64_t now_ns = ts_to_ns(now);
  int missed = 0;
  while (next_ns <= now_ns) {  // catch up if we overran whole periods
    next_ns += p->period_ns;
    missed++;
  }
  p->next = ns_to_ts(next_ns);
  p->ticks++;
  p->missed += missed;
  return missed;
}

uint64_t artpu_pace_ticks(void* h) { return static_cast<Pacer*>(h)->ticks; }
uint64_t artpu_pace_missed(void* h) { return static_cast<Pacer*>(h)->missed; }

// ---------------------------------------------------------------------------
// UDP float-record link (the ROS pub/sub transport role)
// ---------------------------------------------------------------------------

struct UdpRx {
  int fd = -1;
  void* ring = nullptr;
  size_t record_len = 0;
  std::atomic<bool> running{false};
  std::atomic<uint64_t> received{0};
  std::thread thread;
};

void* artpu_udp_rx_start(uint16_t port, void* ring, size_t record_len) {
  UdpRx* rx = new UdpRx();
  rx->ring = ring;
  rx->record_len = record_len;
  rx->fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (rx->fd < 0) { delete rx; return nullptr; }
  int one = 1;
  setsockopt(rx->fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  struct timeval tv {0, 100000};  // 100 ms poll so shutdown is prompt
  setsockopt(rx->fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(port);
  if (bind(rx->fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    close(rx->fd);
    delete rx;
    return nullptr;
  }
  rx->running = true;
  rx->thread = std::thread([rx]() {
    std::vector<float> buf(rx->record_len);
    const ssize_t want = ssize_t(rx->record_len * sizeof(float));
    while (rx->running.load(std::memory_order_relaxed)) {
      ssize_t n = recv(rx->fd, buf.data(), want, 0);
      if (n == want) {
        artpu_ring_push(rx->ring, buf.data());
        rx->received.fetch_add(1, std::memory_order_relaxed);
      }
    }
  });
  return rx;
}

uint64_t artpu_udp_rx_received(void* h) {
  return static_cast<UdpRx*>(h)->received.load(std::memory_order_relaxed);
}

void artpu_udp_rx_stop(void* h) {
  UdpRx* rx = static_cast<UdpRx*>(h);
  rx->running = false;
  if (rx->thread.joinable()) rx->thread.join();
  if (rx->fd >= 0) close(rx->fd);
  delete rx;
}

// fire-and-forget send of one record to 127.0.0.1:port
int artpu_udp_send(uint16_t port, const float* rec, size_t record_len) {
  static thread_local int fd = -1;
  if (fd < 0) fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(port);
  ssize_t n = sendto(fd, rec, record_len * sizeof(float), 0,
                     reinterpret_cast<sockaddr*>(&addr), sizeof(addr));
  return n == ssize_t(record_len * sizeof(float)) ? 0 : -1;
}

}  // extern "C"
