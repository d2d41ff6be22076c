// Continuous-batching slot scheduler (native runtime component).
//
// The reference has no serving runtime at all (SURVEY.md §1: "serving" is an
// in-process model.generate() on one GPU); production-scale continuous
// batching is part of this rebuild's north star. The scheduler is host-side
// bookkeeping on the request hot path — admission, slot assignment,
// completion, FCFS queueing — kept native so a multi-thousand-slot server
// spends its Python time only on the XLA dispatch.
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   sched_create(n_slots, max_seq)           -> handle
//   sched_destroy(h)
//   sched_add_request(h, req_id, prompt_len, max_new_tokens) -> 0 | -1 (full queue)
//   sched_admit(h, out_req_ids, out_slots, cap) -> n admitted
//        pops queued requests into free slots (FCFS), marks them active
//   sched_on_token(h, slot)                  -> state after one generated
//        token: 0 = running, 1 = finished (hit max_new or seq cap)
//   sched_finish(h, slot)                    -> force-finish (EOS), frees slot
//   sched_active_slots(h, out_slots, cap)    -> n active
//   sched_slot_info(h, slot, out[4])         -> req_id, prompt_len, generated, max_new
//   sched_stats(h, out[4])                   -> queued, active, finished, free
//
// Build: g++ -O2 -shared -fPIC -o libmixq_sched.so scheduler.cpp

#include <cstdint>
#include <deque>
#include <mutex>
#include <vector>

namespace {

struct Request {
  int64_t id = -1;
  int32_t prompt_len = 0;
  int32_t max_new_tokens = 0;
  int32_t generated = 0;
};

struct Scheduler {
  int32_t n_slots;
  int32_t max_seq;
  std::deque<Request> queue;
  std::vector<Request> slots;      // slot -> request (id == -1: free)
  std::vector<uint8_t> active;     // slot -> bool
  int64_t finished_count = 0;
  std::mutex mu;

  Scheduler(int32_t slots_, int32_t max_seq_)
      : n_slots(slots_), max_seq(max_seq_), slots(slots_), active(slots_, 0) {}
};

constexpr int64_t kMaxQueue = 1 << 20;

}  // namespace

extern "C" {

void* sched_create(int32_t n_slots, int32_t max_seq) {
  if (n_slots <= 0 || max_seq <= 0) return nullptr;
  return new Scheduler(n_slots, max_seq);
}

void sched_destroy(void* h) { delete static_cast<Scheduler*>(h); }

int32_t sched_add_request(void* h, int64_t req_id, int32_t prompt_len,
                          int32_t max_new_tokens) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (static_cast<int64_t>(s->queue.size()) >= kMaxQueue) return -1;
  if (prompt_len <= 0 || prompt_len >= s->max_seq) return -2;
  Request r;
  r.id = req_id;
  r.prompt_len = prompt_len;
  // clamp generation to the sequence budget
  int32_t room = s->max_seq - prompt_len;
  r.max_new_tokens = max_new_tokens < room ? max_new_tokens : room;
  if (r.max_new_tokens <= 0) return -2;
  s->queue.push_back(r);
  return 0;
}

int32_t sched_admit(void* h, int64_t* out_req_ids, int32_t* out_slots,
                    int32_t cap) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int32_t n = 0;
  for (int32_t slot = 0; slot < s->n_slots && n < cap; ++slot) {
    if (s->active[slot] || s->queue.empty()) continue;
    Request r = s->queue.front();
    s->queue.pop_front();
    s->slots[slot] = r;
    s->active[slot] = 1;
    out_req_ids[n] = r.id;
    out_slots[n] = slot;
    ++n;
  }
  return n;
}

int32_t sched_on_token(void* h, int32_t slot) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (slot < 0 || slot >= s->n_slots || !s->active[slot]) return -1;
  Request& r = s->slots[slot];
  r.generated += 1;
  if (r.generated >= r.max_new_tokens ||
      r.prompt_len + r.generated >= s->max_seq) {
    s->active[slot] = 0;
    s->slots[slot].id = -1;
    s->finished_count += 1;
    return 1;
  }
  return 0;
}

int32_t sched_finish(void* h, int32_t slot) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (slot < 0 || slot >= s->n_slots || !s->active[slot]) return -1;
  s->active[slot] = 0;
  s->slots[slot].id = -1;
  s->finished_count += 1;
  return 0;
}

int32_t sched_restore_slot(void* h, int32_t slot, int64_t req_id,
                           int32_t prompt_len, int32_t max_new_tokens,
                           int32_t generated) {
  // Engine-state recovery (snapshot/restore): re-occupy `slot` with an
  // in-flight request exactly as it was — slot ids must be preserved
  // because KV-cache rows are slot-indexed. Fails if the slot is live.
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (slot < 0 || slot >= s->n_slots || s->active[slot]) return -1;
  if (prompt_len <= 0 || max_new_tokens <= 0 || generated < 0 ||
      generated >= max_new_tokens) return -2;
  Request r;
  r.id = req_id;
  r.prompt_len = prompt_len;
  r.max_new_tokens = max_new_tokens;
  r.generated = generated;
  s->slots[slot] = r;
  s->active[slot] = 1;
  return 0;
}

// ---------------------------------------------------------------------------
// Prompt-lookup n-gram drafter (speculative decoding host hot path).
//
// The CB engine's step_spec() drafts per slot per verify step by scanning
// that slot's token history backwards for the most recent earlier
// occurrence of the trailing n-gram (engine/speculative.py propose_ngram).
// In Python that's an O(history) list-slice loop per slot per step — at 64+
// slots it competes with the XLA dispatch for host time; here it's a flat
// int32 scan.
//
//   ngram_create(n_slots)                       -> handle
//   ngram_destroy(h)
//   ngram_reset(h, slot, toks, n)               (admission: history = prompt)
//   ngram_append(h, slot, toks, n)              (emitted tokens)
//   ngram_propose(h, slot, ngram_n, k, out) -> count (<= k)
// ---------------------------------------------------------------------------

namespace {

struct Drafter {
  int32_t n_slots;
  std::vector<std::vector<int32_t>> hist;
  std::mutex mu;
  explicit Drafter(int32_t slots_) : n_slots(slots_), hist(slots_) {}
};

}  // namespace

void* ngram_create(int32_t n_slots) {
  if (n_slots <= 0) return nullptr;
  return new Drafter(n_slots);
}

void ngram_destroy(void* h) { delete static_cast<Drafter*>(h); }

int32_t ngram_reset(void* h, int32_t slot, const int32_t* toks, int32_t n) {
  auto* d = static_cast<Drafter*>(h);
  std::lock_guard<std::mutex> lock(d->mu);
  if (slot < 0 || slot >= d->n_slots || n < 0) return -1;
  d->hist[slot].assign(toks, toks + n);
  return 0;
}

int32_t ngram_append(void* h, int32_t slot, const int32_t* toks, int32_t n) {
  auto* d = static_cast<Drafter*>(h);
  std::lock_guard<std::mutex> lock(d->mu);
  if (slot < 0 || slot >= d->n_slots || n < 0) return -1;
  auto& v = d->hist[slot];
  v.insert(v.end(), toks, toks + n);
  return 0;
}

int32_t ngram_propose(void* h, int32_t slot, int32_t n, int32_t k,
                      int32_t* out) {
  auto* d = static_cast<Drafter*>(h);
  std::lock_guard<std::mutex> lock(d->mu);
  if (slot < 0 || slot >= d->n_slots || n <= 0 || k <= 0) return 0;
  const auto& v = d->hist[slot];
  const int64_t len = static_cast<int64_t>(v.size());
  if (len <= n) return 0;
  const int32_t* tail = v.data() + len - n;
  // most recent earlier match wins (local repetition dominates) —
  // identical semantics to engine/speculative.py propose_ngram
  for (int64_t start = len - n - 1; start >= 0; --start) {
    bool eq = true;
    for (int32_t i = 0; i < n; ++i) {
      if (v[start + i] != tail[i]) { eq = false; break; }
    }
    if (!eq) continue;
    int64_t from = start + n;
    int32_t count = static_cast<int32_t>(
        (len - from) < k ? (len - from) : k);
    for (int32_t i = 0; i < count; ++i) out[i] = v[from + i];
    return count;
  }
  return 0;
}

int32_t sched_active_slots(void* h, int32_t* out_slots, int32_t cap) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int32_t n = 0;
  for (int32_t slot = 0; slot < s->n_slots && n < cap; ++slot) {
    if (s->active[slot]) out_slots[n++] = slot;
  }
  return n;
}

int32_t sched_slot_info(void* h, int32_t slot, int64_t* out4) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (slot < 0 || slot >= s->n_slots || !s->active[slot]) return -1;
  const Request& r = s->slots[slot];
  out4[0] = r.id;
  out4[1] = r.prompt_len;
  out4[2] = r.generated;
  out4[3] = r.max_new_tokens;
  return 0;
}

void sched_stats(void* h, int64_t* out4) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int64_t active = 0;
  for (auto a : s->active) active += a;
  out4[0] = static_cast<int64_t>(s->queue.size());
  out4[1] = active;
  out4[2] = s->finished_count;
  out4[3] = s->n_slots - active;
}

}  // extern "C"
