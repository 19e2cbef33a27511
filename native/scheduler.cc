// Native continuous-batching scheduler.
//
// TPU-native counterpart of the engine-side native code the reference gets
// from the vLLM wheel (C++ scheduler / block manager; SURVEY §2.10).  The
// device compute path stays in XLA/Pallas; this library owns the host-side
// hot bookkeeping: request queue, slot map, admission waves, per-slot
// position tracking (feeding the s_active bucket choice).  There is
// deliberately no paged-KV block allocator: the engine is slot-based
// (contiguous per-slot cache regions) because paged layouts measured slower
// on TPU (docs/PERF.md, layout experiments).
//
// C ABI for ctypes (chatterbox_tpu/runtime/native.py).  Build: native/Makefile.

#include <algorithm>
#include <cstdint>
#include <deque>
#include <vector>

namespace {

struct Request {
  int64_t uid;
  int32_t prompt_len;
  int32_t max_new;
};

struct Slot {
  bool active = false;
  int64_t uid = -1;
  int32_t pos_cap = 0;  // upper bound on cache position
  int32_t max_pos = 0;  // the request's own final-position bound
};

struct Scheduler {
  int32_t n_slots;
  int32_t max_model_len;
  int32_t order = 0;        // 0 = shortest-prompt-first, 1 = LPT
  int32_t min_free = 0;     // admission hysteresis (0 -> n_slots/4)
  std::vector<Slot> slots;
  std::vector<int32_t> free_slots;
  std::deque<Request> pending;  // kept sorted on insert (see order)

  explicit Scheduler(int32_t n, int32_t len) : n_slots(n), max_model_len(len) {
    slots.resize(n);
    for (int32_t i = n - 1; i >= 0; --i) free_slots.push_back(i);
  }
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------- scheduler
void* sched_create(int32_t n_slots, int32_t max_model_len) {
  return new Scheduler(n_slots, max_model_len);
}

void sched_destroy(void* h) { delete static_cast<Scheduler*>(h); }

// Admission policy knobs: order 0 = shortest-prompt-first (minimal prefill
// padding), 1 = LPT (descending prompt+cap: last-admitted requests are the
// shortest, so the final drain tail stays near-full occupancy — classic
// makespan rule).  min_free = admission hysteresis (0 -> n_slots/4).
void sched_set_policy(void* h, int32_t order, int32_t min_free) {
  auto* s = static_cast<Scheduler*>(h);
  s->order = order;
  s->min_free = min_free;
}

// Insert a request keeping the pending queue sorted per the policy order.
void sched_add_request(void* h, int64_t uid, int32_t prompt_len,
                       int32_t max_new) {
  auto* s = static_cast<Scheduler*>(h);
  Request r{uid, prompt_len, max_new};
  auto lt = [s](const Request& a, const Request& b) {
    if (s->order == 1) {
      return a.prompt_len + a.max_new > b.prompt_len + b.max_new;
    }
    return a.prompt_len < b.prompt_len;
  };
  auto it = std::lower_bound(s->pending.begin(), s->pending.end(), r, lt);
  s->pending.insert(it, r);
}

int32_t sched_pending_count(void* h) {
  return static_cast<int32_t>(static_cast<Scheduler*>(h)->pending.size());
}

int32_t sched_free_count(void* h) {
  return static_cast<int32_t>(static_cast<Scheduler*>(h)->free_slots.size());
}

int32_t sched_active_count(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  int32_t n = 0;
  for (const auto& sl : s->slots) n += sl.active ? 1 : 0;
  return n;
}

// Admission with hysteresis: admit a wave only when enough slots are free
// (min_wave = min(pending, n_slots/4)), to keep prefill launches in a small
// set of compiled shapes.  Fills out_* arrays; returns the wave size.
int32_t sched_admit(void* h, int32_t* out_slots, int64_t* out_uids,
                    int32_t* out_prompt_lens, int32_t cap) {
  auto* s = static_cast<Scheduler*>(h);
  if (s->pending.empty()) return 0;
  int32_t hyst = s->min_free > 0 ? std::min(s->min_free, s->n_slots)
                                 : std::max<int32_t>(1, s->n_slots / 4);
  int32_t min_wave = std::min<int32_t>(
      static_cast<int32_t>(s->pending.size()), hyst);
  if (static_cast<int32_t>(s->free_slots.size()) < min_wave) return 0;

  int32_t take = std::min<int32_t>(
      {static_cast<int32_t>(s->free_slots.size()),
       static_cast<int32_t>(s->pending.size()), cap});
  // Age-cohort steering for the engine's contiguous half-range pool split:
  // fresh requests land in the half whose current max position is LOWER,
  // so the two halves age as cohorts and the engine can decode the younger
  // half at a smaller attention window (pool_split).  Implemented by
  // sorting the free stack so preferred-half slots pop first.
  int32_t half = s->n_slots / 2;
  if (half > 0) {
    int32_t max_a = 0, max_b = 0;
    for (int32_t i = 0; i < s->n_slots; ++i) {
      if (!s->slots[i].active) continue;
      (i < half ? max_a : max_b) =
          std::max(i < half ? max_a : max_b, s->slots[i].pos_cap);
    }
    bool prefer_a = max_a <= max_b;
    std::stable_sort(s->free_slots.begin(), s->free_slots.end(),
                     [&](int32_t x, int32_t y) {
                       bool xa = x < half, ya = y < half;
                       if (xa != ya) {
                         // preferred half LAST (popped from the back first)
                         return (xa == prefer_a) < (ya == prefer_a);
                       }
                       return x > y;  // within a half: lower ids pop first
                     });
  }
  for (int32_t j = 0; j < take; ++j) {
    Request r = s->pending.front();
    s->pending.pop_front();
    int32_t slot = s->free_slots.back();
    s->free_slots.pop_back();
    s->slots[slot] = {true, r.uid, r.prompt_len,
                      r.prompt_len + r.max_new + 1};
    out_slots[j] = slot;
    out_uids[j] = r.uid;
    out_prompt_lens[j] = r.prompt_len;
  }
  return take;
}

// Advance per-slot position upper bounds by one decode chunk; returns the
// global upper bound (for the s_active length bucket).
int32_t sched_advance(void* h, int32_t n_steps) {
  auto* s = static_cast<Scheduler*>(h);
  int32_t upper = 0;
  for (auto& sl : s->slots) {
    if (!sl.active) continue;
    // clamp to the request's own bound: a done-but-unharvested lane (or a
    // lane one chunk from its cap) must not drag the shared s_active
    // window into the next 96-bucket for everyone
    sl.pos_cap = std::min({s->max_model_len, sl.pos_cap + n_steps,
                           std::max(sl.max_pos, sl.pos_cap)});
    upper = std::max(upper, sl.pos_cap);
  }
  return upper;
}

// Per-slot position upper bounds (0 for free slots) — the engine's pool
// scheduler groups slots by these so fresh lanes don't pay the attention
// window of long-lived ones (age-grouped s_active; docs/PERF.md round-4).
void sched_pos_caps(void* h, int32_t* out_caps) {
  auto* s = static_cast<Scheduler*>(h);
  for (int32_t i = 0; i < s->n_slots; ++i)
    out_caps[i] = s->slots[i].active ? s->slots[i].pos_cap : 0;
}

// Free finished slots (done_flags: one byte per slot).  Fills the freed
// slots/uids; returns the count.
int32_t sched_harvest(void* h, const uint8_t* done_flags, int32_t* out_slots,
                      int64_t* out_uids, int32_t cap) {
  auto* s = static_cast<Scheduler*>(h);
  int32_t n = 0;
  for (int32_t i = 0; i < s->n_slots && n < cap; ++i) {
    if (s->slots[i].active && done_flags[i]) {
      out_slots[n] = i;
      out_uids[n] = s->slots[i].uid;
      ++n;
      s->slots[i] = Slot{};
      s->free_slots.push_back(i);
    }
  }
  return n;
}

}  // extern "C"
