// TPU-native JPEG XL decoder: C++ host entropy stage.
//
// Behavioral parity: jxl-coding (rANS alias tables, prefix codes,
// hybrid-uint, LZ77), jxl-modular (MA-tree sample decode, 14 predictors,
// self-correcting/weighted predictor) and jxl-vardct hf_coeff.rs. The
// parsed tables (histograms, trees, cluster maps) are built by the Python
// host and passed in as flat arrays; this library runs only the per-sample
// hot loops, writing into numpy buffers. Exposed via a C ABI for ctypes.
//
// All sample arithmetic is i32-wrapping (via int64 intermediates), matching
// the reference's Rust wrapping semantics.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <functional>
#include <mutex>
#include <utility>
#include <cstring>
#include <thread>
#include <vector>
#include <cmath>
#include <cstdlib>
#include <unistd.h>

namespace {

using u8 = uint8_t;
using u16 = uint16_t;
using u32 = uint32_t;
using u64 = uint64_t;
using i32 = int32_t;
using i64 = int64_t;

inline i32 wrap32(i64 v) { return (i32)(u32)(u64)v; }

// ---------------------------------------------------------------------------
// Persistent worker pool: batch entry points are called several times per
// frame, and spawning+joining 3 std::threads costs ~0.25 ms on the 4-core
// dev box — a visible slice of a ~3 ms batch. Workers park on a condvar
// between rounds. Each round runs `fn` on the caller thread plus up to
// (nt-1) pool threads; fns are claim-based (atomic job counter) so extra
// parked threads never run stale work. Threads are detached and leaked on
// purpose: the pool lives for the process, and joining from a static
// destructor can deadlock during interpreter shutdown.
class WorkerPool {
 public:
  // Run fn concurrently on this thread + (nt-1) pool workers; returns
  // after every participant finished this round's fn. Concurrent run()
  // calls from different Python threads (two images decoding at once)
  // serialize on run_mu_ — the rounds would otherwise share round
  // bookkeeping and deadlock; serialized callers merely queue for the
  // same physical cores they would have contended for anyway.
  void run(int nt, const std::function<void()>& fn) {
    if (nt <= 1) { fn(); return; }
    std::lock_guard<std::mutex> run_lk(run_mu_);
    int helpers = nt - 1;
    {
      std::unique_lock<std::mutex> lk(mu_);
      // fork safety: pool threads do not survive fork(); a child process
      // (bench.py device probes fork) would otherwise wait forever for
      // helpers that no longer exist. Detect the pid change and respawn.
      int pid = getpid();
      if (pid != owner_pid_) {
        owner_pid_ = pid;
        spawned_ = 0;
        round_ = 0;
      }
      while ((int)spawned_ < helpers) {
        spawned_++;
        std::thread(&WorkerPool::worker_loop, this).detach();
      }
      fn_ = &fn;
      want_ = helpers;
      started_ = 0;
      done_ = 0;
      round_++;
      cv_.notify_all();
    }
    fn();
    std::unique_lock<std::mutex> lk(mu_);
    cv_done_.wait(lk, [&] { return done_ == want_; });
    fn_ = nullptr;
  }

 private:
  void worker_loop() {
    u64 seen = 0;
    for (;;) {
      const std::function<void()>* f = nullptr;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return round_ != seen && started_ < want_; });
        seen = round_;
        if (started_ >= want_) continue;
        started_++;
        f = fn_;
      }
      (*f)();
      {
        std::unique_lock<std::mutex> lk(mu_);
        done_++;
        if (done_ == want_) cv_done_.notify_all();
      }
    }
  }

  std::mutex run_mu_;  // serializes whole rounds across calling threads
  std::mutex mu_;
  std::condition_variable cv_, cv_done_;
  const std::function<void()>* fn_ = nullptr;
  u64 round_ = 0;
  int want_ = 0, started_ = 0, done_ = 0, spawned_ = 0;
  int owner_pid_ = -1;
};

WorkerPool& worker_pool() {
  static WorkerPool* pool = new WorkerPool();  // leaked: lives for process
  return *pool;
}

// ---------------------------------------------------------------------------
// Optional rdtsc stage profiling (JXL_TPU_NATIVE_PROF=1 builds, -DJXL_PROF).
// The dev VM exposes no PMU (perf_event_open -> ENOENT), so this is the
// only way to attribute cycles between the HF walk/interleave stages.
// NOT thread-safe: profile with n_threads=1. Zero cost when undefined.
#ifdef JXL_PROF
enum ProfSlot {
  PROF_HF_ADVANCE = 0,
  PROF_HF_BEGIN = 1,
  PROF_HF_MULTI = 2,     // dual/tri/quad interleaved runs
  PROF_HF_SINGLE = 3,    // single-stream drain (hf_step loop)
  PROF_HF_FALLBACK = 4,  // run_section reference core
  PROF_N = 8,
};
u64 g_prof_cycles[PROF_N];
u64 g_prof_calls[PROF_N];
inline u64 prof_rdtsc() {
  unsigned lo, hi;
  asm volatile("rdtsc" : "=a"(lo), "=d"(hi));
  return ((u64)hi << 32) | lo;
}
struct ProfScope {
  int slot;
  u64 t0;
  explicit ProfScope(int s) : slot(s), t0(prof_rdtsc()) {}
  ~ProfScope() {
    g_prof_cycles[slot] += prof_rdtsc() - t0;
    g_prof_calls[slot]++;
  }
};
#define PROF_SCOPE(s) ProfScope _prof_scope(s)
#else
#define PROF_SCOPE(s)
#endif

// ---------------------------------------------------------------------------
// Native scratch accounting (jxl-grid alloc_tracker.rs:8-51 parity for the
// C++ stage). The allocations big enough to matter are the LZ77 windows
// (4 MiB per active stream), the per-spec alias-bucket stores, and the HF
// order-offset tables; everything else is O(row) or O(spec). Python reads
// the counters over the ctypes ABI (jxlhost_mem_*) and folds the per-call
// peak into its AllocTracker; with a limit set the decode fails with an
// OOM return code instead of allocating. Counters are process-global:
// concurrent decodes share one budget, which is the conservative
// direction for enforcement.

std::atomic<i64> g_mem_cur{0};
std::atomic<i64> g_mem_peak{0};
std::atomic<i64> g_mem_limit{0};  // 0 = unlimited

inline bool mem_add(i64 n) {
  i64 cur = g_mem_cur.fetch_add(n, std::memory_order_relaxed) + n;
  i64 peak = g_mem_peak.load(std::memory_order_relaxed);
  while (cur > peak && !g_mem_peak.compare_exchange_weak(
                           peak, cur, std::memory_order_relaxed)) {
  }
  i64 lim = g_mem_limit.load(std::memory_order_relaxed);
  if (lim > 0 && cur > lim) {
    g_mem_cur.fetch_sub(n, std::memory_order_relaxed);
    return false;
  }
  return true;
}
inline void mem_sub(i64 n) { g_mem_cur.fetch_sub(n, std::memory_order_relaxed); }

// Owns a byte reservation; returns it on destruction. Movable (vector
// storage), not copyable (a copy would double-release).
struct MemGuard {
  i64 n = 0;
  MemGuard() = default;
  MemGuard(const MemGuard&) = delete;
  MemGuard& operator=(const MemGuard&) = delete;
  MemGuard(MemGuard&& o) noexcept : n(o.n) { o.n = 0; }
  MemGuard& operator=(MemGuard&& o) noexcept {
    if (this != &o) {
      if (n) mem_sub(n);
      n = o.n;
      o.n = 0;
    }
    return *this;
  }
  bool acquire(i64 bytes) {
    if (!mem_add(bytes)) return false;
    n += bytes;
    return true;
  }
  ~MemGuard() {
    if (n) mem_sub(n);
  }
};

// ---------------------------------------------------------------------------
// Bit reader: LSB-first little-endian (jxl-bitstream bitstream.rs).
// Reads past the end zero-extend (ANS tail refill semantics); the final
// ANS state check catches real corruption.

struct BitReader {
  const u8* data;
  u64 len_bits;
  u64 pos;

  // Fast path: one unaligned 64-bit load serves any n <= 57 (shift <= 7),
  // which covers every caller (max read is 32 bits). The tail falls back
  // to a byte loop that zero-extends past the end (ANS refill semantics;
  // the final 0x130000 state check catches real truncation).
  inline u64 peek(int n) {
    if (n == 0) return 0;
    u64 byte0 = pos >> 3;
    int shift = (int)(pos & 7);
    u64 avail_bytes = (len_bits + 7) >> 3;
    u64 window;
    if (__builtin_expect(byte0 + 8 <= avail_bytes, 1)) {
      std::memcpy(&window, data + byte0, 8);  // little-endian load
    } else {
      window = 0;
      u64 nbytes = (u64)((shift + n + 7) >> 3);
      for (u64 i = 0; i < nbytes && byte0 + i < avail_bytes; i++)
        window |= (u64)data[byte0 + i] << (8 * i);
    }
    return (window >> shift) & ((n >= 64) ? ~0ull : ((1ull << n) - 1));
  }
  inline void consume(int n) { pos += n; }
  inline u64 read(int n) {
    u64 v = peek(n);
    consume(n);
    return v;
  }
};

// ---------------------------------------------------------------------------
// Decoder spec: serialized by jxl_oxide_tpu/native/__init__.py.

// One alias-table bucket packed into 12 bytes so a symbol read touches a
// single cache line. This IS the serialized wire layout (3 i32 words per
// bucket, little-endian u16 pairs), produced once per parsed decoder by
// the Python serializer / jxlhost_parse_decoder — SpecHolder just casts
// into the blob. All fields are <= 4096 (ANS precision) so u16 is exact.
// dist_self = dist[i], dist_alias = dist[alias_symbol[i]] — selected
// branchlessly by cutoff.
// Packed alias-table bucket: ONE 8-byte load per symbol. The earlier
// 3-i32-word (12-byte) form cost a second load and a cache-line split
// every other bucket on the load-port-bound symbol loop. Fields:
// cutoff[0:13), alias_symbol[13:25), alias_offset[25:37),
// dist_self[37:50), dist_alias[50:63) — dist values reach 4096 (13
// bits); the packers leave bit 63 zero so dist_alias() needs no mask.
struct AnsBucket {
  u64 v;
  inline u32 cutoff() const { return (u32)v & 0x1FFF; }
  inline u32 alias_symbol() const { return (u32)(v >> 13) & 0xFFF; }
  inline u32 alias_offset() const { return (u32)(v >> 25) & 0xFFF; }
  inline u32 dist_self() const { return (u32)(v >> 37) & 0x1FFF; }
  inline u32 dist_alias() const { return (u32)(v >> 50); }
};
static_assert(sizeof(AnsBucket) == 8, "wire layout is 2 i32 words");

struct AnsTable {
  i32 log_bucket_size;
  const AnsBucket* buckets;  // [alphabet]
};

static void pack_ans_buckets(i32 lbs, const i32* dist, const i32* alias_symbol,
                             const i32* alias_cutoff, const i32* alias_offset,
                             AnsBucket* out) {
  i32 alphabet = 1 << (12 - lbs);
  for (i32 i = 0; i < alphabet; i++) {
    u64 sym = (u64)(u32)alias_symbol[i];
    out[i].v = (u64)(u32)alias_cutoff[i] | (sym << 13) |
               ((u64)(u32)alias_offset[i] << 25) |
               ((u64)(u32)dist[i] << 37) | ((u64)(u32)dist[sym] << 50);
  }
}

struct PrefixTable {
  i32 max_len;  // 0 => single symbol in table_sym[0]
  const i32* table_sym;
  const i32* table_len;
};

struct IntCfg {
  i32 split_exponent, msb, lsb;
  inline u32 split() const { return 1u << split_exponent; }
};

struct AnsRec;  // fused alias+intcfg record (defined with SpecHolder)

struct DecoderSpec {
  i32 lz77_enabled;
  u32 min_symbol, min_length;
  IntCfg len_cfg;
  i32 num_dist;
  i32 num_clusters;
  i32 use_prefix;
  const i32* cluster_map;  // [num_dist]
  const IntCfg* cfgs;      // [num_clusters]
  const AnsTable* ans;     // [num_clusters] or null
  const AnsRec* recs = nullptr;  // fused records (SpecHolder builds only)
  const PrefixTable* pfx;  // [num_clusters] or null
};

// 2-D LZ77 special distances (jxl-coding lib.rs:497-510)
struct I8Pair { i32 a, b; };
static const I8Pair SPECIAL_DIST[120] = {
  {0,1},{1,0},{1,1},{-1,1},{0,2},{2,0},{1,2},{-1,2},{2,1},{-2,1},
  {2,2},{-2,2},{0,3},{3,0},{1,3},{-1,3},{3,1},{-3,1},{2,3},{-2,3},
  {3,2},{-3,2},{0,4},{4,0},{1,4},{-1,4},{4,1},{-4,1},{3,3},{-3,3},
  {2,4},{-2,4},{4,2},{-4,2},{0,5},{3,4},{-3,4},{4,3},{-4,3},{5,0},
  {1,5},{-1,5},{5,1},{-5,1},{2,5},{-2,5},{5,2},{-5,2},{4,4},{-4,4},
  {3,5},{-3,5},{5,3},{-5,3},{0,6},{6,0},{1,6},{-1,6},{6,1},{-6,1},
  {2,6},{-2,6},{6,2},{-6,2},{4,5},{-4,5},{5,4},{-5,4},{3,6},{-3,6},
  {6,3},{-6,3},{0,7},{7,0},{1,7},{-1,7},{5,5},{-5,5},{7,1},{-7,1},
  {4,6},{-4,6},{6,4},{-6,4},{2,7},{-2,7},{7,2},{-7,2},{3,7},{-3,7},
  {7,3},{-7,3},{5,6},{-5,6},{6,5},{-6,5},{8,0},{4,7},{-4,7},{7,4},
  {-7,4},{8,1},{8,2},{6,6},{-6,6},{8,3},{5,7},{-5,7},{7,5},{-7,5},
  {8,4},{6,7},{-6,7},{7,6},{-7,6},{8,5},{7,7},{-7,7},{8,6},{8,7},
};

constexpr u32 LZ_WINDOW_SIZE = 1u << 20;
constexpr u32 LZ_WINDOW_MASK = LZ_WINDOW_SIZE - 1;

struct DecoderState {
  const DecoderSpec* spec;
  BitReader* br;
  u32 state = 0;
  bool initial = true;
  // LZ77
  std::vector<u32> window;
  MemGuard window_mem;
  u64 num_to_copy = 0, copy_pos = 0, num_decoded = 0;
  int error = 0;  // sticky error flag (1 = lz77 before first symbol,
                  //  2 = scratch memory budget exceeded); ret = 10 + error

  void begin() {
    if (!spec->use_prefix) {
      state = (u32)br->read(32);
      initial = false;
    }
    // the LZ77 window allocates lazily on first use: RLE-mode streams
    // (single dist symbol == 1) never touch it
  }

  __attribute__((always_inline)) inline u32 read_symbol(int cluster) {
    if (spec->use_prefix) {
      const PrefixTable& t = spec->pfx[cluster];
      if (t.max_len == 0) return (u32)t.table_sym[0];
      u64 bits = br->peek(t.max_len);
      i32 sym = t.table_sym[bits];
      br->consume(t.table_len[bits]);
      return (u32)sym;
    }
    const AnsTable& t = spec->ans[cluster];
    u32 idx = state & 0xFFF;
    u32 i = idx >> t.log_bucket_size;
    u32 posb = idx & ((1u << t.log_bucket_size) - 1);
    const AnsBucket b = t.buckets[i];
    bool al = posb >= b.cutoff();
    u32 symbol = al ? b.alias_symbol() : i;
    u32 offset = al ? b.alias_offset() + posb : posb;
    u32 d = al ? b.dist_alias() : b.dist_self();
    u32 next = (state >> 12) * d + offset;
    // branchless 16-bit renormalization: the refill branch is
    // data-dependent and mispredicts badly on real coefficient streams
    u32 need = next < (1u << 16);
    u32 bits = (u32)br->peek(16);
    u32 refilled = (next << 16) | bits;
    state = need ? refilled : next;
    br->consume(need ? 16 : 0);
    return symbol;
  }

  __attribute__((always_inline)) inline u32 read_uint(const IntCfg& cfg, u32 token) {
    if (token < cfg.split()) return token;
    int msb = cfg.msb, lsb = cfg.lsb;
    u32 n = (u32)(cfg.split_exponent - (msb + lsb)) +
            ((token - cfg.split()) >> (msb + lsb));
    n &= 31;
    u32 rest = (u32)br->read((int)n);
    u32 low = token & ((1u << lsb) - 1);
    u32 t = (token >> lsb) & ((1u << msb) - 1);
    t |= 1u << msb;
    return ((((u64)t << n) | rest) << lsb) | low;
  }

  // Fused ANS symbol + hybrid-uint read for the dominant configuration
  // (ANS, no LZ77): ONE 48-bit window load serves both the 16-bit
  // renormalization and the raw uint bits (16 + n<=31 <= 48), instead
  // of two independent loads with their own shift/mask chains. Bit
  // semantics identical to read_symbol + read_uint (the window
  // zero-extends past the end exactly like two separate peeks).
  __attribute__((always_inline)) inline u32 read_varint_ans_fast(int cluster) {
    const AnsTable& t = spec->ans[cluster];
    u32 idx = state & 0xFFF;
    u32 i = idx >> t.log_bucket_size;
    u32 posb = idx & ((1u << t.log_bucket_size) - 1);
    const AnsBucket b = t.buckets[i];
    bool al = posb >= b.cutoff();
    u32 symbol = al ? b.alias_symbol() : i;
    u32 offset = al ? b.alias_offset() + posb : posb;
    u32 d = al ? b.dist_alias() : b.dist_self();
    u32 next = (state >> 12) * d + offset;
    u64 window = br->peek(48);
    u32 need = next < (1u << 16);
    state = need ? ((next << 16) | (u32)(window & 0xFFFF)) : next;
    u64 rest_window = need ? (window >> 16) : window;
    int pos_add = need ? 16 : 0;
    const IntCfg& cfg = spec->cfgs[cluster];
    if (symbol < cfg.split()) {
      br->consume(pos_add);
      return symbol;
    }
    int msb = cfg.msb, lsb = cfg.lsb;
    u32 n = (u32)(cfg.split_exponent - (msb + lsb)) +
            ((symbol - cfg.split()) >> (msb + lsb));
    n &= 31;
    u32 rest = (u32)(rest_window & ((1ull << n) - 1));
    br->consume(pos_add + (int)n);
    u32 low = symbol & ((1u << lsb) - 1);
    u32 tt = (symbol >> lsb) & ((1u << msb) - 1);
    tt |= 1u << msb;
    return (u32)(((((u64)tt << n) | rest) << lsb) | low);
  }

  // Branchless variant of read_varint_ans_fast: the literal/wide hybrid
  // split is selected with cmov instead of a data-dependent branch (the
  // branch mispredicts on mixed-entropy token streams), and the call is
  // guaranteed inline — read_varint_clustered is too big to inline into
  // per-sample decode loops and cost a real call per sample.
  __attribute__((always_inline)) inline u32 read_varint_ans_fast_bl(
      int cluster) {
    const AnsTable& t = spec->ans[cluster];
    u32 idx = state & 0xFFF;
    u32 i = idx >> t.log_bucket_size;
    u32 posb = idx & ((1u << t.log_bucket_size) - 1);
    const AnsBucket b = t.buckets[i];
    bool al = posb >= b.cutoff();
    u32 symbol = al ? b.alias_symbol() : i;
    u32 offset = al ? b.alias_offset() + posb : posb;
    u32 d = al ? b.dist_alias() : b.dist_self();
    u32 next = (state >> 12) * d + offset;
    u64 window = br->peek(48);
    u32 need = next < (1u << 16);
    state = need ? ((next << 16) | (u32)(window & 0xFFFF)) : next;
    u64 rest_window = need ? (window >> 16) : window;
    int pos_add = need ? 16 : 0;
    const IntCfg& cfg = spec->cfgs[cluster];
    int msb = cfg.msb, lsb = cfg.lsb;
    u32 n = (u32)(cfg.split_exponent - (msb + lsb)) +
            ((symbol - cfg.split()) >> (msb + lsb));
    n &= 31;
    bool is_lit = symbol < cfg.split();
    n = is_lit ? 0 : n;
    u32 rest = (u32)(rest_window & ((1ull << n) - 1));
    br->consume(pos_add + (int)n);
    u32 low = symbol & ((1u << lsb) - 1);
    u32 tt = (symbol >> lsb) & ((1u << msb) - 1);
    tt |= 1u << msb;
    u32 wide = (u32)(((((u64)tt << n) | rest) << lsb) | low);
    return is_lit ? symbol : wide;
  }

  u32 read_varint_clustered(int cluster, u32 dist_multiplier) {
    if (!spec->lz77_enabled) {
      if (!spec->use_prefix) return read_varint_ans_fast(cluster);
      u32 token = read_symbol(cluster);
      return read_uint(spec->cfgs[cluster], token);
    }
    if (window.empty()) {
      if (!window_mem.acquire((i64)LZ_WINDOW_SIZE * (i64)sizeof(u32))) {
        error = 2;
        return 0;
      }
      window.resize(LZ_WINDOW_SIZE);
    }
    u32 r;
    if (num_to_copy > 0) {
      r = window[copy_pos & LZ_WINDOW_MASK];
      copy_pos++;
      num_to_copy--;
    } else {
      u32 token = read_symbol(cluster);
      if (token >= spec->min_symbol) {
        if (num_decoded == 0) { error = 1; return 0; }
        int lz_cluster = spec->cluster_map[spec->num_dist - 1];
        u64 n_copy = (u64)read_uint(spec->len_cfg, token - spec->min_symbol) +
                     spec->min_length;
        num_to_copy = n_copy;
        u32 dtoken = read_symbol(lz_cluster);
        u64 distance = read_uint(spec->cfgs[lz_cluster], dtoken);
        if (dist_multiplier == 0) {
        } else if (distance < 120) {
          const I8Pair& sd = SPECIAL_DIST[distance];
          i64 d = (i64)sd.a + (i64)dist_multiplier * sd.b - 1;
          distance = d < 0 ? 0 : (u64)d;
        } else {
          distance -= 120;
        }
        u64 dist = distance < LZ_WINDOW_MASK ? distance : LZ_WINDOW_MASK;
        dist += 1;
        if (dist > num_decoded) dist = num_decoded;
        copy_pos = num_decoded - dist;
        r = window[copy_pos & LZ_WINDOW_MASK];
        copy_pos++;
        num_to_copy--;
      } else {
        r = read_uint(spec->cfgs[cluster], token);
      }
    }
    window[num_decoded & LZ_WINDOW_MASK] = r;
    num_decoded++;
    return r;
  }

  int finalize() {
    if (!spec->use_prefix && !initial && state != 0x130000u) return 2;
    return error;
  }
};

inline i32 unpack_signed(u32 u) {
  // branchless zigzag: equal to (u&1) ? -((u+1)>>1) : (u>>1) for ALL u32
  // (incl. 0xFFFFFFFF -> INT_MIN). The ternary compiles to a branch on
  // the sign bit, a true coin flip on noise-like residual streams.
  return (i32)(u >> 1) ^ -(i32)(u & 1);
}

// ---------------------------------------------------------------------------
// Modular decode (jxl-modular image.rs decode_inner + predictor.rs)

struct TreeNode {
  i32 is_leaf;
  i32 a;  // prop | cluster
  i32 b;  // value | predictor
  i32 c;  // left | offset
  i32 d;  // right | multiplier
};

struct ChannelDesc {
  void* buf;      // row-major view base pointer (i32 or i16 lane)
  i64 stride;     // elements per row
  i32 width, height;
  const TreeNode* tree;
  i32 tree_len;
  i32 need_wp;           // run self-correcting predictor
  i32 num_prev;          // prev-channel refs used by the tree
  const void* const* prev_bufs;  // [num_prev]
  const i64* prev_strides;
  i32 is16;              // narrow (i16) sample lane (jxl-modular sample.rs)
};

inline i32 sample_load(const void* buf, i32 is16, i64 idx) {
  return is16 ? (i32)((const int16_t*)buf)[idx] : ((const i32*)buf)[idx];
}
inline void sample_store(void* buf, i32 is16, i64 idx, i32 v) {
  if (is16) ((int16_t*)buf)[idx] = (int16_t)v;  // wrapping narrow store
  else ((i32*)buf)[idx] = v;
}

struct WpParams {
  i32 p1, p2, p3a, p3b, p3c, p3d, p3e;
  i32 w[4];
};

static u32 DIV_LOOKUP[65];
static bool div_lookup_init = []() {
  DIV_LOOKUP[0] = 0;
  for (int i = 1; i <= 64; i++) DIV_LOOKUP[i] = (1u << 24) / (u32)i;
  return true;
}();

inline int bitlen_u32(u32 v) { return v ? 32 - __builtin_clz(v) : 0; }

inline i32 grad_clamped(i32 n, i32 w, i32 nw) {
  i32 lo = n < w ? n : w;
  i32 hi = n < w ? w : n;
  i64 g = (i64)n + w - nw;
  return g < lo ? lo : (g > hi ? hi : (i32)g);
}

inline i32 div_trunc(i64 a, i64 b) {
  i64 q = (a < 0 ? -a : a) / b;
  return (i32)(a >= 0 ? q : -q);
}

// Self-correcting predictor state (predictor.rs:136-359)
struct WpState {
  WpParams wp;
  i32 width;
  i32 x = 0, y = 0;
  std::vector<i32> true_err_row;
  std::vector<u32> subpred_err_row;  // 4 per x
  i32 te_w = 0, te_nw = 0, te_n = 0, te_ne = 0;
  u32 e_nwww[4] = {0, 0, 0, 0};
  u32 e_nw[4] = {0, 0, 0, 0};
  u32 e_ne[4] = {0, 0, 0, 0};
  i64 subpred[4];
  i64 prediction = 0;
  i32 max_error = 0;

  void init(i32 w_, const WpParams& p) {
    wp = p;
    width = w_;
    x = y = 0;
    te_w = te_nw = te_n = te_ne = 0;
    for (int i = 0; i < 4; i++) {
      e_nwww[i] = e_nw[i] = e_ne[i] = 0;
      subpred[i] = 0;
    }
    prediction = 0;
    max_error = 0;
    true_err_row.assign(w_, 0);
    subpred_err_row.assign((size_t)w_ * 4, 0);
  }

  void predict(i32 n, i32 nw, i32 ne, i32 w, i32 nn) {
    // multiply instead of <<: left-shifting negatives is UB pre-C++20
    i64 n3 = (i64)n * 8, nw3 = (i64)nw * 8, ne3 = (i64)ne * 8,
        w3 = (i64)w * 8, nn3 = (i64)nn * 8;
    subpred[0] = w3 + ne3 - n3;
    subpred[1] = n3 - (((i64)(te_w + (i64)te_n + te_ne) * wp.p1) >> 5);
    subpred[2] = w3 - (((i64)(te_w + (i64)te_n + te_nw) * wp.p2) >> 5);
    subpred[3] = n3 - (((i64)te_nw * wp.p3a + (i64)te_n * wp.p3b +
                        (i64)te_ne * wp.p3c + (nn3 - n3) * wp.p3d +
                        (nw3 - w3) * wp.p3e) >> 5);

    u32 weight[4];
    u32 sum_weights = 0;
    for (int i = 0; i < 4; i++) {
      u32 err_sum = e_nwww[i] + e_nw[i] + e_ne[i];
      int shift = bitlen_u32((err_sum + 1) >> 5) - 1;
      if (shift < 0) shift = 0;
      weight[i] = 4 + (((u64)(u32)wp.w[i] * DIV_LOOKUP[(err_sum >> shift) + 1]) >> shift);
      sum_weights += weight[i];
    }
    int log_weight = bitlen_u32(sum_weights >> 4) - 1;
    sum_weights = 0;
    for (int i = 0; i < 4; i++) {
      weight[i] >>= log_weight;
      sum_weights += weight[i];
    }
    i64 s = ((i64)sum_weights >> 1) - 1;
    for (int i = 0; i < 4; i++) s += subpred[i] * weight[i];
    prediction = (s * DIV_LOOKUP[sum_weights]) >> 24;

    if ((((i64)te_n ^ te_w) | ((i64)te_n ^ te_nw)) <= 0) {
      i64 lo = n3 < w3 ? n3 : w3; if (ne3 < lo) lo = ne3;
      i64 hi = n3 > w3 ? n3 : w3; if (ne3 > hi) hi = ne3;
      if (prediction < lo) prediction = lo;
      if (prediction > hi) prediction = hi;
    }

    i32 max_err = te_w;
    if (std::abs((i64)te_n) > std::abs((i64)max_err)) max_err = te_n;
    if (std::abs((i64)te_nw) > std::abs((i64)max_err)) max_err = te_nw;
    if (std::abs((i64)te_ne) > std::abs((i64)max_err)) max_err = te_ne;
    max_error = max_err;
  }

  void record(i32 sample) {
    i64 s8 = (i64)sample * 8;
    i32 true_err = wrap32(prediction - s8);
    u32 sub_err[4];
    for (int i = 0; i < 4; i++) {
      i64 d = subpred[i] - s8;
      if (d < 0) d = -d;
      sub_err[i] = (u32)((d + 3) >> 3);
    }
    true_err_row[x] = true_err;
    for (int i = 0; i < 4; i++) subpred_err_row[(size_t)x * 4 + i] = sub_err[i];
    x++;
    if (x >= width) {
      y++;
      x = 0;
      te_w = 0;
      te_n = true_err_row[0];
      te_nw = te_n;
      for (int i = 0; i < 4; i++) {
        e_nw[i] = subpred_err_row[i];
        e_nwww[i] = e_nw[i];
      }
      if (width <= 1) {
        te_ne = te_n;
        for (int i = 0; i < 4; i++) e_ne[i] = e_nw[i];
      } else {
        te_ne = true_err_row[1];
        for (int i = 0; i < 4; i++) e_ne[i] = subpred_err_row[4 + i];
      }
    } else {
      te_w = true_err;
      te_nw = te_n;
      te_n = te_ne;
      for (int i = 0; i < 4; i++) {
        e_nwww[i] = e_nw[i];
        e_nw[i] = e_ne[i] + sub_err[i];
      }
      if (x + 1 >= width) {
        te_ne = te_n;
        for (int i = 0; i < 4; i++) e_ne[i] = e_nw[i];
      } else if (y != 0) {
        te_ne = true_err_row[x + 1];
        for (int i = 0; i < 4; i++) e_ne[i] = subpred_err_row[(size_t)(x + 1) * 4 + i];
      }
    }
  }
};

// Per-channel scan state (predictor.rs PredictorState + properties)
struct ScanState {
  i32 width;
  const ChannelDesc* ch;
  std::vector<i32> row_prev, row_curr;
  WpState* wp = nullptr;
  i32 y = 0, x = 0;
  i32 w = 0, n = 0, nw = 0;
  i32 prev_grad = 0;
  i32 grad9 = 0;  // property 9 of the current sample (prev_grad chain)

  i32 filled_rows = 0;

  inline i32 get_nn() const {
    // NN (two rows up): rows are double-buffered, so during row y >= 2 the
    // not-yet-overwritten tail of row_curr still holds row y-2 (the
    // reference's swap-without-clear behavior, predictor.rs nn()).
    if (filled_rows >= 2) return row_curr[x];
    return n;
  }

  inline i32 get_ne() const {
    if (filled_rows == 0 || x + 1 >= width) return n;
    return row_prev[x + 1];
  }
  inline i32 get_nee() const {
    if (filled_rows == 0 || x + 2 >= width) return get_ne();
    return row_prev[x + 2];
  }
  inline i32 get_ww() const {
    if (x >= 2) return row_curr[x - 2];
    return w;
  }

  void init(const ChannelDesc* c, WpState* wps) {
    ch = c;
    width = c->width;
    row_prev.assign(width, 0);
    row_curr.assign(width, 0);
    wp = wps;
    filled_rows = 0;
  }

  void compute_properties() {
    // WP state must advance every sample when the tree needs it; the
    // remaining properties evaluate lazily in get_property (trees touch
    // only a handful per node, ma.rs FlatMaTree).
    if (wp) wp->predict(n, nw, get_ne(), w, get_nn());
    grad9 = wrap32((i64)(wrap32((i64)w - nw)) + n);
  }

  i32 get_extra(i32 prop_extra) const {
    i32 idx = prop_extra / 4;
    i32 kind = prop_extra % 4;
    if (idx >= ch->num_prev) return 0;
    const void* pb = ch->prev_bufs[idx];
    i32 is16 = ch->is16;
    i64 st = ch->prev_strides[idx];
    i32 c = sample_load(pb, is16, (i64)y * st + x);
    if (kind == 0) return std::abs(c);
    if (kind == 1) return c;
    i32 g;
    if (x == 0 && y == 0) g = 0;
    else if (x == 0) g = sample_load(pb, is16, (i64)(y - 1) * st);
    else if (y == 0) g = sample_load(pb, is16, x - 1);
    else g = grad_clamped(sample_load(pb, is16, (i64)(y - 1) * st + x),
                          sample_load(pb, is16, (i64)y * st + x - 1),
                          sample_load(pb, is16, (i64)(y - 1) * st + x - 1));
    if (kind == 2) return (i32)std::abs((i64)c - g);
    return wrap32((i64)c - g);
  }

  inline i32 get_property(i32 prop) const {
    switch (prop) {
      case 0: return 0;   // channel idx: folded statically (ma.rs)
      case 1: return 0;   // stream idx: folded statically
      case 2: return y;
      case 3: return x;
      case 4: return std::abs(n);
      case 5: return std::abs(w);
      case 6: return n;
      case 7: return w;
      case 8: return wrap32((i64)w - prev_grad);
      case 9: return grad9;
      case 10: return wrap32((i64)w - nw);
      case 11: return wrap32((i64)nw - n);
      case 12: return wrap32((i64)n - get_ne());
      case 13: return wrap32((i64)n - get_nn());
      case 14: return wrap32((i64)w - get_ww());
      case 15: return wp ? wp->max_error : 0;
      default: return get_extra(prop - 16);
    }
  }

  i32 predict(i32 predictor) const {
    switch (predictor) {
      case 0: return 0;
      case 1: return w;
      case 2: return n;
      case 3: return div_trunc((i64)w + n, 2);
      case 4: return std::abs((i64)n - nw) < std::abs((i64)w - nw) ? w : n;
      case 5: return grad_clamped(n, w, nw);
      case 6: return (i32)((wp->prediction + 3) >> 3);
      case 7: return get_ne();
      case 8: return nw;
      case 9: return get_ww();
      case 10: return div_trunc((i64)w + nw, 2);
      case 11: return div_trunc((i64)n + nw, 2);
      case 12: return div_trunc((i64)n + get_ne(), 2);
      case 13:
        return div_trunc(6 * (i64)n - 2 * (i64)get_nn() + 7 * (i64)w +
                             (i64)get_ww() + (i64)get_nee() + 3 * (i64)get_ne() + 8,
                         16);
      default: return 0;
    }
  }

  void record(i32 sample) {
    if (wp) wp->record(sample);
    row_curr[x] = sample;
    x++;
    if (x >= width) {
      y++;
      x = 0;
      std::swap(row_prev, row_curr);
      filled_rows++;
      prev_grad = 0;
      n = row_prev[0];
      w = n;
      nw = n;
    } else {
      prev_grad = grad9;
      w = sample;
      if (filled_rows == 0) {
        nw = sample;
        n = sample;
      } else {
        nw = n;
        n = row_prev[x];
      }
    }
  }
};

inline const TreeNode* walk_tree(const TreeNode* nodes, const ScanState& st) {
  const TreeNode* nd = nodes;
  while (!nd->is_leaf) {
    i32 v = st.get_property(nd->a);
    nd = &nodes[v > nd->b ? nd->c : nd->d];
  }
  return nd;
}

// Single-leaf fast path (reference decode_single_node, image.rs:716):
// no property vector, no shadow rows — neighbors come straight from the
// decoded output buffer. Templated on sample type and predictor so the
// per-sample work compiles down to the ANS read plus a couple of loads.
template <typename S, int PRED, bool FAST>
static int decode_single_leaf_loop(DecoderState& dec, const ChannelDesc& cd,
                                   const TreeNode* leaf, u32 dm) {
  S* buf = (S*)cd.buf;
  const i64 stride = cd.stride;
  const i32 W = cd.width, H = cd.height;
  const int cluster = leaf->a;
  const i32 off = leaf->c, mul = leaf->d;
  for (i32 y = 0; y < H; y++) {
    S* crow = buf + (i64)y * stride;
    const S* prow = y > 0 ? crow - stride : nullptr;
    for (i32 x = 0; x < W; x++) {
      i32 p;
      if (PRED == 0) {
        p = 0;
      } else {
        i32 w = x > 0 ? (i32)crow[x - 1] : (prow ? (i32)prow[0] : 0);
        if (PRED == 1) {
          p = w;
        } else {
          i32 n = prow ? (i32)prow[x] : w;
          i32 nw = (x > 0 && prow) ? (i32)prow[x - 1] : w;
          switch (PRED) {
            case 2: p = n; break;
            case 3: p = div_trunc((i64)w + n, 2); break;
            case 4:
              p = std::abs((i64)n - nw) < std::abs((i64)w - nw) ? w : n;
              break;
            case 5: p = grad_clamped(n, w, nw); break;
            case 7: p = (prow && x + 1 < W) ? (i32)prow[x + 1] : n; break;
            case 8: p = nw; break;
            case 9: p = x >= 2 ? (i32)crow[x - 2] : w; break;
            case 10: p = div_trunc((i64)w + nw, 2); break;
            case 11: p = div_trunc((i64)n + nw, 2); break;
            case 12: {
              i32 ne = (prow && x + 1 < W) ? (i32)prow[x + 1] : n;
              p = div_trunc((i64)n + ne, 2);
              break;
            }
            case 13: {
              i32 ne = (prow && x + 1 < W) ? (i32)prow[x + 1] : n;
              i32 nee = (prow && x + 2 < W) ? (i32)prow[x + 2] : ne;
              i32 nn = y >= 2 ? (i32)buf[(i64)(y - 2) * stride + x] : n;
              i32 ww = x >= 2 ? (i32)crow[x - 2] : w;
              p = div_trunc(6 * (i64)n - 2 * (i64)nn + 7 * (i64)w + (i64)ww +
                                (i64)nee + 3 * (i64)ne + 8,
                            16);
              break;
            }
            default: p = 0;
          }
        }
      }
      u32 token = FAST ? dec.read_varint_ans_fast_bl(cluster)
                       : dec.read_varint_clustered(cluster, dm);
      if (!FAST && dec.error) return 10 + dec.error;
      i64 diff = (i64)unpack_signed(token) * mul + off;
      crow[x] = (S)wrap32(diff + p);
    }
  }
  return 0;
}

template <typename S, bool FAST>
static int decode_single_leaf(DecoderState& dec, const ChannelDesc& cd,
                              const TreeNode* leaf, u32 dm) {
  switch (leaf->b) {
    case 0: return decode_single_leaf_loop<S, 0, FAST>(dec, cd, leaf, dm);
    case 1: return decode_single_leaf_loop<S, 1, FAST>(dec, cd, leaf, dm);
    case 2: return decode_single_leaf_loop<S, 2, FAST>(dec, cd, leaf, dm);
    case 3: return decode_single_leaf_loop<S, 3, FAST>(dec, cd, leaf, dm);
    case 4: return decode_single_leaf_loop<S, 4, FAST>(dec, cd, leaf, dm);
    case 5: return decode_single_leaf_loop<S, 5, FAST>(dec, cd, leaf, dm);
    case 7: return decode_single_leaf_loop<S, 7, FAST>(dec, cd, leaf, dm);
    case 8: return decode_single_leaf_loop<S, 8, FAST>(dec, cd, leaf, dm);
    case 9: return decode_single_leaf_loop<S, 9, FAST>(dec, cd, leaf, dm);
    case 10: return decode_single_leaf_loop<S, 10, FAST>(dec, cd, leaf, dm);
    case 11: return decode_single_leaf_loop<S, 11, FAST>(dec, cd, leaf, dm);
    case 12: return decode_single_leaf_loop<S, 12, FAST>(dec, cd, leaf, dm);
    case 13: return decode_single_leaf_loop<S, 13, FAST>(dec, cd, leaf, dm);
    default: return -1;  // predictor 6 (WP) etc.: caller uses general path
  }
}

// Single-leaf WEIGHTED-predictor channel (the effort-7 lossless shape):
// neighbors read straight from the output buffer, no ScanState property
// machinery or row double-buffering — only the spec-mandated WP state
// update remains per sample (predictor.rs:136-359).
template <typename S, bool FAST>
static int decode_single_leaf_wp(DecoderState& dec, const ChannelDesc& cd,
                                 const TreeNode* leaf, u32 dm,
                                 const WpParams& wpp) {
  S* buf = (S*)cd.buf;
  const i64 stride = cd.stride;
  const i32 W = cd.width, H = cd.height;
  const int cluster = leaf->a;
  const i32 off = leaf->c, mul = leaf->d;
  WpState wps;
  wps.init(W, wpp);
  for (i32 y = 0; y < H; y++) {
    S* crow = buf + (i64)y * stride;
    const S* prow = y > 0 ? crow - stride : nullptr;
    const S* pprow = y > 1 ? crow - 2 * stride : nullptr;
    for (i32 x = 0; x < W; x++) {
      i32 w = x > 0 ? (i32)crow[x - 1] : (prow ? (i32)prow[0] : 0);
      i32 n = prow ? (i32)prow[x] : w;
      i32 nw = (x > 0 && prow) ? (i32)prow[x - 1] : w;
      i32 ne = (prow && x + 1 < W) ? (i32)prow[x + 1] : n;
      i32 nn = pprow ? (i32)pprow[x] : n;
      wps.predict(n, nw, ne, w, nn);
      u32 token = FAST ? dec.read_varint_ans_fast_bl(cluster)
                       : dec.read_varint_clustered(cluster, dm);
      if (!FAST && dec.error) return 10 + dec.error;
      i64 diff = (i64)unpack_signed(token) * mul + off;
      i32 val = wrap32(diff + (i32)((wps.prediction + 3) >> 3));
      crow[x] = (S)val;
      // record the lane-narrowed value: neighbors re-read from the
      // narrow output buffer, so the WP history stays self-consistent
      // (matches jxl-modular's i16 lane; valid streams never overflow
      // the lane, so this equals the wide general path on them)
      wps.record((i32)(S)val);
    }
  }
  return 0;
}

// Decode ONE channel of a modular sub-stream (fast single-leaf paths or
// the general property/tree loop). Returns 0 or >0 error codes.
static int decode_modular_channel(DecoderState& dec, ChannelDesc& cd,
                                  i32 dist_multiplier, const WpParams& wpp) {
  const TreeNode* root = cd.tree;
  bool single = root->is_leaf != 0;

  bool fast_ans = !dec.spec->lz77_enabled && !dec.spec->use_prefix;
  if (single && cd.need_wp && root->b == 6) {
    if (fast_ans)
      return cd.is16
          ? decode_single_leaf_wp<int16_t, true>(dec, cd, root,
                                                 (u32)dist_multiplier, wpp)
          : decode_single_leaf_wp<i32, true>(dec, cd, root,
                                             (u32)dist_multiplier, wpp);
    return cd.is16
        ? decode_single_leaf_wp<int16_t, false>(dec, cd, root,
                                                (u32)dist_multiplier, wpp)
        : decode_single_leaf_wp<i32, false>(dec, cd, root,
                                            (u32)dist_multiplier, wpp);
  }
  if (single && !cd.need_wp) {
    int ret;
    if (fast_ans)
      ret = cd.is16
          ? decode_single_leaf<int16_t, true>(dec, cd, root,
                                              (u32)dist_multiplier)
          : decode_single_leaf<i32, true>(dec, cd, root,
                                          (u32)dist_multiplier);
    else
      ret = cd.is16
          ? decode_single_leaf<int16_t, false>(dec, cd, root,
                                               (u32)dist_multiplier)
          : decode_single_leaf<i32, false>(dec, cd, root,
                                           (u32)dist_multiplier);
    if (ret >= 0) return ret;
    // ret < 0: unsupported predictor, fall through to the general loop
  }

  WpState wps;
  WpState* wp = nullptr;
  if (cd.need_wp) {
    wps.init(cd.width, wpp);
    wp = &wps;
  }
  ScanState st;
  st.init(&cd, wp);

  for (i32 y = 0; y < cd.height; y++) {
    i64 row_base = (i64)y * cd.stride;
    for (i32 x = 0; x < cd.width; x++) {
      st.compute_properties();
      const TreeNode* leaf = single ? root : walk_tree(root, st);
      u32 token = fast_ans
          ? dec.read_varint_ans_fast_bl(leaf->a)
          : dec.read_varint_clustered(leaf->a, (u32)dist_multiplier);
      if (dec.error) return 10 + dec.error;
      i64 diff = (i64)unpack_signed(token) * leaf->d + leaf->c;
      i32 val = wrap32(diff + st.predict(leaf->b));
      sample_store(cd.buf, cd.is16, row_base + x, val);
      st.record(val);
    }
  }
  return 0;
}

// RLE fast-lossless probing (jxl-coding lib.rs:105-123): LZ77 on, the
// distance cluster is a single ANS symbol == 1 with split_exponent 0.
// Every match then copies the previous value (token 1 -> special
// distance (1,0) -> effective distance 1), so runs repeat the last
// literal and the 1<<20 window is never needed.
static bool spec_rle_mode(const DecoderSpec& spec) {
  if (!spec.lz77_enabled || spec.use_prefix) return false;
  int lz_cluster = spec.cluster_map[spec.num_dist - 1];
  if (spec.cfgs[lz_cluster].split_exponent != 0) return false;
  const AnsTable& t = spec.ans[lz_cluster];
  const AnsBucket& b0 = t.buckets[0];
  return b0.cutoff() == 0 && b0.alias_symbol() == 1 &&
         b0.dist_alias() == 4096;
}

// The fast-lossless shape: every channel is a bare single-leaf Gradient
// tree (offset 0, multiplier 1) — image.rs:493-534 decode_fast_lossless.
static bool all_simple_gradient(const ChannelDesc* chans, int nc) {
  for (int c = 0; c < nc; c++) {
    const ChannelDesc& cd = chans[c];
    if (cd.width == 0 || cd.height == 0) continue;
    const TreeNode* r = cd.tree;
    if (!r->is_leaf || cd.need_wp || r->b != 5 || r->c != 0 || r->d != 1)
      return false;
  }
  return true;
}

// Whole-stream RLE + gradient decode: one length token covers a whole
// run (the generic path pays a no-op distance read, window bookkeeping
// and the LZ77 branch cascade per SAMPLE). rle state spans channels,
// like the window does on the generic path.
template <typename S>
static int decode_stream_rle_gradient(DecoderState& dec, BitReader& br,
                                      ChannelDesc* chans, int nc) {
  const DecoderSpec& spec = *dec.spec;
  i32 rle_value = 0;
  u64 rle_repeat = 0;
  for (int c = 0; c < nc; c++) {
    ChannelDesc& cd = chans[c];
    if (cd.width == 0 || cd.height == 0) continue;
    const int cluster = cd.tree->a;
    const IntCfg& cfg = spec.cfgs[cluster];
    S* buf = (S*)cd.buf;
    const i64 stride = cd.stride;
    const i32 W = cd.width, H = cd.height;
    for (i32 y = 0; y < H; y++) {
      S* crow = buf + (i64)y * stride;
      const S* prow = y > 0 ? crow - stride : nullptr;
      i32 x = 0;
      while (x < W) {
        if (rle_repeat == 0) {
          u32 token = dec.read_symbol(cluster);
          if (token >= spec.min_symbol) {
            rle_repeat =
                (u64)dec.read_uint(spec.len_cfg, token - spec.min_symbol) +
                spec.min_length;
          } else {
            rle_value = unpack_signed(dec.read_uint(cfg, token));
            rle_repeat = 1;
          }
        }
        // consume up to the row end from the current run, applying the
        // gradient predictor per sample
        i64 take64 = (i64)(rle_repeat < (u64)(W - x) ? rle_repeat
                                                     : (u64)(W - x));
        i32 take = (i32)take64;
        rle_repeat -= (u64)take;
        if (prow) {
          i32 w = x > 0 ? (i32)crow[x - 1] : (i32)prow[0];
          i32 nw = x > 0 ? (i32)prow[x - 1] : w;
          for (i32 e = x + take; x < e; x++) {
            i32 n = (i32)prow[x];
            S val = (S)wrap32((i64)grad_clamped(n, w, nw) + rle_value);
            crow[x] = val;
            w = (i32)val;
            nw = n;
          }
        } else {
          i32 w = x > 0 ? (i32)crow[x - 1] : 0;
          for (i32 e = x + take; x < e; x++) {
            S val = (S)wrap32((i64)w + rle_value);
            crow[x] = val;
            w = (i32)val;
          }
        }
      }
    }
  }

  if (br.pos > br.len_bits) return 4;
  return dec.finalize();
}

// One modular sub-stream: all channels sharing one entropy stream.
// dec/br are begun by the caller. Returns 0 or >0 error codes.
static int decode_modular_stream_core(DecoderState& dec, BitReader& br,
                                      ChannelDesc* chans, int num_channels,
                                      i32 dist_multiplier,
                                      const WpParams& wpp) {
  if (spec_rle_mode(*dec.spec) &&
      all_simple_gradient(chans, num_channels)) {
    bool is16 = false;
    for (int c = 0; c < num_channels; c++)
      if (chans[c].width && chans[c].height) { is16 = chans[c].is16; break; }
    return is16
        ? decode_stream_rle_gradient<int16_t>(dec, br, chans, num_channels)
        : decode_stream_rle_gradient<i32>(dec, br, chans, num_channels);
  }

  for (int c = 0; c < num_channels; c++) {
    ChannelDesc& cd = chans[c];
    if (cd.width == 0 || cd.height == 0) continue;
    int ret = decode_modular_channel(dec, cd, dist_multiplier, wpp);
    if (ret != 0) return ret;
  }

  if (br.pos > br.len_bits) return 4;  // consumed past end: truncated
  return dec.finalize();
}

// ---------------------------------------------------------------------------
// Interleaved dual-section modular decode (the modular twin of the HF
// cursor machinery): two independent sections' ANS chains stepped
// alternately so their serial dependency chains overlap. The hot shape
// is the single-leaf GRADIENT channel (the fast-lossless default); rows
// y >= 1 run as interleaved register-resident runs, everything else
// (row 0, other predictors, MA trees, WP, LZ77/prefix streams) decodes
// serially inside the advance step via the reference code paths above.

// BitReader::peek(48) on raw locals (bit semantics identical). Shared by
// the modular and HF interleaved steppers.
static inline u64 hf_peek48(const u8* __restrict__ data, u64 len_bits,
                            u64 pos) {
  u64 byte0 = pos >> 3;
  int shift = (int)(pos & 7);
  u64 avail_bytes = (len_bits + 7) >> 3;
  u64 window;
  if (__builtin_expect(byte0 + 8 <= avail_bytes, 1)) {
    std::memcpy(&window, data + byte0, 8);
  } else {
    window = 0;
    u64 nbytes = (u64)((shift + 48 + 7) >> 3);
    for (u64 i = 0; i < nbytes && byte0 + i < avail_bytes; i++)
      window |= (u64)data[byte0 + i] << (8 * i);
  }
  return (window >> shift) & ((1ull << 48) - 1);
}

// Precomputed hybrid-uint expansion for ONE cluster, indexed by symbol:
// token = base + (next n raw bits << lsb); literal symbols get
// {base=symbol, n=0, lsb=0}. The gradient fast path has a FIXED cluster
// per channel, so an 8-byte-per-symbol table built once per channel
// replaces the ~15-instruction wide-path arithmetic per sample. Layout:
// base in [0:32), n in [32:40), lsb in [40:48).
static inline u64 mod_ext_entry(u32 symbol, const IntCfg& cfg) {
  if (symbol < cfg.split()) return (u64)symbol;
  int msb = cfg.msb, lsb = cfg.lsb;
  u32 n = (u32)(cfg.split_exponent - (msb + lsb)) +
          ((symbol - cfg.split()) >> (msb + lsb));
  n &= 31;
  u32 low = symbol & ((1u << lsb) - 1);
  u32 tt = (symbol >> lsb) & ((1u << msb) - 1);
  tt |= 1u << msb;
  u32 base = (u32)((((u64)tt << n) << lsb) | low);
  return (u64)base | ((u64)n << 32) | ((u64)lsb << 40);
}

struct ModCursor {
  DecoderState dec;
  BitReader br;
  ChannelDesc* chans;
  int nc;
  i32 dm;
  const WpParams* wpp;
  int c;   // current channel
  i32 y;   // current row; -1 = channel not started
  // active gradient row run
  void* crow;
  const void* prow;
  i32 x, W;
  i32 w, nw;  // carried neighbor values (post-store sample domain)
  int cluster;
  i32 off, mul;
  int is16;
  // per-channel hybrid-uint expansion table (see mod_ext_entry)
  std::vector<u64> ext;
  int ext_cluster = -1;
  // status: 0 = in-run, 1 = needs mod_advance, 2 = done (see result)
  int status;
  int result;
};

// Decode row 0 of a single-leaf gradient channel (prow == null): every
// predictor input collapses to W, exactly decode_single_leaf_loop's
// first-row semantics.
template <typename S>
static void mod_row0(DecoderState& dec, ChannelDesc& cd, int cluster,
                     i32 off, i32 mul) {
  S* crow = (S*)cd.buf;
  i32 w = 0;
  for (i32 x = 0; x < cd.width; x++) {
    u32 token = dec.read_varint_ans_fast_bl(cluster);
    i64 diff = (i64)unpack_signed(token) * mul + off;
    S val = (S)wrap32(diff + w);
    crow[x] = val;
    w = (i32)val;
  }
}

// Walk the cursor to the next gradient row run (status 0) or to section
// completion (status 2). Non-hot shapes decode inline via the reference
// channel decoder.
static void mod_advance(ModCursor& cu) {
  bool fast_ans = !cu.dec.spec->lz77_enabled && !cu.dec.spec->use_prefix;
  for (;;) {
    if (cu.c >= cu.nc) {
      cu.status = 2;
      cu.result = cu.br.pos > cu.br.len_bits ? 4 : cu.dec.finalize();
      return;
    }
    ChannelDesc& cd = cu.chans[cu.c];
    if (cd.width == 0 || cd.height == 0) {
      cu.c++;
      cu.y = -1;
      continue;
    }
    if (cu.y < 0) {
      const TreeNode* root = cd.tree;
      bool grad_fast = fast_ans && root->is_leaf != 0 && !cd.need_wp &&
                       root->b == 5;
      if (!grad_fast) {
        int ret = decode_modular_channel(cu.dec, cd, cu.dm, *cu.wpp);
        if (ret != 0) {
          cu.status = 2;
          cu.result = ret;
          return;
        }
        cu.c++;
        continue;
      }
      cu.cluster = root->a;
      cu.off = root->c;
      cu.mul = root->d;
      cu.is16 = cd.is16;
      if (cu.ext_cluster != cu.cluster) {
        const AnsTable& t = cu.dec.spec->ans[cu.cluster];
        i32 alphabet = 1 << (12 - t.log_bucket_size);
        const IntCfg& cfg = cu.dec.spec->cfgs[cu.cluster];
        cu.ext.resize((size_t)alphabet);
        for (i32 i = 0; i < alphabet; i++)
          cu.ext[i] = mod_ext_entry((u32)i, cfg);
        cu.ext_cluster = cu.cluster;
      }
      if (cd.is16) mod_row0<int16_t>(cu.dec, cd, cu.cluster, cu.off, cu.mul);
      else mod_row0<i32>(cu.dec, cd, cu.cluster, cu.off, cu.mul);
      cu.y = 1;
    }
    ChannelDesc& cd2 = cu.chans[cu.c];
    if (cu.y >= cd2.height) {
      cu.c++;
      cu.y = -1;
      continue;
    }
    // start the run for row y: w = nw = prow[0] makes the x == 0 sample
    // come out identical to the reference formula (n = nw = w = prow[0])
    i64 elem = cd2.is16 ? 2 : 4;
    char* base = (char*)cd2.buf;
    cu.crow = base + (i64)cu.y * cd2.stride * elem;
    cu.prow = base + (i64)(cu.y - 1) * cd2.stride * elem;
    cu.x = 0;
    cu.W = cd2.width;
    i32 p0 = cd2.is16 ? (i32)((const int16_t*)cu.prow)[0]
                      : ((const i32*)cu.prow)[0];
    cu.w = p0;
    cu.nw = p0;
    cu.y++;  // resume position after this run
    cu.status = 0;
    return;
  }
}

// Fused dual gradient-row stepper: all loop-carried state in locals
// (see hf_dual_run for why the cursor-struct form defeats register
// allocation). Exits when either run ends; statuses written back.
template <typename SA, typename SB>
static void mod_dual_run(ModCursor& A, ModCursor& B) {
#define MOD_LOCALS(p, C, S)                                               \
  u32 p##_state = C.dec.state;                                            \
  const u8* __restrict__ p##_data = C.br.data;                            \
  const u64 p##_len = C.br.len_bits;                                      \
  u64 p##_pos = C.br.pos;                                                 \
  S* __restrict__ p##_crow = (S*)C.crow;                                  \
  const S* __restrict__ p##_prow = (const S*)C.prow;                      \
  i32 p##_x = C.x;                                                        \
  const i32 p##_W = C.W;                                                  \
  i32 p##_w = C.w, p##_nw = C.nw;                                         \
  const i32 p##_off = C.off, p##_mul = C.mul;                             \
  const AnsTable& p##_t = C.dec.spec->ans[C.cluster];                     \
  const u64* __restrict__ p##_ext = C.ext.data();                         \
  bool p##_live = true;

#define MOD_SAVE(p, C)                                                    \
  C.dec.state = p##_state;                                                \
  C.br.pos = p##_pos;                                                     \
  C.x = p##_x;                                                            \
  C.w = p##_w;                                                            \
  C.nw = p##_nw;

#define MOD_STEP(p, C, S)                                                 \
  if (p##_live) {                                                         \
    i32 n = (i32)p##_prow[p##_x];                                         \
    i32 pr = grad_clamped(n, p##_w, p##_nw);                              \
    u32 idx = p##_state & 0xFFF;                                          \
    u32 bi = idx >> p##_t.log_bucket_size;                                \
    u32 posb = idx & ((1u << p##_t.log_bucket_size) - 1);                 \
    const AnsBucket bu = p##_t.buckets[bi];                               \
    bool al = posb >= bu.cutoff();                                        \
    u32 symbol = al ? bu.alias_symbol() : bi;                             \
    u32 offset = al ? bu.alias_offset() + posb : posb;                    \
    u32 dd = al ? bu.dist_alias() : bu.dist_self();                       \
    u32 next = (p##_state >> 12) * dd + offset;                           \
    u64 window = hf_peek48(p##_data, p##_len, p##_pos);                   \
    u32 need = next < (1u << 16);                                         \
    p##_state = need ? ((next << 16) | (u32)(window & 0xFFFF)) : next;    \
    u64 rest_window = need ? (window >> 16) : window;                     \
    int pos_add = need ? 16 : 0;                                          \
    /* precomputed hybrid-uint per symbol (mod_ext_entry): noisy        \
       residual streams are mostly WIDE tokens, so the wide-path        \
       arithmetic runs every sample — one 8-byte load (off the ANS      \
       state chain; the value chain it feeds has slack) replaces it */  \
    u64 e = p##_ext[symbol];                                              \
    u32 nn = (u32)(e >> 32) & 0xFF;                                       \
    u32 rest = (u32)(rest_window & ((1ull << nn) - 1));                   \
    p##_pos += pos_add + (int)nn;                                         \
    u32 token = (u32)e + (rest << (u32)(e >> 40));                        \
    /* branchless zigzag: the sign bit of noise residuals is a true     \
       coin flip — the ternary unpack_signed mispredicts ~50% here */   \
    i32 sv = (i32)(token >> 1) ^ -(i32)(token & 1);                       \
    i64 diff = (i64)sv * p##_mul + p##_off;                               \
    S val = (S)wrap32(diff + pr);                                         \
    p##_crow[p##_x] = val;                                                \
    p##_w = (i32)val;                                                     \
    p##_nw = n;                                                           \
    if (++p##_x >= p##_W) {                                               \
      C.status = 1;                                                       \
      p##_live = false;                                                   \
    }                                                                     \
  }

  MOD_LOCALS(a, A, SA)
  MOD_LOCALS(b, B, SB)
  for (;;) {
    MOD_STEP(a, A, SA)
    MOD_STEP(b, B, SB)
    if (!(a_live & b_live)) break;
  }
  while (a_live) {
    MOD_STEP(a, A, SA)
  }
  while (b_live) {
    MOD_STEP(b, B, SB)
  }
  MOD_SAVE(a, A)
  MOD_SAVE(b, B)
#undef MOD_LOCALS
#undef MOD_SAVE
#undef MOD_STEP
}

// Serial drain of one active gradient run (the partner section already
// finished; the tail is short).
template <typename S>
static void mod_drain_run(ModCursor& cu) {
  S* crow = (S*)cu.crow;
  const S* prow = (const S*)cu.prow;
  while (cu.x < cu.W) {
    i32 n = (i32)prow[cu.x];
    i32 pr = grad_clamped(n, cu.w, cu.nw);
    u32 token = cu.dec.read_varint_ans_fast_bl(cu.cluster);
    i64 diff = (i64)unpack_signed(token) * cu.mul + cu.off;
    S val = (S)wrap32(diff + pr);
    crow[cu.x] = val;
    cu.w = (i32)val;
    cu.nw = n;
    cu.x++;
  }
  cu.status = 1;
}

static void mod_dual_dispatch(ModCursor& A, ModCursor& B) {
  if (A.is16) {
    if (B.is16) mod_dual_run<int16_t, int16_t>(A, B);
    else mod_dual_run<int16_t, i32>(A, B);
  } else {
    if (B.is16) mod_dual_run<i32, int16_t>(A, B);
    else mod_dual_run<i32, i32>(A, B);
  }
}

}  // namespace


namespace {

// Build a DecoderSpec + owned vectors from the serialized arrays.
// Fused per-cluster ANS record for the interleaved symbol loops: the
// alias-table meta and the hybrid-uint config land in one 32-byte
// (half-cache-line) record, so a symbol's table lookups after the
// cluster-map load touch one line instead of two arrays.
struct AnsRec {
  const AnsBucket* buckets;  // 8
  u32 lbs;                   // log_bucket_size
  u32 split;                 // 1 << split_exponent
  u32 msb, lsb, se;          // IntCfg fields
  u32 pad_;
};
static_assert(sizeof(AnsRec) == 32, "half cache line");

struct SpecHolder {
  DecoderSpec spec;
  std::vector<IntCfg> cfg_v;
  std::vector<AnsTable> ans_v;
  std::vector<AnsRec> rec_v;
  std::vector<PrefixTable> pfx_v;
  // The serialized blob arrives as i32 words from Python with only 4-byte
  // alignment guaranteed; AnsBucket is a u64 load, so copy into an
  // 8-aligned owned store (once per spec — nothing vs decode cost).
  std::vector<AnsBucket> bucket_store;
  MemGuard mem;

  void build(const i32* spec_header, const i32* cluster_map, const i32* cfgs,
             const i32* ans_meta, const i32* ans_blob,
             const i32* pfx_meta, const i32* pfx_blob) {
    spec.lz77_enabled = spec_header[0];
    spec.min_symbol = (u32)spec_header[1];
    spec.min_length = (u32)spec_header[2];
    spec.len_cfg = IntCfg{spec_header[3], spec_header[4], spec_header[5]};
    spec.num_dist = spec_header[6];
    spec.num_clusters = spec_header[7];
    spec.use_prefix = spec_header[8];
    spec.cluster_map = cluster_map;
    cfg_v.resize(spec.num_clusters);
    for (int i = 0; i < spec.num_clusters; i++)
      cfg_v[i] = IntCfg{cfgs[i * 3], cfgs[i * 3 + 1], cfgs[i * 3 + 2]};
    spec.cfgs = cfg_v.data();
    if (spec.use_prefix) {
      pfx_v.resize(spec.num_clusters);
      for (int i = 0; i < spec.num_clusters; i++) {
        i32 max_len = pfx_meta[i * 2];
        i32 off = pfx_meta[i * 2 + 1];
        i32 n = max_len ? (1 << max_len) : 1;
        pfx_v[i] = PrefixTable{max_len, pfx_blob + off, pfx_blob + off + n};
      }
      spec.pfx = pfx_v.data();
      spec.ans = nullptr;
    } else {
      ans_v.resize(spec.num_clusters);
      rec_v.resize(spec.num_clusters);
      size_t total_words = 0;
      for (int i = 0; i < spec.num_clusters; i++) {
        size_t end = (size_t)ans_meta[i * 2 + 1] +
                     2u * ((size_t)1 << (12 - ans_meta[i * 2]));
        if (end > total_words) total_words = end;
      }
      // Accounted but never the enforcement point: spec tables are small
      // next to the LZ windows / offset tables where the limit is checked.
      (void)mem.acquire((i64)(total_words / 2) * (i64)sizeof(AnsBucket));
      bucket_store.resize(total_words / 2);
      if (total_words)
        std::memcpy(bucket_store.data(), ans_blob, total_words * 4);
      for (int i = 0; i < spec.num_clusters; i++) {
        i32 lbs = ans_meta[i * 2];
        i32 off = ans_meta[i * 2 + 1];  // in i32 words (2 per bucket)
        ans_v[i] = AnsTable{lbs, bucket_store.data() + off / 2};
        rec_v[i] = AnsRec{ans_v[i].buckets, (u32)lbs,
                          1u << cfg_v[i].split_exponent, (u32)cfg_v[i].msb,
                          (u32)cfg_v[i].lsb, (u32)cfg_v[i].split_exponent, 0};
      }
      spec.ans = ans_v.data();
      spec.recs = rec_v.data();
      spec.pfx = nullptr;
    }
  }
};

inline int icc_context(u64 idx, u32 b1, u32 b2) {
  if (idx <= 128) return 0;
  int p1, p2;
  if ((b1 >= 0x41 && b1 <= 0x5A) || (b1 >= 0x61 && b1 <= 0x7A)) p1 = 0;
  else if ((b1 >= 0x30 && b1 <= 0x39) || b1 == 0x2E || b1 == 0x2C) p1 = 1;
  else if (b1 <= 1) p1 = 2 + (int)b1;
  else if (b1 <= 15) p1 = 4;
  else if (b1 >= 241 && b1 <= 254) p1 = 5;
  else if (b1 == 255) p1 = 6;
  else p1 = 7;
  if ((b2 >= 0x41 && b2 <= 0x5A) || (b2 >= 0x61 && b2 <= 0x7A)) p2 = 0;
  else if ((b2 >= 0x30 && b2 <= 0x39) || b2 == 0x2E || b2 == 0x2C) p2 = 1;
  else if (b2 <= 15) p2 = 2;
  else if (b2 >= 241) p2 = 3;
  else p2 = 4;
  return 1 + p1 + 8 * p2;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI

extern "C" {

// Native scratch accounting ABI (read/reset by jxl_oxide_tpu.native so the
// Python AllocTracker's budget covers C++-side scratch too).
void jxlhost_mem_stats(i64* cur, i64* peak) {
  *cur = g_mem_cur.load(std::memory_order_relaxed);
  *peak = g_mem_peak.load(std::memory_order_relaxed);
}
void jxlhost_mem_set_limit(i64 limit) {
  g_mem_limit.store(limit, std::memory_order_relaxed);
}
void jxlhost_mem_reset_peak() {
  g_mem_peak.store(g_mem_cur.load(std::memory_order_relaxed),
                   std::memory_order_relaxed);
}

#ifdef JXL_PROF
void jxlhost_prof_stats(u64* cycles, u64* calls) {
  for (int i = 0; i < PROF_N; i++) {
    cycles[i] = g_prof_cycles[i];
    calls[i] = g_prof_calls[i];
  }
}
void jxlhost_prof_reset() {
  for (int i = 0; i < PROF_N; i++) g_prof_cycles[i] = g_prof_calls[i] = 0;
}
#endif

// Decode one modular sub-stream: all channels sharing one entropy stream.
// Returns 0 on success; >0 error codes. Updates *bit_pos.
//
// spec_ints layout: see python serializer (native/__init__.py).
int jxlhost_decode_modular(
    const u8* data, u64 data_len_bytes, u64* bit_pos,
    // decoder spec
    const i32* spec_header,     // [10]
    const i32* cluster_map,
    const i32* cfgs,            // [num_clusters*3]
    const i32* ans_meta,        // [num_clusters*2]: (log_bucket_size, offset)
    const i32* ans_blob,        // concatenated dist/alias arrays
    const i32* pfx_meta,        // [num_clusters*2]: (max_len, offset)
    const i32* pfx_blob,        // concatenated table_sym/table_len
    // channels
    i32 num_channels,
    void** chan_bufs, const i64* chan_strides,
    const i32* chan_dims,       // [num_channels*2]: (width, height)
    const TreeNode** trees, const i32* tree_meta,  // [num_channels*2]: (len, need_wp)
    const i32* prev_counts,     // [num_channels]
    const i32* prev_offsets,    // [num_channels] offsets into flat arrays
    const void* const* prev_bufs_flat,
    const i64* prev_strides_flat,
    i32 dist_multiplier,
    const i32* wp_params,       // [11]
    i32 sample_is16             // narrow (i16) buffers (sample.rs:4-36)
) {
  SpecHolder holder;
  holder.build(spec_header, cluster_map, cfgs, ans_meta, ans_blob, pfx_meta,
               pfx_blob);

  BitReader br{data, data_len_bytes * 8, *bit_pos};
  DecoderState dec;
  dec.spec = &holder.spec;
  dec.br = &br;
  dec.begin();

  WpParams wpp;
  wpp.p1 = wp_params[0]; wpp.p2 = wp_params[1];
  wpp.p3a = wp_params[2]; wpp.p3b = wp_params[3]; wpp.p3c = wp_params[4];
  wpp.p3d = wp_params[5]; wpp.p3e = wp_params[6];
  for (int i = 0; i < 4; i++) wpp.w[i] = wp_params[7 + i];

  std::vector<ChannelDesc> chans(num_channels);
  for (int c = 0; c < num_channels; c++) {
    ChannelDesc& cd = chans[c];
    cd.buf = chan_bufs[c];
    cd.stride = chan_strides[c];
    cd.width = chan_dims[c * 2];
    cd.height = chan_dims[c * 2 + 1];
    cd.tree = trees[c];
    cd.tree_len = tree_meta[c * 2];
    cd.need_wp = tree_meta[c * 2 + 1];
    cd.num_prev = prev_counts[c];
    cd.prev_bufs = prev_bufs_flat + prev_offsets[c];
    cd.prev_strides = prev_strides_flat + prev_offsets[c];
    cd.is16 = sample_is16;
  }

  int ret = decode_modular_stream_core(dec, br, chans.data(), num_channels,
                                       dist_multiplier, wpp);
  *bit_pos = br.pos;
  return ret;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// JPEG bitstream reconstruction: per-scan Huffman re-encode
// (jxl-jbr reconstruct.rs process_scan + bit_writer.rs). The Python side
// parses the jbrd header and emits all markers; this runs the per-block
// hot loop of one SOS scan (sequential, progressive-first and
// progressive-refinement) and returns the entropy-coded bytes.

namespace {

struct JbrWriter {
  std::vector<u8> out;
  u64 buf = 0;
  int valid = 0;

  inline void emit_word(u64 w, int nbytes) {
    for (int i = 0; i < nbytes; i++) {
      u8 b = (u8)(w >> (56 - 8 * i));
      out.push_back(b);
      if (b == 0xFF) out.push_back(0);  // JPEG byte stuffing
    }
  }
  inline void write_huffman(u64 bits, int length) {
    buf |= bits >> valid;
    valid += length;
    if (valid >= 64) {
      int extra = valid - 64;
      u64 w = buf;
      valid = extra;
      int sh = length - extra;
      buf = sh < 64 ? (bits << sh) : 0;
      emit_word(w, 8);
    }
  }
  inline void write_raw(u64 bits, int length) {
    if (length == 0) return;
    write_huffman(bits << (64 - length), length);
  }
  inline int padding_bits() const { return (8 - valid % 8) % 8; }
  void finalize() {
    int nbytes = (valid + 7) / 8;
    if (nbytes) emit_word(buf, nbytes);
    buf = 0;
    valid = 0;
  }
};

struct JbrHuff {
  const u64* bits;  // [256] MSB-aligned code bits
  const i32* lens;  // [256] code lengths (0 = no code)
};

struct JbrScanState {
  JbrWriter bw;
  std::vector<i32> dc_pred;
  i64 eobrun = 0;
  JbrHuff last_ac{nullptr, nullptr};
  bool last_ac_set = false;
  std::vector<std::pair<u64, int>> refine_bits;
  int rst_m = 0;
  int err = 0;

  inline i32 update_dc_pred(int ci, i32 coeff) {
    int16_t diff = (int16_t)(coeff - dc_pred[ci]);  // wrapping i16
    dc_pred[ci] = coeff;
    return (i32)diff;
  }
  inline void huff(const JbrHuff& t, int sym) {
    i32 len = t.lens[sym];
    if (len == 0) { err = 1; return; }
    bw.write_huffman(t.bits[sym], len);
  }
  void emit_eobrun() {
    if (eobrun == 0 || err) return;
    int eobn = 63 - __builtin_clzll((u64)eobrun);
    huff(last_ac, (eobn << 4));
    if (err) return;
    bw.write_raw((u64)eobrun & ((1ull << eobn) - 1), eobn);
    eobrun = 0;
    for (auto& rb : refine_bits) bw.write_raw(rb.first, rb.second);
    refine_bits.clear();
  }
  int flush(const u8* pad_data, u64 pad_len_bits, u64* pad_pos) {
    emit_eobrun();
    if (err) return err;
    int pad = bw.padding_bits();
    if (pad) {
      u64 bits;
      if (pad_data != nullptr) {
        if (*pad_pos + (u64)pad > pad_len_bits) return 3;
        BitReader pr{pad_data, pad_len_bits, *pad_pos};
        bits = pr.read(pad);
        *pad_pos = pr.pos;
      } else {
        bits = (1ull << pad) - 1;
      }
      bw.write_raw(bits, pad);
    }
    bw.finalize();
    return 0;
  }
};

inline int jbr_bitlen(i32 v) { return v ? 32 - __builtin_clz((u32)v) : 0; }

// shared AC run-length encode; returns trailing zero count (or -1 on err)
template <bool PROG>
static int jbr_encode_ac_run(JbrScanState& st, const JbrHuff& ac_table,
                             const i32* ac, int n, i32 ezr) {
  int i = 0;
  for (;;) {
    int j = i;
    while (j < n && ac[j] == 0) j++;
    if (j >= n) break;
    if (PROG) st.emit_eobrun();
    int run = j - i;
    i32 coeff = ac[j];
    i = j + 1;
    while (run >= 16) {
      st.huff(ac_table, 0xF0);
      run -= 16;
    }
    i32 mag;
    u32 raw;
    if (coeff < 0) {
      mag = -coeff;
      raw = (u32)(~mag) & 0xFFFF;
    } else {
      mag = coeff;
      raw = (u32)coeff;
    }
    int bitlen = jbr_bitlen(mag);
    st.huff(ac_table, (run << 4) | bitlen);
    st.bw.write_raw(raw & ((1u << bitlen) - 1), bitlen);
    if (st.err) return -1;
  }
  int num_zeros = n - i;
  if (ezr > 0) {
    if (PROG) st.emit_eobrun();
    for (i32 k = 0; k < ezr; k++) st.huff(ac_table, 0xF0);
    num_zeros -= ezr * 16;
  }
  return st.err ? -1 : num_zeros;
}

static void jbr_seq_block(JbrScanState& st, int ci, const JbrHuff& dc_table,
                          const JbrHuff& ac_table, i32 dc, const i32* ac,
                          int n, i32 ezr) {
  i32 diff = st.update_dc_pred(ci, dc);
  bool neg = diff < 0;
  i32 mag = neg ? -diff : diff;
  int bitlen = jbr_bitlen(mag);
  u32 raw = neg ? (u32)(-mag - 1) & 0xFFFF : (u32)mag;
  st.huff(dc_table, bitlen);
  st.bw.write_raw(raw & ((1u << bitlen) - 1), bitlen);
  int num_zeros = jbr_encode_ac_run<false>(st, ac_table, ac, n, ezr);
  if (num_zeros > 0) st.huff(ac_table, 0);
}

static void jbr_prog_first_block(JbrScanState& st, int ci,
                                 const JbrHuff& dc_table,
                                 const JbrHuff& ac_table, bool has_dc, i32 dc,
                                 const i32* ac, int n, i32 ezr) {
  if (has_dc) {
    i32 diff = st.update_dc_pred(ci, dc);
    bool neg = diff < 0;
    i32 mag = neg ? -diff : diff;
    int bitlen = jbr_bitlen(mag);
    u32 raw = neg ? (u32)(-mag - 1) & 0xFFFF : (u32)mag;
    st.emit_eobrun();
    st.huff(dc_table, bitlen);
    st.bw.write_raw(raw & ((1u << bitlen) - 1), bitlen);
  }
  int num_zeros = jbr_encode_ac_run<true>(st, ac_table, ac, n, ezr);
  if (st.eobrun == 0) {
    st.last_ac = ac_table;
    st.last_ac_set = true;
  }
  if (num_zeros > 0) {
    st.eobrun++;
    if (st.eobrun >= 32767) st.emit_eobrun();
  }
}

static void jbr_prog_refine_block(JbrScanState& st, const JbrHuff& ac_table,
                                  bool has_dc, i32 dc, const i32* ac, int n,
                                  i32 ezr) {
  if (has_dc) {
    st.emit_eobrun();
    st.bw.write_raw((u32)dc & 1, 1);
  }
  int pos = 0;
  for (;;) {
    int nonzero_idx = -1;
    for (int i = pos; i < n; i++)
      if (ac[i] == 1 || ac[i] == -1) { nonzero_idx = i; break; }
    if (nonzero_idx < 0) break;
    st.emit_eobrun();
    int zero_runs = 0;
    u64 ref_bits = 0;
    int ref_len = 0;
    for (int i = pos; i < nonzero_idx; i++) {
      i32 c = ac[i];
      if (c == 0) {
        zero_runs++;
        if (zero_runs == 16) {
          st.huff(ac_table, 0xF0);
          st.bw.write_raw(ref_bits, ref_len);
          zero_runs = 0;
          ref_len = 0;
          ref_bits = 0;
        }
      } else {
        ref_bits = (ref_bits << 1) | (u64)(c & 1);
        ref_len++;
      }
    }
    i32 coeff = ac[nonzero_idx];
    pos = nonzero_idx + 1;
    u32 bit = coeff == 1 ? 1 : 0;
    st.huff(ac_table, (zero_runs << 4) | 1);
    st.bw.write_raw(bit, 1);
    st.bw.write_raw(ref_bits, ref_len);
    if (st.err) return;
  }

  i32 remaining_zrl = ezr > 0 ? ezr : 0;
  if (remaining_zrl > 0) {
    st.emit_eobrun();
    if (ac_table.lens[0xF0] == 0) { st.err = 1; return; }  // eager lookup
  }

  int zero_runs = 0;
  u64 ref_bits = 0;
  int ref_len = 0;
  for (int i = pos; i < n; i++) {
    i32 c = ac[i];
    if (c == 0) {
      zero_runs++;
      if (remaining_zrl > 0 && zero_runs == 16) {
        st.huff(ac_table, 0xF0);
        st.bw.write_raw(ref_bits, ref_len);
        zero_runs = 0;
        ref_len = 0;
        remaining_zrl--;
      }
    } else {
      ref_bits = (ref_bits << 1) | (u64)(c & 1);
      ref_len++;
    }
  }
  for (i32 k = 0; k < remaining_zrl; k++) {
    st.huff(ac_table, 0xF0);
    st.bw.write_raw(ref_bits, ref_len);
    zero_runs = 0;
    ref_len = 0;
  }
  if (st.eobrun == 0) {
    st.last_ac = ac_table;
    st.last_ac_set = true;
  }
  if (zero_runs > 0 || ref_len > 0) {
    st.eobrun++;
    st.refine_bits.emplace_back(ref_bits, ref_len);
    if (st.eobrun >= 32767) st.emit_eobrun();
  }
}

}  // namespace

extern "C" {

void jxlhost_buf_free(u8* p) { free(p); }

// One SOS scan. comp_meta per comp (10 i64s): dc_offset, hs, vs,
// lf_h, lf_w, lf_stride, hf_h, hf_w, hf_stride, unused.
// plane_ptrs per comp: [lf_plane (i32), hf_plane (i32)].
// huff arrays per comp: [dc_bits, ac_bits] / [dc_lens, ac_lens]
// (nullptr = empty table -> error 1 if used).
// Returns 0 ok, 1 missing huffman code, 3 padding bits exhausted.
int jxlhost_jbr_encode_scan(
    i32 n_comps, const int64_t* comp_meta, const void* const* plane_ptrs,
    const u64* const* huff_bits, const i32* const* huff_lens,
    i32 scan_type, i32 has_dc, i32 ss, i32 se, i32 al,
    i32 w8, i32 h8, i32 restart_interval,
    const int64_t* reset_points, int64_t n_reset,
    const int64_t* ezr_idx, const i32* ezr_n, int64_t n_ezr,
    const i32* nat8_xy,  // [64*2] (x, y) pairs, natural order
    const u8* padding_bits, u64 padding_len_bits, u64* padding_pos,
    u8** out_ptr, u64* out_len,
    i32 n_threads
) {
  static const u64 EMPTY_BITS[256] = {0};
  static const i32 EMPTY_LENS[256] = {0};

  int n_ac = se - ss;
  int64_t total_mcus = (int64_t)w8 * h8;
  int64_t blocks_per_mcu = 0;
  for (i32 ci = 0; ci < n_comps; ci++) {
    const int64_t* m = comp_meta + (int64_t)ci * 10;
    blocks_per_mcu += m[1] * m[2];
  }

  // Encode MCUs [mcu_begin, mcu_end) into `st` with NO restart handling
  // (the caller places restart boundaries between ranges). block_idx
  // starts at mcu_begin * blocks_per_mcu; reset/ezr cursors re-seek per
  // call (tiny lists).
  auto encode_mcus = [&](JbrScanState& st, int64_t mcu_begin,
                         int64_t mcu_end) {
    int64_t block_idx = mcu_begin * blocks_per_mcu;
    int64_t reset_i = 0, ezr_i = 0;
    i32 ac[64];
    for (int64_t mcu_idx = mcu_begin; mcu_idx < mcu_end && !st.err;
         mcu_idx++) {
      i32 x8 = (i32)(mcu_idx % w8);
      i32 y8 = (i32)(mcu_idx / w8);
      for (i32 ci = 0; ci < n_comps; ci++) {
        const int64_t* m = comp_meta + (int64_t)ci * 10;
        i32 dco = (i32)m[0];
        i32 hs = (i32)m[1], vs = (i32)m[2];
        i32 lf_h = (i32)m[3], lf_w = (i32)m[4];
        int64_t lf_stride = m[5];
        i32 hf_h = (i32)m[6], hf_w = (i32)m[7];
        int64_t hf_stride = m[8];
        const i32* lfp = (const i32*)plane_ptrs[ci * 2];
        const i32* hfp = (const i32*)plane_ptrs[ci * 2 + 1];
        JbrHuff dc_t{huff_bits[ci * 2] ? huff_bits[ci * 2] : EMPTY_BITS,
                     huff_lens[ci * 2] ? huff_lens[ci * 2] : EMPTY_LENS};
        JbrHuff ac_t{huff_bits[ci * 2 + 1] ? huff_bits[ci * 2 + 1]
                                           : EMPTY_BITS,
                     huff_lens[ci * 2 + 1] ? huff_lens[ci * 2 + 1]
                                           : EMPTY_LENS};
        if (!st.last_ac_set) {
          st.last_ac = ac_t;
          st.last_ac_set = true;
        }
        for (i32 dy8 = 0; dy8 < vs; dy8++) {
          i32 y_dc = y8 * vs + dy8;
          for (i32 dx8 = 0; dx8 < hs; dx8++) {
            i32 x_dc = x8 * hs + dx8;
            i32 dc_coeff = 0;
            if (has_dc) {
              i32 qy = y_dc < lf_h - 1 ? y_dc : lf_h - 1;
              i32 qx = x_dc < lf_w - 1 ? x_dc : lf_w - 1;
              if (qy < 0) qy = 0;  // zero-size plane guard
              if (qx < 0) qx = 0;
              i64 v = lf_h > 0 && lf_w > 0
                          ? (i64)lfp[(int64_t)qy * lf_stride + qx] - dco
                          : -(i64)dco;
              if (v < -2047) v = -2047;
              if (v > 2047) v = 2047;
              dc_coeff = v >= 0 ? (i32)(v >> al) : -(i32)((-v) >> al);
            }
            i32 y0 = y_dc * 8, x0 = x_dc * 8;
            i32 bh = hf_h - y0;
            if (bh > 8) bh = 8;
            i32 bw_ = hf_w - x0;
            if (bw_ > 8) bw_ = 8;
            for (int k = 0; k < n_ac; k++) {
              i32 cx = nat8_xy[(ss + k) * 2];
              i32 cy = nat8_xy[(ss + k) * 2 + 1];
              i32 c = 0;
              if (cy < bh && cx < bw_)
                c = hfp[(int64_t)(y0 + cy) * hf_stride + (x0 + cx)];
              int16_t c16 = (int16_t)c;
              i32 cc = (i32)c16;
              ac[k] = cc < 0 ? -((-cc) >> al) : (cc >> al);
            }
            i32 ezr = 0;
            while (ezr_i < n_ezr && ezr_idx[ezr_i] < block_idx) ezr_i++;
            if (ezr_i < n_ezr && ezr_idx[ezr_i] == block_idx)
              ezr = ezr_n[ezr_i];
            while (reset_i < n_reset && reset_points[reset_i] < block_idx)
              reset_i++;
            if (reset_i < n_reset && reset_points[reset_i] == block_idx)
              st.emit_eobrun();
            if (scan_type == 0) {
              jbr_seq_block(st, ci, dc_t, ac_t, dc_coeff, ac, n_ac, ezr);
            } else if (scan_type == 1) {
              jbr_prog_first_block(st, ci, dc_t, ac_t, has_dc, dc_coeff,
                                   ac, n_ac, ezr);
            } else {
              jbr_prog_refine_block(st, ac_t, has_dc, dc_coeff, ac, n_ac,
                                    ezr);
            }
            block_idx++;
            if (st.err) return;
          }
        }
      }
    }
  };

  int64_t S = restart_interval > 0
                  ? (total_mcus + restart_interval - 1) / restart_interval
                  : 1;
  // Segment-parallel encode (VERDICT r4 item 10): restart segments are
  // independent in a SEQUENTIAL scan (DC prediction and all entropy
  // state reset at every RSTm). Workers encode segments into private
  // writers; the stitch pass then byte-appends each segment, consumes
  // its padding bits from the stream IN ORDER (the padding count is the
  // segment's bit length mod 8 — only known after encode), and emits
  // the RSTm marker. Progressive scans keep the single-threaded path
  // (EOB-run state interacts with restarts).
  bool parallel = scan_type == 0 && restart_interval > 0 && S > 1 &&
                  n_threads > 1;
  if (parallel) {
    std::vector<JbrScanState> segs(S);
    std::atomic<int64_t> next{0};
    auto worker = [&]() {
      for (;;) {
        int64_t s = next.fetch_add(1, std::memory_order_relaxed);
        if (s >= S) break;
        JbrScanState& stv = segs[s];
        stv.dc_pred.assign(n_comps, 0);
        int64_t b = s * (int64_t)restart_interval;
        int64_t e = b + restart_interval;
        if (e > total_mcus) e = total_mcus;
        encode_mcus(stv, b, e);
      }
    };
    i32 nt = n_threads < (i32)S ? n_threads : (i32)S;
    worker_pool().run(nt, worker);
    JbrScanState master;
    for (int64_t s = 0; s < S; s++) {
      JbrScanState& stv = segs[s];
      if (stv.err) return stv.err;
      // byte-align the segment with padding bits from the stream
      int fr = stv.flush(padding_bits, padding_len_bits, padding_pos);
      if (fr) return fr;
      if (stv.err) return stv.err;
      master.bw.out.insert(master.bw.out.end(), stv.bw.out.begin(),
                           stv.bw.out.end());
      std::vector<u8>().swap(stv.bw.out);
      if (s + 1 < S) {
        master.bw.out.push_back(0xFF);
        master.bw.out.push_back((u8)(0xD0 + (int)(s % 8)));
      }
    }
    u8* p = (u8*)malloc(master.bw.out.size() ? master.bw.out.size() : 1);
    if (!p) return 7;
    if (!master.bw.out.empty())
      memcpy(p, master.bw.out.data(), master.bw.out.size());
    *out_ptr = p;
    *out_len = master.bw.out.size();
    return 0;
  }

  JbrScanState st;
  st.dc_pred.assign(n_comps, 0);
  for (int64_t s = 0; s < S; s++) {
    if (s != 0) {
      // restart: reset DC prediction, flush, emit RSTm
      for (auto& d : st.dc_pred) d = 0;
      int fr = st.flush(padding_bits, padding_len_bits, padding_pos);
      if (fr) return fr;
      if (st.err) return st.err;
      st.bw.out.push_back(0xFF);
      st.bw.out.push_back((u8)(0xD0 + st.rst_m));
      st.rst_m = (st.rst_m + 1) % 8;
    }
    int64_t b = restart_interval > 0 ? s * (int64_t)restart_interval : 0;
    int64_t e = restart_interval > 0 ? b + restart_interval : total_mcus;
    if (e > total_mcus) e = total_mcus;
    encode_mcus(st, b, e);
    if (st.err) return st.err;
  }
  int fr = st.flush(padding_bits, padding_len_bits, padding_pos);
  if (fr) return fr;
  if (st.err) return st.err;

  u8* p = (u8*)malloc(st.bw.out.size() ? st.bw.out.size() : 1);
  if (!p) return 7;
  if (!st.bw.out.empty()) memcpy(p, st.bw.out.data(), st.bw.out.size());
  *out_ptr = p;
  *out_len = st.bw.out.size();
  return 0;
}

// Inverse horizontal squeeze (jxl-modular squeeze.rs inverse_h_i32_base):
// sequential recurrence in x, independent rows. Strides are in elements
// (callers pass transposed views for the vertical direction). All sample
// arithmetic wraps at i32 like the reference.
// Wrapping<i32> arithmetic exactly as the reference (squeeze.rs
// tendency_i32): every multiply/add/sub wraps at i32, division is plain
// truncating i32 division, comparisons see the wrapped values.
static inline i32 squeeze_tendency(i32 a, i32 b, i32 c) {
  u32 ua = (u32)a, ub = (u32)b, uc = (u32)c;
  if (a >= b && b >= c) {
    i32 x = (i32)(4u * ua - 3u * uc - ub + 6u) / 12;
    i32 two_ab = (i32)(2u * (ua - ub));
    if ((i32)((u32)x - ((u32)x & 1u)) > two_ab)
      x = (i32)((u32)two_ab + 1u);
    i32 two_bc = (i32)(2u * (ub - uc));
    if ((i32)((u32)x + ((u32)x & 1u)) > two_bc) x = two_bc;
    return x;
  }
  if (a <= b && b <= c) {
    i32 x = (i32)(4u * ua - 3u * uc - ub - 6u) / 12;
    i32 two_ab = (i32)(2u * (ua - ub));
    if ((i32)((u32)x + ((u32)x & 1u)) < two_ab)
      x = (i32)((u32)two_ab - 1u);
    i32 two_bc = (i32)(2u * (ub - uc));
    if ((i32)((u32)x - ((u32)x & 1u)) < two_bc) x = two_bc;
    return x;
  }
  return 0;
}

extern "C" int jxlhost_inverse_squeeze_h(
    const i32* avg, int64_t avg_rs, int64_t avg_cs,
    const i32* res, int64_t res_rs, int64_t res_cs,
    i32 h, i32 aw, i32 rw,
    i32* out, int64_t out_rs, int64_t out_cs
) {
  i32 w = aw + rw;
  for (i32 y = 0; y < h; y++) {
    const i32* arow = avg + (int64_t)y * avg_rs;
    const i32* rrow = res + (int64_t)y * res_rs;
    i32* orow = out + (int64_t)y * out_rs;
    if (rw == 0) {
      for (i32 x = 0; x < aw; x++) orow[x * out_cs] = arow[x * avg_cs];
      continue;
    }
    i32 left = arow[0];
    for (i32 x = 0; x < rw; x++) {
      i32 a = arow[(int64_t)x * avg_cs];
      i32 next = x + 1 < aw ? arow[(int64_t)(x + 1) * avg_cs] : a;
      i32 diff = (i32)((u32)rrow[(int64_t)x * res_cs] +
                       (u32)squeeze_tendency(left, a, next));
      i32 first = (i32)((u32)a + (u32)(diff / 2));
      i32 second = (i32)((u32)first - (u32)diff);
      orow[(int64_t)(2 * x) * out_cs] = first;
      orow[(int64_t)(2 * x + 1) * out_cs] = second;
      left = second;
    }
    if (w % 2 == 1) orow[(int64_t)(w - 1) * out_cs] = arow[(int64_t)(aw - 1) * avg_cs];
  }
  return 0;
}

// Single-pass sparse extraction for the coefficient upload: counts
// nonzeros and (when a capacity is given) writes their flat indices and
// int16/int32 values. Replaces a numpy flatnonzero + fancy-index +
// astype chain that re-scans hundreds of MB per large frame.
// Returns the nonzero count. If count > capacity, only capacity entries
// are written (caller re-sizes and retries or goes dense).
// max_abs_out receives the max |value| (for int16 eligibility).
int64_t jxlhost_sparse_extract_i32(
    const i32* in, int64_t n, int64_t capacity,
    i32* out_idx, i32* out_val, i32* max_abs_out
) {
  int64_t cnt = 0;
  i32 max_abs = 0;
  for (int64_t i = 0; i < n; i++) {
    i32 v = in[i];
    if (v != 0) {
      i32 a = v < 0 ? (v == INT32_MIN ? INT32_MAX : -v) : v;
      if (a > max_abs) max_abs = a;
      if (cnt < capacity) {
        out_idx[cnt] = (i32)i;
        out_val[cnt] = v;
      }
      cnt++;
    }
  }
  *max_abs_out = max_abs;
  return cnt;
}

// Place varblocks onto the LF-group block grid
// (jxl-vardct hf_metadata.rs BlockInfo construction): row-major scan,
// skip occupied cells, each entry claims a dw x dh rectangle. Fills
// sel_grid/mul_grid at origins and mul_full over the coverage (callers
// derive the EPF sigma grid from mul_full vectorized). Returns 0 ok,
// 1 invalid transform type, 2 non-positive HfMul, 3 crosses group
// border, 4 out of grid, 5 overlap, 6 grid not filled.
int jxlhost_place_varblocks(
    const i32* info, i64 n_raw,   // [2, n_raw]: row 0 = sel, row 1 = mul-1
    i32 bh, i32 bw, i32 group_blocks,
    const i32* sizes, i32 num_types,  // [num_types*2]: (dw, dh)
    signed char* sel_grid,            // [bh*bw] pre-filled -1
    i32* mul_grid,                    // [bh*bw] zeros
    i32* mul_full                     // [bh*bw] zeros
) {
  i64 idx = 0;
  for (i32 y = 0; y < bh; y++) {
    for (i32 x = 0; x < bw;) {
      if (mul_full[(i64)y * bw + x]) { x++; continue; }
      if (idx >= n_raw) return 6;
      i32 sel = info[idx];
      i64 mul = (i64)info[n_raw + idx] + 1;
      if (sel < 0 || sel >= num_types) return 1;
      if (mul <= 0 || mul > 0x7FFFFFFF) return 2;
      i32 dw = sizes[sel * 2], dh = sizes[sel * 2 + 1];
      if ((x % group_blocks) + dw > group_blocks ||
          (y % group_blocks) + dh > group_blocks)
        return 3;
      if (x + dw > bw || y + dh > bh) return 4;
      for (i32 yy = y; yy < y + dh; yy++)
        for (i32 xx = x; xx < x + dw; xx++)
          if (mul_full[(i64)yy * bw + xx]) return 5;
      for (i32 yy = y; yy < y + dh; yy++)
        for (i32 xx = x; xx < x + dw; xx++)
          mul_full[(i64)yy * bw + xx] = (i32)mul;
      sel_grid[(i64)y * bw + x] = (signed char)sel;
      mul_grid[(i64)y * bw + x] = (i32)mul;
      idx++;
      x += dw;
    }
  }
  return 0;
}

// Decode MANY independent modular sub-streams (LF-group / pass-group
// sections of a modular frame) in one call, fanning out on a native
// thread pool — the modular twin of jxlhost_decode_hf_groups_batch
// (reference: per-group pool.scope, jxl-render/src/modular.rs:36-130).
//
// Channels of all sections are flattened; section k owns
// chan range [sec_chan_start[k], sec_chan_start[k]+sec_chan_count[k]).
// Each section names its decoder spec via sec_spec[k] (index into the
// n_specs spec pointer table; sections with local trees still share this
// entry as long as the Python side serialized their spec). Per-section
// wp_params are 11 i32 each. sec_ret[k] gets the section's return code
// and sec_bit_pos[k] its final bit position.
int jxlhost_decode_modular_batch(
    // decoder specs
    i32 n_specs,
    const i32* const* spec_arrs,     // [n_specs*7], layout as single entry
    // flattened channels
    void** chan_bufs, const i64* chan_strides, const i32* chan_dims,
    const TreeNode** trees, const i32* tree_meta,
    const i32* prev_counts, const i32* prev_offsets,
    const void* const* prev_bufs_flat, const i64* prev_strides_flat,
    // sections
    i32 n_sections,
    const u8* const* sec_data, const u64* sec_len_bytes, u64* sec_bit_pos,
    const i32* sec_spec,
    const i32* sec_chan_start, const i32* sec_chan_count,
    const i32* sec_dist_mul,
    const i32* sec_wp_params,        // [n_sections*11]
    const i32* sec_is16,
    i32 n_threads,
    i32* sec_ret
) {
  std::vector<SpecHolder> holders(n_specs);
  for (i32 s = 0; s < n_specs; s++)
    holders[s].build(spec_arrs[s * 7], spec_arrs[s * 7 + 1],
                     spec_arrs[s * 7 + 2], spec_arrs[s * 7 + 3],
                     spec_arrs[s * 7 + 4], spec_arrs[s * 7 + 5],
                     spec_arrs[s * 7 + 6]);

  auto run_section = [&](i32 k) -> int {
    BitReader br{sec_data[k], sec_len_bytes[k] * 8, sec_bit_pos[k]};
    DecoderState dec;
    dec.spec = &holders[sec_spec[k]].spec;
    dec.br = &br;
    dec.begin();

    const i32* wpp_a = sec_wp_params + (i64)k * 11;
    WpParams wpp;
    wpp.p1 = wpp_a[0]; wpp.p2 = wpp_a[1];
    wpp.p3a = wpp_a[2]; wpp.p3b = wpp_a[3]; wpp.p3c = wpp_a[4];
    wpp.p3d = wpp_a[5]; wpp.p3e = wpp_a[6];
    for (int i = 0; i < 4; i++) wpp.w[i] = wpp_a[7 + i];

    i32 c0 = sec_chan_start[k], nc = sec_chan_count[k];
    std::vector<ChannelDesc> chans(nc);
    for (i32 c = 0; c < nc; c++) {
      ChannelDesc& cd = chans[c];
      i32 gc = c0 + c;
      cd.buf = chan_bufs[gc];
      cd.stride = chan_strides[gc];
      cd.width = chan_dims[gc * 2];
      cd.height = chan_dims[gc * 2 + 1];
      cd.tree = trees[gc];
      cd.tree_len = tree_meta[gc * 2];
      cd.need_wp = tree_meta[gc * 2 + 1];
      cd.num_prev = prev_counts[gc];
      cd.prev_bufs = prev_bufs_flat + prev_offsets[gc];
      cd.prev_strides = prev_strides_flat + prev_offsets[gc];
      cd.is16 = sec_is16[k];
    }
    int ret = decode_modular_stream_core(dec, br, chans.data(), nc,
                                         sec_dist_mul[k], wpp);
    sec_bit_pos[k] = br.pos;
    return ret;
  };

  // Interleaved pair state: one cursor per section, channel descriptors
  // and WP params owned alongside (the cursor holds raw pointers).
  struct SecState {
    i32 k = -1;
    std::vector<ChannelDesc> chans;
    WpParams wpp;
    ModCursor cur;
    bool done = true;
  };

  auto sec_begin = [&](SecState& ss, i32 k) {
    ss.k = k;
    ss.done = false;
    // LZ77/prefix streams take the reference single-stream core (which
    // includes the RLE fast-lossless path); the cursor stepper is
    // ANS-only
    const DecoderSpec& sp = holders[sec_spec[k]].spec;
    if (sp.lz77_enabled || sp.use_prefix) {
      sec_ret[k] = run_section(k);
      ss.done = true;
      return;
    }
    const i32* wpp_a = sec_wp_params + (i64)k * 11;
    ss.wpp.p1 = wpp_a[0]; ss.wpp.p2 = wpp_a[1];
    ss.wpp.p3a = wpp_a[2]; ss.wpp.p3b = wpp_a[3]; ss.wpp.p3c = wpp_a[4];
    ss.wpp.p3d = wpp_a[5]; ss.wpp.p3e = wpp_a[6];
    for (int i = 0; i < 4; i++) ss.wpp.w[i] = wpp_a[7 + i];
    i32 c0 = sec_chan_start[k], nc = sec_chan_count[k];
    ss.chans.assign(nc, ChannelDesc{});
    for (i32 c = 0; c < nc; c++) {
      ChannelDesc& cd = ss.chans[c];
      i32 gc = c0 + c;
      cd.buf = chan_bufs[gc];
      cd.stride = chan_strides[gc];
      cd.width = chan_dims[gc * 2];
      cd.height = chan_dims[gc * 2 + 1];
      cd.tree = trees[gc];
      cd.tree_len = tree_meta[gc * 2];
      cd.need_wp = tree_meta[gc * 2 + 1];
      cd.num_prev = prev_counts[gc];
      cd.prev_bufs = prev_bufs_flat + prev_offsets[gc];
      cd.prev_strides = prev_strides_flat + prev_offsets[gc];
      cd.is16 = sec_is16[k];
    }
    ModCursor& cu = ss.cur;
    cu.br = BitReader{sec_data[k], sec_len_bytes[k] * 8, sec_bit_pos[k]};
    cu.dec = DecoderState{};
    cu.dec.spec = &holders[sec_spec[k]].spec;
    cu.dec.br = &cu.br;
    cu.dec.begin();
    cu.chans = ss.chans.data();
    cu.nc = nc;
    cu.dm = sec_dist_mul[k];
    cu.wpp = &ss.wpp;
    cu.c = 0;
    cu.y = -1;
    cu.status = 1;
    cu.result = 0;
  };

  auto sec_finish = [&](SecState& ss) {
    sec_bit_pos[ss.k] = ss.cur.br.pos;
    sec_ret[ss.k] = ss.cur.result;
    ss.done = true;
  };

  // Bring the section to an active gradient run or completion.
  auto pump = [&](SecState& ss) {
    while (!ss.done) {
      if (ss.cur.status == 0) return;
      if (ss.cur.status == 1) {
        mod_advance(ss.cur);
        continue;
      }
      sec_finish(ss);
    }
  };

  std::atomic<i32> next_job{0};
  auto worker = [&]() {
    SecState A, B;
    // tiny sections (the global/meta stream is usually a few bytes)
    // would waste a pairing slot: their partner drains single-stream
    // almost immediately. Run them serially and pair only substantial
    // sections.
    auto next_substantial = [&]() -> i32 {
      for (;;) {
        i32 k = next_job.fetch_add(1, std::memory_order_relaxed);
        if (k >= n_sections) return k;
        if (sec_len_bytes[k] >= 256) return k;
        sec_ret[k] = run_section(k);
      }
    };
    for (;;) {
      i32 k1 = next_substantial();
      if (k1 >= n_sections) break;
      i32 k2 = next_substantial();
      if (k2 >= n_sections) {
        sec_ret[k1] = run_section(k1);
        break;
      }
      sec_begin(A, k1);
      sec_begin(B, k2);
      pump(A);
      pump(B);
      while (!A.done && !B.done) {
        mod_dual_dispatch(A.cur, B.cur);
        if (A.cur.status != 0) pump(A);
        if (B.cur.status != 0) pump(B);
      }
      SecState& R = A.done ? B : A;
      while (!R.done) {
        if (R.cur.status == 0) {
          if (R.cur.is16) mod_drain_run<int16_t>(R.cur);
          else mod_drain_run<i32>(R.cur);
        }
        pump(R);
      }
    }
  };

  auto worker_single = [&]() {
    for (;;) {
      i32 k = next_job.fetch_add(1, std::memory_order_relaxed);
      if (k >= n_sections) break;
      sec_ret[k] = run_section(k);
    }
  };

  // Pair only when sections comfortably outnumber workers (see the HF
  // batch: greedy two-job claiming would otherwise idle threads).
  i32 nt = (n_threads <= 1 || n_sections <= 1)
               ? 1
               : (n_threads < n_sections ? n_threads : n_sections);
  const bool pair_mode = n_sections >= 2 * nt;

  auto worker_any = [&]() {
    if (pair_mode) worker();
    else worker_single();
  };

  worker_pool().run(nt, worker_any);
  return 0;
}


// Decode the 41-context entropy-coded ICC byte stream
// (jxl-color icc/decode.rs). Returns 0 on success; fills out[0..enc_size).
int jxlhost_decode_icc(
    const u8* data, u64 data_len_bytes, u64* bit_pos,
    const i32* spec_header, const i32* cluster_map, const i32* cfgs,
    const i32* ans_meta, const i32* ans_blob,
    const i32* pfx_meta, const i32* pfx_blob,
    u64 enc_size, u8* out) {
  SpecHolder holder;
  holder.build(spec_header, cluster_map, cfgs, ans_meta, ans_blob, pfx_meta,
               pfx_blob);
  BitReader br{data, data_len_bytes * 8, *bit_pos};
  DecoderState dec;
  dec.spec = &holder.spec;
  dec.br = &br;
  dec.begin();
  u32 b1 = 0, b2 = 0;
  for (u64 idx = 0; idx < enc_size; idx++) {
    int ctx = icc_context(idx, b1, b2);
    u32 sym = dec.read_varint_clustered(holder.spec.cluster_map[ctx], 0);
    if (dec.error) return 10 + dec.error;
    if (sym >= 256) return 3;
    out[idx] = (u8)sym;
    b2 = b1;
    b1 = sym;
  }
  if (br.pos > br.len_bits) return 4;  // consumed past end: truncated
  int fin = dec.finalize();
  *bit_pos = br.pos;
  return fin;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// HF coefficient decode (jxl-vardct hf_coeff.rs write_hf_coeff)

namespace {

const i32 COEFF_FREQ_CONTEXT[63] = {
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 15, 16, 16, 17,
    17, 18, 18, 19, 19, 20, 20, 21, 21, 22, 22, 23, 23, 23, 23, 24, 24, 24,
    24, 25, 25, 25, 25, 26, 26, 26, 26, 27, 27, 27, 27, 28, 28, 28, 28, 29,
    29, 29, 29, 30, 30, 30, 30};
const i32 COEFF_NUM_NONZERO_CONTEXT[63] = {
    0,   31,  62,  62,  93,  93,  93,  93,  123, 123, 123, 123, 152, 152,
    152, 152, 152, 152, 152, 152, 180, 180, 180, 180, 180, 180, 180, 180,
    180, 180, 180, 180, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206,
    206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206,
    206, 206, 206, 206, 206, 206, 206};

// fused (COEFF_NUM_NONZERO_CONTEXT[nzc] + COEFF_FREQ_CONTEXT[fi]) * 2,
// indexed (nzc << 6) | fi: one load replaces two loads + add + shift on
// the per-symbol chain of the interleaved HF runs
static u16 HF_CCTX2[63 * 64];
static bool hf_cctx2_init = []() {
  for (int nzc = 0; nzc < 63; nzc++)
    for (int fi = 0; fi < 63; fi++)
      HF_CCTX2[(nzc << 6) | fi] =
          (u16)((COEFF_NUM_NONZERO_CONTEXT[nzc] + COEFF_FREQ_CONTEXT[fi]) * 2);
  return true;
}();

// TransformType tables (dct_select.rs); [t][0]=bw, [t][1]=bh in blocks
const i32 SELECT_SIZE[27][2] = {
    {1,1},{1,1},{1,1},{1,1},{2,2},{4,4},{1,2},{2,1},{1,4},{4,1},{2,4},{4,2},
    {1,1},{1,1},{1,1},{1,1},{1,1},{1,1},{8,8},{4,8},{8,4},{16,16},{8,16},
    {16,8},{32,32},{16,32},{32,16}};
const i32 ORDER_ID_TBL[27] = {0,1,1,1,2,3,4,4,5,5,6,6,1,1,1,1,1,1,7,8,8,9,10,10,11,12,12};

inline bool need_transpose_tbl(int t) {
  switch (t) {
    case 1: case 2: case 3: case 12: case 13: case 14: case 15: case 16:
    case 17: return false;
    default: {
      i32 w = SELECT_SIZE[t][0], h = SELECT_SIZE[t][1];
      return h >= w;
    }
  }
}

}  // namespace

namespace {

// Frame-wide HF decode context shared by every pass-group section.
struct HfFrameCtx {
  const i32* qf_thresholds; i32 num_qf_thresholds;
  const i32* lf_thr[3]; const i32* lf_thr_counts;
  const i32* block_ctx_map; i32 num_block_clusters;
  const i32* hshifts; const i32* vshifts;
};

// Per-section geometry + IO (group grids, lf_quant views, output planes,
// per-pass coefficient orders).
struct HfGroupIo {
  const signed char* block_sel; const i32* block_mul;
  i32 grid_w, grid_h; i64 grid_stride;
  i32* const* lf_quant_ptrs; const i64* lf_quant_strides;
  i32* const* out_ptrs; const i64* out_strides;
  i32 coeff_shift;
  const i32* order_offsets; const i32* orders_blob; const i32* order_lengths;
};

// Core of write_hf_coeff (hf_coeff.rs:21-252) over one section. `dec`
// must already be begun on a BitReader positioned after the HF preset
// bits; ctx_offset = hfp * 495 * num_block_clusters.
int decode_hf_group_core(DecoderState& dec, const DecoderSpec& spec,
                         BitReader& br, i64 ctx_offset,
                         const HfFrameCtx& fc, const HfGroupIo& gp) {
  const i32* qf_thresholds = fc.qf_thresholds;
  i32 num_qf_thresholds = fc.num_qf_thresholds;
  const i32* const* lf_thr = fc.lf_thr;
  const i32* lf_thr_counts = fc.lf_thr_counts;
  const i32* block_ctx_map = fc.block_ctx_map;
  i32 num_block_clusters = fc.num_block_clusters;
  const i32* hshifts = fc.hshifts;
  const i32* vshifts = fc.vshifts;
  const signed char* block_sel = gp.block_sel;
  const i32* block_mul = gp.block_mul;
  i32 grid_w = gp.grid_w, grid_h = gp.grid_h;
  i64 grid_stride = gp.grid_stride;
  i32* const* lf_quant_ptrs = gp.lf_quant_ptrs;
  const i64* lf_quant_strides = gp.lf_quant_strides;
  i32* const* out_ptrs = gp.out_ptrs;
  const i64* out_strides = gp.out_strides;
  i32 coeff_shift = gp.coeff_shift;
  const i32* order_offsets = gp.order_offsets;
  const i32* orders_blob = gp.orders_blob;
  const i32* order_lengths = gp.order_lengths;

  i64 lf_idx_mul = (i64)(lf_thr_counts[0] + 1) * (lf_thr_counts[1] + 1) *
                   (lf_thr_counts[2] + 1);
  i64 hf_idx_mul = num_qf_thresholds + 1;
  bool has_lf_quant = lf_quant_ptrs[0] != nullptr;

  // per-channel non_zeros rows
  std::vector<i64> nzr[3];
  for (int c = 0; c < 3; c++) {
    i32 w = (grid_w + (1 << hshifts[c]) - 1) >> hshifts[c];
    nzr[c].assign(w, 0);
  }

  for (i32 y = 0; y < grid_h; y++) {
    for (i32 x = 0; x < grid_w; x++) {
      int sel = block_sel[(i64)y * grid_stride + x];
      if (sel < 0) continue;
      i64 qf = block_mul[(i64)y * grid_stride + x];
      i32 w8 = SELECT_SIZE[sel][0], h8 = SELECT_SIZE[sel][1];
      i32 num_blocks = w8 * h8;
      int num_blocks_log = 0;
      while ((1 << num_blocks_log) < num_blocks) num_blocks_log++;
      i32 order_id = ORDER_ID_TBL[sel];

      i64 lf_idx = 0;
      if (has_lf_quant) {
        const int cs[3] = {0, 2, 1};
        for (int k = 0; k < 3; k++) {
          int c = cs[k];
          lf_idx *= lf_thr_counts[c] + 1;
          i32 qx = x >> hshifts[c], qy = y >> vshifts[c];
          i32 q = lf_quant_ptrs[c][(i64)qy * lf_quant_strides[c] + qx];
          for (int t = 0; t < lf_thr_counts[c]; t++)
            if (q > lf_thr[c][t]) lf_idx++;
        }
      }
      i64 hf_idx = 0;
      for (int t = 0; t < num_qf_thresholds; t++)
        if (qf > qf_thresholds[t]) hf_idx++;

      for (int ci = 0; ci < 3; ci++) {
        i64 ch_idx = ci * 13 + order_id;
        int c = (int[]){1, 0, 2}[ci];
        int hs = hshifts[c], vs = vshifts[c];
        i32 sx = x >> hs, sy = y >> vs;
        if (hs || vs) {
          if ((sx << hs) != x || (sy << vs) != y) continue;
          if (block_sel[(i64)sy * grid_stride + sx] < 0) continue;
        }

        i64 idx = (ch_idx * hf_idx_mul + hf_idx) * lf_idx_mul + lf_idx;
        i32 block_ctx = block_ctx_map[idx];
        i64 predicted;
        if (sy == 0) predicted = sx == 0 ? 32 : nzr[c][sx - 1];
        else if (sx == 0) predicted = nzr[c][sx];
        else predicted = (nzr[c][sx] + nzr[c][sx - 1] + 1) >> 1;
        i64 nz_idx = predicted >= 8 ? 4 + predicted / 2 : predicted;
        i64 non_zeros_ctx = block_ctx + nz_idx * num_block_clusters;

        u32 non_zeros = dec.read_varint_clustered(
            spec.cluster_map[ctx_offset + non_zeros_ctx], 0);
        if (dec.error) return 10 + dec.error;
        if (non_zeros > (u32)(63 << num_blocks_log)) return 5;
        i64 nz_val = ((i64)non_zeros + num_blocks - 1) >> num_blocks_log;
        for (int dx = 0; dx < w8; dx++) nzr[c][sx + dx] = nz_val;
        if (non_zeros == 0) continue;

        i32* out = out_ptrs[c];
        i64 out_stride = out_strides[c];
        u32 is_prev_nonzero = non_zeros <= (u32)(num_blocks * 4) ? 1 : 0;
        bool transpose = need_transpose_tbl(sel);

        int oid3 = order_id * 3 + c;
        const i32* order = orders_blob + order_offsets[oid3];
        i32 order_len = order_lengths[oid3];

        i64 coeff_ctx_base = (i64)block_ctx * 458 + 37 * num_block_clusters;

        for (i32 oi = num_blocks; oi < order_len; oi++) {
          i64 nz_for_ctx = ((i64)non_zeros - 1) >> num_blocks_log;
          i64 fi = (oi - num_blocks) >> num_blocks_log;
          i64 coeff_ctx = (COEFF_NUM_NONZERO_CONTEXT[nz_for_ctx] +
                           COEFF_FREQ_CONTEXT[fi]) * 2 + is_prev_nonzero;
          if (coeff_ctx >= 458) return 6;
          u32 ucoeff = dec.read_varint_clustered(
              spec.cluster_map[ctx_offset + coeff_ctx_base + coeff_ctx], 0);
          if (dec.error) return 10 + dec.error;
          if (ucoeff == 0) {
            is_prev_nonzero = 0;
            continue;
          }
          i64 coeff = (i64)((u64)(i64)unpack_signed(ucoeff) << coeff_shift);
          i32 dx = order[oi * 2], dy = order[oi * 2 + 1];
          if (transpose) { i32 t = dx; dx = dy; dy = t; }
          i64 px = (i64)sx * 8 + dx;
          i64 py = (i64)sy * 8 + dy;
          out[py * out_stride + px] += (i32)coeff;
          is_prev_nonzero = 1;
          non_zeros--;
          if (non_zeros == 0) break;
        }
      }
    }
  }
  if (br.pos > br.len_bits) return 4;
  return dec.finalize();
}

// ---------------------------------------------------------------------------
// Interleaved dual-section HF decode. The ANS symbol chain is strictly
// serial within a section (state -> cluster -> table -> bucket -> state:
// ~5 dependent loads per symbol), so a single stream runs far below the
// core's ILP capacity. Sections of DIFFERENT groups are independent
// bitstreams (SURVEY §2.3); stepping two of them alternately in one loop
// overlaps their dependency chains (~1.5x per core, measured). The walk
// below is a resumable-cursor re-expression of decode_hf_group_core with
// identical bit semantics (validated by the native-vs-Python parity and
// sharded equivalence tests).

// One section's decode state between coefficient reads.
struct HfCursor {
  DecoderState dec;
  BitReader br;
  const DecoderSpec* spec;
  i64 ctx_offset;
  const HfFrameCtx* fc;
  HfGroupIo gp;
  // derived per section
  i64 lf_idx_mul, hf_idx_mul;
  bool has_lf_quant;
  std::vector<i64> nzr[3];
  // block walk position
  i32 y, x;
  int ci;  // channel slot; 3 => advance to the next varblock
  // current varblock
  int sel;
  i64 qf;
  i32 w8, h8, num_blocks;
  int num_blocks_log;
  i32 order_id;
  i64 lf_idx, hf_idx;
  // active coefficient run. The order walk is pre-folded into a plane
  // OFFSET table per (order_id, channel, transpose): one load replaces
  // order-x/y loads + transpose select + stride multiply, and frees
  // registers so two interleaved streams fit the GP file.
  u32 non_zeros, is_prev_nonzero;
  i32* run_out;            // out plane + varblock origin
  const i64* run_offs;     // offtab + num_blocks (indexed by oi2)
  i32 olen2;               // order_len - num_blocks
  const i32* cmap_coeff;   // cluster_map + ctx_offset + coeff_ctx_base
  i32 oi2;                 // coefficient index within the run
  i32 coeff_shift;
  // offset-table cache, keyed by (order_id*3 + channel)*2 + transpose;
  // rebuilt per section (orders are per pass, strides per channel).
  // offtab_mem tracks cumulative CAPACITY (clear() keeps capacity).
  std::vector<i64> offtab[13 * 3 * 2];
  MemGuard offtab_mem;
  // status: 0 = in a coefficient run, 1 = needs hf_advance,
  // 2 = section done (result = section return code), >2 = error result
  int status;
  int result;
};

// Begin a section on the cursor (mirrors the preamble of run_section):
// reads the HF preset bits and the ANS initial state. Returns false if
// the preset index is invalid (cursor marked done with result 7).
static bool hf_cursor_begin(HfCursor& c, const DecoderSpec& spec,
                            const u8* data, u64 len_bytes, u64 bit_pos,
                            int nhp, i64 num_block_clusters,
                            const HfFrameCtx& fc, const HfGroupIo& gp,
                            i64& ctx_offset_out) {
  PROF_SCOPE(PROF_HF_BEGIN);
  c.spec = &spec;
  c.br = BitReader{data, len_bytes * 8, bit_pos};
  int hfp_bits = 0;
  while ((1 << hfp_bits) < nhp) hfp_bits++;
  u32 hfp = (u32)c.br.read(hfp_bits);
  if (hfp >= (u32)nhp) {
    c.status = 2;
    c.result = 7;
    return false;
  }
  c.ctx_offset = (i64)hfp * 495 * num_block_clusters;
  ctx_offset_out = c.ctx_offset;
  c.dec = DecoderState{};
  c.dec.spec = &spec;
  c.dec.br = &c.br;
  c.dec.begin();
  c.fc = &fc;
  c.gp = gp;
  c.lf_idx_mul = (i64)(fc.lf_thr_counts[0] + 1) * (fc.lf_thr_counts[1] + 1) *
                 (fc.lf_thr_counts[2] + 1);
  c.hf_idx_mul = fc.num_qf_thresholds + 1;
  c.has_lf_quant = gp.lf_quant_ptrs[0] != nullptr;
  c.coeff_shift = gp.coeff_shift;
  for (int ch = 0; ch < 3; ch++) {
    i32 w = (gp.grid_w + (1 << fc.hshifts[ch]) - 1) >> fc.hshifts[ch];
    c.nzr[ch].assign(w, 0);
  }
  c.y = 0;
  c.x = -1;  // hf_advance pre-increments
  c.ci = 3;
  c.status = 1;
  c.result = 0;
  for (auto& t : c.offtab) t.clear();
  return true;
}

// Walk the block/channel bookkeeping from the cursor's position until a
// coefficient run begins (status 0), the section completes (status 2),
// or a decode error occurs (status 2, result set). Line-for-line the
// outer loops of decode_hf_group_core.
static void hf_advance(HfCursor& c) {
  PROF_SCOPE(PROF_HF_ADVANCE);
  const HfFrameCtx& fc = *c.fc;
  const HfGroupIo& gp = c.gp;
  const i32* lf_thr_counts = fc.lf_thr_counts;
  const i32* hshifts = fc.hshifts;
  const i32* vshifts = fc.vshifts;
  const signed char* block_sel = gp.block_sel;
  i64 grid_stride = gp.grid_stride;

  for (;;) {
    if (c.ci >= 3) {
      // next occupied varblock anchor
      for (;;) {
        c.x++;
        if (c.x >= gp.grid_w) {
          c.x = 0;
          c.y++;
        }
        if (c.y >= gp.grid_h) {
          c.status = 2;
          c.result = c.br.pos > c.br.len_bits ? 4 : c.dec.finalize();
          return;
        }
        if (block_sel[(i64)c.y * grid_stride + c.x] >= 0) break;
      }
      c.sel = block_sel[(i64)c.y * grid_stride + c.x];
      c.qf = gp.block_mul[(i64)c.y * grid_stride + c.x];
      c.w8 = SELECT_SIZE[c.sel][0];
      c.h8 = SELECT_SIZE[c.sel][1];
      c.num_blocks = c.w8 * c.h8;
      c.num_blocks_log = 0;
      while ((1 << c.num_blocks_log) < c.num_blocks) c.num_blocks_log++;
      c.order_id = ORDER_ID_TBL[c.sel];

      c.lf_idx = 0;
      if (c.has_lf_quant) {
        const int cs[3] = {0, 2, 1};
        for (int k = 0; k < 3; k++) {
          int ch = cs[k];
          c.lf_idx *= lf_thr_counts[ch] + 1;
          i32 qx = c.x >> hshifts[ch], qy = c.y >> vshifts[ch];
          i32 q = gp.lf_quant_ptrs[ch][(i64)qy * gp.lf_quant_strides[ch] + qx];
          for (int t = 0; t < lf_thr_counts[ch]; t++)
            if (q > fc.lf_thr[ch][t]) c.lf_idx++;
        }
      }
      c.hf_idx = 0;
      for (int t = 0; t < fc.num_qf_thresholds; t++)
        if (c.qf > fc.qf_thresholds[t]) c.hf_idx++;
      c.ci = 0;
    }

    for (; c.ci < 3;) {
      int ci = c.ci;
      i64 ch_idx = ci * 13 + c.order_id;
      int ch = (int[]){1, 0, 2}[ci];
      int hs = hshifts[ch], vs = vshifts[ch];
      i32 sx = c.x >> hs, sy = c.y >> vs;
      if (hs || vs) {
        if ((sx << hs) != c.x || (sy << vs) != c.y ||
            block_sel[(i64)sy * grid_stride + sx] < 0) {
          c.ci++;
          continue;
        }
      }

      i64 idx = (ch_idx * c.hf_idx_mul + c.hf_idx) * c.lf_idx_mul + c.lf_idx;
      i32 block_ctx = fc.block_ctx_map[idx];
      i64 predicted;
      if (sy == 0) predicted = sx == 0 ? 32 : c.nzr[ch][sx - 1];
      else if (sx == 0) predicted = c.nzr[ch][sx];
      else predicted = (c.nzr[ch][sx] + c.nzr[ch][sx - 1] + 1) >> 1;
      i64 nz_idx = predicted >= 8 ? 4 + predicted / 2 : predicted;
      i64 non_zeros_ctx = block_ctx + nz_idx * fc.num_block_clusters;

      // ANS-only sections (the batch driver routes LZ77/prefix sections
      // to the reference core) take the inlined fast read: the general
      // read_varint_clustered is an out-of-line call per nz token
      int nz_cluster = c.spec->cluster_map[c.ctx_offset + non_zeros_ctx];
      u32 non_zeros = (!c.spec->lz77_enabled && !c.spec->use_prefix)
                          ? c.dec.read_varint_ans_fast(nz_cluster)
                          : c.dec.read_varint_clustered(nz_cluster, 0);
      if (c.dec.error) {
        c.status = 2;
        c.result = 10 + c.dec.error;
        return;
      }
      if (non_zeros > (u32)(63 << c.num_blocks_log)) {
        c.status = 2;
        c.result = 5;
        return;
      }
      i64 nz_val = ((i64)non_zeros + c.num_blocks - 1) >> c.num_blocks_log;
      for (int dx = 0; dx < c.w8; dx++) c.nzr[ch][sx + dx] = nz_val;
      c.ci++;  // resume at the next channel after this run
      if (non_zeros == 0) continue;

      c.non_zeros = non_zeros;
      c.is_prev_nonzero = non_zeros <= (u32)(c.num_blocks * 4) ? 1 : 0;
      bool transpose = need_transpose_tbl(c.sel);
      int oid3 = c.order_id * 3 + ch;
      i64 out_stride = gp.out_strides[ch];
      i32 order_len = gp.order_lengths[oid3];
      std::vector<i64>& tab = c.offtab[oid3 * 2 + transpose];
      if (tab.empty()) {
        const i32* order = gp.orders_blob + gp.order_offsets[oid3];
        if ((size_t)order_len > tab.capacity() &&
            !c.offtab_mem.acquire(
                ((i64)order_len - (i64)tab.capacity()) * (i64)sizeof(i64))) {
          c.status = 2;
          c.result = 12;  // scratch memory budget exceeded (= 10 + error 2)
          return;
        }
        tab.resize(order_len);
        for (i32 oi = 0; oi < order_len; oi++) {
          i32 dx = order[oi * 2], dy = order[oi * 2 + 1];
          if (transpose) { i32 t = dx; dx = dy; dy = t; }
          tab[oi] = (i64)dy * out_stride + dx;
        }
      }
      c.run_out = gp.out_ptrs[ch] + (i64)sy * 8 * out_stride + (i64)sx * 8;
      c.run_offs = tab.data() + c.num_blocks;
      c.olen2 = order_len - c.num_blocks;
      c.cmap_coeff = c.spec->cluster_map + c.ctx_offset +
                     (i64)block_ctx * 458 + 37 * fc.num_block_clusters;
      c.oi2 = 0;
      c.status = 0;
      return;
    }
    // channel loop exhausted; move to the next varblock
  }
}

// Fused multi-run machinery: step 2-4 active coefficient runs alternately
// with ALL loop-carried state in locals. Operating on the cursor structs
// directly defeats register allocation (the out-plane i32 stores may
// alias the cursors' i32 fields), which erases the interleaving win; with
// locals the independent ANS chains overlap in the OoO window. The kL0
// specialization (num_blocks_log == 0: 1x1 varblocks, the dominant shape)
// folds the two context shifts, which sit on the per-symbol chain.
#define HF_LOCALS(p, C)                                                   \
  u32 p##_state = C.dec.state;                                            \
  const u8* __restrict__ p##_data = C.br.data;                            \
  const u64 p##_len = C.br.len_bits;                                      \
  u64 p##_pos = C.br.pos;                                                 \
  u32 p##_nz = C.non_zeros;                                               \
  u32 p##_prev = C.is_prev_nonzero;                                       \
  i32 p##_oi = C.oi2;                                                     \
  const i32 p##_olen = C.olen2;                                           \
  const i64* __restrict__ p##_offs = C.run_offs;                          \
  const i32* __restrict__ p##_cmap = C.cmap_coeff;                        \
  i32* __restrict__ p##_out = C.run_out;                                  \
  const int p##_log = (p##_kL0) ? 0 : C.num_blocks_log;                   \
  const i32 p##_shift = C.coeff_shift;                                    \
  const AnsRec* __restrict__ p##_recs = C.spec->recs;                     \
  bool p##_live = true;

#define HF_SAVE(p, C)                                                     \
  C.dec.state = p##_state;                                                \
  C.br.pos = p##_pos;                                                     \
  C.non_zeros = p##_nz;                                                   \
  C.is_prev_nonzero = p##_prev;                                           \
  C.oi2 = p##_oi;

  // One coefficient iteration on the p-prefixed locals; identical bit
  // semantics to hf_step (read_varint_ans_fast inlined on locals).
#define HF_STEP(p, C)                                                     \
  if (p##_live) {                                                         \
    u32 nzc = (p##_nz - 1) >> p##_log;                                    \
    u32 fi = (u32)p##_oi >> p##_log;                                      \
    i64 cctx = (i64)HF_CCTX2[(nzc << 6) | fi] + p##_prev;                 \
    if (__builtin_expect(cctx >= 458, 0)) {                               \
      C.status = 2;                                                       \
      C.result = 6;                                                       \
      p##_live = false;                                                   \
    } else {                                                              \
      int cluster = p##_cmap[cctx];                                       \
      const AnsRec& t = p##_recs[cluster];                                \
      u32 idx = p##_state & 0xFFF;                                        \
      u32 bi = idx >> t.lbs;                                              \
      u32 posb = idx & ((1u << t.lbs) - 1);                               \
      const AnsBucket bu = t.buckets[bi];                                 \
      bool al = posb >= bu.cutoff();                                      \
      u32 symbol = al ? bu.alias_symbol() : bi;                           \
      u32 offset = al ? bu.alias_offset() + posb : posb;                  \
      u32 dd = al ? bu.dist_alias() : bu.dist_self();                     \
      u32 next = (p##_state >> 12) * dd + offset;                         \
      u64 window = hf_peek48(p##_data, p##_len, p##_pos);                 \
      u32 need = next < (1u << 16);                                       \
      p##_state = need ? ((next << 16) | (u32)(window & 0xFFFF)) : next;  \
      u64 rest_window = need ? (window >> 16) : window;                   \
      int pos_add = need ? 16 : 0;                                        \
      /* branchless hybrid uint: compute the wide path unconditionally  \
         and select — the literal/wide branch is data-dependent and     \
         mispredicts flush BOTH interleaved pipelines */                \
      u32 msb = t.msb, lsb = t.lsb;                                      \
      u32 n = (t.se - (msb + lsb)) +                                     \
              ((symbol - t.split) >> (msb + lsb));                       \
      n &= 31;                                                           \
      bool is_lit = symbol < t.split;                                    \
      n = is_lit ? 0 : n;                                                \
      u32 rest = (u32)(rest_window & ((1ull << n) - 1));                 \
      p##_pos += pos_add + (int)n;                                       \
      u32 low = symbol & ((1u << lsb) - 1);                              \
      u32 tt = (symbol >> lsb) & ((1u << msb) - 1);                      \
      tt |= 1u << msb;                                                   \
      u32 wide = (u32)(((((u64)tt << n) | rest) << lsb) | low);          \
      u32 ucoeff = is_lit ? symbol : wide;                               \
      /* branchless zero/nonzero: unpack_signed(0) == 0, so a zero      \
         token adds 0 at its (valid) order position */                  \
      u32 nzf = ucoeff != 0;                                             \
      i32 coeff = (i32)((u32)unpack_signed(ucoeff) << p##_shift);        \
      p##_out[p##_offs[p##_oi]] += coeff;                                \
      p##_prev = nzf;                                                    \
      p##_nz -= nzf;                                                     \
      ++p##_oi;                                                          \
      if (p##_nz == 0 || p##_oi >= p##_olen) {                           \
        C.status = 1;                                                    \
        p##_live = false;                                                \
      }                                                                  \
    }                                                                     \
  }

// Exits when either run ends (statuses written back); the caller pumps
// and re-enters.
template <bool kL0A, bool kL0B>
static void hf_dual_run(HfCursor& A, HfCursor& B) {
  constexpr bool a_kL0 = kL0A;
  constexpr bool b_kL0 = kL0B;
  HF_LOCALS(a, A)
  HF_LOCALS(b, B)
  for (;;) {
    HF_STEP(a, A)
    HF_STEP(b, B)
    if (!(a_live & b_live)) break;
  }
  // let the surviving run finish single-stream while its state is hot
  while (a_live) {
    HF_STEP(a, A)
  }
  while (b_live) {
    HF_STEP(b, B)
  }
  HF_SAVE(a, A)
  HF_SAVE(b, B)
}

// Tri/quad runs: exit as soon as ANY run ends — the caller regroups the
// survivors (possibly adding a freshly pumped stream), so no stream
// drains single-width while independent work exists. One all-1x1
// specialization (the dominant shape) keeps instantiations at two.
template <bool kAllL0>
static void hf_tri_run(HfCursor& A, HfCursor& B, HfCursor& C) {
  constexpr bool a_kL0 = kAllL0;
  constexpr bool b_kL0 = kAllL0;
  constexpr bool c_kL0 = kAllL0;
  HF_LOCALS(a, A)
  HF_LOCALS(b, B)
  HF_LOCALS(c, C)
  for (;;) {
    HF_STEP(a, A)
    HF_STEP(b, B)
    HF_STEP(c, C)
    if (!(a_live & b_live & c_live)) break;
  }
  HF_SAVE(a, A)
  HF_SAVE(b, B)
  HF_SAVE(c, C)
}

template <bool kAllL0>
static void hf_quad_run(HfCursor& A, HfCursor& B, HfCursor& C, HfCursor& D) {
  constexpr bool a_kL0 = kAllL0;
  constexpr bool b_kL0 = kAllL0;
  constexpr bool c_kL0 = kAllL0;
  constexpr bool d_kL0 = kAllL0;
  HF_LOCALS(a, A)
  HF_LOCALS(b, B)
  HF_LOCALS(c, C)
  HF_LOCALS(d, D)
  for (;;) {
    HF_STEP(a, A)
    HF_STEP(b, B)
    HF_STEP(c, C)
    HF_STEP(d, D)
    if (!(a_live & b_live & c_live & d_live)) break;
  }
  HF_SAVE(a, A)
  HF_SAVE(b, B)
  HF_SAVE(c, C)
  HF_SAVE(d, D)
}

#undef HF_LOCALS
#undef HF_SAVE
#undef HF_STEP

static void hf_dual_dispatch(HfCursor& A, HfCursor& B) {
  bool a0 = A.num_blocks_log == 0, b0 = B.num_blocks_log == 0;
  if (a0 & b0) hf_dual_run<true, true>(A, B);
  else if (a0) hf_dual_run<true, false>(A, B);
  else if (b0) hf_dual_run<false, true>(A, B);
  else hf_dual_run<false, false>(A, B);
}

static void hf_tri_dispatch(HfCursor& A, HfCursor& B, HfCursor& C) {
  if (A.num_blocks_log == 0 && B.num_blocks_log == 0 &&
      C.num_blocks_log == 0)
    hf_tri_run<true>(A, B, C);
  else
    hf_tri_run<false>(A, B, C);
}

static void hf_quad_dispatch(HfCursor& A, HfCursor& B, HfCursor& C,
                             HfCursor& D) {
  if (A.num_blocks_log == 0 && B.num_blocks_log == 0 &&
      C.num_blocks_log == 0 && D.num_blocks_log == 0)
    hf_quad_run<true>(A, B, C, D);
  else
    hf_quad_run<false>(A, B, C, D);
}

// One coefficient iteration (the body of decode_hf_group_core's inner
// loop, ANS fast path). Returns true while the run continues; on false
// the cursor is status 1 (run ended) or status 2 (error in result).
__attribute__((always_inline)) static inline bool hf_step(HfCursor& c) {
  i64 nz_for_ctx = ((i64)c.non_zeros - 1) >> c.num_blocks_log;
  i64 fi = (i64)(c.oi2 >> c.num_blocks_log);
  i64 coeff_ctx = (COEFF_NUM_NONZERO_CONTEXT[nz_for_ctx] +
                   COEFF_FREQ_CONTEXT[fi]) * 2 + c.is_prev_nonzero;
  if (coeff_ctx >= 458) {
    c.status = 2;
    c.result = 6;
    return false;
  }
  u32 ucoeff = c.dec.read_varint_ans_fast(c.cmap_coeff[coeff_ctx]);
  if (ucoeff == 0) {
    c.is_prev_nonzero = 0;
  } else {
    i32 coeff = (i32)((u32)unpack_signed(ucoeff) << c.coeff_shift);
    c.run_out[c.run_offs[c.oi2]] += coeff;
    c.is_prev_nonzero = 1;
    if (--c.non_zeros == 0) {
      c.status = 1;
      return false;
    }
  }
  if (++c.oi2 >= c.olen2) {
    c.status = 1;
    return false;
  }
  return true;
}

}  // namespace

extern "C" {

// Decode one pass-group's HF coefficients, adding into 3 int32 planes.
// Returns 0 on success; 4 = truncated; >=10 = decoder error.
int jxlhost_decode_hf_group(
    const u8* data, u64 data_len_bytes, u64* bit_pos,
    // decoder spec (hf_dist)
    const i32* spec_header, const i32* cluster_map, const i32* cfgs,
    const i32* ans_meta, const i32* ans_blob,
    const i32* pfx_meta, const i32* pfx_blob,
    i64 ctx_offset,            // hfp * 495 * num_block_clusters
    // block context
    const i32* qf_thresholds, i32 num_qf_thresholds,
    const i32* lf_thr_all, const i32* lf_thr_counts,  // 3 concatenated lists
    const i32* block_ctx_map, i32 num_block_clusters,
    // grids
    const signed char* block_sel, const i32* block_mul,
    i32 grid_w, i32 grid_h, i64 grid_stride,
    const i32* hshifts, const i32* vshifts,   // [3] (x,y,b channel order)
    // lf_quant planes in x,y,b order (null ptrs if absent)
    i32* const* lf_quant_ptrs, const i64* lf_quant_strides,
    // orders: per (order_id, channel): offset into orders_blob (pairs), -1 => natural not provided (error)
    const i32* order_offsets,  // [13*3]
    const i32* orders_blob,    // concatenated (x, y) pairs
    const i32* order_lengths,  // [13*3]
    i32 coeff_shift,
    // output planes in x,y,b order
    i32* const* out_ptrs, const i64* out_strides
) {
  SpecHolder holder;
  holder.build(spec_header, cluster_map, cfgs, ans_meta, ans_blob, pfx_meta,
               pfx_blob);
  BitReader br{data, data_len_bytes * 8, *bit_pos};
  DecoderState dec;
  dec.spec = &holder.spec;
  dec.br = &br;
  dec.begin();

  HfFrameCtx fc;
  fc.qf_thresholds = qf_thresholds;
  fc.num_qf_thresholds = num_qf_thresholds;
  {
    const i32* p = lf_thr_all;
    for (int c = 0; c < 3; c++) {
      fc.lf_thr[c] = p;
      p += lf_thr_counts[c];
    }
  }
  fc.lf_thr_counts = lf_thr_counts;
  fc.block_ctx_map = block_ctx_map;
  fc.num_block_clusters = num_block_clusters;
  fc.hshifts = hshifts;
  fc.vshifts = vshifts;

  HfGroupIo gp{block_sel, block_mul, grid_w, grid_h, grid_stride,
               lf_quant_ptrs, lf_quant_strides, out_ptrs, out_strides,
               coeff_shift, order_offsets, orders_blob, order_lengths};
  int ret = decode_hf_group_core(dec, holder.spec, br, ctx_offset, fc, gp);
  *bit_pos = br.pos;
  return ret;
}

// Decode MANY pass-group sections in one call with a native thread pool
// (the reference's per-group pool.scope, jxl-render/src/vardct/mod.rs:
// 250-311, without any Python in the hot path). Sections are grouped
// into jobs: all passes of one group run sequentially on one worker
// (coefficients ADD into the same planes, hf_coeff.rs:228-236) while
// groups fan out across threads. The HF preset index is read here (the
// single-section entry reads it in Python).
//
// Per-pass tables are passed as parallel pointer arrays of length
// n_passes * k; per-section arrays of length n_sections (pointers) or
// n_sections * 3 (per-channel). sec_ret[k] receives each section's
// return code (0 ok, 4 truncated, 7 bad preset, >=10 decoder error);
// sec_bit_pos[k] receives the final bit position for sections that
// succeeded (the modular sub-stream of the section resumes there).
int jxlhost_decode_hf_groups_batch(
    i32 n_passes,
    const i32* const* pass_specs,     // [n_passes*7]: header, cluster_map,
                                      //   cfgs, ans_meta, ans_blob,
                                      //   pfx_meta, pfx_blob
    const i32* const* pass_orders,    // [n_passes*3]: offsets, blob, lengths
    const i32* pass_num_hf_presets,   // [n_passes]
    const i32* pass_coeff_shift,      // [n_passes]
    // frame-level block context
    const i32* qf_thresholds, i32 num_qf_thresholds,
    const i32* lf_thr_all, const i32* lf_thr_counts,
    const i32* block_ctx_map, i32 num_block_clusters,
    const i32* hshifts, const i32* vshifts,
    // sections (flattened)
    i32 n_sections,
    const u8* const* sec_data, const u64* sec_len_bytes, u64* sec_bit_pos,
    const i32* sec_pass,
    const signed char* const* sec_sel, const i32* const* sec_mul,
    const i32* sec_grid_w, const i32* sec_grid_h, const i64* sec_grid_stride,
    i32* const* sec_lf_ptrs, const i64* sec_lf_strides,      // [n_sections*3]
    i32* const* sec_out_ptrs, const i64* sec_out_strides,    // [n_sections*3]
    // group jobs: sections of one group contiguous, pass order
    i32 n_jobs, const i32* job_start, const i32* job_count,
    i32 n_threads,
    i32* sec_ret
) {
  std::vector<SpecHolder> holders(n_passes);
  for (i32 p = 0; p < n_passes; p++)
    holders[p].build(pass_specs[p * 7], pass_specs[p * 7 + 1],
                     pass_specs[p * 7 + 2], pass_specs[p * 7 + 3],
                     pass_specs[p * 7 + 4], pass_specs[p * 7 + 5],
                     pass_specs[p * 7 + 6]);

  HfFrameCtx fc;
  fc.qf_thresholds = qf_thresholds;
  fc.num_qf_thresholds = num_qf_thresholds;
  {
    const i32* p = lf_thr_all;
    for (int c = 0; c < 3; c++) {
      fc.lf_thr[c] = p;
      p += lf_thr_counts[c];
    }
  }
  fc.lf_thr_counts = lf_thr_counts;
  fc.block_ctx_map = block_ctx_map;
  fc.num_block_clusters = num_block_clusters;
  fc.hshifts = hshifts;
  fc.vshifts = vshifts;

  auto run_section = [&](i32 k) -> int {
    PROF_SCOPE(PROF_HF_FALLBACK);
    i32 p = sec_pass[k];
    const SpecHolder& holder = holders[p];
    BitReader br{sec_data[k], sec_len_bytes[k] * 8, sec_bit_pos[k]};
    i32 nhp = pass_num_hf_presets[p];
    int hfp_bits = 0;
    while ((1 << hfp_bits) < nhp) hfp_bits++;
    u32 hfp = (u32)br.read(hfp_bits);
    if (hfp >= (u32)nhp) return 7;
    i64 ctx_offset = (i64)hfp * 495 * num_block_clusters;
    DecoderState dec;
    dec.spec = &holder.spec;
    dec.br = &br;
    dec.begin();
    HfGroupIo gp{sec_sel[k], sec_mul[k],
                 sec_grid_w[k], sec_grid_h[k], sec_grid_stride[k],
                 sec_lf_ptrs + (i64)k * 3, sec_lf_strides + (i64)k * 3,
                 sec_out_ptrs + (i64)k * 3, sec_out_strides + (i64)k * 3,
                 pass_coeff_shift[p],
                 pass_orders[p * 3], pass_orders[p * 3 + 1],
                 pass_orders[p * 3 + 2]};
    int ret = decode_hf_group_core(dec, holder.spec, br, ctx_offset, fc, gp);
    sec_bit_pos[k] = br.pos;
    return ret;
  };

  auto run_job_single = [&](i32 j) {
    i32 s = job_start[j], e = s + job_count[j];
    for (i32 k = s; k < e; k++) {
      int ret = run_section(k);
      sec_ret[k] = ret;
      if (ret != 0) {
        // later passes of this group would decode garbage on top of a
        // failed earlier pass; mark them skipped (-1) and move on
        for (i32 m = k + 1; m < e; m++) sec_ret[m] = -1;
        break;
      }
    }
  };

  // Interleaved pair driver: one job (group) is a strictly sequential
  // chain of pass sections, but two jobs are independent bitstreams, so
  // their ANS dependency chains overlap when stepped alternately.
  struct JobState {
    i32 k, end;
    HfCursor cur;
    bool in_section = false;
    bool done = false;
  };

  auto fail_job = [&](JobState& js, int ret) {
    sec_ret[js.k] = ret;
    for (i32 m = js.k + 1; m < js.end; m++) sec_ret[m] = -1;
    js.in_section = false;
    js.done = true;
  };

  // Bring the job to an active coefficient run (cur.status == 0) or to
  // completion, starting new sections / running fallback shapes as
  // needed. Sections whose pass uses LZ77 or prefix codes take the
  // reference single-stream core (read_varint_ans_fast is ANS-only).
  auto pump = [&](JobState& js) {
    for (;;) {
      if (js.done) return;
      if (!js.in_section) {
        if (js.k >= js.end) {
          js.done = true;
          return;
        }
        i32 p = sec_pass[js.k];
        const SpecHolder& holder = holders[p];
        if (holder.spec.lz77_enabled || holder.spec.use_prefix) {
          int ret = run_section(js.k);
          sec_ret[js.k] = ret;
          if (ret != 0) {
            for (i32 m = js.k + 1; m < js.end; m++) sec_ret[m] = -1;
            js.done = true;
            return;
          }
          js.k++;
          continue;
        }
        i32 k = js.k;
        i32 nhp = pass_num_hf_presets[p];
        HfGroupIo gp{sec_sel[k], sec_mul[k],
                     sec_grid_w[k], sec_grid_h[k], sec_grid_stride[k],
                     sec_lf_ptrs + (i64)k * 3, sec_lf_strides + (i64)k * 3,
                     sec_out_ptrs + (i64)k * 3, sec_out_strides + (i64)k * 3,
                     pass_coeff_shift[p],
                     pass_orders[p * 3], pass_orders[p * 3 + 1],
                     pass_orders[p * 3 + 2]};
        i64 co;
        if (!hf_cursor_begin(js.cur, holder.spec, sec_data[k],
                             sec_len_bytes[k], sec_bit_pos[k], nhp,
                             num_block_clusters, fc, gp, co)) {
          fail_job(js, js.cur.result);
          return;
        }
        js.in_section = true;
        continue;
      }
      if (js.cur.status == 0) return;
      if (js.cur.status == 1) {
        hf_advance(js.cur);
        continue;
      }
      // status 2: section finished (result 0) or failed
      sec_bit_pos[js.k] = js.cur.br.pos;
      sec_ret[js.k] = js.cur.result;
      js.in_section = false;
      if (js.cur.result != 0) {
        for (i32 m = js.k + 1; m < js.end; m++) sec_ret[m] = -1;
        js.done = true;
        return;
      }
      js.k++;
    }
  };

  // Interleave m <= 4 jobs. Measured on the dense VarDCT bench (4-wide
  // x86 core): 2-way 68.5 MP/s, 3-way 67.0, 4-way 55.7 — two streams
  // already saturate issue width (a step is ~30 uops vs a ~12-cycle ANS
  // chain), and wider interleave only adds register spills, so the
  // driver claims pairs; the tri/quad runners remain for the regrouping
  // tail (a pair whose job ends mid-claim joins the next claim).
  auto run_job_multi = [&](const i32* jobs, int m) {
    JobState js[4];
    for (int i = 0; i < m; i++) {
      js[i].k = job_start[jobs[i]];
      js[i].end = js[i].k + job_count[jobs[i]];
      pump(js[i]);
    }
    for (;;) {
      JobState* live[4];
      int n_live = 0;
      for (int i = 0; i < m; i++)
        if (!js[i].done) live[n_live++] = &js[i];
      if (n_live == 0) return;
      if (n_live == 1) {
        JobState& R = *live[0];
        for (;;) {
          pump(R);
          if (R.done) return;
          PROF_SCOPE(PROF_HF_SINGLE);
          while (hf_step(R.cur)) {
          }
        }
      }
      PROF_SCOPE(PROF_HF_MULTI);
      if (n_live == 2)
        hf_dual_dispatch(live[0]->cur, live[1]->cur);
      else if (n_live == 3)
        hf_tri_dispatch(live[0]->cur, live[1]->cur, live[2]->cur);
      else
        hf_quad_dispatch(live[0]->cur, live[1]->cur, live[2]->cur,
                         live[3]->cur);
      for (int i = 0; i < n_live; i++)
        if (live[i]->cur.status != 0) pump(*live[i]);
    }
  };

  // Interleave only when jobs comfortably outnumber workers: greedy
  // multi-job claiming with n_jobs <= n_threads would idle part of the
  // pool (four jobs on one core at ~2x lose to four cores at 4x).
  i32 nt = (n_threads <= 1 || n_jobs <= 1)
               ? 1
               : (n_threads < n_jobs ? n_threads : n_jobs);
  const int ways = n_jobs >= 2 * nt ? 2 : 1;

  std::atomic<i32> next_job{0};
  auto worker = [&]() {
    for (;;) {
      i32 jobs[4];
      int m = 0;
      // claim up to `ways` jobs — but switch to single claims near the
      // tail so the last work units are fine-grained (a 2-wide unit at
      // the end skews finish times by a whole section per worker)
      while (m < ways) {
        i32 j = next_job.fetch_add(1, std::memory_order_relaxed);
        if (j >= n_jobs) break;
        jobs[m++] = j;
        if (n_jobs - (j + 1) < nt) break;  // tail: stop pairing
      }
      if (m == 0) break;
      if (m == 1)
        run_job_single(jobs[0]);
      else
        run_job_multi(jobs, m);
    }
  };

  worker_pool().run(nt, worker);
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Entropy decoder TABLE PARSING (jxl-coding lib.rs Decoder::parse,
// ans.rs Histogram::parse, prefix.rs Histogram::parse, read_clusters).
// Produces the exact flat serialization the decode entry points consume
// (the layout DecoderTables builds in Python) so parsed specs go straight
// back into jxlhost_decode_* calls. Validation matches coding/entropy.py
// line for line; any mismatch is caught by the parity tests.

namespace {

constexpr int ANS_PRECISION = 12;

inline int add_log2_ceil_i(u32 x) {
  if (x >= 0x80000000u) return 32;
  u32 v = x + 1, p = 1;
  int n = 0;
  while (p < v) { p <<= 1; n++; }
  return n;
}

inline u32 read_u32_sel(BitReader& br, const u32 base[4], const int bits[4]) {
  u32 sel = (u32)br.read(2);
  return base[sel] + (u32)br.read(bits[sel]);
}

inline u32 read_u8_coded(BitReader& br) {
  if (!br.read(1)) return 0;
  int n = (int)br.read(3);
  return (1u << n) + (u32)br.read(n);
}

inline int read_log_count(BitReader& br) {
  u32 v = (u32)br.read(3);
  switch (v) {
    case 0: return 10;
    case 1: {
      const int vals[4] = {4, 0, 11, 13};
      for (int i = 0; i < 4; i++)
        if (br.read(1)) return vals[i];
      return 12;
    }
    case 2: return 7;
    case 3: return br.read(1) ? 1 : 3;
    case 4: return 6;
    case 5: return 8;
    case 6: return 9;
    default: return br.read(1) ? 2 : 5;
  }
}

struct ParsedIntCfg { i32 split_exponent, msb, lsb; };

// returns 0 ok, else error code
int parse_int_cfg(BitReader& br, int log_alphabet_size, ParsedIntCfg& out) {
  int se = (int)br.read(add_log2_ceil_i((u32)log_alphabet_size));
  int msb = 0, lsb = 0;
  if (se != log_alphabet_size) {
    msb = (int)br.read(add_log2_ceil_i((u32)se));
    if (msb > se) return 101;
    lsb = (int)br.read(add_log2_ceil_i((u32)(se - msb)));
  }
  if (msb + lsb > se) return 102;
  out = ParsedIntCfg{se, msb, lsb};
  return 0;
}

struct ParsedAns {
  i32 log_bucket_size;
  std::vector<i32> dist, alias_symbol, alias_cutoff, alias_offset;
};

int parse_ans_distribution(BitReader& br, int table_size,
                           std::vector<i32>& dist) {
  dist.assign(table_size, 0);
  if (br.read(1)) {
    if (br.read(1)) {
      u32 v0 = read_u8_coded(br), v1 = read_u8_coded(br);
      u32 mx = v0 > v1 ? v0 : v1;
      if (v0 == v1 || mx + 1 > (u32)table_size) return 110;
      u32 prob = (u32)br.read(12);
      dist[v0] = (i32)prob;
      dist[v1] = (i32)((1u << 12) - prob);
    } else {
      u32 val = read_u8_coded(br);
      if (val + 1 > (u32)table_size) return 111;
      dist[val] = 1 << 12;
    }
    return 0;
  }
  if (br.read(1)) {
    u32 alphabet = read_u8_coded(br) + 1;
    if (alphabet > (u32)table_size) return 112;
    u32 base = (1u << 12) / alphabet, leftover = (1u << 12) % alphabet;
    for (u32 i = 0; i < alphabet; i++)
      dist[i] = (i32)(base + (i < leftover ? 1 : 0));
    return 0;
  }
  int length = 0;
  while (length < 3 && br.read(1)) length++;
  u32 shift = (u32)br.read(length) + (1u << length) - 1;
  if (shift > 13) return 113;
  u32 alphabet = read_u8_coded(br) + 3;
  if (alphabet > (u32)table_size) return 114;

  std::vector<i32> codes(table_size, 0);
  std::vector<std::pair<i32, i32>> repeat_ranges;
  int omit_log = -1, omit_pos = -1;
  u32 idx = 0;
  while (idx < alphabet) {
    int c = read_log_count(br);
    codes[idx] = c;
    if (c == 13) {
      u32 rep = read_u8_coded(br) + 4;
      if (idx + rep > alphabet) return 115;
      repeat_ranges.push_back({(i32)idx, (i32)(idx + rep)});
      idx += rep;
      continue;
    }
    if (omit_pos < 0 || c > omit_log) {
      omit_log = c;
      omit_pos = (int)idx;
    }
    idx++;
  }
  if (omit_pos < 0) return 116;
  if (omit_pos + 1 < table_size && codes[omit_pos + 1] == 13) return 117;

  size_t rr = 0;
  i64 acc = 0;
  i32 prev = 0;
  for (int i = 0; i < table_size; i++) {
    if (rr < repeat_ranges.size() && repeat_ranges[rr].first <= i) {
      if (repeat_ranges[rr].second == i) {
        rr++;
      } else {
        dist[i] = prev;
        acc += prev;
        if (acc > (1 << 12)) return 118;
        continue;
      }
    }
    i32 c = codes[i];
    if (c == 0 || i == omit_pos) {
      prev = 0;
      continue;
    }
    if (c > 1) {
      int zeros = c - 1;
      int bitcount = (int)shift - ((12 - zeros) >> 1);
      if (bitcount < 0) bitcount = 0;
      if (bitcount > zeros) bitcount = zeros;
      c = (i32)((1u << zeros) + ((u32)br.read(bitcount) << (zeros - bitcount)));
    }
    dist[i] = c;
    prev = c;
    acc += c;
    if (acc > (1 << 12)) return 118;
  }
  dist[omit_pos] = (i32)((1 << 12) - acc);
  return 0;
}

int parse_ans_histogram(BitReader& br, int log_alphabet_size, ParsedAns& out) {
  int table_size = 1 << log_alphabet_size;
  int log_bucket_size = ANS_PRECISION - log_alphabet_size;
  int bucket_size = 1 << log_bucket_size;
  out.log_bucket_size = log_bucket_size;
  int err = parse_ans_distribution(br, table_size, out.dist);
  if (err) return err;
  const std::vector<i32>& dist = out.dist;

  int single = -1;
  for (int i = 0; i < table_size; i++)
    if (dist[i] == (1 << ANS_PRECISION)) { single = i; break; }

  out.alias_symbol.assign(table_size, 0);
  out.alias_cutoff.assign(table_size, 0);
  out.alias_offset.assign(table_size, 0);
  if (single >= 0) {
    for (int i = 0; i < table_size; i++) {
      out.alias_symbol[i] = single;
      out.alias_offset[i] = bucket_size * i;
      out.alias_cutoff[i] = 0;
    }
    return 0;
  }
  std::vector<i32> sym(table_size), cutoff(dist), offset(table_size, 0);
  for (int i = 0; i < table_size; i++) sym[i] = i;
  std::vector<i32> underfull, overfull;
  for (int i = 0; i < table_size; i++) {
    if (dist[i] < bucket_size) underfull.push_back(i);
    else if (dist[i] > bucket_size) overfull.push_back(i);
  }
  while (!overfull.empty() && !underfull.empty()) {
    i32 o = overfull.back(); overfull.pop_back();
    i32 u = underfull.back(); underfull.pop_back();
    i32 by = bucket_size - cutoff[u];
    cutoff[o] -= by;
    sym[u] = o;
    offset[u] = cutoff[o];
    if (cutoff[o] < bucket_size) underfull.push_back(o);
    else if (cutoff[o] > bucket_size) overfull.push_back(o);
  }
  for (int i = 0; i < table_size; i++) {
    if (cutoff[i] == bucket_size) {
      out.alias_symbol[i] = i;
      out.alias_offset[i] = 0;
      out.alias_cutoff[i] = 0;
    } else {
      out.alias_symbol[i] = sym[i];
      out.alias_offset[i] = offset[i] - cutoff[i];
      out.alias_cutoff[i] = cutoff[i];
    }
  }
  return 0;
}

struct ParsedPrefix {
  i32 max_len = 0;  // 0 => single symbol in table_sym[0]
  std::vector<i32> table_sym, table_len;
};

constexpr int MAX_PREFIX_BITS_C = 15;

inline u32 reverse_bits_u32(u32 x, int n) {
  u32 r = 0;
  for (int i = 0; i < n; i++) { r = (r << 1) | (x & 1); x >>= 1; }
  return r;
}

int build_prefix_table(const std::vector<i32>& code_lengths, ParsedPrefix& out) {
  int max_len = 0;
  for (i32 l : code_lengths) if (l > max_len) max_len = (int)l;
  i64 total = 0;
  for (i32 l : code_lengths) if (l > 0) total += 1ll << (max_len - l);
  if (total != (1ll << max_len)) return 130;
  out.max_len = max_len;
  out.table_sym.assign((size_t)1 << max_len, 0);
  out.table_len.assign((size_t)1 << max_len, 0);
  u32 code = 0;
  for (int length = 1; length <= max_len; length++) {
    for (size_t s = 0; s < code_lengths.size(); s++) {
      if (code_lengths[s] != length) continue;
      u32 rev = reverse_bits_u32(code >> (max_len - length), length);
      u32 step = 1u << length;
      for (u32 k = rev; k < (1u << max_len); k += step) {
        out.table_sym[k] = (i32)s;
        out.table_len[k] = length;
      }
      code += 1u << (max_len - length);
    }
  }
  return 0;
}

void single_prefix(int symbol, ParsedPrefix& out) {
  out.max_len = 0;
  out.table_sym.assign(1, symbol);
  out.table_len.assign(1, 0);
}

inline int prefix_read_symbol(const ParsedPrefix& p, BitReader& br) {
  if (p.max_len == 0) return p.table_sym[0];
  u64 bits = br.peek(p.max_len);
  int sym = p.table_sym[bits];
  br.consume(p.table_len[bits]);
  return sym;
}

int parse_prefix_histogram(BitReader& br, u32 alphabet_size, ParsedPrefix& out) {
  if (alphabet_size == 1) { single_prefix(0, out); return 0; }
  if (alphabet_size > (1u << MAX_PREFIX_BITS_C)) return 131;
  u32 hskip = (u32)br.read(2);
  if (hskip == 1) {
    int alphabet_bits = add_log2_ceil_i(alphabet_size - 1);
    u32 nsym = (u32)br.read(2) + 1;
    if (nsym == 1) {
      u32 s = (u32)br.read(alphabet_bits);
      if (s >= alphabet_size) return 132;
      single_prefix((int)s, out);
      return 0;
    }
    u32 syms[4];
    int lens[4];
    if (nsym == 2) {
      syms[0] = (u32)br.read(alphabet_bits);
      syms[1] = (u32)br.read(alphabet_bits);
      lens[0] = lens[1] = 1;
    } else if (nsym == 3) {
      for (int i = 0; i < 3; i++) syms[i] = (u32)br.read(alphabet_bits);
      lens[0] = 1; lens[1] = lens[2] = 2;
    } else {
      for (int i = 0; i < 4; i++) syms[i] = (u32)br.read(alphabet_bits);
      if (br.read(1)) { lens[0] = 1; lens[1] = 2; lens[2] = lens[3] = 3; }
      else { lens[0] = lens[1] = lens[2] = lens[3] = 2; }
    }
    std::vector<i32> code_lengths(alphabet_size, 0);
    for (u32 i = 0; i < nsym; i++) {
      if (syms[i] >= alphabet_size) return 133;
      code_lengths[syms[i]] = lens[i];
    }
    return build_prefix_table(code_lengths, out);
  }
  // complex form
  static const int CL_ORDER[18] = {1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8,
                                   9, 10, 11, 12, 13, 14, 15};
  std::vector<i32> cl_lengths(18, 0);
  i64 bitacc = 0;
  int nonzero_count = 0, nonzero_sym = 0;
  for (u32 oi = hskip; oi < 18; oi++) {
    int cl_idx = CL_ORDER[oi];
    // read_u32(0, 4, 3, 8) over 2-bit selector
    static const u32 base[4] = {0, 4, 3, 8};
    static const int bits[4] = {0, 0, 0, 0};
    u32 bsel = read_u32_sel(br, base, bits);
    int length;
    if (bsel == 8) {
      if (br.read(1)) length = br.read(1) ? 5 : 1;
      else length = 2;
    } else {
      length = (int)bsel;
    }
    cl_lengths[cl_idx] = length;
    if (length) {
      nonzero_count++;
      nonzero_sym = cl_idx;
      bitacc += 32 >> length;
      if (bitacc == 32) break;
      if (bitacc > 32) return 134;
    }
  }
  ParsedPrefix cl_hist;
  if (nonzero_count == 1) {
    single_prefix(nonzero_sym, cl_hist);
  } else if (bitacc != 32) {
    return 135;
  } else {
    int err = build_prefix_table(cl_lengths, cl_hist);
    if (err) return err;
  }

  std::vector<i32> code_lengths(alphabet_size, 0);
  i64 acc2 = 0;
  int prev_sym = 8, last_nonzero = 8;
  i64 last_repeat = 0, repeat_count = 0;
  i32 repeat_sym = 0;
  for (u32 i = 0; i < alphabet_size; i++) {
    if (repeat_count > 0) {
      code_lengths[i] = repeat_sym;
      repeat_count--;
    } else {
      int sym = prefix_read_symbol(cl_hist, br);
      if (sym == 0) {
      } else if (sym <= 15) {
        code_lengths[i] = sym;
        last_nonzero = sym;
      } else if (sym == 16) {
        repeat_count = (i64)br.peek(2) + 3;
        br.consume(2);
        if (prev_sym == 16) {
          repeat_count += last_repeat * 3 - 8;
          last_repeat += repeat_count;
        } else {
          last_repeat = repeat_count;
        }
        repeat_sym = last_nonzero;
        code_lengths[i] = repeat_sym;
        repeat_count--;
      } else {  // 17
        repeat_count = (i64)br.peek(3) + 3;
        br.consume(3);
        if (prev_sym == 17) {
          repeat_count += last_repeat * 7 - 16;
          last_repeat += repeat_count;
        } else {
          last_repeat = repeat_count;
        }
        repeat_sym = 0;
        code_lengths[i] = 0;
        repeat_count--;
      }
      prev_sym = sym;
    }
    if (code_lengths[i]) {
      int sh = MAX_PREFIX_BITS_C - (int)code_lengths[i];
      if (sh < 0) sh = 0;
      acc2 += 1ll << sh;
      if (acc2 > (1ll << MAX_PREFIX_BITS_C)) return 136;
      if (acc2 == (1ll << MAX_PREFIX_BITS_C) && repeat_count == 0) break;
    }
  }
  if (acc2 != (1ll << MAX_PREFIX_BITS_C) || repeat_count > 0) return 137;
  return build_prefix_table(code_lengths, out);
}

struct ParsedDecoder {
  i32 lz77_enabled = 0;
  u32 min_symbol = 0, min_length = 0;
  ParsedIntCfg len_cfg{0, 0, 0};
  i32 num_clusters = 0;
  i32 use_prefix = 0;
  i32 log_alphabet_size = 0;
  std::vector<i32> cluster_map;
  std::vector<ParsedIntCfg> cfgs;
  std::vector<ParsedAns> ans;
  std::vector<ParsedPrefix> pfx;
};

int parse_decoder_rec(BitReader& br, u32 num_dist, bool allow_lz77,
                      ParsedDecoder& out);

int read_clusters_c(BitReader& br, u32 num_dist, std::vector<i32>& clusters,
                    i32& num_clusters) {
  clusters.assign(num_dist, 0);
  if (num_dist == 1) {
    num_clusters = 1;
    return 0;
  }
  if (br.read(1)) {
    int nbits = (int)br.read(2);
    for (u32 i = 0; i < num_dist; i++) clusters[i] = (i32)br.read(nbits);
  } else {
    bool use_mtf = br.read(1);
    ParsedDecoder nested;
    int err = parse_decoder_rec(br, 1, num_dist > 2, nested);
    if (err) return err;
    // run the nested decoder inline via DecoderState
    SpecHolder holder;
    std::vector<IntCfg> icfg(nested.num_clusters);
    for (int i = 0; i < nested.num_clusters; i++)
      icfg[i] = IntCfg{nested.cfgs[i].split_exponent, nested.cfgs[i].msb,
                       nested.cfgs[i].lsb};
    DecoderSpec spec;
    spec.lz77_enabled = nested.lz77_enabled;
    spec.min_symbol = nested.min_symbol;
    spec.min_length = nested.min_length;
    spec.len_cfg = IntCfg{nested.len_cfg.split_exponent, nested.len_cfg.msb,
                          nested.len_cfg.lsb};
    spec.num_dist = (i32)nested.cluster_map.size();
    spec.num_clusters = nested.num_clusters;
    spec.use_prefix = nested.use_prefix;
    spec.cluster_map = nested.cluster_map.data();
    spec.cfgs = icfg.data();
    std::vector<AnsTable> ats;
    std::vector<AnsBucket> buckets;
    std::vector<PrefixTable> pts;
    if (nested.use_prefix) {
      pts.resize(nested.num_clusters);
      for (int i = 0; i < nested.num_clusters; i++)
        pts[i] = PrefixTable{nested.pfx[i].max_len,
                             nested.pfx[i].table_sym.data(),
                             nested.pfx[i].table_len.data()};
      spec.pfx = pts.data();
      spec.ans = nullptr;
    } else {
      ats.resize(nested.num_clusters);
      i64 total = 0;
      for (int i = 0; i < nested.num_clusters; i++)
        total += 1 << (12 - nested.ans[i].log_bucket_size);
      buckets.resize(total);
      i64 bo = 0;
      for (int i = 0; i < nested.num_clusters; i++) {
        i32 lbs = nested.ans[i].log_bucket_size;
        pack_ans_buckets(lbs, nested.ans[i].dist.data(),
                         nested.ans[i].alias_symbol.data(),
                         nested.ans[i].alias_cutoff.data(),
                         nested.ans[i].alias_offset.data(),
                         buckets.data() + bo);
        ats[i] = AnsTable{lbs, buckets.data() + bo};
        bo += 1 << (12 - lbs);
      }
      spec.ans = ats.data();
      spec.pfx = nullptr;
    }
    DecoderState dec;
    dec.spec = &spec;
    dec.br = &br;
    dec.begin();
    for (u32 i = 0; i < num_dist; i++) {
      u32 b = dec.read_varint_clustered(spec.cluster_map[0], 0);
      if (dec.error) return 140;
      if (b > 255) return 141;
      clusters[i] = (i32)b;
    }
    int fin = dec.finalize();
    if (fin) return 142;
    if (use_mtf) {
      i32 mtf[256];
      for (int i = 0; i < 256; i++) mtf[i] = i;
      for (u32 i = 0; i < num_dist; i++) {
        i32 c = clusters[i];
        i32 v = mtf[c];
        clusters[i] = v;
        for (i32 j = c; j > 0; j--) mtf[j] = mtf[j - 1];
        mtf[0] = v;
      }
    }
  }
  i32 mx = 0;
  for (i32 c : clusters) if (c > mx) mx = c;
  num_clusters = mx + 1;
  // hole check
  std::vector<char> seen(num_clusters, 0);
  i32 distinct = 0;
  for (i32 c : clusters) {
    if (!seen[c]) { seen[c] = 1; distinct++; }
  }
  if (distinct != num_clusters) return 143;
  return 0;
}

int parse_decoder_rec(BitReader& br, u32 num_dist, bool allow_lz77,
                      ParsedDecoder& out) {
  bool lz77 = br.read(1);
  if (lz77 && !allow_lz77) return 150;
  if (lz77) {
    out.lz77_enabled = 1;
    static const u32 base_ms[4] = {224, 512, 4096, 8};
    static const int bits_ms[4] = {0, 0, 0, 15};
    out.min_symbol = read_u32_sel(br, base_ms, bits_ms);
    static const u32 base_ml[4] = {3, 4, 5, 9};
    static const int bits_ml[4] = {0, 0, 2, 8};
    out.min_length = read_u32_sel(br, base_ml, bits_ml);
    int err = parse_int_cfg(br, 8, out.len_cfg);
    if (err) return err;
    num_dist += 1;
  }
  i32 num_clusters = 0;
  int err = read_clusters_c(br, num_dist, out.cluster_map, num_clusters);
  if (err) return err;
  out.num_clusters = num_clusters;
  out.use_prefix = br.read(1) ? 1 : 0;
  out.log_alphabet_size = out.use_prefix ? 15 : (i32)br.read(2) + 5;
  out.cfgs.resize(num_clusters);
  for (i32 i = 0; i < num_clusters; i++) {
    err = parse_int_cfg(br, out.log_alphabet_size, out.cfgs[i]);
    if (err) return err;
  }
  if (out.use_prefix) {
    std::vector<u32> counts(num_clusters);
    for (i32 i = 0; i < num_clusters; i++) {
      if (br.read(1)) {
        int n = (int)br.read(4);
        counts[i] = 1 + (1u << n) + (u32)br.read(n);
      } else {
        counts[i] = 1;
      }
      if (counts[i] > (1u << 15)) return 151;
    }
    out.pfx.resize(num_clusters);
    for (i32 i = 0; i < num_clusters; i++) {
      err = parse_prefix_histogram(br, counts[i], out.pfx[i]);
      if (err) return err;
    }
  } else {
    out.ans.resize(num_clusters);
    for (i32 i = 0; i < num_clusters; i++) {
      err = parse_ans_histogram(br, out.log_alphabet_size, out.ans[i]);
      if (err) return err;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Parse a Decoder's tables (lz77 config, clusters, histograms) and return
// them in one self-describing i32 buffer (layout documented in
// native/__init__.py parse_decoder_native). Caller frees with
// jxlhost_free_i32. Returns 0 ok, >0 parse/validation error.
int jxlhost_parse_decoder(
    const u8* data, u64 data_len_bytes, u64* bit_pos,
    i32 num_dist, i32 allow_lz77,
    i32** out_buf, i64* out_len
) {
  BitReader br{data, data_len_bytes * 8, *bit_pos};
  ParsedDecoder d;
  int err = parse_decoder_rec(br, (u32)num_dist, allow_lz77 != 0, d);
  if (err) {
    // reads past the end zero-extend; a validation failure close to the
    // end of the buffered bytes is indistinguishable from truncation, so
    // report EOF (the Python parser raises JxlEofError at the exact read;
    // progressive feeds retry when more bytes arrive)
    if (err != 150 && br.pos + 64 > br.len_bits) return 4;
    return err;
  }
  if (br.pos > br.len_bits) return 4;

  // serialize
  std::vector<i32> buf;
  buf.push_back(d.lz77_enabled);
  buf.push_back((i32)d.min_symbol);
  buf.push_back((i32)d.min_length);
  buf.push_back(d.len_cfg.split_exponent);
  buf.push_back(d.len_cfg.msb);
  buf.push_back(d.len_cfg.lsb);
  buf.push_back((i32)d.cluster_map.size());
  buf.push_back(d.num_clusters);
  buf.push_back(d.use_prefix);
  buf.push_back(d.log_alphabet_size);
  for (i32 c : d.cluster_map) buf.push_back(c);
  for (auto& c : d.cfgs) {
    buf.push_back(c.split_exponent);
    buf.push_back(c.msb);
    buf.push_back(c.lsb);
  }
  if (d.use_prefix) {
    i64 off = 0;
    for (auto& p : d.pfx) {
      buf.push_back(p.max_len);
      buf.push_back((i32)off);
      off += p.max_len ? 2ll * ((i64)1 << p.max_len) : 2;
    }
    buf.push_back((i32)off);
    for (auto& p : d.pfx) {
      if (p.max_len == 0) {
        buf.push_back(p.table_sym[0]);
        buf.push_back(0);
      } else {
        for (i32 v : p.table_sym) buf.push_back(v);
        for (i32 v : p.table_len) buf.push_back(v);
      }
    }
  } else {
    i64 off = 0;
    for (auto& a : d.ans) {
      i32 alphabet = 1 << (ANS_PRECISION - a.log_bucket_size);
      buf.push_back(a.log_bucket_size);
      buf.push_back((i32)off);
      off += 2ll * alphabet;  // packed AnsBucket: 2 i32 words each
    }
    buf.push_back((i32)off);
    for (auto& a : d.ans) {
      i32 alphabet = 1 << (ANS_PRECISION - a.log_bucket_size);
      for (i32 i = 0; i < alphabet; i++) {
        u64 sym = (u64)(u32)a.alias_symbol[i];
        u64 v = (u64)(u32)a.alias_cutoff[i] | (sym << 13) |
                ((u64)(u32)a.alias_offset[i] << 25) |
                ((u64)(u32)a.dist[i] << 37) |
                ((u64)(u32)a.dist[sym] << 50);
        buf.push_back((i32)(u32)(v & 0xFFFFFFFF));
        buf.push_back((i32)(u32)(v >> 32));
      }
    }
  }
  i32* mem = (i32*)std::malloc(buf.size() * sizeof(i32));
  if (!mem) return 160;
  std::memcpy(mem, buf.data(), buf.size() * sizeof(i32));
  *out_buf = mem;
  *out_len = (i64)buf.size();
  *bit_pos = br.pos;
  return 0;
}

void jxlhost_free_i32(i32* p) { std::free(p); }

}  // extern "C"

// ===========================================================================
// LF-group section batch decode (jxl-frame data/lf_group.rs:35-130 +
// jxl-vardct lf.rs LfCoeff + hf_metadata.rs), fully native: modular header
// parse, local MA tree parse + flattening, channel decode, varblock
// placement and EPF sigma — one call for every LF group of a frame on the
// GIL-free worker pool. This is the stage that capped host thread scaling
// when it ran under the GIL (Python marshalling + MA parse per section).
// Sections outside the fast envelope (modular transforms present, no
// global tree available when required) return code 100 and fall back to
// the Python section parser, which is also the source of truth for exact
// error reporting (any nonzero return triggers the fallback).

namespace {

struct RawNode {
  i32 prop;  // -1 = leaf
  i32 value, left, right;
  i32 cluster, predictor, offset, multiplier;
};

// DecoderSpec built straight from a ParsedDecoder (no serialization
// round-trip through Python).
struct ParsedSpecHolder {
  DecoderSpec spec;
  std::vector<IntCfg> cfg_v;
  std::vector<AnsTable> ans_v;
  std::vector<AnsRec> rec_v;
  std::vector<PrefixTable> pfx_v;
  std::vector<AnsBucket> bucket_store;
  std::vector<i32> cluster_store;

  void build(const ParsedDecoder& d) {
    spec.lz77_enabled = d.lz77_enabled;
    spec.min_symbol = d.min_symbol;
    spec.min_length = d.min_length;
    spec.len_cfg = IntCfg{d.len_cfg.split_exponent, d.len_cfg.msb,
                          d.len_cfg.lsb};
    spec.num_dist = (i32)d.cluster_map.size();
    spec.num_clusters = d.num_clusters;
    spec.use_prefix = d.use_prefix;
    cluster_store = d.cluster_map;
    spec.cluster_map = cluster_store.data();
    cfg_v.resize(d.num_clusters);
    for (i32 i = 0; i < d.num_clusters; i++)
      cfg_v[i] = IntCfg{d.cfgs[i].split_exponent, d.cfgs[i].msb,
                        d.cfgs[i].lsb};
    spec.cfgs = cfg_v.data();
    if (d.use_prefix) {
      pfx_v.resize(d.num_clusters);
      for (i32 i = 0; i < d.num_clusters; i++) {
        const ParsedPrefix& p = d.pfx[i];
        pfx_v[i] = PrefixTable{p.max_len, p.table_sym.data(),
                               p.table_len.data()};
      }
      spec.pfx = pfx_v.data();
      spec.ans = nullptr;
      spec.recs = nullptr;
    } else {
      size_t total = 0;
      for (i32 i = 0; i < d.num_clusters; i++)
        total += (size_t)1 << (12 - d.ans[i].log_bucket_size);
      bucket_store.resize(total);
      ans_v.resize(d.num_clusters);
      rec_v.resize(d.num_clusters);
      size_t off = 0;
      for (i32 i = 0; i < d.num_clusters; i++) {
        const ParsedAns& a = d.ans[i];
        i32 alphabet = 1 << (12 - a.log_bucket_size);
        pack_ans_buckets(a.log_bucket_size, a.dist.data(),
                         a.alias_symbol.data(), a.alias_cutoff.data(),
                         a.alias_offset.data(), bucket_store.data() + off);
        ans_v[i] = AnsTable{a.log_bucket_size, bucket_store.data() + off};
        rec_v[i] = AnsRec{ans_v[i].buckets, (u32)a.log_bucket_size,
                          1u << cfg_v[i].split_exponent, (u32)cfg_v[i].msb,
                          (u32)cfg_v[i].lsb, (u32)cfg_v[i].split_exponent, 0};
        off += (size_t)alphabet;
      }
      spec.ans = ans_v.data();
      spec.recs = rec_v.data();
      spec.pfx = nullptr;
    }
  }
};

// Literal single token of a cluster, or -1 (Decoder::single_token).
static i32 parsed_single_token(const ParsedDecoder& d, i32 cluster) {
  if (d.lz77_enabled) return -1;
  i32 sym = -1;
  if (d.use_prefix) {
    const ParsedPrefix& p = d.pfx[cluster];
    if (p.max_len == 0) sym = p.table_sym[0];
  } else {
    const ParsedAns& a = d.ans[cluster];
    i32 found = -1;
    for (size_t s = 0; s < a.dist.size(); s++) {
      if (a.dist[s] != 0) {
        if (found >= 0) { found = -2; break; }
        found = (i32)s;
      }
    }
    if (found >= 0 && a.dist[found] == 4096) sym = found;
  }
  if (sym < 0) return -1;
  return (u32)sym < (1u << d.cfgs[cluster].split_exponent) ? sym : -1;
}

// MA tree parse (jxl-modular ma.rs via coding/entropy; mirrors
// models/modular_ma.py MaConfig.__init__): 6-context token stream, node
// and depth limits, then the sample distribution set. Leaf clusters are
// resolved through the sample decoder's cluster map.
static int parse_ma_tree_native(BitReader& br, i64 node_limit,
                                std::vector<RawNode>& nodes,
                                ParsedSpecHolder& dist_holder,
                                MemGuard& mem) {
  ParsedDecoder pd;
  int err = parse_decoder_rec(br, 6, true, pd);
  if (err) return err;
  ParsedSpecHolder th;
  th.build(pd);
  // infinite-tree guard (ma.rs is_infinite_tree_dist)
  {
    i32 c1 = pd.cluster_map[1];
    i32 tok = parsed_single_token(pd, c1);
    if (tok > 0) return 152;
  }
  DecoderState dec;
  dec.spec = &th.spec;
  dec.br = &br;
  dec.begin();

  struct TmpNode { i32 kind, a, b, pred, off, mult; };  // kind 0=d, 1=leaf
  std::vector<TmpNode> raw;
  i32 ctx = 0;
  i64 nodes_left = 1;
  while (nodes_left > 0) {
    if ((i64)raw.size() >= (1ll << 26) || (i64)raw.size() > node_limit)
      return 153;
    if ((raw.size() & 1023) == 0) {
      if (!mem.acquire(1024 * (i64)sizeof(TmpNode))) return 12;
    }
    nodes_left--;
    u32 prop_plus1 = dec.read_varint_clustered(th.spec.cluster_map[1], 0);
    if (prop_plus1 > 0) {
      u32 v = dec.read_varint_clustered(th.spec.cluster_map[0], 0);
      raw.push_back(TmpNode{0, (i32)(prop_plus1 - 1), unpack_signed(v),
                            0, 0, 0});
      nodes_left += 2;
    } else {
      u32 predictor = dec.read_varint_clustered(th.spec.cluster_map[2], 0);
      if (predictor > 13) return 154;
      u32 off_u = dec.read_varint_clustered(th.spec.cluster_map[3], 0);
      u32 mul_log = dec.read_varint_clustered(th.spec.cluster_map[4], 0);
      if (mul_log > 30) return 155;
      u32 mul_bits = dec.read_varint_clustered(th.spec.cluster_map[5], 0);
      if (mul_bits > (1u << (31 - mul_log)) - 2) return 156;
      raw.push_back(TmpNode{1, ctx, 0, (i32)predictor, unpack_signed(off_u),
                            (i32)((mul_bits + 1) << mul_log)});
      ctx++;
    }
    if (dec.error) return 10 + dec.error;
  }
  if (br.pos > br.len_bits) return 4;
  int fin = dec.finalize();
  if (fin) return fin;

  // sample distribution set
  ParsedDecoder pd2;
  err = parse_decoder_rec(br, (u32)(ctx > 0 ? ctx : 1), true, pd2);
  if (err) return err;
  dist_holder.build(pd2);

  // link children (BFS slot order; models/modular_ma.py:183-208)
  i64 n = (i64)raw.size();
  if (!mem.acquire(n * (i64)(sizeof(RawNode) + 4))) return 12;
  nodes.resize(n);
  std::vector<i32> depths(n, 1);
  i64 child_ptr = 1;
  for (i64 i = 0; i < n; i++) {
    const TmpNode& t = raw[i];
    if (t.kind == 0) {
      i64 left = child_ptr, right = child_ptr + 1;
      child_ptr += 2;
      if (right >= n) return 157;  // malformed (cannot happen: counts match)
      nodes[i] = RawNode{t.a, t.b, (i32)left, (i32)right, 0, 0, 0, 0};
      depths[left] = depths[i] + 1;
      depths[right] = depths[i] + 1;
      if (depths[i] + 1 > 2048) return 158;
    } else {
      i32 cluster = dist_holder.spec.cluster_map[t.a];
      nodes[i] = RawNode{-1, 0, 0, 0, cluster, t.pred, t.off, t.mult};
    }
  }
  return 0;
}

// Static pruning + BFS flatten of one (channel, stream, prev) tree into
// the TreeNode layout the channel decoder consumes
// (models/modular_ma.py make_flat_tree / _resolve_static).
static int flatten_tree(const RawNode* nodes, i64 n, i32 channel,
                        i32 stream, i32 prev,
                        std::vector<TreeNode>& out, i32& need_wp,
                        i32& max_prev) {
  bool bad = false;
  auto resolve = [&](i32 idx) {
    // cycle guard: trees built by the parsers are acyclic (children
    // always have larger indices), but defend against malformed node
    // arrays — a self-cycle here would spin forever
    i64 steps = 0;
    for (;;) {
      if (idx < 0 || idx >= n || ++steps > n + 4) { bad = true; return 0; }
      const RawNode& nd = nodes[idx];
      if (nd.prop == -1) return idx;
      if (nd.prop == 0) idx = channel > nd.value ? nd.left : nd.right;
      else if (nd.prop == 1) idx = stream > nd.value ? nd.left : nd.right;
      else if (nd.prop >= 16 && (nd.prop - 16) / 4 >= prev)
        idx = nd.value < 0 ? nd.left : nd.right;
      else return idx;
    }
  };
  out.clear();
  need_wp = 0;
  max_prev = 0;
  std::vector<i32> mapping((size_t)n, -1);
  std::vector<i32> order;
  auto visit = [&](i32 idx) {
    idx = resolve(idx);
    if (mapping[idx] >= 0) return mapping[idx];
    i32 slot = (i32)order.size();
    mapping[idx] = slot;
    order.push_back(idx);
    out.push_back(TreeNode{});
    return slot;
  };
  visit(0);
  for (size_t i = 0; i < order.size(); i++) {
    if (bad) return 159;
    const RawNode& nd = nodes[order[i]];
    if (nd.prop == -1) {
      out[i] = TreeNode{1, nd.cluster, nd.predictor, nd.offset,
                        nd.multiplier};
      if (nd.predictor == 6) need_wp = 1;
    } else {
      i32 li = visit(nd.left);
      i32 ri = visit(nd.right);
      out[i] = TreeNode{0, nd.prop, nd.value, li, ri};
      if (nd.prop == 15) need_wp = 1;
      if (nd.prop >= 16) {
        i32 d = (nd.prop - 16) / 4 + 1;
        if (d > max_prev) max_prev = d;
      }
    }
  }
  return bad ? 159 : 0;
}

struct SubChan {
  void* buf;
  i64 stride;
  i32 width, height, hshift, vshift;
};

// One modular sub-stream fully in C++: header, (local) MA tree, flatten,
// channel decode. Mirrors models/modular.py ModularImage.__init__ +
// ModularSubimage._decode_inner for the transform-free envelope.
static int decode_subimage_native(BitReader& br, SubChan* sc, int n,
                                  i32 stream_index,
                                  const RawNode* gnodes, i64 n_gnodes,
                                  const DecoderSpec* gspec,
                                  MemGuard& mem) {
  bool use_global = br.read(1) != 0;
  WpParams wpp;
  if (br.read(1)) {
    wpp.p1 = 16; wpp.p2 = 10;
    wpp.p3a = wpp.p3b = wpp.p3c = 7;
    wpp.p3d = wpp.p3e = 0;
    wpp.w[0] = 13; wpp.w[1] = 12; wpp.w[2] = 12; wpp.w[3] = 12;
  } else {
    wpp.p1 = (i32)br.read(5); wpp.p2 = (i32)br.read(5);
    wpp.p3a = (i32)br.read(5); wpp.p3b = (i32)br.read(5);
    wpp.p3c = (i32)br.read(5); wpp.p3d = (i32)br.read(5);
    wpp.p3e = (i32)br.read(5);
    for (int i = 0; i < 4; i++) wpp.w[i] = (i32)br.read(4);
  }
  static const u32 base_nt[4] = {0, 1, 2, 18};
  static const int bits_nt[4] = {0, 0, 4, 8};
  u32 nb_transforms = read_u32_sel(br, base_nt, bits_nt);
  if (nb_transforms != 0) return 100;  // Python fallback envelope

  std::vector<RawNode> local_nodes;
  ParsedSpecHolder local_holder;
  const RawNode* nodes;
  i64 nn;
  const DecoderSpec* spec;
  if (use_global) {
    if (!gnodes || n_gnodes <= 0 || !gspec) return 101;
    nodes = gnodes;
    nn = n_gnodes;
    spec = gspec;
  } else {
    i64 samples = 0;
    for (int c = 0; c < n; c++) samples += (i64)sc[c].width * sc[c].height;
    i64 node_limit = 1024 + samples;
    if (node_limit > (1 << 20)) node_limit = 1 << 20;
    int err = parse_ma_tree_native(br, node_limit, local_nodes,
                                  local_holder, mem);
    if (err) return err;
    nodes = local_nodes.data();
    nn = (i64)local_nodes.size();
    spec = &local_holder.spec;
  }

  std::vector<std::vector<TreeNode>> trees(n);
  std::vector<ChannelDesc> chans(n);
  std::vector<const void*> prev_bufs;
  std::vector<i64> prev_strides;
  std::vector<std::pair<i32, i32>> prev_off_cnt(n);
  i32 dist_multiplier = 0;
  // first pass: flatten + prev bookkeeping (same-shape preceding
  // channels, most recent first, truncated to the tree's prev depth)
  for (int c = 0; c < n; c++) {
    if (sc[c].width > dist_multiplier) dist_multiplier = sc[c].width;
    i32 prev_count = 0;
    for (int p = 0; p < c; p++)
      if (sc[p].width == sc[c].width && sc[p].height == sc[c].height &&
          sc[p].hshift == sc[c].hshift && sc[p].vshift == sc[c].vshift)
        prev_count++;
    i32 need_wp = 0, max_prev = 0;
    int ferr = flatten_tree(nodes, nn, c, stream_index, prev_count,
                            trees[c], need_wp, max_prev);
    if (ferr) return ferr;
    i32 use_prev = max_prev < prev_count ? max_prev : prev_count;
    prev_off_cnt[c] = {(i32)prev_bufs.size(), use_prev};
    // collect same-shape preceding channels, most recent first
    for (int p = c - 1; p >= 0 && (i32)(prev_bufs.size() -
                                        prev_off_cnt[c].first) < use_prev;
         p--) {
      if (sc[p].width == sc[c].width && sc[p].height == sc[c].height &&
          sc[p].hshift == sc[c].hshift && sc[p].vshift == sc[c].vshift) {
        prev_bufs.push_back(sc[p].buf);
        prev_strides.push_back(sc[p].stride);
      }
    }
    ChannelDesc& cd = chans[c];
    cd.buf = sc[c].buf;
    cd.stride = sc[c].stride;
    cd.width = sc[c].width;
    cd.height = sc[c].height;
    cd.tree = trees[c].data();
    cd.tree_len = (i32)trees[c].size();
    cd.need_wp = need_wp;
    cd.num_prev = use_prev;
    cd.is16 = 0;
  }
  for (int c = 0; c < n; c++) {
    chans[c].prev_bufs = prev_bufs.data() + prev_off_cnt[c].first;
    chans[c].prev_strides = prev_strides.data() + prev_off_cnt[c].first;
  }

  DecoderState dec;
  dec.spec = spec;
  dec.br = &br;
  dec.begin();
  return decode_modular_stream_core(dec, br, chans.data(), n,
                                    dist_multiplier, wpp);
}

}  // namespace

extern "C" {

// Zero-fill many buffers with the worker pool: numpy's calloc planes are
// lazily faulted, so a fresh 200 MB coefficient allocation pays its page
// faults inside the (partly serialized) decode writes; pre-faulting with
// all cores turns that into a parallel memset.
void jxlhost_memzero_batch(void* const* ptrs, const u64* sizes, i32 n,
                           i32 n_threads) {
  const u64 CHUNK = 4u << 20;
  struct Piece { char* p; u64 len; };
  std::vector<Piece> pieces;
  for (i32 i = 0; i < n; i++) {
    char* base = (char*)ptrs[i];
    for (u64 off = 0; off < sizes[i]; off += CHUNK) {
      u64 len = sizes[i] - off < CHUNK ? sizes[i] - off : CHUNK;
      pieces.push_back(Piece{base + off, len});
    }
  }
  i32 nt = n_threads < (i32)pieces.size() ? n_threads : (i32)pieces.size();
  if (nt <= 1) {
    for (auto& pc : pieces) std::memset(pc.p, 0, pc.len);
    return;
  }
  std::atomic<i32> next{0};
  auto worker = [&]() {
    for (;;) {
      i32 k = next.fetch_add(1, std::memory_order_relaxed);
      if (k >= (i32)pieces.size()) break;
      std::memset(pieces[k].p, 0, pieces[k].len);
    }
  };
  worker_pool().run(nt, worker);
}

// Decode MANY LF-group sections in one call. sec_ret[k] == 0 on success;
// any nonzero value means "re-decode section k in Python" (100/101 =
// outside the native envelope, other codes = stream errors whose exact
// exception the Python parser reproduces).
int jxlhost_decode_lf_groups_batch(
    // global MA tree + its sample decoder spec (absent: n_gnodes == 0)
    const i32* gnodes_flat, i64 n_gnodes,
    const i32* gspec_header, const i32* gcluster_map, const i32* gcfgs,
    const i32* gans_meta, const i32* gans_blob,
    const i32* gpfx_meta, const i32* gpfx_blob,
    // frame params
    i32 num_lf_groups,
    const i32* hshifts, const i32* vshifts,  // [3] channels x, y, b
    i32 epf_enabled, double sigma_base, const double* sharp_lut,  // [8]
    const i32* select_sizes, i32 num_types,  // [num_types*2]: (dw, dh)
    i32 group_blocks,                        // group_dim / 8
    // sections
    i32 n_sections,
    const u8* const* sec_data, const u64* sec_len_bytes,
    const i32* sec_meta,   // [n*6]: lf_idx, bw, bh, w64, h64, has_lf_coeff
    // LfCoeff outputs: 3 strided views per section, STREAM order (y,x,b)
    const i32* lf_dims,    // [n*6]: (w, h) per stream channel
    void* const* lf_bufs, const i64* lf_strides,   // [n*3]
    // HfMetadata outputs (contiguous, pre-zeroed from Python)
    i32* const* xfy_bufs, i32* const* bfy_bufs,    // [h64*w64]
    signed char* const* sel_bufs,                  // [bh*bw], filled here
    i32* const* mul_bufs,                          // [bh*bw]
    float* const* sigma_bufs,                      // [bh*bw]
    i32* out_extra_precision, u64* out_bit_pos, i32* sec_ret,
    i32 n_threads) {
  // stream-order channel shifts for LfCoeff: (y, x, b) = channels 1, 0, 2
  const i32 ord[3] = {1, 0, 2};

  auto run_section = [&](i32 k) -> int {
    MemGuard mem;
    BitReader br{sec_data[k], sec_len_bytes[k] * 8, 0};
    i32 lf_idx = sec_meta[k * 6 + 0];
    i32 bw = sec_meta[k * 6 + 1], bh = sec_meta[k * 6 + 2];
    i32 w64 = sec_meta[k * 6 + 3], h64 = sec_meta[k * 6 + 4];
    i32 has_lf = sec_meta[k * 6 + 5];
    if (!has_lf) return 100;  // use_lf_frame sections: Python path

    // global spec holder is built per worker lazily below (thread-safe:
    // each section builds its own — cost is tiny vs the decode)
    SpecHolder gholder;
    const DecoderSpec* gspec = nullptr;
    if (n_gnodes > 0) {
      gholder.build(gspec_header, gcluster_map, gcfgs, gans_meta, gans_blob,
                    gpfx_meta, gpfx_blob);
      gspec = &gholder.spec;
    }

    // ---- LfCoeff (lf.rs:118-182) ----
    out_extra_precision[k] = (i32)br.read(2);
    SubChan lc[3];
    for (int s = 0; s < 3; s++) {
      i32 c = ord[s];
      lc[s].buf = lf_bufs[k * 3 + s];
      lc[s].stride = lf_strides[k * 3 + s];
      lc[s].width = lf_dims[k * 6 + s * 2];
      lc[s].height = lf_dims[k * 6 + s * 2 + 1];
      lc[s].hshift = hshifts[c];
      lc[s].vshift = vshifts[c];
    }
    int err = decode_subimage_native(br, lc, 3, 1 + lf_idx,
                                     (const RawNode*)gnodes_flat, n_gnodes,
                                     gspec, mem);
    if (err) return err;

    // ---- HfMetadata (hf_metadata.rs) ----
    i64 grid = (i64)bw * bh;
    u32 nbits = 0;
    { u32 v = (u32)(grid - 1); while (v) { nbits++; v >>= 1; } }
    i64 nb_blocks = 1 + (i64)br.read((int)nbits);
    if (!mem.acquire((nb_blocks * 2 + grid) * 4)) return 12;
    std::vector<i32> block_info((size_t)(nb_blocks * 2));
    std::vector<i32> sharpness((size_t)grid);
    SubChan hc[4];
    hc[0] = SubChan{xfy_bufs[k], w64, w64, h64, 0, 0};
    hc[1] = SubChan{bfy_bufs[k], w64, w64, h64, 0, 0};
    hc[2] = SubChan{block_info.data(), nb_blocks, (i32)nb_blocks, 2, 0, 0};
    hc[3] = SubChan{sharpness.data(), bw, bw, bh, 0, 0};
    err = decode_subimage_native(br, hc, 4, 1 + 2 * num_lf_groups + lf_idx,
                                 (const RawNode*)gnodes_flat, n_gnodes,
                                 gspec, mem);
    if (err) return err;
    if (br.pos > br.len_bits) return 4;

    // ---- varblock placement + EPF sigma ----
    if (!mem.acquire(grid * 4)) return 12;
    std::vector<i32> mul_full((size_t)grid, 0);
    std::memset(sel_bufs[k], 0xFF, (size_t)grid);  // -1
    std::memset(mul_bufs[k], 0, (size_t)grid * 4);
    err = jxlhost_place_varblocks(block_info.data(), nb_blocks, bh, bw,
                                  group_blocks, select_sizes, num_types,
                                  sel_bufs[k], mul_bufs[k], mul_full.data());
    if (err) return 200 + err;
    if (epf_enabled) {
      // float32 chain, matching the Python/native sigma computation
      // (np.float32(sigma_base) / f32(mul) * f32(lut)) bit for bit
      float* sg = sigma_bufs[k];
      float sb = (float)sigma_base;
      float lutf[8];
      for (int i = 0; i < 8; i++) lutf[i] = (float)sharp_lut[i];
      for (i64 i = 0; i < grid; i++) {
        i32 mf = mul_full[i];
        if (mf > 0) {
          i32 sh = sharpness[i];
          if (sh < 0 || sh >= 8) return 210;
          float r = sb / (float)mf;
          sg[i] = r * lutf[sh];
        } else {
          sg[i] = 0.0f;
        }
      }
    }
    out_bit_pos[k] = br.pos;
    return 0;
  };

  i32 nt = (n_threads <= 1 || n_sections <= 1)
               ? 1
               : (n_threads < n_sections ? n_threads : n_sections);
  std::atomic<i32> next{0};
  auto worker = [&]() {
    for (;;) {
      i32 k = next.fetch_add(1, std::memory_order_relaxed);
      if (k >= n_sections) break;
      sec_ret[k] = run_section(k);
    }
  };
  worker_pool().run(nt, worker);
  return 0;
}

}  // extern "C"
