// Native host kernels for the serial hot loops of the Pco codec.
//
// The reference keeps these loops fast with carefully shaped scalar Rust
// (ref: pco/src/page_latent_decompressor.rs:89-139,
//  chunk_latent_compressor.rs:96-132, delta/lookback.rs:101-164). Here they
// are C++ with the same wire semantics, driven from Python via ctypes. The
// TPU path (pcodec_tpu/ops) is independent of this module; these kernels
// serve the host/CLI runtime and the encoder.
//
// Build: g++ -O3 -march=native -shared -fPIC pco_kernels.cpp -o libpco_kernels.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

static inline uint64_t u64_at(const uint8_t* src, size_t byte_idx) {
  uint64_t v;
  std::memcpy(&v, src + byte_idx, 8);
  return v;  // little-endian hosts only (x86/arm64)
}

extern "C" {

// Decode one batch (<= 256 symbols) of a 4-stream interleaved tANS section.
// node_packed[i] = bits_to_read | offset_bits << 4 | next_state_idx_base << 11
// Returns the new absolute bit index. states[4] updated in place;
// out_lowers/out_ob filled for batch_n symbols.
long long pco_ans_decode_batch(
    const uint8_t* src,
    long long bit_idx,
    int batch_n,
    uint32_t* states,
    const int32_t* node_packed,
    const uint64_t* state_lowers,
    uint64_t* out_lowers,
    int64_t* out_ob) {
  size_t stale_byte = (size_t)(bit_idx >> 3);
  uint32_t bits_past = (uint32_t)(bit_idx & 7);
  uint32_t s0 = states[0], s1 = states[1], s2 = states[2], s3 = states[3];
  int i = 0;
  // full quads: one u64 window feeds all four streams (4 * 14 <= 57 bits)
  for (; i + 4 <= batch_n; i += 4) {
    stale_byte += bits_past >> 3;
    bits_past &= 7;
    uint64_t packed = u64_at(src, stale_byte);
#define PCO_SYM(j, st)                                          \
    {                                                           \
      int32_t node = node_packed[st];                           \
      uint32_t nbits = (uint32_t)(node & 15);                   \
      uint32_t val = (uint32_t)(packed >> bits_past) &          \
                     ((1u << nbits) - 1u);                      \
      out_lowers[i + j] = state_lowers[st];                     \
      out_ob[i + j] = (node >> 4) & 127;                        \
      bits_past += nbits;                                       \
      st = (uint32_t)(node >> 11) + val;                        \
    }
    PCO_SYM(0, s0)
    PCO_SYM(1, s1)
    PCO_SYM(2, s2)
    PCO_SYM(3, s3)
  }
  // ragged tail
  uint32_t st4[4] = {s0, s1, s2, s3};
  for (; i < batch_n; i++) {
    stale_byte += bits_past >> 3;
    bits_past &= 7;
    uint64_t packed = u64_at(src, stale_byte);
    uint32_t& st = st4[i & 3];
    int32_t node = node_packed[st];
    uint32_t nbits = (uint32_t)(node & 15);
    uint32_t val = (uint32_t)(packed >> bits_past) & ((1u << nbits) - 1u);
    out_lowers[i] = state_lowers[st];
    out_ob[i] = (node >> 4) & 127;
    bits_past += nbits;
    st = (uint32_t)(node >> 11) + val;
  }
  states[0] = st4[0];
  states[1] = st4[1];
  states[2] = st4[2];
  states[3] = st4[3];
  return ((long long)stale_byte << 3) + (long long)bits_past;
}

// Gather offsets at prefix-summed bit positions and add them to latents.
// Equivalent to the vectorized read_offsets pass.
void pco_read_offsets_u64(
    const uint8_t* src,
    long long base_bit_idx,
    int n,
    const int64_t* ob,        // offset bits per element
    uint64_t* latents) {      // in-out: += offset
  long long bit = base_bit_idx;
  for (int i = 0; i < n; i++) {
    uint32_t nbits = (uint32_t)ob[i];
    if (nbits > 0) {
      size_t byte = (size_t)(bit >> 3);
      uint32_t sh = (uint32_t)(bit & 7);
      uint64_t w = u64_at(src, byte) >> sh;
      if (nbits > 57) {
        // second window overlapping by one byte (avoids shift-by-64)
        uint64_t w2 = u64_at(src, byte + 7) << (56 - sh);
        w |= w2;
      }
      uint64_t mask = nbits >= 64 ? ~0ull : ((1ull << nbits) - 1ull);
      latents[i] += w & mask;
    }
    bit += ob[i];
  }
}

// Reverse-order 4-stream interleaved tANS encode of one page body.
// next_states_flat: concatenated per-symbol next-state arrays;
// next_off[s] is the start of symbol s's array; weights[s] its length.
static inline uint64_t rotl64(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }

// Xoroshiro128++ stream (rand_xoshiro semantics) for deterministic sampling
// (ref: pco/src/sampling.rs:19-63 uses Xoroshiro128PlusPlus::seed_from_u64(0)).
void pco_xoroshiro_fill(uint64_t s0, uint64_t s1, long long count, uint64_t* out) {
  for (long long i = 0; i < count; i++) {
    out[i] = rotl64(s0 + s1, 17) + s0;
    s1 ^= s0;
    s0 = rotl64(s0, 49) ^ s1 ^ (s1 << 21);
    s1 = rotl64(s1, 28);
  }
}

void pco_ans_encode_reverse(
    const int64_t* symbols,
    long long n,
    const uint32_t* min_renorm,
    const uint32_t* cutoff,
    const uint32_t* next_states_flat,
    const int64_t* next_off,
    const uint32_t* weights,
    uint64_t* ans_vals,
    int64_t* ans_bits,
    uint32_t* final_states) {  // in-out, 4 entries, start = default state
  uint32_t st[4] = {final_states[0], final_states[1], final_states[2],
                    final_states[3]};
  for (long long i = n - 1; i >= 0; i--) {
    int j = (int)(i & 3);
    int64_t s = symbols[i];
    uint32_t renorm = min_renorm[s] + (st[j] >= cutoff[s] ? 1u : 0u);
    ans_vals[i] = st[j] & ((1u << renorm) - 1u);
    ans_bits[i] = renorm;
    st[j] = next_states_flat[next_off[s] + (st[j] >> renorm) - weights[s]];
  }
  final_states[0] = st[0];
  final_states[1] = st[1];
  final_states[2] = st[2];
  final_states[3] = st[3];
}

// Bit-pack values at sequential positions into dst (write_batch).
void pco_write_bits(
    const uint64_t* vals,
    const int64_t* bitlens,
    long long n,
    long long start_bit,
    uint8_t* dst) {
  long long bit = start_bit;
  for (long long i = 0; i < n; i++) {
    size_t byte = (size_t)(bit >> 3);
    uint32_t sh = (uint32_t)(bit & 7);
    uint64_t lo = vals[i] << sh;
    uint64_t cur;
    std::memcpy(&cur, dst + byte, 8);
    cur |= lo;
    std::memcpy(dst + byte, &cur, 8);
    if (sh > 0) {
      uint8_t hi = (uint8_t)(vals[i] >> (64 - sh));
      dst[byte + 8] |= hi;
    }
    bit += bitlens[i];
  }
}

// Copy `nbits` bits from src (starting at src_bit) into dst (starting at
// dst_bit). LSB-first bit order (the pco wire order). dst must be zeroed
// past dst_bit; dst needs 8 writable bytes beyond its last touched byte.
static void copy_bits(uint8_t* dst, long long dst_bit,
                      const uint8_t* src, long long src_bit,
                      long long nbits) {
  while (nbits > 0) {
    size_t sbyte = (size_t)(src_bit >> 3);
    uint32_t ssh = (uint32_t)(src_bit & 7);
    uint64_t w;
    std::memcpy(&w, src + sbyte, 8);
    w >>= ssh;
    long long take = 64 - (long long)ssh;
    if (take > nbits) take = nbits;
    if (take < 64) w &= (take == 64) ? ~0ull : ((1ull << take) - 1ull);
    size_t dbyte = (size_t)(dst_bit >> 3);
    uint32_t dsh = (uint32_t)(dst_bit & 7);
    uint64_t cur;
    std::memcpy(&cur, dst + dbyte, 8);
    cur |= w << dsh;
    std::memcpy(dst + dbyte, &cur, 8);
    if (dsh > 0) {
      uint8_t hi = (uint8_t)(w >> (64 - dsh));
      dst[dbyte + 8] |= hi;
    }
    src_bit += take;
    dst_bit += take;
    nbits -= take;
  }
}

// Interleave per-var packed section streams into one page body stream:
// for each batch b, for each var v: [ans bits][offset bits] (the wrapped
// page body order, ref: page_decompressor.rs batch loop). seclens is
// [var][2][batch] bit lengths; each var's src cursor starts at bit 0.
// Returns total bits written.
extern "C" long long pco_interleave_sections(
    const uint8_t** srcs,
    const int64_t* seclens,
    long long n_vars,
    long long n_batches,
    uint8_t* dst,
    long long dst_start_bit) {
  long long dbit = dst_start_bit;
  std::vector<long long> sbit((size_t)n_vars, 0);
  for (long long b = 0; b < n_batches; b++) {
    for (long long v = 0; v < n_vars; v++) {
      const int64_t* sl = seclens + v * 2 * n_batches;
      long long abits = sl[b];
      long long obits = sl[n_batches + b];
      if (abits + obits == 0) continue;
      copy_bits(dst, dbit, srcs[v], sbit[(size_t)v], abits + obits);
      sbit[(size_t)v] += abits + obits;
      dbit += abits + obits;
    }
  }
  return dbit - dst_start_bit;
}

// The lookback proposal/scoring loop (ref: delta/lookback.rs:101-164).
// Exact same candidate generation and goodness scoring; latents passed as
// u64 (value semantics identical for all latent widths given `bits`).
void pco_choose_lookbacks(
    const uint64_t* latents,
    long long n,
    int bits,
    int state_n,
    int window_n_log,
    uint32_t* out_lookbacks) {  // length n - state_n
  const int PROPOSED = 16;
  const int BRUTE = 6;
  const int REPEATING = 4;
  long long window_n = 1ll << window_n_log;
  long long hash_table_n = 1ll << (window_n_log + 1);
  long long hash_mask = hash_table_n - 1;
  uint64_t value_mask = bits >= 64 ? ~0ull : ((1ull << bits) - 1ull);

  long long counts_len = window_n < n ? window_n : n;
  uint32_t* lookback_counts = new uint32_t[counts_len];
  for (long long i = 0; i < counts_len; i++) lookback_counts[i] = 1;
  long long* idx_hash = new long long[2 * hash_table_n]();

  long long proposed[PROPOSED];
  for (int i = 0; i < PROPOSED; i++)
    proposed[i] = (i + 1) < state_n ? (i + 1) : state_n;
  long long best_lookback = 1;
  long long repeating_idx = 0;

  auto hash_fn = [hash_mask](uint64_t x) -> long long {
    x = (x ^ (x >> 32)) * 11400714819323197441ull;
    x = x ^ (x >> 32);
    return (long long)(x & (uint64_t)hash_mask);
  };

  for (long long i = state_n; i < n; i++) {
    uint64_t l = latents[i];

    long long new_brute = i < PROPOSED ? i : PROPOSED;
    proposed[new_brute - 1] = new_brute;

    int prop_idx = BRUTE + REPEATING;
    long long offset = 0;
    for (int ci = 0; ci < 2; ci++) {
      int coarseness = ci == 0 ? 0 : 8;
      uint64_t bucket = l >> coarseness;
      long long h0 = hash_fn(bucket - 1);
      long long h1 = hash_fn(bucket);
      long long h2 = hash_fn(bucket + 1);
      long long hs[3] = {h0, h1, h2};
      for (int k = 0; k < 3; k++) {
        long long lb_last = i - idx_hash[offset + hs[k]];
        proposed[prop_idx] =
            lb_last <= window_n ? lb_last : (prop_idx < i ? prop_idx : i);
        prop_idx++;
      }
      idx_hash[offset + h1] = i;
      offset += hash_table_n;
    }

    uint32_t best_goodness = 0;
    long long best = 0;
    for (int k = 0; k < PROPOSED; k++) {
      long long lb = proposed[k];
      uint32_t count = lookback_counts[lb - 1];
      uint64_t other = latents[i - lb];
      uint32_t lookback_goodness = 32 - __builtin_clz(count);
      uint64_t d1 = (l - other) & value_mask;
      uint64_t d2 = (other - l) & value_mask;
      uint64_t delta = d1 < d2 ? d1 : d2;
      uint32_t delta_goodness =
          delta == 0 ? (uint32_t)bits
                     : (uint32_t)bits - (64 - __builtin_clzll(delta));
      uint32_t goodness = lookback_goodness + delta_goodness;
      if (goodness > best_goodness) {
        best_goodness = goodness;
        best = lb;
      }
    }

    if (best != best_lookback) repeating_idx++;
    proposed[BRUTE + (repeating_idx % REPEATING)] = best;
    best_lookback = best;
    out_lookbacks[i - state_n] = (uint32_t)best;
    lookback_counts[best - 1] += 1;
  }

  delete[] lookback_counts;
  delete[] idx_hash;
}

// Decode an entire page's pre-delta latents for up to 3 interleaved latent
// vars in one call (the per-batch var interleaving of the page body,
// spec: docs/format.md "Page"). Outputs latent = bin.lower + offset per var.
// Returns the final absolute bit index, or -1 if the reader overran
// `size_bits` mid-way (truncated input).
long long pco_decode_page_pre_delta(
    const uint8_t* src,
    long long size_bits,     // unpadded input size in bits
    long long bit_idx,       // body start
    long long n,             // numbers in page
    int n_vars,              // 1..3 in file order (delta, primary, secondary)
    const int32_t* const* nodes,       // per var packed node tables
    const uint64_t* const* state_lowers,
    uint32_t* states,        // n_vars * 4, in-out
    const long long* var_state_n,      // per var n_latents_per_state
    long long primary_state_n,         // delta-var batch limit uses this
    const int* is_delta_var,           // per var: 1 if the delta latent var
    const int* n_bins,                 // per var
    const uint64_t* single_lower,      // per var: lower when n_bins <= 1
    const int64_t* single_ob,          // per var: offset bits when n_bins == 1
    uint64_t* const* out_latents,      // per var, capacity body_n (+pad 256)
    long long* out_counts,             // per var: latents written
    // optional per-(batch, var) capture for the device-chain planner
    // (pass nullptrs to skip): cursors = (ans_start_bit, off_start_bit)
    // pairs, states = the 4 ANS state idxs at each batch entry
    int64_t* out_batch_cursors,        // [ceil(n/256) * n_vars * 2] or null
    uint32_t* out_batch_states) {      // [ceil(n/256) * n_vars * 4] or null
  long long n_remaining = n;
  for (int v = 0; v < n_vars; v++) out_counts[v] = 0;

  int64_t ob_scratch[256];
  long long batch_i = 0;
  while (n_remaining > 0) {
    long long batch_n = n_remaining < 256 ? n_remaining : 256;
    for (int v = 0; v < n_vars; v++) {
      // one corrupt section can scan <= 448 B of ANS + 2048 B of offsets
      // past this point; the caller's buffer padding absorbs that, and we
      // stop before compounding drift
      if (bit_idx > size_bits) return -1;
      long long limit;
      if (is_delta_var[v]) {
        long long avail = n_remaining - primary_state_n;
        if (avail < 0) avail = 0;
        limit = avail < batch_n ? avail : batch_n;
      } else {
        long long avail = n_remaining - var_state_n[v];
        if (avail < 0) avail = 0;
        limit = avail < 256 ? avail : 256;
      }
      if (out_batch_states) {
        for (int s = 0; s < 4; s++)
          out_batch_states[(batch_i * n_vars + v) * 4 + s] = states[4 * v + s];
      }
      if (out_batch_cursors)
        out_batch_cursors[(batch_i * n_vars + v) * 2] = bit_idx;
      if (limit == 0) {
        if (out_batch_cursors)
          out_batch_cursors[(batch_i * n_vars + v) * 2 + 1] = bit_idx;
        continue;
      }
      uint64_t* dst = out_latents[v] + out_counts[v];
      if (n_bins[v] > 1) {
        bit_idx = pco_ans_decode_batch(
            src, bit_idx, (int)limit, states + 4 * v, nodes[v],
            state_lowers[v], dst, ob_scratch);
      } else {
        for (long long i = 0; i < limit; i++) {
          dst[i] = single_lower[v];
          ob_scratch[i] = single_ob[v];
        }
      }
      if (out_batch_cursors)
        out_batch_cursors[(batch_i * n_vars + v) * 2 + 1] = bit_idx;
      pco_read_offsets_u64(src, bit_idx, (int)limit, ob_scratch, dst);
      for (long long i = 0; i < limit; i++) bit_idx += ob_scratch[i];
      out_counts[v] += limit;
    }
    n_remaining -= batch_n;
    batch_i++;
  }
  return bit_idx;
}


// ---------------------------------------------------------------------------
// bin-optimization DP (ref: pco/src/bin_optimization.rs:104-199)
//
// All cost arithmetic is f32 with the reference's approximate log2 so that
// tie-breaking — and therefore compressed size — matches the Rust encoder
// bit for bit. Compile with -ffp-contract=off: an FMA contraction of
// normalized*(B + C*normalized) or (ans+off)*cnt would change low bits.
// ---------------------------------------------------------------------------

static inline float pco_log2_approx_f32(float x) {
  const float Z = 0.674f;
  uint32_t zbits;
  std::memcpy(&zbits, &Z, 4);
  const uint32_t Z_SIGNIF = zbits & 0x7FFFFFu;
  const float B = 2.0f / Z;
  const float C = -B / (6.0f * Z);
  const float A = -B - C;
  uint32_t bits;
  std::memcpy(&bits, &x, 4);
  uint32_t exp = bits >> 23;
  uint32_t signif = bits & 0x7FFFFFu;
  uint32_t high_bit = signif > Z_SIGNIF ? 1u : 0u;
  float log_int = (float)((int64_t)(exp + high_bit) - 127);
  uint32_t norm_bits = ((0x7Fu ^ high_bit) << 23) | signif;
  float normalized;
  std::memcpy(&normalized, &norm_bits, 4);
  return (log_int + A) + normalized * (B + C * normalized);
}

extern "C" void pco_optimize_bins_dp(
    const uint32_t* c_counts,  // n+1 cumulative counts
    const uint64_t* lowers, const uint64_t* uppers, long long n,
    float bin_meta_cost, float total_count_log2,
    int64_t* best_js_out, float* best_cost_out) {
  // best_costs[i] = best total cost covering bins [0, i)
  float* best_costs = new float[n + 1];
  best_costs[0] = 0.0f;
  for (long long i = 0; i < n; i++) {
    uint64_t upper = uppers[i];
    uint32_t c_count_i = c_counts[i + 1];
    float best = 0.0f;
    long long best_j = -1;
    // scan j from i downward keeping strict improvements: the LARGEST j
    // among exact f32 ties wins, like the reference's backward scan
    for (long long j = i; j >= 0; j--) {
      float cnt = (float)(c_count_i - c_counts[j]);
      float ans_cost = total_count_log2 - pco_log2_approx_f32(cnt);
      uint64_t diff = upper - lowers[j];
      float offset_cost =
          (float)(diff ? 64 - __builtin_clzll(diff) : 0);
      float cost = best_costs[j] + (bin_meta_cost + (ans_cost + offset_cost) * cnt);
      if (best_j < 0 || cost < best) {
        best = cost;
        best_j = j;
      }
    }
    best_js_out[i] = best_j;
    best_costs[i + 1] = best;
  }
  *best_cost_out = best_costs[n];
  delete[] best_costs;
}

// The quantile-histogram walk over a fully sorted array (ref:
// histograms.rs:132-206 via the repo's histogram()). Same builder logic as
// pco_histogram_walk below; bounds come from binary searches on `s`.
extern "C" long long pco_histogram_sorted(
    const uint64_t* s, long long n, int n_bins_log,
    uint64_t* counts_out, uint64_t* lowers_out, uint64_t* uppers_out) {
  if (n == 0) return 0;
  const long long n_bins = 1LL << n_bins_log;
  long long n_applied = 0, next_avail_bin_idx = 0, n_out = 0;
  bool has_inc = false;
  uint64_t inc_count = 0, inc_lower = 0, inc_upper = 0;
  auto bin_idx_of = [&](long long c_count) {
    return (c_count << n_bins_log) / n;
  };
  auto c_count_of = [&](long long bin_idx) {
    return ((bin_idx + 1) * n + n_bins - 1) >> n_bins_log;
  };
  auto apply_incomplete = [&](long long count, uint64_t lower, uint64_t upper) {
    if (count == 0) return;
    if (has_inc) {
      inc_count += count;
      inc_upper = upper;
    } else {
      has_inc = true;
      inc_count = count;
      inc_lower = lower;
      inc_upper = upper;
    }
    n_applied += count;
  };
  auto complete_bin = [&](long long bin_idx) {
    if (!has_inc) return false;
    next_avail_bin_idx = bin_idx + 1;
    counts_out[n_out] = inc_count;
    lowers_out[n_out] = inc_lower;
    uppers_out[n_out] = inc_upper;
    n_out++;
    has_inc = false;
    return true;
  };
  auto apply_constant_run = [&](long long count, uint64_t value) {
    long long start = n_applied;
    long long mid = start + count / 2;
    long long end = start + count;
    long long bin_idx = bin_idx_of(mid);
    if (bin_idx > next_avail_bin_idx) {
      long long spare = bin_idx - 1;
      if (!complete_bin(spare)) bin_idx = spare;
    }
    apply_incomplete(count, value, value);
    if (end >= c_count_of(bin_idx)) complete_bin(bin_idx);
  };

  long long pos = 0;
  while (pos < n) {
    long long j = bin_idx_of(n_applied);
    long long tcc = c_count_of(j);
    long long ti = tcc - n_applied;
    if (ti >= n - pos) {
      apply_incomplete(n - pos, s[pos], s[n - 1]);
      if (ti == n - pos) complete_bin(j);
      break;
    }
    uint64_t tx = s[pos + ti - 1];
    long long l = std::lower_bound(s, s + n, tx) - s;
    long long r = std::upper_bound(s, s + n, tx) - s;
    if (l < pos) l = pos;
    if (l > pos) apply_incomplete(l - pos, s[pos], s[l - 1]);
    apply_constant_run(r - l, tx);
    pos = r;
  }
  return n_out;
}

// The quantile-histogram walk driven by per-bin quantile extracts
// (V/L/R/SL1/SR arrays from the device sort; see ops/device_train.py
// histogram_from_extracts and ref: histograms.rs:132-206). Pure integer
// logic; must match the Python builder exactly, including dropped trailing
// incompletes. Returns the number of emitted bins.
extern "C" long long pco_histogram_walk(
    long long n, int n_bins_log,
    const uint64_t* V, const int64_t* L, const int64_t* R,
    const uint64_t* SL1, const uint64_t* SR, uint64_t s0, uint64_t slast,
    uint64_t* counts_out, uint64_t* lowers_out, uint64_t* uppers_out) {
  if (n == 0) return 0;
  const long long n_bins = 1LL << n_bins_log;
  long long n_applied = 0, next_avail_bin_idx = 0, n_out = 0;
  bool has_inc = false;
  uint64_t inc_count = 0, inc_lower = 0, inc_upper = 0;
  auto bin_idx_of = [&](long long c_count) {
    return (c_count << n_bins_log) / n;
  };
  auto c_count_of = [&](long long bin_idx) {
    return ((bin_idx + 1) * n + n_bins - 1) >> n_bins_log;
  };
  auto apply_incomplete = [&](long long count, uint64_t lower, uint64_t upper) {
    if (count == 0) return;
    if (has_inc) {
      inc_count += count;
      inc_upper = upper;
    } else {
      has_inc = true;
      inc_count = count;
      inc_lower = lower;
      inc_upper = upper;
    }
    n_applied += count;
  };
  auto complete_bin = [&](long long bin_idx) {
    if (!has_inc) return false;
    next_avail_bin_idx = bin_idx + 1;
    counts_out[n_out] = inc_count;
    lowers_out[n_out] = inc_lower;
    uppers_out[n_out] = inc_upper;
    n_out++;
    has_inc = false;
    return true;
  };
  auto apply_constant_run = [&](long long count, uint64_t value) {
    long long start = n_applied;
    long long mid = start + count / 2;
    long long end = start + count;
    long long bin_idx = bin_idx_of(mid);
    if (bin_idx > next_avail_bin_idx) {
      long long spare = bin_idx - 1;
      if (!complete_bin(spare)) bin_idx = spare;
    }
    apply_incomplete(count, value, value);
    if (end >= c_count_of(bin_idx)) complete_bin(bin_idx);
  };

  long long pos = 0;
  uint64_t cur_lower = s0;
  while (pos < n) {
    long long j = bin_idx_of(n_applied);
    long long tcc = c_count_of(j);
    long long ti = tcc - pos;
    if (ti >= n - pos) {
      apply_incomplete(n - pos, cur_lower, slast);
      if (ti == n - pos) complete_bin(j);
      break;
    }
    uint64_t tx = V[j];
    long long l = L[j] > pos ? L[j] : pos;
    long long r = R[j];
    if (l > pos) apply_incomplete(l - pos, cur_lower, SL1[j]);
    apply_constant_run(r - l, tx);
    pos = r;
    cur_lower = SR[j];
  }
  return n_out;
}

}  // extern "C"


extern "C" {

// ---------------------------------------------------------------------------
// Legacy quantile-compression (.qco) body codec. MSB-first bit order
// (ref: quantile-compression/q_compress/src/bits.rs). The Python layer in
// pcodec_tpu/legacy/qco.py builds the flat Huffman table and per-prefix
// arrays; widths > 64 bits stay on the pure-Python path.
// ---------------------------------------------------------------------------

// Read n (<= 64) bits MSB-first at absolute bit pos. Caller guarantees
// >= 9 readable bytes past pos (the Python layer passes a padded buffer).
static inline uint64_t qco_rd(const uint8_t* d, long long pos, int n) {
  long long byte = pos >> 3;
  int j = (int)(pos & 7);
  unsigned __int128 w = 0;
  for (int i = 0; i < 9; i++) w = (w << 8) | d[byte + i];
  uint64_t v = (uint64_t)(w >> (72 - j - n));
  return n >= 64 ? v : v & ((1ULL << n) - 1);
}

// Decode n_out unsigneds of one chunk body. Returns the new bit position,
// or -1 on insufficient data. table maps a max_depth-bit peek to a prefix
// index; per-prefix arrays follow prefix.rs PrefixDecompressionInfo.
long long pco_qco_decode_body(
    const uint8_t* data,          // padded by >= 17 zero bytes
    long long total_bits,
    long long start_bit,
    long long n_out,
    int max_depth,
    const int32_t* table,         // (1 << max_depth,)
    const int32_t* code_lens,
    const uint64_t* lowers_u,
    const uint64_t* gcds,
    const int32_t* ks,
    const uint64_t* min_unambiguous,
    const uint64_t* most_significant,
    const int32_t* jumpstarts,    // -1 = none
    uint64_t* out) {
  long long pos = start_bit;
  long long emitted = 0;
  while (emitted < n_out) {
    uint64_t peek = max_depth ? qco_rd(data, pos, max_depth) : 0;
    int p = table[peek];
    int depth = code_lens[p];
    if (pos + depth > total_bits) return -1;
    pos += depth;
    long long reps = 1;
    int js = jumpstarts[p];
    if (js >= 0) {
      // varint: js low bits then (continue, bit) pairs (bit_reader.rs:238)
      if (pos + js > total_bits) return -1;
      uint64_t r = qco_rd(data, pos, js);
      pos += js;
      for (int i = js; i < 24; i++) {
        if (pos + 1 > total_bits) return -1;
        if (qco_rd(data, pos, 1)) {
          if (pos + 2 > total_bits) return -1;
          r |= qco_rd(data, pos + 1, 1) << i;
          pos += 2;
        } else {
          pos += 1;
          break;
        }
      }
      reps = (long long)r + 1;
      long long cap = n_out - emitted;
      if (reps > cap) reps = cap;  // num_decompressor.rs limit_reps
    }
    int k = ks[p];
    uint64_t lower = lowers_u[p], gcd = gcds[p];
    uint64_t mu = min_unambiguous[p], ms = most_significant[p];
    if (js >= 0 && k == 0) {
      for (long long i = 0; i < reps; i++) out[emitted++] = lower;
      continue;
    }
    for (long long i = 0; i < reps; i++) {
      if (pos + k > total_bits) return -1;
      uint64_t off = k ? qco_rd(data, pos, k) : 0;
      pos += k;
      if (off < mu) {
        if (pos + 1 > total_bits) return -1;
        if (qco_rd(data, pos, 1)) off |= ms;
        pos += 1;
      }
      out[emitted++] = lower + off * gcd;
    }
  }
  return pos;
}

}  // extern "C"

extern "C" {

// Encode one .qco chunk body (base_compressor.rs compress_data_page).
// Prefix arrays are ordered by lower bound; search is binary. dst must be
// zero-initialized with capacity >= the worst-case bits. Returns bits
// written, or -1 if a value is not contained in any prefix.
long long pco_qco_encode_body(
    const uint64_t* unsigneds, long long n,
    int n_pref,
    const uint64_t* lowers,       // sorted by lower
    const uint64_t* uppers,
    const uint64_t* gcds,
    const uint32_t* codes,        // code value (MSB-first, code_len bits)
    const int32_t* code_lens,
    const int32_t* ks,
    const uint64_t* only_k_lower,
    const uint64_t* only_k_upper,
    const int32_t* jumpstarts,    // -1 = none
    uint8_t* dst) {
  long long pos = 0;
  auto wr = [&](uint64_t v, int nb) {
    // MSB-first append of nb (<= 64) bits at bit pos into zeroed dst
    long long byte = pos >> 3;
    int j = (int)(pos & 7);
    if (nb < 64) v &= (1ULL << nb) - 1;
    // place v into a 128-bit window aligned at byte
    unsigned __int128 w = (unsigned __int128)v << (128 - j - nb);
    for (int i = 0; 8 * i < j + nb; i++) {
      dst[byte + i] |= (uint8_t)(w >> (120 - 8 * i));
    }
    pos += nb;
  };
  long long i = 0;
  while (i < n) {
    uint64_t u = unsigneds[i];
    // rightmost prefix with lower <= u
    int lo = 0, hi = n_pref;
    while (lo < hi) {
      int mid = (lo + hi) / 2;
      if (lowers[mid] <= u) lo = mid + 1; else hi = mid;
    }
    int p = lo - 1;
    if (p < 0 || u > uppers[p]) return -1;
    wr(codes[p], code_lens[p]);
    long long reps = 1;
    if (jumpstarts[p] >= 0) {
      while (i + reps < n && unsigneds[i + reps] >= lowers[p] &&
             unsigneds[i + reps] <= uppers[p])
        reps++;
      // varint of reps-1 (bit_writer.rs write_varint)
      int js = jumpstarts[p];
      uint64_t x = (uint64_t)(reps - 1);
      wr(x, js);
      x >>= js;
      for (int b = js; b < 24; b++) {
        if (x > 0) {
          wr(1, 1);
          wr(x & 1, 1);
          x >>= 1;
        } else {
          break;
        }
      }
      wr(0, 1);  // stop bit
    }
    int k = ks[p];
    uint64_t lower = lowers[p], gcd = gcds[p];
    uint64_t okl = only_k_lower[p], oku = only_k_upper[p];
    for (long long r = 0; r < reps; r++) {
      uint64_t off = (unsigneds[i + r] - lower) / gcd;
      if (k) wr(off, k);
      if (off < okl || off > oku) wr((off >> k) & 1, 1);
    }
    i += reps;
  }
  return pos;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// batched auto-delta candidate statistics for the host-native encode
// decisions (ops/device_train.py host_decide path). Per (chunk, candidate):
// delta-encode the latent sample, sort, histogram (pco_histogram_sorted),
// DP partitioning with the single-bin / trivial-offset shortcuts
// (bin_optimization.py _choose_optimized_partitioning) and ANS weight
// quantization (format/ans.py quantize_weights_to / quantize_weights) —
// bit/float-exact ports, so the small Python float layer on top reproduces
// the host pipeline's delta decisions exactly.
// ref: pco/src/chunk_compressor.rs:291-395, ans/encoding.rs:95-175.
// ---------------------------------------------------------------------------

#include <atomic>
#include <cmath>
#include <thread>
#include <vector>
#include <algorithm>

namespace pco_cand {

static inline int bit_length_ll(long long x) {
  return x <= 0 ? 0 : 64 - __builtin_clzll((unsigned long long)x);
}

static inline float round_half_away_f32(float x) {
  float t = std::trunc(x);
  float frac = x - t;
  if (std::fabs(frac) >= 0.5f) t += (x > 0.f ? 1.f : (x < 0.f ? -1.f : 0.f));
  return t;
}

// format/ans.py quantize_weights_to + quantize_weights; returns size_log
static int quantize_weights(const int64_t* counts, long long n_bins,
                            long long total_count, int max_size_log,
                            int64_t* weights_out) {
  if (n_bins == 1) {
    weights_out[0] = 1;
    return 0;
  }
  int min_size_log = bit_length_ll(n_bins - 1);
  int size_log = min_size_log > max_size_log ? min_size_log : max_size_log;
  long long required = 1ll << size_log;
  float multiplier = (float)required / (float)total_count;
  std::vector<float> ds(n_bins), fw(n_bins);
  float acc = 0.f;
  for (long long k = 0; k < n_bins; k++) {
    float d = (float)counts[k] * multiplier - 1.0f;
    if (d < 0.f) d = 0.f;
    ds[k] = d;
    acc = acc + d;
  }
  float required_surplus = (float)(required - n_bins);
  float surplus_mult = (acc == 0.f) ? 0.f : (required_surplus / acc);
  long long weight_sum = 0;
  for (long long k = 0; k < n_bins; k++) {
    float w = 1.0f + ds[k] * surplus_mult;
    fw[k] = w;
    weights_out[k] = (int64_t)round_half_away_f32(w);
    weight_sum += weights_out[k];
  }
  for (long long i = 0; weight_sum > required; i++) {
    if (weights_out[i] > 1 && (float)weights_out[i] > fw[i]) {
      weights_out[i] -= 1;
      weight_sum -= 1;
    }
  }
  for (long long i = 0; weight_sum < required; i++) {
    if ((float)weights_out[i] < fw[i]) {
      weights_out[i] += 1;
      weight_sum += 1;
    }
  }
  int pow2 = 64;
  for (long long k = 0; k < n_bins; k++) {
    int tz = __builtin_ctzll((unsigned long long)weights_out[k]);
    if (tz < pow2) pow2 = tz;
  }
  size_log -= pow2;
  for (long long k = 0; k < n_bins; k++) weights_out[k] >>= pow2;
  return size_log;
}

// bin_optimization.py _choose_optimized_partitioning (exact f32 math,
// including the single-bin and trivial-offset shortcuts); writes (j, i)
// pairs and returns the partition count.
static long long partition_bins(const uint64_t* counts, const uint64_t* lowers,
                                const uint64_t* uppers, long long n,
                                int ans_size_log, int lt_bits, int lt_obb,
                                long long* js, long long* is_) {
  std::vector<uint32_t> c_counts(n + 1);
  c_counts[0] = 0;
  for (long long k = 0; k < n; k++)
    c_counts[k + 1] = c_counts[k] + (uint32_t)counts[k];
  long long total_count = (long long)c_counts[n];
  float total_count_log2 = pco_log2_approx_f32((float)total_count);
  float bin_meta_cost = (float)(ans_size_log + lt_bits + lt_obb);

  std::vector<int64_t> best_js(n);
  float best_cost = 0.f;
  pco_optimize_bins_dp(c_counts.data(), lowers, uppers, n, bin_meta_cost,
                       total_count_log2, best_js.data(), &best_cost);

  // single-bin shortcut (_bin_cost_scalar)
  {
    float ans_cost = total_count_log2 - pco_log2_approx_f32((float)total_count);
    uint64_t diff = uppers[n - 1] - lowers[0];
    float offset_cost = (float)(diff ? 64 - __builtin_clzll(diff) : 0);
    float single = bin_meta_cost + (ans_cost + offset_cost) * (float)total_count;
    if (single < best_cost + 0.1f * (float)total_count) {
      js[0] = 0;
      is_[0] = n - 1;
      return 1;
    }
  }
  // trivial-offset shortcut (all lowers == uppers)
  bool all_triv = true;
  for (long long k = 0; k < n; k++)
    if (lowers[k] != uppers[k]) { all_triv = false; break; }
  if (all_triv) {
    float acc = 0.f;
    for (long long k = 0; k < n; k++) {
      float cnt = (float)counts[k];
      float cs = bin_meta_cost +
                 (total_count_log2 - pco_log2_approx_f32(cnt)) * cnt;
      acc = acc + cs;
    }
    if (acc < best_cost + 0.1f * (float)total_count) {
      for (long long k = 0; k < n; k++) { js[k] = k; is_[k] = k; }
      return n;
    }
  }
  // rewind
  long long cnt_out = 0;
  long long i = n - 1;
  std::vector<std::pair<long long, long long>> rev;
  while (true) {
    long long j = best_js[i];
    rev.push_back({j, i});
    if (j > 0) i = j - 1; else break;
  }
  for (long long k = (long long)rev.size() - 1; k >= 0; k--) {
    js[cnt_out] = rev[k].first;
    is_[cnt_out] = rev[k].second;
    cnt_out++;
  }
  return cnt_out;
}

// stats of one latent var: sort -> histogram -> partition -> quantize.
// out slot layout: [n_bins, asl, weights[cap], obs[cap]]
static void var_stats(uint64_t* stored, long long n_stored, int ubl,
                      int var_bits, int var_obb, long long cap, int64_t* out) {
  out[0] = 0;
  out[1] = 0;
  if (n_stored == 0) return;
  std::sort(stored, stored + n_stored);
  std::vector<uint64_t> hc(1ll << ubl), hl(1ll << ubl), hu(1ll << ubl);
  long long nb = pco_histogram_sorted(stored, n_stored, ubl, hc.data(),
                                      hl.data(), hu.data());
  if (nb == 0) return;
  int n_log_ceil = n_stored <= 1 ? 0 : bit_length_ll(n_stored - 1);
  int estimated = ubl + 2;
  if (estimated > 12) estimated = 12;  // MAX_COMPRESSION_LEVEL
  if (estimated > n_log_ceil) estimated = n_log_ceil;
  std::vector<long long> js(nb), is_(nb);
  long long np_ = partition_bins(hc.data(), hl.data(), hu.data(), nb,
                                 estimated, var_bits, var_obb, js.data(),
                                 is_.data());
  if (np_ > cap) np_ = 0;  // caller sized cap = 1<<ubl; never hit
  std::vector<uint32_t> cc(nb + 1);
  cc[0] = 0;
  for (long long k = 0; k < nb; k++) cc[k + 1] = cc[k] + (uint32_t)hc[k];
  std::vector<int64_t> w(np_);
  for (long long k = 0; k < np_; k++) {
    w[k] = (int64_t)(cc[is_[k] + 1] - cc[js[k]]);
    uint64_t diff = hu[is_[k]] - hl[js[k]];
    out[2 + cap + k] = diff ? 64 - __builtin_clzll(diff) : 0;
  }
  int asl = quantize_weights(w.data(), np_, n_stored, estimated, &out[2]);
  out[0] = np_;
  out[1] = asl;
}

struct Job {
  const uint64_t* sample;
  long long n;
  int ubl;
  int bits;       // primary latent bits
  int obb;        // primary latent offset_bits_bits
  int wnl;        // lookback window_n_log (call with orders: unused)
  int max_order;  // >=0: orders 0..max_order; -1: lookback pair
  int min_order;
  long long cap;
  int64_t* out;   // cand-major slots
};

static void run_job(const Job& j) {
  uint64_t mask = j.bits >= 64 ? ~0ull : ((1ull << j.bits) - 1ull);
  uint64_t mid = 1ull << (j.bits - 1);
  long long stride = 2 + 2 * j.cap;
  std::vector<uint64_t> buf(j.n);
  if (j.max_order >= 0) {
    // consecutive orders min_order..max_order (0 = noop); each order
    // delta-encodes fresh from the sample (delta/__init__.py
    // consecutive_encode: backward in-place diffs + toggle past the front)
    for (int order = j.min_order; order <= j.max_order; order++) {
      for (long long k = 0; k < j.n; k++) buf[k] = j.sample[k] & mask;
      for (int o = 0; o < order; o++)
        for (long long k = j.n - 1; k > o; k--)
          buf[k] = (buf[k] - buf[k - 1]) & mask;
      long long front = order < j.n ? order : j.n;
      for (long long k = front; k < j.n; k++)
        buf[k] = (buf[k] + mid) & mask;
      long long n_stored = j.n - order > 0 ? j.n - order : 0;
      var_stats(buf.data() + front, n_stored, j.ubl, j.bits, j.obb, j.cap,
                j.out + (long long)(order - j.min_order) * stride);
    }
  } else {
    // lookback pair: slot 0 = delta var (the u32 lookbacks), slot 1 =
    // primary var (lookback deltas past the 1-latent state front)
    const int state_n = 1;  // new_lookback => state_n_log 0
    long long n_lb = j.n - state_n > 0 ? j.n - state_n : 0;
    std::vector<uint32_t> lbs(n_lb);
    for (long long k = 0; k < j.n; k++) buf[k] = j.sample[k] & mask;
    if (n_lb > 0)
      pco_choose_lookbacks(buf.data(), j.n, j.bits, state_n, j.wnl,
                           lbs.data());
    std::vector<uint64_t> lbs64(n_lb);
    for (long long k = 0; k < n_lb; k++) lbs64[k] = lbs[k];
    var_stats(lbs64.data(), n_lb, j.ubl, 32, 6, j.cap, j.out);
    std::vector<uint64_t> del(j.n);
    for (long long k = j.n - 1; k >= state_n; k--)
      del[k] = (buf[k] - buf[k - lbs[k - state_n]]) & mask;
    for (long long k = state_n; k < j.n; k++)
      del[k] = (del[k] + mid) & mask;
    var_stats(del.data() + state_n, n_lb, j.ubl, j.bits, j.obb, j.cap,
              j.out + stride);
  }
}

}  // namespace pco_cand

extern "C" void pco_delta_cand_stats(
    const uint64_t* samples, const long long* soff, const long long* sn,
    long long n_chunks, int bits, int obb, const int32_t* ubls,
    int min_order, int max_order,  // or max_order = -1 for lookback pairs
    const int32_t* wnls, long long cap, int64_t* out, int n_threads) {
  using pco_cand::Job;
  long long cands = max_order >= 0 ? (max_order - min_order + 1) : 2;
  long long stride = 2 + 2 * cap;
  std::vector<Job> jobs(n_chunks);
  for (long long ci = 0; ci < n_chunks; ci++) {
    jobs[ci] = Job{samples + soff[ci], sn[ci], (int)ubls[ci], bits, obb,
                   wnls ? (int)wnls[ci] : 0, max_order, min_order, cap,
                   out + ci * cands * stride};
  }
  if (n_threads <= 1 || n_chunks <= 1) {
    for (auto& j : jobs) pco_cand::run_job(j);
    return;
  }
  std::vector<std::thread> ts;
  std::atomic<long long> next(0);
  for (int t = 0; t < n_threads; t++)
    ts.emplace_back([&]() {
      while (true) {
        long long ci = next.fetch_add(1);
        if (ci >= n_chunks) break;
        pco_cand::run_job(jobs[ci]);
      }
    });
  for (auto& th : ts) th.join();
}

// Candidate stats from PRECOMPUTED histograms (the device-walked candidate
// bins): partition + quantize per slot — the native half of
// sample_cost_from_unopt for the consecutive-order chain decisions.
extern "C" void pco_hist_cand_stats(
    const uint64_t* counts, const uint64_t* lowers, const uint64_t* uppers,
    const long long* boff, const long long* bn, const long long* n_stored,
    const int32_t* ubls_slot, long long n_slots, int bits, int obb,
    long long cap, int64_t* out, int n_threads) {
  (void)n_threads;  // slots are tiny; a thread pool is a loss on 1 core
  long long stride = 2 + 2 * cap;
  for (long long s = 0; s < n_slots; s++) {
    int64_t* slot = out + s * stride;
    slot[0] = 0;
    slot[1] = 0;
    long long nb = bn[s];
    long long nst = n_stored[s];
    if (nb == 0 || nst == 0) continue;
    const uint64_t* co = counts + boff[s];
    const uint64_t* lo = lowers + boff[s];
    const uint64_t* up = uppers + boff[s];
    int n_log_ceil = nst <= 1 ? 0 : pco_cand::bit_length_ll(nst - 1);
    int estimated = (int)ubls_slot[s] + 2;
    if (estimated > 12) estimated = 12;
    if (estimated > n_log_ceil) estimated = n_log_ceil;
    std::vector<long long> js(nb), is_(nb);
    long long np_ = pco_cand::partition_bins(co, lo, up, nb, estimated, bits,
                                             obb, js.data(), is_.data());
    if (np_ > cap) continue;
    std::vector<uint32_t> cc(nb + 1);
    cc[0] = 0;
    for (long long k = 0; k < nb; k++) cc[k + 1] = cc[k] + (uint32_t)co[k];
    std::vector<int64_t> w(np_);
    for (long long k = 0; k < np_; k++) {
      w[k] = (int64_t)(cc[is_[k] + 1] - cc[js[k]]);
      uint64_t diff = up[is_[k]] - lo[js[k]];
      slot[2 + cap + k] = diff ? 64 - __builtin_clzll(diff) : 0;
    }
    int asl = pco_cand::quantize_weights(w.data(), np_, nst, estimated,
                                         &slot[2]);
    slot[0] = np_;
    slot[1] = asl;
  }
}
