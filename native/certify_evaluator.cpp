// certify_evaluator: exhaustive 7-card evaluator certification.
//
// Enumerates ALL C(52,7) = 133,784,560 seven-card hands and asserts, for
// every single hand:
//
//   (1) naive == packed: an independent, literal transcription of the
//       reference evaluator (hand_evaluator.clj:112-133 five-card triple,
//       max over the C(7,5)=21 combos per :162-172, with the no-wheel
//       quirk :32-40 and the full-house no-kicker intent :104-106) equals
//       the shipped bitmask evaluator's packed key (mc_eval7, the same
//       eval_masks used by ops/evaluator.py's XLA/Pallas twins).
//   (2) packed <-> cmp isomorphism: the comparison-only key (mc_eval7_cmp,
//       C++ twin of ops/evaluator.py eval_masks_cmp_impl, bit-exactness
//       vs JAX pinned separately in tests/test_native.py) is a bijection
//       of realized packed keys, and — checked at the end over the full
//       sorted key tables — strictly order-preserving. Together these make
//       cmp-key comparisons equivalent to reference-triple comparisons on
//       every pair of 7-card hands, not just sampled ones.
//
// Build + run (single pass, ~minutes on one core):
//   g++ -O3 -std=c++17 -march=native -o certify certify_evaluator.cpp \
//       mcpoker_api.cpp   # or link mcpoker.cpp directly
//   ./certify
//
// The run prints hand counts, distinct-key counts and an order-insensitive
// FNV-1a digest of the realized (packed, cmp) key table so reruns can be
// diffed; the committed result lives in PERF.md.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <vector>

extern "C" {
uint32_t mc_eval7(const int32_t *cards);
uint32_t mc_eval7_cmp(const int32_t *cards);
}

namespace {

// ---------------------------------------------------------------------------
// Independent naive evaluator (reference transcription; deliberately NOT
// sharing code with eval_masks).
// ---------------------------------------------------------------------------

// hand_evaluator.clj categories (hand_evaluator.clj:112-133).
enum {
  kHigh = 0, kPair, kTwoPair, kTrips, kStraight, kFlush, kFullHouse,
  kQuads, kStraightFlush
};

inline uint32_t pack_triple(int cat, const int r[5]) {
  // handval.py layout: category nibble then the five hit++kicker ranks.
  return (uint32_t(cat) << 20) | (uint32_t(r[0]) << 16) |
         (uint32_t(r[1]) << 12) | (uint32_t(r[2]) << 8) |
         (uint32_t(r[3]) << 4) | uint32_t(r[4]);
}

// Evaluate exactly five (rank, suit) cards to the packed reference triple.
uint32_t naive_eval5(const int rank[5], const int suit[5]) {
  int desc[5] = {rank[0], rank[1], rank[2], rank[3], rank[4]};
  std::sort(desc, desc + 5, std::greater<int>());

  bool flush = suit[0] == suit[1] && suit[1] == suit[2] &&
               suit[2] == suit[3] && suit[3] == suit[4];
  // Strictly consecutive ranks; ace is always 14, so no wheel
  // (hand_evaluator.clj:32-40).
  bool straight = desc[0] == desc[1] + 1 && desc[1] == desc[2] + 1 &&
                  desc[2] == desc[3] + 1 && desc[3] == desc[4] + 1;

  int cnt[16] = {0};
  for (int i = 0; i < 5; ++i) ++cnt[rank[i]];
  int quad = -1, trip = -1, pair_hi = -1, pair_lo = -1;
  for (int r = 14; r >= 2; --r) {
    if (cnt[r] == 4) quad = r;
    else if (cnt[r] == 3) trip = r;
    else if (cnt[r] == 2) {
      if (pair_hi < 0) pair_hi = r;
      else if (pair_lo < 0) pair_lo = r;
    }
  }

  int out[5];
  if (straight && flush) return pack_triple(kStraightFlush, desc);
  if (quad >= 0) {
    int k = 0;
    for (int i = 0; i < 5; ++i)
      if (desc[i] != quad) k = desc[i];
    out[0] = out[1] = out[2] = out[3] = quad; out[4] = k;
    return pack_triple(kQuads, out);
  }
  if (trip >= 0 && pair_hi >= 0) {  // full house: trips then pair, no kicker
    out[0] = out[1] = out[2] = trip; out[3] = out[4] = pair_hi;
    return pack_triple(kFullHouse, out);
  }
  if (flush) return pack_triple(kFlush, desc);
  if (straight) return pack_triple(kStraight, desc);
  if (trip >= 0) {
    out[0] = out[1] = out[2] = trip;
    int j = 3;
    for (int i = 0; i < 5; ++i)
      if (desc[i] != trip) out[j++] = desc[i];
    return pack_triple(kTrips, out);
  }
  if (pair_lo >= 0) {  // two pair
    out[0] = out[1] = pair_hi; out[2] = out[3] = pair_lo;
    for (int i = 0; i < 5; ++i)
      if (desc[i] != pair_hi && desc[i] != pair_lo) out[4] = desc[i];
    return pack_triple(kTwoPair, out);
  }
  if (pair_hi >= 0) {
    out[0] = out[1] = pair_hi;
    int j = 2;
    for (int i = 0; i < 5; ++i)
      if (desc[i] != pair_hi) out[j++] = desc[i];
    return pack_triple(kPair, out);
  }
  return pack_triple(kHigh, desc);
}

// Max over all 21 five-card combinations (hand_evaluator.clj:162-172);
// packing preserves the triple's lexicographic order, so max of packed ==
// packed of the reference's max-hand-value.
uint32_t naive_eval7(const int rank[7], const int suit[7]) {
  uint32_t best = 0;
  int r5[5], s5[5];
  for (int a = 0; a < 3; ++a)
    for (int b = a + 1; b < 4; ++b)
      for (int c = b + 1; c < 5; ++c)
        for (int d = c + 1; d < 6; ++d)
          for (int e = d + 1; e < 7; ++e) {
            r5[0] = rank[a]; s5[0] = suit[a];
            r5[1] = rank[b]; s5[1] = suit[b];
            r5[2] = rank[c]; s5[2] = suit[c];
            r5[3] = rank[d]; s5[3] = suit[d];
            r5[4] = rank[e]; s5[4] = suit[e];
            best = std::max(best, naive_eval5(r5, s5));
          }
  return best;
}

}  // namespace

int main() {
  // packed keys are < 2^24, cmp keys < 2^23: flat isomorphism tables.
  std::vector<int32_t> p2c(1u << 24, -1), c2p(1u << 23, -1);
  int64_t n_hands = 0, n_mismatch = 0, n_iso_viol = 0;
  int32_t cards[7];
  int rank[7], suit[7];

  for (int c0 = 0; c0 < 46; ++c0) {
    for (int c1 = c0 + 1; c1 < 47; ++c1)
      for (int c2 = c1 + 1; c2 < 48; ++c2)
        for (int c3 = c2 + 1; c3 < 49; ++c3)
          for (int c4 = c3 + 1; c4 < 50; ++c4)
            for (int c5 = c4 + 1; c5 < 51; ++c5)
              for (int c6 = c5 + 1; c6 < 52; ++c6) {
                cards[0] = c0; cards[1] = c1; cards[2] = c2; cards[3] = c3;
                cards[4] = c4; cards[5] = c5; cards[6] = c6;
                for (int i = 0; i < 7; ++i) {
                  rank[i] = 2 + cards[i] % 13;  // cards.py encoding
                  suit[i] = cards[i] / 13;
                }
                uint32_t naive = naive_eval7(rank, suit);
                uint32_t packed = mc_eval7(cards);
                uint32_t cmp = mc_eval7_cmp(cards);
                ++n_hands;
                if (naive != packed) {
                  if (++n_mismatch <= 5)
                    std::printf("MISMATCH hand %d %d %d %d %d %d %d: "
                                "naive=%08x packed=%08x\n",
                                c0, c1, c2, c3, c4, c5, c6, naive, packed);
                }
                int32_t &pc = p2c[packed];
                if (pc < 0) pc = int32_t(cmp);
                else if (uint32_t(pc) != cmp) ++n_iso_viol;
                int32_t &cp = c2p[cmp];
                if (cp < 0) cp = int32_t(packed);
                else if (uint32_t(cp) != packed) ++n_iso_viol;
              }
    std::fprintf(stderr, "c0=%d done, hands=%lld mismatch=%lld iso=%lld\n",
                 c0, (long long)n_hands, (long long)n_mismatch,
                 (long long)n_iso_viol);
  }

  // Order preservation over the full sorted key table: walking realized
  // packed keys ascending, the mapped cmp keys must be strictly increasing.
  int64_t n_keys = 0, n_order_viol = 0;
  int64_t last_cmp = -1;
  uint64_t digest = 1469598103934665603ull;  // FNV-1a over (packed, cmp)
  for (uint32_t pk = 0; pk < (1u << 24); ++pk) {
    int32_t ck = p2c[pk];
    if (ck < 0) continue;
    ++n_keys;
    if (int64_t(ck) <= last_cmp) ++n_order_viol;
    last_cmp = ck;
    uint64_t word = (uint64_t(pk) << 32) | uint32_t(ck);
    for (int i = 0; i < 8; ++i) {
      digest ^= (word >> (8 * i)) & 0xff;
      digest *= 1099511628211ull;
    }
  }
  int64_t n_cmp_keys = 0;
  for (uint32_t ck = 0; ck < (1u << 23); ++ck)
    if (c2p[ck] >= 0) ++n_cmp_keys;

  std::printf("hands=%lld (expect 133784560)\n", (long long)n_hands);
  std::printf("naive-vs-packed mismatches=%lld\n", (long long)n_mismatch);
  std::printf("iso violations=%lld order violations=%lld\n",
              (long long)n_iso_viol, (long long)n_order_viol);
  std::printf("distinct packed keys=%lld distinct cmp keys=%lld\n",
              (long long)n_keys, (long long)n_cmp_keys);
  std::printf("key-table digest=%016llx\n", (unsigned long long)digest);
  bool ok = n_hands == 133784560 && n_mismatch == 0 && n_iso_viol == 0 &&
            n_order_viol == 0 && n_keys == n_cmp_keys;
  std::printf(ok ? "CERTIFIED\n" : "FAILED\n");
  return ok ? 0 : 1;
}
