// Native runtime components for tpu-align.
//
// C++ counterparts of the reference's host-side runtime:
//   * pair-file parsing   (behavioral spec: c++/parseInput.cpp:9-127 --
//     single flat buffer + per-pair offset/size table + dataset stats)
//   * traceback walking   (behavioral spec: c++/backtrack.cpp backtrackNW
//     :21-81, backtrackSW :83-144, backtrackANW :214-356 incl. the
//     trailing-edge flush loops :339-351)
// operating on this framework's 4-bit packed direction words
// (tpu_align/core/directions.py) instead of byte-per-cell enum matrices.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (tpu_align/native/binding.py).  Traceback fans out over std::thread --
// the analogue of the reference's pthread host backtracking batches
// (cuda/LNW/LinearNeedlemanWunschV5.cu:393-430).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// 4-bit cell codes (tpu_align/core/directions.py)
constexpr int kMainMask = 3;
constexpr int kDiagMatch = 0;
constexpr int kDiagMismatch = 1;
constexpr int kQueryDeletion = 2;
constexpr int kQueryInsertion = 3;
constexpr int kBitEExtend = 4;  // affine E from GAP_EXTEND
constexpr int kBitFExtend = 8;  // affine F from GAP_EXTEND

constexpr char kGapChar = '_';
constexpr char kRelMatch = '*';
constexpr char kRelMismatch = '|';
constexpr char kRelGap = ' ';

// algorithms (tpu_align/core/params.py)
constexpr int kAlgoLNW = 0;
constexpr int kAlgoLSW = 1;
constexpr int kAlgoANW = 2;
constexpr int kAlgoBSW = 3;

struct PackedDirs {
  // One pair's view into a packed direction tensor.  Two layouts:
  //
  // Row-major (stag_s == 0): tensor (mw, b_total, n); `words` points at the
  // pair's first word-row, consecutive word-rows `stride` apart; DP row i
  // sits at bits [bits*((i-1)%per)..] of word (i-1)/per.
  //
  // Stagger (stag_s == S > 0, tpu_align/kernels/stagger.py): tensor
  // (stripes, stag_w, S, b_total); `words` = base + pair, `stride` =
  // b_total; cell (i, j) lives in stripe (i-1)/S, sublane r = (i-1)%S,
  // step k = (j-1) + r, word k/per at bits [bits*(k%per)..].
  //
  // `bits` is the per-cell width: 2 for the linear aligners (16 cells/word),
  // 4 for affine (8 cells/word).
  const int32_t* words;
  int64_t stride;
  int bits;
  int64_t stag_s = 0;
  int64_t stag_w = 0;

  // packed code of interior DP cell (i, j), 1-based
  inline int code(int64_t i, int64_t j) const {
    if (stag_s > 0) {
      const int per = 32 / bits;
      const int64_t s = (i - 1) / stag_s;
      const int64_t r = (i - 1) % stag_s;
      const int64_t k = (j - 1) + r;
      const uint32_t w = static_cast<uint32_t>(
          words[(((s * stag_w + k / per) * stag_s) + r) * stride]);
      return static_cast<int>((w >> (bits * (k % per))) & ((1u << bits) - 1));
    }
    return code_slot(i, j - 1);
  }

  // raw 0-based word-column lookup (row-major and banded skewed layouts)
  inline int code_slot(int64_t i, int64_t slot) const {
    const int64_t r = i - 1;
    const int per = 32 / bits;
    const uint32_t w =
        static_cast<uint32_t>(words[(r / per) * stride + slot]);
    return static_cast<int>((w >> (bits * (r % per))) & ((1u << bits) - 1));
  }
};

struct Walker {
  // output built back-to-front, then reversed into the caller buffers
  std::vector<char> ref_out, rel_out, qry_out;

  void reserve(size_t cap) {
    ref_out.reserve(cap);
    rel_out.reserve(cap);
    qry_out.reserve(cap);
  }
  inline void emit(char r, char m, char q) {
    ref_out.push_back(r);
    rel_out.push_back(m);
    qry_out.push_back(q);
  }
};

// Linear global walk (backtrackNW, c++/backtrack.cpp:21-81).  Border rows/
// cols are implicit: row 0 -> all insertions, col 0 -> all deletions
// (c++/LinearNeedlemanWunsch.cpp:31-41 forced border directions).
void walk_nw(const PackedDirs& d, const uint8_t* ref, const uint8_t* qry,
             int64_t r, int64_t c, Walker& w) {
  while (r != 0 || c != 0) {
    int code;
    if (r == 0) {
      code = kQueryInsertion;
    } else if (c == 0) {
      code = kQueryDeletion;
    } else {
      code = d.code(r, c) & kMainMask;
    }
    switch (code) {
      case kDiagMatch:
        w.emit(ref[c - 1], kRelMatch, qry[r - 1]);
        --r; --c;
        break;
      case kDiagMismatch:
        w.emit(ref[c - 1], kRelMismatch, qry[r - 1]);
        --r; --c;
        break;
      case kQueryDeletion:
        w.emit(kGapChar, kRelGap, qry[r - 1]);
        --r;
        break;
      default:  // kQueryInsertion
        w.emit(ref[c - 1], kRelGap, kGapChar);
        --c;
        break;
    }
  }
}

// Local walk (backtrackSW, c++/backtrack.cpp:83-144): stop at the border or
// when the backward re-score reaches 0 -- along the optimal path
// H[pred] = H[cell] - move cost, so the remaining score hits 0 exactly at
// the clamped-to-zero path start (replaces a stored stop flag).
// skew_band > 0 selects the banded kernel's skewed word layout, where DP
// cell (i, j) lives in slot k = j - i + band (tpu_align/kernels/banded.py);
// leaving the band terminates the walk (out-of-band cells are 0).
void walk_sw(const PackedDirs& d, const uint8_t* ref, const uint8_t* qry,
             int64_t r, int64_t c, Walker& w, int64_t skew_band,
             int64_t remaining, int match, int mismatch, int gap) {
  while (remaining > 0 && r > 0 && c > 0) {
    int cell;
    if (skew_band > 0) {
      const int64_t k = c - r + skew_band;
      if (k < 1 || k > 2 * skew_band - 1) break;
      cell = d.code_slot(r, k);
    } else {
      cell = d.code(r, c);
    }
    switch (cell & kMainMask) {
      case kDiagMatch:
        w.emit(ref[c - 1], kRelMatch, qry[r - 1]);
        remaining -= match;
        --r; --c;
        break;
      case kDiagMismatch:
        w.emit(ref[c - 1], kRelMismatch, qry[r - 1]);
        remaining -= mismatch;
        --r; --c;
        break;
      case kQueryDeletion:
        w.emit(kGapChar, kRelGap, qry[r - 1]);
        remaining -= gap;
        --r;
        break;
      default:
        w.emit(ref[c - 1], kRelGap, kGapChar);
        remaining -= gap;
        --c;
        break;
    }
  }
}

// Affine three-state walk (backtrackANW, c++/backtrack.cpp:214-356) with
// the trailing-edge flush loops (:339-351).
void walk_anw(const PackedDirs& d, const uint8_t* ref, const uint8_t* qry,
              int64_t r, int64_t c, Walker& w) {
  enum { SCORING, INSERTION, DELETION } state = SCORING;
  while (r != 0 && c != 0) {
    const int cell = d.code(r, c);
    if (state == SCORING) {
      switch (cell & kMainMask) {
        case kDiagMatch:
          w.emit(ref[c - 1], kRelMatch, qry[r - 1]);
          --r; --c;
          break;
        case kDiagMismatch:
          w.emit(ref[c - 1], kRelMismatch, qry[r - 1]);
          --r; --c;
          break;
        case kQueryDeletion:
          state = DELETION;
          break;
        default:
          state = INSERTION;
          break;
      }
    } else if (state == INSERTION) {
      if (!(cell & kBitEExtend)) state = SCORING;  // GAP_OPEN ends the run
      w.emit(ref[c - 1], kRelGap, kGapChar);
      --c;
    } else {  // DELETION
      if (!(cell & kBitFExtend)) state = SCORING;
      w.emit(kGapChar, kRelGap, qry[r - 1]);
      --r;
    }
  }
  while (r > 0) {
    w.emit(kGapChar, kRelGap, qry[r - 1]);
    --r;
  }
  while (c > 0) {
    w.emit(ref[c - 1], kRelGap, kGapChar);
    --c;
  }
}

void traceback_range(
    int algo, int64_t lo, int64_t hi, int64_t mw, int64_t b_total, int64_t n,
    int64_t dirs_cols, int64_t skew_band, int64_t stag_s, int64_t stag_w,
    int bits, int match, int mismatch,
    int gap, int64_t m, const int32_t* dirs, const uint8_t* ref_tokens,
    const uint8_t* qry_tokens, const int32_t* ref_len, const int32_t* qry_len,
    const int32_t* start_row, const int32_t* start_col, const int32_t* scores,
    char* out_buf, int64_t out_stride, int32_t* out_lens) {
  (void)mw;
  Walker w;
  w.reserve(static_cast<size_t>(m + n));
  const bool local = (algo == kAlgoLSW || algo == kAlgoBSW);
  for (int64_t b = lo; b < hi; ++b) {
    w.ref_out.clear();
    w.rel_out.clear();
    w.qry_out.clear();
    const PackedDirs d =
        (stag_s > 0)
            ? PackedDirs{dirs + b, b_total, bits, stag_s, stag_w}
            : PackedDirs{dirs + b * dirs_cols, b_total * dirs_cols, bits};
    const uint8_t* ref = ref_tokens + b * n;
    const uint8_t* qry = qry_tokens + b * m;
    if (local && scores[b] <= 0) {
      out_lens[b] = 0;  // empty 3-line block (cuda/LinearSmithWaterman.cu host)
    } else {
      switch (algo) {
        case kAlgoLNW:
          walk_nw(d, ref, qry, qry_len[b], ref_len[b], w);
          break;
        case kAlgoANW:
          walk_anw(d, ref, qry, qry_len[b], ref_len[b], w);
          break;
        default:
          walk_sw(d, ref, qry, start_row[b], start_col[b], w, skew_band,
                  scores[b], match, mismatch, gap);
          break;
      }
      const int64_t len = static_cast<int64_t>(w.ref_out.size());
      out_lens[b] = static_cast<int32_t>(len);
      char* dst = out_buf + b * 3 * out_stride;
      for (int64_t k = 0; k < len; ++k) {
        dst[k] = w.ref_out[len - 1 - k];
        dst[out_stride + k] = w.rel_out[len - 1 - k];
        dst[2 * out_stride + k] = w.qry_out[len - 1 - k];
      }
    }
  }
}

// Replay a lane's 2-bit device-walk move stream (tpu_align/traceback/
// device.py: 0 = no-op, 1 = diagonal, 2 = query deletion, 3 = query
// insertion, walk order end -> start) into the three output lines.
void replay_range(
    int64_t lo, int64_t hi, int64_t t16, int64_t b_total, int64_t n,
    int64_t m, int local, const int32_t* moves, const uint8_t* ref_tokens,
    const uint8_t* qry_tokens, const int32_t* start_row,
    const int32_t* start_col, const int32_t* scores, char* out_buf,
    int64_t out_stride, int32_t* out_lens) {
  // The move stream is in walk order (end -> start) but output reads
  // start -> end, so the three lines are written BACKWARD from the end of
  // fixed scratch buffers (one store per char, no vectors, no reversal
  // pass), then copied left-aligned into the caller's buffer.  Whole
  // all-no-op words (idle phases, stream tails) are skipped with one
  // compare per 16 steps.
  const int64_t cap = m + n;
  std::vector<char> scratch(3 * cap);
  char* rbuf = scratch.data();
  char* mbuf = rbuf + cap;
  char* qbuf = mbuf + cap;
  for (int64_t b = lo; b < hi; ++b) {
    if (local && scores[b] <= 0) {
      out_lens[b] = 0;
      continue;
    }
    const uint8_t* ref = ref_tokens + b * n;
    const uint8_t* qry = qry_tokens + b * m;
    int64_t r = start_row[b], c = start_col[b];
    int64_t pos = cap;
    for (int64_t tw = 0; tw < t16; ++tw) {
      uint32_t word = static_cast<uint32_t>(moves[tw * b_total + b]);
      if (word == 0) continue;  // 16 idle phases at once
      do {
        const unsigned shift =
            static_cast<unsigned>(__builtin_ctz(word)) & ~1u;
        const int mv = static_cast<int>((word >> shift) & 3u);
        word &= ~(3u << shift);  // consume; next ctz finds the next move
        --pos;
        if (mv == 1) {
          const char rc = static_cast<char>(ref[c - 1]);
          const char qc = static_cast<char>(qry[r - 1]);
          rbuf[pos] = rc;
          mbuf[pos] = rc == qc ? kRelMatch : kRelMismatch;
          qbuf[pos] = qc;
          --r; --c;
        } else if (mv == 2) {
          rbuf[pos] = kGapChar;
          mbuf[pos] = kRelGap;
          qbuf[pos] = static_cast<char>(qry[r - 1]);
          --r;
        } else {
          rbuf[pos] = static_cast<char>(ref[c - 1]);
          mbuf[pos] = kRelGap;
          qbuf[pos] = kGapChar;
          --c;
        }
      } while (word != 0);
      if (!local && r == 0 && c == 0) break;  // global walks are complete
    }
    const int64_t len = cap - pos;
    out_lens[b] = static_cast<int32_t>(len);
    char* dst = out_buf + b * 3 * out_stride;
    std::memcpy(dst, rbuf + pos, len);
    std::memcpy(dst + out_stride, mbuf + pos, len);
    std::memcpy(dst + 2 * out_stride, qbuf + pos, len);
  }
}

// Emit `run` diagonal moves in one shot (global walks only -- no early
// stop).  The walk is backward and the output buffers also fill backward,
// so both source ranges are contiguous AND order-preserving: the token
// copies collapse to memcpy and the relation-byte compare auto-vectorizes.
// Returns the number of matches in the run (for score re-derivation).
static inline int64_t fill_diag_run(int64_t run, int64_t& r, int64_t& c,
                                    int64_t& pos, const uint8_t* ref,
                                    const uint8_t* qry, char* rbuf,
                                    char* mbuf, char* qbuf) {
  pos -= run;
  r -= run;
  c -= run;
  const uint8_t* rs = ref + c;
  const uint8_t* qs = qry + r;
  std::memcpy(rbuf + pos, rs, static_cast<size_t>(run));
  std::memcpy(qbuf + pos, qs, static_cast<size_t>(run));
  char* mb = mbuf + pos;
  int64_t matches = 0;
  for (int64_t k = 0; k < run; ++k) {
    const bool eq = rs[k] == qs[k];
    mb[k] = eq ? kRelMatch : kRelMismatch;
    matches += eq;
  }
  return matches;
}

// Decimal rendering width of v under printf "%lld" / "%d".
static inline int dec_len(long long v) {
  int d = v < 0 ? 2 : 1;  // sign + first digit
  unsigned long long u =
      v < 0 ? 0ULL - static_cast<unsigned long long>(v)
            : static_cast<unsigned long long>(v);
  while (u >= 10) {
    u /= 10;
    ++d;
  }
  return d;
}

// Replay a lane's EVENT-compacted device walk (tpu_align/traceback/
// device.py _compact_events): flat uint16 payloads, lane b's events at
// [ev_off[b], ev_off[b+1]) in walk order: payload = (row << 1) | is_ins,
// payload 0 = end of list.  Between events every move is diagonal; the
// diagonal count before an event at row i is (r - i).  Global walks finish
// with r trailing diagonals to (0, 0); local walks re-score and stop when
// the remaining score reaches 0 (same arithmetic as the device walk's
// decide_step, so the stop point is identical by construction).
void replay_events_range(
    int64_t lo, int64_t hi, int64_t n, int64_t m,
    int local, int match, int mismatch, int gap, const uint16_t* events,
    const int64_t* ev_off,
    const uint8_t* ref_tokens, const uint8_t* qry_tokens,
    const int32_t* start_row, const int32_t* start_col,
    const int32_t* scores, char* out_buf, int64_t out_stride,
    int32_t* out_lens, int32_t* out_scores) {
  const int64_t cap = m + n;
  std::vector<char> scratch(3 * cap);
  char* rbuf = scratch.data();
  char* mbuf = rbuf + cap;
  char* qbuf = mbuf + cap;
  for (int64_t b = lo; b < hi; ++b) {
    if (local && scores[b] <= 0) {
      out_lens[b] = 0;
      if (out_scores != nullptr) out_scores[b] = scores[b];
      continue;
    }
    const uint8_t* ref = ref_tokens + b * n;
    const uint8_t* qry = qry_tokens + b * m;
    const uint16_t* ev = events + ev_off[b];
    const int64_t ne = ev_off[b + 1] - ev_off[b];
    int64_t r = start_row[b], c = start_col[b];
    int64_t rem = local ? scores[b] : 1;
    // path score, re-derived with LINEAR weights only -- out_scores must
    // stay NULL for affine replays (gap runs would need open+extend);
    // the current binding (binding.py native_replay_events) always
    // passes NULL and takes scores from the fill readback instead
    int64_t acc = 0;
    int64_t pos = cap;
    bool done = false;
    auto diag = [&]() {
      const char rc = static_cast<char>(ref[c - 1]);
      const char qc = static_cast<char>(qry[r - 1]);
      --pos;
      rbuf[pos] = rc;
      mbuf[pos] = rc == qc ? kRelMatch : kRelMismatch;
      qbuf[pos] = qc;
      acc += (rc == qc) ? match : mismatch;
      if (local) {
        rem -= (rc == qc) ? match : mismatch;
        if (rem <= 0) done = true;
      }
      --r; --c;
    };
    for (int64_t k = 0; k < ne && !done; ++k) {
      const int p = ev[k];
      if (p == 0) break;  // end of event list
      const int64_t i_e = p >> 1;
      const bool is_ins = (p & 1) != 0;
      if (local) {
        while (r > i_e && !done) diag();
        if (done) break;
      } else if (r > i_e) {  // global: coalesce the diagonal stretch
        const int64_t run = r - i_e;
        const int64_t mt =
            fill_diag_run(run, r, c, pos, ref, qry, rbuf, mbuf, qbuf);
        acc += mt * match + (run - mt) * mismatch;
      }
      --pos;
      if (is_ins) {
        rbuf[pos] = static_cast<char>(ref[c - 1]);
        mbuf[pos] = kRelGap;
        qbuf[pos] = kGapChar;
        --c;
      } else {
        rbuf[pos] = kGapChar;
        mbuf[pos] = kRelGap;
        qbuf[pos] = static_cast<char>(qry[r - 1]);
        --r;
      }
      acc += gap;
      if (local) {
        rem -= gap;
        if (rem <= 0) done = true;
      }
    }
    if (local) {
      while (!done && r > 0 && c > 0) diag();
    } else if (r > 0) {  // trailing diagonals to (0, 0); r == c here
      const int64_t run = r;
      const int64_t mt =
          fill_diag_run(run, r, c, pos, ref, qry, rbuf, mbuf, qbuf);
      acc += mt * match + (run - mt) * mismatch;
    }
    const int64_t len = cap - pos;
    out_lens[b] = static_cast<int32_t>(len);
    if (out_scores != nullptr) {
      out_scores[b] = static_cast<int32_t>(local ? scores[b] : acc);
    }
    char* dst = out_buf + b * 3 * out_stride;
    std::memcpy(dst, rbuf + pos, len);
    std::memcpy(dst + out_stride, mbuf + pos, len);
    std::memcpy(dst + 2 * out_stride, qbuf + pos, len);
  }
}

// Replay event streams straight into formatted 4-line output blocks:
//     <pair_num> | <score>\n<ref>\n<relation>\n<query>\n
// written at fixed per-pair stride into `chunk`, with spans[b] =
// (offset, length).  Fuses replay_events_range + the block formatter --
// one pass, no intermediate (B, 3, stride) buffer (the e2e profile showed
// that intermediate costing a full extra write+read of ~100 MB/run).
void replay_events_blocks_range(
    int64_t lo, int64_t hi, int64_t n, int64_t m,
    int local, int match, int mismatch, int gap, const uint16_t* events,
    const int64_t* ev_off,
    const uint8_t* ref_tokens, const uint8_t* qry_tokens,
    const int32_t* start_row, const int32_t* start_col,
    const int32_t* scores, const int64_t* pair_ids, char* chunk,
    int64_t blk_stride, const int64_t* dst_off, int64_t* spans) {
  const int64_t cap = m + n;
  std::vector<char> scratch;
  const bool dense = (!local && dst_off != nullptr);
  if (!dense) scratch.resize(3 * cap);
  for (int64_t b = lo; b < hi; ++b) {
    char hdr[64];
    const int h = std::snprintf(
        hdr, sizeof(hdr), "%lld | %d\n",
        static_cast<long long>(pair_ids[b]), scores[b]);
    char* dst = chunk + (dense ? dst_off[b] : b * blk_stride);
    const uint8_t* ref = ref_tokens + b * n;
    const uint8_t* qry = qry_tokens + b * m;
    const uint16_t* ev = events + ev_off[b];
    const int64_t ne = ev_off[b + 1] - ev_off[b];
    char *rbuf, *mbuf, *qbuf;
    int64_t bufcap;
    if (dense) {
      // Dense direct write: the final alignment length is derivable from
      // the events alone (L = start_row + #insertions), so the three
      // lines land straight in the output buffer at their final
      // positions -- no scratch, no post-copy.  dst_off was computed
      // with ta_events_block_lens from the SAME events, so the backward
      // fill ends exactly at offset 0 of each line.
      int64_t ins = 0;
      for (int64_t k = 0; k < ne; ++k) {
        const int p = ev[k];
        if (p == 0) break;
        ins += p & 1;
      }
      bufcap = start_row[b] + ins;
      rbuf = dst + h;
      mbuf = rbuf + bufcap + 1;
      qbuf = mbuf + bufcap + 1;
    } else {
      rbuf = scratch.data();
      mbuf = rbuf + cap;
      qbuf = mbuf + cap;
      bufcap = cap;
    }
    int64_t r = start_row[b], c = start_col[b];
    int64_t rem = local ? scores[b] : 1;
    int64_t pos = bufcap;
    bool done = (local && scores[b] <= 0);
    if (!done) {
      auto diag = [&]() {
        const char rc = static_cast<char>(ref[c - 1]);
        const char qc = static_cast<char>(qry[r - 1]);
        --pos;
        rbuf[pos] = rc;
        mbuf[pos] = rc == qc ? kRelMatch : kRelMismatch;
        qbuf[pos] = qc;
        if (local) {
          rem -= (rc == qc) ? match : mismatch;
          if (rem <= 0) done = true;
        }
        --r; --c;
      };
      for (int64_t k = 0; k < ne && !done; ++k) {
        const int p = ev[k];
        if (p == 0) break;
        const int64_t i_e = p >> 1;
        const bool is_ins = (p & 1) != 0;
        if (local) {
          while (r > i_e && !done) diag();
          if (done) break;
        } else if (r > i_e) {  // global: coalesce the diagonal stretch
          fill_diag_run(r - i_e, r, c, pos, ref, qry, rbuf, mbuf, qbuf);
        }
        --pos;
        if (is_ins) {
          rbuf[pos] = static_cast<char>(ref[c - 1]);
          mbuf[pos] = kRelGap;
          qbuf[pos] = kGapChar;
          --c;
        } else {
          rbuf[pos] = kGapChar;
          mbuf[pos] = kRelGap;
          qbuf[pos] = static_cast<char>(qry[r - 1]);
          --r;
        }
        if (local) {
          rem -= gap;
          if (rem <= 0) done = true;
        }
      }
      if (local) {
        while (!done && r > 0 && c > 0) diag();
      } else if (r > 0) {
        fill_diag_run(r, r, c, pos, ref, qry, rbuf, mbuf, qbuf);
      }
    }
    const int64_t len = bufcap - pos;
    if (dense) {
      std::memcpy(dst, hdr, static_cast<size_t>(h));
      rbuf[len] = '\n';
      mbuf[len] = '\n';
      qbuf[len] = '\n';
      spans[2 * b] = dst - chunk;
      spans[2 * b + 1] = h + 3 * (len + 1);
    } else {
      char* d = dst;
      std::memcpy(d, hdr, static_cast<size_t>(h));
      d += h;
      std::memcpy(d, rbuf + pos, len); d += len; *d++ = '\n';
      std::memcpy(d, mbuf + pos, len); d += len; *d++ = '\n';
      std::memcpy(d, qbuf + pos, len); d += len; *d++ = '\n';
      spans[2 * b] = dst - chunk;
      spans[2 * b + 1] = d - dst;
    }
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Fused event replay + block formatting (threaded): chunk must hold
// batch * blk_stride bytes with blk_stride >= 26 + 3 * (m + n + 1).
// Returns 0 on success.
// ---------------------------------------------------------------------------
int ta_replay_events_blocks(
    int64_t batch, int64_t n, int64_t m, int local,
    int match, int mismatch, int gap, const uint16_t* events,
    const int64_t* ev_off,
    const uint8_t* ref_tokens, const uint8_t* qry_tokens,
    const int32_t* start_row, const int32_t* start_col,
    const int32_t* scores, const int64_t* pair_ids, char* chunk,
    int64_t blk_stride, const int64_t* dst_off, int64_t* spans,
    int num_threads) {
  if (dst_off != nullptr) {
    if (local) return -2;  // dense mode needs event-derivable lengths
  } else if (blk_stride < 26 + 3 * (m + n + 1)) {
    return -1;
  }
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  num_threads = static_cast<int>(
      std::min<int64_t>(num_threads, std::max<int64_t>(batch, 1)));
  if (num_threads == 1 || batch < 64) {
    replay_events_blocks_range(0, batch, n, m, local, match,
                               mismatch, gap, events, ev_off, ref_tokens,
                               qry_tokens, start_row, start_col, scores,
                               pair_ids, chunk, blk_stride, dst_off, spans);
    return 0;
  }
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  const int64_t chunk_rows = (batch + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int64_t lo = t * chunk_rows;
    const int64_t hi = std::min<int64_t>(lo + chunk_rows, batch);
    if (lo >= hi) break;
    threads.emplace_back(replay_events_blocks_range, lo, hi, n,
                         m, local, match, mismatch, gap, events, ev_off,
                         ref_tokens, qry_tokens, start_row, start_col,
                         scores, pair_ids, chunk, blk_stride, dst_off,
                         spans);
  }
  for (auto& th : threads) th.join();
  return 0;
}

// Per-pair formatted block lengths, derived from events alone (global
// walks): aligned length L = start_row + #insertions, block length =
// header + 3 * (L + 1).  Feeding these through a prefix sum gives exact
// dense dst offsets for ta_replay_events_blocks(dst_off=...).
void ta_events_block_lens(int64_t batch,
                          const uint16_t* events, const int64_t* ev_off,
                          const int32_t* start_row,
                          const int64_t* pair_ids, const int32_t* scores,
                          int64_t* lens) {
  for (int64_t b = 0; b < batch; ++b) {
    const uint16_t* ev = events + ev_off[b];
    const int64_t ne = ev_off[b + 1] - ev_off[b];
    int64_t ins = 0;
    for (int64_t k = 0; k < ne; ++k) {
      const int p = ev[k];
      if (p == 0) break;
      ins += p & 1;
    }
    const int64_t L = start_row[b] + ins;
    lens[b] = dec_len(pair_ids[b]) + 3 + dec_len(scores[b]) + 1 +
              3 * (L + 1);
  }
}

// ---------------------------------------------------------------------------
// Event-compacted device-walk replay: flat uint16 (row << 1 | is_ins)
// payloads, lane b's events at [ev_off[b], ev_off[b+1]); out_buf as in
// ta_traceback_bucket.  Returns 0 on success.
// ---------------------------------------------------------------------------
int ta_replay_events(
    int64_t batch, int64_t n, int64_t m, int local,
    int match, int mismatch, int gap, const uint16_t* events,
    const int64_t* ev_off,
    const uint8_t* ref_tokens, const uint8_t* qry_tokens,
    const int32_t* start_row, const int32_t* start_col,
    const int32_t* scores, char* out_buf, int64_t out_stride,
    int32_t* out_lens, int32_t* out_scores, int num_threads) {
  if (out_stride < m + n) return -1;
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  num_threads = static_cast<int>(
      std::min<int64_t>(num_threads, std::max<int64_t>(batch, 1)));
  if (num_threads == 1 || batch < 64) {
    replay_events_range(0, batch, n, m, local, match, mismatch,
                        gap, events, ev_off, ref_tokens, qry_tokens,
                        start_row, start_col, scores, out_buf, out_stride,
                        out_lens, out_scores);
    return 0;
  }
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  const int64_t chunk = (batch + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(lo + chunk, batch);
    if (lo >= hi) break;
    threads.emplace_back(replay_events_range, lo, hi, n, m,
                         local, match, mismatch, gap, events, ev_off,
                         ref_tokens, qry_tokens, start_row, start_col,
                         scores, out_buf, out_stride, out_lens, out_scores);
  }
  for (auto& th : threads) th.join();
  return 0;
}

// ---------------------------------------------------------------------------
// Device-walk move replay: moves (t16, b_total) int32 packed 16 2-bit codes
// per word; out_buf as in ta_traceback_bucket.  Returns 0 on success.
// ---------------------------------------------------------------------------
int ta_replay_moves(
    int64_t batch, int64_t b_total, int64_t t16, int64_t n, int64_t m,
    int local, const int32_t* moves, const uint8_t* ref_tokens,
    const uint8_t* qry_tokens, const int32_t* start_row,
    const int32_t* start_col, const int32_t* scores, char* out_buf,
    int64_t out_stride, int32_t* out_lens, int num_threads) {
  if (out_stride < m + n) return -1;
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  num_threads = static_cast<int>(
      std::min<int64_t>(num_threads, std::max<int64_t>(batch, 1)));
  if (num_threads == 1 || batch < 64) {
    replay_range(0, batch, t16, b_total, n, m, local, moves, ref_tokens,
                 qry_tokens, start_row, start_col, scores, out_buf,
                 out_stride, out_lens);
    return 0;
  }
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  const int64_t chunk = (batch + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(lo + chunk, batch);
    if (lo >= hi) break;
    threads.emplace_back(replay_range, lo, hi, t16, b_total, n, m, local,
                         moves, ref_tokens, qry_tokens, start_row, start_col,
                         scores, out_buf, out_stride, out_lens);
  }
  for (auto& th : threads) th.join();
  return 0;
}

// ---------------------------------------------------------------------------
// Traceback: walk every pair of a bucket into three alignment strings.
//
// dirs:        (mw, b_total, n) int32 packed 4-bit words (word-major; the
//              kernel's HBM layout -- pair b's word-row k is
//              dirs[k*b_total*n + b*n .. +n])
// ref_tokens:  (batch, n) uint8;  qry_tokens: (batch, m) uint8
// out_buf:     (batch, 3, out_stride) char, caller-allocated,
//              out_stride >= m + n; strings left-aligned, length out_lens[b]
// Returns 0 on success.
// ---------------------------------------------------------------------------
int ta_traceback_bucket(
    int algo, int64_t batch, int64_t b_total, int64_t mw, int64_t n,
    int64_t dirs_cols, int64_t skew_band, int64_t stag_s, int64_t stag_w,
    int bits, int match, int mismatch,
    int gap, int64_t m, const int32_t* dirs, const uint8_t* ref_tokens,
    const uint8_t* qry_tokens, const int32_t* ref_len, const int32_t* qry_len,
    const int32_t* start_row, const int32_t* start_col, const int32_t* scores,
    char* out_buf, int64_t out_stride, int32_t* out_lens, int num_threads) {
  if (out_stride < m + n) return -1;
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  num_threads = static_cast<int>(
      std::min<int64_t>(num_threads, std::max<int64_t>(batch, 1)));
  if (num_threads == 1 || batch < 64) {
    traceback_range(algo, 0, batch, mw, b_total, n, dirs_cols, skew_band,
                    stag_s, stag_w, bits, match, mismatch, gap, m, dirs,
                    ref_tokens, qry_tokens, ref_len, qry_len, start_row,
                    start_col, scores, out_buf, out_stride, out_lens);
    return 0;
  }
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  const int64_t chunk = (batch + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(lo + chunk, batch);
    if (lo >= hi) break;
    threads.emplace_back(traceback_range, algo, lo, hi, mw, b_total, n,
                         dirs_cols, skew_band, stag_s, stag_w, bits, match,
                         mismatch, gap, m,
                         dirs, ref_tokens, qry_tokens, ref_len, qry_len,
                         start_row, start_col, scores, out_buf, out_stride,
                         out_lens);
  }
  for (auto& th : threads) th.join();
  return 0;
}

// ---------------------------------------------------------------------------
// Output-block formatting (the reference's per-pair printf loop,
// c++/backtrack.cpp:205-210, vectorized): render every pair's 4-line block
//     <pair_num> | <score>\n<ref>\n<relation>\n<query>\n
// into one contiguous buffer.  Two-call protocol: if dst_cap is too small
// the needed size is returned negated and nothing is written; otherwise
// writes dst and spans (batch x 2 int64: offset, length) and returns the
// total length.  The Python layer then orders blocks globally by pair id
// with ta_gather_spans -- no per-pair Python strings ever exist.
// ---------------------------------------------------------------------------
int64_t ta_format_blocks(
    int64_t batch, const int32_t* pair_ids, const int32_t* scores,
    const char* out_buf, int64_t out_stride, const int32_t* out_lens,
    char* dst, int64_t dst_cap, int64_t* spans, int num_threads) {
  std::vector<int64_t> head(batch);
  int64_t total = 0;
  char scratch[64];
  for (int64_t b = 0; b < batch; ++b) {
    const int h = std::snprintf(scratch, sizeof scratch, "%d | %d\n",
                                pair_ids[b], scores[b]);
    head[b] = h;
    spans[2 * b] = total;  // offset
    const int64_t blk = h + 3 * (static_cast<int64_t>(out_lens[b]) + 1);
    spans[2 * b + 1] = blk;
    total += blk;
  }
  if (total > dst_cap) return -total;
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  num_threads = static_cast<int>(
      std::min<int64_t>(num_threads, std::max<int64_t>(batch, 1)));
  auto write_range = [&](int64_t lo, int64_t hi) {
    char local[64];
    for (int64_t b = lo; b < hi; ++b) {
      char* d = dst + spans[2 * b];
      std::snprintf(local, sizeof local, "%d | %d\n", pair_ids[b],
                    scores[b]);
      std::memcpy(d, local, head[b]);
      d += head[b];
      const int64_t len = out_lens[b];
      const char* src = out_buf + b * 3 * out_stride;
      for (int line = 0; line < 3; ++line) {
        std::memcpy(d, src + line * out_stride, len);
        d += len;
        *d++ = '\n';
      }
    }
  };
  if (num_threads == 1 || batch < 256) {
    write_range(0, batch);
    return total;
  }
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  const int64_t chunk = (batch + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(lo + chunk, batch);
    if (lo >= hi) break;
    threads.emplace_back(write_range, lo, hi);
  }
  for (auto& th : threads) th.join();
  return total;
}

// Concatenate spans of src in the given order (indices into spans) into
// dst; returns the total length written (dst must be large enough --
// the sum of the selected span lengths).
int64_t ta_gather_spans(const char* src, const int64_t* spans,
                        const int64_t* order, int64_t count, char* dst) {
  int64_t at = 0;
  for (int64_t k = 0; k < count; ++k) {
    const int64_t b = order[k];
    std::memcpy(dst + at, src + spans[2 * b], spans[2 * b + 1]);
    at += spans[2 * b + 1];
  }
  return at;
}

// Multi-source ordered gather (threaded): block b lives in source
// part_of[b] at offset spans[2b] with length spans[2b+1]; blocks are
// emitted in `order`.  dst offsets are prefix-summed first so the copy
// loop parallelizes.  Replaces concatenate-then-gather (one 78 MB pass
// instead of three at 100k-pair output scale).
int64_t ta_gather_parts(const char* const* srcs, const int64_t* spans,
                        const int32_t* part_of, const int64_t* order,
                        int64_t count, char* dst, int num_threads) {
  // Coalesce source-adjacent blocks into runs first: when a part's chunk
  // is already dense and pair-ordered (the dense replay path), the whole
  // part collapses to ONE run and the gather becomes a handful of large
  // memcpys instead of `count` ~800-byte ones.
  struct Run { const char* src; int64_t dst; int64_t len; };
  std::vector<Run> runs;
  runs.reserve(256);
  int64_t at = 0;
  for (int64_t k = 0; k < count; ++k) {
    const int64_t b = order[k];
    const char* src = srcs[part_of[b]] + spans[2 * b];
    const int64_t len = spans[2 * b + 1];
    if (!runs.empty() && runs.back().src + runs.back().len == src) {
      runs.back().len += len;
    } else {
      runs.push_back({src, at, len});
    }
    at += len;
  }
  const int64_t total = at;
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  if (num_threads == 1 || total < (1 << 20)) {
    for (const Run& run : runs) std::memcpy(dst + run.dst, run.src, run.len);
    return total;
  }
  // Split runs into fixed tiles so a few huge runs still spread across
  // all threads.
  constexpr int64_t kTile = 2 << 20;
  std::vector<Run> tiles;
  tiles.reserve(static_cast<size_t>(total / kTile + runs.size() + 1));
  for (const Run& run : runs) {
    for (int64_t o = 0; o < run.len; o += kTile) {
      tiles.push_back({run.src + o, run.dst + o,
                       std::min<int64_t>(kTile, run.len - o)});
    }
  }
  std::atomic<size_t> next{0};
  auto worker = [&]() {
    for (;;) {
      const size_t k = next.fetch_add(1, std::memory_order_relaxed);
      if (k >= tiles.size()) return;
      std::memcpy(dst + tiles[k].dst, tiles[k].src, tiles[k].len);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return total;
}

// Vectorized bucket gather: out[b, :lens[b]] = buf[off[b] .. +lens[b]],
// pad beyond (io/bucketing.py _make_bucket, hoisted from numpy -- the
// advanced-indexing gather built 67 MB int64 index temporaries).
void ta_gather_padded(const uint8_t* buf, const int64_t* off,
                      const int64_t* lens, int64_t rows, int64_t width,
                      int pad, uint8_t* out, int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  auto run = [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      uint8_t* row = out + b * width;
      const int64_t n = std::min<int64_t>(lens[b], width);
      std::memcpy(row, buf + off[b], n);
      std::memset(row + n, pad, width - n);
    }
  };
  if (num_threads == 1 || rows < 512) {
    run(0, rows);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (rows + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(lo + chunk, rows);
    if (lo >= hi) break;
    threads.emplace_back(run, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// 2-bit token packing (io/packing.py, hoisted from numpy): tokens
// (rows, width) uint8 with real content in the first lens[b] bytes.
// Detects the content alphabet with a 256-bin histogram (no sort);
// returns the distinct-value count.  If <= 4, fills lut[4] and packs
// 4 codes/byte into out (rows, width/4); pad positions pack as code 0
// (regenerated from lens on device unpack).  width must be % 4.
int ta_pack_2bit(const uint8_t* tokens, const int64_t* lens, int64_t rows,
                 int64_t width, uint8_t* lut, uint8_t* out,
                 int num_threads) {
  bool seen[256] = {};
  for (int64_t b = 0; b < rows; ++b) {
    const uint8_t* row = tokens + b * width;
    const int64_t n = std::min<int64_t>(lens[b], width);
    for (int64_t k = 0; k < n; ++k) seen[row[k]] = true;
  }
  int nv = 0;
  uint8_t inv[256] = {};
  for (int v = 0; v < 256; ++v) {
    if (seen[v]) {
      if (nv < 4) {
        lut[nv] = static_cast<uint8_t>(v);
        inv[v] = static_cast<uint8_t>(nv);
      }
      ++nv;
    }
  }
  if (nv > 4) return nv;
  for (int k = nv; k < 4; ++k) lut[k] = nv ? lut[0] : 0;
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  const int64_t w4 = width / 4;
  auto run = [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const uint8_t* row = tokens + b * width;
      const int64_t n = std::min<int64_t>(lens[b], width);
      uint8_t* dst = out + b * w4;
      const int64_t full = n / 4;
      for (int64_t w = 0; w < full; ++w) {
        const uint8_t* q = row + 4 * w;
        dst[w] = static_cast<uint8_t>(inv[q[0]] | (inv[q[1]] << 2) |
                                      (inv[q[2]] << 4) | (inv[q[3]] << 6));
      }
      // tail word mixes content and pad (pad codes 0)
      if (full < w4) {
        uint8_t acc = 0;
        for (int64_t k = 4 * full; k < n; ++k) {
          acc = static_cast<uint8_t>(acc | (inv[row[k]] << (2 * (k % 4))));
        }
        dst[full] = acc;
        std::memset(dst + full + 1, 0, w4 - full - 1);
      }
    }
  };
  if (num_threads == 1 || rows < 512) {
    run(0, rows);
    return nv;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (rows + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(lo + chunk, rows);
    if (lo >= hi) break;
    threads.emplace_back(run, lo, hi);
  }
  for (auto& th : threads) th.join();
  return nv;
}

// ---------------------------------------------------------------------------
// Pair-file parsing (two-call protocol like c++/parseInput.cpp's two-pass).
//
// ta_count_pairs: returns the number of pairs, or -1 if the line count is
// not a multiple of 3 (parseInput.cpp:38-42).  A missing trailing newline
// is tolerated (counted as terminating the last line).
// ---------------------------------------------------------------------------
int64_t ta_count_pairs(const uint8_t* data, int64_t nbytes) {
  int64_t lines = 0;
  for (int64_t i = 0; i < nbytes; ++i) lines += (data[i] == '\n');
  if (nbytes > 0 && data[nbytes - 1] != '\n') ++lines;
  if (lines % 3 != 0) return -1;
  return lines / 3;
}

// ta_parse_pairs: fill per-pair (offset, length) tables for reference and
// query lines; optionally translate digits 0123 -> ATCG in place
// (cuda/convert.sh).  CRLF tolerated.  Returns pairs parsed, or -1.
int64_t ta_parse_pairs(uint8_t* data, int64_t nbytes, int64_t max_pairs,
                       int64_t* ref_off, int64_t* ref_len, int64_t* qry_off,
                       int64_t* qry_len, int translate_digits) {
  static const char kBase[4] = {'A', 'T', 'C', 'G'};
  int64_t pair = 0;
  int mode = 0;  // 0 = seed line, 1 = reference, 2 = query
  int64_t line_start = 0;
  for (int64_t i = 0; i <= nbytes; ++i) {
    const bool eof_line = (i == nbytes && line_start < i);
    if (i < nbytes && data[i] != '\n' && !eof_line) {
      if (translate_digits && data[i] >= '0' && data[i] <= '3') {
        data[i] = kBase[data[i] - '0'];
      }
      continue;
    }
    if (i == nbytes && !eof_line) break;
    int64_t end = i;
    if (end > line_start && end <= nbytes && end - 1 >= 0 &&
        data[end - 1] == '\r') {
      --end;
    }
    if (mode == 1) {
      ref_off[pair] = line_start;
      ref_len[pair] = end - line_start;
    } else if (mode == 2) {
      qry_off[pair] = line_start;
      qry_len[pair] = end - line_start;
      if (++pair == max_pairs) return pair;
    }
    mode = (mode + 1) % 3;
    line_start = i + 1;
  }
  return (mode == 0) ? pair : -1;
}

}  // extern "C"
