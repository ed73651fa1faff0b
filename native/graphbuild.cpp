// Native score-graph edge builder — the compiled core of the data path.
//
// Semantics identical to analysisgnn_tpu/data/graph_build.py (which mirrors
// the reference hetero_graph_from_note_array, analysisgnn/utils/
// hgraph.py:214-300): given notes sorted by onset_div, emit typed edges
//   0 onset        i→j  same onset, i≠j
//   1 consecutive  i→j  onset[j] == onset[i] + dur[i]
//   2 during       i→j  onset[i] < onset[j] < onset[i] + dur[i]
//   3 rest         i→j  silence gap between i's end and the next onset group
//
// Exposed via a C ABI for ctypes.  Two-pass protocol: call with cap == 0 to
// get the required edge count, then with a buffer of that size.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Returns number of edges written (or required if cap == 0 / insufficient).
// Negative return values are error codes.
int64_t agt_build_edges(const int64_t* onset, const int64_t* dur, int64_t n,
                        int64_t* out_src, int64_t* out_dst, uint8_t* out_type,
                        int64_t cap) {
  if (n <= 0) return 0;
  for (int64_t i = 1; i < n; ++i) {
    if (onset[i] < onset[i - 1]) return -1;  // must be sorted
  }

  int64_t count = 0;
  auto emit = [&](int64_t s, int64_t d, uint8_t t) {
    if (count < cap) {
      out_src[count] = s;
      out_dst[count] = d;
      out_type[count] = t;
    }
    ++count;
  };

  // group boundaries over equal onsets
  std::vector<int64_t> group_start;
  group_start.reserve(n / 2 + 1);
  for (int64_t i = 0; i < n; ++i) {
    if (i == 0 || onset[i] != onset[i - 1]) group_start.push_back(i);
  }
  group_start.push_back(n);
  const int64_t g = static_cast<int64_t>(group_start.size()) - 1;

  auto lower = [&](int64_t v) {
    return std::lower_bound(onset, onset + n, v) - onset;
  };
  auto upper = [&](int64_t v) {
    return std::upper_bound(onset, onset + n, v) - onset;
  };

  // onset edges: all ordered pairs within a group
  for (int64_t gi = 0; gi < g; ++gi) {
    const int64_t a = group_start[gi], b = group_start[gi + 1];
    for (int64_t i = a; i < b; ++i)
      for (int64_t j = a; j < b; ++j)
        if (i != j) emit(i, j, 0);
  }

  // consecutive + during
  for (int64_t i = 0; i < n; ++i) {
    const int64_t end = onset[i] + dur[i];
    for (int64_t j = lower(end), hi = upper(end); j < hi; ++j) emit(i, j, 1);
    for (int64_t j = upper(onset[i]), hi = lower(end); j < hi; ++j)
      emit(i, j, 2);
  }

  // rest edges: unique end times (except the global max) not matching any
  // onset connect their enders to the next onset group
  std::vector<int64_t> ends(n);
  for (int64_t i = 0; i < n; ++i) ends[i] = onset[i] + dur[i];
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return ends[a] < ends[b]; });
  const int64_t max_end = ends[order[n - 1]];
  int64_t k = 0;
  while (k < n) {
    const int64_t et = ends[order[k]];
    int64_t k2 = k;
    while (k2 < n && ends[order[k2]] == et) ++k2;
    if (et != max_end) {
      const int64_t lo = lower(et), hi = upper(et);
      if (lo == hi) {  // true silence: no onset at this end time
        const int64_t dlo = upper(et);
        if (dlo < n) {
          const int64_t nxt = onset[dlo];
          const int64_t dhi = upper(nxt);
          for (int64_t s = k; s < k2; ++s)
            for (int64_t j = dlo; j < dhi; ++j) emit(order[s], j, 3);
        }
      }
    }
    k = k2;
  }
  return count;
}

}  // extern "C"
