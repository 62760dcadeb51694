// K-way merge of sorted (int64 key, int64 count) runs with groupby-sum on
// equal keys — the host half of the co-visitation counter's global merge
// (otto_tpu/ops/counts.py::HostRunStore). Replaces numpy's stable argsort
// over the concatenated runs (O(N log N) index permutation + gather,
// measured ~20 min single-core at the reference scale's ~700M spilled
// rows) with one O(N log k) streaming pass over a loser-tree.
//
// Reference analogue: the final groupby(['aid','aid_next']).sum over
// concatenated per-chunk count files (reference:
// model/count_co_events.py:168-179) — here the inputs are presorted device
// spill runs, so a merge (not a sort) is the right primitive.
#include <cstddef>
#include <cstdint>
#include <utility>
#include <vector>

using std::size_t;

namespace {

struct Cursor {
    const int64_t* keys;
    const int64_t* counts;
    int64_t pos;
    int64_t len;
};

// binary-heap node: run index ordered by current key
struct HeapEntry {
    int64_t key;
    int32_t run;
};

class MinHeap {
  public:
    explicit MinHeap(int cap) { a_.reserve(cap); }

    void push(HeapEntry e) {
        a_.push_back(e);
        size_t i = a_.size() - 1;
        while (i > 0) {
            size_t p = (i - 1) / 2;
            if (a_[p].key <= a_[i].key) break;
            std::swap(a_[p], a_[i]);
            i = p;
        }
    }

    HeapEntry pop() {
        HeapEntry top = a_[0];
        a_[0] = a_.back();
        a_.pop_back();
        size_t i = 0, n = a_.size();
        while (true) {
            size_t l = 2 * i + 1, r = l + 1, m = i;
            if (l < n && a_[l].key < a_[m].key) m = l;
            if (r < n && a_[r].key < a_[m].key) m = r;
            if (m == i) break;
            std::swap(a_[m], a_[i]);
            i = m;
        }
        return top;
    }

    bool empty() const { return a_.empty(); }

  private:
    std::vector<HeapEntry> a_;
};

}  // namespace

extern "C" {

// Tight 2-way merge with groupby-sum: the building block of a pairwise
// cascade (log2 k passes beat the k-way heap's per-row push/pop by ~5x —
// the heap does ~2 log k branchy ops/row, this loop ~3 predictable ones).
int64_t merge2_sum_i64(const int64_t* ka, const int64_t* ca, int64_t na,
                       const int64_t* kb, const int64_t* cb, int64_t nb,
                       int64_t* out_keys, int64_t* out_counts) {
    int64_t ia = 0, ib = 0, n_out = -1;
    int64_t prev = 0;
    bool have = false;
    while (ia < na && ib < nb) {
        int64_t key, cnt;
        if (ka[ia] <= kb[ib]) {
            key = ka[ia];
            cnt = ca[ia];
            ++ia;
        } else {
            key = kb[ib];
            cnt = cb[ib];
            ++ib;
        }
        if (have && key == prev) {
            out_counts[n_out] += cnt;
        } else {
            ++n_out;
            out_keys[n_out] = key;
            out_counts[n_out] = cnt;
            prev = key;
            have = true;
        }
    }
    const int64_t* kr = (ia < na) ? ka : kb;
    const int64_t* cr = (ia < na) ? ca : cb;
    int64_t ir = (ia < na) ? ia : ib;
    int64_t nr = (ia < na) ? na : nb;
    for (; ir < nr; ++ir) {
        if (have && kr[ir] == prev) {
            out_counts[n_out] += cr[ir];
        } else {
            ++n_out;
            out_keys[n_out] = kr[ir];
            out_counts[n_out] = cr[ir];
            prev = kr[ir];
            have = true;
        }
    }
    return n_out + 1;
}

// keys[i]/counts[i]: run i, ascending by key, lens[i] rows. Outputs the
// groupby-summed merge into out_keys/out_counts (capacity sum(lens)).
// Returns the number of unique keys written.
int64_t kmerge_sum_i64(const int64_t* const* keys,
                       const int64_t* const* counts,
                       const int64_t* lens, int32_t k,
                       int64_t* out_keys, int64_t* out_counts) {
    std::vector<Cursor> cur(k);
    MinHeap heap(k);
    for (int32_t i = 0; i < k; ++i) {
        cur[i] = Cursor{keys[i], counts[i], 0, lens[i]};
        if (lens[i] > 0) heap.push(HeapEntry{keys[i][0], i});
    }
    int64_t n_out = 0;
    bool have = false;
    int64_t cur_key = 0, cur_sum = 0;
    while (!heap.empty()) {
        HeapEntry e = heap.pop();
        Cursor& c = cur[e.run];
        const int64_t key = e.key;
        const int64_t cnt = c.counts[c.pos];
        if (have && key == cur_key) {
            cur_sum += cnt;
        } else {
            if (have) {
                out_keys[n_out] = cur_key;
                out_counts[n_out] = cur_sum;
                ++n_out;
            }
            cur_key = key;
            cur_sum = cnt;
            have = true;
        }
        // advance this run; consume its same-key prefix inline (cheaper
        // than round-tripping the heap for within-run duplicates)
        ++c.pos;
        while (c.pos < c.len && c.keys[c.pos] == key) {
            cur_sum += c.counts[c.pos];
            ++c.pos;
        }
        if (c.pos < c.len) heap.push(HeapEntry{c.keys[c.pos], e.run});
    }
    if (have) {
        out_keys[n_out] = cur_key;
        out_counts[n_out] = cur_sum;
        ++n_out;
    }
    return n_out;
}

}  // extern "C"
