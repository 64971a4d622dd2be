"""BPE vocabulary induction: the distributed trainer must match an
independent pure-Python reference merge-for-merge, the merge kernel must
honor leftmost-first non-overlap on same-symbol runs, and results must be
layout-invariant."""
import numpy as np
import pandas as pd
import pyarrow as pa

from marc_record_merge_melindautils_ray.ops.bpe import (
    apply_merge_flat,
    bpe_train,
    count_pairs_flat,
)


def _py_bpe(word_counts: dict, n_merges: int):
    """Independent reference trainer (dict-of-tuples, per the classic
    algorithm sketch)."""
    state = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get(
                    (syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (l, r), cnt = best
        merges.append((l, r, l + r, cnt))
        new_state = {}
        for syms, c in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[tuple(out)] = new_state.get(tuple(out), 0) + c
        state = new_state
    return merges


def test_merge_kernel_runs_and_boundaries():
    # same-symbol run "aaaa" merges positions (0,1) and (2,3); "aaa" → "X a"
    flat = np.array(list("aaaa") + list("aaa") + list("ba"), dtype=object)
    off = np.array([0, 4, 7, 9], np.int64)
    nf, no = apply_merge_flat(flat, off, "a", "a", "X")
    assert nf.tolist() == ["X", "X", "X", "a", "b", "a"]
    assert no.tolist() == [0, 2, 4, 6]
    # word boundary between words is never merged
    flat2 = np.array(list("ab") + list("ba"), dtype=object)
    off2 = np.array([0, 2, 4], np.int64)
    nf2, _ = apply_merge_flat(flat2, off2, "b", "b", "Y")
    assert nf2.tolist() == ["a", "b", "b", "a"]


def test_count_pairs_weighted():
    flat = np.array(list("ab") + list("abc"), dtype=object)
    off = np.array([0, 2, 5], np.int64)
    n = np.array([3, 2], np.int64)          # "ab"×3, "abc"×2
    out = count_pairs_flat(flat, off, n).set_index(["left", "right"])
    assert out.loc[("a", "b"), "cnt"] == 5
    assert out.loc[("b", "c"), "cnt"] == 2
    assert len(out) == 2                     # no cross-word pair


def test_bpe_train_matches_reference(ray_session):
    import ray.data as rd

    texts = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest widest",
        "low lower widest",
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = bpe_train(rd.from_arrow(t), n_merges=8)

    wc = {}
    for s in texts:
        for w in s.lower().split():
            wc[w] = wc.get(w, 0) + 1
    want = _py_bpe(wc, 8)
    assert list(map(tuple, got[["left", "right", "merged", "pair_count"]]
                    .itertuples(index=False))) == want

    # layout invariance: two blocks, shuffled rows → identical merge table
    perm = [2, 0, 3, 1]
    t2 = t.take(pa.array(perm))
    ds2 = rd.from_arrow(t2.slice(0, 2)).union(rd.from_arrow(t2.slice(2)))
    got2 = bpe_train(ds2, n_merges=8)
    pd.testing.assert_frame_equal(got, got2)
