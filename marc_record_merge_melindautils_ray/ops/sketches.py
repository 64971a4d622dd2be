"""Mergeable sketches as Ray Data aggregations — the sketch-operator class
the brief lists alongside dedup/similarity (approximate distinct counts and
quantiles over streams too large to hold exactly).

Shape: per-batch partial sketch (vectorized numpy) → tiny ``groupby``-free
reduce of the partials (sketches are tiny and mergeable by construction, so
the combine step is a driver fold over O(num_batches) rows — no all-to-all
shuffle, unlike an exact COUNT(DISTINCT)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.functions.hashing import splitmix64


from marc_record_merge_melindautils_ray.ops.relational import _read  # shared read convention


# ----------------------------------------------------------------- HyperLogLog
HLL_P = 12  # 4096 registers → ~1.6 % standard error, 4 KB per sketch


def _hll_partial(keys: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """One vectorized pass: register index = top ``p`` hash bits, register
    value = 1 + leading-zero count of the remaining bits (Flajolet et al.,
    HyperLogLog, AofA 2007)."""
    m = 1 << p
    with np.errstate(over="ignore"):
        h = splitmix64(keys.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # leading zeros of `rest` via float64 exponent trick is lossy; use
    # bit-length: lz = 64 - bit_length(rest)
    bl = np.zeros(len(rest), np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = r >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        r[big] >>= np.uint64(shift)
    bl += (r >= 1).astype(np.int64)
    rho = (64 - bl + 1).astype(np.int8)
    regs = np.zeros(m, np.int8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds: rd.Dataset, key_col: str, p: int = HLL_P) -> int:
    """Approximate COUNT(DISTINCT key_col): per-batch 4 KB register partials,
    register-wise max fold.  The fold input is O(num_batches) tiny rows —
    the whole point of the sketch is that nothing key-sized ever moves."""

    def partial(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col]).view(np.uint64)
        regs = _hll_partial(k, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    regs = np.zeros(1 << p, np.int8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=256, batch_format="pyarrow"
    ):
        col = b["regs"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for scalar in col:
            part = np.frombuffer(scalar.as_buffer(), np.int8)
            np.maximum(regs, part, out=regs)
    return int(round(hll_estimate(regs)))


def q_hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users in the event stream + the exact count for
    the driver's rows-only check; the accuracy bound (±3 σ ≈ 5 %) is
    asserted in tests."""
    ds = _read(sf_dir, "events", ["user_id"])
    approx = hll_distinct(ds, "user_id")
    return pd.DataFrame({"approx_distinct_users": [np.int64(approx)]})


# ----------------------------------------------------- histogram quantile sketch
def quantile_sketch(
    ds: rd.Dataset, col: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    n_bins: int = 8192,
) -> dict[float, float]:
    """Approximate quantiles via a fixed-width histogram sketch: one cheap
    min/max pass sizes the bins, one pass accumulates per-batch partial
    histograms (mergeable by vector add), quantiles interpolate within their
    bin — error ≤ bin width, no sort, no shuffle of values."""
    import pyarrow.compute as pc

    stats = ds.map_batches(
        lambda t: pa.table({
            "lo": pa.array([pc.min(t[col]).as_py()], pa.float64()),
            "hi": pa.array([pc.max(t[col]).as_py()], pa.float64()),
            # valid (non-null) count: nulls carry no value and must not
            # enter the quantile denominator
            "n": pa.array([pc.count(t[col]).as_py()], pa.int64()),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    lo, hi, total = float(stats["lo"].min()), float(stats["hi"].max()), int(stats["n"].sum())
    if total == 0 or hi <= lo:
        return {q: lo for q in qs}
    width = (hi - lo) / n_bins

    def partial_hist(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col], np.float64)
        v = v[~np.isnan(v)]  # nulls → NaN → would clip into bin 0 and skew low
        b = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        h = np.bincount(b, minlength=n_bins).astype(np.int64)
        return pa.table({"hist": pa.array([h.tobytes()], pa.binary())})

    hist = np.zeros(n_bins, np.int64)
    for b in ds.map_batches(partial_hist, batch_format="pyarrow").iter_batches(
        batch_size=256, batch_format="pyarrow"
    ):
        col_ = b["hist"]
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        for scalar in col_:
            hist += np.frombuffer(scalar.as_buffer(), np.int64)

    cum = np.cumsum(hist)
    out = {}
    for q in qs:
        target = q * total
        bi = int(np.searchsorted(cum, target, side="left"))
        prev = cum[bi - 1] if bi else 0
        frac = (target - prev) / max(1, hist[bi]) if hist[bi] else 0.0
        out[q] = lo + (bi + frac) * width
    return out


def q_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Approximate p50/p90/p99 of the event value column (permille-scaled
    integers for a stable rows-only record); accuracy vs exact quantiles is
    asserted in tests."""
    ds = _read(sf_dir, "events", ["value"])
    qd = quantile_sketch(ds, "value")
    return pd.DataFrame({
        "q": pd.Series([50, 90, 99], dtype=np.int64),
        "value_e3": pd.Series(
            [int(round(qd[0.5] * 1000)), int(round(qd[0.9] * 1000)),
             int(round(qd[0.99] * 1000))],
            dtype=np.int64,
        ),
    })


# ----------------------------------------------------- grouped HyperLogLog
def hll_distinct_by(ds: rd.Dataset, group_col: str, key_col: str,
                    p: int = HLL_P) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT key_col) GROUP BY group_col — the sketch
    path for grouped distinct counts whose key sets are too large to
    shuffle.  Per batch, ONE vectorized pass computes every present group's
    register partial (flat ``group_idx·m + register_idx`` scatter-max, no
    per-group Python loop); the shuffle then carries one 2^p-byte blob per
    (group, batch) — O(groups × batches), independent of key cardinality —
    and ``map_groups`` folds register-wise max and estimates.

    Partitioning assumption: group cardinality is the SMALL side (flags,
    types, languages).  For high-cardinality groups the blobs dominate and
    the exact pair-dedup path (``q_distinct_suppliers_per_flag``) is the
    right operator instead."""
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        g = np.asarray(t[group_col]).astype(str)
        k = np.asarray(t[key_col]).view(np.uint64)
        uniq, g_idx = np.unique(g, return_inverse=True)
        with np.errstate(over="ignore"):
            h = splitmix64(k)
        reg_idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        bl = np.zeros(len(rest), np.int64)
        r = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = r >= (np.uint64(1) << np.uint64(shift))
            bl[big] += shift
            r[big] >>= np.uint64(shift)
        bl += (r >= 1).astype(np.int64)
        rho = (64 - bl + 1).astype(np.int8)
        regs = np.zeros(len(uniq) * m, np.int8)
        np.maximum.at(regs, g_idx * m + reg_idx, rho)
        return pa.table({
            group_col: pa.array(uniq, pa.string()),
            "regs": pa.array([regs[i * m:(i + 1) * m].tobytes()
                              for i in range(len(uniq))], pa.binary()),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, np.int8)
        for blob in df["regs"]:
            np.maximum(regs, np.frombuffer(blob, np.int8), out=regs)
        return pd.DataFrame({
            group_col: [df[group_col].iloc[0]],
            "approx_distinct": [np.int64(round(hll_estimate(regs)))],
        })

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out["approx_distinct"] = out["approx_distinct"].astype(np.int64)
    return out.sort_values(group_col).reset_index(drop=True)


def q_hll_users_per_type(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users PER EVENT TYPE (grouped sketch; accuracy
    vs the exact grouped distinct and block-layout invariance are asserted
    in tests/test_sketches.py)."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_distinct_by(ds, "event_type", "user_id")


# ----------------------------------------------------- Misra-Gries heavy hitters
MG_SUMMARY_SIZE = 256  # counters per summary — state independent of vocabulary


def mg_trim(terms: np.ndarray, counts: np.ndarray, s: int) -> tuple:
    """Trim a counted multiset to ≤ ``s`` counters, Misra-Gries style: the
    decrement δ = the (s+1)-th largest count is subtracted from every counter
    and non-positive ones drop.  Returns (terms, counts, δ): any item's
    retained count undercounts its input weight by at most δ (Misra & Gries
    1982; mergeability per Agarwal et al., PODS'12)."""
    if len(terms) <= s:
        return terms, counts.astype(np.int64), 0
    kth = np.partition(counts, len(counts) - s - 1)[len(counts) - s - 1]
    keep = counts > kth
    return terms[keep], (counts[keep] - kth).astype(np.int64), int(kth)


def q_heavy_hitters(sf_dir: str, k: int = 20, s: int = MG_SUMMARY_SIZE) -> pd.DataFrame:
    """EXACT corpus top-k terms computed with BOUNDED per-task state — the
    scale sibling of ``q_top_terms`` (whose partial-counts shuffle carries the
    whole vocabulary).  Two passes:

    1. per-batch Misra-Gries summaries (≤ ``s`` counters each) fold on the
       driver into one summary with a tracked total error bound ε = Σ δ;
       every term with true count > ε is guaranteed present (MG property);
    2. the ≤ ``s`` candidate terms broadcast back; one vectorized recount
       pass computes their EXACT counts.

    The result is CERTIFIED exact top-k when the k-th exact count > ε (the
    guarantee implies no non-candidate can beat it); otherwise the operator
    falls back to the exact combiner path and says so — approximation is a
    logged mode, never a silent one.  Shuffle cost: pass 1 moves
    O(s × batches) rows, pass 2 moves O(s × batches) — both independent of
    vocabulary size, unlike the exact combiner's O(vocab) exchange.
    """
    import logging

    from marc_record_merge_melindautils_ray.ops.text_analysis import _docs

    logger = logging.getLogger(__name__)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.strip().str.lower().str.split()
        vc = words.explode().dropna().value_counts()
        t, c, delta = mg_trim(vc.index.to_numpy(), vc.to_numpy(), s)
        out = pd.DataFrame({"term": t, "n": c})
        out["eps"] = np.int64(0)
        if len(out):
            out.iloc[0, out.columns.get_loc("eps")] = np.int64(delta)
        elif delta:
            out = pd.DataFrame({"term": [""], "n": [np.int64(0)],
                                "eps": [np.int64(delta)]})
        return out

    docs = _docs(sf_dir)
    summaries = docs.map_batches(partial, batch_format="pandas").to_pandas()
    # driver fold: O(s × batches) rows — tiny, independent of vocabulary
    eps = int(summaries["eps"].sum())
    merged = summaries.groupby("term", as_index=False)["n"].sum()
    merged = merged[merged["n"] > 0]
    t, c, delta = mg_trim(
        merged["term"].to_numpy(), merged["n"].to_numpy(), s
    )
    eps += delta
    candidates = set(t.tolist())

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.strip().str.lower().str.split()
        vc = words.explode().dropna().value_counts()
        hit = vc.index.isin(candidates)
        return pd.DataFrame({
            "term": vc.index.to_numpy()[hit],
            "n": vc.to_numpy()[hit].astype(np.int64),
        })

    exact = (
        docs.map_batches(recount, batch_format="pandas")
        .to_pandas()
        .groupby("term", as_index=False)["n"].sum()
        .sort_values(["n", "term"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    kth = int(exact["n"].iloc[-1]) if len(exact) >= k else 0
    if len(exact) >= k and kth > eps:
        return exact
    # guarantee not certified at this summary size — honest exact fallback
    logger.warning(
        "heavy_hitters: k-th count %d ≤ error bound %d at s=%d — falling "
        "back to the exact combiner path", kth, eps, s,
    )
    from marc_record_merge_melindautils_ray.ops.text_analysis import q_top_terms

    return q_top_terms(sf_dir, k=k)


# -------------------------------------------------------------- Count-Min
CMS_D, CMS_W = 4, 2048  # 4 rows × 2048 cols → ε = e/w ≈ 0.13 %, 64 KB int64


def _cms_partial(keys: np.ndarray, weights: np.ndarray,
                 d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    """Weighted Count-Min partial for one batch: d independent hash rows,
    one np.add.at scatter per row — vectorized over the batch's distinct
    keys (callers pre-count, so ``weights`` carries multiplicity)."""
    from marc_record_merge_melindautils_ray.functions.hashing import stable_str_hash

    cms = np.zeros((d, w), np.int64)
    if len(keys) == 0:
        return cms
    kh = stable_str_hash(keys.astype(object))
    for j in range(d):
        hj = splitmix64(kh ^ np.uint64((0x9E3779B97F4A7C15 * (j + 1)) & 0xFFFFFFFFFFFFFFFF))
        np.add.at(cms[j], (hj % np.uint64(w)).astype(np.int64), weights)
    return cms


def cms_query(cms: np.ndarray, keys: np.ndarray, w: int = CMS_W) -> np.ndarray:
    """Point estimates: min over the d rows (classic CM guarantee:
    estimate ≥ true, overshoot ≤ ε·N with high probability)."""
    from marc_record_merge_melindautils_ray.functions.hashing import stable_str_hash

    kh = stable_str_hash(np.asarray(keys, dtype=object))
    est = np.full(len(keys), np.iinfo(np.int64).max, np.int64)
    for j in range(cms.shape[0]):
        hj = splitmix64(kh ^ np.uint64((0x9E3779B97F4A7C15 * (j + 1)) & 0xFFFFFFFFFFFFFFFF))
        est = np.minimum(est, cms[j][(hj % np.uint64(w)).astype(np.int64)])
    return est


def count_min_terms(ds: rd.Dataset, col: str = "text") -> np.ndarray:
    """Corpus-wide term-frequency Count-Min: per-batch value_counts feed the
    weighted partial (one 64 KB blob per batch shuffles — cardinality-
    independent, the HLL layout), folded on the driver in O(batches)."""

    def partial(df: pd.DataFrame) -> pa.Table:
        words = df[col].fillna("").str.strip().str.lower().str.split()
        vc = words.explode().dropna().value_counts()
        cms = _cms_partial(vc.index.to_numpy(), vc.to_numpy().astype(np.int64))
        return pa.table({"cms": pa.array([cms.tobytes()], pa.binary())})

    total = np.zeros((CMS_D, CMS_W), np.int64)
    for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
        batch_size=256, batch_format="pyarrow"
    ):
        for blob in b["cms"]:
            total += np.frombuffer(blob.as_py(), np.int64).reshape(CMS_D, CMS_W)
    return total


def q_cms_term_counts(sf_dir: str, k: int = 15) -> pd.DataFrame:
    """Self-evaluating Count-Min report: estimate the corpus's top-k term
    frequencies from the sketch and carry the exact counts beside them, so
    every run exposes its own overestimate (the ann_recall pattern).  The
    exact side reuses the wordcount combiner; the sketch side never
    shuffles term strings at all."""
    from marc_record_merge_melindautils_ray.ops.text_analysis import q_top_terms

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    cms = count_min_terms(docs)
    top = q_top_terms(sf_dir, k=k)
    est = cms_query(cms, top["term"].to_numpy())
    return pd.DataFrame({
        "term": top["term"],
        "true_n": top["n"].astype(np.int64),
        "est_n": est,
        "overshoot": (est - top["n"].to_numpy()).astype(np.int64),
    })


# ------------------------------------------------------------------- KMV
KMV_K = 1024  # k-minimum-values sketch: RSE ≈ 1/√(k−2) ≈ 3.1 %


def _kmv_partial(keys: np.ndarray, k: int = KMV_K) -> np.ndarray:
    """k smallest 64-bit key hashes of one batch (sorted uint64)."""
    if len(keys) == 0:
        return np.empty(0, np.uint64)
    h = np.unique(splitmix64(np.asarray(keys, np.int64).view(np.uint64)))
    return h[:k]


def kmv_fold(parts: list[np.ndarray], k: int = KMV_K) -> np.ndarray:
    """Merge partials: k smallest of the union — the mergeability that makes
    KMV a distributed-aggregate sketch."""
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))[:k]


def kmv_estimate(sk: np.ndarray, k: int = KMV_K) -> int:
    """Distinct-count estimate: (k−1)·2⁶⁴ / h_k; exact when the sketch never
    filled (fewer than k distinct keys — the sketch IS the key set)."""
    if len(sk) < k:
        return int(len(sk))
    return int((k - 1) * (2.0 ** 64) / float(sk[k - 1]))


def kmv_set_ops(a: np.ndarray, b: np.ndarray, k: int = KMV_K) -> dict:
    """Union / intersection estimates from two sketches: the merged sketch
    estimates |A∪B|; Jaccard is estimated inside the merged k-min sample
    (fraction of its values present in BOTH input sketches — each value is a
    uniform hash, so the k-min set is a uniform sample of the union)."""
    u = kmv_fold([a, b], k)
    est_union = kmv_estimate(u, k)
    if len(u) == 0:
        return {"est_union": 0, "est_intersection": 0}
    both = np.isin(u, a) & np.isin(u, b)
    j = float(both.sum()) / float(len(u))
    return {"est_union": est_union, "est_intersection": int(round(j * est_union))}


def q_kmv_user_overlap(sf_dir: str) -> pd.DataFrame:
    """Self-evaluating KMV report: distinct users in the first vs second
    half of the event stream's time range, their union and overlap — all
    estimated from two mergeable 8 KB sketches — with the EXACT counts
    beside them (the ann_recall pattern).  Sketch partials are one row per
    (half, batch); nothing user-cardinality-sized shuffles or lands on the
    driver."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    lo = np.datetime64(ds.min("ts"), "us")
    hi = np.datetime64(ds.max("ts"), "us")
    mid = lo + (hi - lo) // 2

    def partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(t["ts"]).astype("datetime64[us]")
        u = np.asarray(t["user_id"], np.int64)
        rows, tags = [], []
        for tag, mask in (("a", ts < mid), ("b", ts >= mid)):
            sk = _kmv_partial(u[mask])
            rows.append(sk.tobytes())
            tags.append(tag)
        return pa.table({"half": pa.array(tags, pa.string()),
                         "kmv": pa.array(rows, pa.binary())})

    parts: dict[str, list[np.ndarray]] = {"a": [], "b": []}
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=256, batch_format="pyarrow"
    ):
        for tag, blob in zip(batch["half"].to_pylist(), batch["kmv"]):
            parts[tag].append(np.frombuffer(blob.as_py(), np.uint64))
    ska, skb = kmv_fold(parts["a"]), kmv_fold(parts["b"])
    ops = kmv_set_ops(ska, skb)

    # exact truth for the self-report (two-level distinct, tiny rows)
    def exact_pairs(t: pa.Table) -> pd.DataFrame:
        ts = np.asarray(t["ts"]).astype("datetime64[us]")
        return pd.DataFrame({
            "user_id": np.asarray(t["user_id"], np.int64),
            "half": np.where(ts < mid, "a", "b"),
        }).drop_duplicates()

    ex = (ds.map_batches(exact_pairs, batch_format="pyarrow")
          .groupby(["user_id", "half"]).count().to_pandas())
    na = int((ex["half"] == "a").sum())
    nb = int((ex["half"] == "b").sum())
    n_users = ex["user_id"].nunique()
    return pd.DataFrame({
        "est_a": [np.int64(kmv_estimate(ska))],
        "est_b": [np.int64(kmv_estimate(skb))],
        "est_union": [np.int64(ops["est_union"])],
        "est_intersection": [np.int64(ops["est_intersection"])],
        "true_a": [np.int64(na)],
        "true_b": [np.int64(nb)],
        "true_union": [np.int64(n_users)],
        "true_intersection": [np.int64(na + nb - n_users)],
    })


# ------------------------------------------------- grouped quantile sketch
def q_group_value_quantiles(sf_dir: str, n_bins: int = 4096) -> pd.DataFrame:
    """Approximate per-GROUP quantiles (p50/p90/p99 of value per event
    type) via mergeable fixed-width histograms — the grouped companion of
    ``value_quantiles``: one tiny (group, lo, hi, n) reduce sizes each
    group's bins, one pass accumulates per-(group, batch) histogram blobs
    (4096×8 B each, cardinality-independent), quantiles interpolate within
    their bin so error ≤ bin width against the mass-based quantile (≤ ~2
    bins against rank-based ``quantile_cont`` — convention difference).
    The driver folds O(groups × batches) blobs — never values."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def ranges(df: pd.DataFrame) -> pd.DataFrame:
        g = df.dropna(subset=["value"]).groupby("event_type")["value"]
        out = g.agg(lo="min", hi="max", n="size").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    # groups × batches partial rows — a driver fold, never the values
    rng = (
        ds.map_batches(ranges, batch_format="pandas").to_pandas()
        .groupby("event_type").agg(lo=("lo", "min"), hi=("hi", "max"),
                                   n=("n", "sum"))
    )
    lo = rng["lo"].to_dict()
    hi = rng["hi"].to_dict()

    def hist_blobs(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in df.dropna(subset=["value"]).groupby("event_type"):
            l, h = lo[et], hi[et]
            if h <= l:
                rows.append((et, np.zeros(n_bins, np.int64).tobytes()))
                continue
            b = np.clip(((sub["value"].to_numpy(np.float64) - l)
                         / ((h - l) / n_bins)).astype(np.int64), 0, n_bins - 1)
            rows.append((et, np.bincount(b, minlength=n_bins)
                         .astype(np.int64).tobytes()))
        return pd.DataFrame(rows, columns=["event_type", "hist"])

    folded: dict[str, np.ndarray] = {}
    for batch in ds.map_batches(hist_blobs, batch_format="pandas").iter_batches(
        batch_size=256, batch_format="pyarrow"
    ):
        for et, blob in zip(batch["event_type"].to_pylist(), batch["hist"]):
            h = np.frombuffer(blob.as_py(), np.int64)
            folded[et] = folded.get(et, np.zeros(n_bins, np.int64)) + h

    out_rows = []
    for et in sorted(folded):
        h = folded[et]
        l, hh = lo[et], hi[et]
        width = (hh - l) / n_bins if hh > l else 0.0
        cum = np.cumsum(h)
        total = int(cum[-1])
        qs = {}
        for q in (0.5, 0.9, 0.99):
            if total == 0 or width == 0.0:
                qs[q] = l
                continue
            target = q * total
            b = int(np.searchsorted(cum, target))
            prev = int(cum[b - 1]) if b > 0 else 0
            frac = (target - prev) / max(int(h[b]), 1)
            qs[q] = l + (b + frac) * width
        out_rows.append((et, int(rng["n"][et]),
                         int(round(qs[0.5] * 100)),
                         int(round(qs[0.9] * 100)),
                         int(round(qs[0.99] * 100))))
    return pd.DataFrame(out_rows, columns=[
        "event_type", "n", "p50_c", "p90_c", "p99_c"]).astype(
        {"n": np.int64, "p50_c": np.int64, "p90_c": np.int64,
         "p99_c": np.int64})
