"""Stage 4: pairwise verification — the reference's ``canMerge`` kernel.

The reference runs 11 validators sequentially per pair, accumulating every
failure message before throwing one joined error
(``lib/marc-record-merge-melindautils.js:74-120``).  The new engine keeps that
accumulate-all-reasons contract (``reasons: list<string>`` per pair) but
splits verification into two phases by cost:

* **Phase 1** (vectorized, no payloads): every gate decidable from the ~100 B
  of signature/metadata columns already carried on the pair row — codec class
  (V5), segment-of (V12), duration descriptor (V10 analog), shared source
  (V3), normalized-transcript hash equality, SimHash Hamming distance.
  Runs as a stateless ``map_batches`` directly on the pair stream; typically
  eliminates the vast majority of candidates without touching audio.
* **Phase 2** (actor pool, payloads): the ``input_hint`` per-row invariant —
  decode both payloads to PCM and require allclose at SNR ≥ 30 dB; for
  containment pairs, a substring check on normalized transcripts plus an FFT
  segment search.  Payloads are fetched by clip_id for phase-1 survivors only
  (a tiny fraction), broadcast via ``ray.put`` under a size guard; above the
  guard the fetch falls back to a hash-partitioned join (see
  ``pipelines.dedup.fetch_payloads``).

Reason vocabulary (stable strings, asserted by the golden conformance corpus):
``deleted suppressed malformed same-source codec-class segment-of
duration-mismatch transcript-mismatch fingerprint-distance undecodable
payload-asymmetry pcm-snr-below-threshold priority-source-orientation
diacritics-loss``.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions import audio as au
from marc_record_merge_melindautils_ray.functions.textnorm import (
    has_diacritics,
    normalize_transcript,
)

DUR_TOL_MS = 60
DUR_TOL_REL = 0.03


def _dur_mismatch(da: np.ndarray, db: np.ndarray) -> np.ndarray:
    """V10 analog: inferred duration descriptor must match within tolerance
    (the reference requires parsed {type, count} equality,
    lib/mergeability-validators.js:152-178)."""
    diff = np.abs(da.astype(np.int64) - db.astype(np.int64))
    tol = np.maximum(DUR_TOL_MS, (DUR_TOL_REL * np.maximum(da, db)).astype(np.int64))
    return diff > tol


def _payload_eq(a, b) -> bool:
    """memcmp of two payloads that may be pa.Buffer views or bytes."""
    if isinstance(a, pa.Buffer) and isinstance(b, pa.Buffer):
        return a.equals(b)
    return bytes(a) == bytes(b)


def _sources_overlap(sa, sb) -> bool:
    """V3 noSameLOWTags (lib/mergeability-validators.js:52-67)."""
    if sa is None or sb is None:
        return False
    return bool(set(sa) & set(sb))

# phase-1 gate vocabulary in ADD order — bit i of ``reason_bits`` is gate i,
# and decoding bits in ascending order reproduces the reference's
# accumulate-in-sequence reason list (lib/marc-record-merge-melindautils.js:74-120)
PHASE1_REASONS = [
    "codec-class", "segment-of", "undecodable", "duration-mismatch",
    "transcript-mismatch", "fingerprint-distance", "same-source",
    "author-type-mismatch", "host-record",
]


def _arr(t: pa.Table, name: str) -> pa.Array:
    c = t[name]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _neq_nullsafe(a: pa.Array, b: pa.Array) -> np.ndarray:
    """Element-wise != with null==null → equal, null vs value → unequal
    (the pandas object-array comparison semantics the old kernel had)."""
    import pyarrow.compute as pc

    va = np.asarray(pc.is_valid(a))
    vb = np.asarray(pc.is_valid(b))
    neq = np.asarray(pc.fill_null(pc.not_equal(a, b), False))
    return np.where(va & vb, neq, va != vb)


def _list_overlap_mask(a: pa.Array, b: pa.Array) -> np.ndarray:
    """V3 noSameLOWTags, vectorized over the whole batch: per-row set overlap
    of two (tiny) list<string> columns via one flattened all-combos string
    compare — no per-row Python sets.  Null lists overlap nothing."""
    import pyarrow.compute as pc

    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=bool)
    oa = np.asarray(a.offsets, dtype=np.int64)
    ob = np.asarray(b.offsets, dtype=np.int64)
    va = np.asarray(pc.is_valid(a))
    vb = np.asarray(pc.is_valid(b))
    ka = np.diff(oa) * va
    kb = np.diff(ob) * vb
    combos = ka * kb
    tot = int(combos.sum())
    if tot == 0:
        return np.zeros(n, dtype=bool)
    flat_a = np.empty(len(a.values), dtype=object)
    if len(a.values):
        flat_a[:] = a.values.to_pylist()
    flat_b = np.empty(len(b.values), dtype=object)
    if len(b.values):
        flat_b[:] = b.values.to_pylist()
    rep = np.repeat(np.arange(n), combos)
    j = np.arange(tot) - np.repeat(np.cumsum(combos) - combos, combos)
    kb_rep = np.repeat(np.maximum(kb, 1), combos)
    ai = np.repeat(oa[:-1], combos) + j // kb_rep
    bi = np.repeat(ob[:-1], combos) + j % kb_rep
    eq = flat_a[ai] == flat_b[bi]
    return np.bincount(rep[eq], minlength=n) > 0


def make_phase1_kernel(cfg: DedupConfig, host_ids: frozenset[str] | None = None):
    """Arrow-native phase-1 gate kernel for the candidate-pair stream — the
    pipeline's largest intermediate.  Gates compute as numpy masks straight
    off the Arrow batch (zero-copy from the object store), accumulate into a
    ``reason_bits`` bitmask column, and reason STRINGS materialize via one
    flat ``ListArray`` build over the failing (row, gate) hits — no per-pair
    Python list allocation on the survivor majority; survivors carry an empty
    list, the same contract as the old pandas kernel at a fraction of the
    cost (round-2 verdict item 4).

    ``host_ids`` is the V11 ``notHostRecord`` side input — the reference
    queries an external bibliographic DB per pair
    (``lib/mergeability-validators.js:180-236``); the engine takes the host
    id set as an injected broadcast side table (the sinon-stub analog,
    ``test/MergeUtilsMelinda.spec.js:74-84``)."""
    import pyarrow.compute as pc

    hosts = host_ids or frozenset()
    host_arr = pa.array(sorted(hosts), pa.string()) if hosts else None
    reason_names = np.array(PHASE1_REASONS, dtype=object)

    def phase1(t: pa.Table) -> pa.Table:
        n = t.num_rows
        is_cont = np.asarray(pc.equal(_arr(t, "rel"), "containment")) if n else np.zeros(0, bool)
        codec_neq = _neq_nullsafe(_arr(t, "codec_cls_a"), _arr(t, "codec_cls_b"))
        seg = np.asarray(pc.is_valid(_arr(t, "is_segment_of_a"))) | np.asarray(
            pc.is_valid(_arr(t, "is_segment_of_b"))
        )
        dec_a = np.asarray(pc.fill_null(_arr(t, "decode_ok_a"), False))
        dec_b = np.asarray(pc.fill_null(_arr(t, "decode_ok_b"), False))
        undecodable = ~(dec_a & dec_b) & ~codec_neq
        dur_bad = _dur_mismatch(
            np.asarray(_arr(t, "dur_ms_a")), np.asarray(_arr(t, "dur_ms_b"))
        )
        nh_bad = (
            np.asarray(_arr(t, "nh0_a")) != np.asarray(_arr(t, "nh0_b"))
        ) | (np.asarray(_arr(t, "nh1_a")) != np.asarray(_arr(t, "nh1_b")))
        ham = au.hamming64(
            np.asarray(_arr(t, "fp_a")).astype(np.uint64),
            np.asarray(_arr(t, "fp_b")).astype(np.uint64),
        )
        overlap = _list_overlap_mask(_arr(t, "sources_a"), _arr(t, "sources_b"))
        # V8 sameAuthorType: per-tag (person/org/meeting) author-field count
        # equality (lib/mergeability-validators.js:117-133).  One author slot
        # per clip ⇒ counts match iff the (possibly absent) types match.
        at_neq = np.asarray(pc.not_equal(
            pc.fill_null(_arr(t, "author_type_a"), ""),
            pc.fill_null(_arr(t, "author_type_b"), ""),
        ))
        masks = [
            codec_neq,
            seg,
            undecodable,
            dur_bad & ~is_cont,
            nh_bad & ~is_cont,
            (ham > cfg.simhash_max_hamming) & ~is_cont,
            overlap,
            at_neq,
        ]
        if host_arr is not None:
            masks.append(
                np.asarray(pc.is_in(_arr(t, "id_a"), value_set=host_arr))
                | np.asarray(pc.is_in(_arr(t, "id_b"), value_set=host_arr))
            )  # V11
        M = (
            np.stack([np.asarray(m, dtype=bool) for m in masks], axis=1)
            if n
            else np.zeros((0, len(masks)), bool)
        )
        bits = np.zeros(n, np.int32)
        for i in range(M.shape[1]):
            bits |= M[:, i].astype(np.int32) << i
        # flat reason-string build: one values array over failing (row, gate)
        # hits in row-major order — zero Python lists on the survivor majority
        rows_hit, gate_hit = np.nonzero(M)
        offsets = np.zeros(n + 1, np.int32)
        np.cumsum(M.sum(axis=1, dtype=np.int32), out=offsets[1:])
        reasons = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(reason_names[gate_hit], pa.string())
            if len(gate_hit)
            else pa.array([], pa.string()),
        )
        # byte-identity verdict, vectorized: equal 128-bit content hashes
        # (codec + length folded in, functions.hashing.PayloadHasher) on a
        # surviving band pair mean the payloads decode to identical PCM —
        # SNR is +inf by construction, so phase-2 never needs to touch
        # these pairs' bytes at all.  ch==0 marks "not hashed" (undecodable)
        # and is excluded via the decode_ok gate.
        if n and "ch0_a" in t.column_names:
            ch_eq = np.asarray(pc.fill_null(
                pc.and_kleene(
                    pc.equal(_arr(t, "ch0_a"), _arr(t, "ch0_b")),
                    pc.equal(_arr(t, "ch1_a"), _arr(t, "ch1_b")),
                ),
                False,
            ))
            is_band = np.asarray(pc.equal(_arr(t, "rel"), "band"))
            exact = (bits == 0) & ch_eq & is_band & dec_a & dec_b
        else:
            exact = np.zeros(n, dtype=bool)
        return (
            t.append_column("reason_bits", pa.array(bits, pa.int32()))
            .append_column("reasons", reasons)
            .append_column("ok1", pa.array(bits == 0))
            .append_column("exact", pa.array(exact, pa.bool_()))
        )

    return phase1


def survivors_to_table(t: pa.Table) -> pa.Table:
    """Filter phase-1 survivors to the slim pair projection (types stay
    explicit via PAIR_SCHEMA all the way through, so empty blocks never infer
    null-typed columns)."""
    import pyarrow.compute as pc

    keep = t.filter(pc.equal(t["ok1"], True))
    return keep.select(["id_a", "id_b", "rel", "bucket_n", "exact"])


class HostLookupVerify:
    """V11 ``notHostRecord`` with a LIVE injected lookup client.

    The reference queries an external bibliographic X-server per pair
    (``lib/mergeability-validators.js:180-236``) with THREE distinguishable
    outcomes per record id:

    * ``{'error': 'empty set'}``          → not a host record (pair unaffected)
    * ``{'no_records': n}`` with ``n > 0`` → host record → ``host-record``
    * anything else (malformed response or a raised client error) →
      ``host-lookup-error`` — the ``mergeError('Could not parse response…')``
      analog: the pair FAILS, it is never silently treated as non-host.

    Runs as an actor-pool ``map_batches`` stage over the (small) survivor
    pair stream: the fallible client is held per actor from ``__init__`` (the
    reference's constructor-injected ``bib_db`` handle) and outcomes are
    memoized per actor, so each clip id is looked up once per actor no matter
    how many pairs carry it.  The precomputed ``host_ids`` frozenset in
    ``make_phase1_kernel`` remains the zero-IO fast path for pre-resolved
    side tables; this stage is the slot for wiring a real (fallible) host
    service.  Appends a nullable ``host_reason`` column; the pipeline splits
    on it visibly (counted, never dropped silently)."""

    HOST = "host-record"
    ERROR = "host-lookup-error"

    def __init__(self, client):
        self.client = client
        self.cache: dict[str, str | None] = {}

    def _status(self, cid: str) -> str | None:
        if cid in self.cache:
            return self.cache[cid]
        try:
            resp = self.client(cid)
        except Exception:
            st: str | None = self.ERROR
        else:
            if isinstance(resp, dict) and resp.get("error") == "empty set":
                st = None
            elif (
                isinstance(resp, dict)
                and isinstance(resp.get("no_records"), int)
                and resp["no_records"] > 0
            ):
                st = self.HOST
            else:
                st = self.ERROR
        self.cache[cid] = st
        return st

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_a = t["id_a"].to_pylist()
        ids_b = t["id_b"].to_pylist()
        out = []
        for a, b in zip(ids_a, ids_b):
            sa, sb = self._status(a), self._status(b)
            # a lookup ERROR on either side outranks a host verdict on the
            # other: the reference's try/catch rethrows the parse error
            # before the host-errors check can run
            if sa == self.ERROR or sb == self.ERROR:
                out.append(self.ERROR)
            elif sa == self.HOST or sb == self.HOST:
                out.append(self.HOST)
            else:
                out.append(None)
        return t.append_column("host_reason", pa.array(out, pa.string()))


class PairPcmVerify:
    """Phase-2 actor: decoded-PCM SNR / containment checks on survivors.

    Payloads live as materialized Arrow blocks in the object store
    (``pipelines.dedup.build_payload_blocks``).  Each actor builds a
    clip_id → (block, row) ``ArrowBlockIndex`` ONCE in ``__init__`` from the
    block refs — ``ray.get`` of a plasma block is zero-copy on the node that
    holds it and a locality-aware transfer otherwise — then resolves pair
    locations itself per batch (vectorized searchsorted), so the driver never
    builds a location dict and no separate "locate" pipeline stage exists.
    Per-actor state initialized once is the Ray analog of the reference's
    constructor-held DB handles (``lib/marc-record-merge-melindautils.js:60``).
    Rows may alternatively carry payloads inline (``bytes_a``/``bytes_b``
    columns) for store-free unit use.
    """

    def __init__(self, cfg: DedupConfig, block_refs=None, direct: bool = False):
        from marc_record_merge_melindautils_ray.state.broadcast_index import ArrowBlockIndex

        self.cfg = cfg
        self.direct = direct
        key = "clip_id" if direct else "pid"
        self._index = ArrowBlockIndex(block_refs, key) if block_refs else None
        self._pcm_cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self._norm_cache: OrderedDict[tuple[int, int], str] = OrderedDict()
        # decode-cache hit-rate instrumentation (VERDICT r4 item 7): when
        # GRAFT_PCM_CACHE_STATS names a directory, each worker periodically
        # dumps its cumulative counters there (measurement-only; off by
        # default, zero hot-path cost beyond two int increments)
        self._cache_hits = 0
        self._cache_misses = 0
        import os as _os

        self._stats_dir = _os.environ.get("GRAFT_PCM_CACHE_STATS")

    def _maybe_dump_cache_stats(self) -> None:
        if not self._stats_dir:
            return
        total = self._cache_hits + self._cache_misses
        if total % 64 == 0:
            import json as _json
            import os as _os

            path = _os.path.join(
                self._stats_dir, f"pcm_cache_{_os.getpid()}_{id(self)}.json")
            with open(path, "w") as f:
                _json.dump({"hits": self._cache_hits,
                            "misses": self._cache_misses}, f)

    def _norm_of(self, bi: int, ri: int) -> str | None:
        """Fetch only the normalized transcript — cheap column access; the
        (large) payload bytes are touched only after the text gates pass.
        Direct mode indexes the raw clip blocks, so the normalization is
        computed on demand per accessed row (LRU-cached)."""
        if bi < 0:
            return None
        if not self.direct:
            return self._index.tables[int(bi)]["p_norm"][int(ri)].as_py()
        k = (int(bi), int(ri))
        if k in self._norm_cache:
            self._norm_cache.move_to_end(k)
            return self._norm_cache[k]
        from marc_record_merge_melindautils_ray.functions.textnorm import (
            normalize_transcript,
        )

        raw = self._index.tables[k[0]]["transcript"][k[1]].as_py()
        norm = normalize_transcript(raw or "")
        self._norm_cache[k] = norm
        if len(self._norm_cache) > 8192:
            self._norm_cache.popitem(last=False)
        return norm

    def _payload_of(self, bi: int, ri: int):
        """Payload as a zero-copy ``pa.Buffer`` view into the plasma block
        (``as_py`` would copy every payload out of shared memory);
        ``np.frombuffer`` in the decoder accepts it directly."""
        if bi < 0:
            return None, None
        t = self._index.tables[int(bi)]
        bcol, ccol = ("bytes", "codec") if self.direct else ("p_bytes", "p_codec")
        s = t[bcol][int(ri)]
        return (s.as_buffer() if s.is_valid else None), t[ccol][int(ri)].as_py()

    def _sr_of(self, bi: int, ri: int):
        """Clip sample rate from the indexed block; ``None`` on legacy blocks
        that predate the ``p_sr`` column (treated as same-rate)."""
        if bi < 0:
            return None
        t = self._index.tables[int(bi)]
        col = "sr_hz" if self.direct else "p_sr"
        if col not in t.column_names:
            return None
        v = t[col][int(ri)]
        return v.as_py() if v.is_valid else None

    def _pcm(self, cid: str, payload, codec) -> np.ndarray | None:
        if cid in self._pcm_cache:
            self._pcm_cache.move_to_end(cid)
            self._cache_hits += 1
            self._maybe_dump_cache_stats()
            return self._pcm_cache[cid]
        if payload is None or codec is None or not au.is_decodable(codec):
            return None
        self._cache_misses += 1
        self._maybe_dump_cache_stats()
        pcm = au.decode(payload, codec)
        self._pcm_cache[cid] = pcm
        # MEASURED at 326 k clips / 33.9 k near pairs (round 5, env
        # GRAFT_PCM_CACHE_STATS): 0 hits / 66 752 misses — pair-hash
        # sharding gives ZERO cross-pair decode locality, and the int16
        # fast kernel already removed pcm16 pairs from this path entirely
        # (only transcode/containment/cross-rate pairs decode).  The LRU
        # therefore only needs to cover repeats WITHIN one batch; 64
        # entries (~15 MB of 2-4 s clips) is ample, and re-keying the
        # phase-2 shuffle by min(id) is not worth an extra exchange for a
        # measured-zero benefit (BASELINE.md records the decision).
        if len(self._pcm_cache) > 64:
            self._pcm_cache.popitem(last=False)
        return pcm

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        oks = np.zeros(n, dtype=bool)
        snrs = np.full(n, -np.inf, dtype=np.float64)
        parents = np.full(n, None, dtype=object)
        extra: list[list[str]] = [[] for _ in range(n)]
        inline = "bytes_a" in df.columns
        if not inline and self._index is not None:
            # vectorized id → (block, row) resolution against the actor-local
            # index; a miss surfaces as block -1 → "undecodable" below
            ba, ra, _ = self._index.lookup(df["id_a"].to_numpy())
            bb, rb, _ = self._index.lookup(df["id_b"].to_numpy())
            df = df.copy()
            df["block_a"], df["row_a"] = ba, ra
            df["block_b"], df["row_b"] = bb, rb
        for i, row in enumerate(df.itertuples(index=False)):
            a, b, rel = row.id_a, row.id_b, row.rel
            if inline:
                bytes_a, codec_a, norm_a = row.bytes_a, row.codec_a, row.norm_a
                bytes_b, codec_b, norm_b = row.bytes_b, row.codec_b, row.norm_b
                sr_a = getattr(row, "sr_a", None)
                sr_b = getattr(row, "sr_b", None)
            else:
                norm_a = self._norm_of(row.block_a, row.row_a)
                norm_b = self._norm_of(row.block_b, row.row_b)
                if norm_a is None or norm_b is None:
                    extra[i].append("undecodable")
                    continue
                # containment text gate BEFORE any payload access: the LSH
                # gram pass can propose unrelated pairs; rejecting them here
                # costs a string containment check, not two payload copies
                if rel == "containment" and (
                    not norm_a or not norm_b
                    or (norm_a not in norm_b and norm_b not in norm_a)
                ):
                    extra[i].append("transcript-mismatch")
                    continue
                bytes_a, codec_a = self._payload_of(row.block_a, row.row_a)
                bytes_b, codec_b = self._payload_of(row.block_b, row.row_b)
                sr_a = self._sr_of(row.block_a, row.row_a)
                sr_b = self._sr_of(row.block_b, row.row_b)
            # byte-identical fast path BEFORE any decode: same decodable
            # codec + equal payload bytes decode to identical PCM, so SNR is
            # +inf by construction — a memcmp replaces two decodes + the
            # float SNR kernel for exact-duplicate pairs (the common case)
            if (
                rel == "band"
                and codec_a == codec_b
                and sr_a == sr_b  # identical bytes at different rates are
                # different SIGNALS (playback speed) — not a duplicate
                and bytes_a is not None
                and bytes_b is not None
                and codec_a is not None
                and au.is_decodable(codec_a)
                and _payload_eq(bytes_a, bytes_b)
            ):
                oks[i] = True
                snrs[i] = float("inf")
                continue
            # int16 fast kernel: pcm16↔pcm16 at a common rate never decodes
            # to float32 at all — raw little-endian int16 views straight off
            # the plasma buffers feed the exact integer SNR (half the
            # bytes/sample of the float path; the stage is DRAM-bound).
            # SNR is scale-invariant, so verdicts match the float path to
            # <0.001 dB (snr_gate_i16 docstring).
            if (
                rel == "band"
                and codec_a == "pcm16"
                and codec_b == "pcm16"
                and sr_a == sr_b
                and bytes_a is not None
                and bytes_b is not None
            ):
                ia = np.frombuffer(bytes_a, dtype="<i2")
                ib = np.frombuffer(bytes_b, dtype="<i2")
                m = min(len(ia), len(ib))
                if m == 0 or abs(len(ia) - len(ib)) > max(1, int(0.05 * m)):
                    extra[i].append("duration-mismatch")
                    continue
                okb, s = au.snr_gate_i16(ia[:m], ib[:m], self.cfg.snr_db)
                snrs[i] = s
                if okb:
                    oks[i] = True
                else:
                    extra[i].append("pcm-snr-below-threshold")
                continue
            pa_ = self._pcm(a, bytes_a, codec_a)
            pb = self._pcm(b, bytes_b, codec_b)
            if pa_ is None or pb is None:
                extra[i].append("undecodable")
                continue
            # cross-sample-rate pair: conform the higher-rate side down to
            # the common (lower) rate before any samplewise comparison — the
            # per-row invariant (decoded-PCM SNR) is defined at a common
            # rate; linear interp is exact for integer-ratio upsampled dups
            if sr_a is not None and sr_b is not None and sr_a != sr_b:
                if sr_a > sr_b:
                    pa_ = au.resample_linear(pa_, int(sr_a), int(sr_b))
                else:
                    pb = au.resample_linear(pb, int(sr_b), int(sr_a))
            if rel == "band":
                m = min(len(pa_), len(pb))
                if m == 0 or abs(len(pa_) - len(pb)) > max(1, int(0.05 * m)):
                    extra[i].append("duration-mismatch")
                    continue
                okb, s = au.snr_gate(pa_[:m], pb[:m], self.cfg.snr_db)
                snrs[i] = s
                if okb:
                    oks[i] = True
                else:
                    extra[i].append("pcm-snr-below-threshold")
            else:  # containment
                na, nb = norm_a or "", norm_b or ""
                if len(pa_) <= len(pb):
                    short_id, long_id, ps, pl, ns, nl = a, b, pa_, pb, na, nb
                else:
                    short_id, long_id, ps, pl, ns, nl = b, a, pb, pa_, nb, na
                if not ns or ns not in nl:
                    extra[i].append("transcript-mismatch")
                    continue
                off = au.find_segment(ps, pl, self.cfg.snr_db)
                if off < 0:
                    extra[i].append("pcm-snr-below-threshold")
                    continue
                oks[i] = True
                parents[i] = long_id
        out = df.copy()
        out["ok"] = oks
        out["snr"] = snrs
        out["parent"] = parents
        if "reasons" in out.columns:
            out["reasons"] = [
                (list(r0) if r0 is not None else []) + r1
                for r0, r1 in zip(out["reasons"], extra)
            ]
        else:
            out["reasons"] = extra
        return out


# --------------------------------------------------------------------------
# Oriented pair verification — the full canMerge analog as a pure function,
# used by the golden conformance corpus (pairs come with fixed roles, like the
# reference's (otherRecord, preferredRecord) call site,
# lib/marc-record-merge-melindautils.js:74).
# --------------------------------------------------------------------------
def verify_oriented_pairs(
    clips: pa.Table,
    pairs: pa.Table,
    cfg: DedupConfig,
    host_ids: frozenset[str] | None = None,
    field_rules: dict | None = None,
) -> pd.DataFrame:
    """Returns (case, id_other, id_preferred, ok, reasons, diagnostics).

    Includes the direction-sensitive gates the unordered pipeline resolves by
    orientation instead:
    * V4 preferredRecordInFENNI — other carries the priority source but
      preferred doesn't (lib/mergeability-validators.js:69-81)
    * V7 checkDiacriticsFromTitle — other's transcript has diacritics and
      preferred's doesn't (lib/mergeability-validators.js:109-114)
    * V8 sameAuthorType — 100/110/111 count equality via the author_type
      column (lib/mergeability-validators.js:117-133)

    ``diagnostics`` is the U16 non-gating channel: the two-sided
    checkForDiacritics report + the 245-superset STAT messages
    (lib/marc-record-merge-melindautils.js:106-114).
    """
    df = clips.to_pandas().set_index("clip_id")
    rows = []

    def _aslist(v):
        return [] if v is None or (hasattr(v, "__len__") and len(v) == 0) else list(v)

    for p in pairs.to_pylist():
        o, pref = df.loc[p["id_other"]], df.loc[p["id_preferred"]]
        reasons: list[str] = []
        for side in (o, pref):
            st = (side.get("status") or "").lower()
            if st == "deleted":
                reasons.append("deleted")       # V1
            if st == "suppressed":
                reasons.append("suppressed")    # V2
            if (side.get("transcript") or "").startswith("^^"):
                reasons.append("malformed")     # V9
        if _sources_overlap(_aslist(o["sources"]), _aslist(pref["sources"])):
            reasons.append("same-source")       # V3
        osrc = set(_aslist(o["sources"]))
        psrc = set(_aslist(pref["sources"]))
        if cfg.priority_source in osrc and cfg.priority_source not in psrc:
            reasons.append("priority-source-orientation")  # V4
        from marc_record_merge_melindautils_ray.schema import codec_class

        if codec_class(o["codec"]) != codec_class(pref["codec"]):
            reasons.append("codec-class")       # V5
        ot, pt = o["transcript"] or "", pref["transcript"] or ""
        if has_diacritics(ot) and not has_diacritics(pt):
            reasons.append("diacritics-loss")   # V7
        if (o.get("author_type") or "") != (pref.get("author_type") or ""):
            reasons.append("author-type-mismatch")  # V8 count-equality analog
        if o["is_segment_of"] or pref["is_segment_of"]:
            reasons.append("segment-of")        # V12
        if host_ids and (p["id_other"] in host_ids or p["id_preferred"] in host_ids):
            reasons.append("host-record")       # V11 (side-table analog)
        if _dur_mismatch(np.array([o["dur_ms"]]), np.array([pref["dur_ms"]]))[0]:
            reasons.append("duration-mismatch")  # V10 analog
        if field_rules:
            # F1 declarative per-column rules (lib/validate-fields.js:32-94)
            from marc_record_merge_melindautils_ray.functions.field_rules import (
                validate_fields,
            )

            def _cols(side):
                return {
                    col: ([side[col]] if side.get(col) else [])
                    for col in field_rules
                }

            reasons.extend(validate_fields(field_rules, _cols(o), _cols(pref)))
        if normalize_transcript(ot) != normalize_transcript(pt):
            reasons.append("transcript-mismatch")
        # U16 checkForDiacritics — DIAGNOSTIC ONLY, never gates the merge:
        # the reference logs these as debug STAT lines
        # (lib/marc-record-merge-melindautils.js:106-114,
        #  lib/record-utils.js:325-347); the analog is a metrics column.
        diagnostics: list[str] = []
        od, pd_ = has_diacritics(ot), has_diacritics(pt)
        if od and pd_:
            diagnostics.append("diacritics-both")
        else:
            if pd_:
                diagnostics.append("diacritics-preferred")
            if od:
                diagnostics.append("diacritics-other")
        # the 245-superset STAT line analog (diagnostic preferredIsSuperset
        # over the title/transcript column)
        from marc_record_merge_melindautils_ray.functions.field_rules import (
            validate_fields as _vf,
        )

        for msg in _vf(
            {"transcript": {"validate": ["preferredIsSuperset"], "key": normalize_transcript}},
            {"transcript": [ot] if ot else []},
            {"transcript": [pt] if pt else []},
        ):
            diagnostics.append(f"stat-245: {msg}")
        ob, pb = o.get("bytes"), pref.get("bytes")
        if ob is None and pb is None:
            # text-only pair (API convenience path): the input_hint PCM
            # invariant is vacuous when neither side carries audio
            pass
        elif (ob is None) != (pb is None):
            # exactly one side carries audio: the PCM-allclose invariant
            # cannot hold — a distinct reason, not "undecodable" (both
            # payloads may be perfectly decodable)
            reasons.append("payload-asymmetry")
        elif (
            ob is not None and pb is not None
            and au.is_decodable(o["codec"]) and au.is_decodable(pref["codec"])
        ):
            x, y = au.decode(ob, o["codec"]), au.decode(pb, pref["codec"])
            # cross-sample-rate pair: conform the higher-rate side to the
            # common rate before the samplewise invariant (same rule as the
            # pipeline's phase-2 verify)
            sro, srp = o.get("sr_hz"), pref.get("sr_hz")
            if sro and srp and sro != srp:
                if sro > srp:
                    x = au.resample_linear(x, int(sro), int(srp))
                else:
                    y = au.resample_linear(y, int(srp), int(sro))
            m = min(len(x), len(y))
            if len(x) != len(y) and abs(len(x) - len(y)) > max(1, int(0.05 * m)):
                if "duration-mismatch" not in reasons:
                    reasons.append("duration-mismatch")
            elif au.snr_db(x[:m], y[:m]) < cfg.snr_db:
                reasons.append("pcm-snr-below-threshold")
        elif codec_class(o["codec"]) == codec_class(pref["codec"]):
            reasons.append("undecodable")
        rows.append(
            {"case": p.get("case"), "id_other": p["id_other"], "id_preferred": p["id_preferred"],
             "ok": not reasons, "reasons": reasons, "diagnostics": diagnostics}
        )
    return pd.DataFrame(rows)
