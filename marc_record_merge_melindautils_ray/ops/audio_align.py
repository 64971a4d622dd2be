"""Time-offset alignment of candidate duplicate clip pairs — the
shift-invariant dedup primitive.

The flagship verify gate (decoded-PCM SNR, ``stages/verify.py``) is
samplewise by design — the ``input_hint`` per-row invariant — so a clip
that is a *time-shifted* copy of another (re-broadcast with a station
ident, padded intro, trimmed lead-in) fails it even though the audio is
the same.  This operator estimates the best integer-sample offset per
candidate pair via FFT cross-correlation and re-checks the SNR invariant
*after* aligning, emitting the lag so downstream canonicalization can trim.

Scale shape:
  * candidate blocking is the same normalized-transcript-hash groupby the
    engine's exact tier uses — only (hash, clip_id) rows shuffle, with the
    hub guard raising on degenerate boilerplate groups instead of emitting
    O(n²) pairs;
  * payload bytes never shuffle: pairs resolve (block, row) locations
    against per-worker ``ArrowBlockIndex`` state over materialized payload
    blocks (zero-copy plasma reads), the exact plumbing of phase-2 verify;
  * the per-pair kernel is one O((la+lb)·log) rfft/irfft round — no
    quadratic lag scan — and the PCM LRU amortizes decode across pairs
    sharing a clip.

Reference anchor: the pairwise comparator family (``canMerge``,
/root/reference/lib/marc-record-merge-melindautils.js:74) — this is the
comparator the reference does NOT have, added for the audio payload axis.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.functions import audio as au
from marc_record_merge_melindautils_ray.functions.util import task_stage
from marc_record_merge_melindautils_ray.ops.graph import pairs_within_groups
from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

SNR_CAP_CDB = 9990  # centi-dB cap for the +inf (bit-identical overlap) case


def xcorr_lag(a: np.ndarray, b: np.ndarray) -> tuple[int, float]:
    """Best integer-sample lag of ``b`` relative to ``a`` and the normalized
    peak correlation in [0, 1].  Positive lag = ``b`` is ``a`` delayed
    (b[t] ≈ a[t - lag]).  One zero-padded rfft/irfft round; the circular
    buffer is sized to the full linear range so no valid lag aliases."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0, 0.0
    m = 1 << int(la + lb - 1).bit_length()
    fa = np.fft.rfft(a, m)
    fb = np.fft.rfft(b, m)
    c = np.fft.irfft(np.conj(fa) * fb, m)  # c[l] = Σ_t a[t]·b[t+l mod m]
    # valid lags: 0..lb-1 (b delayed) and -(la-1)..-1 (wrapped at m-|l|)
    pos = c[:lb]
    neg = c[m - la + 1:] if la > 1 else np.empty(0, c.dtype)
    ip = int(np.argmax(pos))
    vn = float(neg.max()) if len(neg) else -np.inf
    vp = float(pos[ip])
    if vp >= vn:
        lag, peak = ip, vp
    else:
        in_ = int(np.argmax(neg))
        lag, peak = in_ - (la - 1), float(neg[in_])
    denom = float(np.sqrt(np.sum(a.astype(np.float64) ** 2)
                          * np.sum(b.astype(np.float64) ** 2)))
    return lag, (peak / denom if denom > 0 else 0.0)


def aligned_overlap(a: np.ndarray, b: np.ndarray, lag: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """The two equal-length views that overlay once ``b`` is shifted by
    ``lag`` samples (positive lag: b[lag:] aligns with a[0:])."""
    if lag >= 0:
        n = min(len(a), len(b) - lag)
        return a[:n], b[lag:lag + n]
    n = min(len(b), len(a) + lag)
    return a[-lag:-lag + n], b[:n]


class PairAligner:
    """Warm-worker task-path stage: per pair decode (LRU), conform rates,
    FFT cross-correlate, re-check SNR on the aligned overlap."""

    def __init__(self, block_refs, min_snr_db: float = 30.0,
                 min_corr_permille: int = 500):
        from marc_record_merge_melindautils_ray.state.broadcast_index import (
            ArrowBlockIndex,
        )

        self._index = ArrowBlockIndex(block_refs, "clip_id")
        self._pcm: OrderedDict[str, tuple[np.ndarray, int]] = OrderedDict()
        self.min_snr_db = min_snr_db
        self.min_corr_permille = min_corr_permille

    def _pcm_of(self, cid: str, bi: int, ri: int):
        if cid in self._pcm:
            self._pcm.move_to_end(cid)
            return self._pcm[cid]
        if bi < 0:
            return None, None
        t = self._index.tables[int(bi)]
        s = t["bytes"][int(ri)]
        codec = t["codec"][int(ri)].as_py()
        sr = t["sr_hz"][int(ri)].as_py()
        if not s.is_valid or codec is None or not au.is_decodable(codec):
            return None, None
        pcm = au.decode(s.as_buffer(), codec)
        self._pcm[cid] = (pcm, int(sr))
        if len(self._pcm) > 256:
            self._pcm.popitem(last=False)
        return pcm, int(sr)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        ba, ra, _ = self._index.lookup(df["id_a"].to_numpy())
        bb, rb, _ = self._index.lookup(df["id_b"].to_numpy())
        lag_ms = np.zeros(n, np.int64)
        peak = np.zeros(n, np.int64)
        snr_cdb = np.full(n, -(10 ** 6), np.int64)
        ok = np.zeros(n, bool)
        decodable = np.ones(n, bool)
        for i in range(n):
            pa_, sra = self._pcm_of(df["id_a"].iat[i], ba[i], ra[i])
            pb, srb = self._pcm_of(df["id_b"].iat[i], bb[i], rb[i])
            # zero-length decoded payloads are as unalignable as undecodable
            # ones: there is no overlap window to correlate against.
            if pa_ is None or pb is None or len(pa_) == 0 or len(pb) == 0:
                decodable[i] = False
                continue
            if sra != srb:  # conform the higher rate down, like phase-2
                if sra > srb:
                    pa_, sra = au.resample_linear(pa_, sra, srb), srb
                else:
                    pb, srb = au.resample_linear(pb, srb, sra), sra
            lag, corr = xcorr_lag(pa_, pb)
            sa, sb = aligned_overlap(pa_, pb, lag)
            s = au.snr_db(sa, sb) if len(sa) else -np.inf
            lag_ms[i] = round(lag * 1000 / sra)
            peak[i] = int(round(corr * 1000))
            # non-finite SNR: +inf (identical overlap) caps at SNR_CAP_CDB;
            # -inf/nan (silent or empty reference overlap) pins at the floor —
            # int(round(-inf)) would raise OverflowError and kill the stage.
            if not np.isfinite(s):
                snr_cdb[i] = SNR_CAP_CDB if s > 0 else -(10 ** 6)
            else:
                snr_cdb[i] = max(int(round(s * 100)), -(10 ** 6))
            ok[i] = (peak[i] >= self.min_corr_permille
                     and snr_cdb[i] >= int(self.min_snr_db * 100))
        return pd.DataFrame({
            "id_a": df["id_a"].to_numpy(),
            "id_b": df["id_b"].to_numpy(),
            "lag_ms": lag_ms,
            "peak_corr_permille": peak,
            "aligned_snr_cdb": snr_cdb,
            "decodable": decodable,
            "align_ok": ok,
        })


def align_candidate_pairs(clips: rd.Dataset, min_snr_db: float = 30.0,
                          min_corr_permille: int = 500,
                          hub_guard: int = 256) -> rd.Dataset:
    """Full alignment pass: normalized-transcript-hash blocking → vectorized
    within-group pair emission (hub-guarded) → per-pair FFT alignment."""
    from marc_record_merge_melindautils_ray.functions.hashing import stable_str_hash
    from marc_record_merge_melindautils_ray.functions.textnorm import (
        normalize_transcript_array,
    )

    def key_rows(t: pa.Table) -> pa.Table:
        norm = normalize_transcript_array(t["transcript"].combine_chunks()
                                          if isinstance(t["transcript"], pa.ChunkedArray)
                                          else t["transcript"])
        kh = stable_str_hash(np.asarray(norm, dtype=object))
        return pa.table({
            "tkey": pa.array(kh.view(np.int64), pa.int64()),
            "clip_id": t["clip_id"],
        })

    keyed = clips.select_columns(["clip_id", "transcript"]).map_batches(
        key_rows, batch_format="pyarrow")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > hub_guard:
            raise RuntimeError(
                f"alignment blocking group of {len(g)} rows exceeds "
                f"hub_guard={hub_guard}: salt the transcript key or raise "
                "the guard explicitly (capped-work contract)")
        ids = np.sort(g["clip_id"].to_numpy().astype(object))
        a, b = pairs_within_groups(ids, np.zeros(len(ids), np.int64))
        return pd.DataFrame({"id_a": a.astype(str), "id_b": b.astype(str)})

    pairs = keyed.groupby("tkey").map_groups(emit_pairs, batch_format="pandas")

    payload_blocks = (
        clips.select_columns(["clip_id", "bytes", "codec", "sr_hz"])
        .materialize().to_arrow_refs()
    )
    nparts = adaptive_parts(clips.count())
    return pairs.repartition(nparts).map_batches(
        task_stage(PairAligner,
                   (payload_blocks, min_snr_db, min_corr_permille),
                   key=("align", min_snr_db, min_corr_permille,
                        *payload_blocks)),
        batch_format="pandas",
    )


def q_clips_align_offset(sf_dir: str) -> pd.DataFrame:
    """Query entry: align the shifted-duplicate corpus (sf-scaled).  Rows-
    only (FFT kernel, not SQL-expressible); exact-lag recovery, distractor
    rejection, and the lossy-codec path are pinned in
    tests/test_audio_align.py."""
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.sources.synth import make_shifted_corpus

    try:
        n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    except Exception:
        n_li = 6000
    clips, _ = make_shifted_corpus(max(10, n_li // 300), 7)
    out = align_candidate_pairs(rd.from_arrow(clips)).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def shift_clusters(clips: rd.Dataset, min_snr_db: float = 30.0,
                   min_corr_permille: int = 500) -> rd.Dataset:
    """Composed shift-dedup pipeline: alignment pass → keep ``align_ok``
    pairs → distributed union-find → (clip_id, cluster_id) assignments.
    The duplicate class the flagship engine's samplewise invariant rejects
    by construction, clustered with the engine's own CC machinery."""
    from marc_record_merge_melindautils_ray.config import DedupConfig
    from marc_record_merge_melindautils_ray.stages.cluster import connected_components

    aligned = align_candidate_pairs(
        clips, min_snr_db=min_snr_db, min_corr_permille=min_corr_permille)
    edges = aligned.map_batches(
        lambda d: d.loc[d["align_ok"], ["id_a", "id_b"]],
        batch_format="pandas",
    )
    return connected_components(edges, DedupConfig())


def q_clips_shift_clusters(sf_dir: str) -> pd.DataFrame:
    """Query entry: cluster the shifted-duplicate corpus.  Rows-only; planted
    pairs must land in one cluster each, distractors in none."""
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.sources.synth import make_shifted_corpus

    try:
        n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    except Exception:
        n_li = 6000
    clips, _ = make_shifted_corpus(max(10, n_li // 300), 7)
    out = shift_clusters(rd.from_arrow(clips)).to_pandas()
    return out.sort_values("clip_id").reset_index(drop=True)
