"""Payload→payload audio transforms beyond gain normalization: sample-rate
conversion, silence trimming, and fixed-window segmentation — the remaining
heavy-column rewrites a training-data pipeline runs before/around dedup
(conform sample rates so fingerprints compare, drop dead air that dilutes
shingles, split long clips into model-sized windows).

Stage shape matches ``ops/audio_features.py``: stateful actor pools over
``batch_format="pyarrow"`` batches, per-row decode of variable-length opaque
binary (the ``input_hint`` layout), vectorized numpy kernels inside, and the
honesty contract throughout — undecodable codecs pass through byte-identical
with the audit flag False, never poisoning a batch.

Scale note: all three stages emit payload-sized blocks; write them straight
to a partitioned sink (``pipelines/io.py``) rather than materializing, and
keep ``batch_size`` small enough that batch × concurrency fits the heap.
Segmentation additionally never decodes for the frame-aligned codecs
(pcm16/f32/G.711): a sample slice IS a byte slice at a fixed stride, so the
hot path is pure buffer arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.functions.audio import decode, encode, is_decodable

# bytes per sample for the frame-aligned codecs (segmentation fast path)
_FRAME_BYTES = {"pcm16": 2, "f32": 4, "ulaw": 1, "alaw": 1}


def _pool(clips: rd.Dataset, concurrency: int | None, rows_per_actor: int = 4000) -> int:
    from marc_record_merge_melindautils_ray.stages.cluster import actor_pool_size

    if concurrency is not None:
        return concurrency
    try:
        n = clips.count()
    except Exception:
        n = None
    return actor_pool_size(rows=n, rows_per_actor=rows_per_actor)


# ----------------------------------------------------------------- resample
class ClipResample:
    """Decode → linear-interpolation resample to ``target_sr`` → re-encode in
    the clip's own codec.  Linear interp is the public-domain baseline
    (np.interp, fully vectorized); a polyphase kernel drops in per-actor if a
    DSP library exists.  Clips already at the target rate (and undecodable
    payloads) pass through byte-identical with ``resampled=False``."""

    def __init__(self, target_sr: int = 16_000):
        self.target_sr = int(target_sr)

    def __call__(self, t: pa.Table) -> pa.Table:
        out_payloads: list[bytes | None] = []
        out_sr: list[int] = []
        out_n: list[int] = []
        resampled: list[bool] = []
        for payload, codec, sr in zip(t["bytes"].to_pylist(),
                                      t["codec"].to_pylist(),
                                      np.asarray(t["sr_hz"], np.int64)):
            sr = int(sr)
            if payload is None or not is_decodable(codec) or sr == self.target_sr or sr <= 0:
                out_payloads.append(payload)
                out_sr.append(sr)
                n0 = 0
                if payload is not None and codec in _FRAME_BYTES:
                    n0 = len(payload) // _FRAME_BYTES[codec]
                out_n.append(n0)
                resampled.append(False)
                continue
            pcm = decode(payload, codec)
            n_in = pcm.size
            n_out = int(round(n_in * self.target_sr / sr))
            if n_in == 0 or n_out == 0:
                out_payloads.append(payload)
                out_sr.append(sr)
                out_n.append(n_in)
                resampled.append(False)
                continue
            # sample instants in seconds; endpoints clamp (np.interp semantics)
            t_out = np.arange(n_out, dtype=np.float64) * (1.0 / self.target_sr)
            t_in = np.arange(n_in, dtype=np.float64) * (1.0 / sr)
            y = np.interp(t_out, t_in, pcm.astype(np.float64)).astype(np.float32)
            out_payloads.append(encode(y, codec))
            out_sr.append(self.target_sr)
            out_n.append(n_out)
            resampled.append(True)
        return pa.table({
            "clip_id": t["clip_id"],
            "bytes": pa.array(out_payloads, pa.binary()),
            "sr_hz": pa.array(out_sr, pa.int32()),
            "codec": t["codec"],
            "resampled": pa.array(resampled, pa.bool_()),
            "out_n_samples": pa.array(out_n, pa.int64()),
        })


def clip_resample(clips: rd.Dataset, target_sr: int = 16_000,
                  concurrency: int | None = None,
                  batch_size: int = 128) -> rd.Dataset:
    """Resample every clip payload to ``target_sr`` (input_hint schema in,
    same schema out plus resampled/out_n_samples audit columns)."""
    return clips.select_columns(["clip_id", "bytes", "sr_hz", "codec"]).map_batches(
        ClipResample,
        fn_constructor_args=(target_sr,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool(clips, concurrency),
    )


# ------------------------------------------------------------- silence trim
class ClipSilenceTrim:
    """Strip leading/trailing samples whose magnitude stays below ``thresh``
    (with ``pad_ms`` of context kept on each side), re-encode in the clip's
    own codec.  Fully-silent and undecodable clips pass through
    byte-identical with ``trimmed=False`` — dropping them is a FILTER
    decision that belongs to the caller, not a transform side effect."""

    def __init__(self, thresh: float = 0.01, pad_ms: int = 20):
        self.thresh = float(thresh)
        self.pad_ms = int(pad_ms)

    def __call__(self, t: pa.Table) -> pa.Table:
        out_payloads: list[bytes | None] = []
        trimmed: list[bool] = []
        front_ms: list[int] = []
        back_ms: list[int] = []
        out_ms: list[int] = []
        for payload, codec, sr, dur in zip(t["bytes"].to_pylist(),
                                           t["codec"].to_pylist(),
                                           np.asarray(t["sr_hz"], np.int64),
                                           np.asarray(t["dur_ms"], np.int64)):
            sr = int(sr)
            if payload is None or not is_decodable(codec) or sr <= 0:
                out_payloads.append(payload)
                trimmed.append(False)
                front_ms.append(0)
                back_ms.append(0)
                out_ms.append(int(dur))
                continue
            pcm = decode(payload, codec)
            loud = np.flatnonzero(np.abs(pcm) >= self.thresh)
            if loud.size == 0:  # fully silent: nothing defensible to keep
                out_payloads.append(payload)
                trimmed.append(False)
                front_ms.append(0)
                back_ms.append(0)
                out_ms.append(int(dur))
                continue
            pad = sr * self.pad_ms // 1000
            lo = max(0, int(loud[0]) - pad)
            hi = min(pcm.size, int(loud[-1]) + 1 + pad)
            if lo == 0 and hi == pcm.size:  # nothing to trim
                out_payloads.append(payload)
                trimmed.append(False)
                front_ms.append(0)
                back_ms.append(0)
                out_ms.append(int(dur))
                continue
            out_payloads.append(encode(pcm[lo:hi], codec))
            trimmed.append(True)
            front_ms.append(int(round(1000.0 * lo / sr)))
            back_ms.append(int(round(1000.0 * (pcm.size - hi) / sr)))
            out_ms.append(int(round(1000.0 * (hi - lo) / sr)))
        return pa.table({
            "clip_id": t["clip_id"],
            "bytes": pa.array(out_payloads, pa.binary()),
            "sr_hz": t["sr_hz"],
            "codec": t["codec"],
            "trimmed": pa.array(trimmed, pa.bool_()),
            "trimmed_front_ms": pa.array(front_ms, pa.int64()),
            "trimmed_back_ms": pa.array(back_ms, pa.int64()),
            "out_dur_ms": pa.array(out_ms, pa.int64()),
        })


def clip_silence_trim(clips: rd.Dataset, thresh: float = 0.01, pad_ms: int = 20,
                      concurrency: int | None = None,
                      batch_size: int = 128) -> rd.Dataset:
    """Trim leading/trailing silence from every clip payload (input_hint
    schema in, same schema out plus trim-audit columns)."""
    return clips.select_columns(
        ["clip_id", "bytes", "sr_hz", "dur_ms", "codec"]).map_batches(
        ClipSilenceTrim,
        fn_constructor_args=(thresh, pad_ms),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool(clips, concurrency),
    )


# ------------------------------------------------------------- segmentation
def _segment_batch(t: pa.Table, seg_ms: int, min_tail_frac: float) -> pa.Table:
    """Expand each clip row into fixed-``seg_ms`` child rows.  Frame-aligned
    codecs slice the ENCODED buffer directly (no decode, no re-encode — a
    byte-identical sample slice); non-frame-aligned (stubbed) codecs pass
    through whole as segment 0.  A final partial window survives only if it
    covers ≥ ``min_tail_frac`` of ``seg_ms`` — short tails fold into nothing
    rather than emitting confetti rows."""
    ids: list[str] = []
    parents: list[str] = []
    seg_idx: list[int] = []
    payloads: list[bytes | None] = []
    srs: list[int] = []
    codecs: list[str] = []
    seg_dur: list[int] = []
    segmented: list[bool] = []
    for cid, payload, codec, sr, row_dur in zip(t["clip_id"].to_pylist(),
                                                t["bytes"].to_pylist(),
                                                t["codec"].to_pylist(),
                                                np.asarray(t["sr_hz"], np.int64),
                                                np.asarray(t["dur_ms"], np.int64)):
        sr = int(sr)
        stride = _FRAME_BYTES.get(codec)
        if payload is None or stride is None or sr <= 0:
            ids.append(f"{cid}#0")
            parents.append(cid)
            seg_idx.append(0)
            payloads.append(payload)
            srs.append(sr)
            codecs.append(codec)
            # pass-through audit: a stub (non-frame-aligned) codec still has
            # a real metadata duration — report it instead of a false 0
            seg_dur.append(int(row_dur))
            segmented.append(False)
            continue
        n_samples = len(payload) // stride
        win = sr * seg_ms // 1000
        if win <= 0 or n_samples <= win:
            ids.append(f"{cid}#0")
            parents.append(cid)
            seg_idx.append(0)
            payloads.append(payload)
            srs.append(sr)
            codecs.append(codec)
            seg_dur.append(int(round(1000.0 * n_samples / sr)))
            segmented.append(False)
            continue
        n_full = n_samples // win
        tail = n_samples - n_full * win
        bounds = [(k * win, (k + 1) * win) for k in range(n_full)]
        if tail >= min_tail_frac * win:
            bounds.append((n_full * win, n_samples))
        for k, (lo, hi) in enumerate(bounds):
            ids.append(f"{cid}#{k}")
            parents.append(cid)
            seg_idx.append(k)
            payloads.append(payload[lo * stride:hi * stride])
            srs.append(sr)
            codecs.append(codec)
            seg_dur.append(int(round(1000.0 * (hi - lo) / sr)))
            segmented.append(True)
    return pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "parent_id": pa.array(parents, pa.string()),
        "seg_idx": pa.array(seg_idx, pa.int64()),
        "bytes": pa.array(payloads, pa.binary()),
        "sr_hz": pa.array(srs, pa.int32()),
        "codec": pa.array(codecs, pa.string()),
        "seg_dur_ms": pa.array(seg_dur, pa.int64()),
        "segmented": pa.array(segmented, pa.bool_()),
    })


def clip_segments(clips: rd.Dataset, seg_ms: int = 1000,
                  min_tail_frac: float = 0.5,
                  batch_size: int = 128) -> rd.Dataset:
    """Split every clip into fixed-duration windows (1→N row expansion with
    ``parent_id``/``seg_idx`` lineage).  Stateless — a task pool, not an
    actor pool: the kernel holds nothing between batches, and for the
    frame-aligned codecs it never even decodes."""
    return clips.select_columns(
        ["clip_id", "bytes", "sr_hz", "dur_ms", "codec"]).map_batches(
        lambda t: _segment_batch(t, seg_ms, min_tail_frac),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


# -------------------------------------------------------------- transcode
class ClipTranscode:
    """Re-encode every decodable clip in ``target_codec`` — the conform
    stage a mixed-codec corpus runs before fingerprinting so signatures
    compare like-for-like.  Emits the measured round-trip SNR (centi-dB,
    int; -1 when source == target and bytes pass through) so lossy
    conversions are auditable per row instead of silently degrading
    downstream dedup.  Undecodable sources pass through byte-identical."""

    def __init__(self, target_codec: str = "pcm16"):
        if target_codec not in _FRAME_BYTES:
            raise ValueError(f"no encoder for target codec {target_codec!r}")
        self.target = target_codec

    def __call__(self, t: pa.Table) -> pa.Table:
        from marc_record_merge_melindautils_ray.functions.audio import snr_db

        out_payloads: list[bytes | None] = []
        out_codecs: list[str] = []
        transcoded: list[bool] = []
        snr_cdb: list[int] = []
        for payload, codec in zip(t["bytes"].to_pylist(), t["codec"].to_pylist()):
            if payload is None or not is_decodable(codec) or codec == self.target:
                out_payloads.append(payload)
                out_codecs.append(codec)
                transcoded.append(False)
                snr_cdb.append(-1)
                continue
            pcm = decode(payload, codec)
            new_payload = encode(pcm, self.target)
            out_payloads.append(new_payload)
            out_codecs.append(self.target)
            transcoded.append(True)
            back = decode(new_payload, self.target)
            s = snr_db(pcm, back)
            snr_cdb.append(int(round(min(s, 120.0) * 100)))
        return pa.table({
            "clip_id": t["clip_id"],
            "bytes": pa.array(out_payloads, pa.binary()),
            "sr_hz": t["sr_hz"],
            "codec": pa.array(out_codecs, pa.string()),
            "transcoded": pa.array(transcoded, pa.bool_()),
            "roundtrip_snr_cdb": pa.array(snr_cdb, pa.int64()),
        })


def clip_transcode(clips: rd.Dataset, target_codec: str = "pcm16",
                   concurrency: int | None = None,
                   batch_size: int = 128) -> rd.Dataset:
    """Conform every clip payload to ``target_codec`` (input_hint schema in,
    same schema out plus transcoded/roundtrip_snr_cdb audit columns)."""
    return clips.select_columns(["clip_id", "bytes", "sr_hz", "codec"]).map_batches(
        ClipTranscode,
        fn_constructor_args=(target_codec,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool(clips, concurrency),
    )


# ---------------------------------------------------------- composed prep
def clip_prep_features(clips: rd.Dataset, target_codec: str = "pcm16",
                       trim_thresh: float = 0.01, pad_ms: int = 20,
                       concurrency: int | None = None,
                       batch_size: int = 128) -> rd.Dataset:
    """The composed payload-prep chain a corpus runs before fingerprinting:
    silence-trim → transcode-conform → feature extraction, as ONE lazy
    Dataset pipeline — three actor-pool stages back to back, payload blocks
    streaming stage-to-stage through the object store with no intermediate
    materialization and no driver pass.  Returns the narrow feature table
    (payload bytes die inside the last stage)."""
    from marc_record_merge_melindautils_ray.ops.audio_features import ClipAudioFeatures

    conc = _pool(clips, concurrency)
    trimmed = clips.select_columns(
        ["clip_id", "bytes", "sr_hz", "dur_ms", "codec"]).map_batches(
        ClipSilenceTrim,
        fn_constructor_args=(trim_thresh, pad_ms),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=conc,
    )
    conformed = trimmed.select_columns(
        ["clip_id", "bytes", "sr_hz", "codec"]).map_batches(
        ClipTranscode,
        fn_constructor_args=(target_codec,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=conc,
    )
    return conformed.select_columns(
        ["clip_id", "bytes", "sr_hz", "codec"]).map_batches(
        ClipAudioFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=conc,
    )


# ------------------------------------------------------------------ stitch
def _stitch_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("seg_idx")
    payloads = [p for p in g["bytes"] if p is not None]
    joined = b"".join(payloads) if payloads else None
    sr = int(g["sr_hz"].iloc[0])
    codec = g["codec"].iloc[0]
    stride = _FRAME_BYTES.get(codec)
    n = (len(joined) // stride) if (joined is not None and stride) else 0
    return pd.DataFrame({
        "clip_id": [g["parent_id"].iloc[0]],
        "bytes": [joined],
        "sr_hz": np.array([sr], np.int32),
        "codec": [codec],
        "n_segments": np.array([len(g)], np.int64),
        "dur_ms": np.array([int(round(1000.0 * n / sr)) if sr > 0 and stride
                            else int(g["seg_dur_ms"].sum())], np.int64),
    })


def clip_stitch(segments: rd.Dataset) -> rd.Dataset:
    """Inverse of ``clip_segments`` (N→1 reassembly): group segment rows by
    ``parent_id``, order by ``seg_idx``, and concatenate the ENCODED payload
    bytes — zero decode for frame-aligned codecs, so
    ``stitch(segment(x)) == x`` byte-for-byte whenever no tail window was
    dropped (property-tested).  This is the one payload-axis op whose
    shuffle necessarily carries payload bytes (every segment of a clip must
    co-locate); blocks stay payload-sized and stream through the object
    store — size upstream ``batch_size`` accordingly, exactly like the
    segmentation stage."""
    return segments.groupby("parent_id").map_groups(
        _stitch_group, batch_format="pandas",
    )
