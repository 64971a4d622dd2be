"""Audio feature extraction over clip payloads — the payload-axis operators
a training-data pipeline runs BEFORE dedup (quality gates, corpus profiling):
loudness, silence ratio, zero-crossing rate, spectral centroid, all computed
from REAL decoded PCM (the same G.711/PCM16/f32 codecs the verify stage
uses, ``functions/audio.py``).

Stage shape: a stateful actor pool over ``batch_format="pyarrow"`` batches —
decode is per-row (payloads are variable-length opaque binary, the
``input_hint`` layout), every feature kernel inside is vectorized numpy, and
payload bytes never leave the stage: the output is a narrow numeric table.
At 100 TB this is the canonical "map the heavy column, ship the light one"
pattern: run it early, write the features, and let every downstream query
prune the binary column at the read.

Mirror of the reference's field-analysis utilities (record-utils.js) lifted
to the audio domain: where melindautils inspects MARC control fields to
describe a record, these inspect the signal to describe a clip.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.functions.audio import decode, is_decodable

SILENCE_THRESH = 0.01  # |sample| below this counts as silence


def clip_features_row(pcm: np.ndarray, sr_hz: int) -> dict:
    """Feature dict for one decoded clip (float32 PCM in [-1, 1]).  All
    outputs are integers (centi-dB / permille / Hz / counts) so results are
    bit-stable across summation orders and machines."""
    n = int(pcm.size)
    if n == 0:
        return {"n_samples": 0, "rms_cdb": -12000, "silence_permille": 1000,
                "zcr_per_min": 0, "centroid_hz": 0}
    x = pcm.astype(np.float32, copy=False)
    energy = float(np.einsum("i,i->", x, x))  # single-pass, no x**2 temp
    rms = np.sqrt(energy / n)
    rms_cdb = int(round(20.0 * np.log10(rms) * 100)) if rms > 1e-6 else -12000
    silence = int(round(1000.0 * float(np.count_nonzero(np.abs(x) < SILENCE_THRESH)) / n))
    sgn = x >= 0.0
    crossings = int(np.count_nonzero(sgn[1:] != sgn[:-1]))
    zcr_per_min = int(round(60.0 * crossings * sr_hz / n)) if n > 1 else 0
    spec = np.abs(np.fft.rfft(x.astype(np.float64)))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr_hz)
    denom = float(spec.sum())
    centroid = int(round(float((freqs * spec).sum()) / denom)) if denom > 0 else 0
    return {"n_samples": n, "rms_cdb": rms_cdb, "silence_permille": silence,
            "zcr_per_min": zcr_per_min, "centroid_hz": centroid}


class ClipAudioFeatures:
    """Actor-pool stage: (clip_id, bytes, sr_hz, codec) batches → feature
    rows.  Undecodable codecs (the honest stubs) yield ``decode_ok=False``
    with zeroed features instead of poisoning the batch."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["clip_id"].to_pylist()
        codecs = t["codec"].to_pylist()
        srs = np.asarray(t["sr_hz"], np.int64)
        payloads = t["bytes"].to_pylist()
        rows = {"n_samples": [], "rms_cdb": [], "silence_permille": [],
                "zcr_per_min": [], "centroid_hz": []}
        ok = []
        for payload, codec, sr in zip(payloads, codecs, srs):
            if payload is not None and is_decodable(codec):
                feat = clip_features_row(decode(payload, codec), int(sr))
                ok.append(True)
            else:
                feat = {"n_samples": 0, "rms_cdb": 0, "silence_permille": 0,
                        "zcr_per_min": 0, "centroid_hz": 0}
                ok.append(False)
            for k, v in feat.items():
                rows[k].append(v)
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "decode_ok": pa.array(ok, pa.bool_()),
            **{k: pa.array(v, pa.int64()) for k, v in rows.items()},
        })


def clip_audio_features(clips: rd.Dataset, concurrency: int | None = None,
                        batch_size: int = 256) -> rd.Dataset:
    """Run the feature stage over a clips Dataset (input_hint schema).
    Columns are pruned to the four the stage needs BEFORE the actor pool, so
    transcript/metadata never ride along with the binary payloads."""
    from marc_record_merge_melindautils_ray.stages.cluster import actor_pool_size

    if concurrency is None:
        try:
            n = clips.count()
        except Exception:
            n = None
        concurrency = actor_pool_size(rows=n, rows_per_actor=4000)
    return clips.select_columns(["clip_id", "bytes", "sr_hz", "codec"]).map_batches(
        ClipAudioFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


TARGET_PEAK = 0.89125  # −1 dBFS


class ClipGainNormalize:
    """Payload→payload transform stage: decode, scale to a target peak
    (−1 dBFS), re-encode IN THE SAME CODEC, emit new bytes — the canonical
    heavy-column rewrite (what a resample / loudness-conform / transcode
    stage looks like).  Batches stay narrow: only the payload column is
    rewritten; undecodable codecs pass through untouched with
    ``normalized=False`` (same honesty contract as the feature stage).

    Scale note: output bytes are the same order of magnitude as input bytes,
    so this stage's blocks are payload-sized — write it straight to a
    partitioned sink (``pipelines/io.py``) rather than materializing, and
    keep ``batch_size`` small enough that batch × concurrency fits the heap.
    """

    def __init__(self, target_peak: float = TARGET_PEAK):
        self.target = float(target_peak)

    def __call__(self, t: pa.Table) -> pa.Table:
        from marc_record_merge_melindautils_ray.functions.audio import encode

        out_payloads: list[bytes | None] = []
        normalized = []
        gain_e6 = []
        for payload, codec in zip(t["bytes"].to_pylist(), t["codec"].to_pylist()):
            if payload is None or not is_decodable(codec):
                out_payloads.append(payload)
                normalized.append(False)
                gain_e6.append(0)
                continue
            pcm = decode(payload, codec)
            peak = float(np.max(np.abs(pcm))) if pcm.size else 0.0
            if peak <= 0.0:
                out_payloads.append(payload)  # silence: nothing to scale
                normalized.append(False)
                gain_e6.append(0)
                continue
            g = self.target / peak
            out_payloads.append(encode((pcm * g).astype(np.float32), codec))
            normalized.append(True)
            gain_e6.append(int(round(g * 1_000_000)))
        return pa.table({
            "clip_id": t["clip_id"],
            "bytes": pa.array(out_payloads, pa.binary()),
            "sr_hz": t["sr_hz"],
            "codec": t["codec"],
            "normalized": pa.array(normalized, pa.bool_()),
            "gain_e6": pa.array(gain_e6, pa.int64()),
        })


def clip_gain_normalize(clips: rd.Dataset, concurrency: int | None = None,
                        batch_size: int = 128,
                        target_peak: float = TARGET_PEAK) -> rd.Dataset:
    """Gain-normalize every clip payload (input_hint schema in, same schema
    out plus normalized/gain_e6 audit columns)."""
    from marc_record_merge_melindautils_ray.stages.cluster import actor_pool_size

    if concurrency is None:
        try:
            n = clips.count()
        except Exception:
            n = None
        concurrency = actor_pool_size(rows=n, rows_per_actor=4000)
    return clips.select_columns(["clip_id", "bytes", "sr_hz", "codec"]).map_batches(
        ClipGainNormalize,
        fn_constructor_args=(target_peak,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def clip_speaking_rate(clips: rd.Dataset, too_slow_milli: int = 1_000,
                       too_fast_milli: int = 20_000) -> rd.Dataset:
    """Cross-modal speaking-rate QC: transcript tokens per second of audio,
    the cheap misalignment detector every ASR corpus pipeline runs (a
    transcript pasted onto the wrong clip, a truncated recording, or a
    mislabeled duration shows up as an implausible rate long before any
    decode).

    Metadata-only — the stage selects (clip_id, dur_ms, transcript) so
    payload bytes never leave the scan; one vectorized regex count per
    batch; exact integer milli-tokens/sec (``1000·1000·n_tokens //
    dur_ms``) so thresholds are reproducible everywhere.  ``dur_ms ≤ 0``
    (metadata-corrupt) is flagged ``bad_duration`` rather than divided
    by."""

    def kern(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t["clip_id"]
        dur = np.asarray(t["dur_ms"], np.int64)
        ntok = np.asarray(
            pc.count_substring_regex(
                pc.fill_null(t["transcript"], ""), r"\S+"),
            np.int64)
        safe = np.maximum(dur, 1)
        rate = np.where(dur > 0, (1_000_000 * ntok) // safe, 0).astype(np.int64)
        flag = np.full(len(dur), "ok", dtype=object)
        flag[rate < too_slow_milli] = "too_slow"
        flag[rate > too_fast_milli] = "too_fast"
        flag[dur <= 0] = "bad_duration"
        return pa.table({
            "clip_id": ids,
            "n_tokens": pa.array(ntok, pa.int64()),
            "dur_ms": pa.array(dur, pa.int64()),
            "rate_milli_tok_s": pa.array(rate, pa.int64()),
            "rate_flag": pa.array(flag.tolist(), pa.string()),
        })

    return clips.select_columns(["clip_id", "dur_ms", "transcript"]).map_batches(
        kern, batch_format="pyarrow"
    )


# ----------------------------------------------------------------- VAD
def vad_segments_row(pcm: np.ndarray, sr_hz: int, frame_ms: int = 20,
                     thresh: float = SILENCE_THRESH, bridge_frames: int = 2,
                     min_frames: int = 3) -> list[tuple[int, int, int]]:
    """Energy-threshold voice-activity segments for one decoded clip:
    (start_ms, end_ms, rms_milli) per active segment.

    Frame RMS via one reshape (tail zero-padded), activity = RMS > thresh;
    gaps of ≤ ``bridge_frames`` inactive frames between active runs are
    bridged (speech pauses), then runs shorter than ``min_frames`` are
    dropped (clicks).  All boundaries are exact frame multiples so tests
    pin them closed-form."""
    spf = max(1, sr_hz * frame_ms // 1000)
    n = int(pcm.size)
    if n == 0:
        return []
    nf = (n + spf - 1) // spf
    buf = np.zeros(nf * spf, np.float32)
    buf[:n] = pcm
    rms = np.sqrt(np.mean(buf.reshape(nf, spf).astype(np.float64) ** 2, axis=1))
    active = rms > thresh
    if not active.any():
        return []
    # bridge short inactive gaps BETWEEN active frames (not the edges)
    idx = np.flatnonzero(active)
    gaps = np.diff(idx) - 1
    for g in np.flatnonzero((gaps > 0) & (gaps <= bridge_frames)):
        active[idx[g] + 1:idx[g + 1]] = True
    # run extraction
    d = np.diff(np.r_[0, active.astype(np.int8), 0])
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)          # exclusive
    out = []
    for s, e in zip(starts, ends):
        if e - s < min_frames:
            continue
        seg = buf[s * spf:min(e * spf, n)]
        r = float(np.sqrt(np.mean(seg.astype(np.float64) ** 2))) if len(seg) else 0.0
        out.append((int(s * frame_ms),
                    int(min(e * spf, n) * 1000 // sr_hz),
                    int(round(r * 1000))))
    return out


def clip_vad_segments(clips: rd.Dataset, frame_ms: int = 20,
                      thresh: float = SILENCE_THRESH, bridge_frames: int = 2,
                      min_frames: int = 3, batch_size: int = 128) -> rd.Dataset:
    """VAD segmentation: 1→N expansion of each clip into detected speech
    segments (the ASR-corpus prep pass that splits long recordings on
    silence).  Stateless task pool — decode per row, vectorized frame
    energy, no shuffle; payload bytes never leave the stage.  Undecodable
    clips emit one ``seg_idx=-1`` audit row instead of disappearing."""

    def kern(t: pa.Table) -> pa.Table:
        ids: list[str] = []
        seg_idx: list[int] = []
        s_ms: list[int] = []
        e_ms: list[int] = []
        rms: list[int] = []
        oks: list[bool] = []
        for i in range(len(t)):
            cid = t["clip_id"][i].as_py()
            codec = t["codec"][i].as_py()
            buf = t["bytes"][i]
            sr = t["sr_hz"][i].as_py() or 8000
            if not buf.is_valid or codec is None or not is_decodable(codec):
                ids.append(cid); seg_idx.append(-1); s_ms.append(-1)
                e_ms.append(-1); rms.append(0); oks.append(False)
                continue
            pcm = decode(buf.as_buffer(), codec)
            segs = vad_segments_row(pcm, int(sr), frame_ms, thresh,
                                    bridge_frames, min_frames)
            if not segs:
                ids.append(cid); seg_idx.append(-1); s_ms.append(-1)
                e_ms.append(-1); rms.append(0); oks.append(True)
                continue
            for j, (s, e, r) in enumerate(segs):
                ids.append(cid); seg_idx.append(j); s_ms.append(s)
                e_ms.append(e); rms.append(r); oks.append(True)
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "seg_idx": pa.array(seg_idx, pa.int64()),
            "start_ms": pa.array(s_ms, pa.int64()),
            "end_ms": pa.array(e_ms, pa.int64()),
            "rms_milli": pa.array(rms, pa.int64()),
            "decode_ok": pa.array(oks, pa.bool_()),
        })

    return clips.select_columns(
        ["clip_id", "bytes", "sr_hz", "codec"]).map_batches(
        kern, batch_format="pyarrow", batch_size=batch_size)


# ----------------------------------------------------------------- pitch
def pitch_f0_row(pcm: np.ndarray, sr_hz: int, f_lo: int = 60,
                 f_hi: int = 1000) -> tuple[int, int]:
    """Fundamental-frequency estimate for one clip via the autocorrelation
    peak inside the [f_lo, f_hi] lag band: (f0_mhz, strength_permille).
    One rfft/irfft round over the whole clip (Wiener–Khinchin), no O(n·lag)
    scan; strength = peak autocorrelation / zero-lag energy."""
    n = int(pcm.size)
    if n == 0:
        return 0, 0
    x = pcm.astype(np.float64) - float(pcm.mean())
    m = 1 << int(2 * n - 1).bit_length()
    f = np.fft.rfft(x, m)
    ac = np.fft.irfft(f * np.conj(f), m)[:n]
    if ac[0] <= 0:
        return 0, 0
    lag_min = max(1, sr_hz // f_hi)
    lag_max = min(n - 1, sr_hz // f_lo)
    if lag_max <= lag_min:
        return 0, 0
    band = ac[lag_min:lag_max + 1]
    pk = int(np.argmax(band)) + lag_min
    strength = float(ac[pk] / ac[0])
    return int(round(1000.0 * sr_hz / pk)), int(round(strength * 1000))


def clip_pitch(clips: rd.Dataset, batch_size: int = 128) -> rd.Dataset:
    """Per-clip pitch estimation (f0 in milli-Hz + autocorrelation strength
    permille) — the prosody/QC feature an ASR corpus pipeline extracts.
    Stateless task pool; payload bytes never leave the stage; undecodable
    rows emit decode_ok=false."""

    def kern(t: pa.Table) -> pa.Table:
        n = len(t)
        f0 = np.zeros(n, np.int64)
        st = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i in range(n):
            codec = t["codec"][i].as_py()
            buf = t["bytes"][i]
            sr = t["sr_hz"][i].as_py() or 8000
            if not buf.is_valid or codec is None or not is_decodable(codec):
                continue
            pcm = decode(buf.as_buffer(), codec)
            f0[i], st[i] = pitch_f0_row(pcm, int(sr))
            ok[i] = True
        return pa.table({
            "clip_id": t["clip_id"],
            "f0_mhz": pa.array(f0, pa.int64()),
            "strength_permille": pa.array(st, pa.int64()),
            "decode_ok": pa.array(ok, pa.bool_()),
        })

    return clips.select_columns(
        ["clip_id", "bytes", "sr_hz", "codec"]).map_batches(
        kern, batch_format="pyarrow", batch_size=batch_size)


# ------------------------------------------------------------ expectations
CLIP_CODECS = ("pcm16", "f32", "ulaw", "alaw", "opus", "mp3")
CLIP_RATES = (8000, 16000, 22050, 44100, 48000)


def clip_expectations(clips: rd.Dataset) -> "pd.DataFrame":
    """Declarative ingest-gate expectations over the ``input_hint`` clip
    table (the clips-side twin of ``q_expectations_check``): every rule is a
    vectorized row-local predicate, one streaming pass emits rule-count-
    sized violation partials.  The synthetic conformance corpus plants rows
    that violate several rules by design (poison statuses, ``^^`` Aleph
    multifield residue), so the pass has real signal in tests."""
    import pandas as pd

    rules = [
        ("clip_id_not_null", lambda d: d["clip_id"].isna()
         | (d["clip_id"].astype(str).str.len() == 0)),
        ("sr_in_domain", lambda d: ~d["sr_hz"].isin(CLIP_RATES)),
        ("dur_positive", lambda d: ~(d["dur_ms"] > 0)),
        ("codec_in_domain", lambda d: ~d["codec"].isin(CLIP_CODECS)),
        ("status_in_domain", lambda d: ~d["status"].isin(
            ["active", "deleted", "suppressed"])),
        ("transcript_no_aleph_multifield", lambda d: d["transcript"]
         .fillna("").astype(str).str.contains(r"\^\^", regex=True)),
        ("payload_not_empty", lambda d: d["bytes"].isna()
         | (d["bytes"].str.len() == 0)),
    ]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "rule": [name for name, _ in rules],
            "violations": np.array([int(pred(df).sum()) for _, pred in rules],
                                   np.int64),
        })

    cols = ["clip_id", "sr_hz", "dur_ms", "codec", "status", "transcript",
            "bytes"]
    out = (clips.select_columns(cols)
           .map_batches(partial, batch_format="pandas").to_pandas()
           .groupby("rule", as_index=False)["violations"].sum())
    out["violations"] = out["violations"].astype(np.int64)
    return out.sort_values("rule").reset_index(drop=True)
