"""Payload→payload transforms: resample (closed-form sine accuracy +
passthrough), silence trim (exact boundaries + full-silence passthrough),
segmentation (byte-identical sample slices + tail rule + lineage)."""

import numpy as np
import pyarrow as pa
import pytest


def _sine(sr: int, dur_s: float, f: float = 440.0, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(sr * dur_s), dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _clips_table(rows):
    return pa.table({
        "clip_id": pa.array([r["clip_id"] for r in rows], pa.string()),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "sr_hz": pa.array([r["sr_hz"] for r in rows], pa.int32()),
        "dur_ms": pa.array([r.get("dur_ms", 1000) for r in rows], pa.int32()),
        "codec": pa.array([r["codec"] for r in rows], pa.string()),
        "transcript": pa.array(["x" for _ in rows], pa.string()),
    })


# ------------------------------------------------------------------ resample
def test_resample_sine_accuracy(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions.audio import decode, encode, snr_db
    from marc_record_merge_melindautils_ray.ops.audio_transforms import clip_resample

    src = _sine(8000, 1.0)
    clips = _clips_table([
        {"clip_id": "a", "bytes": encode(src, "f32"), "sr_hz": 8000, "codec": "f32"},
        {"clip_id": "b", "bytes": encode(src, "pcm16"), "sr_hz": 8000, "codec": "pcm16"},
    ])
    out = clip_resample(rd.from_arrow(clips), target_sr=16_000,
                        concurrency=2).to_pandas().set_index("clip_id")
    want = _sine(16_000, 1.0)
    for cid, codec in (("a", "f32"), ("b", "pcm16")):
        row = out.loc[cid]
        assert row["resampled"] and row["sr_hz"] == 16_000
        assert row["out_n_samples"] == 16_000
        got = decode(bytes(row["bytes"]), codec)
        # linear interp of a 440 Hz sine at 8→16 kHz: > 30 dB fidelity
        assert snr_db(want[: got.size], got) > 30.0, (cid, codec)


def test_resample_passthrough_when_at_target(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions.audio import encode
    from marc_record_merge_melindautils_ray.ops.audio_transforms import clip_resample

    payload = encode(_sine(16_000, 0.5), "pcm16")
    clips = _clips_table([
        {"clip_id": "same", "bytes": payload, "sr_hz": 16_000, "codec": "pcm16"},
        {"clip_id": "stub", "bytes": b"\x00\x01", "sr_hz": 8000, "codec": "mp3"},
    ])
    out = clip_resample(rd.from_arrow(clips), target_sr=16_000,
                        concurrency=2).to_pandas().set_index("clip_id")
    assert not out.loc["same", "resampled"]
    assert bytes(out.loc["same", "bytes"]) == payload
    assert not out.loc["stub", "resampled"]
    assert bytes(out.loc["stub", "bytes"]) == b"\x00\x01"
    assert out.loc["stub", "sr_hz"] == 8000  # stub keeps its original rate


def test_resample_downsample_count(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions.audio import encode
    from marc_record_merge_melindautils_ray.ops.audio_transforms import clip_resample

    clips = _clips_table([
        {"clip_id": "d", "bytes": encode(_sine(44_100, 1.0), "f32"),
         "sr_hz": 44_100, "codec": "f32"},
    ])
    out = clip_resample(rd.from_arrow(clips), target_sr=8000,
                        concurrency=2).to_pandas()
    assert out["out_n_samples"].tolist() == [8000]


# -------------------------------------------------------------- silence trim
def test_silence_trim_boundaries(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions.audio import decode, encode
    from marc_record_merge_melindautils_ray.ops.audio_transforms import clip_silence_trim

    sr = 8000
    sig = np.concatenate([np.zeros(sr, np.float32),          # 1 s silence
                          _sine(sr, 1.0, amp=0.5),            # 1 s tone
                          np.zeros(sr // 2, np.float32)])     # 0.5 s silence
    clips = _clips_table([
        {"clip_id": "t", "bytes": encode(sig, "f32"), "sr_hz": sr,
         "dur_ms": 2500, "codec": "f32"},
    ])
    out = clip_silence_trim(rd.from_arrow(clips), thresh=0.01, pad_ms=20,
                            concurrency=2).to_pandas().set_index("clip_id")
    row = out.loc["t"]
    assert row["trimmed"]
    # pad keeps 20 ms each side; sine's first sample ≥0.01 is within ~1 ms
    assert 970 <= row["trimmed_front_ms"] <= 982
    assert 470 <= row["trimmed_back_ms"] <= 482
    got = decode(bytes(row["bytes"]), "f32")
    assert abs(got.size - (sr + 2 * (sr * 20 // 1000))) <= sr // 100
    assert row["out_dur_ms"] == int(round(1000.0 * got.size / sr))


def test_silence_trim_passthrough(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions.audio import encode
    from marc_record_merge_melindautils_ray.ops.audio_transforms import clip_silence_trim

    sr = 8000
    silent = encode(np.zeros(sr, np.float32), "f32")
    loud = encode(_sine(sr, 1.0, amp=0.5), "f32")
    clips = _clips_table([
        {"clip_id": "silent", "bytes": silent, "sr_hz": sr, "dur_ms": 1000,
         "codec": "f32"},
        {"clip_id": "loud", "bytes": loud, "sr_hz": sr, "dur_ms": 1000,
         "codec": "f32"},
        {"clip_id": "stub", "bytes": b"zz", "sr_hz": sr, "dur_ms": 1000,
         "codec": "opus"},
    ])
    out = clip_silence_trim(rd.from_arrow(clips),
                            concurrency=2).to_pandas().set_index("clip_id")
    for cid, src in (("silent", silent), ("loud", loud), ("stub", b"zz")):
        assert not out.loc[cid, "trimmed"], cid
        assert bytes(out.loc[cid, "bytes"]) == src, cid
        assert out.loc[cid, "out_dur_ms"] == 1000, cid


# ------------------------------------------------------------- segmentation
def test_segments_byte_identical_slices(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions.audio import decode, encode
    from marc_record_merge_melindautils_ray.ops.audio_transforms import clip_segments

    sr = 8000
    sig = _sine(sr, 3.25)  # 3.25 s → 3 full 1s windows + 0.25 s tail (dropped)
    payload = encode(sig, "pcm16")
    clips = _clips_table([
        {"clip_id": "p", "bytes": payload, "sr_hz": sr, "dur_ms": 3250,
         "codec": "pcm16"},
    ])
    out = (clip_segments(rd.from_arrow(clips), seg_ms=1000, min_tail_frac=0.5)
           .to_pandas().sort_values("seg_idx").reset_index(drop=True))
    assert out["clip_id"].tolist() == ["p#0", "p#1", "p#2"]
    assert out["parent_id"].tolist() == ["p"] * 3
    assert out["seg_dur_ms"].tolist() == [1000] * 3
    assert out["segmented"].all()
    ref = decode(payload, "pcm16")
    for k in range(3):
        got = decode(bytes(out.loc[k, "bytes"]), "pcm16")
        np.testing.assert_array_equal(got, ref[k * sr:(k + 1) * sr])


def test_segments_tail_rule_and_passthrough(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions.audio import encode
    from marc_record_merge_melindautils_ray.ops.audio_transforms import clip_segments

    sr = 8000
    clips = _clips_table([
        # 1.6 s → one full window + 0.6 s tail (kept: ≥ 0.5 frac)
        {"clip_id": "tail", "bytes": encode(_sine(sr, 1.6), "f32"),
         "sr_hz": sr, "dur_ms": 1600, "codec": "f32"},
        # shorter than one window → single passthrough segment
        {"clip_id": "short", "bytes": encode(_sine(sr, 0.4), "f32"),
         "sr_hz": sr, "dur_ms": 400, "codec": "f32"},
        # non-frame-aligned codec → whole payload as segment 0
        {"clip_id": "stub", "bytes": b"\x01\x02\x03", "sr_hz": sr,
         "dur_ms": 1000, "codec": "mp3"},
    ])
    out = (clip_segments(rd.from_arrow(clips), seg_ms=1000, min_tail_frac=0.5)
           .to_pandas())
    tail = out[out["parent_id"] == "tail"].sort_values("seg_idx")
    assert tail["clip_id"].tolist() == ["tail#0", "tail#1"]
    assert tail["seg_dur_ms"].tolist() == [1000, 600]
    short = out[out["parent_id"] == "short"]
    assert short["clip_id"].tolist() == ["short#0"]
    assert not short["segmented"].iloc[0]
    assert short["seg_dur_ms"].tolist() == [400]
    stub = out[out["parent_id"] == "stub"]
    assert stub["clip_id"].tolist() == ["stub#0"]
    assert bytes(stub["bytes"].iloc[0]) == b"\x01\x02\x03"
    assert not stub["segmented"].iloc[0]


def test_transforms_on_synth_corpus_deterministic(ray_session, corpus):
    """The full synthetic corpus (all codec classes incl. stubs) runs clean
    through resample and trim, and both are deterministic."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.audio_transforms import (
        clip_resample,
        clip_silence_trim,
    )

    clips, _, _ = corpus
    r1 = (clip_resample(rd.from_arrow(clips), target_sr=16_000, concurrency=2)
          .to_pandas().sort_values("clip_id").reset_index(drop=True))
    r2 = (clip_resample(rd.from_arrow(clips), target_sr=16_000, concurrency=2)
          .to_pandas().sort_values("clip_id").reset_index(drop=True))
    assert r1["out_n_samples"].tolist() == r2["out_n_samples"].tolist()
    assert all((a is None and b is None) or bytes(a) == bytes(b)
               for a, b in zip(r1["bytes"], r2["bytes"]))
    assert len(r1) == clips.num_rows

    t1 = (clip_silence_trim(rd.from_arrow(clips), concurrency=2)
          .to_pandas().sort_values("clip_id").reset_index(drop=True))
    assert len(t1) == clips.num_rows
    # trim never lengthens a decodable clip
    trimmed = t1[t1["trimmed"]]
    if len(trimmed):
        assert (trimmed["trimmed_front_ms"] + trimmed["trimmed_back_ms"] > 0).all()


# ---------------------------------------------------------------- transcode
def test_transcode_conforms_and_audits_snr(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions.audio import decode, encode, snr_db
    from marc_record_merge_melindautils_ray.ops.audio_transforms import clip_transcode

    sr = 8000
    sig = _sine(sr, 1.0, amp=0.5)
    clips = _clips_table([
        {"clip_id": "u", "bytes": encode(sig, "ulaw"), "sr_hz": sr, "codec": "ulaw"},
        {"clip_id": "f", "bytes": encode(sig, "f32"), "sr_hz": sr, "codec": "f32"},
        {"clip_id": "same", "bytes": encode(sig, "pcm16"), "sr_hz": sr,
         "codec": "pcm16"},
        {"clip_id": "stub", "bytes": b"\x09", "sr_hz": sr, "codec": "mp3"},
    ])
    out = clip_transcode(rd.from_arrow(clips), target_codec="pcm16",
                         concurrency=2).to_pandas().set_index("clip_id")

    # lossy source: output decodes within the G.711 fidelity of its own
    # decoded PCM, and the audited SNR matches a direct measurement
    row = out.loc["u"]
    assert row["transcoded"] and row["codec"] == "pcm16"
    src = decode(encode(sig, "ulaw"), "ulaw")
    got = decode(bytes(row["bytes"]), "pcm16")
    direct = snr_db(src, got)
    assert direct > 35.0
    assert abs(row["roundtrip_snr_cdb"] - round(min(direct, 120.0) * 100)) <= 1

    # lossless-ish source: pcm16 quantization ≈ 96 dB, capped at 120
    assert out.loc["f", "transcoded"]
    assert out.loc["f", "roundtrip_snr_cdb"] > 80 * 100

    # already at target / undecodable: byte-identical passthrough
    assert not out.loc["same", "transcoded"]
    assert bytes(out.loc["same", "bytes"]) == encode(sig, "pcm16")
    assert out.loc["same", "roundtrip_snr_cdb"] == -1
    assert not out.loc["stub", "transcoded"]
    assert bytes(out.loc["stub", "bytes"]) == b"\x09"
    assert out.loc["stub", "codec"] == "mp3"


def test_transcode_rejects_stub_target(ray_session):
    import pytest as _pytest

    from marc_record_merge_melindautils_ray.ops.audio_transforms import ClipTranscode

    with _pytest.raises(ValueError):
        ClipTranscode("mp3")


# ------------------------------------------------------------ composed prep
def test_prep_chain_matches_eager_composition(ray_session, corpus):
    """The lazy trim→transcode→features chain equals running each stage
    eagerly on the full corpus (all codec classes incl. stubs), row for row."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.audio_features import clip_audio_features
    from marc_record_merge_melindautils_ray.ops.audio_transforms import (
        clip_prep_features,
        clip_silence_trim,
        clip_transcode,
    )

    clips, _, _ = corpus
    lazy = (clip_prep_features(rd.from_arrow(clips), concurrency=2)
            .to_pandas().sort_values("clip_id").reset_index(drop=True))

    trimmed = clip_silence_trim(rd.from_arrow(clips), concurrency=2)
    conformed = clip_transcode(
        trimmed.select_columns(["clip_id", "bytes", "sr_hz", "codec"]),
        concurrency=2)
    eager = (clip_audio_features(conformed, concurrency=2)
             .to_pandas().sort_values("clip_id").reset_index(drop=True))

    assert len(lazy) == clips.num_rows
    for col in ("clip_id", "decode_ok", "n_samples", "rms_cdb",
                "silence_permille", "zcr_per_min", "centroid_hz"):
        assert lazy[col].tolist() == eager[col].tolist(), col
    # decodable rows survive the chain decodable
    assert lazy["decode_ok"].sum() > 0


# ------------------------------------------------------------------ stitch
def test_stitch_is_segment_inverse(ray_session):
    """stitch(segment(x)) reproduces x byte-for-byte for every frame-aligned
    clip whose tail window survived (min_tail_frac=0.01 keeps any tail)."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.audio_transforms import (
        clip_segments,
        clip_stitch,
    )
    from marc_record_merge_melindautils_ray.sources.synth import make_corpus

    clips, _, _ = make_corpus(4, 8, 42)
    orig = {r["clip_id"]: (r["bytes"], r["codec"])
            for r in clips.select(["clip_id", "bytes", "codec"]).to_pylist()}
    segs = clip_segments(rd.from_arrow(clips), seg_ms=1000, min_tail_frac=0.01)
    out = clip_stitch(segs).to_pandas()
    assert set(out["clip_id"]) == set(orig)
    for _, row in out.iterrows():
        b0, _codec = orig[row["clip_id"]]
        assert row["bytes"] == b0, row["clip_id"]


def test_stitch_orders_by_seg_idx(ray_session):
    import pandas as pd

    from marc_record_merge_melindautils_ray.ops.audio_transforms import _stitch_group

    g = pd.DataFrame({
        "parent_id": ["p", "p", "p"],
        "seg_idx": [2, 0, 1],
        "bytes": [b"CC", b"AA", b"BB"],
        "sr_hz": [8000] * 3,
        "codec": ["pcm16"] * 3,
        "seg_dur_ms": [1, 1, 1],
    })
    out = _stitch_group(g)
    assert out["bytes"].iloc[0] == b"AABBCC"
    assert out["n_segments"].iloc[0] == 3
