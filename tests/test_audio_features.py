"""Clip audio-feature extraction: the distributed actor-pool stage must
equal a direct per-clip numpy computation exactly (integer features), and
undecodable codecs must degrade to decode_ok=False, never poison a batch."""

import numpy as np
import pytest


def test_features_match_direct_computation(ray_session, corpus):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions.audio import decode, is_decodable
    from marc_record_merge_melindautils_ray.ops.audio_features import (
        clip_audio_features,
        clip_features_row,
    )

    clips, _, _ = corpus
    got = clip_audio_features(rd.from_arrow(clips), concurrency=2).to_pandas()
    got = got.set_index("clip_id")
    assert len(got) == clips.num_rows

    n_checked = n_stub = 0
    for i in range(clips.num_rows):
        cid = clips["clip_id"][i].as_py()
        codec = clips["codec"][i].as_py()
        payload = clips["bytes"][i].as_py()
        row = got.loc[cid]
        if payload is None or not is_decodable(codec):
            assert not row["decode_ok"]
            n_stub += 1
            continue
        assert row["decode_ok"]
        want = clip_features_row(decode(payload, codec),
                                 int(clips["sr_hz"][i].as_py()))
        for k, v in want.items():
            assert int(row[k]) == v, (cid, k)
        n_checked += 1
    assert n_checked > 20
    assert n_stub > 0  # the corpus plants fm-synth (undecodable) rows


def test_feature_values_sane(ray_session, corpus):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.audio_features import clip_audio_features

    clips, _, _ = corpus
    got = clip_audio_features(rd.from_arrow(clips), concurrency=2).to_pandas()
    ok = got[got["decode_ok"]]
    # synthetic clips are audible tones: loud-ish, mostly non-silent, with a
    # spectral centroid inside the Nyquist band
    assert (ok["rms_cdb"] > -6000).all()
    assert (ok["silence_permille"] <= 1000).all()
    assert (ok["centroid_hz"] > 0).all()
    assert (ok["centroid_hz"] < 24_000).all()
    assert (ok["n_samples"] > 0).all()


def test_known_signal_features(ray_session):
    """A pure 1 kHz sine at 16 kHz: centroid ≈ 1000 Hz, RMS ≈ −3.01 dB,
    zero silence — pinned against closed-form values."""
    import pyarrow as pa
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions.audio import encode
    from marc_record_merge_melindautils_ray.ops.audio_features import clip_audio_features

    sr = 16_000
    t = np.arange(sr, dtype=np.float64) / sr  # 1 s
    # 997 Hz, not 1000: an integer samples-per-cycle ratio phase-locks the
    # sampling grid onto the zero crossings (125/1000 samples exactly zero)
    pcm = (0.999 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)
    clips = pa.table({
        "clip_id": pa.array(["sine"], pa.string()),
        "bytes": pa.array([encode(pcm, "f32")], pa.binary()),
        "sr_hz": pa.array([sr], pa.int32()),
        "codec": pa.array(["f32"], pa.string()),
    })
    row = clip_audio_features(rd.from_arrow(clips), concurrency=1).to_pandas().iloc[0]
    assert row["decode_ok"]
    assert abs(row["centroid_hz"] - 997) <= 3
    assert abs(row["rms_cdb"] - (-302)) <= 3  # sine RMS = A/√2 → −3.02 dB
    assert row["silence_permille"] < 10
    assert abs(row["zcr_per_min"] - 2 * 997 * 60) <= 200  # 2 crossings/cycle


def test_clip_speaking_rate_flags(ray_session):
    """Integer rate exactness + all four flags pinned; constructed clips
    carry no payload (the stage must not need bytes)."""
    import pyarrow as pa
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.audio_features import (
        clip_speaking_rate,
    )

    t = pa.table({
        "clip_id": pa.array(["ok", "fast", "slow", "baddur"], pa.string()),
        "dur_ms": pa.array([2000, 500, 10_000, 0], pa.int64()),
        "transcript": pa.array([
            "four words spoken here",       # 4 tok / 2 s  = 2000 milli
            "way too many words crammed in tiny clip here now",  # 10/0.5s
            "hi", None,
        ], pa.string()),
        "bytes": pa.array([None] * 4, pa.binary()),
    })
    out = (clip_speaking_rate(rd.from_arrow(t))
           .to_pandas().set_index("clip_id"))
    assert out.loc["ok", "rate_milli_tok_s"] == 2000
    assert out.loc["ok", "rate_flag"] == "ok"
    assert out.loc["fast", "rate_milli_tok_s"] == 20_000 * 10 // 10  # 20000
    assert out.loc["fast", "rate_flag"] == "ok"  # exactly at threshold
    assert out.loc["slow", "rate_flag"] == "too_slow"
    assert out.loc["baddur", "rate_flag"] == "bad_duration"
    assert out.loc["baddur", "n_tokens"] == 0
    # strict > threshold: nudge duration down → too_fast
    t2 = t.set_column(1, "dur_ms", pa.array([2000, 499, 10_000, 0], pa.int64()))
    out2 = (clip_speaking_rate(rd.from_arrow(t2))
            .to_pandas().set_index("clip_id"))
    assert out2.loc["fast", "rate_flag"] == "too_fast"


# ------------------------------------------------------------------- VAD
def test_vad_closed_form_boundaries():
    """silence|tone|silence|tone layout → exact frame-multiple boundaries;
    the inner short gap bridges, the isolated click drops."""
    import numpy as np

    from marc_record_merge_melindautils_ray.ops.audio_features import vad_segments_row

    sr, f = 8000, 20          # 160 samples per frame
    spf = sr * f // 1000
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(spf * 10) / sr).astype(np.float32)
    z = np.zeros(spf * 5, np.float32)
    # [5 silent][10 tone][2 silent (bridged)][10 tone][5 silent][1 tone (click)]
    pcm = np.concatenate([z, tone, np.zeros(spf * 2, np.float32), tone, z,
                          tone[:spf]])
    segs = vad_segments_row(pcm, sr, frame_ms=f)
    # one merged segment: frames 5..27 → 100 ms .. 540 ms
    assert segs == [(100, 540, segs[0][2])]
    assert segs[0][2] > 0
    # without bridging: two segments, click still dropped
    segs2 = vad_segments_row(pcm, sr, frame_ms=f, bridge_frames=0)
    assert [(s, e) for s, e, _ in segs2] == [(100, 300), (340, 540)]
    # all-silence clip: no segments
    assert vad_segments_row(np.zeros(spf * 8, np.float32), sr) == []


def test_vad_dataset_stage(ray_session):
    """Corpus run: every decodable clip yields ≥1 segment row or a seg_idx=-1
    audit row; undecodable codecs flag decode_ok=False; start<end on real
    segments."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.audio_features import clip_vad_segments
    from marc_record_merge_melindautils_ray.sources.synth import make_corpus

    clips, _, _ = make_corpus(5, 10, 42)
    out = clip_vad_segments(rd.from_arrow(clips)).to_pandas()
    assert set(out["clip_id"]) == set(clips["clip_id"].to_pylist())
    real = out[out["seg_idx"] >= 0]
    assert len(real) > 0
    assert (real["start_ms"] < real["end_ms"]).all()
    assert real["decode_ok"].all()
    bad = out[~out["decode_ok"]]
    assert (bad["seg_idx"] == -1).all()


# ----------------------------------------------------------------- pitch
def test_pitch_closed_form_sine():
    """Pure 440 Hz sine at 8 kHz: autocorrelation peak at lag
    round(8000/440)=18 → f0 = 8000/18 = 444.444 Hz (the lag-quantized
    value), strength ≈ 1; white noise scores far lower strength."""
    import numpy as np

    from marc_record_merge_melindautils_ray.ops.audio_features import pitch_f0_row

    sr = 8000
    t = np.arange(8000) / sr
    f0, st = pitch_f0_row(np.sin(2 * np.pi * 440 * t).astype(np.float32), sr)
    assert f0 == round(1000 * sr / round(sr / 440))   # 444444 mHz
    assert st > 950
    rng = np.random.default_rng(0)
    _, st_noise = pitch_f0_row(rng.standard_normal(8000).astype(np.float32), sr)
    assert st_noise < st - 300
    # silence/empty edge
    assert pitch_f0_row(np.zeros(4000, np.float32), sr) == (0, 0)
    assert pitch_f0_row(np.zeros(0, np.float32), sr) == (0, 0)


def test_pitch_dataset_stage(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.audio_features import clip_pitch
    from marc_record_merge_melindautils_ray.sources.synth import make_corpus

    clips, _, _ = make_corpus(5, 10, 42)
    out = clip_pitch(rd.from_arrow(clips)).to_pandas()
    assert len(out) == len(clips)
    ok = out[out["decode_ok"]]
    # synthetic clips are sine mixes: every decodable clip has a real f0
    assert (ok["f0_mhz"] > 0).all()
    assert (~out["decode_ok"] == (out["f0_mhz"] == 0)).all()


def test_clip_expectations_planted_poison(ray_session, tmp_path):
    """The conformance corpus plants exactly one codec-domain violator (the
    codec-class poison pair's 'weird' codec) and one Aleph-multifield
    transcript; a constructed batch exercises every remaining rule."""
    import pandas as pd
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.audio_features import (
        clip_expectations,
    )
    from marc_record_merge_melindautils_ray.sources.synth import make_corpus

    clips, _, _ = make_corpus(5, 10, 42)
    got = clip_expectations(rd.from_arrow(clips)).set_index("rule")["violations"]
    assert got["codec_in_domain"] == 1
    assert got["transcript_no_aleph_multifield"] == 1
    assert got[["clip_id_not_null", "dur_positive", "payload_not_empty",
                "sr_in_domain", "status_in_domain"]].sum() == 0

    bad = pd.DataFrame({
        "clip_id": ["", "x1", "x2", "x3"],
        "bytes": [b"aa", b"", b"aa", b"aa"],
        "sr_hz": [8000, 8000, 11025, 8000],
        "dur_ms": [100, 100, 100, 0],
        "codec": ["pcm16"] * 4,
        "transcript": ["t"] * 4,
        "status": ["active", "active", "active", "zombie"],
    })
    got2 = clip_expectations(rd.from_pandas(bad)).set_index("rule")["violations"]
    assert got2["clip_id_not_null"] == 1
    assert got2["payload_not_empty"] == 1
    assert got2["sr_in_domain"] == 1
    assert got2["dur_positive"] == 1
    assert got2["status_in_domain"] == 1
