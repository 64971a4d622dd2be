"""Payload→payload gain normalization: peak lands on target, codecs round-
trip, undecodable/silent rows pass through untouched, run is deterministic."""

import numpy as np
import pytest


def _run(clips, **kw):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.audio_features import clip_gain_normalize

    return clip_gain_normalize(rd.from_arrow(clips), concurrency=2, **kw).to_pandas()


def test_normalized_peak_hits_target(ray_session, corpus):
    from marc_record_merge_melindautils_ray.functions.audio import decode
    from marc_record_merge_melindautils_ray.ops.audio_features import TARGET_PEAK

    clips, _, _ = corpus
    out = _run(clips).set_index("clip_id")
    codec_of = dict(zip(clips["clip_id"].to_pylist(), clips["codec"].to_pylist()))
    checked = 0
    for cid, row in out[out["normalized"]].iterrows():
        pcm = decode(row["bytes"], codec_of[cid])
        peak = float(np.max(np.abs(pcm)))
        # 8-bit G.711 quantizes coarsely; f32/pcm16 land within a hair
        tol = 0.08 if codec_of[cid] in ("ulaw", "alaw") else 0.002
        assert abs(peak - TARGET_PEAK) < tol, (cid, codec_of[cid], peak)
        checked += 1
    assert checked > 20


def test_untouched_rows_pass_through(ray_session, corpus):
    clips, _, _ = corpus
    out = _run(clips).set_index("clip_id")
    payload_of = dict(zip(clips["clip_id"].to_pylist(), clips["bytes"].to_pylist()))
    codec_of = dict(zip(clips["clip_id"].to_pylist(), clips["codec"].to_pylist()))
    untouched = out[~out["normalized"]]
    assert len(untouched) > 0  # fm-synth rows exist
    for cid, row in untouched.iterrows():
        assert row["gain_e6"] == 0
        src = payload_of[cid]
        got = row["bytes"]
        assert (got is None and src is None) or bytes(got) == bytes(src), cid
        assert codec_of[cid] is not None


def test_deterministic(ray_session, corpus):
    clips, _, _ = corpus
    a = _run(clips).sort_values("clip_id").reset_index(drop=True)
    b = _run(clips).sort_values("clip_id").reset_index(drop=True)
    assert a["gain_e6"].tolist() == b["gain_e6"].tolist()
    assert all(
        (x is None and y is None) or bytes(x) == bytes(y)
        for x, y in zip(a["bytes"], b["bytes"])
    )
