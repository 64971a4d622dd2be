"""Shift-invariant alignment: xcorr kernel exactness, end-to-end planted-lag
recovery, distractor rejection, cross-rate conformance, hub guard."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def test_xcorr_lag_exact_both_directions():
    from marc_record_merge_melindautils_ray.ops.audio_align import (
        aligned_overlap,
        xcorr_lag,
    )

    rng = np.random.default_rng(0)
    a = rng.standard_normal(8000).astype(np.float32)
    for k in (0, 1, 173, 2400):
        b = np.r_[np.zeros(k, np.float32), a]
        lag, corr = xcorr_lag(a, b)
        assert lag == k and corr > 0.99
        sa, sb = aligned_overlap(a, b, lag)
        assert len(sa) == len(sb) > 0 and np.allclose(sa, sb)
        lag2, corr2 = xcorr_lag(b, a)          # reversed roles → negative lag
        assert lag2 == -k and corr2 > 0.99
        sa, sb = aligned_overlap(b, a, lag2)
        assert np.allclose(sa, sb)
    # independent signals: no credible peak
    c = rng.standard_normal(8000).astype(np.float32)
    assert xcorr_lag(a, c)[1] < 0.2


def test_align_end_to_end_planted_lags(ray_session):
    from marc_record_merge_melindautils_ray.ops.audio_align import (
        align_candidate_pairs,
    )
    from marc_record_merge_melindautils_ray.sources.synth import make_shifted_corpus

    clips, truth = make_shifted_corpus(12, 7)
    out = align_candidate_pairs(rd.from_arrow(clips)).to_pandas()
    m = out.merge(truth.to_pandas(), on=["id_a", "id_b"])
    assert len(m) == len(truth)                # blocking proposed every pair
    pos = m[m["true_lag_ms"] >= 0]
    neg = m[m["true_lag_ms"] < 0]
    assert len(pos) == 12 and len(neg) >= 1
    # the samplewise gate would reject ALL of these; alignment recovers the
    # exact planted lag and the aligned overlap passes SNR
    assert (pos["lag_ms"] == pos["true_lag_ms"]).all()
    assert pos["align_ok"].all()
    assert pos["decodable"].all()
    # ulaw pairs (every third) went through the lossy decode path
    assert (np.arange(12) % 3 == 2).sum() > 0
    # same-transcript independent-signal distractors are rejected
    assert (~neg["align_ok"]).all()
    assert (neg["peak_corr_permille"] < 200).all()


def test_align_cross_rate_pair(ray_session):
    """A 16 kHz copy delayed by 100 ms vs its 8 kHz original: the aligner
    conforms rates before correlating, so the lag comes out in true ms."""
    from marc_record_merge_melindautils_ray.ops.audio_align import (
        align_candidate_pairs,
    )
    from marc_record_merge_melindautils_ray.sources.synth import (
        CorpusBuilder,
        _pcm,
    )
    from marc_record_merge_melindautils_ray.functions import audio as au

    b = CorpusBuilder(11)
    pcm8 = _pcm("xr", 11, 8000, 8000)
    pcm16 = au.resample_linear(pcm8, 8000, 16000)
    delayed16 = np.r_[np.zeros(1600, np.float32), pcm16]   # 100 ms @ 16 kHz
    ida = b.add_row(pcm8, 8000, "pcm16", "sama teksti", None)
    idb = b.add_row(delayed16, 16000, "pcm16", "sama teksti", None)
    clips, _, _ = b.tables()
    out = align_candidate_pairs(rd.from_arrow(clips)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert {row["id_a"], row["id_b"]} == {ida, idb}
    # sign: the delayed clip is id_b (ids sort in insertion order)
    assert row["lag_ms"] == 100
    assert row["align_ok"]


def test_align_hub_guard_raises(ray_session):
    from marc_record_merge_melindautils_ray.ops.audio_align import (
        align_candidate_pairs,
    )
    from marc_record_merge_melindautils_ray.sources.synth import CorpusBuilder, _pcm

    b = CorpusBuilder(5)
    pcm = _pcm("hub", 5, 4000, 8000)
    for _ in range(10):
        b.add_row(pcm, 8000, "pcm16", "boilerplate text", None)
    clips, _, _ = b.tables()
    with pytest.raises(Exception, match="hub_guard"):
        align_candidate_pairs(rd.from_arrow(clips), hub_guard=5).to_pandas()


def test_shift_clusters_end_to_end(ray_session):
    """Each planted shifted pair lands in exactly one 2-member cluster;
    distractor rows cluster with nobody."""
    from marc_record_merge_melindautils_ray.ops.audio_align import shift_clusters
    from marc_record_merge_melindautils_ray.sources.synth import make_shifted_corpus

    clips, truth = make_shifted_corpus(10, 7)
    asg = shift_clusters(rd.from_arrow(clips)).to_pandas()
    t = truth.to_pandas()
    pos = t[t["true_lag_ms"] >= 0]
    lbl = asg.set_index("clip_id")["cluster_id"]
    assert set(asg["clip_id"]) == set(pos["id_a"]) | set(pos["id_b"])
    for _, r in pos.iterrows():
        assert lbl[r["id_a"]] == lbl[r["id_b"]]
    assert asg["cluster_id"].nunique() == len(pos)
