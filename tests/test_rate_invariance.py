"""Cross-sample-rate duplicate handling: the SAME signal distributed at
8 kHz and 16 kHz must cluster (verify conforms rates before the samplewise
SNR invariant), while IDENTICAL BYTES labeled with different rates — a
different signal at playback — must NOT."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions import audio as au
from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup
from marc_record_merge_melindautils_ray.sources.synth import CorpusBuilder


def test_resample_linear_integer_ratio_exact():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(4001).astype(np.float32)
    up = au.resample_linear(x, 8000, 16000)
    # the 2x output grid contains every input instant → downsample recovers
    # the original exactly
    back = au.resample_linear(up, 16000, 8000)
    assert len(back) == len(x)
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_resample_identity_noop():
    x = np.ones(100, np.float32)
    assert au.resample_linear(x, 8000, 8000) is x


def test_cross_rate_duplicate_clusters(ray_session):
    b = CorpusBuilder(42)
    b.family("resample", 0)
    b.singletons(4)
    clips, truth, _ = b.tables()
    res = run_dedup(
        rd.from_arrow(clips),
        DedupConfig(verify_concurrency=2, fingerprint_concurrency=2),
    )
    a = res["assignments"].to_pandas()
    tr = truth.to_pandas()
    fam = tr[tr["truth_cluster"].notna()]["clip_id"].tolist()
    cl = dict(zip(a["clip_id"], a["cluster_id"]))
    assert len(fam) == 2
    assert cl.get(fam[0]) is not None and cl.get(fam[0]) == cl.get(fam[1])
    # verified as a NEAR pair (rates differ ⇒ bytes differ ⇒ no exact path)
    assert res["metrics"]["near_pairs"] >= 1


def test_identical_bytes_different_rate_not_duplicate(ray_session):
    """Same byte payload at 8 kHz vs 16 kHz is the same data played at two
    speeds — different audio.  The content hash folds the rate in and the
    duration gate fires, so no cluster forms."""
    b = CorpusBuilder(7)
    rng = np.random.default_rng(11)
    pcm = rng.uniform(-0.5, 0.5, 8000).astype(np.float32)
    text = "sama teksti molemmilla riveillä tässä parissa"
    b.add_row(pcm, 8000, "pcm16", text, None, sources=["SRC-A"])
    b.add_row(pcm, 16000, "pcm16", text, None, sources=["SRC-B"])
    b.singletons(3)
    clips, _, _ = b.tables()
    res = run_dedup(
        rd.from_arrow(clips),
        DedupConfig(verify_concurrency=2, fingerprint_concurrency=2),
    )
    a = res["assignments"].to_pandas()
    ids = set(a["clip_id"]) if "clip_id" in a.columns else set()
    # neither of the two same-bytes rows may appear in any cluster
    assert "c0000000" not in ids and "c0000001" not in ids


def test_oriented_verify_conforms_rates(ray_session):
    from marc_record_merge_melindautils_ray.stages.verify import (
        verify_oriented_pairs,
    )

    b = CorpusBuilder(42)
    b.family("resample", 3)
    clips, _, golden = b.tables()
    out = verify_oriented_pairs(clips, golden, DedupConfig())
    row = out[out["case"] == "resample:3"].iloc[0]
    assert bool(row["ok"]), row["reasons"]
