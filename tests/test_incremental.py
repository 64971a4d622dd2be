"""Incremental ingest: full-run label equivalence, base-update and
cluster-merge events, no-op ingest."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup
from marc_record_merge_melindautils_ray.pipelines.incremental import (
    run_dedup_incremental,
)
from marc_record_merge_melindautils_ray.sources.synth import CorpusBuilder, make_corpus

CFG = DedupConfig(verify_concurrency=2, fingerprint_concurrency=2)


def _split(clips: pa.Table, mask) -> tuple[rd.Dataset, rd.Dataset]:
    df = clips.to_pandas()
    base = pa.Table.from_pandas(df[~mask], preserve_index=False)
    new = pa.Table.from_pandas(df[mask], preserve_index=False)
    return rd.from_arrow(base), rd.from_arrow(new)


def test_interleaved_split_matches_full_run(ray_session):
    """Odd rows ingest against even rows: families split across the
    boundary, so real new-base pairs form — combined assignments must equal
    a from-scratch run label-for-label."""
    clips, _, _ = make_corpus(10, 16, 42)
    df = clips.to_pandas()
    mask = (np.arange(len(df)) % 2) == 1
    base, new = _split(clips, mask)

    full = run_dedup(rd.from_arrow(clips), CFG)
    fa = full["assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True)
    b = run_dedup(base, CFG)
    inc = run_dedup_incremental(new, base, b["assignments"], CFG)
    assert inc["metrics"]["survivor_pairs"] > 0  # the split is non-vacuous
    ca = (
        inc["combined_assignments"].to_pandas()
        .sort_values("clip_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fa, ca)
    # affected clusters got canonical rows (one per affected cluster)
    canon = inc["canonical"].to_pandas()
    affected = set(inc["new_assignments"].to_pandas().get("cluster_id", []))
    if affected:
        assert set(canon["cluster_id"]) >= affected


def test_cluster_merge_via_containing_new_clip(ray_session):
    """Two existing clusters whose transcripts are unrelated merge when a
    NEW clip contains both (containment edges bridge them transitively)."""
    b = CorpusBuilder(9)
    rng = np.random.default_rng(5)
    pcm_a = rng.uniform(-0.6, 0.6, 9000).astype(np.float32)
    pcm_b = rng.uniform(-0.6, 0.6, 9000).astype(np.float32)
    text_a = "ensimmäinen erillinen teksti joka kertoo omasta aiheestaan pitkästi"
    text_b = "toinen täysin eri aihepiirin teksti jolla ei ole yhteyttä edelliseen"
    a1 = b.add_row(pcm_a, 8000, "pcm16", text_a, None, sources=["S1"])
    a2 = b.add_row(pcm_a, 8000, "pcm16", text_a, None, sources=["S2"])
    b1 = b.add_row(pcm_b, 8000, "pcm16", text_b, None, sources=["S3"])
    b2 = b.add_row(pcm_b, 8000, "pcm16", text_b, None, sources=["S4"])
    b.singletons(3)
    base_clips, _, _ = b.tables()
    base_ds = rd.from_arrow(base_clips)
    base_run = run_dedup(base_ds, CFG)
    ba = base_run["assignments"].to_pandas()
    cl = dict(zip(ba["clip_id"], ba["cluster_id"]))
    assert cl[a1] == cl[a2] and cl[b1] == cl[b2] and cl[a1] != cl[b1]

    # the new clip CONTAINS both: concatenated audio + concatenated text
    nb = CorpusBuilder(11)
    import itertools
    nb._n = itertools.count(100)  # distinct id space
    big = np.concatenate([pcm_a, pcm_b])
    cid = nb.add_row(big, 8000, "pcm16", text_a + " " + text_b, None,
                     sources=["S5"])
    new_clips, _, _ = nb.tables()
    inc = run_dedup_incremental(
        rd.from_arrow(new_clips), base_ds, base_run["assignments"], CFG
    )
    merges = inc["cluster_merges"]
    assert len(merges) == 1, merges
    survivor = min(cl[a1], cl[b1])
    absorbed = max(cl[a1], cl[b1])
    assert merges["old_cluster_id"].iloc[0] == absorbed
    assert merges["into_cluster_id"].iloc[0] == survivor
    ca = inc["combined_assignments"].to_pandas()
    cl2 = dict(zip(ca["clip_id"], ca["cluster_id"]))
    assert cl2[a1] == cl2[a2] == cl2[b1] == cl2[b2] == survivor
    assert cl2[cid] == survivor  # the bridge joins the merged cluster


def test_noop_ingest(ray_session):
    """A new batch with no duplicates leaves the base state untouched."""
    clips, _, _ = make_corpus(3, 4, 42)
    base_run = run_dedup(rd.from_arrow(clips), CFG)
    nb = CorpusBuilder(77)
    import itertools
    nb._n = itertools.count(500)
    nb.singletons(4)
    new_clips, _, _ = nb.tables()
    inc = run_dedup_incremental(
        rd.from_arrow(new_clips), rd.from_arrow(clips),
        base_run["assignments"], CFG,
    )
    assert inc["metrics"]["edges"] == 0
    assert inc["new_assignments"].count() == 0
    assert len(inc["cluster_merges"]) == 0
    ca = inc["combined_assignments"].to_pandas().sort_values("clip_id")
    ba = base_run["assignments"].to_pandas().sort_values("clip_id")
    pd.testing.assert_frame_equal(
        ca.reset_index(drop=True), ba.reset_index(drop=True)
    )


def test_incremental_exact_keysets_equivalent(ray_session):
    """keyset_mode='exact' reproduces the sampled-mode incremental output
    (same equivalence contract as run_dedup's keyset test)."""
    clips, _, _ = make_corpus(6, 8, 42)
    df = clips.to_pandas()
    mask = (np.arange(len(df)) % 2) == 1
    base, new = _split(clips, mask)
    b = run_dedup(base, CFG)
    inc_s = run_dedup_incremental(new, base, b["assignments"], CFG)
    import dataclasses

    cfg_e = dataclasses.replace(CFG, keyset_mode="exact")
    inc_e = run_dedup_incremental(new, base, b["assignments"], cfg_e)
    a = inc_s["combined_assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True)
    c = inc_e["combined_assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, c)
    assert inc_e["metrics"]["keyset_mode"] == "exact"


def test_incremental_host_gate(ray_session):
    """host_ids blocks pairs involving a host record, same as run_dedup."""
    clips, _, _ = make_corpus(2, 2, 42)
    df = clips.to_pandas()
    mask = (np.arange(len(df)) % 2) == 1
    base, new = _split(clips, mask)
    b = run_dedup(base, CFG)
    inc = run_dedup_incremental(new, base, b["assignments"], CFG)
    if inc["new_assignments"].count() == 0:
        return  # nothing paired in this tiny split; gate untestable here
    some_new = inc["new_assignments"].take(1)[0]["clip_id"]
    inc2 = run_dedup_incremental(
        new, base, b["assignments"], CFG, host_ids=frozenset({some_new})
    )
    ids2 = set(
        r["clip_id"] for r in inc2["new_assignments"].take_all()
    ) if inc2["new_assignments"].count() else set()
    assert some_new not in ids2


def test_two_sequential_ingests_same_session(ray_session):
    """Regression for the warm-worker cache-poisoning bug: two incremental
    runs in ONE Ray session with the SAME base refs but DIFFERENT new
    batches must each classify their own clips as new (the SplitRows cache
    key covers the new-id set)."""
    clips, _, _ = make_corpus(8, 8, 42)
    df = clips.to_pandas()
    mask = (np.arange(len(df)) % 2) == 1
    base, new_all = _split(clips, mask)
    b = run_dedup(base, CFG)
    new_df = df[mask]
    half = len(new_df) // 2
    batch1 = rd.from_arrow(pa.Table.from_pandas(new_df.iloc[:half], preserve_index=False))
    batch2 = rd.from_arrow(pa.Table.from_pandas(new_df.iloc[half:], preserve_index=False))
    inc1 = run_dedup_incremental(batch1, base, b["assignments"], CFG)
    inc2 = run_dedup_incremental(batch2, base, b["assignments"], CFG)
    ids1 = set(new_df.iloc[:half]["clip_id"])
    ids2 = set(new_df.iloc[half:]["clip_id"])
    got1 = set(r["clip_id"] for r in inc1["new_assignments"].take_all())
    got2 = set(r["clip_id"] for r in inc2["new_assignments"].take_all())
    assert got1 <= ids1 and got2 <= ids2
    # batch-2 clips that pair with base MUST classify as new, not base_update
    bu2 = set(r["clip_id"] for r in inc2["base_updates"].take_all())
    assert not (bu2 & ids2), bu2 & ids2
    assert got2, "second ingest found no new assignments - cache poisoning?"
