"""End-to-end pipeline: recall ≥ 0.99, clean precision, skew, resume."""

import itertools
import shutil

import pytest


def _run(corpus, cfg, **kw):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup

    clips, truth, golden = corpus
    res = run_dedup(rd.from_arrow(clips), cfg, **kw)
    return res


def _recall(res, truth):
    tdf = truth.to_pandas()
    fam = tdf.dropna(subset=["truth_cluster"]).groupby("truth_cluster")["clip_id"].apply(list)
    true_pairs = [
        p for ids in fam for p in itertools.combinations(sorted(ids), 2)
    ]
    assign = res["assignments"].to_pandas()
    amap = dict(zip(assign["clip_id"], assign["cluster_id"]))
    hits = sum(
        1 for a, b in true_pairs if amap.get(a) is not None and amap.get(a) == amap.get(b)
    )
    return hits, len(true_pairs), amap, tdf


def test_end_to_end_recall_and_precision(ray_session, corpus, small_cfg):
    res = _run(corpus, small_cfg)
    hits, total, amap, tdf = _recall(res, corpus[1])
    assert hits / total >= 0.99, f"recall {hits}/{total}"

    # precision: no cluster mixes truth families or absorbs negatives
    tmap = dict(zip(tdf["clip_id"], tdf["truth_cluster"]))
    clusters: dict[str, list] = {}
    for cid, cl in amap.items():
        clusters.setdefault(cl, []).append(cid)
    for cl, ids in clusters.items():
        fams = {tmap.get(i) for i in ids}
        assert len(fams) == 1 and None not in fams, (cl, ids, fams)

    canon = res["canonical"].to_pandas()
    assert len(canon) == len(clusters)
    assert (canon["canonical_id"].str.startswith("canon-")).all()


def test_resume_identical(ray_session, corpus, small_cfg, tmp_path):
    ck = str(tmp_path / "ck")
    r1 = _run(corpus, small_cfg, checkpoint_dir=ck)
    a1 = r1["assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True)
    r2 = _run(corpus, small_cfg, checkpoint_dir=ck)
    a2 = r2["assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert a1.equals(a2)
    cached = [v.get("cached") for v in r2["metrics"].values() if isinstance(v, dict)]
    assert all(cached), r2["metrics"]
    shutil.rmtree(ck, ignore_errors=True)


def test_hot_transcript_skew(ray_session, small_cfg):
    """One boilerplate transcript across many rows: only audio-identical
    sub-pairs may cluster (skew handling per BASELINE.json north_rule)."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup
    from marc_record_merge_melindautils_ray.sources.synth import make_corpus

    clips, truth, _ = make_corpus(0, 10, 11, with_poison=False)  # hotkey family only
    res = run_dedup(rd.from_arrow(clips), small_cfg)
    assign = res["assignments"].to_pandas()
    tdf = truth.to_pandas()
    tmap = dict(zip(tdf["clip_id"], tdf["truth_cluster"]))
    for _, grp in assign.groupby("cluster_id"):
        fams = {tmap.get(i) for i in grp["clip_id"]}
        assert len(fams) == 1 and None not in fams


def test_p0_reject_channel_end_to_end(ray_session, small_cfg):
    """P0 output invariant through the FULL pipeline: a merged cluster whose
    synthesized source link gets a <3-char system code must land in the
    canonical_rejected channel, not the canonical output."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions import audio as au
    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup
    from marc_record_merge_melindautils_ray.schema import CLIPS_SCHEMA

    sr = 8000
    pcm = np.sin(np.linspace(0, 440 * 2 * np.pi, sr)).astype(np.float32) * 0.4
    text = "tama on lyhyt testilause jolla on riittavasti sanoja pariutumiseen"

    def row(cid, src):
        return {
            "clip_id": cid, "bytes": au.encode(pcm, "pcm16"), "sr_hz": sr,
            "dur_ms": 1000, "codec": "pcm16", "transcript": text,
            "status": "active", "sources": [src], "source_links": [],
            "is_segment_of": None, "author_label": None, "author_type": None,
            "edition_note": None,
        }

    clips = pa.Table.from_pylist(
        [row("r1", "AB"), row("r2", "HELKA")], schema=CLIPS_SCHEMA
    )  # 'AB' lowercases to a 2-char link system code -> P0 violation
    res = run_dedup(rd.from_arrow(clips), small_cfg)
    assert res["metrics"]["canonical_rejected"] == 1
    rej = res["canonical_rejected"].to_pandas()
    assert list(rej["invariant_error"]) == ["short-source-code"]
    assert res["canonical"].count() == 0  # violating row never emitted


def test_filtered_payload_store_matches_direct(ray_session, corpus, small_cfg):
    """Both payload-store modes (survivor-filtered block store vs direct
    indexing of resident blocks) must produce identical assignments."""
    import dataclasses

    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup

    clips, _, _ = corpus
    res_d = run_dedup(rd.from_arrow(clips), small_cfg)
    a_direct = res_d["assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert res_d["metrics"]["payload_store_mode"] == "direct"

    cfg_f = dataclasses.replace(small_cfg, payload_store="filtered")
    res_f = run_dedup(rd.from_arrow(clips), cfg_f)
    a_filtered = res_f["assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert res_f["metrics"]["payload_store_mode"] == "filtered"
    assert a_direct.equals(a_filtered)


def test_empty_and_no_survivor_corpora(ray_session, small_cfg):
    """Degenerate inputs: an empty clip table and an all-singleton table must
    flow through every stage and produce empty outputs, not crash."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from marc_record_merge_melindautils_ray.functions import audio as au
    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup
    from marc_record_merge_melindautils_ray.schema import CLIPS_SCHEMA

    empty = pa.Table.from_pylist([], schema=CLIPS_SCHEMA)
    res = run_dedup(rd.from_arrow(empty), small_cfg)
    assert res["assignments"].count() == 0
    assert res["canonical"].count() == 0

    sr = 8000
    rows = []
    for i in range(3):  # three unrelated singletons: no candidate pairs
        pcm = np.sin(np.linspace(0, (300 + 100 * i) * 2 * np.pi, sr)).astype(np.float32) * 0.3
        rows.append({
            "clip_id": f"s{i}", "bytes": au.encode(pcm, "pcm16"), "sr_hz": sr,
            "dur_ms": 1000, "codec": "pcm16",
            "transcript": f"taysin eri sisalto numero {i} ilman pareja lainkaan {i*7}",
            "status": "active", "sources": ["OULA"], "source_links": [],
            "is_segment_of": None, "author_label": None, "author_type": None,
            "edition_note": None,
        })
    singles = pa.Table.from_pylist(rows, schema=CLIPS_SCHEMA)
    res2 = run_dedup(rd.from_arrow(singles), small_cfg)
    assert res2["assignments"].count() == 0
    assert res2["canonical"].count() == 0


def test_exact_keyset_mode_matches_sampled(ray_session, corpus, small_cfg):
    """The exact counting pass (multi-key pre-filter) must produce the same
    clusters as the sampled hot-key detector — singleton-key dropping is
    recall-lossless by construction."""
    import dataclasses

    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup

    clips, _, _ = corpus
    res_s = run_dedup(rd.from_arrow(clips), small_cfg)
    assert res_s["metrics"]["keyset_mode"] == "sampled"
    a_s = res_s["assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True)

    cfg_e = dataclasses.replace(small_cfg, keyset_mode="exact")
    res_e = run_dedup(rd.from_arrow(clips), cfg_e)
    assert res_e["metrics"]["keyset_mode"] == "exact"
    a_e = res_e["assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert a_s.equals(a_e)


def test_run_dedup_without_optional_columns(ray_session, corpus, small_cfg):
    """A corpus shipping only the input_hint core columns (no author_type /
    author_label / is_segment_of / source_links / edition_note) must run
    end-to-end: _with_derived backfills the normalization trio and the
    member-tagging stage selects only what exists (ADVICE r2)."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup

    clips, truth, golden = corpus
    keep = [c for c in clips.column_names
            if c not in ("author_type", "author_label", "is_segment_of",
                         "source_links", "edition_note")]
    res = run_dedup(rd.from_arrow(clips.select(keep)), small_cfg)
    assert res["canonical"].count() > 0
    assert res["assignments"].count() > 0


def test_run_dedup_sharded_index_matches_default(ray_session, corpus, small_cfg):
    """index_shards > 1 (the >>10^8-row side-table path: per-task 1/K index
    over hash-sharded assignment blocks) must produce IDENTICAL assignments
    and canonical rows to the whole-index default."""
    import dataclasses

    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup

    clips, truth, golden = corpus
    base = run_dedup(rd.from_arrow(clips), small_cfg)
    cfg_s = dataclasses.replace(small_cfg, index_shards=4)
    sharded = run_dedup(rd.from_arrow(clips), cfg_s)
    a = base["assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True)
    b = sharded["assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert a.equals(b)
    ca = base["canonical"].to_pandas().sort_values("cluster_id").reset_index(drop=True)
    cb = sharded["canonical"].to_pandas().sort_values("cluster_id").reset_index(drop=True)
    assert ca["canonical_id"].tolist() == cb["canonical_id"].tolist()
    assert ca["transcript"].tolist() == cb["transcript"].tolist()


def test_exact_keyset_hub_shingle_exclusion(ray_session, corpus, small_cfg):
    """With bucket_cap forced tiny, the corpus's boilerplate hotkey family
    makes its shingle keys OVER-cap hubs — the exact mode must route them
    through the Bloom-minus-exact subtraction and still match sampled mode
    (an FP re-admitting a hub would change candidate sets)."""
    import dataclasses

    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup

    clips, _, _ = corpus
    cfg_s = dataclasses.replace(small_cfg, bucket_cap=4)
    cfg_e = dataclasses.replace(small_cfg, bucket_cap=4, keyset_mode="exact")
    a_s = (
        run_dedup(rd.from_arrow(clips), cfg_s)["assignments"]
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    )
    a_e = (
        run_dedup(rd.from_arrow(clips), cfg_e)["assignments"]
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    )
    assert a_s.equals(a_e)
    assert len(a_e) > 0


def test_dup_pair_metrics_exactness():
    """Metrics kernel vs a hand-countable example: 2 truth families (3+2
    members), clusters matching one family fully, half of the other, plus
    one false-positive cluster mixing families."""
    import numpy as np
    import pandas as pd

    from marc_record_merge_melindautils_ray.functions.evalmetrics import (
        dup_pair_metrics,
    )

    truth = pd.DataFrame({
        "clip_id": ["a1", "a2", "a3", "b1", "b2", "s1"],
        "truth_cluster": ["A", "A", "A", "B", "B", None],
    })
    assign = pd.DataFrame({
        "clip_id": ["a1", "a2", "a3", "b1", "s1"],
        "cluster_id": ["c1", "c1", "c1", "c2", "c2"],
    })
    m = dup_pair_metrics(assign, truth)
    # truth pairs: C(3,2)+C(2,2)=3+1=4; cluster pairs: C(3,2)+C(2,2)=4
    # hit pairs: c1∩A = C(3,2)=3 (b1+s1 share no family)
    assert m["truth_pairs"].iloc[0] == 4
    assert m["cluster_pairs"].iloc[0] == 4
    assert m["hit_pairs"].iloc[0] == 3
    assert m["recall_permille"].iloc[0] == 750
    assert m["precision_permille"].iloc[0] == 750
    assert m["cross_family_clusters"].iloc[0] == 0  # s1 has no family


def test_clips_dedup_quality_query(ray_session):
    import __ray_entry__ as entry

    out = entry.queries()["clips_dedup_quality"]("/root/testdata/sf0.001")
    assert out["recall_permille"].iloc[0] >= 990  # the north-star bar
    assert out["cross_family_clusters"].iloc[0] == 0


def test_read_clips_jsonl_ingest(ray_session, tmp_path):
    """JSONL ingest shim: a base64-payload dump reads back with byte-
    identical payloads and the full dedup run matches the parquet-read
    run cluster-for-cluster."""
    import base64
    import json as _json

    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.config import DedupConfig
    from marc_record_merge_melindautils_ray.pipelines.dedup import read_clips, run_dedup
    from marc_record_merge_melindautils_ray.sources.synth import make_corpus

    clips, _, _ = make_corpus(4, 6, 42)
    pq.write_table(clips, str(tmp_path / "clips.parquet"))
    with open(tmp_path / "clips.jsonl", "w") as f:
        for row in clips.to_pylist():
            row["bytes_b64"] = (base64.b64encode(row.pop("bytes")).decode()
                                if row["bytes"] is not None else None) \
                if "bytes" in row else None
            f.write(_json.dumps(row, default=str) + "\n")
    ds_j = read_clips(str(tmp_path / "clips.jsonl"))
    got = ds_j.to_pandas().sort_values("clip_id")
    want = clips.to_pandas().sort_values("clip_id")
    assert list(got["bytes"]) == list(want["bytes"])   # byte-identical payloads
    a1 = (run_dedup(ds_j, DedupConfig())["assignments"].to_pandas()
          .sort_values("clip_id").reset_index(drop=True))
    a2 = (run_dedup(read_clips(str(tmp_path / "clips.parquet")), DedupConfig())
          ["assignments"].to_pandas().sort_values("clip_id").reset_index(drop=True))
    assert a1.equals(a2)
