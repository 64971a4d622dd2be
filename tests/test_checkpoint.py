"""Checkpoint/resume semantics (M7): crash mid-stage → rerun skips completed
stages, rebuilds the broken one, output identical."""

import json
import os
import shutil


def _run(corpus, cfg, ck):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup

    clips, _, _ = corpus
    return run_dedup(rd.from_arrow(clips), cfg, checkpoint_dir=ck)


def test_resume_after_mid_stage_crash(ray_session, corpus, small_cfg, tmp_path):
    ck = str(tmp_path / "ck")
    r1 = _run(corpus, small_cfg, ck)
    canon1 = r1["canonical"].to_pandas().sort_values("cluster_id").reset_index(drop=True)

    # simulate a crash mid-canonical-write: completed stage dir gone, a stale
    # .tmp left behind
    shutil.rmtree(os.path.join(ck, "canonical"))
    os.makedirs(os.path.join(ck, "canonical.tmp", "data"), exist_ok=True)
    with open(os.path.join(ck, "canonical.tmp", "data", "junk"), "w") as f:
        f.write("partial garbage")

    r2 = _run(corpus, small_cfg, ck)
    canon2 = r2["canonical"].to_pandas().sort_values("cluster_id").reset_index(drop=True)
    assert canon1[["cluster_id", "canonical_id", "preferred_member"]].equals(
        canon2[["cluster_id", "canonical_id", "preferred_member"]]
    )
    # upstream stages were skipped, only the broken stage rebuilt
    assert r2["metrics"]["features"]["cached"] is True
    assert r2["metrics"]["pairs"]["cached"] is True
    assert r2["metrics"]["canonical"]["cached"] is False
    assert not os.path.exists(os.path.join(ck, "canonical.tmp"))


def test_manifest_lineage_contents(ray_session, corpus, small_cfg, tmp_path):
    ck = str(tmp_path / "ck2")
    _run(corpus, small_cfg, ck)
    with open(os.path.join(ck, "pairs", "manifest.json")) as f:
        m = json.load(f)
    assert m["complete"] is True
    assert m["config_hash"] == small_cfg.config_hash()
    assert m["input_fingerprint"].startswith("features:")
    assert m["num_rows"] == sum(m["partitions"].values())  # per-partition lineage
    assert os.path.exists(os.path.join(ck, "metrics.json"))


def test_changed_input_invalidates_root_stage(ray_session, corpus, small_cfg, tmp_path):
    """ADVICE r1: resuming with a CHANGED input corpus (same config) must
    rebuild from the root features stage, not return stale checkpoints."""
    import pyarrow as pa

    ck = str(tmp_path / "ck2")
    r1 = _run(corpus, small_cfg, ck)
    assert r1["metrics"]["features"]["cached"] is False

    # unchanged input → full cache
    r2 = _run(corpus, small_cfg, ck)
    assert r2["metrics"]["features"]["cached"] is True

    # perturb one transcript (row count preserved!) → features rebuilt
    clips, truth, golden = corpus
    tr = clips["transcript"].to_pylist()
    tr[0] = (tr[0] or "") + " perturbed"
    clips2 = clips.set_column(
        clips.schema.get_field_index("transcript"), "transcript",
        pa.array(tr, pa.string()),
    )
    r3 = _run((clips2, truth, golden), small_cfg, ck)
    assert r3["metrics"]["features"]["cached"] is False


def test_input_fingerprint_full_content_sensitivity(ray_session):
    """In-memory fingerprint must change for a value perturbed ANYWHERE —
    deep rows and late columns, not just the head sample (ADVICE r2)."""
    import pyarrow as pa

    import ray.data as rd

    from marc_record_merge_melindautils_ray.state.checkpoint import (
        dataset_input_fingerprint,
    )

    n = 10_000
    cols = {f"c{i}": list(range(n)) for i in range(8)}
    base = pa.table(cols)
    fp0 = dataset_input_fingerprint(rd.from_arrow(base))
    assert fp0 == dataset_input_fingerprint(rd.from_arrow(base))  # stable

    # perturb one value in the LAST column of the LAST row, same cardinality
    deep = {k: list(v) for k, v in cols.items()}
    deep["c7"][n - 1] += 1
    fp1 = dataset_input_fingerprint(rd.from_arrow(pa.table(deep)))
    assert fp1 != fp0

    # perturb one mid-corpus row in a middle column
    mid = {k: list(v) for k, v in cols.items()}
    mid["c4"][n // 2] += 1
    assert dataset_input_fingerprint(rd.from_arrow(pa.table(mid))) != fp0


def test_input_fingerprint_duplicate_batches_not_cancelled(ray_session):
    """Regression: the XOR fold collided when identical batches paired up
    (cancel to zero) — fatal for duplicate-heavy dedup corpora. Sequential
    hashing must distinguish corpora whose every value differs."""
    import pyarrow as pa

    import ray.data as rd

    from marc_record_merge_melindautils_ray.state.checkpoint import (
        dataset_input_fingerprint,
    )

    base = list(range(4096)) * 2          # two IDENTICAL 4096-row batches
    shifted = [x + 1 for x in base]       # every value different, same shape
    fa = dataset_input_fingerprint(rd.from_arrow(pa.table({"c": base})))
    fb = dataset_input_fingerprint(rd.from_arrow(pa.table({"c": shifted})))
    assert fa != fb
    assert fa == dataset_input_fingerprint(rd.from_arrow(pa.table({"c": base})))


def test_checkpoint_invalidated_by_host_side_input(ray_session, corpus, small_cfg, tmp_path):
    """Regression: host_ids/host_client are INPUTS to their stages — a
    checkpointed re-run with a different host gate must rebuild, not reuse
    the ungated cached survivors."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup

    clips, truth, golden = corpus
    pos = [g for g in golden.to_pylist() if g["expected_ok"]][0]
    ck = str(tmp_path / "ck")
    res1 = run_dedup(rd.from_arrow(clips), small_cfg, checkpoint_dir=ck)
    a1 = res1["assignments"].to_pandas()
    m1 = dict(zip(a1["clip_id"], a1["cluster_id"]))
    assert m1.get(pos["id_other"]) == m1.get(pos["id_preferred"])  # pair clusters

    res2 = run_dedup(
        rd.from_arrow(clips), small_cfg,
        host_ids=frozenset({pos["id_other"]}), checkpoint_dir=ck,
    )
    a2 = res2["assignments"].to_pandas()
    m2 = dict(zip(a2["clip_id"], a2["cluster_id"]))
    assert (
        m2.get(pos["id_other"]) is None
        or m2.get(pos["id_other"]) != m2.get(pos["id_preferred"])
    )
