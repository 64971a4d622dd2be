"""Resumable partitioned-parquet export (pipelines/io.py)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def test_bucketed_write_and_resume_skip(ray_session, tmp_path):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.io import write_outputs

    assign = rd.from_arrow(pa.table({
        "clip_id": pa.array([f"c{i}" for i in range(100)]),
        "cluster_id": pa.array([f"cl-{i % 7}" for i in range(100)]),
    }))
    res = {"assignments": assign}
    out = str(tmp_path / "export")

    written = write_outputs(res, out, num_buckets=4)
    assert written == {"assignments": True}
    root = os.path.join(out, "assignments")
    buckets = [d for d in os.listdir(root) if d.startswith("bucket=")]
    assert 1 < len(buckets) <= 4          # hash-partitioned dirs, no giant file
    assert os.path.exists(os.path.join(root, "_SUCCESS"))
    total = sum(
        pq.read_table(os.path.join(root, b)).num_rows for b in buckets
    )
    assert total == 100

    # second run resumes: complete table skipped, files untouched
    mtimes = {b: os.path.getmtime(os.path.join(root, b)) for b in buckets}
    written2 = write_outputs(res, out, num_buckets=4)
    assert written2 == {"assignments": False}
    assert mtimes == {b: os.path.getmtime(os.path.join(root, b)) for b in buckets}
