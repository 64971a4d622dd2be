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


def test_cli_end_to_end(tmp_path):
    """`python -m marc_record_merge_melindautils_ray` (the ray-job-submit
    entry form): reads a clip parquet, runs the pipeline with checkpoints,
    writes the resumable sink, prints one JSON metrics line."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.sources.synth import make_corpus

    clips, _, _ = make_corpus(6, 10, 42)
    inp = tmp_path / "clips.parquet"
    pq.write_table(clips, str(inp))
    out_dir = tmp_path / "out"
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [sys.executable, "-m", "marc_record_merge_melindautils_ray",
         "--input", str(inp), "--output", str(out_dir),
         "--checkpoint", str(tmp_path / "ckpt"),
         "--config", '{"fingerprint_concurrency": 2, "verify_concurrency": 2}'],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["assignments"] > 0 and res["clusters"] > 0
    assert (out_dir / "assignments" / "_SUCCESS").exists()
    assert (out_dir / "canonical" / "_SUCCESS").exists()


def test_bucket_granular_resume(ray_session, tmp_path):
    """Crash simulation: table marker missing, one bucket unmarked and one
    bucket dir gone → resume rewrites ONLY those two; completed buckets'
    files are bit-untouched (same inode+mtime) and the re-read equals the
    full dataset exactly once."""
    import os

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.io import write_table

    df = pd.DataFrame({
        "k": [f"id{i:04d}" for i in range(500)],
        "v": np.arange(500, dtype=np.int64),
    })
    root = tmp_path / "t"
    assert write_table(rd.from_pandas(df), str(root), "k", num_buckets=8)

    def bucket_files(b):
        d = root / f"bucket={b}"
        return sorted(p for p in os.listdir(d) if p.endswith(".parquet"))

    # record inode+mtime of a bucket that will stay complete
    keep = [(f, os.stat(root / "bucket=3" / f).st_ino,
             os.stat(root / "bucket=3" / f).st_mtime_ns)
            for f in bucket_files(3)]

    # simulate the crash
    os.remove(root / "_SUCCESS")
    os.remove(root / "bucket=5" / "_BUCKET_SUCCESS")   # half-written bucket
    import shutil
    shutil.rmtree(root / "bucket=6")                    # bucket never landed

    assert write_table(rd.from_pandas(df), str(root), "k", num_buckets=8)
    # untouched complete bucket: same files, same inodes, same mtimes
    got = [(f, os.stat(root / "bucket=3" / f).st_ino,
            os.stat(root / "bucket=3" / f).st_mtime_ns)
           for f in bucket_files(3)]
    assert got == keep
    assert (root / "bucket=5" / "_BUCKET_SUCCESS").exists()
    assert (root / "bucket=6" / "_BUCKET_SUCCESS").exists()
    # exactly-once read-back
    back = rd.read_parquet(str(root)).to_pandas()
    assert sorted(back["k"]) == sorted(df["k"])
    assert back["v"].sum() == df["v"].sum()
    # idempotent skip once complete
    assert not write_table(rd.from_pandas(df), str(root), "k", num_buckets=8)
