"""Resumable partitioned-parquet output sink.

The pipeline's final tables are written as hash-bucketed parquet directories
(``<out>/<table>/bucket=NN/part-*.parquet``) — never one giant file — with a
per-table ``_SUCCESS`` marker written only after every bucket landed.  A
re-run skips tables whose marker exists, and WITHIN an incomplete table it
skips finished buckets: each bucket directory carries its own
``_BUCKET_SUCCESS`` marker, a crashed attempt's unmarked (possibly
half-written) bucket dirs are deleted, and only the missing buckets' rows
are re-filtered and re-written — finished partitions are never touched or
re-shipped.  Per-stage mid-pipeline resume is the Checkpointer's job
(``state/checkpoint.py``), this covers the user-facing export.  Bucket
count is the re-read parallelism knob (one key range per bucket; downstream
consumers can process buckets independently).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.functions.hashing import splitmix64, stable_str_hash


def _with_bucket(key_col: str, num_buckets: int):
    def add(t: pa.Table) -> pa.Table:
        keys = np.asarray(t[key_col].to_pylist(), dtype=object)
        with np.errstate(over="ignore"):
            b = (splitmix64(stable_str_hash(keys)) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    return add


def write_table(
    ds: rd.Dataset, target: str, key_col: str, num_buckets: int = 16,
    file_format: str = "auto",
) -> bool:
    """Write one Dataset as hash-bucketed output; returns False if the
    table was already complete (resume skip).

    ``file_format``: ``"lance"`` writes a Lance dataset (the ``input_hint``
    storage format, mirroring ``read_clips``'s ``read_lance`` attempt),
    ``"parquet"`` the hash-bucketed directory layout, ``"auto"`` tries Lance
    and falls back to parquet when no lance writer ships in the environment
    (this container has none — symmetric with the read path)."""
    marker = os.path.join(target, "_SUCCESS")
    if os.path.exists(marker):
        return False
    os.makedirs(target, exist_ok=True)
    use_lance = file_format == "lance" or (
        file_format == "auto" and hasattr(rd.Dataset, "write_lance")
        and _lance_available()
    )
    if use_lance:
        # Lance handles its own fragmenting; the bucket column stays as the
        # key-range re-read/resume handle
        shutil.rmtree(target, ignore_errors=True)
        os.makedirs(target, exist_ok=True)
        bucketed = ds.map_batches(_with_bucket(key_col, num_buckets),
                                  batch_format="pyarrow")
        bucketed.write_lance(os.path.join(target, "data.lance"))
    else:
        # BUCKET-granular resume: a bucket directory counts as complete only
        # if its own _BUCKET_SUCCESS marker exists (written strictly after
        # the write op returns).  A crashed attempt leaves unmarked bucket
        # dirs — those are deleted (half-written files must not accumulate
        # alongside the rewrite) and ONLY the missing buckets' rows are
        # re-filtered and re-written; finished buckets are never touched or
        # re-shipped.
        #
        # Resume trusts markers only under a MATCHING manifest: a marker left
        # by a crashed run of DIFFERENT data / key column / bucket count must
        # not silently keep stale rows, so (key_col, num_buckets, schema
        # fingerprint) are written next to the markers and any mismatch (or a
        # marker-bearing directory with no manifest at all) wipes the target
        # before `done` is computed.
        manifest_path = os.path.join(target, "_MANIFEST.json")
        manifest = {
            "key_col": key_col,
            "num_buckets": int(num_buckets),
            "schema": _schema_fingerprint(ds),
        }
        stale = False
        if os.path.exists(manifest_path):
            try:
                with open(manifest_path) as f:
                    stale = json.load(f) != manifest
            except (OSError, ValueError):
                stale = True
        elif any(e.startswith("bucket=") for e in os.listdir(target)):
            stale = True  # pre-manifest leftovers: markers are unverifiable
        if stale:
            shutil.rmtree(target, ignore_errors=True)
            os.makedirs(target, exist_ok=True)
        with open(manifest_path, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        done = {
            b for b in range(num_buckets)
            if os.path.exists(os.path.join(
                target, f"bucket={b}", "_BUCKET_SUCCESS"))
        }
        for entry in os.listdir(target):
            p = os.path.join(target, entry)
            if entry.startswith("bucket=") and os.path.isdir(p):
                try:
                    b = int(entry.split("=", 1)[1])
                except ValueError:
                    b = -1
                if b not in done:
                    shutil.rmtree(p, ignore_errors=True)
        missing = sorted(set(range(num_buckets)) - done)
        if missing:
            bucketed = ds.map_batches(_with_bucket(key_col, num_buckets),
                                      batch_format="pyarrow")
            if done:  # resume: ship only the incomplete buckets' rows
                miss_arr = np.array(missing, np.int64)
                bucketed = bucketed.map_batches(
                    lambda t, _m=miss_arr: t.filter(
                        np.isin(np.asarray(t["bucket"], np.int64), _m)),
                    batch_format="pyarrow",
                )
            bucketed.write_parquet(target, partition_cols=["bucket"])
            for b in missing:
                # a bucket with zero rows writes no dir — create it so the
                # marker (and the resume contract) is uniform
                bdir = os.path.join(target, f"bucket={b}")
                os.makedirs(bdir, exist_ok=True)
                with open(os.path.join(bdir, "_BUCKET_SUCCESS"), "w") as f:
                    f.write("complete\n")
                    f.flush()
                    os.fsync(f.fileno())
    with open(marker, "w") as f:
        f.write("complete\n")
        f.flush()
        os.fsync(f.fileno())
    return True


def _schema_fingerprint(ds: rd.Dataset) -> str:
    """Column names + types, metadata-cheap (no execution of the pipeline
    body beyond what schema inference already does)."""
    try:
        sch = ds.schema(fetch_if_missing=True)
        return ",".join(f"{n}:{t}" for n, t in zip(sch.names, sch.types))
    except Exception:
        return "unknown"


def _lance_available() -> bool:
    try:  # the write path needs the lance wheel, not just the Ray API hook
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def write_outputs(res: dict, out_dir: str, num_buckets: int = 16) -> dict[str, bool]:
    """Export a ``run_dedup`` result dict.  Returns {table: written?} —
    False means the table's ``_SUCCESS`` marker existed and it was skipped."""
    written = {}
    for name, key in (
        ("assignments", "clip_id"),
        ("canonical", "cluster_id"),
        ("canonical_rejected", "cluster_id"),
    ):
        if name not in res:
            continue
        written[name] = write_table(
            res[name], os.path.join(out_dir, name), key, num_buckets
        )
    return written
