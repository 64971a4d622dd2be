"""Per-stage checkpointing with lineage manifests (north_rule: "resumable
from checkpoint with per-partition lineage + metrics").

Layout:

    <root>/<stage>/data/part-*.parquet      stage output (partitioned)
    <root>/<stage>/manifest.json            lineage: config hash, input
                                            fingerprint, per-file row counts,
                                            wall time, completion marker

Writes are atomic (write into ``<stage>.tmp``, fsync manifest, ``os.replace``
to final name), so a killed run leaves either a complete stage or a ``.tmp``
that the next run ignores and rebuilds.  A stage is skipped on resume iff its
manifest exists AND its config hash and input fingerprint both match — a
changed knob or changed upstream output invalidates everything downstream.

The reference has no persistence at all (``SURVEY.md §4.1``); this module is
pure new-engine machinery.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray.data as rd


class Checkpointer:
    def __init__(self, root: str | None, config_hash: str):
        self.root = root
        self.config_hash = config_hash
        self.metrics: dict = {}
        if root:
            os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------------ util
    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "manifest.json")

    def completed(self, stage: str, input_fingerprint: str = "") -> bool:
        if not self.root:
            return False
        try:
            with open(self._manifest_path(stage)) as f:
                m = json.load(f)
            return (
                m.get("complete") is True
                and m.get("config_hash") == self.config_hash
                and m.get("input_fingerprint") == input_fingerprint
            )
        except (FileNotFoundError, json.JSONDecodeError):
            return False

    def fingerprint(self, stage: str) -> str:
        """Lineage fingerprint of a completed stage's output (feeds the next
        stage's input_fingerprint).  Uses the content digest (per-file sizes +
        row counts), not just the row count, so content changes that preserve
        cardinality still invalidate downstream stages."""
        if not self.root:
            return ""
        try:
            with open(self._manifest_path(stage)) as f:
                m = json.load(f)
            return f"{stage}:{m['config_hash']}:{m.get('content_digest', m['num_rows'])}"
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            return ""

    # ----------------------------------------------------------------- stage
    def stage(self, name: str, build, *, input_fingerprint: str = "") -> rd.Dataset:
        """Run ``build() -> Dataset`` through the checkpoint, or read the
        completed output back.  Without a root dir, materializes in the
        object store instead (test / ad-hoc mode)."""
        if not self.root:
            t0 = time.monotonic()
            ds = build().materialize()
            self.metrics[name] = {
                "num_rows": ds.count(), "sec": round(time.monotonic() - t0, 3),
                "cached": False,
            }
            return ds

        final = self._dir(name)
        if self.completed(name, input_fingerprint):
            self.metrics[name] = {"cached": True}
            return rd.read_parquet(os.path.join(final, "data"))

        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        t0 = time.monotonic()
        ds = build()
        ds.write_parquet(os.path.join(tmp, "data"))
        files = sorted(os.listdir(os.path.join(tmp, "data")))
        import pyarrow.parquet as pq

        per_file = {
            f: pq.ParquetFile(os.path.join(tmp, "data", f)).metadata.num_rows
            for f in files
        }
        import hashlib

        dig = hashlib.blake2b(digest_size=8)
        for f in files:
            sz = os.path.getsize(os.path.join(tmp, "data", f))
            dig.update(f"{f}:{sz}:{per_file[f]}".encode())
        manifest = {
            "stage": name,
            "complete": True,
            "config_hash": self.config_hash,
            "input_fingerprint": input_fingerprint,
            "num_rows": sum(per_file.values()),
            "content_digest": dig.hexdigest(),
            "partitions": per_file,
            "sec": round(time.monotonic() - t0, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
        self.metrics[name] = {
            "num_rows": manifest["num_rows"], "sec": manifest["sec"], "cached": False,
        }
        return rd.read_parquet(os.path.join(final, "data"))

    def write_metrics(self) -> None:
        if self.root:
            with open(os.path.join(self.root, "metrics.json"), "w") as f:
                json.dump(self.metrics, f, indent=1)


def dataset_input_fingerprint(ds: rd.Dataset) -> str:
    """Fingerprint of a pipeline's ROOT input so resuming with a changed
    corpus invalidates everything (ADVICE r1: an empty root fingerprint let a
    changed input silently reuse stale checkpoints).

    File-backed datasets (the cluster-scale case): digest of sorted
    (path, size, mtime) — metadata-only, content-sensitive for immutable file
    layouts.  In-memory datasets: a FULL content digest — the data already
    fits the object store, so one streamed re-batched pass is affordable, and
    it closes the ADVICE-r2 residue where a change beyond a head sample (or
    in a later column) with the same cardinality silently reused stale
    checkpoints.  Per-batch IPC bytes hash SEQUENTIALLY into one running
    digest (an earlier XOR fold collided whenever identical batches paired
    up and cancelled — fatal for a dedup corpus that is duplicate-heavy by
    design); ``iter_batches`` with a fixed batch size re-batches uniformly,
    so the stream is deterministic for the same logical dataset.  A
    block-layout or schema change can only FALSELY INVALIDATE (safe
    direction), never falsely reuse."""
    import hashlib

    import pyarrow as pa

    h = hashlib.blake2b(digest_size=8)
    files = []
    try:
        files = ds.input_files()
    except Exception:
        files = []
    if files:
        for f in sorted(files):
            try:
                st = os.stat(f)
                h.update(f"{f}:{st.st_size}:{int(st.st_mtime)}".encode())
            except OSError:
                h.update(f.encode())
        return "files:" + h.hexdigest()
    n_rows = 0
    for bi, t in enumerate(ds.iter_batches(batch_size=4096, batch_format="pyarrow")):
        n_rows += t.num_rows
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        h.update(bi.to_bytes(8, "little"))
        h.update(hashlib.blake2b(sink.getvalue(), digest_size=16).digest())
    h.update(str(n_rows).encode())
    return "mem:" + h.hexdigest()
