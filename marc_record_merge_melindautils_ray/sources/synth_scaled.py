"""Parallel deterministic clip-corpus generation as a Ray Data pipeline.

``sources.synth`` builds small in-memory conformance corpora on the driver;
this module generates benchmark-scale corpora IN PARALLEL: family indices are
a ``ray.data.range`` dataset and each batch task synthesizes its families'
rows independently (ids are pure functions of the family index, so any
partitioning yields the identical corpus — generation is itself
retry/resume-safe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.functions import audio as au
from marc_record_merge_melindautils_ray.schema import CLIPS_SCHEMA
from marc_record_merge_melindautils_ray.sources.synth import (
    _SOURCES,
    _mangle_text,
    _pcm,
    _rng_for,
    _transcript,
)

# kind cycle tuned to a realistic dup density (~25% of rows in dup families;
# real-world dedup corpora are mostly singletons)
KINDS = [
    "exact", "singleton", "singleton", "normtext", "singleton", "singleton",
    "transcode", "singleton", "singleton", "containment", "singleton",
    "nearmiss", "singleton", "singleton",
]


def _family_rows(fam_idx: int, seed: int, dur_scale: int = 1) -> list[dict]:
    kind = KINDS[fam_idx % len(KINDS)]
    tag = f"sc:{kind}:{fam_idx}"
    sr = 8000
    rng = _rng_for("fam:" + tag, seed)
    n = int(rng.integers(4000, 16000)) * dur_scale
    pcm = _pcm(tag, seed, n, sr)
    text = _transcript(tag, seed)
    fam = f"fam-{fam_idx}" if kind not in ("nearmiss", "singleton") else None
    s0, s1 = [_SOURCES[fam_idx % 3]], [_SOURCES[3 + fam_idx % 3]]

    def row(member: int, pcm_m, codec, transcript, sources, truth):
        return {
            "clip_id": f"f{fam_idx:09d}m{member}",
            "bytes": au.encode(pcm_m, codec),
            "sr_hz": sr,
            "dur_ms": int(len(pcm_m) * 1000 / sr),
            "codec": codec,
            "transcript": transcript,
            "status": "active",
            "sources": sources,
            "source_links": [],
            "is_segment_of": None,
            "author_label": None,
            "author_type": None,
            "edition_note": None,
            "truth_cluster": truth,
        }

    if kind == "exact":
        return [row(0, pcm, "pcm16", text, s0, fam), row(1, pcm, "pcm16", text, s1, fam)]
    if kind == "normtext":
        return [
            row(0, pcm, "pcm16", text, s0, fam),
            row(1, pcm, "pcm16", _mangle_text(text, tag, seed), s1, fam),
        ]
    if kind == "transcode":
        return [row(0, pcm, "pcm16", text, s0, fam), row(1, pcm, "ulaw", text, s1, fam)]
    if kind == "containment":
        cut = int(len(pcm) * rng.uniform(0.4, 0.7))
        words = text.split()
        prefix = " ".join(words[: max(3, len(words) // 2)])
        return [
            row(0, pcm, "pcm16", text, s0, fam),
            row(1, pcm[:cut], "pcm16", prefix, s1, fam),
        ]
    if kind == "nearmiss":
        noisy = np.clip(pcm + 0.2 * _pcm(tag + ":noise", seed, n, sr), -1, 1)
        words = text.split()
        rng.shuffle(words)
        return [
            row(0, pcm, "pcm16", text, s0, None),
            row(1, noisy, "pcm16", " ".join(words[:-2]), s1, None),
        ]
    # singleton
    codec = str(rng.choice(["pcm16", "ulaw", "alaw", "f32"]))
    return [row(0, pcm, codec, text, s0, None)]


def generate_clips_ds(
    n_families: int, seed: int = 42, with_truth: bool = False, dur_scale: int = 1
) -> rd.Dataset:
    """Dataset of synthesized clips for ``n_families`` family slots (mix of
    dup kinds and singletons per KINDS cycle, ≈1.8 rows per slot)."""
    # 64 blocks (Ray's default here), deliberately NOT raised with corpus
    # size: the feature scan at 32 cpus quantizes into 2.1 waves (~25 %
    # idle in that one stage), but every sort shuffle's map-side unit count
    # scales with input blocks — a 240-block variant measured the 8-cpu
    # candidates and canonical shuffles at 2-3× the 64-block wall, far
    # outweighing the wave win
    idx = rd.range(n_families)
    schema = CLIPS_SCHEMA
    if with_truth:
        schema = schema.append(pa.field("truth_cluster", pa.string()))

    def gen(batch: pd.DataFrame) -> pa.Table:
        rows = []
        for i in batch["id"]:
            rows.extend(_family_rows(int(i), seed, dur_scale))
        if not with_truth:
            for r in rows:
                r.pop("truth_cluster")
        return pa.Table.from_pylist(rows, schema=schema)

    return idx.map_batches(gen, batch_format="pandas", batch_size=64)
