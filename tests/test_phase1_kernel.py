"""Arrow-native phase-1 gate kernel: per-gate semantics, bitmask/reasons
agreement, and null-handling equivalence with the former pandas kernel."""

import numpy as np
import pyarrow as pa

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.stages.candidates import PAIR_SCHEMA
from marc_record_merge_melindautils_ray.stages.verify import (
    PHASE1_REASONS,
    make_phase1_kernel,
    survivors_to_table,
)


def _pair_table(rows: list[dict]) -> pa.Table:
    base = {
        "id_a": "x1", "id_b": "x2", "rel": "band", "bucket_n": 2,
        "fp_a": 0, "fp_b": 0, "nh0_a": 1, "nh0_b": 1, "nh1_a": 2, "nh1_b": 2,
        "dur_ms_a": 1000, "dur_ms_b": 1000, "codec_cls_a": "pcm",
        "codec_cls_b": "pcm", "sources_a": ["FENNI"], "sources_b": ["OULA"],
        "is_segment_of_a": None, "is_segment_of_b": None,
        "decode_ok_a": True, "decode_ok_b": True,
        "author_type_a": None, "author_type_b": None,
    }
    full = [{**base, **r} for r in rows]
    return pa.Table.from_pylist(full, schema=PAIR_SCHEMA)


def _run(rows, host_ids=None):
    k = make_phase1_kernel(DedupConfig(), host_ids)
    return k(_pair_table(rows))


def test_gates_fire_with_stable_reason_strings():
    out = _run([
        {},  # clean pair → survives
        {"codec_cls_b": "opus", "decode_ok_b": False},  # codec-class only
        # (undecodable requires SAME codec class)
        {"is_segment_of_a": "parent1"},
        {"decode_ok_a": False},
        {"dur_ms_b": 2000},
        {"nh0_b": 9},
        {"fp_b": (1 << 60) - 1},
        {"sources_b": ["FENNI", "OULA"]},
        {"author_type_a": "person", "author_type_b": "org"},
    ])
    reasons = out["reasons"].to_pylist()
    assert reasons[0] == []
    assert reasons[1] == ["codec-class"]
    assert reasons[2] == ["segment-of"]
    assert reasons[3] == ["undecodable"]
    assert reasons[4] == ["duration-mismatch"]
    assert reasons[5] == ["transcript-mismatch"]
    assert reasons[6] == ["fingerprint-distance"]
    assert reasons[7] == ["same-source"]
    assert reasons[8] == ["author-type-mismatch"]
    assert out["ok1"].to_pylist() == [True] + [False] * 8
    # bitmask ↔ decoded strings agree bit-for-bit
    for bits, rs in zip(out["reason_bits"].to_pylist(), reasons):
        assert [PHASE1_REASONS[i] for i in range(16) if bits >> i & 1] == rs


def test_accumulates_all_reasons_in_gate_order():
    """The reference accumulates EVERY failure before reporting
    (lib/marc-record-merge-melindautils.js:74-120) — so does the kernel."""
    out = _run([{
        "codec_cls_b": "opus", "dur_ms_b": 9000, "nh0_b": 5,
        "author_type_b": "person",
    }])
    assert out["reasons"].to_pylist()[0] == [
        "codec-class", "duration-mismatch", "transcript-mismatch",
        "author-type-mismatch",
    ]


def test_containment_relaxes_content_gates():
    out = _run([
        {"rel": "containment", "dur_ms_b": 9000, "nh0_b": 5, "fp_b": 123456789},
    ])
    assert out["ok1"].to_pylist() == [True]


def test_null_semantics():
    out = _run([
        {"author_type_a": None, "author_type_b": ""},  # absent == empty (V8)
        {"sources_a": None},                           # null list overlaps nothing
        {"codec_cls_a": None, "codec_cls_b": None,     # null == null for codec,
         "decode_ok_a": False},                        # but undecodable still fires
    ])
    assert out["reasons"].to_pylist() == [[], [], ["undecodable"]]


def test_host_gate_and_survivor_projection():
    out = _run([{}, {"id_a": "h1", "id_b": "x9"}], host_ids=frozenset({"h1"}))
    assert out["reasons"].to_pylist() == [[], ["host-record"]]
    sv = survivors_to_table(out)
    assert sv.column_names == ["id_a", "id_b", "rel", "bucket_n", "exact"]
    assert sv.num_rows == 1
    assert sv.schema.field("bucket_n").type == pa.int32()


def test_empty_batch():
    out = _run([])
    assert out.num_rows == 0
    assert survivors_to_table(out).num_rows == 0
