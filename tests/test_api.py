"""Single-pair API (reference call-surface parity): canMerge semantics
(accumulate-all-reasons, OK path) + applyPostMergeModifications output."""

import pytest

from marc_record_merge_melindautils_ray.api import (
    MergeValidationError,
    apply_post_merge,
    can_merge,
    make_merge_utils,
)


def _clip(cid, **kw):
    return {"clip_id": cid, "transcript": "sama teksti molemmissa", **kw}


def test_can_merge_ok():
    assert can_merge(_clip("a", sources=["OULA"]), _clip("b", sources=["FENNI"])) == "OK"


def test_can_merge_accumulates_all_reasons():
    # deleted (V1) + same-source (V3) + transcript mismatch must ALL appear —
    # the reference joins every failure (lib/marc-record-merge-melindautils.js:98-118)
    with pytest.raises(MergeValidationError) as e:
        can_merge(
            _clip("a", status="deleted", sources=["X"], transcript="yksi"),
            _clip("b", sources=["X"], transcript="kaksi"),
        )
    assert "deleted" in e.value.reasons
    assert "same-source" in e.value.reasons
    assert "transcript-mismatch" in e.value.reasons
    assert str(e.value).count("\n") >= 2  # newline-joined message


def test_can_merge_priority_orientation():
    # V4: other carries the priority source, preferred doesn't -> reject
    with pytest.raises(MergeValidationError) as e:
        can_merge(_clip("a", sources=["FENNI"]), _clip("b", sources=["OULA"]))
    assert "priority-source-orientation" in e.value.reasons
    # the reverse orientation is fine
    assert can_merge(_clip("a", sources=["OULA"]), _clip("b", sources=["FENNI"])) == "OK"


def test_can_merge_host_gate_and_field_rules():
    with pytest.raises(MergeValidationError) as e:
        can_merge(_clip("a"), _clip("b"), host_ids=frozenset({"a"}))
    assert "host-record" in e.value.reasons
    rules = {"edition_note": {"validate": ["neitherHas"]}}
    with pytest.raises(MergeValidationError):
        can_merge(_clip("a", edition_note="2. painos"), _clip("b"), field_rules=rules)


def test_apply_post_merge_row():
    out = apply_post_merge(
        _clip("a", sources=["OULA"]),
        _clip("b", sources=["FENNI"]),
    )
    assert out["canonical_id"] == "canon-cl-a"
    assert out["merged_from"] == ["a", "b"]
    assert out["sources"] == ["FENNI", "OULA"]  # P1 union, P8 sorted
    assert out["preferred_member"] == "b"       # V4 priority source wins
    syss = {l["sys"] for l in out["source_links"]}
    assert syss == {"fenni", "oula"}            # P1 FCC synthesis
    assert out["audit_agent"]                   # P4 audit struct


def test_apply_post_merge_authority_adoption():
    # P7: only the other side's label is authorized -> the canonical row
    # adopts the OTHER MEMBER'S label verbatim, exactly as the reference
    # replaces the merged heading with other's field
    # (lib/post-merge-modifiers.js:225-236) — NOT with the authority DB's
    # returned form
    out = apply_post_merge(
        _clip("a", author_label="Meikalainen, Matti", author_type="person"),
        _clip("b", author_label="Matti M.", author_type="person"),
        authority={"meikalainen matti": "Meikäläinen, Matti (auktorisoitu)"},
    )
    assert out["author_label"] == "Meikalainen, Matti"
    assert out["author_conflict"] is None


def test_can_merge_none_fields_take_defaults():
    # explicit None-valued input fields (ported JS nulls) fall back to the
    # safe defaults instead of crashing the numeric gates
    assert can_merge(
        {"clip_id": "a", "transcript": "sama", "dur_ms": None, "sources": None},
        {"clip_id": "b", "transcript": "sama", "codec": None},
    ) == "OK"


def test_can_merge_one_sided_payload_is_asymmetry():
    # exactly one side carrying audio fails with its OWN reason — the PCM
    # invariant can't hold, but nothing is "undecodable"
    import numpy as np

    from marc_record_merge_melindautils_ray.functions import audio as au

    rng = np.random.default_rng(1)
    payload = au.encode(rng.standard_normal(400).astype(np.float32) * 0.1, "pcm16")
    with pytest.raises(MergeValidationError) as e:
        can_merge(
            _clip("a", bytes=payload, codec="pcm16"),
            _clip("b"),
        )
    assert "payload-asymmetry" in e.value.reasons
    assert "undecodable" not in e.value.reasons


def test_make_merge_utils_binds_side_inputs():
    utils = make_merge_utils(host_ids=frozenset({"h1"}))
    assert utils["can_merge"](_clip("a"), _clip("b")) == "OK"
    with pytest.raises(MergeValidationError):
        utils["can_merge"](_clip("h1"), _clip("b"))
    out = utils["apply_post_merge"](_clip("a"), _clip("b"))
    assert out["canonical_id"] == "canon-cl-a"
