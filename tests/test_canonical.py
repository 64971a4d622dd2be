"""Per-cluster canonical-record construction (P1-P8 semantics)."""

import pandas as pd

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.stages.canonical import BuildCanonical


def _group(rows):
    base = {
        "cluster_id": "cl-x", "transcript": "t", "norm_transcript": "t",
        "has_diacritics": False, "sources": [], "source_links": [],
        "edition_note": None, "author_label": None,
    }
    return pd.DataFrame([{**base, **r} for r in rows])


def _build(rows, cfg=None, authority=None):
    bc = BuildCanonical(cfg or DedupConfig(), None)
    bc._authority = authority or {}
    return bc(_group(rows)).to_pylist()[0]


def test_fresh_id_and_merged_from():
    out = _build([{"clip_id": "b"}, {"clip_id": "a"}])
    # P3: canonical id is fresh, never a member's (lib/post-merge-modifiers.js:118-128)
    assert out["canonical_id"] == "canon-cl-x"
    assert out["canonical_id"] not in ("a", "b")
    assert out["merged_from"] == ["a", "b"]  # P2, sorted (P8)


def test_priority_source_wins_preferred():
    out = _build([
        {"clip_id": "a", "sources": ["OULA"], "transcript": "long long long",
         "norm_transcript": "long long long"},
        {"clip_id": "b", "sources": ["FENNI"]},
    ])
    # V4 analog: the FENNI-carrying member must be preferred even though the
    # other has the longer transcript (lib/mergeability-validators.js:69-81)
    assert out["preferred_member"] == "b"


def test_diacritics_rank_beats_length():
    out = _build([
        {"clip_id": "a", "transcript": "pitempi teksti ilman", "norm_transcript": "pitempi teksti ilman"},
        {"clip_id": "b", "transcript": "çédille", "norm_transcript": "c dille", "has_diacritics": True},
    ])
    assert out["preferred_member"] == "b"  # V7 analog: richer charset wins


def test_source_union_and_fcc_synthesis():
    out = _build([
        {"clip_id": "a", "sources": ["OULA"],
         "source_links": [{"sys": "oula", "id": "X1"}]},
        {"clip_id": "b", "sources": ["TESTI"]},
    ])
    # P1: union of sources; existing link kept, missing link synthesized as
    # FCC<member id> (lib/post-merge-modifiers.js:37-96)
    assert out["sources"] == ["OULA", "TESTI"]
    assert {"sys": "oula", "id": "X1"} in out["source_links"]
    assert {"sys": "testi", "id": "FCCb"} in out["source_links"]
    assert not any(l["id"] == "FCCa" and l["sys"] == "oula" for l in out["source_links"])


def test_reprint_notes_dedup():
    out = _build([
        {"clip_id": "a", "sources": ["FENNI"], "edition_note": "2. painos"},
        {"clip_id": "b", "edition_note": "2... painos!!"},   # same under \W-strip
        {"clip_id": "c", "edition_note": "3. painos"},
    ])
    # P6: non-preferred distinct notes only, deduped under \W-strip
    # normalization (lib/post-merge-modifiers.js:149-201)
    assert out["notes"] == ["Lisäpainokset: 3. painos."]


def test_authority_normalization():
    auth = {"aleksis kivi": "Kivi, Aleksis, 1834-1872"}
    out = _build(
        [
            {"clip_id": "a", "sources": ["FENNI"], "author_label": "Kivi Aleksis"},
            {"clip_id": "b", "author_label": "Aleksis Kivi"},
        ],
        authority=auth,
    )
    # P7: differing headings; only the non-preferred one is authorized → it
    # replaces the heading (lib/post-merge-modifiers.js:225-236)
    assert out["author_label"] == "Aleksis Kivi"


def test_audit_injected_clock():
    cfg = DedupConfig(audit_clock="2000-01-01T00:00:00Z", merge_agent="X")
    out = _build([{"clip_id": "a"}, {"clip_id": "b"}], cfg=cfg)
    assert out["audit_at"] == "2000-01-01T00:00:00Z"  # P4 determinism
    assert out["audit_agent"] == "X"


def test_author_type_mismatch_flagged():
    """P7 'Author type mismatch.' (lib/post-merge-modifiers.js:214-216):
    differing names with differing author types → conflict flag, preferred
    label kept."""
    out = _build([
        {"clip_id": "a", "author_label": "Testaaja, Tiina", "author_type": "person"},
        {"clip_id": "b", "author_label": "Testiorganisaatio", "author_type": "org"},
    ])
    assert out["author_conflict"] == "author-type-mismatch"
    assert out["author_label"] == out["author_label"]  # kept, not dropped


def test_both_authorized_flagged():
    """P7 'Both records are in authorized format.'
    (lib/post-merge-modifiers.js:218-223)."""
    auth = {"meikalainen matti": "Meikäläinen, Matti",
            "sukunimi etunimi": "Sukunimi, Etunimi"}
    out = _build(
        [
            {"clip_id": "a", "author_label": "Meikalainen. Matti", "author_type": "person"},
            {"clip_id": "b", "author_label": "Sukunimi, Etunimi", "author_type": "person"},
        ],
        authority=auth,
    )
    assert out["author_conflict"] == "both-authorized"


def test_single_authorized_adopted_no_conflict():
    auth = {"meikalainen matti": "Meikäläinen, Matti"}
    out = _build(
        [
            {"clip_id": "a", "author_label": "Meikalainen. Matti", "author_type": "person"},
            {"clip_id": "b", "author_label": "Joku, Muu", "author_type": "person",
             "sources": ["FENNI"]},  # preferred, unauthorized
        ],
        authority=auth,
    )
    assert out["author_conflict"] is None
    assert out["author_label"] == "Meikalainen. Matti"


def test_p0_short_source_code_invariant():
    """P0 041a-analog (lib/marc-record-merge-melindautils.js:124-129): a
    merged link whose source-system code is shorter than 3 chars marks the
    row as an invariant violation."""
    out = _build([
        {"clip_id": "a", "sources": ["AB"]},  # synthesizes link sys 'ab'
        {"clip_id": "b", "sources": ["HELKA"]},
    ])
    assert out["invariant_error"] == "short-source-code"
    out2 = _build([
        {"clip_id": "a", "sources": ["OULA"]},
        {"clip_id": "b", "sources": ["HELKA"]},
    ])
    assert out2["invariant_error"] is None


def test_author_parts_full_u22_path():
    """U22 FULL semantics via the optional structured author_parts column:
    per-tag subfield whitelists project the name (noise subfields dropped),
    and a record with multiple name fields surfaces the reference's
    mergeError as the 'multiple-names' conflict flag
    (record-utils.js:31-66)."""
    out = _build([
        {"clip_id": "a", "author_label": "collapsed ignored",
         "author_parts": [
             {"tag": "100", "subfields": [
                 {"code": "a", "value": "Virtanen, Ville"},
                 {"code": "x", "value": "NOISE"},
                 {"code": "d", "value": "1970-"},
             ]},
         ]},
        {"clip_id": "b"},
    ])
    assert out["author_label"] == "Virtanen, Ville 1970-"
    assert out["author_conflict"] is None

    out2 = _build([
        {"clip_id": "a", "author_parts": [
            {"tag": "100", "subfields": [{"code": "a", "value": "One"}]},
            {"tag": "110", "subfields": [{"code": "a", "value": "Two"}]},
        ]},
        {"clip_id": "b"},
    ])
    assert out2["author_conflict"] == "multiple-names"


def test_author_parts_tag_mismatch_without_flat_types():
    """Regression: in a parts-ONLY corpus (no flat author_type column), the
    name-field TAG carries the author type — 100 vs 110 must still hit the
    P7 'Author type mismatch.' throw (post-merge-modifiers.js:214-216)."""
    out = _build([
        {"clip_id": "a", "author_parts": [
            {"tag": "100", "subfields": [{"code": "a", "value": "One"}]},
        ]},
        {"clip_id": "b", "author_parts": [
            {"tag": "110", "subfields": [{"code": "a", "value": "Two"}]},
        ]},
    ])
    assert out["author_conflict"] == "author-type-mismatch"
