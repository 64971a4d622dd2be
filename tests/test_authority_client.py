"""P7 live authority-client path (mirror of V11's HostLookupVerify): the
fallible ``auth_db.query('fin11','WNA',name)`` analog
(/root/reference/lib/post-merge-modifiers.js:251-264) injected as a callable,
with lookup errors surfacing as the distinct counted ``author_conflict``
value instead of a silent non-authorized outcome."""

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


def _build(rows, client=None, authority=None):
    bc = BuildCanonical(DedupConfig(), None, authority_client=client)
    bc._authority = authority or {}
    return bc(_group(rows)).to_pylist()[0]


PAIR = [
    {"clip_id": "a", "author_label": "Meikalainen. Matti", "author_type": "person"},
    {"clip_id": "b", "author_label": "Joku, Muu", "author_type": "person",
     "sources": ["FENNI"]},  # preferred, different name
]


def test_client_authorizes_other_name_adopted():
    """Client returns the authorized heading for the non-preferred name →
    adopted, exactly like the broadcast-dict path
    (lib/post-merge-modifiers.js:225-236)."""

    def client(name):
        if "Meikalainen" in name:
            # same name, different punctuation — equal under the reference's
            # [.,:-]→' ' normalization (post-merge-modifiers.js:242-249)
            return ["Meikalainen, Matti"]
        return []

    out = _build(PAIR, client=client)
    assert out["author_conflict"] is None
    assert out["author_label"] == "Meikalainen. Matti"


def test_client_both_authorized_flagged():
    out = _build(PAIR, client=lambda name: [name])
    assert out["author_conflict"] == "both-authorized"


def test_client_error_is_distinct_counted_outcome():
    """A raised client error must NOT read as "not authorized" — the
    reference's rejected query fails the modification
    (post-merge-modifiers.js:251-264 rethrow)."""

    def client(name):
        raise ConnectionError("authority service down")

    out = _build(PAIR, client=client)
    assert out["author_conflict"] == "authority-lookup-error"
    assert out["author_label"] == "Joku, Muu"  # preferred label kept


def test_client_malformed_response_is_error():
    out = _build(PAIR, client=lambda name: {"oops": 1})
    assert out["author_conflict"] == "authority-lookup-error"


def test_error_outranks_adoption():
    """One name errors, the other would be adoptable → error wins (the
    reference fails the whole modification on any rejected lookup)."""

    def client(name):
        if "Joku" in name:
            raise TimeoutError()
        return [name]

    out = _build(PAIR, client=client)
    assert out["author_conflict"] == "authority-lookup-error"


def test_broadcast_dict_consulted_before_client():
    calls = []

    def client(name):
        calls.append(name)
        return []

    auth = {"meikalainen matti": "Meikäläinen, Matti",
            "joku muu": "Joku, Muu"}
    out = _build(PAIR, client=client, authority=auth)
    assert out["author_conflict"] == "both-authorized"
    assert calls == []  # dict hits short-circuit the live client


def test_client_memoized_per_worker():
    calls = []

    def client(name):
        calls.append(name)
        return []

    bc = BuildCanonical(DedupConfig(), None, authority_client=client)
    bc._authority = {}
    bc(_group(PAIR))
    bc(_group(PAIR))  # second cluster, same names
    assert len(calls) == 2  # one lookup per distinct normalized name, ever


def test_run_dedup_authority_client_metrics(tmp_path):
    """Integration: the live client wires through run_dedup, and the
    symmetric counted metrics (authority_lookup_errors / author_conflicts)
    appear alongside V11's host metrics."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup
    from marc_record_merge_melindautils_ray.sources.synth import make_corpus

    clips, _, _ = make_corpus(6, 10, 42)

    def client(name):
        raise RuntimeError("down")

    res = run_dedup(rd.from_arrow(clips), DedupConfig(), authority_client=client)
    assert "authority_lookup_errors" in res["metrics"]
    assert "author_conflicts" in res["metrics"]
    assert res["metrics"]["authority_lookup_errors"] >= 0
    assert res["canonical"].count() > 0
