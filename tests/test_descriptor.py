"""Descriptor-parser table tests — the ``infer300a.spec.js`` analog
(8-case table at test/infer300a.spec.js:38-59 in the reference)."""

from marc_record_merge_melindautils_ray.functions.descriptor import (
    descriptors_mergeable,
    infer_type_and_count,
)

CASES = [
    ("3 segments", ("segment", 3)),
    ("2 osaa", ("segment", 2)),
    ("1 segm.", ("segment", 1)),
    ("12 clips", ("segment", 12)),
    ("120 s", ("seconds", 120)),
    ("45 sek", ("seconds", 45)),
    ("2 min", ("seconds", 120)),           # alias rewriting (U18 p/s → pages analog)
    ("xii, 3 segments", ("segment", 3)),   # roman-numeral preface
    ("one segment", ("segment", 1)),       # implicit single
    ("utter nonsense", None),
    ("", None),
    (None, None),
]


def test_parser_table():
    for raw, want in CASES:
        assert infer_type_and_count(raw) == want, raw


def test_gate_semantics():
    # equal raw strings always mergeable (even unparseable)
    assert descriptors_mergeable("gibberish", "gibberish") == (True, None)
    # both parse, equal
    assert descriptors_mergeable("3 segments", "3 osaa") == (True, None)
    # count mismatch
    ok, why = descriptors_mergeable("3 segments", "4 segments")
    assert not ok and why == "descriptor-count-mismatch"
    # type mismatch
    ok, why = descriptors_mergeable("3 segments", "120 s")
    assert not ok and why == "descriptor-type-mismatch"
    # one unparseable
    ok, why = descriptors_mergeable("3 segments", "gibberish")
    assert not ok and why == "descriptor-mismatch"
    # neither parseable, different strings — reference rejects
    # (lib/mergeability-validators.js:170-176)
    ok, why = descriptors_mergeable("foo", "bar")
    assert not ok and why == "descriptor-unparseable"
