"""F1 validateFields rule-engine tests — the ``stopfields.spec.js`` analog,
including the reference's quirks (otherHas fall-through, multiset
semantics)."""

from marc_record_merge_melindautils_ray.functions.field_rules import (
    multiset_is_subset,
    multisets_identical,
    validate_fields,
)
from marc_record_merge_melindautils_ray.functions.textnorm import normalize_transcript


def _run(rules, other_vals, pref_vals, col="x", key=None):
    spec = {"validate": rules}
    if key:
        spec["key"] = key
    return validate_fields({col: spec}, {col: other_vals}, {col: pref_vals})


def test_identical_short_circuits():
    assert _run(["identical"], ["a", "b"], ["b", "a"]) == []
    assert _run(["identical"], ["a"], ["a", "a"]) != []  # multiset, not set


def test_preferred_is_superset():
    assert _run(["preferredIsSuperset"], ["a"], ["a", "b"]) == []
    assert _run(["preferredIsSuperset"], ["a", "c"], ["a", "b"]) != []
    # duplicates count (U12 multiset consumption, lib/record-utils.js:260-279)
    assert _run(["preferredIsSuperset"], ["a", "a"], ["a"]) != []


def test_superset_except_if_empty():
    assert _run(["preferredIsSupersetExceptIfEmpty"], ["a"], []) == []   # vacuous
    assert _run(["preferredIsSupersetExceptIfEmpty"], ["a", "z"], ["a"]) != []


def test_neither_has_and_only_preferred():
    assert _run(["neitherHas"], [], []) == []
    assert _run(["neitherHas"], ["x"], []) != []
    assert _run(["neitherHas"], [], ["x"]) != []
    assert _run(["onlyPreferredHas"], [], ["x"]) == []
    assert _run(["onlyPreferredHas"], ["x"], ["x"]) != []


def test_otherhas_falls_through_to_differing_check():
    """The reference's 'otherHas' rule has NO interpreter branch
    (lib/validate-fields.js — config at lib/mergeability-validators.js:99):
    it degrades to the both-have-differing check.  Quirk preserved."""
    assert _run(["otherHas"], ["a"], []) == []           # only other has: OK
    assert _run(["otherHas"], [], ["a"]) == []           # only preferred: OK
    assert _run(["otherHas"], ["a"], ["a"]) == []        # identical: OK
    assert _run(["otherHas"], ["a"], ["b"]) != []        # differing: error


def test_normalizing_key():
    key = normalize_transcript
    assert _run(["identical"], ["Hello, World!"], ["hello world"], key=key) == []


def test_multiset_kernels():
    assert multiset_is_subset(["a", "a"], ["a", "a", "b"])
    assert not multiset_is_subset(["a", "a"], ["a", "b"])
    assert multisets_identical(["a", "b", "b"], ["b", "a", "b"])
    assert not multisets_identical(["a", "b"], ["a", "b", "b"])


def test_preferred_subset_of_other_fails_even_when_equal():
    """lib/validate-fields.js:48-51: isSubset(preferred, other) is an error,
    so EQUAL multisets under preferredIsSuperset (no 'identical' rule) FAIL."""
    assert _run(["preferredIsSuperset"], ["a"], ["a"]) != []
    # with 'identical' present the short-circuit wins
    assert _run(["identical", "preferredIsSuperset"], ["a"], ["a"]) == []
    # ExceptIfEmpty variant: vacuous when preferred empty, same quirk otherwise
    assert _run(["preferredIsSupersetExceptIfEmpty"], ["a"], []) == []
    assert _run(["preferredIsSupersetExceptIfEmpty"], ["a"], ["a"]) != []


def test_neither_has_nested_under_differing_check():
    """lib/validate-fields.js:69-90: when both sides have differing values,
    only the differing error fires — the neitherHas errors are nested in the
    else branch."""
    errs = _run(["neitherHas"], ["a"], ["b"])
    assert errs == ["Records have differing x values"]
    # both sides same value (no differing): two per-side neitherHas errors
    errs = _run(["neitherHas"], ["a"], ["a"])
    assert len(errs) == 2
