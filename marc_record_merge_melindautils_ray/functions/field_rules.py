"""Declarative per-column verify-rule engine — the F1 ``validateFields``
analog, the reference's user-extension surface.

The reference interprets a ``{tag: {validate: [...rules]}}`` config over the
two records' field sets (``lib/validate-fields.js:32-94``); its stop-field
gate is just one config instance (``lib/mergeability-validators.js:95-107``).
Rules, with the reference's exact quirks preserved:

* ``identical`` — multiset-equal value sets short-circuit OK (``:41-45``)
* ``preferredIsSuperset`` — TWO accumulating checks (``:47-55``): preferred ⊆
  other is an error (so EQUAL multisets without an ``identical`` rule fail —
  the reference's quirk), and other ⊄ preferred is an error
* ``preferredIsSupersetExceptIfEmpty`` — the same pair, each vacuous when
  preferred has none (``:56-65``)
* ``neitherHas`` / ``onlyPreferredHas`` — nested under the ELSE of the
  both-have-differing check (``:72-90``): when both sides have differing
  values only the differing error fires; otherwise any occurrence on the
  forbidden side(s) fails
* ``otherHas`` — NO branch exists in the reference (``:99`` config names it,
  the interpreter falls through): behaves as the generic
  both-have-differing ⇒ error check (``:68-71``).  Preserved verbatim.

Values are compared as MULTISETS (duplicates count — U12/U13,
``lib/record-utils.js:260-283``), optionally under a normalizer (the U8
normalizing comparator, ``lib/record-utils.js:228-234``).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Callable, Sequence


def multiset_is_subset(sub: Sequence, sup: Sequence, key: Callable = lambda x: x) -> bool:
    """U12: multiset subset with element consumption
    (lib/record-utils.js:260-279) — O(n) via counters instead of the
    reference's O(n·m) clone-and-splice."""
    need = Counter(key(x) for x in sub)
    have = Counter(key(x) for x in sup)
    return all(have[k] >= v for k, v in need.items())


def multisets_identical(s1: Sequence, s2: Sequence, key: Callable = lambda x: x) -> bool:
    """U13: mutual subset ⇒ multiset equality (lib/record-utils.js:281-283)."""
    return Counter(key(x) for x in s1) == Counter(key(x) for x in s2)


def validate_fields(
    config: dict,
    other: dict[str, Sequence],
    preferred: dict[str, Sequence],
) -> list[str]:
    """Interpret ``{column: {"validate": [rules...], "key": normalizer}}``
    over two records' per-column value lists; returns failure messages
    (empty = pass), accumulating across columns like the reference
    (``lib/marc-record-merge-melindautils.js:98-118``)."""
    errors: list[str] = []
    for col, spec in config.items():
        rules = spec.get("validate", [])
        key = spec.get("key", lambda x: x)
        o = list(other.get(col) or [])
        p = list(preferred.get(col) or [])

        if "identical" in rules and multisets_identical(o, p, key):
            continue  # short-circuit OK (lib/validate-fields.js:41-45)

        if "preferredIsSuperset" in rules:
            # TWO accumulating checks, exactly as lib/validate-fields.js:47-55:
            # equal multisets without an 'identical' rule FAIL (preferred is a
            # subset of other) — the reference's quirk, preserved.
            if multiset_is_subset(p, o, key):
                errors.append(
                    f"Preferred record has {col} values that are a subset of other"
                )
            if not multiset_is_subset(o, p, key):
                errors.append(f"Preferred record is missing {col} values present in other")
        elif "preferredIsSupersetExceptIfEmpty" in rules:
            # same pair of checks, each vacuous when preferred has none
            # (lib/validate-fields.js:56-65)
            if p and multiset_is_subset(p, o, key):
                errors.append(
                    f"Preferred record has {col} values that are a subset of other"
                )
            if p and not multiset_is_subset(o, p, key):
                errors.append(f"Preferred record is missing {col} values present in other")
        elif o and p and not multisets_identical(o, p, key):
            # generic both-have-differing check — including the reference's
            # branchless 'otherHas' rule (lib/validate-fields.js:68-71, config
            # at lib/mergeability-validators.js:99)
            errors.append(f"Records have differing {col} values")
        else:
            # neitherHas / onlyPreferredHas are NESTED under the else of the
            # differing check (lib/validate-fields.js:72-90): when both sides
            # have differing values only the differing error fires
            if "neitherHas" in rules:
                if o:
                    errors.append(f"Other record may not have column {col}")
                if p:
                    errors.append(f"Preferred record may not have column {col}")
            if "onlyPreferredHas" in rules and o:
                errors.append(f"Only preferred record may have column {col}")
    return errors


# The engine's default stop-column config — the shape of the reference's
# stop-field table (lib/mergeability-validators.js:95-100) mapped onto the
# clip schema's metadata columns.
DEFAULT_FIELD_RULES: dict = {
    "edition_note": {"validate": ["identical", "preferredIsSupersetExceptIfEmpty"]},
    "author_label": {"validate": ["identical"]},
}
