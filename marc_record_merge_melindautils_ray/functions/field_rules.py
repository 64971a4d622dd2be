"""Declarative per-column verify-rule engine — the F1 ``validateFields``
analog, the reference's user-extension surface.

The reference interprets a ``{tag: {validate: [...rules]}}`` config over the
two records' field sets (``lib/validate-fields.js:32-94``); its stop-field
gate is just one config instance (``lib/mergeability-validators.js:95-107``).
Rules, with the reference's exact quirks preserved:

* ``identical`` — multiset-equal value sets short-circuit OK (``:41-45``)
* ``preferredIsSuperset`` — other ⊆ preferred required; preferred ⊊ other
  forbidden (``:47-55``)
* ``preferredIsSupersetExceptIfEmpty`` — same, vacuous when preferred has
  none (``:56-65``)
* ``neitherHas`` — any occurrence on either side fails (``:74-82``)
* ``onlyPreferredHas`` — other must have none (``:84-88``)
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

        if "neitherHas" in rules:
            if o or p:
                errors.append(f"Neither record may have column {col}")
            continue
        if "onlyPreferredHas" in rules:
            if o:
                errors.append(f"Only preferred record may have column {col}")
            continue

        if "identical" in rules and multisets_identical(o, p, key):
            continue  # short-circuit OK (lib/validate-fields.js:41-45)
        if "preferredIsSuperset" in rules or (
            "preferredIsSupersetExceptIfEmpty" in rules and p
        ):
            if not multiset_is_subset(o, p, key):
                errors.append(f"Preferred record is missing {col} values present in other")
            continue
        if "preferredIsSupersetExceptIfEmpty" in rules and not p:
            continue  # vacuous (lib/validate-fields.js:56-65)
        # generic fall-through — including the reference's branchless
        # 'otherHas' rule (lib/validate-fields.js:68-71, config at
        # lib/mergeability-validators.js:99)
        if o and p and not multisets_identical(o, p, key):
            errors.append(f"Records have differing {col} values")
    return errors


# The engine's default stop-column config — the shape of the reference's
# stop-field table (lib/mergeability-validators.js:95-100) mapped onto the
# clip schema's metadata columns.
DEFAULT_FIELD_RULES: dict = {
    "edition_note": {"validate": ["identical", "preferredIsSupersetExceptIfEmpty"]},
    "author_label": {"validate": ["identical"]},
}
