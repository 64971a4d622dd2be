"""Physical-descriptor parser — the U18 ``inferTypeAndCount`` analog.

The reference parses the MARC ``300‡a`` free-text physical description into
``{type: 'volume', count: n}`` with a regex grammar
(``lib/record-utils.js:415-478``): explicit volume words first, then
page-alias rewriting, then implicit-volume patterns including a
roman-numeral preface.  Pairs whose parsed descriptors disagree are not
mergeable (V10, ``lib/mergeability-validators.js:152-178``).

The new engine keeps the same grammar shape over clip/segment descriptors:
explicit segment words (``segments``, ``osaa``, ``clips``), duration aliases
(``s``/``sek`` → seconds), implicit single-segment forms.  Returns
``(type, count)`` or ``None``.  The verify gate compares parsed descriptors
exactly like the reference compares volume counts.
"""

from __future__ import annotations

import re

# explicit count + unit (reference: /^(\d+)\s*(volumes|vol|nid|v\.)/)
_EXPLICIT = re.compile(
    r"^\s*(\d+)\s*(segments?|segm?\.?|osaa?|clips?|parts?|kpl)\b", re.IGNORECASE
)
# duration forms: "123 s", "45 sek", "12 min" (alias rewriting, cf.
# lib/record-utils.js:449-459 rewriting p/s → pages)
_DURATION = re.compile(r"^\s*(\d+)\s*(s|sek|sec|min)\b\.?", re.IGNORECASE)
# roman-numeral preface + count (cf. lib/record-utils.js:420-421,461-475)
_ROMAN_PREFACE = re.compile(
    r"^\s*[ivxlcdm]+\s*,\s*(\d+)\s*(segments?|osaa?|s|sek)\b", re.IGNORECASE
)
_IMPLICIT_SINGLE = re.compile(
    r"^\s*(one|yksi|single)\s+(segment|osa|clip)\b", re.IGNORECASE
)

_MIN_UNITS = {"min"}


def infer_type_and_count(raw: str | None) -> tuple[str, int] | None:
    """Parse a descriptor string → ('segment', n) / ('seconds', n) / None."""
    if not raw:
        return None
    m = _EXPLICIT.match(raw)
    if m:
        return ("segment", int(m.group(1)))
    m = _ROMAN_PREFACE.match(raw)
    if m:
        unit = m.group(2).lower()
        if unit.startswith(("s", "sek")) and unit not in ("segment", "segments"):
            return ("seconds", int(m.group(1)))
        return ("segment", int(m.group(1)))
    m = _DURATION.match(raw)
    if m:
        n = int(m.group(1))
        if m.group(2).lower() in _MIN_UNITS:
            n *= 60
        return ("seconds", n)
    if _IMPLICIT_SINGLE.match(raw):
        return ("segment", 1)
    return None


def descriptors_mergeable(a: str | None, b: str | None) -> tuple[bool, str | None]:
    """V10 gate semantics (lib/mergeability-validators.js:152-178):
    both parseable → type and count must match; exactly one parseable or
    neither-parseable-but-different-strings → unmergeable; equal raw strings
    are always fine."""
    if (a or "") == (b or ""):
        return True, None
    pa_, pb = infer_type_and_count(a), infer_type_and_count(b)
    if pa_ is None and pb is None:
        return False, "descriptor-unparseable"
    if pa_ is None or pb is None:
        return False, "descriptor-mismatch"
    if pa_[0] != pb[0]:
        return False, "descriptor-type-mismatch"
    if pa_[1] != pb[1]:
        return False, "descriptor-count-mismatch"
    return True, None
