"""Text normalization and scalar string functions.

These re-express the reference's most load-bearing string semantics:

* ``normalize_transcript`` — the normalizing comparator's content
  normalization (U8): lowercase, collapse every run of characters outside
  ``[a-z0-9åäö]`` to a single space, trim
  (``lib/record-utils.js:228-234``).  It defines which texts count as equal.
* ``has_diacritics`` — ``anyDiacritics`` (U15): true iff any character falls
  outside printable ASCII ∪ {ö, ä, å} (``lib/record-utils.js:206-216``).
* ``normalize_note`` — the reprint-note dedup normalization (P6): strip all
  non-word characters before comparing (``lib/post-merge-modifiers.js:184-190``).
* ``normalize_author_key`` — the authority-lookup punctuation normalization
  (P7): ``[.,:-]`` → space, collapse, trim
  (``lib/post-merge-modifiers.js:242-249``).

All batch variants are vectorized pyarrow.compute kernels (RE2 regexes run
natively over Arrow string arrays — no Python loop per row).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_NORM_RE = re.compile(r"[^a-z0-9åäö]+")
# anyDiacritics: /[^\x00-~,'öäå']/ — any char outside the FULL ASCII
# range U+0000–U+007E (controls included: tab/newline are NOT diacritics) or
# öäå.  The , ' in the reference class are already inside \x00-\x7e.
_DIACRITICS_RE = re.compile(r"[^\x00-~öäå]")
_NOTE_NORM_RE = re.compile(r"\W", re.UNICODE)
_AUTHOR_PUNCT_RE = re.compile(r"[.,:-]")


def normalize_transcript(text: str) -> str:
    """Scalar U8 normalization (lib/record-utils.js:231-233)."""
    return _NORM_RE.sub(" ", text.lower()).strip()


def normalize_transcript_array(arr: pa.Array) -> pa.Array:
    """Vectorized U8 normalization over an Arrow string array."""
    out = pc.replace_substring_regex(pc.utf8_lower(arr), r"[^a-z0-9åäö]+", " ")
    return pc.utf8_trim_whitespace(out)


def has_diacritics(text: str) -> bool:
    """Scalar U15 (lib/record-utils.js:211)."""
    return _DIACRITICS_RE.search(text) is not None


def has_diacritics_array(arr: pa.Array) -> pa.Array:
    return pc.match_substring_regex(arr, r"[^\x00-~öäå]")


def normalize_note(text: str) -> str:
    """P6 note-dedup key: strip non-word chars (lib/post-merge-modifiers.js:184)."""
    return _NOTE_NORM_RE.sub("", text)


def normalize_author_key(text: str) -> str:
    """P7 authority-comparison key (lib/post-merge-modifiers.js:242-249)."""
    return re.sub(r"\s+", " ", _AUTHOR_PUNCT_RE.sub(" ", text)).strip()


# V9 noAlephMultifields: the reference rejects records whose field value
# starts with the Aleph long-field continuation marker '^^'
# (lib/mergeability-validators.js:134-150).  Analog: malformed/truncated
# payload marker on the transcript.
MALFORMED_PREFIX = "^^"


def malformed_array(arr: pa.Array) -> pa.Array:
    return pc.starts_with(arr, pattern=MALFORMED_PREFIX)
