"""Unit tests for the reference-derived string kernels.

Mirrors the reference's operator-level layer (``test/stopfields.spec.js``,
``test/infer300a.spec.js``) — each normalization semantic gets a table test.
"""

import pyarrow as pa

from marc_record_merge_melindautils_ray.functions.textnorm import (
    has_diacritics,
    has_diacritics_array,
    normalize_author_key,
    normalize_note,
    normalize_transcript,
    normalize_transcript_array,
)

# U8 semantics: lowercase, collapse non-[a-z0-9åäö] runs to one space, trim
# (lib/record-utils.js:231-233)
NORM_CASES = [
    ("Hello,  WORLD!", "hello world"),
    ("Ääkköset ÖY åå", "ääkköset öy åå"),
    ("a-b_c.d", "a b c d"),
    ("  trim me  ", "trim me"),
    ("123 ABC!!!", "123 abc"),
    ("", ""),
    ("...", ""),
    ("sanaÄsana", "sanaäsana"),
]


def test_normalize_scalar():
    for raw, want in NORM_CASES:
        assert normalize_transcript(raw) == want, raw


def test_normalize_vectorized_matches_scalar():
    arr = pa.array([r for r, _ in NORM_CASES])
    got = normalize_transcript_array(arr).to_pylist()
    assert got == [w for _, w in NORM_CASES]


# U15 anyDiacritics: any char outside printable ASCII ∪ {ö,ä,å}
# (lib/record-utils.js:206-216)
def test_diacritics():
    assert not has_diacritics("plain ascii, with punct!")
    assert not has_diacritics("ääkköset öy åå")  # åäö explicitly allowed
    assert has_diacritics("çédille")
    assert has_diacritics("naïve")
    arr = pa.array(["abc", "åäö", "é"])
    assert has_diacritics_array(arr).to_pylist() == [False, False, True]


# P6 note-dedup normalization: strip \W (lib/post-merge-modifiers.js:184)
def test_note_norm():
    assert normalize_note("Lisäpainokset: 2. painos.") == normalize_note(
        "Lisäpainokset 2 painos"
    )
    assert normalize_note("a b") == "ab"


# P7 authority punctuation normalization (lib/post-merge-modifiers.js:242-249)
def test_author_key():
    assert normalize_author_key("Kivi, Aleksis, 1834-1872") == normalize_author_key(
        "Kivi Aleksis 1834 1872"
    )
    assert normalize_author_key("A.B: C-D") == "A B C D"


def test_control_chars_are_not_diacritics():
    """Reference char class is [^\x00-\x7e'öäå'] — tab/newline/CR are inside
    the ASCII range and must NOT count as diacritics (ADVICE r1)."""
    from marc_record_merge_melindautils_ray.functions.textnorm import (
        has_diacritics,
        has_diacritics_array,
    )
    import pyarrow as pa

    assert not has_diacritics("line one\nline two\ttabbed\r")
    assert has_diacritics("café")
    assert not has_diacritics("plain öäå ok")
    arr = has_diacritics_array(pa.array(["a\nb", "café", "öäå"]))
    assert arr.to_pylist() == [False, True, False]
