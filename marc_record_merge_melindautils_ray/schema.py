"""Arrow schemas for the engine.

The primary table shape is fixed by ``BASELINE.json`` ``input_hint``:
``(clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32, codec:string,
transcript:string)``.  Optional metadata columns carry the reference's
merge-gate analogs (FIXTURES.md §1): status (leader/5+DEL+STA,
``lib/record-utils.js:364-387``), sources (LOW‡a,
``lib/mergeability-validators.js:52-81``), source_links (SID,
``lib/record-utils.js:155-160``), is_segment_of (component records,
``lib/mergeability-validators.js:237-252``), author_label (100/110/111,
``lib/record-utils.js:31-66``), edition_note (250‡a,
``lib/post-merge-modifiers.js:161-201``).
"""

from __future__ import annotations

import pyarrow as pa

SOURCE_LINK = pa.struct([("sys", pa.string()), ("id", pa.string())])

CLIPS_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
        # optional gate-analog metadata (nullable)
        ("status", pa.string()),
        ("sources", pa.list_(pa.string())),
        ("source_links", pa.list_(SOURCE_LINK)),
        ("is_segment_of", pa.string()),
        ("author_label", pa.string()),
        # author heading type — the 100(person)/110(org)/111(meeting) tag
        # analog; V8 sameAuthorType requires per-tag field-count equality
        # (lib/mergeability-validators.js:117-133)
        ("author_type", pa.string()),
        ("edition_note", pa.string()),
    ]
)

ASSIGNMENT_SCHEMA = pa.schema(
    [("clip_id", pa.string()), ("cluster_id", pa.string())]
)

CANONICAL_SCHEMA = pa.schema(
    [
        ("cluster_id", pa.string()),
        ("canonical_id", pa.string()),
        ("preferred_member", pa.string()),
        ("merged_from", pa.list_(pa.string())),
        ("sources", pa.list_(pa.string())),
        ("source_links", pa.list_(SOURCE_LINK)),
        ("notes", pa.list_(pa.string())),
        ("author_label", pa.string()),
        # P7 outcome surface: None = clean; "author-type-mismatch" /
        # "both-authorized" mirror the reference's mergeError throws
        # (lib/post-merge-modifiers.js:214-223)
        ("author_conflict", pa.string()),
        # P0 output invariant: None = clean; set when the merged row violates
        # a write invariant (the 041a length gate analog,
        # lib/marc-record-merge-melindautils.js:124-129)
        ("invariant_error", pa.string()),
        ("transcript", pa.string()),
        ("audit_agent", pa.string()),
        ("audit_at", pa.string()),
    ]
)

# Codec classes: the leader/6 "record type" analog (V5,
# lib/mergeability-validators.js:82-92).  Codecs in the same class decode to
# comparable PCM and MAY be duplicates of each other; rows of different class
# are never merge candidates.  Unknown codecs form their own class.
CODEC_CLASS = {
    "pcm16": "audio",
    "ulaw": "audio",
    "alaw": "audio",
    "f32": "audio",
}


def codec_class(codec: str) -> str:
    return CODEC_CLASS.get(codec, codec)
