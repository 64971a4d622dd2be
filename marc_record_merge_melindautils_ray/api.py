"""Single-pair convenience API — the reference's exact call surface.

The reference exposes two async functions from a constructor
(``lib/marc-record-merge-melindautils.js:60,180-184``):
``canMerge(otherRecord, preferredRecord)`` → ``'OK'`` or a thrown
``MergeValidationError`` whose message joins every failed check with
newlines (``:74-120``), and
``applyPostMergeModifications(otherRecord, preferredRecord, mergedRecord)``
(``:122-178``).  This module re-expresses that call-level surface over the
engine's batch kernels so an integrator can port a per-pair call site
verbatim: a two-row clip table runs the SAME oriented verify
(``stages.verify.verify_oriented_pairs``) and canonical-build
(``stages.canonical.BuildCanonical``) code paths the distributed pipeline
uses — no Ray session required.

``make_merge_utils`` mirrors the reference constructor: it binds the side
inputs (host-id table ≈ the injected bib DB, authority dict ≈ the injected
auth DB, field rules ≈ the validation config) and returns the two bound
functions.
"""

from __future__ import annotations

import pyarrow as pa

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions.textnorm import (
    has_diacritics,
    normalize_transcript,
)


class MergeValidationError(Exception):
    """U23 mergeError analog (``lib/record-utils.js:314-322``): message is
    the newline-joined reason list, reasons also carried structured."""

    def __init__(self, reasons: list[str]):
        super().__init__("\n".join(reasons))
        self.reasons = list(reasons)


_DEFAULTS = {
    "bytes": None, "sr_hz": 8000, "dur_ms": 0, "codec": "pcm16",
    "transcript": "", "status": None, "sources": [], "source_links": [],
    "is_segment_of": None, "author_label": None, "author_type": None,
    "edition_note": None,
}


def _fill(row: dict, idx: int, extra_cols=()) -> dict:
    out = dict(_DEFAULTS)
    for c in extra_cols:
        out.setdefault(c, None)
    # None-valued input fields keep the safe defaults (a ported JS record's
    # null fields must not crash the numeric gates)
    out.update({k: v for k, v in row.items() if v is not None})
    out.setdefault("clip_id", f"row-{idx}")
    return out


def can_merge(
    other: dict,
    preferred: dict,
    cfg: DedupConfig | None = None,
    host_ids: frozenset[str] | None = None,
    field_rules: dict | None = None,
) -> str:
    """``canMerge(other, preferred)``: returns ``'OK'`` or raises
    ``MergeValidationError`` with ALL failed checks accumulated — the
    reference never stops at the first failure
    (``lib/marc-record-merge-melindautils.js:98-118``)."""
    from marc_record_merge_melindautils_ray.stages.verify import (
        verify_oriented_pairs,
    )

    cfg = cfg or DedupConfig()
    extra = tuple(field_rules or ())
    rows = [_fill(dict(other), 0, extra), _fill(dict(preferred), 1, extra)]
    if rows[0]["clip_id"] == rows[1]["clip_id"]:
        rows[1]["clip_id"] += "-preferred"
    clips = pa.Table.from_pylist(rows)
    pairs = pa.Table.from_pylist([{
        "case": "api", "id_other": rows[0]["clip_id"],
        "id_preferred": rows[1]["clip_id"],
    }])
    out = verify_oriented_pairs(
        clips, pairs, cfg, host_ids=host_ids, field_rules=field_rules
    ).iloc[0]
    if out["ok"]:
        return "OK"
    raise MergeValidationError(list(out["reasons"]))


def apply_post_merge(
    other: dict,
    preferred: dict,
    cfg: DedupConfig | None = None,
    authority: dict[str, str] | None = None,
) -> dict:
    """``applyPostMergeModifications``: builds the merged/canonical record
    for the pair with the full P1-P8 semantics (source union + FCC link
    synthesis, provenance, fresh id, audit struct with injected clock,
    reprint-note dedup, authority normalization, deterministic ordering).
    The 041a-analog output gate surfaces as ``invariant_error`` on the
    returned row rather than a throw — the pipeline's counted-reject
    channel (``pipelines/dedup.py``)."""
    from marc_record_merge_melindautils_ray.stages.canonical import BuildCanonical

    cfg = cfg or DedupConfig()
    rows = []
    for i, r in enumerate((other, preferred)):
        row = _fill(dict(r), i)
        norm = normalize_transcript(row.get("transcript") or "")
        rows.append({
            **row,
            "norm_transcript": norm,
            "has_diacritics": has_diacritics(row.get("transcript") or ""),
        })
    if rows[0]["clip_id"] == rows[1]["clip_id"]:
        rows[1]["clip_id"] += "-preferred"
    cluster_id = "cl-" + min(r["clip_id"] for r in rows)
    for r in rows:
        r["cluster_id"] = cluster_id
    import pandas as pd

    bc = BuildCanonical(cfg, authority)  # plain dict is a valid side input
    return bc(pd.DataFrame(rows)).to_pylist()[0]


def make_merge_utils(
    cfg: DedupConfig | None = None,
    host_ids: frozenset[str] | None = None,
    authority: dict[str, str] | None = None,
    field_rules: dict | None = None,
):
    """The reference constructor analog
    (``lib/marc-record-merge-melindautils.js:60,180-184``): bind the side
    inputs once, get back the two entry points."""
    cfg = cfg or DedupConfig()

    def _can_merge(other: dict, preferred: dict) -> str:
        return can_merge(other, preferred, cfg, host_ids, field_rules)

    def _apply(other: dict, preferred: dict) -> dict:
        return apply_post_merge(other, preferred, cfg, authority)

    return {"can_merge": _can_merge, "apply_post_merge": _apply}
