"""Stage 6: per-cluster canonical-record construction.

``groupby('cluster_id').map_groups(build_canonical)`` — the Ray Data
re-expression of the reference's ``applyPostMergeModifications``
(``lib/marc-record-merge-melindautils.js:122-178``), generalized from a pair
to a cluster:

* preferred-member selection — the V4 priority-source rule
  (``lib/mergeability-validators.js:69-81``) first, then transcript richness
  (V7 diacritics asymmetry, ``lib/record-utils.js:349-362``), then longest
  normalized transcript (``preferredIsSuperset``,
  ``lib/validate-fields.js:47-55``), then most sources, then lowest id for
  determinism
* P1 ``syncLOWandSIDFields`` → sources = union of members' sources;
  source_links = existing links ∪ synthesized ``FCC<member_id>`` links for
  each (member, source) lacking one (``lib/post-merge-modifiers.js:37-96``)
* P2 → ``merged_from`` = all member ids (``lib/post-merge-modifiers.js:98-116``)
* P3 → fresh deterministic ``canonical_id``, never a member's id
  (``lib/post-merge-modifiers.js:118-128``)
* P4 → audit struct with an *injected* clock — the reference's ``new Date()``
  (``lib/post-merge-modifiers.js:139``) is its only nondeterminism and its own
  tests strip it (``test/MergeUtilsMelinda.spec.js:154``)
* P5 → volatile per-member history is simply not carried onto the canonical
  row (``lib/post-merge-modifiers.js:145-147``)
* P6 → reprint notes: non-preferred members' edition notes become
  ``Lisäpainokset: …`` entries, deduplicated under the ``\\W``-strip
  normalization (``lib/post-merge-modifiers.js:149-201``)
* P7 → authority normalization of the author heading against a broadcast
  authority side table (``lib/post-merge-modifiers.js:203-264``)
* P8 → deterministic ordering of every list column
  (``lib/record-utils.js:75-131``)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions.textnorm import (
    normalize_author_key,
    normalize_note,
)
from marc_record_merge_melindautils_ray.schema import CANONICAL_SCHEMA

# columns build_canonical needs on each member row
def _member_cols(g) -> dict:
    """Member columns as lists; OPTIONAL columns a user corpus omitted are
    backfilled with None so build_row's per-field guards apply uniformly
    (ADVICE r2: omitting author/source metadata must not crash the merge)."""
    return {
        c: (g[c].tolist() if c in g.columns else [None] * len(g))
        for c in MEMBER_COLS
    }


MEMBER_COLS = [
    "clip_id", "cluster_id", "transcript", "norm_transcript", "has_diacritics",
    "sources", "source_links", "edition_note", "author_label", "author_type",
    "author_parts",
]


def preferred_rank_key(row: pd.Series, cfg: DedupConfig) -> tuple:
    """Sort key — smallest wins."""
    srcs = set(row["sources"] or [])
    return (
        0 if cfg.priority_source in srcs else 1,          # V4 priority source wins
        0 if row["has_diacritics"] else 1,                # V7: richer charset wins
        -len(row["norm_transcript"] or ""),               # superset transcript wins
        -len(srcs),
        row["clip_id"],                                    # deterministic tiebreak
    )


# distinct sentinel for a FAILED authority lookup — the reference's query
# rejection propagates and fails the merge (lib/post-merge-modifiers.js:
# 251-264 .catch rethrows); it must never read as "not authorized"
AUTH_LOOKUP_ERROR = "__authority-lookup-error__"


class BuildCanonical:
    """map_groups callable; authority side table broadcast once via ray.put.

    ``authority_client`` is the LIVE P7 alternative (mirror of V11's
    ``HostLookupVerify``): a picklable callable ``name → list-of-authorized-
    heading-strings`` (the ``auth_db.query('fin11','WNA',name)`` analog,
    lib/post-merge-modifiers.js:251-264).  Held per worker from ``__init__``
    (the reference's constructor-injected ``auth_db`` handle) with per-worker
    memoization by normalized name.  A raised error or malformed response
    surfaces as the distinct counted ``author_conflict`` value
    ``authority-lookup-error`` — never silently treated as non-authorized.
    The broadcast dict remains the zero-IO fast path and is consulted first.
    """

    def __init__(self, cfg: DedupConfig, authority_ref=None, authority_client=None):
        self.cfg = cfg
        self._authority_ref = authority_ref
        self._authority: dict[str, str] | None = None
        self.authority_client = authority_client
        self._client_cache: dict[str, str | None] = {}

    @property
    def authority(self) -> dict[str, str]:
        if self._authority is None:
            from marc_record_merge_melindautils_ray.functions.util import maybe_get

            self._authority = maybe_get(self._authority_ref) or {}
        return self._authority

    def _authorized(self, label: str | None) -> str | None:
        """P7 authorInAuthorizedFormat: compare under punctuation
        normalization (lib/post-merge-modifiers.js:242-264).  Authority
        side-table keys are lowercase punctuation-normalized labels.
        Returns the authorized form, ``None`` (not authorized), or
        ``AUTH_LOOKUP_ERROR``."""
        if not label:
            return None
        key = normalize_author_key(label).lower()
        hit = self.authority.get(key)
        if hit is not None or self.authority_client is None:
            return hit
        if key in self._client_cache:
            return self._client_cache[key]
        try:
            resp = self.authority_client(label)
        except Exception:
            out: str | None = AUTH_LOOKUP_ERROR
        else:
            if isinstance(resp, (list, tuple)):
                # authorized iff any returned heading equals the name under
                # punctuation normalization (post-merge-modifiers.js:242-249)
                out = next(
                    (
                        h for h in resp
                        if isinstance(h, str)
                        and normalize_author_key(h).lower() == key
                    ),
                    None,
                )
            else:
                out = AUTH_LOOKUP_ERROR
        self._client_cache[key] = out
        return out

    def build_row(self, cols: dict[str, list]) -> dict:
        """Core P1-P8 merge over one cluster's column slices (plain lists —
        no per-cluster DataFrame/Table construction)."""
        cfg = self.cfg
        n = len(cols["clip_id"])
        cluster_id = cols["cluster_id"][0]
        srcs = [list(s) if s is not None else [] for s in cols["sources"]]

        def rank_key(i: int):
            return (
                0 if cfg.priority_source in srcs[i] else 1,        # V4
                0 if cols["has_diacritics"][i] else 1,             # V7
                -len(cols["norm_transcript"][i] or ""),            # superset
                -len(srcs[i]),
                cols["clip_id"][i],
            )

        ranks = sorted(range(n), key=rank_key)
        pi = ranks[0]

        member_ids = sorted(cols["clip_id"])                           # P2
        sources = sorted({s for row in srcs for s in row})             # P1 union

        links: set[tuple[str, str]] = set()
        for i in range(n):
            own = {
                (d["sys"], d["id"]) for d in (cols["source_links"][i] or [])
            }
            links |= own
            have_sys = {s for s, _ in own}
            for src in srcs[i]:
                sys_l = src.lower()
                if sys_l not in have_sys:                              # P1 synthesis
                    links.add((sys_l, f"FCC{cols['clip_id'][i]}"))
        source_links = [{"sys": s, "id": i} for s, i in sorted(links)]  # P8

        # P6 reprint notes: non-preferred members' distinct edition notes
        notes: list[str] = []
        seen_keys = set()
        if cols["edition_note"][pi]:
            seen_keys.add(normalize_note(cols["edition_note"][pi]))
        for i in ranks[1:]:
            note = cols["edition_note"][i]
            if not note:
                continue
            text = f"Lisäpainokset: {note}."
            key = normalize_note(text)
            if key in seen_keys or normalize_note(note) in seen_keys:
                continue
            seen_keys.add(key)
            notes.append(text)
        notes.sort()

        # U22 FULL path: when the corpus preserves subfield structure
        # (optional ``author_parts`` cells: list of {tag, subfields} dicts),
        # derive each member's label through the per-tag subfield whitelists
        # and surface the multiple-names throw
        # (lib/record-utils.js:31-66) — the flat ``author_label`` remains
        # the collapsed fallback for schemas without it.
        def _parts_list(p):
            # pandas renders absent cells as NaN floats; list cells may be
            # ndarray or list
            if p is None or isinstance(p, float):
                return None
            try:
                return list(p) if len(p) else None
            except TypeError:
                return None

        author_parts = [_parts_list(p) for p in (cols.get("author_parts") or [None] * n)]
        multiple_names = False
        if any(p for p in author_parts):
            from marc_record_merge_melindautils_ray.functions.authorq import (
                MultipleNamesError,
                to_authority_query,
            )

            tag_type = {"100": "person", "110": "org", "111": "meeting"}
            new_labels = list(cols["author_label"])
            new_types = list(cols.get("author_type", [None] * n))
            for i, p in enumerate(author_parts):
                if not p:
                    continue
                try:
                    q = to_authority_query(p)
                except MultipleNamesError:
                    multiple_names = True
                    continue
                if q and q["name"]:
                    new_labels[i] = q["name"]
                    # the name field's TAG is the author type — parts-only
                    # corpora must still hit the P7 tag-mismatch throw
                    # (post-merge-modifiers.js:214-216)
                    new_types[i] = tag_type.get(q["tag"], new_types[i])
            cols = {**cols, "author_label": new_labels, "author_type": new_types}

        # P7 authority normalization with the reference's FULL outcome set
        # (lib/post-merge-modifiers.js:203-240): names differ →
        #   * author types differ        → 'Author type mismatch.'  throw
        #   * ≥2 distinct names authorized → 'Both records are in authorized
        #     format.' throw
        #   * exactly one authorized (and preferred's isn't) → adopt it
        # The throws surface as the ``author_conflict`` column (the canonical
        # row keeps the preferred label, flagged, instead of silently passing).
        author_types = cols.get("author_type", [None] * n)
        labels = [x for x in cols["author_label"] if x]
        typed = {t for l, t in zip(cols["author_label"], author_types) if l and t}
        author = cols["author_label"][pi]
        author_conflict = None
        if labels and len({normalize_author_key(x) for x in labels}) > 1:
            if len(typed) > 1:
                author_conflict = "author-type-mismatch"
            else:
                authorized, lookup_error = [], False
                for x in dict.fromkeys(labels):
                    a = self._authorized(x)
                    if a == AUTH_LOOKUP_ERROR:
                        lookup_error = True
                    elif a:
                        authorized.append(x)
                if lookup_error:
                    # error outranks adopt/both-authorized: the reference's
                    # rejected query fails the whole modification
                    author_conflict = "authority-lookup-error"
                elif len(authorized) > 1:
                    author_conflict = "both-authorized"
                elif len(authorized) == 1 and not self._authorized(author):
                    author = authorized[0]
        if multiple_names and author_conflict is None:
            author_conflict = "multiple-names"  # the U22 mergeError analog

        # P0 output invariant — the 041a length gate analog
        # (lib/marc-record-merge-melindautils.js:124-129): the reference
        # refuses to emit a merged record whose language subfield is shorter
        # than the downstream system requires; the analog is a source-system
        # code on a merged link too short to be a valid library code.
        invariant_error = None
        if any(len(s) < 3 for s, _ in sorted(links)):
            invariant_error = "short-source-code"

        return {
            "cluster_id": cluster_id,
            "canonical_id": f"canon-{cluster_id}",                     # P3 fresh id
            "preferred_member": cols["clip_id"][pi],
            "merged_from": member_ids,
            "sources": sources,
            "source_links": source_links,
            "notes": notes,
            "author_label": author,
            "author_conflict": author_conflict,
            "invariant_error": invariant_error,
            "transcript": cols["transcript"][pi],
            "audit_agent": cfg.merge_agent,                            # P4
            "audit_at": cfg.audit_clock,                               # injected clock
        }

    def __call__(self, g) -> pa.Table:
        """Single-cluster convenience entry (tests / small use)."""
        if isinstance(g, pa.Table):
            g = g.to_pandas()
        g = g.sort_values("clip_id").reset_index(drop=True)
        cols = _member_cols(g)
        return pa.Table.from_pylist([self.build_row(cols)], schema=CANONICAL_SCHEMA)

    def build_partition(self, g) -> pa.Table:
        """Partition-then-vectorize entry: boundary-scan the partition's
        clusters once, one output Table per partition."""
        g = g.sort_values(["cluster_id", "clip_id"])
        cols = _member_cols(g)
        cl = cols["cluster_id"]
        rows = []
        start = 0
        for i in range(1, len(cl) + 1):
            if i == len(cl) or cl[i] != cl[start]:
                rows.append(
                    self.build_row({c: v[start:i] for c, v in cols.items()})
                )
                start = i
        return pa.Table.from_pylist(rows, schema=CANONICAL_SCHEMA)
