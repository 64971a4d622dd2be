"""U22 ``toAuthorityQueryObject`` — FULL semantics (closes the last
documented narrowing).

The reference builds the authority-lookup query from a record's name field
with PER-TAG subfield whitelists and throws when a record carries more than
one name field (``/root/reference/lib/record-utils.js:31-66``):

* 100 (person):  subfields ``a b c d g j q``
* 110 (org):     subfields ``a b c d g n``
* 111 (meeting): subfields ``a c d e g n q``
* (700/710/711 share the 100/110/111 lists — added entries)
* name = whitelisted subfield VALUES joined with a single space, in field
  order; non-whitelisted subfields are silently dropped
* >1 name field ⇒ ``mergeError('Record has multiple names: …')``
* 0 name fields ⇒ no query object (None)

The clip schema's optional ``author_parts`` column carries the subfield dict
(``{"tag": "100", "subfields": [{"code": "a", "value": "…"}, …]}``-shaped
rows, or several of them); corpora that only have the flat
``author_label``/``author_type`` pair keep using the collapsed path in
``functions.textnorm.normalize_author_key`` — this module is the faithful
kernel for corpora that preserve subfield structure.
"""

from __future__ import annotations

AUTHOR_QUERY_SUBFIELDS: dict[str, tuple[str, ...]] = {
    "100": tuple("abcdgjq"),
    "110": tuple("abcdgn"),
    "111": tuple("acdegnq"),
    "700": tuple("abcdgjq"),
    "710": tuple("abcdgn"),
    "711": tuple("acdegnq"),
}

NAME_TAGS = ("100", "110", "111")


class MultipleNamesError(ValueError):
    """The reference's ``mergeError('Record has multiple names: …')``."""


def is_author_query_subfield(tag: str, code: str) -> bool:
    """``record-utils.js:40-44``: unknown tag → False, else whitelist test."""
    allowed = AUTHOR_QUERY_SUBFIELDS.get(tag)
    return allowed is not None and code in allowed


def to_authority_query(fields: list[dict]) -> dict | None:
    """``record-utils.js:46-66``: filter to the 100/110/111 name fields,
    project each through its tag's subfield whitelist, join values with a
    space; exactly one name field may exist.

    ``fields``: list of ``{"tag": str, "subfields": [{"code", "value"}]}``
    dicts (the structured ``author_parts`` cell).  Returns
    ``{"tag", "name"}`` or None when the record has no name field."""
    name_fields = [f for f in (fields or []) if f.get("tag") in NAME_TAGS]
    query_objects = [
        {
            "tag": f["tag"],
            "name": " ".join(
                sub.get("value") or ""
                for sub in (f.get("subfields") or [])
                if is_author_query_subfield(f["tag"], sub.get("code") or "")
            ),
        }
        for f in name_fields
    ]
    if len(query_objects) > 1:
        raise MultipleNamesError(
            "Record has multiple names: "
            + ",".join(o["name"] for o in query_objects)
        )
    return query_objects[0] if query_objects else None
