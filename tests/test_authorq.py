"""U22 toAuthorityQueryObject — full per-tag whitelist + multiple-names
semantics (record-utils.js:31-66)."""

import pytest

from marc_record_merge_melindautils_ray.functions.authorq import (
    AUTHOR_QUERY_SUBFIELDS,
    MultipleNamesError,
    is_author_query_subfield,
    to_authority_query,
)


def _f(tag, *pairs):
    return {"tag": tag, "subfields": [{"code": c, "value": v} for c, v in pairs]}


def test_per_tag_whitelists_differ():
    # 'j' is a person-name (100) subfield but NOT an org (110) one; 'n' the
    # reverse — the exact distinction the collapsed author_label path lost
    assert is_author_query_subfield("100", "j")
    assert not is_author_query_subfield("110", "j")
    assert is_author_query_subfield("110", "n")
    assert not is_author_query_subfield("100", "n")
    assert is_author_query_subfield("111", "e")
    assert not is_author_query_subfield("100", "e")
    # unknown tag → never a query subfield
    assert not is_author_query_subfield("245", "a")


def test_projection_joins_whitelisted_values_in_order():
    q = to_authority_query([
        _f("100", ("a", "Virtanen, Ville"), ("d", "1970-"), ("x", "NOISE"),
           ("q", "(V.V.)")),
    ])
    assert q == {"tag": "100", "name": "Virtanen, Ville 1970- (V.V.)"}


def test_org_and_meeting_tags():
    assert to_authority_query([_f("110", ("a", "Yhtiö"), ("n", "2"), ("j", "drop"))]) \
        == {"tag": "110", "name": "Yhtiö 2"}
    assert to_authority_query([_f("111", ("a", "Kokous"), ("e", "jaosto"))]) \
        == {"tag": "111", "name": "Kokous jaosto"}


def test_non_name_fields_ignored_and_none_when_absent():
    assert to_authority_query([_f("245", ("a", "Title"))]) is None
    assert to_authority_query([]) is None
    assert to_authority_query(None) is None


def test_multiple_names_throw():
    with pytest.raises(MultipleNamesError, match="multiple names"):
        to_authority_query([
            _f("100", ("a", "One")), _f("110", ("a", "Two")),
        ])


def test_700_family_shares_whitelists():
    for main, added in (("100", "700"), ("110", "710"), ("111", "711")):
        assert AUTHOR_QUERY_SUBFIELDS[main] == AUTHOR_QUERY_SUBFIELDS[added]
