"""Golden conformance corpus: the ``canMerge`` analog on oriented pairs.

The reference's primary test layer is its golden-file corpus
(``test/cases/sanity/*`` → expected ``'OK'`` or a joined
``MergeValidationError`` message, ``test/MergeUtilsMelinda.spec.js:133-135``).
The analog: planted pairs with expected verdict + reason list, checked
against ``verify_oriented_pairs``.
"""

import pandas as pd

from marc_record_merge_melindautils_ray.stages.verify import verify_oriented_pairs


def test_golden_pairs(corpus, small_cfg):
    clips, truth, golden = corpus
    out = verify_oriented_pairs(clips, golden, small_cfg)
    exp = golden.to_pandas().set_index("case")
    got = out.set_index("case")
    for case in exp.index:
        e, g = exp.loc[case], got.loc[case]
        assert bool(g["ok"]) == bool(e["expected_ok"]), (
            f"{case}: expected ok={e['expected_ok']}, got reasons={g['reasons']}"
        )
        # every expected reason must be among the accumulated reasons — the
        # reference concatenates ALL failing validators' messages
        # (lib/marc-record-merge-melindautils.js:98-118)
        for r in e["expected_reasons"]:
            assert r in list(g["reasons"]), f"{case}: missing reason {r} in {g['reasons']}"


def test_orientation_asymmetry(corpus, small_cfg):
    """V4 is direction-sensitive: priority source on the discard side fails,
    on the keep side passes (lib/mergeability-validators.js:69-81)."""
    import pyarrow as pa

    clips, _, _ = corpus
    df = clips.to_pandas()
    fenni = df[df["sources"].map(lambda s: s is not None and "FENNI" in list(s))]
    if fenni.empty:
        return
    a = fenni.iloc[0]["clip_id"]
    other = df[df["clip_id"] != a].iloc[0]["clip_id"]
    pairs = pa.Table.from_pylist(
        [{"case": "orient", "id_other": a, "id_preferred": other}]
    )
    out = verify_oriented_pairs(clips, pairs, small_cfg)
    assert "priority-source-orientation" in out.iloc[0]["reasons"]
    rev = pa.Table.from_pylist(
        [{"case": "orient-rev", "id_other": other, "id_preferred": a}]
    )
    out2 = verify_oriented_pairs(clips, rev, small_cfg)
    assert "priority-source-orientation" not in out2.iloc[0]["reasons"]


def test_diagnostics_column(corpus, small_cfg):
    """U16 checkForDiacritics + 245-superset STAT: diagnostic-only channel —
    present on every pair, never a merge gate
    (lib/marc-record-merge-melindautils.js:106-114, lib/record-utils.js:325-347)."""
    import pyarrow as pa

    clips, _, golden = corpus
    out = verify_oriented_pairs(clips, golden, small_cfg)
    assert "diagnostics" in out.columns
    # diagnostics never flip a verdict: an OK pair stays OK whatever they say
    for _, row in out.iterrows():
        assert row["ok"] == (len(row["reasons"]) == 0)
    # a pair where other has diacritics and preferred doesn't must report it
    df = clips.to_pandas()
    plain = df[df["transcript"].fillna("").map(
        lambda t: t != "" and not any(ord(c) > 126 and c not in "öäåÖÄÅ" for c in t))]
    a = plain.iloc[0]["clip_id"]
    pairs = pa.Table.from_pylist([{"case": "diag", "id_other": a, "id_preferred": a}])
    clips2 = clips.to_pandas()
    # synthesize: other transcript with diacritics vs preferred without
    row_a = clips2[clips2["clip_id"] == a].iloc[0].to_dict()
    row_b = dict(row_a, clip_id="diacritic-side", transcript=(row_a["transcript"] or "") + " café")
    both = pa.Table.from_pylist([row_a, row_b], schema=clips.schema)
    pairs = pa.Table.from_pylist(
        [{"case": "diag", "id_other": "diacritic-side", "id_preferred": a}]
    )
    out2 = verify_oriented_pairs(both, pairs, small_cfg)
    assert "diacritics-other" in list(out2.iloc[0]["diagnostics"])
