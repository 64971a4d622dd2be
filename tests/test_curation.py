"""Curation cascade: each gate rejects for its own reason, keeper picks
min doc_id among SURVIVORS (not the global min), eval-slice docs never
appear in the output."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from marc_record_merge_melindautils_ray.ops.curation import q_curation_pipeline


def _mk(ch: str, n: int) -> str:
    """n copies of an all-alpha 5-char token: alpha_permille = 5n/(6n-1)
    ≈ 836 — inside the [800, 900] quality band."""
    return " ".join([ch * 5] * n)


def test_curation_gates(ray_session, tmp_path):
    good = _mk("b", 40)
    rows = {
        1: good,                                  # survivor (dup keeper)
        2: good,                                  # dup of 1 → dropped
        5: _mk("d", 10),                          # too few tokens
        6: " ".join(["12345"] * 40),              # alpha band fail
        3: _mk("e", 40),                          # eval slice (3 % 19 == 3)
        8: _mk("f", 30) + " " + _mk("e", 12),     # quality-ok, shares the
        #   8-run of eval words → decontaminated out
        9: _mk("g", 31),                          # independent survivor
    }
    t = pa.table({
        "doc_id": pa.array(list(rows), pa.int64()),
        "text": pa.array(list(rows.values()), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_curation_pipeline(str(tmp_path))
    assert out.doc_id.tolist() == [1, 9]
    assert out.set_index("doc_id").loc[1, "n_tokens"] == 40


def test_curation_keeper_is_min_surviving(ray_session, tmp_path):
    """If the global-min doc_id of a text group fails quality, the keeper
    is the min SURVIVING id — the composition is quality-then-dedup."""
    good = _mk("b", 40)
    t = pa.table({
        # doc 3 is the eval-slice member (3 % 19 == 3) with unrelated text
        "doc_id": pa.array([3, 4, 10], pa.int64()),
        "text": pa.array([_mk("z", 40), good, good], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_curation_pipeline(str(tmp_path))
    assert out.doc_id.tolist() == [4]
