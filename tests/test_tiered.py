"""Tiered dedup (exact → MinHash near → embedding semantic): planted
families, per-tier attribution, and cross-tier keeper-chain resolution."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk_docs_emb(rng):
    """Planted corpus:
    - 11 exact-dup of 10; 10 near-dup of 20 (keeper 10 < 20 — 20 removed)
    - chain: 31 exact-dup of 30; 30 near-dup of 5 → 31's final keeper is 5
    - 41 semantic-dup of 40 (same embedding + noise, unrelated text)
    - fillers: unique word-soup text + random unit embeddings
    """
    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "green turtles slowly carry baskets of ripe autumn apples "
            "across the old wooden bridge near the quiet northern village")
    near = base.replace("apples", "pears")
    chain_base = ("every morning the lighthouse keeper counts forty two "
                  "silver boats drifting past the rocky shore and writes "
                  "their names into a heavy leather bound journal page")
    chain_near = chain_base.replace("silver", "golden")

    words = ["alpha", "bravo", "cedar", "delta", "ember", "falcon", "gravel",
             "harbor", "indigo", "jasper", "kettle", "lumen", "marble",
             "nectar", "onyx", "prairie", "quartz", "russet", "saffron",
             "timber", "umber", "velvet", "walnut", "xenon", "yarrow", "zephyr"]
    ids, texts = [], []
    for i in range(50):
        ids.append(i)
        if i == 5:
            texts.append(chain_base)
        elif i == 10 or i == 11:
            texts.append(base)
        elif i == 20:
            texts.append(near)
        elif i == 30 or i == 31:
            texts.append(chain_near)
        else:
            picks = rng.choice(words, size=12, replace=True)
            texts.append(" ".join(f"{w}{j}{i}" for j, w in enumerate(picks)))
    docs = pd.DataFrame({"doc_id": np.array(ids, np.int64), "text": texts})

    dim = 64
    emb = rng.normal(size=(50, dim))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb[41] = emb[40] + rng.normal(scale=0.01, size=dim)
    emb[41] /= np.linalg.norm(emb[41])
    lists = pa.FixedSizeListArray.from_arrays(
        pa.array(emb.astype(np.float32).reshape(-1)), dim
    ).cast(pa.list_(pa.float32()))
    emb_t = pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": lists})
    return docs, emb_t


@pytest.fixture(scope="module")
def tiered_out(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.tiered import tiered_dedup

    rng = np.random.default_rng(42)
    docs, emb_t = _mk_docs_emb(rng)
    metrics = {}
    out = tiered_dedup(
        rd.from_pandas(docs), rd.from_arrow(emb_t),
        sim_threshold_permille=600, metrics=metrics,
    )
    return out.set_index("doc_id"), metrics


def test_tier_attribution(tiered_out):
    out, metrics = tiered_out
    assert out.loc[11, "tier"] == "exact"
    assert out.loc[31, "tier"] == "exact"
    assert out.loc[20, "tier"] == "near"
    assert out.loc[30, "tier"] == "near"
    assert out.loc[41, "tier"] == "semantic"
    for kept in (5, 10, 40):
        assert out.loc[kept, "tier"] == "kept"
    assert metrics["removed_exact"] == 2
    assert metrics["removed_near"] == 2
    assert metrics["removed_semantic"] == 1
    assert metrics["n_kept"] == 45


def test_keeper_chain_resolution(tiered_out):
    """31 was removed at exact with keeper 30; 30 was removed at near with
    keeper 5 — the union-CC pass must resolve 31's final keeper to 5."""
    out, _ = tiered_out
    assert out.loc[31, "kept_by"] == 5
    assert out.loc[30, "kept_by"] == 5
    assert out.loc[11, "kept_by"] == 10
    assert out.loc[20, "kept_by"] == 10
    assert out.loc[41, "kept_by"] == 40
    # kept docs point at themselves
    kept = out[out["tier"] == "kept"]
    assert (kept["kept_by"] == kept.index).all()
    # every keeper is itself kept (never removed at any tier)
    assert set(out["kept_by"]) <= set(kept.index)


def test_no_embeddings_skips_semantic(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.tiered import tiered_dedup

    rng = np.random.default_rng(42)
    docs, _ = _mk_docs_emb(rng)
    m = {}
    out = tiered_dedup(rd.from_pandas(docs), None, metrics=m).set_index("doc_id")
    assert m["removed_semantic"] == 0
    assert out.loc[41, "tier"] == "kept"
    assert out.loc[31, "kept_by"] == 5  # chain still resolves without tier 3


def test_all_unique_corpus(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.tiered import tiered_dedup

    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [
            "red kites circle the tower", "barges drift under the iron span",
            "nine owls hooted at midnight", "the mill wheel creaks in rain",
            "salt wind bends the dune grass", "a tin kettle sings on the stove",
            "frost etched ferns on the pane", "lantern light spills down the well",
        ],
    })
    m = {}
    out = tiered_dedup(rd.from_pandas(docs), None, metrics=m)
    assert m["n_kept"] == 8 and (out["tier"] == "kept").all()
    assert (out["kept_by"].to_numpy() == out["doc_id"].to_numpy()).all()
