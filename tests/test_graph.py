"""Triangle counting: hand-verifiable corpora (one shared bucket = a known
clique), the pair-emission kernel, and the hub guard."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marc_record_merge_melindautils_ray.ops.graph import (
    pairs_within_groups,
    q_triangle_count,
)


def test_pairs_within_groups_kernel():
    vals = np.array([1, 2, 3, 7, 8, 9, 9], np.int64)
    gids = np.array([0, 0, 0, 1, 1, 2, 2], np.int64)
    a, b = pairs_within_groups(vals, gids)
    assert list(zip(a.tolist(), b.tolist())) == [
        (1, 2), (1, 3), (2, 3), (7, 8), (9, 9)]
    a0, b0 = pairs_within_groups(np.empty(0, np.int64), np.empty(0, np.int64))
    assert len(a0) == 0 and len(b0) == 0


def _events(rows):
    return pa.table({
        "event_id": pa.array(np.arange(len(rows)), pa.int64()),
        "ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })


def test_triangle_count_constructed(ray_session, tmp_path):
    """Users 1-4 share one (type, hour) bucket → K4 = 6 edges, 4 triangles;
    user 5 shares a DIFFERENT hour with 1 and 2 (adds edge set {1-5, 2-5},
    edge 1-2 already present) → one extra triangle (1,2,5).  Total: 8
    edges, 5 triangles, 5 nodes."""
    h0, h1 = 0, 3_600_000_000
    rows = ([(u, h0 + u, "click") for u in (1, 2, 3, 4)]
            + [(u, h1 + u, "view") for u in (1, 2, 5)])
    pq.write_table(_events(rows), str(tmp_path / "events.parquet"))
    out = q_triangle_count(str(tmp_path))
    assert out.values.tolist() == [[5, 8, 5]]


def test_triangle_count_hub_guard(ray_session, tmp_path):
    rows = [(u, u, "click") for u in range(50)]   # one 50-user bucket
    pq.write_table(_events(rows), str(tmp_path / "events.parquet"))
    with pytest.raises(Exception, match="hub_guard"):
        q_triangle_count(str(tmp_path), hub_guard=10)
    # within the guard the 50-clique counts C(50,3) exactly
    out = q_triangle_count(str(tmp_path), hub_guard=64)
    assert out.values.tolist() == [[50, 50 * 49 // 2, 50 * 49 * 48 // 6]]


def test_pagerank_matches_dense_power_iteration(ray_session, tmp_path):
    """Distributed PageRank equals the dense numpy power iteration on the
    same graph to micro precision, and is bit-identical across block
    layouts (sorted-before-sum float determinism)."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.graph import (
        pagerank_edges,
        q_pagerank,
    )

    # path + triangle graph: 1-2, 2-3, 3-4, 4-1, 1-3 (degrees 3,2,3,2)
    e = pa.table({"a": pa.array([1, 2, 3, 1, 1], pa.int64()),
                  "b": pa.array([2, 3, 4, 4, 3], pa.int64())})
    got = pagerank_edges(rd.from_arrow(e), nparts=4, n_iters=12)

    nodes = [1, 2, 3, 4]
    deg = {1: 3, 2: 2, 3: 3, 4: 2}
    M = np.zeros((4, 4))
    for a, b in [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)]:
        M[nodes.index(b), nodes.index(a)] = 1.0 / deg[a]
        M[nodes.index(a), nodes.index(b)] = 1.0 / deg[b]
    r = np.full(4, 0.25)
    for _ in range(12):
        r = 0.15 / 4 + 0.85 * (M @ r)
    want = np.floor(r * 1e6 + 0.5).astype(np.int64)
    assert got.user_id.tolist() == nodes
    assert got.rank_micro.to_numpy().tolist() == want.tolist()
    assert abs(got.rank_micro.sum() - 1_000_000) <= 4   # ranks sum to 1

    # layout invariance: edges split across two blocks
    got2 = pagerank_edges(
        rd.from_arrow(e.slice(0, 2)).union(rd.from_arrow(e.slice(2))),
        nparts=4, n_iters=12)
    pd.testing.assert_frame_equal(got, got2)


def test_triangle_count_wedge_guard(ray_session, tmp_path):
    """Exact triangle counting on a too-dense graph raises the visible
    work bound instead of OOMing."""
    rows = [(u, u, "click") for u in range(30)]   # 30-clique
    pq.write_table(_events(rows), str(tmp_path / "events.parquet"))
    with pytest.raises(Exception, match="max_wedges"):
        q_triangle_count(str(tmp_path), max_wedges=100)
