"""Distributed connected components (hash-to-min) correctness."""

import pandas as pd
import pytest

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.stages.cluster import connected_components


def _cc(edges, ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    out = connected_components(ds, DedupConfig()).to_pandas()
    return dict(zip(out["clip_id"], out["cluster_id"]))


def test_two_components(ray_session):
    labels = _cc([("a", "b"), ("b", "c"), ("x", "y")], ray_session)
    assert labels["a"] == labels["b"] == labels["c"] == "cl-a"
    assert labels["x"] == labels["y"] == "cl-x"
    assert labels["a"] != labels["x"]


def test_long_chain_converges(ray_session):
    # 40-node path: stresses the O(log d) round bound
    nodes = [f"n{i:03d}" for i in range(40)]
    labels = _cc(list(zip(nodes, nodes[1:])), ray_session)
    assert set(labels.values()) == {"cl-n000"}
    assert len(labels) == 40


def test_determinism(ray_session):
    edges = [("d", "c"), ("b", "a"), ("c", "b"), ("p", "q")]
    l1 = _cc(edges, ray_session)
    l2 = _cc(list(reversed(edges)), ray_session)
    assert l1 == l2


def test_local_fast_path_matches_distributed(ray_session):
    """The size-guarded local union-find must produce byte-identical labels
    to the distributed hash-to-min rounds (incl. long chains)."""
    import pandas as pd
    import ray.data as rd

    from marc_record_merge_melindautils_ray.config import DedupConfig
    from marc_record_merge_melindautils_ray.stages.cluster import connected_components

    # a 12-node chain + a star + isolated pairs
    edges = [("n%02d" % i, "n%02d" % (i + 1)) for i in range(11)]
    edges += [("s00", "s%02d" % i) for i in range(1, 5)]
    edges += [("p10", "p11"), ("p20", "p21")]
    df = pd.DataFrame(edges, columns=["id_a", "id_b"])
    ds = rd.from_pandas(df)
    cfg = DedupConfig()
    local = connected_components(ds, cfg, n_edges=len(df)).to_pandas()
    dist = connected_components(ds, cfg).to_pandas()  # no n_edges → distributed
    local = local.sort_values("clip_id").reset_index(drop=True)
    dist = dist.sort_values("clip_id").reset_index(drop=True)
    assert local.equals(dist)
    assert local[local["clip_id"] == "n11"]["cluster_id"].iloc[0] == "cl-n00"
