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
