"""Pair-level dedup quality metrics — the evaluation harness the north star
grades on (dup-pair recall ≥ 0.99), exposed as an operator so every run can
self-report against a labeled corpus instead of burying the check in tests.

All counts are exact and vectorized: pair counts per (cluster, family) cell
come from group sizes (Σ C(n,2)), never from materialized pair lists — the
evaluation costs O(rows), not O(pairs), so it scales to corpora whose pair
set would never fit anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _pairs(n: pd.Series) -> pd.Series:
    return n * (n - 1) // 2


def dup_pair_metrics(assignments: pd.DataFrame, truth: pd.DataFrame) -> pd.DataFrame:
    """One-row exact pair-level metrics.

    ``assignments``: (clip_id, cluster_id) — clustered clips only.
    ``truth``: (clip_id, truth_cluster) — ``truth_cluster`` null/None for
    non-duplicate rows.

    recall    = same-cluster truth pairs / all truth pairs
    precision = same-cluster truth pairs / all same-cluster pairs
    (permille, floor — exact integers, no float comparison surprises)
    """
    t = truth.dropna(subset=["truth_cluster"])
    truth_pairs = int(_pairs(t.groupby("truth_cluster").size()).sum())
    cluster_pairs = int(_pairs(assignments.groupby("cluster_id").size()).sum())
    m = assignments.merge(t, on="clip_id", how="inner")
    hit_pairs = int(
        _pairs(m.groupby(["cluster_id", "truth_cluster"]).size()).sum()
    )
    bad_clusters = int(
        (m.groupby("cluster_id")["truth_cluster"].nunique() > 1).sum()
    )
    return pd.DataFrame({
        "truth_pairs": [np.int64(truth_pairs)],
        "cluster_pairs": [np.int64(cluster_pairs)],
        "hit_pairs": [np.int64(hit_pairs)],
        "recall_permille": [np.int64(1000 * hit_pairs // max(truth_pairs, 1))],
        "precision_permille": [np.int64(1000 * hit_pairs // max(cluster_pairs, 1))],
        "clusters": [np.int64(assignments["cluster_id"].nunique()
                              if len(assignments) else 0)],
        "cross_family_clusters": [np.int64(bad_clusters)],
    })
