"""Stage 5: distributed connected components over verified duplicate edges.

Hash-to-min label propagation (Rastogi et al., "Finding Connected Components
in Map-Reduce in Logarithmic Rounds") expressed purely as Ray Data
``groupby().map_groups`` rounds — no driver-side union-find, no joins:

    state: rows (node, member) — initially each edge both ways + self-loops
    round: per node group  mn = min(members ∪ {node})
           emit (u, mn) for every u in group  and  (mn, u) for every u

Converges to star graphs centered at each component's minimum id in
O(log d) rounds (duplicate clusters are shallow, d is tiny).  Convergence is
detected by a per-round label checksum (a tiny ``sum`` aggregate) — no
full-dataset comparison, no driver materialization.

The reference has no clustering at all (it is handed one pair at a time,
``lib/marc-record-merge-melindautils.js:74``); this stage is the outer layer
mandated by BASELINE.json ``north_rule``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions.hashing import splitmix64, stable_str_hash


def _h2m_round(g: pd.DataFrame) -> pd.DataFrame:
    node = g["node"].iloc[0]
    members = pd.unique(g["member"])
    mn = min(members.min(), node)
    out_node: list[str] = []
    out_member: list[str] = []
    for u in members:
        out_node.append(u)
        out_member.append(mn)
        if u != mn:
            out_node.append(mn)
            out_member.append(u)
    if node != mn:
        out_node.append(node)
        out_member.append(mn)
    df = pd.DataFrame({"node": out_node, "member": out_member})
    return df.drop_duplicates()


def _label_checksum(ds: rd.Dataset) -> int:
    def chk(df: pd.DataFrame) -> pd.DataFrame:
        h = splitmix64(
            stable_str_hash(df["node"].to_numpy())
            ^ stable_str_hash(df["label"].to_numpy())
        )
        return pd.DataFrame({"chk": (h % np.uint64(1 << 31)).astype(np.int64)})

    return int(ds.map_batches(chk, batch_format="pandas").sum("chk") or 0)


def connected_components(edges: rd.Dataset, cfg: DedupConfig) -> rd.Dataset:
    """edges: Dataset with string columns (id_a, id_b) — verified dup pairs.

    Returns Dataset (clip_id, cluster_id) covering every node that appears in
    an edge; cluster_id = ``cl-<minimum member id>`` (deterministic).
    """

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([df["id_a"], df["id_b"]], ignore_index=True),
                "member": pd.concat([df["id_b"], df["id_a"]], ignore_index=True),
            }
        )

    state = edges.map_batches(seed, batch_format="pandas")
    prev_chk = None
    for _ in range(cfg.max_cc_rounds):
        state = state.groupby("node").map_groups(_h2m_round, batch_format="pandas")
        labels = state.groupby("node").map_groups(
            lambda g: pd.DataFrame(
                {"node": [g["node"].iloc[0]],
                 "label": [min(g["member"].min(), g["node"].iloc[0])]}
            ),
            batch_format="pandas",
        )
        labels = labels.materialize()  # small: one row per clustered node
        chk = _label_checksum(labels)
        if chk == prev_chk:
            break
        prev_chk = chk
        state = state.materialize()  # pin converged-so-far state for next round

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"clip_id": df["node"], "cluster_id": "cl-" + df["label"].astype(str)}
        )

    return labels.map_batches(finalize, batch_format="pandas")
