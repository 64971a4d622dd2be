"""Stage 5: distributed connected components over verified duplicate edges.

Hash-to-min label propagation (Rastogi et al., "Finding Connected Components
in Map-Reduce in Logarithmic Rounds") expressed purely as Ray Data
``groupby().map_groups`` rounds — no driver-side union-find, no joins:

    state: rows (node, member) — initially each edge both ways + self-loops
    round: per node group  mn = min(members ∪ {node})
           emit (u, mn) for every u in group  and  (mn, u) for every u

Converges to star graphs centered at each component's minimum id in
O(log d) rounds (duplicate clusters are shallow, d is tiny).  Each round is
exactly ONE shuffle + one tiny ``sum``: the per-group label checksum rides
along as a column emitted on one row per group, so convergence detection
costs no extra groupby pass.

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
    out_node: list[str] = [node]
    out_member: list[str] = [mn]
    for u in members:
        if u != node:
            out_node.append(u)
            out_member.append(mn)
        if u != mn:
            out_node.append(mn)
            out_member.append(u)
    df = pd.DataFrame({"node": out_node, "member": out_member}).drop_duplicates()
    # label checksum contribution for THIS group: hash(node, label=mn),
    # attached to the first emitted row only
    chk = np.zeros(len(df), dtype=np.int64)
    chk[0] = int(
        splitmix64(stable_str_hash([node]) ^ stable_str_hash([mn]))[0] % np.uint64(1 << 31)
    )
    df["chk_part"] = chk
    return df


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
        state = state.groupby("node").map_groups(
            _h2m_round, batch_format="pandas"
        ).materialize()
        chk = int(state.sum("chk_part") or 0)
        if chk == prev_chk:
            break
        prev_chk = chk

    def labels(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].iloc[0]
        mn = min(g["member"].min(), node)
        return pd.DataFrame({"clip_id": [node], "cluster_id": [f"cl-{mn}"]})

    return state.groupby("node").map_groups(labels, batch_format="pandas")
