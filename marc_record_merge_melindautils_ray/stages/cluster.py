"""Stage 5: distributed connected components over verified duplicate edges.

Hash-to-min label propagation (Rastogi et al., "Finding Connected Components
in Map-Reduce in Logarithmic Rounds") expressed as Ray Data rounds:

    state: rows (node, member) — initially each edge both ways
    round: per node  mn = min(members ∪ {node})
           emit (member, mn), (mn, member), (node, mn)

Converges to star graphs centered at each component's minimum id in
O(log d) rounds (duplicate clusters are shallow, d is tiny).

Physical shape: nodes are re-keyed to ``part = hash(node) % P`` and each
round is ONE ``groupby('part').map_groups`` whose UDF handles every node of
the partition with vectorized pandas (``transform('min')``), plus a tiny
``sum`` for the convergence checksum — the partition-then-vectorize pattern
(see stages.candidates), not a per-node UDF.

The reference has no clustering at all (it is handed one pair at a time,
``lib/marc-record-merge-melindautils.js:74``); this stage is the outer layer
mandated by BASELINE.json ``north_rule``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions.hashing import splitmix64, stable_str_hash

NUM_CC_PARTS = 64


def _add_node_part(df: pd.DataFrame) -> pd.DataFrame:
    with np.errstate(over="ignore"):
        part = (splitmix64(stable_str_hash(df["node"].to_numpy())) % np.uint64(NUM_CC_PARTS))
    df = df.copy()
    df["part"] = part.astype(np.int64)
    return df


def _h2m_partition(g: pd.DataFrame) -> pd.DataFrame:
    """One round over one partition: vectorized min per node + emissions."""
    node = g["node"].to_numpy()
    member = g["member"].to_numpy()
    mn = np.minimum(g.groupby("node")["member"].transform("min").to_numpy(), node)
    out = pd.DataFrame({
        "node": np.concatenate([member, mn, node]),
        "member": np.concatenate([mn, member, mn]),
    }).drop_duplicates()
    # convergence checksum: one contribution per (node, label) of this round
    uniq = pd.DataFrame({"node": node, "mn": mn}).drop_duplicates("node")
    with np.errstate(over="ignore"):
        h = splitmix64(
            stable_str_hash(uniq["node"].to_numpy()) ^ stable_str_hash(uniq["mn"].to_numpy())
        ) % np.uint64(1 << 31)
    chk = np.zeros(len(out), dtype=np.int64)
    chk[0] = int(h.sum(dtype=np.uint64) & np.uint64((1 << 62) - 1))
    out["chk_part"] = chk
    return out


def _labels_partition(g: pd.DataFrame) -> pd.DataFrame:
    mn = np.minimum(g.groupby("node")["member"].transform("min").to_numpy(),
                    g["node"].to_numpy())
    out = pd.DataFrame({"clip_id": g["node"].to_numpy(), "cluster_id": mn})
    out = out.drop_duplicates("clip_id")
    out["cluster_id"] = "cl-" + out["cluster_id"]
    return out


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
        state = (
            state.map_batches(_add_node_part, batch_format="pandas")
            .groupby("part")
            .map_groups(_h2m_partition, batch_format="pandas")
            .materialize()
        )
        chk = int(state.sum("chk_part") or 0)
        if chk == prev_chk:
            break
        prev_chk = chk

    return (
        state.map_batches(_add_node_part, batch_format="pandas")
        .groupby("part")
        .map_groups(_labels_partition, batch_format="pandas")
    )
