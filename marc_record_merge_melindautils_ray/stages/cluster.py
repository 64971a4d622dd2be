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


def adaptive_parts(n_rows: int, rows_per_part: int = 20000, lo: int = 8, hi: int = 256) -> int:
    """Partition count sized to the data: tiny inputs get few partitions (a
    64-way shuffle of 45k rows is pure overhead — measured slower at MORE
    cpus), huge inputs scale up to ``hi`` (cluster-core order).  The ``lo``
    floor (callers pass ~2× cluster cores for data-sized shuffles) is itself
    capped so a partition never holds fewer than ~500 rows — a 64-way shuffle
    of a 5k-row table is launch latency, not parallelism."""
    return int(min(hi, max(1, n_rows // 500), max(lo, n_rows // rows_per_part)))


def cluster_parallelism(default: int = 8) -> int:
    """Available cluster CPU count (the fan-out floor for data-sized
    shuffles: fewer partitions than ~2× cores leaves task slots idle on the
    partition-then-vectorize stages — measured as a 30 % headline regression
    when a row-derived count undershot a 32-cpu box)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default)) or default
    except Exception:
        pass
    return default


def actor_pool_size(
    lo: int = 2, hi: int = 16, rows: int | None = None, rows_per_actor: int = 2000
) -> int:
    """Actor-pool width for corpus-scale broadcast-lookup/filter stages:
    half the cluster cores, clamped — a frozen ``concurrency=2`` throttles a
    32-cpu box, while one actor per core over-subscribes the stages that run
    concurrently with shuffles.

    Pass ``rows`` when the caller knows the stage's input size (metadata-cheap
    on parquet reads, already-counted elsewhere): spinning a 16-process pool
    for a 5k-row table costs more in actor startup than the kernels themselves
    (the phase-2 verify lesson, ``pipelines/dedup.py``); ~``rows_per_actor``
    rows keep one actor busy for roughly a second."""
    cap = hi if rows is None else max(lo, min(hi, rows // rows_per_actor))
    return max(lo, min(cap, cluster_parallelism() // 2))


def _add_node_part(df: pd.DataFrame, num_parts: int = NUM_CC_PARTS) -> pd.DataFrame:
    with np.errstate(over="ignore"):
        part = (splitmix64(stable_str_hash(df["node"].to_numpy())) % np.uint64(num_parts))
    df = df.copy()
    df["part"] = part.astype(np.int64)
    return df


def _make_h2m(num_parts: int):
    def h2m_partition(g: pd.DataFrame) -> pd.DataFrame:
        """One round over one partition: vectorized min per node + emissions.
        The NEXT round's partition key is computed here too — fusing it saves
        a separate map stage (a barrier's worth of task latency) per round."""
        node = g["node"].to_numpy()
        member = g["member"].to_numpy()
        mn = np.minimum(g.groupby("node")["member"].transform("min").to_numpy(), node)
        out = pd.DataFrame({
            "node": np.concatenate([member, mn, node]),
            "member": np.concatenate([mn, member, mn]),
        }).drop_duplicates()
        with np.errstate(over="ignore"):
            out["part"] = (
                splitmix64(stable_str_hash(out["node"].to_numpy()))
                % np.uint64(num_parts)
            ).astype(np.int64)
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

    return h2m_partition


def _labels_partition(g: pd.DataFrame) -> pd.DataFrame:
    mn = np.minimum(g.groupby("node")["member"].transform("min").to_numpy(),
                    g["node"].to_numpy())
    out = pd.DataFrame({"clip_id": g["node"].to_numpy(), "cluster_id": mn})
    out = out.drop_duplicates("clip_id")
    out["cluster_id"] = "cl-" + out["cluster_id"]
    return out


def _local_cc_batch(df: pd.DataFrame) -> pd.DataFrame:
    """In-memory connected components over one edge batch — the small-side
    fast path of ``connected_components``.  Fully vectorized label
    propagation with pointer jumping (O(log n) numpy passes; a Python
    union-find loop measured 15 s at 10^6 edges).  Same label contract:
    cluster_id = ``cl-<minimum member id>``."""
    ids = pd.concat([df["id_a"], df["id_b"]], ignore_index=True).to_numpy()
    uniq, inverse = np.unique(ids, return_inverse=True)
    n_edges = len(df)
    a_idx, b_idx = inverse[:n_edges], inverse[n_edges:]
    label = np.arange(len(uniq), dtype=np.int64)
    while True:
        new = label.copy()
        mn = np.minimum(label[a_idx], label[b_idx])
        np.minimum.at(new, a_idx, mn)   # scatter-min both edge endpoints
        np.minimum.at(new, b_idx, mn)
        new = new[new]                  # pointer jumping halves tree depth
        if np.array_equal(new, label):
            break
        label = new
    # uniq is sorted, so the minimum label index IS the minimum member id
    return pd.DataFrame({"clip_id": uniq, "cluster_id": "cl-" + pd.Series(uniq[label])})


def connected_components(
    edges: rd.Dataset, cfg: DedupConfig, n_edges: int | None = None
) -> rd.Dataset:
    """edges: Dataset with string columns (id_a, id_b) — verified dup pairs.

    Returns Dataset (clip_id, cluster_id) covering every node that appears in
    an edge; cluster_id = ``cl-<minimum member id>`` (deterministic).
    ``n_edges`` (if the caller already knows it) sizes the round partition
    count adaptively.
    """
    # SMALL-SIDE FAST PATH (explicit, size-guarded — the CC analog of
    # broadcast-vs-shuffle join selection): below the threshold the whole
    # edge set fits one task, where per-round groupby shuffles are pure
    # latency (measured 4-6 s for 45 k edges vs <1 s local).  The
    # distributed hash-to-min path below is the documented scale fallback
    # and produces identical labels.
    if n_edges is not None and 0 < n_edges <= cfg.cc_local_max_edges:
        return (
            edges.repartition(1)
            .map_batches(_local_cc_batch, batch_format="pandas", batch_size=None)
        )

    num_parts = adaptive_parts(2 * n_edges) if n_edges else NUM_CC_PARTS
    _h2m_partition = _make_h2m(num_parts)

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        return _add_node_part(
            pd.DataFrame(
                {
                    "node": pd.concat([df["id_a"], df["id_b"]], ignore_index=True),
                    "member": pd.concat([df["id_b"], df["id_a"]], ignore_index=True),
                }
            ),
            num_parts,
        )

    state = edges.map_batches(seed, batch_format="pandas")
    prev_chk = None
    for _ in range(cfg.max_cc_rounds):
        # rounds carry their own next-round part column, so each round is
        # exactly one groupby+map_groups execution plus the (block-metadata
        # cheap) checksum aggregate over the materialized output
        state = (
            state.groupby("part")
            .map_groups(_h2m_partition, batch_format="pandas")
            .materialize()
        )
        chk = int(state.sum("chk_part") or 0)
        if chk == prev_chk:
            break
        prev_chk = chk

    return state.groupby("part").map_groups(_labels_partition, batch_format="pandas")
