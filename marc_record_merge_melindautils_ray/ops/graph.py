"""Distributed graph analytics over a derived co-activity graph.

Nodes are users; an edge joins two users who were active in the same
(event_type, hour) bucket.  Triangle counting runs the classic
degree-ordered node-iterator algorithm — the MapReduce-era formulation
whose wedge work per node is bounded by orienting every edge from the
LOWER-(degree, id) endpoint to the higher one (a hub of degree d only
*receives* wedges from its low-degree neighbors instead of emitting
C(d,2) of them), the standard skew mitigation for power-law graphs.

Every stage is an explicit exchange with bounded payloads:

1. bucket dedup per batch → (bucket, user) rows, one groupby co-locates
   each bucket, pair emission per group (guarded: an over-``hub_guard``
   bucket raises — exact semantics forbid silent drops, same contract as
   the exact n-gram query);
2. edge dedup + degree computation = two key-hash exchanges of
   (int64, int64) rows — no strings, no payloads;
3. degree attach is ONE role-tagged shuffle (the asof-join idiom): edge
   endpoints and degree rows co-partition by node, each endpoint picks up
   its degree vectorized;
4. wedges per oriented source node join the oriented-edge set by wedge
   key in one final role-tagged exchange; per-partition membership is a
   sorted ``searchsorted`` probe.

Output is the (nodes, edges, triangles) summary row — every triangle
counted exactly once (orientation makes the wedge→edge join injective).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.ops.relational import _read
from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

_HOUR_US = 3_600_000_000


def pairs_within_groups(vals: np.ndarray, gids: np.ndarray
                        ) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs (vals[i], vals[j]) with i<j inside each group —
    fully vectorized (``vals`` must be sorted by ``gids`` then value).
    The follower-count construction: element at local position p of a
    size-s group pairs as the left side with its s−1−p followers."""
    n = len(vals)
    if n == 0:
        return np.empty(0, vals.dtype), np.empty(0, vals.dtype)
    new_g = np.r_[True, gids[1:] != gids[:-1]]
    starts = np.flatnonzero(new_g)
    gidx = np.cumsum(new_g) - 1
    local = np.arange(n) - starts[gidx]
    sizes = np.diff(np.r_[starts, n])
    fol = sizes[gidx] - 1 - local
    total = int(fol.sum())
    if total == 0:
        return np.empty(0, vals.dtype), np.empty(0, vals.dtype)
    a = np.repeat(np.arange(n), fol)
    cs = np.cumsum(fol)
    b = a + (np.arange(total) - np.repeat(cs - fol, fol)) + 1
    return vals[a], vals[b]


def coactivity_edges(sf_dir: str, nparts: int,
                     hub_guard: int = 65_536) -> rd.Dataset:
    """Distinct undirected edges (a, b) with a<b of the user co-activity
    graph (users sharing an (event_type, hour) bucket) — the shared graph
    derivation under triangle counting and PageRank.  One bucket-key
    exchange for hub-guarded pair emission + one edge-key exchange for
    dedup; MATERIALIZED (both consumers iterate it)."""
    from marc_record_merge_melindautils_ray.functions.hashing import (
        splitmix64,
        stable_str_hash,
    )

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def bucket_rows(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"], np.int64)
        h = (np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
             // _HOUR_US)
        th = stable_str_hash(t["event_type"]).view(np.int64)
        bkey = (splitmix64(th.view(np.uint64) ^ h.view(np.uint64))
                .view(np.int64))
        key = np.stack([bkey, u], axis=1)
        uniq = np.unique(key, axis=0)
        part = (uniq[:, 0].view(np.uint64) % np.uint64(nparts)).astype(np.int64)
        return pa.table({
            "bkey": pa.array(uniq[:, 0], pa.int64()),
            "user": pa.array(uniq[:, 1], pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        key = np.stack([g["bkey"].to_numpy(np.int64),
                        g["user"].to_numpy(np.int64)], axis=1)
        uniq = np.unique(key, axis=0)           # sorted by (bkey, user)
        gids, users = uniq[:, 0], uniq[:, 1]
        sizes = np.diff(np.r_[np.flatnonzero(np.r_[True, gids[1:] != gids[:-1]]),
                              len(gids)])
        if sizes.size and sizes.max() > hub_guard:
            raise ValueError(
                f"co-activity bucket with {int(sizes.max())} users exceeds "
                f"hub_guard={hub_guard}; exact triangle semantics forbid "
                "dropping — raise the guard or pre-filter hub buckets")
        a, b = pairs_within_groups(users, gids)
        return pd.DataFrame({"a": a, "b": b})

    pairs = (
        ds.map_batches(bucket_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_pairs, batch_format="pandas")
    )

    # distinct edges: one hash exchange on the packed edge key
    def add_ekey(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"], np.int64)
        b = np.asarray(t["b"], np.int64)
        e = (a.view(np.uint64) << np.uint64(32)) ^ b.view(np.uint64)
        part = (splitmix64(e) % np.uint64(nparts)).astype(np.int64)
        if "part" in t.column_names:
            t = t.drop_columns(["part"])
        return t.append_column("part", pa.array(part, pa.int64()))

    def dedup_edges(g: pd.DataFrame) -> pd.DataFrame:
        return g[["a", "b"]].drop_duplicates()

    return (pairs.map_batches(add_ekey, batch_format="pyarrow")
            .groupby("part").map_groups(dedup_edges, batch_format="pandas")
            .materialize())


def _edge_part(t: pa.Table, nparts: int) -> pa.Table:
    """Append an edge-key hash partition column (preserves other columns)."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    a = np.asarray(t["a"], np.int64)
    b = np.asarray(t["b"], np.int64)
    e = (a.view(np.uint64) << np.uint64(32)) ^ b.view(np.uint64)
    part = (splitmix64(e) % np.uint64(nparts)).astype(np.int64)
    if "part" in t.column_names:
        t = t.drop_columns(["part"])
    return t.append_column("part", pa.array(part, pa.int64()))


def q_triangle_count(sf_dir: str, hub_guard: int = 65_536,
                     max_wedges: int = 50_000_000) -> pd.DataFrame:
    """(n_nodes, n_edges, n_triangles) of the user co-activity graph."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    nparts = adaptive_parts(
        _read(sf_dir, "events", ["user_id"]).count())
    edges = coactivity_edges(sf_dir, nparts, hub_guard)

    def add_ekey(t: pa.Table) -> pa.Table:
        return _edge_part(t, nparts)

    # degrees: explode endpoints, partial-count per batch, node-hash exchange
    def deg_partial(t: pa.Table) -> pd.DataFrame:
        nodes = np.concatenate([np.asarray(t["a"], np.int64),
                                np.asarray(t["b"], np.int64)])
        uniq, cnt = np.unique(nodes, return_counts=True)
        df = pd.DataFrame({"node": uniq, "deg": cnt.astype(np.int64)})
        df["part"] = (splitmix64(uniq.view(np.uint64))
                      % np.uint64(nparts)).astype(np.int64)
        return df

    # role-tagged degree attach: endpoint rows + degree partials share one
    # node-keyed exchange; each endpoint picks up its degree vectorized
    def endpoint_rows(t: pa.Table) -> pd.DataFrame:
        a = np.asarray(t["a"], np.int64)
        b = np.asarray(t["b"], np.int64)
        df = pd.DataFrame({
            "node": np.concatenate([a, b]),
            "peer": np.concatenate([b, a]),
            "deg": np.zeros(2 * len(a), np.int64),
            "role": np.r_[np.zeros(len(a), np.int64),
                          np.ones(len(b), np.int64)],
        })
        df["part"] = (splitmix64(df["node"].to_numpy(np.int64).view(np.uint64))
                      % np.uint64(nparts)).astype(np.int64)
        return df

    def deg_rows(t: pa.Table) -> pd.DataFrame:
        df = deg_partial(t)
        return pd.DataFrame({"node": df["node"], "peer": -1,
                             "deg": df["deg"], "role": 2, "part": df["part"]})

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        dm = (g[g["role"] == 2].groupby("node")["deg"].sum())
        ep = g[g["role"] != 2]
        if ep.empty:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "deg_of": pd.Series([], dtype=np.int64),
                                 "which": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({
            "a": np.where(ep["role"] == 0, ep["node"], ep["peer"]),
            "b": np.where(ep["role"] == 0, ep["peer"], ep["node"]),
            "deg_of": ep["node"].map(dm).to_numpy(np.int64),
            "which": ep["role"].to_numpy(np.int64),
        })

    tagged = (edges.map_batches(endpoint_rows, batch_format="pyarrow")
              .union(edges.map_batches(deg_rows, batch_format="pyarrow")))
    halves = (tagged.groupby("part").map_groups(attach, batch_format="pandas"))

    # recombine the two degree halves per edge (second edge-key exchange)
    def orient(g: pd.DataFrame) -> pd.DataFrame:
        w = g.pivot_table(index=["a", "b"], columns="which", values="deg_of",
                          aggfunc="first").reset_index()
        da = w[0].to_numpy(np.int64)
        db = w[1].to_numpy(np.int64)
        a = w["a"].to_numpy(np.int64)
        b = w["b"].to_numpy(np.int64)
        # orient lower (degree, id) → higher
        a_first = (da < db) | ((da == db) & (a < b))
        return pd.DataFrame({
            "lo": np.where(a_first, a, b),
            "hi": np.where(a_first, b, a),
        })

    oriented = (halves.map_batches(add_ekey, batch_format="pyarrow")
                .groupby("part").map_groups(orient, batch_format="pandas")
                .materialize())

    n_edges = oriented.count()

    # distinct-node count without landing a node-sized frame on the driver:
    # node-hash partition, per-partition nunique partial, sum
    def node_rows(t: pa.Table) -> pd.DataFrame:
        nodes = np.unique(np.concatenate([np.asarray(t["lo"], np.int64),
                                          np.asarray(t["hi"], np.int64)]))
        return pd.DataFrame({
            "node": nodes,
            "part": (splitmix64(nodes.view(np.uint64))
                     % np.uint64(nparts)).astype(np.int64),
        })

    node_parts = (oriented.map_batches(node_rows, batch_format="pyarrow")
                  .groupby("part")
                  .map_groups(lambda g: pd.DataFrame(
                      {"n": np.array([g["node"].nunique()], np.int64)}),
                      batch_format="pandas")
                  .to_pandas())
    n_nodes = int(node_parts["n"].sum()) if len(node_parts) else 0

    # wedges from each oriented source node: source-hash exchange first —
    # a node's out-edges may span blocks, so per-BATCH emission would miss
    # cross-block wedges
    def add_lo_part(t: pa.Table) -> pa.Table:
        lo = np.asarray(t["lo"], np.int64)
        part = (splitmix64(lo.view(np.uint64))
                % np.uint64(nparts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def wedge_rows(g: pd.DataFrame) -> pd.DataFrame:
        lo = g["lo"].to_numpy(np.int64)
        hi = g["hi"].to_numpy(np.int64)
        order = np.lexsort((hi, lo))
        los = lo[order]
        # visible work bound: exact triangle counting is Θ(Σ C(outdeg,2));
        # a near-complete graph makes that ~n³/6 wedges, which no cluster
        # size fixes — raise with the measured total instead of OOMing
        # (same capped-work-is-visible contract as the hub guards)
        sizes = np.bincount(np.cumsum(np.r_[True, los[1:] != los[:-1]]) - 1)
        n_wedges = int((sizes * (sizes - 1) // 2).sum())
        if n_wedges > max_wedges:
            raise ValueError(
                f"triangle counting would emit {n_wedges} wedges in one "
                f"partition (> max_wedges={max_wedges}); the co-activity "
                "graph is too dense for exact counting — sparsify the "
                "bucket definition or raise max_wedges explicitly")
        v, w = pairs_within_groups(hi[order], los)
        return pd.DataFrame({"v": v, "w": w,
                             "role": np.zeros(len(v), np.int64)})

    def edge_key_rows(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"v": np.asarray(t["lo"], np.int64),
                             "w": np.asarray(t["hi"], np.int64),
                             "role": np.ones(t.num_rows, np.int64)})

    def add_vw_part(df: pd.DataFrame) -> pd.DataFrame:
        key = ((df["v"].to_numpy(np.int64).view(np.uint64) << np.uint64(32))
               ^ df["w"].to_numpy(np.int64).view(np.uint64))
        df["part"] = (splitmix64(key) % np.uint64(nparts)).astype(np.int64)
        return df

    def count_triangles(g: pd.DataFrame) -> pd.DataFrame:
        ek = g[g["role"] == 1]
        wd = g[g["role"] == 0]
        if ek.empty or wd.empty:
            return pd.DataFrame({"n": np.zeros(1, np.int64)})
        ekey = np.sort((ek["v"].to_numpy(np.int64).view(np.uint64)
                        << np.uint64(32))
                       ^ ek["w"].to_numpy(np.int64).view(np.uint64))
        wkey = ((wd["v"].to_numpy(np.int64).view(np.uint64) << np.uint64(32))
                ^ wd["w"].to_numpy(np.int64).view(np.uint64))
        # NOTE: a wedge (v,w) may close via edge (v,w) in EITHER orientation
        wkey2 = ((wd["w"].to_numpy(np.int64).view(np.uint64) << np.uint64(32))
                 ^ wd["v"].to_numpy(np.int64).view(np.uint64))
        pos = np.searchsorted(ekey, wkey)
        hit = (pos < ekey.size) & (ekey[np.minimum(pos, ekey.size - 1)] == wkey)
        pos2 = np.searchsorted(ekey, wkey2)
        hit2 = ((pos2 < ekey.size)
                & (ekey[np.minimum(pos2, ekey.size - 1)] == wkey2))
        return pd.DataFrame({"n": np.array([int((hit | hit2).sum())],
                                           np.int64)})

    wedges = (oriented.map_batches(add_lo_part, batch_format="pyarrow")
              .groupby("part")
              .map_groups(wedge_rows, batch_format="pandas"))
    mixed = wedges.union(oriented.map_batches(edge_key_rows,
                                              batch_format="pyarrow"))
    # wedge (v,w) and its possible closing edge must co-partition in either
    # orientation — partition by the UNORDERED pair (min,max)
    def add_uvw_part(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        w = df["w"].to_numpy(np.int64)
        lo = np.minimum(v, w)
        hi = np.maximum(v, w)
        key = (lo.view(np.uint64) << np.uint64(32)) ^ hi.view(np.uint64)
        df["part"] = (splitmix64(key) % np.uint64(nparts)).astype(np.int64)
        return df

    tri_parts = (mixed.map_batches(add_uvw_part, batch_format="pandas")
                 .groupby("part")
                 .map_groups(count_triangles, batch_format="pandas")
                 .to_pandas())
    n_tri = int(tri_parts["n"].sum()) if len(tri_parts) else 0

    return pd.DataFrame({
        "n_nodes": np.array([n_nodes], np.int64),
        "n_edges": np.array([n_edges], np.int64),
        "n_triangles": np.array([n_tri], np.int64),
    })


# ------------------------------------------------------------- PageRank
def pagerank_edges(edges: rd.Dataset, nparts: int, d: float = 0.85,
                   n_iters: int = 12) -> pd.DataFrame:
    """Power-iteration PageRank over an undirected edge Dataset (a, b) —
    the second classic iterative graph algorithm here (alongside the dedup
    pipeline's connected components).

    Scale shape: the adjacency (both directions, out-degree attached,
    source-hash partitioned) is built ONCE and materialized; ranks live as
    a Dataset co-partitioned with it — NOTHING node-sized ever lands on
    the driver (the driver holds two scalars: N and the damping base).
    Each iteration is two bounded exchanges: a role-tagged source-hash
    union joins ranks to adjacency and emits per-edge contributions; a
    destination-hash exchange folds them (contributions sorted before
    summation, so the float ranks are bit-identical on any block layout —
    pinned in tests)."""
    import ray  # noqa: F401  (parallel with the other iterative ops)

    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    def _node_part(arr: np.ndarray) -> np.ndarray:
        return (splitmix64(arr.view(np.uint64))
                % np.uint64(nparts)).astype(np.int64)

    def directed(t: pa.Table) -> pd.DataFrame:
        a = np.asarray(t["a"], np.int64)
        b = np.asarray(t["b"], np.int64)
        df = pd.DataFrame({"src": np.concatenate([a, b]),
                           "dst": np.concatenate([b, a])})
        df["part"] = _node_part(df["src"].to_numpy(np.int64))
        return df

    def with_outdeg(g: pd.DataFrame) -> pd.DataFrame:
        # src-partitioned ⇒ out-degrees are partition-complete
        g = g.sort_values(["src", "dst"])
        od = g.groupby("src")["dst"].transform("size").to_numpy(np.int64)
        out = pd.DataFrame({"src": g["src"].to_numpy(np.int64),
                            "dst": g["dst"].to_numpy(np.int64),
                            "outdeg": od,
                            "rank": np.zeros(len(g), np.float64),
                            "role": np.zeros(len(g), np.int64)})
        out["part"] = _node_part(out["src"].to_numpy(np.int64))
        return out

    adj = (edges.map_batches(directed, batch_format="pyarrow")
           .groupby("part").map_groups(with_outdeg, batch_format="pandas")
           .materialize())

    n_nodes = int(sum(
        r["n"] for r in
        adj.map_batches(
            lambda df: pd.DataFrame(
                {"n": [df["src"].nunique()]}),   # partition-complete
            batch_format="pandas").take_all()))

    def init_ranks(g: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(g["src"].to_numpy(np.int64))
        out = pd.DataFrame({"src": nodes,
                            "dst": np.full(len(nodes), -1, np.int64),
                            "outdeg": np.ones(len(nodes), np.int64),
                            "rank": np.full(len(nodes), 1.0 / n_nodes),
                            "role": np.ones(len(nodes), np.int64)})
        out["part"] = _node_part(nodes)
        return out

    ranks = (adj.groupby("part").map_groups(init_ranks,
                                            batch_format="pandas")
             .materialize())
    base = (1.0 - d) / n_nodes

    for _ in range(n_iters):
        def contribs(g: pd.DataFrame) -> pd.DataFrame:
            rk = g[g["role"] == 1].sort_values("src")
            ed = g[g["role"] == 0]
            if ed.empty:
                return pd.DataFrame({"dst": pd.Series([], dtype=np.int64),
                                     "src": pd.Series([], dtype=np.int64),
                                     "c": pd.Series([], dtype=np.float64),
                                     "part": pd.Series([], dtype=np.int64)})
            rn = rk["src"].to_numpy(np.int64)
            rv = rk["rank"].to_numpy(np.float64)
            pos = np.searchsorted(rn, ed["src"].to_numpy(np.int64))
            c = rv[pos] / ed["outdeg"].to_numpy(np.int64)
            df = pd.DataFrame({"dst": ed["dst"].to_numpy(np.int64),
                               "src": ed["src"].to_numpy(np.int64),
                               "c": c})
            df["part"] = _node_part(df["dst"].to_numpy(np.int64))
            return df

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["dst", "src"])   # deterministic float order
            s = g.groupby("dst", sort=True)["c"].sum()
            nodes = s.index.to_numpy(np.int64)
            out = pd.DataFrame({"src": nodes,
                                "dst": np.full(len(nodes), -1, np.int64),
                                "outdeg": np.ones(len(nodes), np.int64),
                                "rank": base + d * s.to_numpy(np.float64),
                                "role": np.ones(len(nodes), np.int64)})
            out["part"] = _node_part(nodes)
            return out

        ranks = (adj.union(ranks)
                 .groupby("part").map_groups(contribs, batch_format="pandas")
                 .groupby("part").map_groups(fold, batch_format="pandas")
                 .materialize())

    rows = ranks.to_pandas()
    out = pd.DataFrame({
        "user_id": rows["src"].to_numpy(np.int64),
        "rank_micro": np.floor(rows["rank"].to_numpy(np.float64) * 1e6
                               + 0.5).astype(np.int64),
    })
    return out.sort_values("user_id").reset_index(drop=True)


def q_pagerank(sf_dir: str, n_iters: int = 8) -> pd.DataFrame:
    """PageRank of the user co-activity graph, micro-integer ranks.
    Rows-only (iterative); pinned against a dense numpy power iteration +
    layout invariance in tests/test_graph.py."""
    nparts = adaptive_parts(_read(sf_dir, "events", ["user_id"]).count())
    edges = coactivity_edges(sf_dir, nparts)
    return pagerank_edges(edges, nparts, n_iters=n_iters)
