"""Round-5 regression tests: ADVICE r4 defects (align -inf guard, ragged
quantize, resume manifest) + VERDICT r4 items (citation audit, key_skew
block-offset rank partials / layout invariance)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd


def test_citations_resolve():
    """Every /root/reference citation (absolute or bare lib/*.js form) in
    repo source + markdown resolves to a real file and in-range lines."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import citecheck

    bad = citecheck.collect_bad()
    assert bad == [], "\n".join(bad)


def _clip_row(cid, pcm, codec="pcm16", sr=8000, transcript="same words here"):
    from marc_record_merge_melindautils_ray.functions import audio as au

    payload = au.encode(np.asarray(pcm, np.float32), codec) if len(pcm) else b""
    return {
        "clip_id": cid, "bytes": payload, "sr_hz": sr,
        "dur_ms": int(len(pcm) * 1000 / sr), "codec": codec,
        "transcript": transcript,
    }


def _clips_table(rows):
    return pa.table({
        "clip_id": pa.array([r["clip_id"] for r in rows]),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "sr_hz": pa.array([r["sr_hz"] for r in rows], pa.int32()),
        "dur_ms": pa.array([r["dur_ms"] for r in rows], pa.int32()),
        "codec": pa.array([r["codec"] for r in rows]),
        "transcript": pa.array([r["transcript"] for r in rows]),
    })


def test_align_silent_reference_no_overflow(ray_session):
    """A silent (all-zero) reference overlap gives snr_db = -inf; the stage
    must emit the floor sentinel and align_ok=False instead of raising
    OverflowError (ADVICE r4 medium)."""
    from marc_record_merge_melindautils_ray.ops.audio_align import (
        align_candidate_pairs,
    )

    rng = np.random.default_rng(7)
    # ids sort "a_silent" < "b_noisy", so the silent clip is the SNR
    # reference (signal == 0 → snr_db = -inf)
    rows = [
        _clip_row("a_silent", np.zeros(4000, np.float32)),
        _clip_row("b_noisy", rng.standard_normal(4000).astype(np.float32) * 0.2),
    ]
    out = align_candidate_pairs(rd.from_arrow(_clips_table(rows))).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert bool(r["decodable"])
    assert not bool(r["align_ok"])
    assert r["aligned_snr_cdb"] <= -(10 ** 5)  # floor, not a crash


def test_align_empty_payload_marked_undecodable(ray_session):
    """A zero-length decoded payload has no overlap window: treated like the
    undecodable case (decodable=False), never fed to the SNR kernel."""
    from marc_record_merge_melindautils_ray.ops.audio_align import (
        align_candidate_pairs,
    )

    rng = np.random.default_rng(9)
    rows = [
        _clip_row("empty", np.zeros(0, np.float32)),
        _clip_row("full", rng.standard_normal(4000).astype(np.float32) * 0.2),
    ]
    out = align_candidate_pairs(rd.from_arrow(_clips_table(rows))).to_pandas()
    assert len(out) == 1
    assert not bool(out.iloc[0]["decodable"])
    assert not bool(out.iloc[0]["align_ok"])


def test_embed_quantize_ragged_rows_keep_own_length(ray_session, tmp_path):
    """Ragged embedding batches quantize each row at its OWN length — no
    phantom zero-pad trailing dimensions (ADVICE r4 low)."""
    from marc_record_merge_melindautils_ray.ops.similarity import q_embed_quantize

    rng = np.random.default_rng(3)
    lens = [4, 7, 1, 7, 3]
    vecs = [rng.standard_normal(n).astype(np.float32) for n in lens]
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = q_embed_quantize(str(tmp_path)).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    assert [len(c) for c in out["codes"]] == lens
    # reconstruction error bound holds per row at its own scale
    for i, v in enumerate(vecs):
        sc = out["scale_micro"].iloc[i] / 1e6
        rec = np.asarray(out["codes"].iloc[i], np.float64) * sc
        assert np.abs(rec - v).max() <= sc / 2 + 1e-6


def test_key_skew_block_layout_invariance(ray_session, tmp_path):
    """q_key_skew's distributed block-offset rank partials: identical result
    whether orders arrives as one file or many (different block layout), and
    it matches a numpy brute-force Gini on the same keys."""
    from marc_record_merge_melindautils_ray.ops.stats import q_key_skew

    rng = np.random.default_rng(11)
    # skewed keys: a hot key plus a long tail
    keys = np.concatenate([
        np.full(500, 7, np.int64),
        rng.integers(100, 400, size=2000),
        np.arange(1000, 1250, dtype=np.int64),
    ])
    rng.shuffle(keys)
    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir()
    many.mkdir()
    pq.write_table(pa.table({"o_custkey": keys}), str(one / "orders.parquet"))
    (many / "orders.parquet").mkdir()
    for i, part in enumerate(np.array_split(keys, 7)):
        pq.write_table(pa.table({"o_custkey": part}),
                       str(many / "orders.parquet" / f"p{i}.parquet"))
    a = q_key_skew(str(one))
    b = q_key_skew(str(many))
    assert a.equals(b)
    # brute force
    _, counts = np.unique(keys, return_counts=True)
    x = np.sort(counts).astype(np.int64)
    n = len(x)
    rank_sum = int((np.arange(1, n + 1) * x).sum())
    assert int(a["gini_num"].iloc[0]) == 2 * rank_sum - (n + 1) * int(x.sum())
    assert int(a["n_keys"].iloc[0]) == n
    assert int(a["max_n"].iloc[0]) == int(x.max())


def test_resume_manifest_wipes_mismatched_buckets(ray_session, tmp_path):
    """A crashed run's _BUCKET_SUCCESS markers are only trusted under a
    matching manifest: rewriting with a different key column (or bucket
    count) wipes the stale buckets instead of keeping their rows
    (ADVICE r4 low, pipelines/io.py)."""
    from marc_record_merge_melindautils_ray.pipelines.io import write_table

    df1 = pd.DataFrame({
        "k": [f"id{i:04d}" for i in range(200)],
        "v": [f"w{i:04d}" for i in range(200)],
    })
    root = tmp_path / "t"
    assert write_table(rd.from_pandas(df1), str(root), "k", num_buckets=4)
    os.remove(root / "_SUCCESS")  # simulate crash after some buckets landed

    # same data, DIFFERENT key column → manifest mismatch → full rewrite
    assert write_table(rd.from_pandas(df1), str(root), "v", num_buckets=4)
    got = pq.read_table(str(root)).to_pandas()
    assert len(got) == 200 and sorted(got["k"]) == sorted(df1["k"])

    # changed bucket count over a crashed layout: also wiped, exactly-once
    os.remove(root / "_SUCCESS")
    assert write_table(rd.from_pandas(df1), str(root), "v", num_buckets=8)
    got = pq.read_table(str(root)).to_pandas()
    assert len(got) == 200
    nb = {d for d in os.listdir(root) if d.startswith("bucket=")}
    assert len(nb) == 8


def test_resume_manifest_schema_change_wipes(ray_session, tmp_path):
    """Different data shape (schema) over leftover markers is not trusted."""
    from marc_record_merge_melindautils_ray.pipelines.io import write_table

    df1 = pd.DataFrame({"k": [f"a{i}" for i in range(50)],
                        "x": np.arange(50, dtype=np.int64)})
    df2 = pd.DataFrame({"k": [f"b{i}" for i in range(30)],
                        "y": np.arange(30, dtype=np.float64)})
    root = tmp_path / "t"
    assert write_table(rd.from_pandas(df1), str(root), "k", num_buckets=4)
    os.remove(root / "_SUCCESS")
    assert write_table(rd.from_pandas(df2), str(root), "k", num_buckets=4)
    got = pq.read_table(str(root)).to_pandas()
    assert len(got) == 30 and set(got["k"]) == set(df2["k"])


def test_bulk_backfill_ingest_matches_full_run(ray_session):
    """Bulk backfill: the ingest batch is 3x the base corpus (ingest >> base
    breaks any 'ingest is the small side' assumption).  The new-id and
    affected-cluster membership travel as broadcast block refs + per-worker
    sorted sets, so this passes with no O(ingest) driver list and the
    combined assignments still equal a from-scratch run label-for-label
    (VERDICT r4 item 4)."""
    from marc_record_merge_melindautils_ray.config import DedupConfig
    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup
    from marc_record_merge_melindautils_ray.pipelines.incremental import (
        run_dedup_incremental,
    )
    from marc_record_merge_melindautils_ray.sources.synth import make_corpus

    cfg = DedupConfig(verify_concurrency=2, fingerprint_concurrency=2)
    clips, _, _ = make_corpus(12, 20, 17)
    df = clips.to_pandas()
    mask = (np.arange(len(df)) % 4) != 0      # 75% of rows are the ingest
    base = pa.Table.from_pandas(df[~mask], preserve_index=False)
    new = pa.Table.from_pandas(df[mask], preserve_index=False)
    assert len(new) > 2 * len(base)

    full = run_dedup(rd.from_arrow(clips), cfg)
    fa = full["assignments"].to_pandas().sort_values(
        "clip_id").reset_index(drop=True)
    b = run_dedup(rd.from_arrow(base), cfg)
    inc = run_dedup_incremental(rd.from_arrow(new), rd.from_arrow(base),
                                b["assignments"], cfg)
    assert inc["metrics"]["survivor_pairs"] > 0
    ca = (
        inc["combined_assignments"].to_pandas()
        .sort_values("clip_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fa, ca)
    # canonical rows rebuilt exactly for the affected clusters
    canon = inc["canonical"].to_pandas()
    affected = (set(inc["new_assignments"].to_pandas().get("cluster_id", []))
                | set(inc["base_updates"].to_pandas().get("cluster_id", []))
                | set(inc["cluster_merges"]["into_cluster_id"]))
    assert set(canon["cluster_id"]) == affected


def test_snr_gate_i16_matches_float_path():
    """The int16 SNR kernel is exact: verdicts and dB agree with the float32
    decode path (scale cancels), including early-reject and the +inf and
    silent-reference corners."""
    from marc_record_merge_melindautils_ray.functions import audio as au

    rng = np.random.default_rng(21)
    for snr_target in (10.0, 25.0, 29.5, 30.5, 35.0, 60.0):
        sig = (rng.uniform(-0.5, 0.5, 150_000) * 32767).astype(np.int16)
        p_sig = float(np.einsum("i,i->", sig.astype(np.int64),
                                sig.astype(np.int64)))
        noise = rng.standard_normal(len(sig))
        noise *= np.sqrt(p_sig * 10 ** (-snr_target / 10) / np.einsum(
            "i,i->", noise, noise))
        test = np.clip(sig + noise, -32768, 32767).astype(np.int16)
        ok_i, s_i = au.snr_gate_i16(sig, test, 30.0)
        fa = au.decode(sig.tobytes(), "pcm16")
        fb = au.decode(test.tobytes(), "pcm16")
        ok_f, s_f = au.snr_gate(fa, fb, 30.0)
        assert ok_i == ok_f == (snr_target > 30.0)
        if np.isfinite(s_i) and np.isfinite(s_f):
            assert abs(s_i - s_f) < 0.01
    # identical buffers → +inf; silent reference → -inf reject
    sig = (rng.uniform(-0.5, 0.5, 1000) * 32767).astype(np.int16)
    assert au.snr_gate_i16(sig, sig.copy(), 30.0) == (True, float("inf"))
    z = np.zeros(1000, np.int16)
    ok, s = au.snr_gate_i16(z, sig, 30.0)
    assert not ok and s == float("-inf")


def test_phase2_int16_fastpath_same_verdicts(ray_session):
    """PairPcmVerify verdicts are unchanged by the int16 fast path: a true
    dup (bit-different but high-SNR), an LSH false positive, and a
    cross-rate pair (which must take the float resample path) all verdict
    identically to the decoded-float semantics."""
    from marc_record_merge_melindautils_ray.config import DedupConfig
    from marc_record_merge_melindautils_ray.functions import audio as au
    from marc_record_merge_melindautils_ray.stages.verify import PairPcmVerify

    rng = np.random.default_rng(5)
    sig = rng.uniform(-0.5, 0.5, 80_000).astype(np.float32)
    near = np.clip(sig + 0.0005 * rng.standard_normal(len(sig)).astype(
        np.float32), -1, 1)
    other = rng.uniform(-0.5, 0.5, 80_000).astype(np.float32)
    sig16k = au.resample_linear(sig, 8000, 16000)

    df = pd.DataFrame({
        "id_a": ["a", "a", "a"],
        "id_b": ["b", "c", "d"],
        "rel": ["band", "band", "band"],
        "bytes_a": [au.encode(sig, "pcm16")] * 3,
        "codec_a": ["pcm16"] * 3,
        "norm_a": ["t"] * 3,
        "sr_a": [8000] * 3,
        "bytes_b": [au.encode(near, "pcm16"), au.encode(other, "pcm16"),
                    au.encode(sig16k, "pcm16")],
        "codec_b": ["pcm16"] * 3,
        "norm_b": ["t"] * 3,
        "sr_b": [8000, 8000, 16000],
    })
    out = PairPcmVerify(DedupConfig())(df)
    assert list(out["ok"]) == [True, False, True]
    assert out["snr"].iloc[0] >= 30.0 and out["snr"].iloc[1] < 30.0


def _lance_present() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _lance_present(),
    reason="no lance wheel ships in this container (no network, no pip "
           "installs) - the Lance branch of read_clips/write_table has a "
           "parquet fallback which IS exercised; this round-trip test runs "
           "automatically wherever the wheel exists (VERDICT r4 item 8)")
def test_lance_round_trip(ray_session, tmp_path):
    """Lance write -> read round trip of the clip schema via write_table's
    lance branch (runs only where the lance wheel is installed)."""
    from marc_record_merge_melindautils_ray.pipelines.io import write_table
    from marc_record_merge_melindautils_ray.sources.synth import make_corpus

    clips, _, _ = make_corpus(4, 6, 42)
    ds = rd.from_arrow(clips)
    root = tmp_path / "t"
    assert write_table(ds, str(root), "clip_id", num_buckets=4,
                       file_format="lance")
    back = rd.read_lance(str(root / "data.lance")).to_pandas()
    assert sorted(back["clip_id"]) == sorted(clips["clip_id"].to_pylist())
