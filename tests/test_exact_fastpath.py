"""Round-4 phase-2 cost cuts: the 128-bit payload content hash that decides
byte-identical pairs in phase-1 (zero payload bytes in phase-2), and the
chunked ``snr_gate`` kernel whose verdicts must equal ``snr_db >= tau``.
"""

import numpy as np
import pyarrow as pa

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions import audio as au
from marc_record_merge_melindautils_ray.functions.hashing import (
    PayloadHasher,
    stable_str_hash,
)
from marc_record_merge_melindautils_ray.stages.candidates import PAIR_SCHEMA
from marc_record_merge_melindautils_ray.stages.verify import (
    make_phase1_kernel,
    survivors_to_table,
)


# ------------------------------------------------------------ PayloadHasher
def test_payload_hash_deterministic_across_instances():
    ch = int(stable_str_hash(["ulaw"], seed=0xC0DEC)[0])
    p = bytes(range(256)) * 37 + b"tail"
    assert PayloadHasher().hash_one(p, ch) == PayloadHasher().hash_one(p, ch)


def test_payload_hash_sensitive_to_content_length_codec():
    ph = PayloadHasher()
    cu = int(stable_str_hash(["ulaw"], seed=0xC0DEC)[0])
    ca = int(stable_str_hash(["alaw"], seed=0xC0DEC)[0])
    base = bytes(range(256)) * 10
    h = ph.hash_one(base, cu)
    # single byte flip anywhere (body word and tail word)
    for pos in (0, 7, 8, 1024, len(base) - 1):
        flipped = bytearray(base)
        flipped[pos] ^= 1
        assert ph.hash_one(bytes(flipped), cu) != h
    # length extension and truncation
    assert ph.hash_one(base + b"\x00", cu) != h
    assert ph.hash_one(base[:-1], cu) != h
    # same bytes, different codec
    assert ph.hash_one(base, ca) != h
    # the two 64-bit streams are independent (both halves differ on a flip)
    flipped = bytearray(base)
    flipped[100] ^= 0x80
    h2 = ph.hash_one(bytes(flipped), cu)
    assert h[0] != h2[0] and h[1] != h2[1]


def test_payload_hash_no_accidental_collisions_small_corpus():
    ph = PayloadHasher()
    ch = int(stable_str_hash(["pcm16"], seed=0xC0DEC)[0])
    rng = np.random.default_rng(7)
    seen = set()
    for _ in range(500):
        p = rng.integers(0, 256, size=int(rng.integers(1, 400)), dtype=np.uint8)
        seen.add(ph.hash_one(p.tobytes(), ch))
    assert len(seen) == 500


# ----------------------------------------------------------------- snr_gate
def test_snr_gate_verdicts_match_snr_db():
    rng = np.random.default_rng(11)
    tau = 30.0
    for n in (1, 100, 65_536, 65_537, 200_000):
        ref = rng.standard_normal(n).astype(np.float32) * 0.3
        for noise_amp in (0.0, 1e-5, 3e-4, 1e-2, 0.5):
            test = ref + rng.standard_normal(n).astype(np.float32) * noise_amp
            want = au.snr_db(ref, test) >= tau
            ok, s = au.snr_gate(ref, test, tau)
            assert ok == want, (n, noise_amp)
            if ok:  # full-pass values agree with the exact kernel
                assert s == float("inf") or abs(s - au.snr_db(ref, test)) < 1e-6


def test_snr_gate_edge_cases():
    z = np.zeros(10, dtype=np.float32)
    s = np.ones(10, dtype=np.float32)
    assert au.snr_gate(z, z, 30.0) == (False, float("-inf"))  # zero signal
    assert au.snr_gate(s, s, 30.0) == (True, float("inf"))
    assert au.snr_gate(s, s[:5], 30.0)[0] is False  # shape mismatch
    # early reject on unrelated long signals still returns ok=False
    rng = np.random.default_rng(3)
    a = rng.standard_normal(300_000).astype(np.float32)
    b = rng.standard_normal(300_000).astype(np.float32)
    ok, val = au.snr_gate(a, b, 30.0)
    assert not ok and val < 30.0
    assert not (au.snr_db(a, b) >= 30.0)


# ------------------------------------------------- phase-1 exact verdict
def _pairs(rows):
    base = {
        "id_a": "x1", "id_b": "x2", "rel": "band", "bucket_n": 2,
        "fp_a": 0, "fp_b": 0, "nh0_a": 1, "nh0_b": 1, "nh1_a": 2, "nh1_b": 2,
        "ch0_a": 77, "ch0_b": 77, "ch1_a": 88, "ch1_b": 88,
        "dur_ms_a": 1000, "dur_ms_b": 1000, "codec_cls_a": "pcm",
        "codec_cls_b": "pcm", "sources_a": ["FENNI"], "sources_b": ["OULA"],
        "is_segment_of_a": None, "is_segment_of_b": None,
        "decode_ok_a": True, "decode_ok_b": True,
        "author_type_a": None, "author_type_b": None,
    }
    return pa.Table.from_pylist([{**base, **r} for r in rows], schema=PAIR_SCHEMA)


def test_phase1_exact_column_semantics():
    out = make_phase1_kernel(DedupConfig())(_pairs([
        {},                                        # identical hashes → exact
        {"ch0_b": 99},                             # ch0 differs → near
        {"ch1_b": 99},                             # ch1 differs → near
        {"rel": "containment"},                    # containment never exact
        {"decode_ok_b": False},                    # undecodable → not exact
        {"sources_b": ["FENNI"]},                  # gate failure → not exact
        {"ch0_a": None, "ch0_b": None},            # null hashes → near
    ]))
    assert out["exact"].to_pylist() == [True, False, False, False, False, False, False]
    # exact ⊆ survivors, and the survivor projection carries the flag
    sv = survivors_to_table(out)
    flags = dict(zip(sv["id_a"].to_pylist(), sv["exact"].to_pylist()))
    assert all(
        not e or o for e, o in zip(out["exact"].to_pylist(), out["ok1"].to_pylist())
    )
    assert sv.num_rows == 5  # undecodable + same-source rows dropped
    assert list(sv.column_names) == ["id_a", "id_b", "rel", "bucket_n", "exact"]
    assert flags["x1"] in (True, False)
