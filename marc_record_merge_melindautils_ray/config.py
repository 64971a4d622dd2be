"""Pipeline configuration.

The reference binds its tunables at construction time (the two DB handles,
``lib/marc-record-merge-melindautils.js:60``) and hard-codes its rule tables
(``lib/mergeability-validators.js:95-100``). The new engine makes the whole
configuration explicit and hashable so checkpoint lineage can record it.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- text signatures -------------------------------------------------
    shingle_k: int = 5            # char k-grams over the normalized transcript
    num_perms: int = 128          # MinHash signature length
    num_bands: int = 16           # LSH bands (rows per band = num_perms // num_bands)
    minhash_seed: int = 0x5EED
    jaccard_threshold: float = 0.7   # verify-stage estimated-Jaccard gate

    # --- audio fingerprints ---------------------------------------------
    fp_frames: int = 64           # fixed-length energy envelope for SimHash
    simhash_bits: int = 64
    simhash_seed: int = 0xF00D
    fp_rate_hz: int = 8000        # fingerprints computed at this canonical
    # rate (clips conform via linear resample first), so the SAME signal
    # distributed at different sample rates lands in the same audio buckets;
    # clips already at the canonical rate skip the resample entirely
    simhash_max_hamming: int = 6  # verify-stage fingerprint gate
    snr_db: float = 30.0          # per-row invariant: decoded-PCM allclose (BASELINE.json input_hint)

    # --- candidate generation / skew ------------------------------------
    bucket_cap: int = 64          # band buckets larger than this switch to hub pairing
    max_pairs_per_bucket: int = 4096
    keyset_mode: str = "sampled"  # "sampled": cheap hot-key-only detector —
                                  # the measured default (at 10^6 clips the
                                  # exact pass's own counting aggregate cost
                                  # 115 s and saved less than that downstream;
                                  # vectorized emission makes singleton groups
                                  # nearly free, so pre-filtering pays only
                                  # when the shuffle, not the UDF, dominates).
                                  # "exact": full counting pass whose multi-key
                                  # set pre-filters the candidate shuffle
                                  # (recall-lossless — singleton band keys
                                  # can't pair; equivalence asserted in tests).
                                  # The multi/useful key sets travel as
                                  # distributed-built Bloom filters (bitmap
                                  # slice blocks in the object store, refs in
                                  # the closure) — no driver key array at any
                                  # corpus size.  "auto": exact above
                                  # exact_keyset_min_rows — the regime where
                                  # the candidate SHUFFLE (not the per-group
                                  # UDF) dominates and the pre-filter's
                                  # counting pass pays for itself; safe now
                                  # that exact never materializes keys on the
                                  # driver.
    exact_keyset_min_rows: int = 50_000_000

    # --- containment pass ------------------------------------------------
    containment_sample_bits: int = 5   # sample shingles with hash < 2^64 / 2^bits
    containment_min_len: int = 12      # normalized-transcript length floor for containment pairs

    # --- merge policy (reference analogs) --------------------------------
    priority_source: str = "FENNI"     # V4: preferredRecordInFENNI (lib/mergeability-validators.js:69-81)
    merge_agent: str = "MELINDA-RAY"   # P4 audit agent (lib/post-merge-modifiers.js:130-143)
    audit_clock: str = "1970-01-01T00:00:00Z"  # injected clock: the reference's one nondeterminism
                                               # (new Date() at lib/post-merge-modifiers.js:139) is
                                               # stripped by its tests; we inject for determinism.

    # --- clustering -------------------------------------------------------
    max_cc_rounds: int = 12       # hash-to-min converges in O(log d); dup clusters are shallow
    cc_local_max_edges: int = 2_000_000  # below this the edge set runs as ONE
                                         # in-memory union-find task (per-round
                                         # shuffles are pure latency at small
                                         # sizes); above it: distributed
                                         # hash-to-min rounds

    # --- execution --------------------------------------------------------
    batch_size: int = 4096
    audio_batch_size: int = 256   # wide binary rows -> smaller batches
    verify_batch_size: int = 256  # pairs per phase-2 batch (sizes the task
                                  # fan-out of the warm-worker verify stage)
    payload_buckets: int = 64     # hash buckets for the survivor payload store
    payload_store: str = "auto"   # "filtered": build a survivor-only payload
                                  # block store (the cluster-scale default —
                                  # bytes pulled from storage once, only for
                                  # survivors); "direct": verify actors index
                                  # the input's own resident Arrow blocks
                                  # (zero extra copy — only valid when clips
                                  # are already materialized in the object
                                  # store); "auto": direct iff the input is a
                                  # MaterializedDataset, else filtered
    index_shards: int = 1         # >1: the cluster-tagging side table is
                                  # sharded by hash(clip_id) % K at produce
                                  # time and each tagging task holds only its
                                  # shard's ArrowBlockIndex — the ≫10^8-row
                                  # side-table path (trades one K-way member
                                  # shuffle for bounded per-task index heap)
    verify_concurrency: int = 4   # sizes the payload-filter and live-host-
                                  # lookup pools (phase-2 PCM verify itself
                                  # now runs on the warm-worker task path —
                                  # its block index builds once per process,
                                  # so parallelism follows the pair stream)
    fingerprint_concurrency: int = 4  # legacy knob: the feature and
                                  # cluster-tagging stages now run on the
                                  # warm-worker task path (light state) and
                                  # scale with the cluster, so this no
                                  # longer caps them; kept for config-hash
                                  # stability of existing checkpoints
    num_shuffle_partitions: int = 0   # 0 = let Ray decide

    def rows_per_band(self) -> int:
        assert self.num_perms % self.num_bands == 0
        return self.num_perms // self.num_bands

    # engine stage-format version, folded into checkpoint lineage: bump when
    # a stage's OUTPUT SCHEMA or SEMANTICS change (r4: survivors gained the
    # `exact` column; r4-late: fingerprints conform to fp_rate_hz and the
    # content hash folds sr_hz, so pre-rate-aware feature checkpoints carry
    # hashes the new byte-identity fast path must not trust), so checkpoints
    # written by an older engine invalidate cleanly instead of resuming with
    # stale semantics or crashing a column select
    STAGE_FORMAT = 3

    def config_hash(self) -> str:
        """Stable hash of every semantic knob, recorded in checkpoint lineage."""
        payload = json.dumps(
            {**asdict(self), "__stage_format__": self.STAGE_FORMAT}, sort_keys=True
        ).encode()
        return hashlib.blake2b(payload, digest_size=8).hexdigest()
