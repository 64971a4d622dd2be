"""Stage 2: content signatures — text MinHash/LSH bands + audio SimHash.

Two kernels:

* ``TextSignatures`` — stateless-per-batch but holds the seeded MinHash
  permutation table, so it runs as a callable class (built once per actor, the
  Ray analog of the reference's constructor-held state,
  ``lib/marc-record-merge-melindautils.js:60``).  Adds:
    - ``bands``         fixed_size_list<uint64>[num_bands] LSH band keys
    - ``samp_shingles`` list<uint64> — deterministic ~2^-bits sample of
      shingle hashes (``h < 2^64 >> bits``), the containment-pass index keys
    - ``n_shingles``    int32
* ``AudioFingerprint`` — stateful actor pool: decodes ``bytes`` per ``codec``
  to PCM and emits a 64-bit SimHash sketch (``fp``) + ``decode_ok``.  Decoder
  state + projection matrix live in ``__init__`` (once per actor).

Scale note: after this stage the pipeline projects away ``bytes`` /
``transcript`` — only ~100 B/row of signatures enters any shuffle; payloads
are re-fetched by clip_id for the tiny verified-survivor set only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions import audio as au
from marc_record_merge_melindautils_ray.functions.hashing import MinHasher


class TextSignatures:
    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self.mh = MinHasher(cfg.num_perms, cfg.minhash_seed, cfg.shingle_k)
        self.samp_threshold = np.uint64(0xFFFFFFFFFFFFFFFF) >> np.uint64(cfg.containment_sample_bits)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["norm_transcript"].to_pylist()
        sigs = self.mh.signatures(texts)
        bands = self.mh.band_keys(sigs, self.cfg.num_bands)
        # int64 bit-views throughout (see stages.normalize note)
        band_col = pa.FixedSizeListArray.from_arrays(
            pa.array(bands.reshape(-1).view(np.int64), pa.int64()), self.cfg.num_bands
        )

        hashes, offsets = self.mh.shingle_hashes(texts)
        n_shingles = np.diff(offsets).astype(np.int32)
        samp_col = self._containment_keys(texts)

        batch = batch.append_column("bands", band_col)
        batch = batch.append_column("samp_shingles", samp_col)
        batch = batch.append_column("n_shingles", pa.array(n_shingles, pa.int32()))
        return batch

    def _containment_keys(self, texts: list) -> pa.ListArray:
        """Containment-pass index keys: word 3-gram hashes.

        Emission rule per doc: the FIRST and LAST grams are always emitted,
        plus every gram whose hash falls under the sampling threshold.  The
        threshold rule is a pure function of the gram value, so a gram shared
        between a contained transcript and its container is emitted by both
        or by neither (subset-sampling consistency); the first/last rule makes
        prefix/suffix containment deterministic regardless of length — a
        short prefix's first gram IS its container's first gram.
        Analog of ``normalizingSubsetComparator`` candidate discovery
        (``lib/record-utils.js:219-226``).
        """
        from marc_record_merge_melindautils_ray.functions.hashing import stable_str_hash

        grams: list[str] = []
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = t.split()
            if len(words) < 3:
                continue
            g = [" ".join(words[j : j + 3]) for j in range(len(words) - 2)]
            grams.extend(g)
            counts[i] = len(g)
        if grams:
            h = stable_str_hash(grams, seed=0xC047)
        else:
            h = np.empty(0, np.uint64)
        thr = np.uint64(0xFFFFFFFFFFFFFFFF) >> np.uint64(self.cfg.containment_sample_bits)
        keep = h <= thr
        # always keep first & last gram of each doc
        doc_ends = np.cumsum(counts)
        doc_starts = doc_ends - counts
        nz = counts > 0
        keep[doc_starts[nz]] = True
        keep[doc_ends[nz] - 1] = True
        doc_idx = np.repeat(np.arange(len(texts)), counts)
        kept_counts = np.bincount(doc_idx[keep], minlength=len(texts))
        out_offsets = np.zeros(len(texts) + 1, dtype=np.int32)
        np.cumsum(kept_counts, out=out_offsets[1:])
        return pa.ListArray.from_arrays(
            pa.array(out_offsets, pa.int32()),
            pa.array(h[keep].view(np.int64), pa.int64()),
        )


class ClipFeatures:
    """FUSED feature stage: prepare → audio fingerprint → text signatures in
    ONE actor pool.

    Three chained pools (task prepare → fingerprint actors → signature
    actors) cost two full inter-stage block handoffs through the object
    store plus an extra pool spin-up — fixed latency that does not shrink
    with cluster size and therefore eats scaling efficiency.  Fusing them
    means raw clip blocks enter, slim feature rows leave, one hop total.
    All kernel state (decoder tables, MinHash permutations) still
    initializes once per actor in ``__init__``.
    """

    def __init__(self, cfg: DedupConfig):
        self.fp = AudioFingerprint(cfg)
        self.txt = TextSignatures(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from marc_record_merge_melindautils_ray.stages.normalize import prepare_batch

        return self.txt(self.fp(prepare_batch(batch)))


class AudioFingerprint:
    """Actor-pool stage: bytes → PCM → SimHash fingerprint.

    The decode step for codecs without a self-contained implementation
    (mp3/opus/…) raises ``NotImplementedError`` inside
    ``functions.audio.decode``; such rows get ``decode_ok=False`` and an
    all-zero fingerprint, and the verify stage's codec-class gate (V5 analog,
    ``lib/mergeability-validators.js:82-92``) keeps them out of merges.
    """

    def __init__(self, cfg: DedupConfig):
        from marc_record_merge_melindautils_ray.functions.hashing import PayloadHasher

        self.cfg = cfg
        self.fper = au.AudioFingerprinter(cfg.fp_frames, cfg.simhash_bits, cfg.simhash_seed)
        self.ph = PayloadHasher()
        self._codec_h: dict[str, int] = {}

    def _codec_hash(self, codec: str) -> int:
        h = self._codec_h.get(codec)
        if h is None:
            from marc_record_merge_melindautils_ray.functions.hashing import stable_str_hash

            h = self._codec_h[codec] = int(stable_str_hash([codec], seed=0xC0DEC)[0])
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        codecs = batch["codec"].to_pylist()
        srs = (
            batch["sr_hz"].to_pylist()
            if "sr_hz" in batch.column_names
            else [0] * len(payloads)
        )
        fps = np.zeros(len(payloads), dtype=np.uint64)
        ok = np.zeros(len(payloads), dtype=bool)
        ch0 = np.zeros(len(payloads), dtype=np.uint64)
        ch1 = np.zeros(len(payloads), dtype=np.uint64)
        fp_rate = getattr(self.cfg, "fp_rate_hz", 8000)
        for i, (p, c, sr) in enumerate(zip(payloads, codecs, srs)):
            if p is None or c is None or not au.is_decodable(c):
                continue
            pcm = au.decode(p, c)
            # conform to the canonical fingerprint rate so cross-rate copies
            # of one signal fingerprint identically (no-op at the canonical
            # rate — the common case pays nothing)
            if sr and fp_rate and sr != fp_rate:
                pcm = au.resample_linear(pcm, int(sr), int(fp_rate))
            fps[i] = self.fper.fingerprint(pcm)
            ok[i] = True
            # 128-bit content-identity hash (codec AND sample rate folded
            # in — identical bytes at different rates are different signals,
            # so they must not hash equal): lets phase-1 decide
            # byte-identical pairs vectorized, so the exact-dup majority
            # never touches payload bytes again (phase-2 bytes/pair → 0 for
            # them).  Hashed here because this stage already holds the
            # payload in cache for the decode.
            ch0[i], ch1[i] = self.ph.hash_one(
                p,
                self._codec_hash(c)
                ^ (((sr or 0) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF),
            )
        batch = batch.append_column("fp", pa.array(fps.view(np.int64), pa.int64()))
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("ch0", pa.array(ch0.view(np.int64), pa.int64()))
        batch = batch.append_column("ch1", pa.array(ch1.view(np.int64), pa.int64()))
        # payload columns end HERE: downstream stages are signature-only, and
        # keeping bytes in the inter-stage blocks multiplies object-store
        # footprint by the payload size (spill cliff at large corpora)
        return batch.drop_columns(
            [c for c in ("bytes", "transcript") if c in batch.column_names]
        )
