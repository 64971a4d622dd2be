"""Deterministic vectorized hashing: shingles, MinHash signatures, LSH bands.

Everything is seeded and pure → task retries reproduce identical signatures
(lineage-safe), and the same config yields the same clusters on every run —
the determinism requirement the reference's tests enforce by stripping its one
wall-clock field (``test/MergeUtilsMelinda.spec.js:154``).

Design notes (scale): all kernels are NumPy-vectorized over entire Arrow
batches — one polynomial rolling hash over a single concatenated byte buffer
per batch, one ``minimum.reduceat`` per permutation chunk.  No Python loop
touches a row.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_POLY_MULT = np.uint64(0x100000001B3)  # FNV prime, used as polynomial base
EMPTY_SENTINEL = np.uint64(0)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constant schedule)."""
    x = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        x += _U64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def _rand_u64(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(0, 1 << 63, size=n, dtype=np.int64).astype(_U64) * _U64(2) + _U64(1)


class MinHasher:
    """MinHash permutation table, built once per worker (cheap, seeded).

    ``signature[i] = min_{s in shingles} splitmix-free (a_i * s + b_i)`` over
    uint64 wraparound arithmetic — the standard vectorized approximation of
    independent permutations.
    """

    def __init__(self, num_perms: int = 128, seed: int = 0x5EED, shingle_k: int = 5):
        self.num_perms = num_perms
        self.shingle_k = shingle_k
        rng = np.random.default_rng(seed)
        self.a = _rand_u64(rng, num_perms)  # odd multipliers
        self.b = rng.integers(0, 1 << 63, size=num_perms, dtype=np.int64).astype(_U64)

    # ---------------------------------------------------------------- shingles
    def shingle_hashes(self, texts: list) -> tuple[np.ndarray, np.ndarray]:
        """Hash all k-byte shingles of every text in one vectorized pass.

        Returns ``(hashes, offsets)`` where ``hashes`` is the concatenated
        uint64 shingle-hash array and ``offsets[d]`` is the start of doc d's
        span (``offsets`` has len(texts)+1 entries).  Texts shorter than k
        contribute a single whole-text shingle; empty texts contribute none.
        """
        k = self.shingle_k
        encoded = [t.encode("utf-8") if t else b"" for t in texts]
        lens = np.fromiter((len(e) for e in encoded), dtype=np.int64, count=len(encoded))
        # short non-empty texts: pad to k so they yield exactly one shingle
        padded = [e + b"\x00" * (k - len(e)) if 0 < len(e) < k else e for e in encoded]
        lens = np.maximum(lens, np.where(lens > 0, k, 0))
        buf = np.frombuffer(b"".join(padded), dtype=np.uint8)

        n_shingles = np.where(lens > 0, lens - k + 1, 0)
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(n_shingles, out=offsets[1:])
        total = int(offsets[-1])
        if total == 0:
            return np.empty(0, dtype=_U64), offsets

        doc_starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_starts[1:])
        # global start index of every valid shingle window
        starts = np.repeat(doc_starts[:-1], n_shingles) + (
            np.arange(total) - np.repeat(offsets[:-1], n_shingles)
        )
        if buf.size < k:
            buf = np.pad(buf, (0, k - buf.size))
        windows = np.lib.stride_tricks.sliding_window_view(buf, k)[starts]
        powers = np.empty(k, dtype=_U64)
        powers[k - 1] = _U64(1)
        with np.errstate(over="ignore"):
            for i in range(k - 2, -1, -1):
                powers[i] = powers[i + 1] * _POLY_MULT
            h = (windows.astype(_U64) * powers[None, :]).sum(axis=1, dtype=_U64)
        return splitmix64(h), offsets

    # --------------------------------------------------------------- signatures
    def signatures(self, texts: list) -> np.ndarray:
        """(ndocs, num_perms) uint64 MinHash signatures.

        Docs with zero shingles get an all-``EMPTY_SENTINEL`` signature; the
        banding stage emits no band keys for them (they can still pair via
        the audio fingerprint path).
        """
        hashes, offsets = self.shingle_hashes(texts)
        ndocs = len(texts)
        out = np.full((ndocs, self.num_perms), EMPTY_SENTINEL, dtype=_U64)
        if hashes.size == 0:
            return out
        nonempty = np.flatnonzero(np.diff(offsets) > 0)
        starts = offsets[nonempty]
        chunk = 16  # permutation chunk: bounds temp memory at n_shingles*chunk*8B
        with np.errstate(over="ignore"):
            for p0 in range(0, self.num_perms, chunk):
                a = self.a[p0 : p0 + chunk]
                b = self.b[p0 : p0 + chunk]
                m = hashes[:, None] * a[None, :] + b[None, :]
                out[nonempty, p0 : p0 + chunk] = np.minimum.reduceat(m, starts, axis=0)
        return out

    # -------------------------------------------------------------------- bands
    def band_keys(self, sigs: np.ndarray, num_bands: int) -> np.ndarray:
        """(ndocs, num_bands) uint64 LSH band keys.

        Each band key hashes that band's signature slice together with the
        band index, so identical slices in different bands never collide.
        Empty-signature docs get key 0 in every band (caller drops those).
        """
        ndocs, p = sigs.shape
        rows = p // num_bands
        sl = sigs.reshape(ndocs, num_bands, rows)
        with np.errstate(over="ignore"):
            h = np.full((ndocs, num_bands), _U64(0xCBF29CE484222325), dtype=_U64)
            for r in range(rows):
                h = (h ^ sl[:, :, r]) * _POLY_MULT
            h ^= splitmix64(np.arange(num_bands, dtype=_U64))[None, :]
            h = splitmix64(h)
        empty = (sigs == EMPTY_SENTINEL).all(axis=1)
        h[empty] = _U64(0)
        return h


def estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash Jaccard estimate between two signatures."""
    return float(np.mean(sig_a == sig_b))


def stable_str_hash(values, seed: int = 0) -> np.ndarray:
    """Deterministic uint64 hash of an array of strings (pandas siphash with a
    fixed key — stable across processes/runs, unlike Python's ``hash``).

    NUL safety: pandas' vectorized C hasher reads NUL-terminated string
    views, so ``"\\x00"``-containing strings would alias their prefixes
    (hypothesis found ``""`` vs ``"\\x00"``).  Such strings are escaped with
    an injective ``\\x01``-based scheme before hashing; the scan is O(chars)
    and the rewrite only triggers on affected elements (normalized text can
    never contain controls, so the hot paths never pay the rewrite)."""
    import pandas as pd

    vals = np.asarray(values, dtype=object)
    if any(isinstance(v, str) and ("\x00" in v or "\x01" in v) for v in vals):
        vals = np.array(
            [
                v.replace("\x01", "\x01\x31").replace("\x00", "\x01\x30")
                if isinstance(v, str)
                else v
                for v in vals
            ],
            dtype=object,
        )
    arr = pd.util.hash_array(vals, hash_key="melinda-ray-0001")
    if seed:
        with np.errstate(over="ignore"):
            arr = splitmix64(arr ^ _U64(seed))
    return arr


class PayloadHasher:
    """128-bit payload content-identity hash (two independent 64-bit
    streams) — makes the phase-2 byte-identity fast path an O(1) column
    equality instead of an O(len) memcmp per pair.

    Construction (pure seeded arithmetic, numpy-vectorized over the whole
    payload): the payload is viewed as little-endian uint64 words; each word
    is XORed with a position-keyed coefficient (a splitmix64 stream, grown
    lazily and cached per actor) and pushed through the splitmix64
    finalizer; the mixes sum mod 2^64.  Byte length, the trailing partial
    word, and the codec's string hash fold into a final mix, so equal
    hashes imply equal codec + equal length (+ equal content w.h.p.).

    Collision bound (heuristic — splitmix64 treated as a PRF): ~2^-64 per
    stream, ~2^-128 for the pair of independent seeds; at the north star's
    10^12-clip scale with ~10^13 candidate pairs the expected number of
    false byte-identity verdicts is ~3e-26.  Deterministic and seeded, so
    task retries and any block layout reproduce identical hashes — the same
    lineage-safety property as ``MinHasher``.
    """

    def __init__(self, seeds: tuple[int, int] = (0x7A71_0AD5, 0x0C0_47E57)):
        self._seeds = [_U64(s) for s in seeds]
        self._coeffs = [np.empty(0, _U64), np.empty(0, _U64)]

    def _coeff(self, j: int, n: int) -> np.ndarray:
        c = self._coeffs[j]
        if len(c) < n:
            m = max(n, 4096, 2 * len(c))
            idx = np.arange(m, dtype=_U64)
            with np.errstate(over="ignore"):
                self._coeffs[j] = splitmix64(
                    idx * _U64(0x9E3779B97F4A7C15) + self._seeds[j]
                )
            c = self._coeffs[j]
        return c

    def hash_one(self, payload, codec_h) -> tuple[int, int]:
        """(ch0, ch1) for one payload (bytes / pa.Buffer / memoryview)."""
        u8 = np.frombuffer(payload, dtype=np.uint8)
        n = len(u8)
        k = n >> 3
        body = u8[: k * 8].view("<u8") if k else np.empty(0, _U64)
        tail = u8[k * 8:]
        tail_word = (
            _U64(int.from_bytes(tail.tobytes(), "little")) if len(tail) else _U64(0)
        )
        codec_h = _U64(codec_h)
        out = []
        with np.errstate(over="ignore"):
            for j in (0, 1):
                c = self._coeff(j, k + 1)
                h = _U64(splitmix64(body ^ c[:k]).sum()) if k else _U64(0)
                fin = splitmix64(
                    h
                    ^ splitmix64(tail_word ^ c[k])
                    ^ (_U64(n) * _POLY_MULT)
                    ^ codec_h
                    ^ self._seeds[j]
                )
                out.append(int(fin))
        return out[0], out[1]


_IP_MULT = _U64(pow(int(_POLY_MULT), -1, 1 << 64))  # p is odd ⇒ invertible mod 2^64
_TRI_LEN_MIX = _U64(0x9E3779B97F4A7C15)


def canon_word_bounds(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                      np.ndarray]:
    """Canonicalize a batch of texts (lower + trim + whitespace-collapse,
    the DuckDB ``regexp_split_to_array(trim(lower(text)), '\\s+')`` word
    convention) and return vectorized word bounds over ONE shared UTF-8
    buffer — the zero-per-doc-Python substrate under the n-gram kernel and
    the RAG chunker.

    Returns ``(data, ws, we, woff)``: ``data`` the concatenated canonical
    byte buffer, ``ws``/``we`` global start/end byte positions of every
    word, and ``woff`` per-doc word offsets (doc d's words are
    ``ws[woff[d]:woff[d+1]]``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts
    else:
        arr = pa.array(["" if t is None else t for t in texts], pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    canon = pc.utf8_trim(
        pc.replace_substring_regex(
            pc.utf8_lower(pc.fill_null(arr, "")), r"\s+", " "
        ),
        " ",
    )
    canon = canon.combine_chunks() if isinstance(canon, pa.ChunkedArray) else canon
    ndocs = len(canon)
    doc_off = np.frombuffer(canon.buffers()[1], dtype=np.int32,
                            count=ndocs + 1).astype(np.int64)
    base = doc_off[0]
    doc_off = doc_off - base
    total = int(doc_off[-1])
    data = (
        np.frombuffer(canon.buffers()[2], dtype=np.uint8,
                      count=total + base)[base:]
        if total
        else np.empty(0, np.uint8)
    )

    # words: spaces are single + interior after canonicalization, and the
    # 0x20 byte never occurs inside a multi-byte UTF-8 sequence
    sp = np.flatnonzero(data == 0x20)
    doc_len = np.diff(doc_off)
    nonempty = doc_len > 0
    # global word-start/end position arrays (disjoint doc ranges ⇒ a plain
    # sort interleaves doc boundaries and space boundaries correctly)
    ws = np.sort(np.concatenate([doc_off[:-1][nonempty], sp + 1]))
    we = np.sort(np.concatenate([sp, doc_off[1:][nonempty]]))
    n_sp_per_doc = np.diff(np.searchsorted(sp, doc_off))
    nw = np.where(nonempty, n_sp_per_doc + 1, 0)
    woff = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(nw, out=woff[1:])
    return data, ws, we, woff


def word_trigram_hashes(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized word-``n``-gram hashing for a whole batch — the shared
    kernel for the n-gram Jaccard queries (replaces per-doc Python ``split``
    + ``join`` + per-gram string materialization; VERDICT r3 item 5) and,
    with ``n=8``, the benchmark-decontamination query's contamination
    window.

    Semantics match the DuckDB oracle (``regexp_split_to_array(trim(lower(
    text)), '\\s+')`` + ``n``-word windows joined by single spaces): texts
    are lowercased, whitespace runs collapse to one space, and each gram's
    identity is a hash of its canonical byte span — equal gram strings
    hash equal across docs, distinct ones collide at ~2^-64 (the same
    documented trade the string-hash path made).  The hash mixes the span's
    byte length, so grams of different ``n`` cannot alias each other.

    Mechanics: one canonical UTF-8 buffer per batch (zero-copy out of the
    Arrow array), word boundaries found as vectorized space positions,
    and every trigram span hashed O(1) from modular prefix polynomial sums
    (``p`` odd ⇒ invertible mod 2^64, so prefix differences recover any
    span's polynomial hash) — no per-doc Python, no gram strings.

    Returns ``(hashes, offsets)``: ``hashes[offsets[d]:offsets[d+1]]`` are
    doc d's trigram hashes in order (not deduplicated).
    """
    data, ws, we, woff = canon_word_bounds(texts)
    ndocs = len(woff) - 1
    nw = np.diff(woff)

    n_tri = np.maximum(nw - (n - 1), 0)
    offsets = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(n_tri, out=offsets[1:])
    ntotal = int(offsets[-1])
    if ntotal == 0:
        return np.empty(0, _U64), offsets

    tri_doc = np.repeat(np.arange(ndocs), n_tri)
    j = np.arange(ntotal) - np.repeat(offsets[:-1], n_tri)
    w0 = np.repeat(woff[:-1], n_tri) + j
    starts = ws[w0]
    ends = we[w0 + (n - 1)]

    # modular prefix polynomial hashes over the whole batch buffer:
    # C[i] = Σ_{k<i} data[k]·p^{-k};  hash[a,b) = p^{b-1}·(C[b] − C[a])
    with np.errstate(over="ignore"):
        n = data.size
        ipw = np.full(n, _IP_MULT, dtype=_U64)
        ipw[0] = _U64(1)
        np.cumprod(ipw, out=ipw)
        pw = np.full(n, _POLY_MULT, dtype=_U64)
        pw[0] = _U64(1)
        np.cumprod(pw, out=pw)
        C = np.zeros(n + 1, dtype=_U64)
        np.cumsum(data.astype(_U64) * ipw, out=C[1:])
        poly = pw[ends - 1] * (C[ends] - C[starts])
        h = splitmix64(poly ^ (ends - starts).astype(_U64) * _TRI_LEN_MIX)
    return h, offsets
