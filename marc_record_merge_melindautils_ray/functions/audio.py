"""Audio codecs, PCM comparison, and SimHash fingerprints.

The reference compares records structurally; the audio analog fixed by
``BASELINE.json`` ``input_hint`` is: decode both payloads to PCM and require
allclose at SNR ≥ 30 dB (plus transcript equality) for a verified duplicate.

Real, self-contained codecs (public algorithms, implemented in NumPy):

* ``pcm16`` — 16-bit little-endian linear PCM (≈96 dB SNR)
* ``ulaw`` / ``alaw`` — 8-bit G.711 companding (≈35-38 dB SNR — above the
  30 dB duplicate threshold, so transcodes of the same PCM verify as dups)
* ``f32`` — float32 little-endian (lossless)

Codecs this container lacks libraries for (mp3/opus/…) are gated behind a
clearly-marked ``NotImplementedError`` stub; the Ray-side plumbing (actor
signature, batch sizing, schema) is identical either way.
"""

from __future__ import annotations

import numpy as np

_MU = 255.0
_A = 87.6


# --------------------------------------------------------------------- codecs
def encode(pcm: np.ndarray, codec: str) -> bytes:
    """float32 PCM in [-1, 1] → encoded payload bytes."""
    pcm = np.asarray(pcm, dtype=np.float32)
    if codec == "pcm16":
        return (np.clip(pcm, -1, 1) * 32767.0).astype("<i2").tobytes()
    if codec == "f32":
        return pcm.astype("<f4").tobytes()
    if codec == "ulaw":
        x = np.clip(pcm, -1, 1)
        y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
        return np.round((y + 1.0) * 127.5).astype(np.uint8).tobytes()
    if codec == "alaw":
        x = np.clip(pcm, -1, 1)
        ax = np.abs(x)
        y = np.where(
            ax < 1.0 / _A,
            _A * ax / (1.0 + np.log(_A)),
            (1.0 + np.log(_A * np.clip(ax, 1.0 / _A, None))) / (1.0 + np.log(_A)),
        )
        y = np.sign(x) * y
        return np.round((y + 1.0) * 127.5).astype(np.uint8).tobytes()
    raise NotImplementedError(
        f"codec {codec!r}: no encoder in this environment (stubbed; see module docstring)"
    )


def _g711_lut(codec: str) -> np.ndarray:
    """256-entry float32 decode table for an 8-bit G.711 codec.

    Built once per process by running the formula decoder over every code
    value (so table entries are bit-identical to the formula path), then
    decode is a single gather — no per-sample transcendentals in the
    phase-2 hot loop (measured ~6x faster than the expm1/exp chain)."""
    codes = np.arange(256, dtype=np.uint8)
    y = codes.astype(np.float32) / 127.5 - 1.0
    if codec == "ulaw":
        lut = np.sign(y) * (np.expm1(np.abs(y) * np.log1p(_MU))) / _MU
    else:  # alaw
        ay = np.abs(y)
        lim = 1.0 / (1.0 + np.log(_A))
        x = np.where(
            ay < lim,
            ay * (1.0 + np.log(_A)) / _A,
            np.exp(ay * (1.0 + np.log(_A)) - 1.0) / _A,
        )
        lut = np.sign(y) * x
    return lut.astype(np.float32)


_LUTS: dict[str, np.ndarray] = {}


def decode(payload: bytes, codec: str) -> np.ndarray:
    """Encoded payload bytes → float32 PCM in [-1, 1]."""
    if codec == "pcm16":
        # single fused pass: int16 view -> float32 divide, one output buffer
        # (true divide, not reciprocal-multiply — keeps the ~96 dB codec SNR)
        return np.divide(
            np.frombuffer(payload, dtype="<i2"),
            np.float32(32767.0),
            dtype=np.float32,
        )
    if codec == "f32":
        return np.frombuffer(payload, dtype="<f4").astype(np.float32)
    if codec in ("ulaw", "alaw"):
        lut = _LUTS.get(codec)
        if lut is None:
            lut = _LUTS[codec] = _g711_lut(codec)
        return lut[np.frombuffer(payload, dtype=np.uint8)]
    raise NotImplementedError(
        f"codec {codec!r}: no decoder in this environment (stubbed; see module docstring)"
    )


def is_decodable(codec: str) -> bool:
    return codec in ("pcm16", "f32", "ulaw", "alaw")


def resample_linear(pcm: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Linear-interpolation resample (np.interp, endpoints clamped) — the
    same kernel as the payload-axis ``clip_resample`` transform, exposed here
    so cross-sample-rate duplicate pairs can be verified at a common rate.
    Exact round-trip for integer-ratio upsamples (the output grid contains
    the input instants)."""
    if sr_from == sr_to or len(pcm) == 0:
        return pcm
    n_out = max(1, int(round(len(pcm) * sr_to / sr_from)))
    t_in = np.arange(len(pcm), dtype=np.float64) / sr_from
    t_out = np.arange(n_out, dtype=np.float64) / sr_to
    return np.interp(t_out, t_in, pcm.astype(np.float64)).astype(np.float32)


# ----------------------------------------------------------------- comparison
def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against ``ref`` in dB.

    Same-length requirement is part of the invariant; mismatched lengths are
    handled by the containment path (``find_segment``), not here.
    """
    if ref.shape != test.shape or ref.size == 0:
        return float("-inf")
    # einsum in the native dtype: identical to 4 decimals at 30 dB across
    # 1e-3..1e3 amplitudes vs the float64-cast sum-of-squares, without the
    # float64 temps.  Deliberately NOT np.dot: this runs inside ~30 verify
    # actors at once, and OpenBLAS (pthreads build) spin-waits its pool
    # between calls — measured as a 2x phase-2 stage regression from cross-
    # actor CPU theft; einsum is always single-threaded
    d = ref - test
    noise = float(np.einsum("i,i->", d, d))
    signal = float(np.einsum("i,i->", ref, ref))
    if noise == 0.0:
        return float("inf")
    if signal == 0.0:
        return float("-inf")
    return 10.0 * np.log10(signal / noise)


_SNR_CHUNK = 1 << 16  # 64 Ki samples = 256 KiB float32 — diff temp stays in L2


def snr_gate(ref: np.ndarray, test: np.ndarray, min_snr_db: float) -> tuple[bool, float]:
    """SNR-vs-threshold decision with identical verdicts to
    ``snr_db(ref, test) >= min_snr_db`` at a fraction of the DRAM traffic —
    phase-2's hot kernel (VERDICT r3: the stage is memory-bandwidth-bound).

    * **Chunked fusion**: the ``ref-test`` diff temp is chunk-sized and stays
      in cache instead of round-tripping a full-length temp through DRAM
      (~20 B/sample → ~12 B/sample for pairs that need the full pass).
    * **Sound early reject**: noise energy only grows, so the pass is
      abandoned the moment accumulated noise alone already forces
      ``snr < min_snr_db`` (noise budget = signal · 10^(−τ/10)).  Unrelated
      clips — the LSH false-positive pairs this stage exists to reject —
      cross the 30 dB budget within the first chunk, cutting their cost to
      the signal-energy pass plus one chunk (~4 B/sample).

    Returns ``(ok, snr)``; for early-rejected pairs ``snr`` is the partial
    value at abandonment (strictly below threshold by construction; the
    pipeline drops non-ok rows, so only the verdict is load-bearing).
    Chunk partials accumulate in float64 — at least as accurate as the
    single float32 einsum ``snr_db`` uses.
    """
    if ref.shape != test.shape or ref.size == 0:
        return False, float("-inf")
    signal = float(np.einsum("i,i->", ref, ref))
    if signal == 0.0:
        return False, float("-inf")
    budget = signal * 10.0 ** (-min_snr_db / 10.0)
    noise = 0.0
    n = ref.size
    for lo in range(0, n, _SNR_CHUNK):
        d = ref[lo:lo + _SNR_CHUNK] - test[lo:lo + _SNR_CHUNK]
        noise += float(np.einsum("i,i->", d, d))
        if noise > budget:
            return False, 10.0 * float(np.log10(signal / noise))
    if noise == 0.0:
        return True, float("inf")
    s = 10.0 * float(np.log10(signal / noise))
    return s >= min_snr_db, s


def snr_gate_i16(ref: np.ndarray, test: np.ndarray,
                 min_snr_db: float) -> tuple[bool, float]:
    """``snr_gate`` over RAW int16 samples — phase-2's pcm16↔pcm16 fast
    kernel.  SNR is a ratio, so the decode's ``/32767`` scale cancels:
    integer energy sums give the mathematically exact SNR the float32 path
    approximates (float32 decode rounds each sample to ~1e-7 relative, a
    <0.001 dB wobble), at HALF the bytes/sample (2 B int16 views straight
    off the plasma buffer vs 4 B float32 plus the one-time decode write) —
    the stage is DRAM-bound, so bytes/sample is wall time (VERDICT r4
    item 2).  Same chunked early-reject contract as ``snr_gate``; integer
    partials are exact (chunk energy ≤ 2^16 samples × 32767² < 2^47)."""
    if ref.shape != test.shape or ref.size == 0:
        return False, float("-inf")
    signal = 0
    n = ref.size
    for lo in range(0, n, _SNR_CHUNK):
        x = ref[lo:lo + _SNR_CHUNK].astype(np.int32)
        signal += int(np.einsum("i,i->", x, x, dtype=np.int64))
    if signal == 0:
        return False, float("-inf")
    budget = signal * 10.0 ** (-min_snr_db / 10.0)
    noise = 0
    for lo in range(0, n, _SNR_CHUNK):
        d = (ref[lo:lo + _SNR_CHUNK].astype(np.int32)
             - test[lo:lo + _SNR_CHUNK].astype(np.int32))
        noise += int(np.einsum("i,i->", d, d, dtype=np.int64))
        if noise > budget:
            return False, 10.0 * float(np.log10(signal / noise))
    if noise == 0:
        return True, float("inf")
    s = 10.0 * float(np.log10(signal / noise))
    return s >= min_snr_db, s


def find_segment(short: np.ndarray, long: np.ndarray, min_snr_db: float) -> int:
    """Locate ``short`` as a contiguous segment of ``long`` (containment dup).

    FFT cross-correlation picks the best-aligned offset in O(n log n); the
    SNR check at that offset decides.  Returns the offset, or -1.
    """
    n, m = len(long), len(short)
    if m == 0 or m > n:
        return -1
    # exact-prefix offset 0 is the common containment case — one cheap SNR
    # check short-circuits the (ms-scale) FFT for it; any offset meeting the
    # SNR bar is a valid containment detection, so answering 0 early is exact
    if snr_gate(short, long[:m], min_snr_db)[0]:
        return 0
    # pad to a power of two: np.fft falls back to Bluestein for sizes with
    # large prime factors (n+m is arbitrary here), measured several-fold
    # slower than the padded transform; correlation lags [0, n-m] are
    # unaffected by any pad ≥ n+m-1
    size = 1 << (n + m - 1).bit_length()
    corr = np.fft.irfft(
        np.fft.rfft(long, size) * np.conj(np.fft.rfft(short, size)), size
    )[: n - m + 1]
    off = int(np.argmax(corr))
    if snr_gate(short, long[off : off + m], min_snr_db)[0]:
        return off
    return -1


# --------------------------------------------------------------- fingerprints
class AudioFingerprinter:
    """PCM → 64-bit SimHash sketch via sign random projection.

    Feature: log-RMS energy envelope over ``fp_frames`` equal windows
    (amplitude-normalized) — stable under G.711 companding noise, so the same
    underlying PCM fingerprints identically across codecs; unrelated audio
    lands far away in Hamming distance.  The projection matrix is seeded and
    built once per worker (stateful-actor state).
    """

    def __init__(self, fp_frames: int = 64, bits: int = 64, seed: int = 0xF00D):
        self.fp_frames = fp_frames
        self.bits = bits
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((fp_frames, bits)).astype(np.float32)
        self._powers = (np.uint64(1) << np.arange(bits, dtype=np.uint64))

    def envelope(self, pcm: np.ndarray) -> np.ndarray:
        f = self.fp_frames
        if pcm.size == 0:
            return np.zeros(f, dtype=np.float32)
        # pad to a multiple of f, then per-window RMS
        n = int(np.ceil(pcm.size / f)) * f
        buf = np.zeros(n, dtype=np.float32)
        buf[: pcm.size] = pcm
        m = buf.reshape(f, -1)
        # einsum sums squares per window without materializing the squared
        # temp (this runs once per clip in the fused feature pool — the other
        # partly bandwidth-bound stage)
        e = np.sqrt(np.einsum("ij,ij->i", m, m) / m.shape[1])
        scale = e.max()
        if scale > 0:
            e = e / scale
        return np.log1p(e * 100.0)

    def fingerprint(self, pcm: np.ndarray) -> int:
        feats = self.envelope(pcm)
        feats = feats - feats.mean()
        bits = (feats @ self.proj) > 0
        return int((bits.astype(np.uint64) * self._powers).sum())


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a, b) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprint arrays
    (byte-table popcount; no np.bitwise_count in numpy 1.x)."""
    x = np.bitwise_xor(
        np.atleast_1d(np.asarray(a, dtype=np.uint64)),
        np.atleast_1d(np.asarray(b, dtype=np.uint64)),
    )
    return _POP8[x.view(np.uint8).reshape(x.size, 8)].sum(axis=1).astype(np.int32)
