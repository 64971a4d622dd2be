"""Property-based pins for the session's new kernels: xcorr_lag against a
naive O(n·lag) reference, VAD against a brute-force run-scan, CMS against a
dict counter."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def naive_best_lag(a: np.ndarray, b: np.ndarray) -> tuple[int, float]:
    """O(n·lag) exhaustive cross-correlation argmax (ties: first hit in
    the same scan order the kernel uses: lags 0..lb-1 then -(la-1)..-1)."""
    best_lag, best = 0, -np.inf
    for lag in list(range(len(b))) + [-x for x in range(len(a) - 1, 0, -1)]:
        if lag >= 0:
            n = min(len(a), len(b) - lag)
            v = float(np.dot(a[:n], b[lag:lag + n])) if n > 0 else -np.inf
        else:
            n = min(len(b), len(a) + lag)
            v = float(np.dot(a[-lag:-lag + n], b[:n])) if n > 0 else -np.inf
        if v > best + 1e-9:
            best, best_lag = v, lag
    return best_lag, best


@settings(max_examples=40, deadline=None)
@given(st.integers(2, 60), st.integers(2, 60), st.integers(0, 2 ** 31 - 1))
def test_xcorr_matches_naive(la, lb, seed):
    from marc_record_merge_melindautils_ray.ops.audio_align import xcorr_lag

    rng = np.random.default_rng(seed)
    a = rng.standard_normal(la).astype(np.float32)
    b = rng.standard_normal(lb).astype(np.float32)
    lag, corr = xcorr_lag(a, b)
    want_lag, want_val = naive_best_lag(a.astype(np.float64), b.astype(np.float64))
    # the FFT peak VALUE must match the exhaustive max (the argmax can
    # differ only between float-tied peaks)
    def val_at(lag):
        if lag >= 0:
            n = min(la, lb - lag)
            return float(np.dot(a[:n].astype(np.float64), b[lag:lag + n]))
        n = min(lb, la + lag)
        return float(np.dot(a[-lag:-lag + n].astype(np.float64), b[:n]))
    assert abs(val_at(lag) - want_val) < 1e-4 * max(1.0, abs(want_val))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=40),
       st.integers(0, 3), st.integers(1, 4))
def test_vad_matches_bruteforce_runs(frames, bridge, min_frames):
    """Frame-level activity pattern → the kernel's segments must equal a
    straightforward bridge-then-filter run scan."""
    from marc_record_merge_melindautils_ray.ops.audio_features import vad_segments_row

    sr, fms = 8000, 20
    spf = sr * fms // 1000
    pcm = np.concatenate([
        (0.5 * np.ones(spf) if f else np.zeros(spf)).astype(np.float32)
        for f in frames
    ])
    got = [(s, e) for s, e, _ in vad_segments_row(
        pcm, sr, frame_ms=fms, bridge_frames=bridge, min_frames=min_frames)]

    act = list(frames)
    idx = [i for i, f in enumerate(act) if f]
    for a, b in zip(idx, idx[1:]):          # bridge interior gaps
        if 0 < b - a - 1 <= bridge:
            for j in range(a + 1, b):
                act[j] = True
    want = []
    i = 0
    while i < len(act):
        if act[i]:
            j = i
            while j < len(act) and act[j]:
                j += 1
            if j - i >= min_frames:
                want.append((i * fms, j * fms))
            i = j
        else:
            i += 1
    assert got == want


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.text(min_size=1, max_size=6),
                          st.integers(1, 50)), min_size=0, max_size=60))
def test_cms_never_undercounts_property(items):
    from marc_record_merge_melindautils_ray.ops.sketches import _cms_partial, cms_query

    agg: dict[str, int] = {}
    for k, w in items:
        agg[k] = agg.get(k, 0) + w
    keys = np.array(list(agg), object)
    if len(keys) == 0:
        return
    cms = _cms_partial(
        np.array([k for k, _ in items], object),
        np.array([w for _, w in items], np.int64), d=2, w=32)
    est = cms_query(cms, keys, w=32)
    true = np.array([agg[k] for k in keys], np.int64)
    assert (est >= true).all()
    assert est.sum() <= true.sum() * len(keys) + 1  # crude sanity ceiling
