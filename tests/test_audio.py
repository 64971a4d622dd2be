"""Codec round-trips, SNR invariant, fingerprints, segment search."""

import numpy as np
import pytest

from marc_record_merge_melindautils_ray.functions import audio as au


def _pcm(n=8000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    return np.clip(sig, -0.98, 0.98).astype(np.float32)


@pytest.mark.parametrize("codec,min_snr", [("pcm16", 80), ("ulaw", 31), ("alaw", 31), ("f32", 1e9)])
def test_codec_roundtrip_snr(codec, min_snr):
    pcm = _pcm()
    dec = au.decode(au.encode(pcm, codec), codec)
    assert au.snr_db(pcm, dec) >= min_snr  # companded codecs clear the 30 dB dup bar


def test_unknown_codec_stubbed():
    with pytest.raises(NotImplementedError):
        au.encode(_pcm(100), "mp3")
    with pytest.raises(NotImplementedError):
        au.decode(b"xx", "opus")
    assert not au.is_decodable("mp3")


def test_snr_edge_cases():
    p = _pcm(1000)
    assert au.snr_db(p, p) == float("inf")
    assert au.snr_db(p, p[:500]) == float("-inf")   # length mismatch
    assert au.snr_db(np.zeros(0, np.float32), np.zeros(0, np.float32)) == float("-inf")


def test_fingerprint_transcode_stable_and_discriminative():
    fper = au.AudioFingerprinter(64, 64, 1)
    p = _pcm(12000, seed=1)
    f_ref = fper.fingerprint(p)
    f_ulaw = fper.fingerprint(au.decode(au.encode(p, "ulaw"), "ulaw"))
    assert au.hamming64(f_ref, f_ulaw)[0] <= 2      # companding barely moves it
    f_other = fper.fingerprint(_pcm(12000, seed=2))
    assert au.hamming64(f_ref, f_other)[0] > 10     # unrelated audio is far


def test_find_segment():
    p = _pcm(16000, seed=3)
    seg = p[5000:11000]
    assert au.find_segment(seg, p, 30.0) == 5000
    noise = _pcm(6000, seed=4)
    assert au.find_segment(noise, p, 30.0) == -1
    assert au.find_segment(p, seg, 30.0) == -1      # short/long swapped


def test_hamming_vectorized():
    a = np.array([0, 0xFF, 2**63], dtype=np.uint64)
    b = np.array([0, 0x0F, 0], dtype=np.uint64)
    assert au.hamming64(a, b).tolist() == [0, 4, 1]
