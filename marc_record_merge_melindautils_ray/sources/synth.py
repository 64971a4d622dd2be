"""Deterministic synthetic clip-corpus generator (seeded).

Produces the ``input_hint`` table shape with planted duplicate families and
per-gate poison rows (FIXTURES.md §2), plus a truth table for the
recall ≥ 0.99 check — the new-engine analog of the reference's golden-file
conformance corpus (``test/cases/``, ``test/MergeUtilsMelinda.spec.js:91-120``).

Families:
  exact           identical bytes + transcript, fresh clip_id
  normtext        transcript differs only outside [a-z0-9åäö] content
                  (normalizing comparator semantics, lib/record-utils.js:228-234)
  transcode       same PCM re-encoded in a different G.711 codec
                  (SNR≥30 dB invariant, BASELINE.json input_hint)
  containment     member A's transcript+audio are a prefix of B's
                  (subset comparator analog, lib/record-utils.js:219-226)
  hotkey          one boilerplate transcript repeated across many rows
                  (skew/salting exercise, BASELINE.json north_rule)
  nearmiss        negative: same length, SNR < 30 dB, transcript edited
  poison-*        negative: one per merge gate V1-V12 analog
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow as pa

from marc_record_merge_melindautils_ray.functions import audio as au
from marc_record_merge_melindautils_ray.schema import CLIPS_SCHEMA

_BASE_WORDS = (
    "talvi kesä järvi metsä saari kaupunki kirja laulu tarina runo "
    "historia suomen kansallinen aika vuosi päivä ilta aamu yö tuuli "
    "meri ranta polku vuori joki silta katu talo ovi ikkuna valo "
    "pimeä lumi sade pilvi aurinko kuu tähti lintu kala karhu "
    "äiti isä lapsi ystävä opettaja kirjailija säveltäjä painos osa nide"
).split()

# extend to a realistic vocabulary size with deterministic Finnish-flavored
# pseudo-words: a 50-word vocabulary makes random transcripts share word
# n-grams at rates no real corpus exhibits (flooding the containment pass
# with unrelated candidates)
_SYLLABLES = (
    "ka ki ko ku la li lo lu ma mi mo mu na ni no nu pa pi po pu "
    "ra ri ro ru sa si so su ta ti to tu va vi vo vu jä jo ly ny "
    "hä hy kä ky lä mä my nä pä py rä ry sä sy tä ty vä vy"
).split()
_WORDS = list(_BASE_WORDS)
for _i in range(2000):
    _s = []
    _x = _i
    for _ in range(3):
        _s.append(_SYLLABLES[_x % len(_SYLLABLES)])
        _x //= len(_SYLLABLES)
    _WORDS.append("".join(_s))

_SOURCES = ["FENNI", "OULA", "TESTI", "HELKA", "JYKDOK", "TAMK"]
_AUTHORS = [
    "Kivi, Aleksis, 1834-1872",
    "Canth, Minna",
    "Leino, Eino",
    "Jansson, Tove",
    "Waltari, Mika",
]


def _rng_for(tag: str, seed: int) -> np.random.Generator:
    h = hashlib.blake2b(f"{seed}:{tag}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "little"))


def _pcm(tag: str, seed: int, n: int, sr: int) -> np.ndarray:
    """Seeded sine+noise mix, amplitude well inside [-1, 1]."""
    rng = _rng_for("pcm:" + tag, seed)
    t = np.arange(n, dtype=np.float32) / sr
    f1, f2 = rng.uniform(80, 900, size=2)
    sig = (
        0.45 * np.sin(2 * np.pi * f1 * t)
        + 0.25 * np.sin(2 * np.pi * f2 * t + rng.uniform(0, 6.28))
        + 0.08 * rng.standard_normal(n)
    )
    return np.clip(sig, -0.98, 0.98).astype(np.float32)


def _transcript(tag: str, seed: int, n_words: int = 0) -> str:
    rng = _rng_for("txt:" + tag, seed)
    k = n_words or int(rng.integers(6, 16))
    return " ".join(rng.choice(_WORDS, size=k))


def _mangle_text(text: str, tag: str, seed: int) -> str:
    """Change case/punctuation/whitespace only — normalized form unchanged."""
    rng = _rng_for("mangle:" + tag, seed)
    words = text.split()
    out = []
    for w in words:
        r = rng.random()
        if r < 0.3:
            w = w.upper()
        elif r < 0.5:
            w = w.capitalize()
        if rng.random() < 0.3:
            w = w + rng.choice([",", ".", "!", ";"])
        out.append(w)
    sep = "  " if rng.random() < 0.5 else " "
    return sep.join(out) + (" " if rng.random() < 0.5 else "")


class CorpusBuilder:
    def __init__(self, seed: int = 42):
        self.seed = seed
        self.rows: list[dict] = []
        self.truth: list[dict] = []          # (clip_id, truth_cluster)
        self.golden_pairs: list[dict] = []   # FIXTURES §3 pair-verdict table
        self._n = itertools.count()

    def _cid(self, prefix: str = "c") -> str:
        return f"{prefix}{next(self._n):07d}"

    def add_row(
        self,
        pcm: np.ndarray,
        sr: int,
        codec: str,
        transcript: str,
        truth_cluster: str | None = None,
        *,
        clip_id: str | None = None,
        status: str = "active",
        sources: list[str] | None = None,
        source_links: list[dict] | None = None,
        is_segment_of: str | None = None,
        author_label: str | None = None,
        author_type: str | None = None,
        edition_note: str | None = None,
        payload: bytes | None = None,
    ) -> str:
        cid = clip_id or self._cid()
        rng = _rng_for("meta:" + cid, self.seed)
        if sources is None:
            sources = list(rng.choice(_SOURCES, size=int(rng.integers(1, 3)), replace=False))
        self.rows.append(
            {
                "clip_id": cid,
                "bytes": payload if payload is not None else au.encode(pcm, codec),
                "sr_hz": sr,
                "dur_ms": int(len(pcm) * 1000 / sr),
                "codec": codec,
                "transcript": transcript,
                "status": status,
                "sources": sources,
                "source_links": source_links or [],
                "is_segment_of": is_segment_of,
                "author_label": author_label,
                "author_type": author_type if author_type or not author_label else "person",
                "edition_note": edition_note,
            }
        )
        self.truth.append({"clip_id": cid, "truth_cluster": truth_cluster})
        return cid

    # ------------------------------------------------------------- families
    def family(self, kind: str, fam_idx: int) -> None:
        seed = self.seed
        tag = f"{kind}:{fam_idx}"
        sr = 8000
        rng = _rng_for("fam:" + tag, seed)
        n = int(rng.integers(4000, 16000))
        pcm = _pcm(tag, seed, n, sr)
        text = _transcript(tag, seed)
        fam = f"fam-{kind}-{fam_idx}"

        # members of a positive family must carry DISJOINT sources: the
        # reference rejects pairs sharing a LOW‡a source library (V3,
        # lib/mergeability-validators.js:52-67), so overlapping sources on
        # true dups would be a self-inflicted recall loss.
        s0, s1 = [_SOURCES[fam_idx % 3]], [_SOURCES[3 + fam_idx % 3]]

        def _orient(x, y):
            """Golden pairs fix roles like the reference call site does
            (lib/marc-record-merge-melindautils.js:74); the priority-source
            member must sit on the preferred side or V4 fires by design."""
            return (y, x) if "FENNI" in s0 else (x, y)

        if kind == "exact":
            a = self.add_row(pcm, sr, "pcm16", text, fam, sources=s0)
            b = self.add_row(pcm, sr, "pcm16", text, fam, sources=s1)
            po, pp = _orient(a, b)
            self.golden_pairs.append(
                {"case": tag, "id_other": po, "id_preferred": pp, "expected_ok": True, "expected_reasons": []}
            )
        elif kind == "normtext":
            a = self.add_row(pcm, sr, "pcm16", text, fam, sources=s0)
            b = self.add_row(pcm, sr, "pcm16", _mangle_text(text, tag, seed), fam, sources=s1)
            po, pp = _orient(a, b)
            self.golden_pairs.append(
                {"case": tag, "id_other": po, "id_preferred": pp, "expected_ok": True, "expected_reasons": []}
            )
        elif kind == "transcode":
            a = self.add_row(pcm, sr, "pcm16", text, fam, sources=s0)
            b = self.add_row(pcm, sr, "ulaw", text, fam, sources=s1)
            po, pp = _orient(a, b)
            self.golden_pairs.append(
                {"case": tag, "id_other": po, "id_preferred": pp, "expected_ok": True, "expected_reasons": []}
            )
        elif kind == "containment":
            cut = int(len(pcm) * rng.uniform(0.4, 0.7))
            words = text.split()
            prefix_text = " ".join(words[: max(3, len(words) // 2)])
            b = self.add_row(pcm, sr, "pcm16", text, fam, sources=s0)
            a = self.add_row(pcm[:cut], sr, "pcm16", prefix_text, fam, sources=s1)
        elif kind == "hotkey":
            boiler = "tämä on vakioteksti ilmoitus arkiston kaikille riveille sama sisältö aina"
            size = int(rng.integers(8, 16))
            for i in range(size):
                p = _pcm(f"{tag}:{i}", seed, n, sr)
                # same transcript; audio identical within sub-pairs
                self.add_row(
                    p if i % 2 == 0 else _pcm(f"{tag}:{i-1}", seed, n, sr),
                    sr, "pcm16", boiler, f"{fam}-{i//2}",
                    sources=[_SOURCES[i % len(_SOURCES)]] if i % 2 == 0 else [_SOURCES[(i + 3) % len(_SOURCES)]],
                )
        elif kind == "resample":
            # cross-sample-rate duplicate: the SAME signal distributed at
            # 8 kHz and (linear-interp upsampled) 16 kHz — verify must
            # conform rates before the samplewise SNR gate or this true dup
            # reads as a duration mismatch
            from marc_record_merge_melindautils_ray.functions.audio import (
                resample_linear,
            )

            a = self.add_row(pcm, sr, "pcm16", text, fam, sources=s0)
            up = resample_linear(pcm, sr, 2 * sr)
            b = self.add_row(up, 2 * sr, "pcm16", text, fam, sources=s1)
            po, pp = _orient(a, b)
            self.golden_pairs.append(
                {"case": tag, "id_other": po, "id_preferred": pp,
                 "expected_ok": True, "expected_reasons": []}
            )
        elif kind == "nearmiss":
            a = self.add_row(pcm, sr, "pcm16", text, None, sources=s0)
            noisy = np.clip(pcm + 0.2 * _pcm(tag + ":noise", seed, n, sr), -1, 1)
            words = text.split()
            rng.shuffle(words)
            b = self.add_row(noisy, sr, "pcm16", " ".join(words[:-2]), None, sources=s1)
            self.golden_pairs.append(
                {"case": tag, "id_other": a, "id_preferred": b, "expected_ok": False,
                 "expected_reasons": ["transcript-mismatch"]}
            )
        else:
            raise ValueError(kind)

    def poison(self, gate: str, idx: int) -> None:
        """Two rows that are signature-identical dups EXCEPT for one failing
        merge gate — must NOT cluster.  One per gate analog (SURVEY.md §2.2)."""
        tag = f"poison-{gate}:{idx}"
        sr = 8000
        rng = _rng_for("fam:" + tag, self.seed)
        pcm = _pcm(tag, self.seed, int(rng.integers(4000, 12000)), sr)
        text = _transcript(tag, self.seed)
        kw_a: dict = {}
        kw_b: dict = {}
        reason = {
            "duration": "duration-mismatch",
            "author-type": "author-type-mismatch",
        }.get(gate, gate)
        if gate == "deleted":         # V1: isDeleted (lib/record-utils.js:372-387)
            kw_b["status"] = "deleted"
        elif gate == "suppressed":    # V2: recordsNotSuppressed (lib/record-utils.js:364-370)
            kw_b["status"] = "suppressed"
        elif gate == "same-source":   # V3: noSameLOWTags (lib/mergeability-validators.js:52-67)
            kw_a["sources"] = ["TESTI"]
            kw_b["sources"] = ["TESTI", "OULA"]
        elif gate == "codec-class":   # V5: sameType (lib/mergeability-validators.js:82-92)
            kw_b["payload"] = au.encode(pcm, "pcm16")  # undecodable foreign class, raw stored
            kw_b["codec"] = None  # handled below
        elif gate == "segment-of":    # V12: notComponentRecord (lib/mergeability-validators.js:237-252)
            kw_b["is_segment_of"] = "someparent"
        elif gate == "malformed":     # V9: noAlephMultifields (lib/mergeability-validators.js:134-150)
            pass  # transcript prefixed below
        elif gate == "duration":      # V10: same300TypeAndCount (lib/mergeability-validators.js:152-178)
            pass  # second row gets different duration below
        elif gate == "author-type":   # V8: sameAuthorType 100/110/111 count equality
            #                           (lib/mergeability-validators.js:117-133)
            kw_a["author_label"] = "Testaaja, Tiina"
            kw_a["author_type"] = "person"
            kw_b["author_label"] = "Testiorganisaatio"
            kw_b["author_type"] = "org"
        else:
            raise ValueError(gate)

        # disjoint sources by default so only the intended gate fires
        kw_a.setdefault("sources", ["OULA"])
        kw_b.setdefault("sources", ["HELKA"])
        a = self.add_row(pcm, sr, "pcm16", text, None, **{k: v for k, v in kw_a.items() if k != "payload"})
        if gate == "codec-class":
            b = self.add_row(pcm, sr, "fm-synth", text, None, payload=au.encode(pcm, "pcm16"))
        elif gate == "malformed":
            b = self.add_row(pcm, sr, "pcm16", "^^" + text, None)
        elif gate == "duration":
            b = self.add_row(np.concatenate([pcm, pcm]), sr, "pcm16", text, None)
        else:
            kw_b.pop("payload", None)
            kw_b.pop("codec", None)
            b = self.add_row(pcm, sr, "pcm16", text, None, **kw_b)
        self.golden_pairs.append(
            {"case": tag, "id_other": a, "id_preferred": b, "expected_ok": False,
             "expected_reasons": [reason]}
        )

    def singletons(self, count: int) -> None:
        for i in range(count):
            tag = f"single:{i}"
            sr = int(_rng_for("sr:" + tag, self.seed).choice([8000, 16000]))
            rng = _rng_for("fam:" + tag, self.seed)
            pcm = _pcm(tag, self.seed, int(rng.integers(4000, 16000)), sr)
            author = _AUTHORS[i % len(_AUTHORS)] if i % 3 == 0 else None
            note = f"{1 + i % 4}. painos" if i % 5 == 0 else None
            self.add_row(
                pcm, sr, str(np.random.default_rng(i).choice(["pcm16", "ulaw", "alaw", "f32"])),
                _transcript(tag, self.seed), None, author_label=author, edition_note=note,
            )

    # ---------------------------------------------------------------- output
    def tables(self) -> tuple[pa.Table, pa.Table, pa.Table]:
        clips = pa.Table.from_pylist(self.rows, schema=CLIPS_SCHEMA)
        truth = pa.Table.from_pylist(
            self.truth,
            schema=pa.schema([("clip_id", pa.string()), ("truth_cluster", pa.string())]),
        )
        golden = pa.Table.from_pylist(
            self.golden_pairs,
            schema=pa.schema(
                [
                    ("case", pa.string()),
                    ("id_other", pa.string()),
                    ("id_preferred", pa.string()),
                    ("expected_ok", pa.bool_()),
                    ("expected_reasons", pa.list_(pa.string())),
                ]
            ),
        )
        return clips, truth, golden


def make_corpus(
    n_families: int = 20, n_singletons: int = 60, seed: int = 42, with_poison: bool = True
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Build (clips, truth, golden_pairs) deterministic tables."""
    b = CorpusBuilder(seed)
    kinds = ["exact", "normtext", "transcode", "containment", "nearmiss", "resample"]
    for i in range(n_families):
        b.family(kinds[i % len(kinds)], i)
    b.family("hotkey", n_families)
    if with_poison:
        for i, gate in enumerate(
            ["deleted", "suppressed", "same-source", "codec-class", "segment-of", "malformed", "duration", "author-type"]
        ):
            b.poison(gate, i)
    b.singletons(n_singletons)
    return b.tables()


def write_corpus(out_dir: str, **kwargs) -> None:
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    clips, truth, golden = make_corpus(**kwargs)
    pq.write_table(clips, os.path.join(out_dir, "clips.parquet"))
    pq.write_table(truth, os.path.join(out_dir, "truth.parquet"))
    pq.write_table(golden, os.path.join(out_dir, "golden_pairs.parquet"))


def make_shifted_corpus(
    n_pairs: int = 20, seed: int = 7
) -> tuple[pa.Table, pa.Table]:
    """Corpus of TIME-SHIFTED duplicate pairs (the re-broadcast / padded-
    intro case the samplewise SNR gate rejects by design): member B is
    member A front-padded with ``true_lag_ms`` of silence, same transcript.
    Every third pair is ulaw-encoded (lossy round-trip) so alignment is
    exercised off the exact-bytes path.  Also plants same-transcript
    INDEPENDENT-signal distractor pairs (``true_lag_ms`` = -1 in the truth
    table) that blocking must propose and alignment must reject.

    Returns ``(clips, pairs_truth)`` — truth rows are
    (id_a, id_b, true_lag_ms)."""
    b = CorpusBuilder(seed)
    truth_pairs: list[dict] = []
    for i in range(n_pairs):
        tag = f"shift:{i}"
        sr = 8000
        rng = _rng_for("shiftfam:" + tag, seed)
        n = int(rng.integers(6000, 12000))
        pcm = _pcm(tag, seed, n, sr)
        text = _transcript(tag, seed)
        codec = "ulaw" if i % 3 == 2 else "pcm16"
        # lag in whole milliseconds so true_lag_ms is exact at 8 kHz
        lag_ms = int(rng.integers(50, 400))
        shifted = np.concatenate(
            [np.zeros(lag_ms * sr // 1000, np.float32), pcm])
        a = b.add_row(pcm, sr, codec, text, f"fam-shift-{i}")
        bb = b.add_row(shifted, sr, codec, text, f"fam-shift-{i}")
        truth_pairs.append({"id_a": a, "id_b": bb, "true_lag_ms": lag_ms})
    for i in range(max(1, n_pairs // 2)):
        tag = f"shiftneg:{i}"
        sr = 8000
        rng = _rng_for("shiftneg:" + tag, seed)
        n = int(rng.integers(6000, 12000))
        text = _transcript(tag, seed)
        a = b.add_row(_pcm(tag + ":a", seed, n, sr), sr, "pcm16", text, None)
        bb = b.add_row(_pcm(tag + ":b", seed, n, sr), sr, "pcm16", text, None)
        truth_pairs.append({"id_a": a, "id_b": bb, "true_lag_ms": -1})
    clips, _, _ = b.tables()
    return clips, pa.Table.from_pylist(truth_pairs)
