"""Stage 1: row pre-filters + transcript normalization.

Pure stateless ``map_batches`` kernel over zero-copy Arrow batches.  Applies
the reference's *unary* merge gates as row filters before any signature work
(cheapest possible point — filtered rows never reach a shuffle):

* V1 ``isDeleted``  — status 'deleted'   (``lib/record-utils.js:372-387``)
* V2 ``recordsNotSuppressed`` — status 'suppressed' (``lib/record-utils.js:364-370``)
* V9 ``noAlephMultifields`` — '^^' continuation-marker payloads
  (``lib/mergeability-validators.js:134-150``)

and adds the derived columns every later stage shares:

* ``norm_transcript`` — U8 normalization (``lib/record-utils.js:231-233``)
* ``nh0``/``nh1``     — two independent 64-bit content hashes of the
  normalized transcript (128 bits total: safe against birthday collisions at
  10^12 rows)
* ``codec_cls``       — leader/6 record-type analog (V5)
* ``has_diacritics``  — U15 charset-richness scalar (used for preferred-member
  ranking, the V7 analog)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from marc_record_merge_melindautils_ray.functions.hashing import stable_str_hash
from marc_record_merge_melindautils_ray.functions.textnorm import (
    has_diacritics_array,
    malformed_array,
    normalize_transcript_array,
)
from marc_record_merge_melindautils_ray.schema import CODEC_CLASS


def codec_class_array(codec: pa.Array) -> pa.Array:
    """Vectorized codec → class mapping; unknown codecs are their own class."""
    out = codec
    for k, v in CODEC_CLASS.items():
        out = pc.replace_substring_regex(out, f"^{k}$", v)
    return out


def prepare_batch(batch: pa.Table) -> pa.Table:
    """Filter tombstoned/malformed rows, add normalization + hash columns."""
    tr = batch["transcript"]
    if isinstance(tr, pa.ChunkedArray):
        tr = tr.combine_chunks()
    status = batch["status"] if "status" in batch.column_names else pa.nulls(len(batch), pa.string())

    alive = pc.or_kleene(
        pc.is_null(status),
        pc.invert(pc.is_in(pc.utf8_lower(pc.fill_null(status, "active")),
                           value_set=pa.array(["deleted", "suppressed"]))),
    )
    ok = pc.and_(pc.fill_null(alive, True), pc.invert(pc.fill_null(malformed_array(tr), False)))
    batch = batch.filter(ok)
    if len(batch) == 0:
        return _with_derived(batch, pa.array([], pa.string()))

    tr = batch["transcript"]
    if isinstance(tr, pa.ChunkedArray):
        tr = tr.combine_chunks()
    norm = normalize_transcript_array(pc.fill_null(tr, ""))
    return _with_derived(batch, norm)


def _with_derived(batch: pa.Table, norm: pa.Array) -> pa.Table:
    # optional metadata columns a user corpus may omit (null = absent)
    for opt in ("author_type", "author_label", "is_segment_of"):
        if opt not in batch.column_names:
            batch = batch.append_column(opt, pa.nulls(len(batch), pa.string()))
    texts = norm.to_pylist() if len(batch) else []
    nh0 = stable_str_hash(texts, seed=0) if texts else np.empty(0, np.uint64)
    nh1 = stable_str_hash(texts, seed=0xD1CE) if texts else np.empty(0, np.uint64)
    codec = batch["codec"] if "codec" in batch.column_names else pa.nulls(len(batch), pa.string())
    if isinstance(codec, pa.ChunkedArray):
        codec = codec.combine_chunks()
    tr = batch["transcript"] if len(batch) else pa.array([], pa.string())
    if isinstance(tr, pa.ChunkedArray):
        tr = tr.combine_chunks()
    # 64-bit hashes travel as int64 bit-views: Ray Data's aggregate paths
    # round-trip int64 losslessly but choke on uint64 > 2^63
    batch = batch.append_column("norm_transcript", norm)
    batch = batch.append_column("nh0", pa.array(np.asarray(nh0).view(np.int64), pa.int64()))
    batch = batch.append_column("nh1", pa.array(np.asarray(nh1).view(np.int64), pa.int64()))
    batch = batch.append_column("codec_cls", codec_class_array(pc.fill_null(codec, "unknown")))
    batch = batch.append_column(
        "has_diacritics", pc.fill_null(has_diacritics_array(pc.fill_null(tr, "")), False)
    )
    return batch
