"""Combined-scale stress (VERDICT r3 item 7): the 1M-clip corpus with the
BOTH bounded-memory modes on together — keyset_mode='exact' (distributed
Bloom keysets, zero driver key arrays) + index_shards=8 (sharded
cluster-tagging side table) — wall/recall-surrogate/determinism vs the
default config on the same corpus."""
import hashlib
import json
import time

import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR", object_store_memory=55_000_000_000)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

import sys
sys.path.insert(0, "/root/repo")
from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup
from marc_record_merge_melindautils_ray.sources.synth_scaled import generate_clips_ds

NFAM = 740_000
clips = generate_clips_ds(NFAM, dur_scale=2).materialize()
n = clips.count()
print("clips", n, flush=True)

def one(tag, cfg):
    t0 = time.monotonic()
    res = run_dedup(clips, cfg)
    a = res["assignments"].to_pandas().sort_values(["clip_id", "cluster_id"]).reset_index(drop=True)
    wall = time.monotonic() - t0
    h = hashlib.blake2b(a.to_csv(index=False).encode(), digest_size=12).hexdigest()
    out = {"tag": tag, "wall_sec": round(wall, 1), "assignments": len(a),
           "clusters": int(a.cluster_id.nunique()), "hash": h,
           "clips_per_sec": round(n / wall, 1)}
    print(json.dumps(out), flush=True)
    return out

base = DedupConfig(fingerprint_concurrency=30, verify_concurrency=30)
combo = DedupConfig(fingerprint_concurrency=30, verify_concurrency=30,
                    keyset_mode="exact", index_shards=8)
r1 = one("default", base)
r2 = one("exact+shards8", combo)
print(json.dumps({"identical": r1["hash"] == r2["hash"],
                  "wall_default": r1["wall_sec"], "wall_combined": r2["wall_sec"]}))
ray.shutdown()
