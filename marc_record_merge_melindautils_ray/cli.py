"""Job entrypoint: ``python -m marc_record_merge_melindautils_ray`` — the form a
cluster deployment submits via ``ray job submit`` (north_rule).

    ray job submit --working-dir . -- \
        python -m marc_record_merge_melindautils_ray \
        --input /data/clips.parquet --output /out/dedup \
        --checkpoint /ckpt/run1 --config '{"keyset_mode": "sampled"}'

Reads the clip table (Lance if a reader exists, parquet otherwise), runs the
full dedup pipeline with per-stage lineage checkpoints, writes the
partitioned resumable output sink, and prints one JSON metrics line.  This
module OWNS the Ray session when run standalone (guarded init — inside
``ray job submit`` the cluster connection already exists)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="marc_record_merge_melindautils_ray")
    ap.add_argument("--input", required=True, help="clip table path (parquet/lance)")
    ap.add_argument("--output", required=True, help="output directory (sink)")
    ap.add_argument("--checkpoint", default=None, help="checkpoint/lineage dir")
    ap.add_argument("--config", default="{}",
                    help="JSON dict of DedupConfig overrides")
    ap.add_argument("--host-ids", default=None,
                    help="newline-delimited file of host record ids (V11)")
    ap.add_argument("--authority", default=None,
                    help="JSON file {author_key: authorized_label} (P7)")
    ap.add_argument("--num-buckets", type=int, default=16,
                    help="output sink hash buckets")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # plain init: connects to the submitting cluster via RAY_ADDRESS when
        # launched by `ray job submit`, starts a local instance otherwise —
        # address="local" here would strand a cluster job on one node
        ray.init(include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from marc_record_merge_melindautils_ray.config import DedupConfig
    from marc_record_merge_melindautils_ray.pipelines.dedup import read_clips, run_dedup
    from marc_record_merge_melindautils_ray.pipelines.io import write_outputs

    cfg = DedupConfig(**json.loads(args.config))
    host_ids = None
    if args.host_ids:
        with open(args.host_ids) as f:
            host_ids = frozenset(x.strip() for x in f if x.strip())
    authority = None
    if args.authority:
        with open(args.authority) as f:
            authority = json.load(f)

    clips = read_clips(args.input)
    res = run_dedup(
        clips, cfg, authority=authority, host_ids=host_ids,
        checkpoint_dir=args.checkpoint,
    )
    written = write_outputs(res, args.output, num_buckets=args.num_buckets)
    out = {
        "assignments": res["assignments"].count(),
        "clusters": res["canonical"].count(),
        "rejected": res["metrics"].get("canonical_rejected", 0),
        "written": written,
        "metrics": {k: v for k, v in res["metrics"].items()
                    if not isinstance(v, (list, bytes))},
    }
    print(json.dumps(out, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
