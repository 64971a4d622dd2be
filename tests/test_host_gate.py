"""V11 notHostRecord: injected host-id side table disqualifies pairs
(the reference's external bib-DB query, stubbed in its tests with one id
marked host — test/MergeUtilsMelinda.spec.js:74-84)."""

import pyarrow as pa

from marc_record_merge_melindautils_ray.stages.verify import verify_oriented_pairs


def test_host_id_blocks_merge(corpus, small_cfg):
    clips, truth, golden = corpus
    # pick a positive golden pair and declare one side a host record
    pos = [g for g in golden.to_pylist() if g["expected_ok"]][0]
    pairs = pa.Table.from_pylist([pos])
    ok_no_hosts = verify_oriented_pairs(clips, pairs, small_cfg).iloc[0]
    assert ok_no_hosts["ok"]
    out = verify_oriented_pairs(
        clips, pairs, small_cfg, host_ids=frozenset({pos["id_other"]})
    ).iloc[0]
    assert not out["ok"]
    assert "host-record" in out["reasons"]


def test_pipeline_host_gate(ray_session, corpus, small_cfg):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup

    clips, truth, golden = corpus
    pos = [g for g in golden.to_pylist() if g["expected_ok"]][0]
    hosts = frozenset({pos["id_other"]})
    res = run_dedup(rd.from_arrow(clips), small_cfg, host_ids=hosts)
    assign = res["assignments"].to_pandas()
    amap = dict(zip(assign["clip_id"], assign["cluster_id"]))
    # the host pair must NOT cluster together
    assert (
        amap.get(pos["id_other"]) is None
        or amap.get(pos["id_other"]) != amap.get(pos["id_preferred"])
    )
