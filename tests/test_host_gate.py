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


def test_host_lookup_client_outcomes():
    """The live-client gate reproduces the reference X-server's THREE
    outcomes (lib/mergeability-validators.js:215-236): 'empty set' error →
    not host; no_records>0 → host; anything else (malformed response OR a
    raised client error) → a distinct lookup-error reason that fails the
    pair rather than silently passing it."""
    import pyarrow as pa

    from marc_record_merge_melindautils_ray.stages.verify import HostLookupVerify

    def client(cid):
        if cid.startswith("ok"):
            return {"error": "empty set"}
        if cid.startswith("host"):
            return {"no_records": 2}
        if cid.startswith("weird"):
            return {"something": "else"}  # unparseable response
        raise ConnectionError("X-server down")

    t = pa.table({
        "id_a": ["ok1", "ok1", "ok1", "ok1"],
        "id_b": ["ok2", "host1", "weird1", "down1"],
        "rel": ["band"] * 4,
    })
    v = HostLookupVerify(client)
    out = v(t)["host_reason"].to_pylist()
    assert out == [None, "host-record", "host-lookup-error", "host-lookup-error"]


def test_host_lookup_error_outranks_host_verdict():
    """The reference rethrows the parse error before the host-errors check
    can run — error on one side wins even when the other side IS a host."""
    import pyarrow as pa

    from marc_record_merge_melindautils_ray.stages.verify import HostLookupVerify

    def client(cid):
        return {"no_records": 1} if cid == "host1" else {"bad": True}

    v = HostLookupVerify(client)
    out = v(pa.table({"id_a": ["host1"], "id_b": ["err1"], "rel": ["band"]}))
    assert out["host_reason"].to_pylist() == ["host-lookup-error"]


def test_pipeline_host_client_gate(ray_session, corpus, small_cfg):
    """run_dedup(host_client=...): a host verdict and a lookup error each
    break their pair's cluster, with both outcomes counted in metrics."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.pipelines.dedup import run_dedup

    clips, truth, golden = corpus
    pos = [g for g in golden.to_pylist() if g["expected_ok"]]
    host_id = pos[0]["id_other"]
    err_id = pos[1]["id_other"]

    def client(cid, _h=host_id, _e=err_id):
        if cid == _h:
            return {"no_records": 1}
        if cid == _e:
            raise ConnectionError("X-server down")
        return {"error": "empty set"}

    res = run_dedup(rd.from_arrow(clips), small_cfg, host_client=client)
    assert res["metrics"]["host_rejected_pairs"] >= 1
    assert res["metrics"]["host_lookup_errors"] >= 1
    assign = res["assignments"].to_pandas()
    amap = dict(zip(assign["clip_id"], assign["cluster_id"]))
    for bad in (pos[0], pos[1]):
        assert (
            amap.get(bad["id_other"]) is None
            or amap.get(bad["id_other"]) != amap.get(bad["id_preferred"])
        )
