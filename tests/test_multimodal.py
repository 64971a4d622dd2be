

def test_scene_cuts_constructed(ray_session, tmp_path, monkeypatch):
    """Cut counting pinned on hand-built payloads: identical frames → 0
    cuts, alternating frames → a cut at every sampled transition, single
    frame → 0; strided sampling only compares SAMPLED neighbors."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops import multimodal

    fb = 4
    items = pa.table({
        "item_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([
            b"AAAA" * 8,                      # 8 id. frames → 0 cuts
            b"AAAABBBB" * 4,                  # alternating; every=2 samples
            #   frames 0,2,4,6 = A,A,A,A → 0 cuts at stride 2!
            b"AAAA",                          # single frame → 0 cuts
        ], pa.binary()),
    })
    monkeypatch.setattr(multimodal, "synth_binary_items",
                        lambda sf, frame_bytes=fb: rd.from_arrow(items))
    out = (multimodal.q_scene_cuts("ignored", frame_bytes=fb, every=2)
           .set_index("item_id"))
    assert out.loc[1].tolist() == [0, 4]
    assert out.loc[2].tolist() == [0, 4]      # stride skips the B frames
    assert out.loc[3].tolist() == [0, 1]
    # every=1 sees the alternation: 7 transitions, all cuts
    out1 = (multimodal.q_scene_cuts("ignored", frame_bytes=fb, every=1)
            .set_index("item_id"))
    assert out1.loc[2].tolist() == [7, 8]
