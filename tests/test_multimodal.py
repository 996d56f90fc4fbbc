"""Multimodal payload plumbing: schema, batching, stub gating."""

import pytest

from bathyscaphe_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    synth_payloads,
)


def test_synth_schema_and_determinism(spark):
    a = synth_payloads(spark, 50).collect()
    b = synth_payloads(spark, 50, parallelism=7).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    mods = {r["modality"] for r in a}
    assert mods == {"image", "audio", "video"}
    assert all(isinstance(r["payload"], (bytes, bytearray)) for r in a)
    assert all(set(r["meta"]) == {"width", "height", "codec"} for r in a)


def test_fake_features_shape_and_determinism(spark):
    df = synth_payloads(spark, 60)
    out = extract_features(df, fake=True).collect()
    assert len(out) == 60
    assert all(len(r["features"]) == FEATURE_DIM for r in out)
    assert all(0.0 <= v < 1.0 for r in out for v in r["features"])
    out2 = extract_features(synth_payloads(spark, 60).repartition(5), fake=True).collect()
    fa = {r["item_id"]: r["features"] for r in out}
    fb = {r["item_id"]: r["features"] for r in out2}
    assert fa == fb


def test_real_decode_is_gated(spark):
    df = synth_payloads(spark, 5)
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        extract_features(df, fake=False).collect()


def test_frame_sample_plan(spark):
    df = synth_payloads(spark, 90)
    plan = frame_sample_plan(df, every_n=30).collect()
    assert plan, "expected video rows"
    by_item = {}
    for r in plan:
        by_item.setdefault(r["item_id"], []).append(r["frame_idx"])
    for frames in by_item.values():
        assert frames == sorted(frames)
        assert all(f % 30 == 0 for f in frames)
