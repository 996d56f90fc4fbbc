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


def test_real_decode_video_is_gated(spark):
    """Only codec'd formats (video) stay stubbed behind fake=True."""
    df = synth_payloads(spark, 6).where("modality = 'video'")
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        extract_features(df, fake=False).collect()


def test_real_decode_ppm_wav(spark):
    """fake=False decodes P6 PPM and PCM16 WAV for real (r2)."""
    from bathyscaphe_spark.operators.multimodal import (
        decode_stats,
        synth_codec_payloads,
    )

    d = spark.range(12).selectExpr("id AS doc_id")
    payloads = synth_codec_payloads(d)
    stats = {r["item_id"]: r for r in decode_stats(payloads).collect()}
    assert len(stats) == 12
    # even ids: images with pinned dims + channel means
    assert stats[2]["width"] == 4 + 2 % 5 and stats[2]["height"] == 3 + 2 % 4
    assert stats[2]["mean_r"] == 2 and stats[2]["mean_g"] == 14
    assert stats[2]["sample_rate"] is None
    # odd ids: audio with pinned rate/length/amplitude
    assert stats[5]["sample_rate"] == 8000 + (5 % 4) * 2000
    assert stats[5]["n_samples"] == 16 + 5 % 17
    assert stats[5]["mean_amp"] == 5 - 1000
    assert stats[5]["width"] is None
    # the generic feature path also runs real decoders end-to-end
    feats = extract_features(payloads, fake=False).collect()
    assert len(feats) == 12
    assert all(len(r["features"]) == FEATURE_DIM for r in feats)
    img = next(r for r in feats if r["modality"] == "image")
    assert img["features"][0] >= 4  # width rides in slot 0


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
