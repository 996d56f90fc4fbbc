"""Multimodal payload plumbing: schema, batching, stub gating."""

import numpy as np
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


def test_real_decode_video_rejects_non_avi(spark):
    """synth_payloads' video bytes are NOT AVI — the real decoder must
    reject them loudly, not fabricate features (codec'd formats are the
    documented out-of-scope seam)."""
    df = synth_payloads(spark, 6).where("modality = 'video'")
    with pytest.raises(Exception, match="RIFF/AVI"):
        extract_features(df, fake=False).collect()


class TestAviCodec:
    def test_roundtrip_bit_exact(self):
        import numpy as np

        from bathyscaphe_spark.operators.multimodal import (
            decode_avi,
            encode_avi_rgb24,
        )

        rng = np.random.RandomState(11)
        for w, h, n, fps in [(4, 3, 2, 10), (5, 6, 4, 12), (1, 1, 1, 30),
                             (7, 2, 3, 24)]:
            frames = [
                rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
                for _ in range(n)
            ]
            got_w, got_h, got_fps, out = decode_avi(
                encode_avi_rgb24(w, h, fps, frames)
            )
            assert (got_w, got_h, got_fps) == (w, h, fps)
            assert out.shape == (n, h, w, 3)
            for t in range(n):
                assert (out[t] == frames[t]).all()

    def test_audio_stream_strf_not_misread(self):
        """An AVI carrying a PCM audio strl beside the video stream is
        in scope: the audio strf is a WAVEFORMAT, not a
        BITMAPINFOHEADER, and must not be misvalidated as one
        (regression: the pre-fix walk parsed every strf's bytes 16:20
        as biCompression)."""
        import struct

        import numpy as np

        from bathyscaphe_spark.operators.multimodal import (
            decode_avi,
            encode_avi_rgb24,
        )

        frames = [np.full((3, 4, 3), 7, dtype=np.uint8)]
        b = encode_avi_rgb24(4, 3, 10, frames)

        def chunk(cid, body):
            return cid + struct.pack("<I", len(body)) + body + (
                b"\x00" if len(body) & 1 else b""
            )

        auds_strh = struct.pack(
            "<4s4sIHHIIIIIIIi4h",
            b"auds", b"\x01\x00\x00\x00", 0, 0, 0, 0, 1, 8000, 0, 8000,
            16000, 0, 2, 0, 0, 0, 0,
        )
        # 16-byte WAVEFORMATEX (PCM): shorter than a BITMAPINFOHEADER,
        # and bytes 16:20 don't even exist
        auds_strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        auds_strl = chunk(
            b"LIST", b"strl" + chunk(b"strh", auds_strh) + chunk(b"strf", auds_strf)
        )
        # inject the audio strl at the end of the hdrl LIST body and fix
        # the hdrl and RIFF sizes
        hdrl_pos = b.find(b"LIST", 12)
        hdrl_size = struct.unpack("<I", b[hdrl_pos + 4 : hdrl_pos + 8])[0]
        hdrl_end = hdrl_pos + 8 + hdrl_size
        out = bytearray(
            b[:hdrl_end] + auds_strl + b[hdrl_end:]
        )
        out[hdrl_pos + 4 : hdrl_pos + 8] = struct.pack(
            "<I", hdrl_size + len(auds_strl)
        )
        out[4:8] = struct.pack("<I", len(out) - 8)
        w, h, fps, fr = decode_avi(bytes(out))
        assert (w, h, fps) == (4, 3, 10)
        assert (fr[0] == frames[0]).all()

    def test_compressed_stream_rejected(self):
        import numpy as np

        from bathyscaphe_spark.operators.multimodal import (
            decode_avi,
            encode_avi_rgb24,
        )

        b = bytearray(
            encode_avi_rgb24(
                4, 3, 10, [np.zeros((3, 4, 3), dtype=np.uint8)]
            )
        )
        i = bytes(b).find(b"00db")
        b[i : i + 4] = b"00dc"
        with pytest.raises(ValueError, match="00dc"):
            decode_avi(bytes(b))

    def test_real_features_video(self, spark):
        """fake=False over real AVI payloads: (w, h, n_frames, fps,
        channel means) — per-id expectations derived from the planted
        gradient formula."""
        from bathyscaphe_spark.operators.multimodal import (
            synth_avi_payloads,
        )

        d = spark.range(8).selectExpr("id AS doc_id")
        df = synth_avi_payloads(d).selectExpr(
            "item_id", "'video' AS modality", "payload",
            "map('k', 'v') AS meta",
        )
        got = {
            r["item_id"]: r["features"]
            for r in extract_features(df, fake=False).collect()
        }
        for i in range(8):
            w, h, n, fps = 4 + i % 5, 3 + i % 4, 2 + i % 4, 10 + i % 3
            f = got[i]
            assert f[:4] == [float(w), float(h), float(n), float(fps)]
            hw = w * h
            mean_b = sum((i + 5 * t) % 256 for t in range(n)) / n
            assert abs(f[6] - mean_b) < 1e-3


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


def test_frame_sample_plan_bounds(spark):
    """Valid frame indices are 0..fc-1: no plan row may equal the frame
    count (the decoder would read past end-of-stream), and a zero-frame
    item plans nothing."""
    rows = [(1, "video", {"height": "60"}),   # fc=60 → 0, 30 (NOT 60)
            (2, "video", {"height": "0"}),    # empty stream → no rows
            (3, "video", {"height": "1"}),    # one frame → [0]
            (4, "video", {"height": "400"})]  # cap: 0..300
    df = spark.createDataFrame(
        rows, "item_id long, modality string, meta map<string,string>"
    )
    got = {}
    for r in frame_sample_plan(df, every_n=30).collect():
        got.setdefault(r["item_id"], []).append(r["frame_idx"])
    assert got.get(1) == [0, 30]
    assert 2 not in got
    assert got.get(3) == [0]
    assert got.get(4) == list(range(0, 301, 30))


class TestAHash:
    """ahash_fingerprints: invariances, flips, partitioning."""

    def _hash(self, spark, images, parts=2):
        # images: list[(id, np.uint8 HxWx3)]
        import pandas as pd

        from bathyscaphe_spark.operators.multimodal import ahash_fingerprints

        rows = [
            (i, f"P6\n{a.shape[1]} {a.shape[0]}\n255\n".encode() + a.tobytes())
            for i, a in images
        ]
        df = spark.createDataFrame(rows, "item_id long, payload binary")
        return {
            r["item_id"]: r["simhash"]
            for r in ahash_fingerprints(df.repartition(parts)).collect()
        }

    def test_identical_images_identical_hash(self, spark):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 255, (6, 9, 3), dtype=np.uint8)
        got = self._hash(spark, [(1, img), (2, img.copy())])
        assert got[1] == got[2]

    def test_brightness_shift_invariant(self, spark):
        # +20 on every channel without wraparound: luma and mean shift
        # together, the threshold pattern (and hash) must not move
        rng = np.random.default_rng(11)
        img = rng.integers(30, 200, (5, 7, 3), dtype=np.uint8)
        brighter = (img.astype(np.int64) + 20).astype(np.uint8)
        got = self._hash(spark, [(1, img), (2, brighter)])
        assert got[1] == got[2]

    def test_region_flip_small_hamming(self, spark):
        img = np.full((6, 8, 3), 40, dtype=np.uint8)
        img[0, 0] = img[3, 5] = 250  # two bright cells set their bits
        tweaked = img.copy()
        tweaked[3, 5] = 40  # douse one of them
        got = self._hash(spark, [(1, img), (2, tweaked)])
        ham = bin(got[1] ^ got[2]).count("1")
        assert 1 <= ham <= 3

    def test_matches_pure_python(self, spark):
        from bathyscaphe_spark.operators.multimodal import (
            AHASH_GRID_H, AHASH_GRID_W, LUMA_B, LUMA_G, LUMA_R,
        )

        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (4, 11, 3), dtype=np.uint8)
        h, w = img.shape[:2]
        ys = [(y * h) // AHASH_GRID_H for y in range(AHASH_GRID_H)]
        xs = [(x * w) // AHASH_GRID_W for x in range(AHASH_GRID_W)]
        luma = [
            (LUMA_R * int(img[y, x, 0]) + LUMA_G * int(img[y, x, 1])
             + LUMA_B * int(img[y, x, 2])) // 1000
            for y in ys for x in xs
        ]
        mean = sum(luma) // 48
        want = sum(1 << i for i, l in enumerate(luma) if l >= mean)
        assert self._hash(spark, [(9, img)])[9] == want

    def test_partition_invariance_and_grid_guard(self, spark):
        import pytest as _pytest

        from bathyscaphe_spark.operators.multimodal import (
            ahash_fingerprints, synth_family_ppm,
        )

        d = spark.range(0, 60).withColumnRenamed("id", "doc_id")
        a = sorted(map(tuple, ahash_fingerprints(
            synth_family_ppm(d.repartition(1))).collect()))
        b = sorted(map(tuple, ahash_fingerprints(
            synth_family_ppm(d.repartition(7))).collect()))
        assert a == b and len(a) == 60
        with _pytest.raises(ValueError):
            ahash_fingerprints(None, grid_h=8, grid_w=8)


class TestCdcChunks:
    """LBFS content-defined chunking — boundaries follow content."""

    def _run(self, spark, rows):
        from bathyscaphe_spark.operators.multimodal import cdc_chunks

        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {}
        for r in cdc_chunks(df).collect():
            out.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["start"], r["chunk_len"], r["chunk_md5"], r["reuse"])
            )
        return {k: sorted(v) for k, v in out.items()}

    def test_insertion_preserves_later_chunk_digests(self, spark):
        import random

        rng = random.Random(42)
        base = "".join(chr(rng.randint(33, 122)) for _ in range(8000))
        shifted = "XYZZY-" + base  # 6-byte insertion at the front
        got = self._run(spark, [(1, base), (2, shifted)])
        d1 = {m for _, _, _, m, _ in got[1]}
        d2 = {m for _, _, _, m, _ in got[2]}
        # most chunks re-synchronize after the insertion
        shared = d1 & d2
        assert len(shared) >= len(d1) * 0.6, (len(shared), len(d1), len(d2))

    def test_short_doc_is_one_whole_chunk(self, spark):
        got = self._run(spark, [(1, "tiny doc")])
        assert got[1] == [(0, 0, 8, got[1][0][3], 1)]

    def test_empty_doc_no_rows(self, spark):
        got = self._run(spark, [(1, ""), (2, "x" * 40)])
        assert 1 not in got and 2 in got

    def test_chunks_tile_the_doc_and_reuse_counts(self, spark):
        t = "abcdefgh" * 100
        got = self._run(spark, [(1, t), (2, t)])
        for d in (1, 2):
            pos = 0
            for _, start, ln, _, reuse in got[d]:
                assert start == pos
                pos += ln
                assert reuse == 2  # identical docs: every chunk shared
            assert pos == len(t)

    def test_partition_invariance(self, spark):
        from bathyscaphe_spark.operators.multimodal import cdc_chunks

        rows = [(i, "".join(chr(33 + ((i * 7 + j * 13) % 90)) for j in range(600)))
                for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, cdc_chunks(df.repartition(1)).collect()))
        b = sorted(map(tuple, cdc_chunks(df.repartition(7)).collect()))
        assert a == b


def test_cdc_nonascii_digest_sharing(spark):
    """Byte-space chunking: a shared footer behind DIFFERENT non-ASCII
    prefixes must yield identical chunk digests (the reviewed defect:
    char-sliced chunks diverged from byte boundaries)."""
    import random

    from bathyscaphe_spark.operators.multimodal import cdc_chunks

    rng = random.Random(7)
    footer = "".join(chr(rng.randint(33, 122)) for _ in range(4000))
    rows = [(1, "é" * 50 + footer), (2, "漢字テスト" * 25 + footer)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in cdc_chunks(df).collect():
        out.setdefault(r["doc_id"], []).append((r["start"], r["chunk_len"], r["chunk_md5"]))
        # invariant: chunk_len is the BYTE length md5 was computed over
    d1 = {m for _, _, m in out[1]}
    d2 = {m for _, _, m in out[2]}
    assert len(d1 & d2) >= max(len(d1), len(d2)) * 0.5, (len(d1 & d2), len(d1), len(d2))
    # byte tiling: lens sum to the utf-8 byte length
    assert sum(ln for _, ln, _ in out[1]) == len(rows[0][1].encode())
