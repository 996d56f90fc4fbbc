"""Multimodal payload plumbing: image/audio/video as opaque binary
columns with typed metadata.

DECODE support: codec-FREE formats are decoded for real in pure
numpy — PPM P6 images (netpbm spec: ASCII header + raw RGB bytes),
PCM16 RIFF/WAVE audio (chunk walk → int16 samples), and — since r4 —
uncompressed RIFF/AVI video ('00db' DIB RGB24 frames, bottom-up BGR
with 4-byte stride; Microsoft RIFF/AVI + DIB public specs).  SCOPE
NOTE: formats that genuinely need external codecs (JPEG, MJPEG '00dc'
chunks, any biCompression != 0) raise ValueError — no codec libraries
exist in this environment; the ``fake=True`` path keeps the original
deterministic stand-in for them.  The Spark-side plumbing — schema,
Arrow batch shapes, ``mapInPandas`` signatures, partitioning — is real
and tested either way.

Schema: (item_id long, modality string, payload binary,
         meta map<string,string>).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MODALITIES = ("image", "audio", "video")

FEATURE_DIM = 16


# --- codec-free encoders/decoders (pure numpy, public formats) -------------

def encode_ppm(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal P6 writer (solid color) for fixtures/tests."""
    px = np.empty((height, width, 3), dtype=np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = rgb
    return f"P6\n{width} {height}\n255\n".encode() + px.tobytes()


def decode_ppm(b: bytes) -> np.ndarray:
    """P6 PPM → uint8 array (h, w, 3).  Handles comments and arbitrary
    whitespace per the netpbm spec; maxval must be ≤ 255."""
    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    n = w * h * 3
    return np.frombuffer(b[pos : pos + n], dtype=np.uint8).reshape(h, w, 3)


def encode_wav_pcm16(rate: int, samples: np.ndarray) -> bytes:
    """Minimal mono PCM16 RIFF/WAVE writer for fixtures/tests."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE chunk walk → (sample_rate, int16 samples).  PCM16 only
    (format tag 1); multi-channel data is returned interleaved."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, bits, fmt, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, _ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt != 1 or bits != 16 or data is None:
        raise ValueError("only PCM16 WAV supported")
    return int(rate), np.frombuffer(data, dtype="<i2")


def synth_payloads(spark: SparkSession, n: int, parallelism: int | None = None) -> DataFrame:
    """Deterministic synthetic multimodal table: payload bytes derive
    from the item id (pure column expressions)."""
    rng = spark.range(0, n, 1, parallelism) if parallelism else spark.range(n)
    m = F.element_at(
        F.array(*[F.lit(x) for x in MODALITIES]),
        (F.pmod(F.col("id"), F.lit(len(MODALITIES))) + 1).cast("int"),
    )
    payload = F.concat(
        F.lit("PAYLOAD:"), m, F.lit(":"), F.col("id").cast("string"),
        F.repeat(F.lit("«"), F.pmod(F.col("id"), F.lit(64)).cast("int")),
    ).cast("binary")
    meta = F.create_map(
        F.lit("width"), (F.pmod(F.col("id"), F.lit(1920)) + 1).cast("string"),
        F.lit("height"), (F.pmod(F.col("id"), F.lit(1080)) + 1).cast("string"),
        F.lit("codec"), F.concat(F.lit("c"), F.pmod(F.col("id"), F.lit(4)).cast("string")),
    )
    return rng.select(
        F.col("id").alias("item_id"), m.alias("modality"),
        payload.alias("payload"), meta.alias("meta"),
    )


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in feature extractor: sha256(payload) bytes →
    FEATURE_DIM floats in [0,1).  Replaced by a real encoder in prod."""
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, b in enumerate(payloads):
        digest = hashlib.sha256(bytes(b or b"")).digest()
        out[i] = np.frombuffer(digest[: 2 * FEATURE_DIM], dtype=np.uint16).astype(
            np.float32
        ) / 65536.0
    return out


def _real_features(modality: str, b: bytes) -> np.ndarray:
    """Codec-free real features: PPM images → (w, h, mean/std per RGB
    channel); PCM16 WAV → (rate, n, mean, rms, min, max).  Zero-padded
    to FEATURE_DIM.  Video (and any codec'd format) raises — the
    documented production integration point."""
    f = np.zeros(FEATURE_DIM, dtype=np.float32)
    if modality == "image":
        px = decode_ppm(bytes(b))
        f[0], f[1] = px.shape[1], px.shape[0]
        f[2:5] = px.reshape(-1, 3).mean(axis=0)
        f[5:8] = px.reshape(-1, 3).std(axis=0)
    elif modality == "audio":
        rate, s = decode_wav(bytes(b))
        sf = s.astype(np.float64)
        f[0], f[1] = rate, len(s)
        if len(s):
            f[2] = sf.mean()
            f[3] = np.sqrt((sf**2).mean())
            f[4], f[5] = sf.min(), sf.max()
    elif modality == "video":
        w, h, fps, fr = decode_avi(bytes(b))
        f[0], f[1], f[2], f[3] = w, h, fr.shape[0], fps
        f[4:7] = fr.reshape(-1, 3).mean(axis=0)
    else:
        raise ValueError(
            f"unknown modality '{modality}' (image/audio/video decode "
            "for real; pass fake=True for the deterministic stub)"
        )
    return f


def extract_features(
    df: DataFrame, fake: bool = True, batch_note: str = "decode"
) -> DataFrame:
    """(item_id, modality, payload, meta) → (item_id, modality,
    features array<float>, n_bytes).

    ``fake=False`` decodes codec-free payloads FOR REAL (PPM via
    decode_ppm, PCM16 WAV via decode_wav, uncompressed AVI via
    decode_avi) and raises ValueError for codec'd formats (JPEG,
    '00dc'/compressed AVI — no codec libraries in this environment;
    that seam is the production integration point).  The mapInPandas
    batch shape (iterator of pdf in, pdf out, arrow-typed array
    column) is identical either way.
    """
    schema = "item_id long, modality string, features array<float>, n_bytes long"

    def _run(batches):
        for pdf in batches:
            if fake:
                feats = list(_fake_features(pdf["payload"]))
            else:
                feats = [
                    _real_features(m, b)
                    for m, b in zip(pdf["modality"], pdf["payload"])
                ]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                }
            )

    return df.mapInPandas(_run, schema=schema)


def decode_stats(df: DataFrame) -> DataFrame:
    """Real-decode stats with driver-checkable integer outputs:
    (item_id, modality, width, height, mean_r, mean_g, mean_b,
    sample_rate, n_samples, mean_amp) — image/audio columns NULL for
    the other modality.  All decoding is the real numpy PPM/WAV path."""
    schema = (
        "item_id long, modality string, width long, height long, "
        "mean_r long, mean_g long, mean_b long, "
        "sample_rate long, n_samples long, mean_amp long"
    )

    def _run(batches):
        for pdf in batches:
            rows = []
            for iid, m, b in zip(pdf["item_id"], pdf["modality"], pdf["payload"]):
                r = {"item_id": int(iid), "modality": m, "width": None,
                     "height": None, "mean_r": None, "mean_g": None,
                     "mean_b": None, "sample_rate": None, "n_samples": None,
                     "mean_amp": None}
                if m == "image":
                    px = decode_ppm(bytes(b))
                    ch = px.reshape(-1, 3).mean(axis=0)
                    r.update(width=px.shape[1], height=px.shape[0],
                             mean_r=int(round(ch[0])), mean_g=int(round(ch[1])),
                             mean_b=int(round(ch[2])))
                elif m == "audio":
                    rate, s = decode_wav(bytes(b))
                    r.update(sample_rate=rate, n_samples=len(s),
                             mean_amp=int(round(float(s.astype(np.float64).mean()))))
                rows.append(r)
            yield pd.DataFrame(rows)

    return df.mapInPandas(_run, schema=schema)


def synth_codec_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL payloads from an id column — even ids become a
    solid-color P6 PPM, odd ids a constant-amplitude PCM16 WAV.  The
    pixel/sample arithmetic is mirrored in the DuckDB oracle of the
    ``multimodal_decode`` contract query, so the decode path is pinned
    end-to-end (header parse, byte layout, channel stats)."""

    def _run(batches):
        for pdf in batches:
            ids, modality, payload = [], [], []
            for iid in pdf[id_col]:
                i = int(iid)
                ids.append(i)
                if i % 2 == 0:
                    modality.append("image")
                    payload.append(
                        encode_ppm(
                            4 + i % 5, 3 + i % 4,
                            (i % 256, (i * 7) % 256, (i * 13) % 256),
                        )
                    )
                else:
                    modality.append("audio")
                    n = 16 + i % 17
                    amp = (i % 2001) - 1000
                    payload.append(
                        encode_wav_pcm16(
                            8000 + (i % 4) * 2000,
                            np.full(n, amp, dtype=np.int16),
                        )
                    )
            yield pd.DataFrame(
                {"item_id": ids, "modality": modality, "payload": payload}
            )

    return df.select(id_col).mapInPandas(
        _run, schema="item_id long, modality string, payload binary"
    )


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan (metadata only — no decode): one output
    row per planned frame index, derived from meta['height'] as a fake
    frame count.  Demonstrates the explode-based fan-out a real sampler
    uses.

    A video with ``fc`` frames has valid indices 0..fc-1, so the plan
    ends at ``least(fc - 1, 300)`` — NOT ``fc`` (planning index == fc
    would make the decoder read past end-of-stream whenever fc % 30 ==
    0) — and a zero-frame item plans nothing (NULL array, dropped by
    explode) rather than frame 0 of an empty stream."""
    fc = F.coalesce(F.element_at("meta", "height").cast("int"), F.lit(0))
    frames = F.when(
        fc > 0,
        F.sequence(
            F.lit(0), F.least(fc - 1, F.lit(300)), F.lit(every_n)
        ),
    )
    return (
        df.where(F.col("modality") == "video")
        .select("item_id", F.explode(frames).alias("frame_idx"))
    )


def synth_gradient_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic NON-uniform P6 payloads: pixel (y, x) of item i has
    R = (y·W + x + i) % 256, G = (2·(y·W + x) + i) % 256, B = i % 256 —
    a gradient, so a resize actually samples different values (a solid
    image would make any resize contract vacuous)."""

    def _run(batches):
        for pdf in batches:
            ids, payload = [], []
            for iid in pdf[id_col]:
                i = int(iid)
                w, h = 4 + i % 5, 3 + i % 4
                idx = np.arange(h * w, dtype=np.int64)
                rgb = np.stack(
                    [(idx + i) % 256, (2 * idx + i) % 256,
                     np.full(h * w, i % 256, dtype=np.int64)],
                    axis=1,
                ).astype(np.uint8).reshape(h, w, 3)
                header = f"P6\n{w} {h}\n255\n".encode()
                ids.append(i)
                payload.append(header + rgb.tobytes())
            yield pd.DataFrame({"item_id": ids, "payload": payload})

    return df.select(id_col).mapInPandas(
        _run, schema="item_id long, payload binary"
    )


def resize_nn_stats(
    df: DataFrame, out_h: int = 6, out_w: int = 8,
    id_col: str = "item_id", payload_col: str = "payload",
) -> DataFrame:
    """REAL decode → nearest-neighbor resize to (out_h, out_w) → exact
    integer channel sums.  The resize is the deterministic integer
    grid map src_y = y·H DIV out_h, src_x = x·W DIV out_w (the
    standard nn downsample/upsample), all numpy indexing — exact
    BIGINT sums make the contract float-free."""

    def _run(batches):
        for pdf in batches:
            ids, ow, oh, sr, sg, sb = [], [], [], [], [], []
            for iid, b in zip(pdf[id_col], pdf[payload_col]):
                img = decode_ppm(bytes(b))
                h, w = img.shape[0], img.shape[1]
                ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
                xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
                out = img[ys][:, xs].astype(np.int64)
                ids.append(int(iid))
                ow.append(out_w)
                oh.append(out_h)
                sr.append(int(out[:, :, 0].sum()))
                sg.append(int(out[:, :, 1].sum()))
                sb.append(int(out[:, :, 2].sum()))
            yield pd.DataFrame(
                {"item_id": ids, "out_w": ow, "out_h": oh,
                 "sum_r": sr, "sum_g": sg, "sum_b": sb}
            )

    return df.select(id_col, payload_col).mapInPandas(
        _run,
        schema="item_id long, out_w long, out_h long,"
               " sum_r long, sum_g long, sum_b long",
    )


# --- uncompressed AVI (RIFF / DIB RGB24) video codec -------------------------
# Pure numpy, public format (Microsoft RIFF/AVI + DIB specs): '00db'
# frames carry bottom-up BGR24 rows padded to 4-byte stride, BI_RGB
# (compression 0) only.  This closes the r1-r3 video decode stub for
# the one video container that needs no external codec; compressed
# streams ('00dc' chunks / non-zero biCompression) raise ValueError
# with an explicit scope note.


def encode_avi_rgb24(
    width: int, height: int, fps: int, frames: list[np.ndarray]
) -> bytes:
    """Minimal uncompressed AVI writer for fixtures/tests: RIFF('AVI ')
    → LIST(hdrl){avih, LIST(strl){strh 'vids'/'DIB ', strf
    BITMAPINFOHEADER bpp=24 BI_RGB}} → LIST(movi){'00db'…}.  Frames are
    (h, w, 3) uint8 RGB; rows are stored bottom-up as BGR with 4-byte
    stride padding per the DIB convention."""
    stride = (width * 3 + 3) & ~3
    pad = stride - width * 3
    frame_bytes = []
    for fr in frames:
        if fr.shape != (height, width, 3):
            raise ValueError("frame shape mismatch")
        bgr = fr[::-1, :, ::-1].astype(np.uint8)  # bottom-up, RGB→BGR
        if pad:
            rows = np.zeros((height, stride), dtype=np.uint8)
            rows[:, : width * 3] = bgr.reshape(height, width * 3)
            frame_bytes.append(rows.tobytes())
        else:
            frame_bytes.append(bgr.tobytes())
    fsize = stride * height

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1), fsize * fps, 0,
        0,  # dwFlags: no idx1 chunk is written, so AVIF_HASINDEX stays off
        len(frames), 0, 1, fsize, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4h",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames), fsize,
        0, 0, 0, 0, int(width), int(height),
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, fsize, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl", chunk(b"avih", avih) + lst(
            b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
        )
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Uncompressed AVI → (width, height, fps, frames (n, h, w, 3) uint8
    RGB).  Chunk walk over RIFF: avih for dimensions, strh for the
    rate/scale fps fraction, movi '00db' DIB frames (bottom-up BGR,
    4-byte stride) decoded with numpy slicing.  Compressed streams
    ('00dc' or biCompression != 0) are out of scope (external codecs
    are not present in this environment) and raise ValueError."""
    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = None
    rate = scale = None
    cur_stream = None  # fccType of the most recent strh (strf follows it)
    frames_raw: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height, rate, scale, cur_stream
        pos = start
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)
            elif cid == b"avih":
                a = struct.unpack("<14I", b[body_start : body_start + 56])
                width, height = a[8], a[9]
            elif cid == b"strh":
                s = struct.unpack(
                    "<4s4sIHHIIIIIIIi4h", b[body_start : body_start + 56]
                )
                cur_stream = s[0]
                if s[0] == b"vids":
                    scale, rate = s[6], s[7]
            elif cid == b"strf" and cur_stream == b"vids":
                # only the video stream's strf is a BITMAPINFOHEADER —
                # an audio strl's strf is a WAVEFORMAT and must not be
                # misread as one
                comp = struct.unpack(
                    "<I", b[body_start + 16 : body_start + 20]
                )[0]
                if comp != 0:
                    raise ValueError(
                        "compressed AVI stream (biCompression != 0): "
                        "codec decode is out of scope in this environment"
                    )
            elif cid == b"00dc":
                raise ValueError(
                    "compressed AVI stream ('00dc' chunk): codec decode "
                    "is out of scope in this environment"
                )
            elif cid == b"00db":
                frames_raw.append(b[body_start : body_start + size])
            pos = body_start + size + (size & 1)

    walk(12, len(b))
    if width is None or not frames_raw:
        raise ValueError("missing avih header or video frames")
    stride = (width * 3 + 3) & ~3
    out = np.empty((len(frames_raw), height, width, 3), dtype=np.uint8)
    for i, fb in enumerate(frames_raw):
        rows = np.frombuffer(fb[: stride * height], dtype=np.uint8).reshape(
            height, stride
        )
        bgr = rows[:, : width * 3].reshape(height, width, 3)
        out[i] = bgr[::-1, :, ::-1]  # bottom-up → top-down, BGR→RGB
    fps = int(rate // scale) if rate and scale else 0
    return int(width), int(height), fps, out


def synth_avi_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL AVI payloads from an id column: item i is a
    (3 + i%4) × (4 + i%5) video of (2 + i%4) frames at (10 + i%3) fps
    whose frame t, pixel index k = y·W + x has R = (k + i + t) % 256,
    G = (2k + 3t + i) % 256, B = (i + 5t) % 256 — a per-frame gradient,
    so decode bugs (row order, BGR swap, stride padding, frame count)
    shift the channel sums the oracle states arithmetically."""

    def _run(batches):
        for pdf in batches:
            ids, payload = [], []
            for iid in pdf[id_col]:
                i = int(iid)
                w, h, n, fps = 4 + i % 5, 3 + i % 4, 2 + i % 4, 10 + i % 3
                k = np.arange(h * w, dtype=np.int64)
                frames = []
                for t in range(n):
                    rgb = np.stack(
                        [(k + i + t) % 256, (2 * k + 3 * t + i) % 256,
                         np.full(h * w, (i + 5 * t) % 256, dtype=np.int64)],
                        axis=1,
                    ).astype(np.uint8).reshape(h, w, 3)
                    frames.append(rgb)
                ids.append(i)
                payload.append(encode_avi_rgb24(w, h, fps, frames))
            yield pd.DataFrame({"item_id": ids, "payload": payload})

    return df.select(id_col).mapInPandas(
        _run, schema="item_id long, payload binary"
    )


def video_decode_stats(
    df: DataFrame, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL AVI decode → integer contract columns: (item_id, width,
    height, fps, n_frames, sum_r, sum_g, sum_b) with channel sums over
    ALL frames — exact BIGINTs, so the contract is float-free and any
    decode defect (dropped frame, padded bytes leaking into pixels,
    channel swap) lands in a sum."""

    def _run(batches):
        for pdf in batches:
            rows = []
            for iid, b in zip(pdf[id_col], pdf[payload_col]):
                w, h, fps, fr = decode_avi(b)
                s = fr.astype(np.int64).sum(axis=(0, 1, 2))
                rows.append(
                    {"item_id": int(iid), "width": w, "height": h,
                     "fps": fps, "n_frames": fr.shape[0],
                     "sum_r": int(s[0]), "sum_g": int(s[1]),
                     "sum_b": int(s[2])}
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        _run,
        schema="item_id long, width long, height long, fps long, "
               "n_frames long, sum_r long, sum_g long, sum_b long",
    )


# --- perceptual near-dup: average hash ---------------------------------------

AHASH_GRID_H, AHASH_GRID_W = 6, 8  # 48 bits — plugs into simhash_near_pairs
# ITU-R BT.601 luma weights as the standard integer milli-ratios (public)
LUMA_R, LUMA_G, LUMA_B = 299, 587, 114


def ahash_fingerprints(
    df: DataFrame,
    grid_h: int = AHASH_GRID_H,
    grid_w: int = AHASH_GRID_W,
    id_col: str = "item_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Average-hash perceptual fingerprints over REAL decoded images —
    the classic aHash scheme (public: the pHash family / imagehash
    convention): decode → nearest-neighbor downsample to a
    ``grid_h × grid_w`` integer-luma grid → threshold each cell against
    the grid's integer mean → one bit per cell.  Near-duplicate images
    (recompressions, slight crops, brightness-preserving edits) land
    within a few bits of each other, so the 48-bit default plugs
    STRAIGHT into ``operators.dedup.simhash_near_pairs`` — the same
    pigeonhole-blocked Hamming join dedups text SimHashes and image
    aHashes with one code path.

    Every step is integer arithmetic (the DIV grid map shared with
    ``resize_nn_stats``, milli-weight BT.601 luma, floor mean,
    ``>=`` threshold), so fingerprints are bit-identical across
    engines and cluster sizes.  Bits: cell (y, x) → bit ``y·grid_w+x``;
    48 bits keeps the hash a positive long.

    Output: (``id_col`` long, simhash long) — named for the Hamming
    join's input contract.
    """
    bits = grid_h * grid_w
    if bits > 62:
        raise ValueError(f"grid {grid_h}x{grid_w} exceeds 62 hash bits")
    weights = np.int64(1) << np.arange(bits, dtype=np.int64)

    def _run(batches):
        for pdf in batches:
            ids, hashes = [], []
            for iid, b in zip(pdf[id_col], pdf[payload_col]):
                img = decode_ppm(bytes(b)).astype(np.int64)
                h, w = img.shape[0], img.shape[1]
                ys = (np.arange(grid_h, dtype=np.int64) * h) // grid_h
                xs = (np.arange(grid_w, dtype=np.int64) * w) // grid_w
                cell = img[ys][:, xs]
                luma = (
                    LUMA_R * cell[:, :, 0]
                    + LUMA_G * cell[:, :, 1]
                    + LUMA_B * cell[:, :, 2]
                ) // 1000
                mean = int(luma.sum()) // bits
                bitvec = (luma.reshape(-1) >= mean).astype(np.int64)
                hashes.append(int((bitvec * weights).sum()))
                ids.append(int(iid))
            yield pd.DataFrame({id_col: ids, "simhash": hashes})

    return df.select(id_col, payload_col).mapInPandas(
        _run, schema=f"{id_col} long, simhash long"
    )


def synth_family_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic near-duplicate image FAMILIES for the perceptual
    dedup contract: docs share a base pattern per group of 10
    (``g = id div 10`` picks per-channel multipliers spread by 37/59/97
    so distinct groups never collide at Hamming ≤ 3), and member
    ``m = id % 10`` perturbs the base by +128 on the red channel of
    pixels with ``idx % 10 < m`` — adjacent members are a few flipped
    cells apart (near-dups), distant members drift further.  Every
    value is integer arithmetic the DuckDB oracle replicates verbatim.

    Pixel idx of doc i (g = i div 10, m = i % 10, w = 4 + g % 5,
    h = 3 + g % 4):
        R = (idx·(3 + (g·37) % 101) + 13·g + 128·[idx % 10 < m]) % 256
        G = (idx·(5 + (g·59) % 127) + 29·g) % 256
        B = (idx·7 + 97·g) % 256
    """

    def _run(batches):
        for pdf in batches:
            ids, payload = [], []
            for iid in pdf[id_col]:
                i = int(iid)
                g, m = i // 10, i % 10
                w, h = 4 + g % 5, 3 + g % 4
                idx = np.arange(h * w, dtype=np.int64)
                r = (idx * (3 + (g * 37) % 101) + 13 * g
                     + 128 * (idx % 10 < m)) % 256
                gc = (idx * (5 + (g * 59) % 127) + 29 * g) % 256
                b = (idx * 7 + 97 * g) % 256
                rgb = np.stack([r, gc, b], axis=1).astype(np.uint8).reshape(h, w, 3)
                ids.append(i)
                payload.append(f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes())
            yield pd.DataFrame({"item_id": ids, "payload": payload})

    return df.select(id_col).mapInPandas(
        _run, schema="item_id long, payload binary"
    )


# --- content-defined chunking (LBFS/CDC storage dedup) ---------------------

CDC_WINDOW = 32       # rolling window, bytes
CDC_MASK = 511        # boundary when h % 512 == 0 (~512 B mean chunk)
CDC_GEAR_MULT = 2654435761  # Knuth multiplicative hash for the gear table


def _cdc_boundaries_np(data: "np.ndarray") -> "np.ndarray":
    """0-based END indices (inclusive) of content-defined boundaries.

    The gear rolling hash has a CLOSED FORM over a fixed window —
    h_i = (Σ_{j=0..W−1} G[b_{i−j}]·2^j) mod 2^32 — so it vectorizes as
    one sliding-window integer dot product (no per-byte Python loop),
    and the DuckDB oracle can replicate it as a windowed SQL sum.
    """
    import numpy as np

    n = data.shape[0]
    if n < CDC_WINDOW:
        return np.empty(0, dtype=np.int64)
    g = ((data.astype(np.int64) * CDC_GEAR_MULT) % 65536).astype(np.int64)
    w = (1 << np.arange(CDC_WINDOW, dtype=np.int64))  # 2^j, j = offset
    # window ending at byte i covers b[i-W+1 .. i]; weight 2^j for the
    # byte j positions BEFORE i  ⇒ reverse the weight vector
    win = np.lib.stride_tricks.sliding_window_view(g, CDC_WINDOW)
    h = (win @ w[::-1]) % (1 << 32)
    ends = np.nonzero(h % (CDC_MASK + 1) == 0)[0] + CDC_WINDOW - 1
    return ends.astype(np.int64)


def cdc_chunks(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Content-defined chunking (LBFS, Muthitacharoen et al. 2001,
    SOSP — public): split each payload at positions where a rolling
    gear hash of the trailing 32 bytes hits ``h % 512 == 0``, so chunk
    boundaries follow CONTENT, not offsets — an insertion early in a
    page shifts every fixed-block boundary but leaves all later CDC
    chunks (and their digests) intact.  The storage-dedup primitive
    below WARC revisit records: shared chunks across captures /
    mirrors / boilerplate store once.

    Output: (id, chunk_idx, start, chunk_len, chunk_md5, reuse) — one
    row per chunk, ``reuse`` = how many chunks corpus-wide share the
    digest.

    Scale design: boundary detection is ONE Arrow kernel per doc (a
    vectorized sliding-window dot product — the closed form above —
    never per-byte Python); chunk rows carry (start, len) + a digest,
    not the bytes; the reuse count is a map-combinable groupBy on the
    16-byte digest joined back (the same shape as exact_substr's
    duplicated-gram count).  Payloads never re-shuffle.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    out_schema = f"{id_col} long, chunk_idx long, start long, chunk_len long, chunk_bytes binary"

    def _run(batches):
        for pdf in batches:
            ids, idxs, starts, lens, chs = [], [], [], [], []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                raw = (t or "").encode("utf-8")
                b = np.frombuffer(raw, dtype=np.uint8)
                ends = _cdc_boundaries_np(b)
                prev = 0
                ci = 0
                cuts = [int(e) + 1 for e in ends] + (
                    [len(b)] if (len(b) and (not len(ends) or ends[-1] != len(b) - 1)) else []
                )
                for cut in cuts:
                    ids.append(did)
                    idxs.append(ci)
                    starts.append(prev)
                    lens.append(cut - prev)
                    # slice BYTES, not chars: boundaries live in byte
                    # space and the storage digest is over bytes — a
                    # multibyte char never splits a digest's identity
                    chs.append(raw[prev:cut])
                    ci += 1
                    prev = cut
            yield pd.DataFrame(
                {id_col: ids, "chunk_idx": idxs, "start": starts,
                 "chunk_len": lens, "chunk_bytes": chs}
            )

    chunks = docs.select(id_col, text_col).mapInPandas(_run, schema=out_schema)
    chunks = chunks.select(
        id_col, "chunk_idx", "start", "chunk_len",
        F.md5("chunk_bytes").alias("chunk_md5"),
    )
    reuse = chunks.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).alias("reuse")
    )
    return chunks.join(reuse, "chunk_md5").select(
        id_col, "chunk_idx", "start", "chunk_len", "chunk_md5",
        F.col("reuse").cast("long").alias("reuse"),
    )
