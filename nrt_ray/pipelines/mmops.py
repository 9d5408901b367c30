"""Multimodal decode pipelines over synthetic-but-REAL binary payloads.

The container has no imaging/audio libraries, but uncompressed 24-bit BMP
and PCM-16 WAV are pure byte arithmetic — so these queries exercise a
genuine ``binary``-column decode path end-to-end: a synthesis stage
renders a deterministic payload per ``doc_id`` (encode), an actor-pool
stage parses the bytes back (header walk, stride/padding, bottom-up row
order, RIFF chunk list) and emits exact integer statistics, and the
DuckDB oracle replays the same statistics in closed form from the pixel /
sample generating formula — any byte-level bug in either codec direction
breaks the match.

Pixel / sample formulas (all integer, so the oracle is exact):

* image: ``w = 4 + id%5``, ``h = 3 + id%7``; channel ``c`` of flat
  (row-major, top-down) pixel ``i`` = ``(id*7 + i*13 + c*29) % 256``
* audio: ``n = 64 + id%64`` samples at 8 kHz; sample ``i`` =
  ``(id*31 + i*17) % 4096 - 2048``
* video: payload byte ``j`` = ``(id + j) % 256``, length
  ``1000·(3 + id%13) + id%997`` (the tail exercises chunk truncation);
  frames = 1000-byte chunks sampled with stride 10

Scale shape: synthesis and decode are both per-batch ``map_batches``
stages (decode as an actor pool, ``BINARY_BATCH_SIZE`` rows per batch so
wide binary rows never blow a worker heap); only small stat rows leave
the stage.  At 100 TB the synthesis stage is replaced by
``read_parquet(columns=["doc_id", "payload"])`` — everything downstream
is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from nrt_ray.pipelines.relational import pool_size
from nrt_ray.stages.multimodal import (BINARY_BATCH_SIZE, BmpResizeStats,
                                       AviFrameSampler, BmpStats,
                                       FrameSampler, GifStats,
                                       JpegStats,
                                       PngStats,
                                       WavResampleStats, WavStats,
                                       encode_avi, encode_bmp,
                                       encode_gif,
                                       encode_jpeg,
                                       encode_png, encode_wav)

WAV_RATE = 8000
FRAME_BYTES = 1000
FRAME_STRIDE = 10


def _read_ids(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])


def synth_image(doc_id: int) -> bytes:
    """Deterministic 24-bit BMP for one doc id (see module formula)."""
    w = 4 + doc_id % 5
    h = 3 + doc_id % 7
    i = np.arange(w * h, dtype=np.int64)
    px = (doc_id * 7 + i[:, None] * 13
          + np.array([0, 29, 58], dtype=np.int64)) % 256
    return encode_bmp(px.reshape(h, w, 3).astype(np.uint8))


def synth_png(doc_id: int) -> bytes:
    """Deterministic REAL PNG (zlib + filter-cycled scanlines) for one
    doc id — same pixel formula as :func:`synth_image`, so the decode
    side must invert zlib AND all five PNG filters to match the oracle."""
    w = 4 + doc_id % 5
    h = 3 + doc_id % 7
    i = np.arange(w * h, dtype=np.int64)
    px = (doc_id * 7 + i[:, None] * 13
          + np.array([0, 29, 58], dtype=np.int64)) % 256
    return encode_png(px.reshape(h, w, 3).astype(np.uint8),
                      filter_mode="cycle")


def synth_jpeg(doc_id: int) -> bytes:
    """Deterministic REAL baseline JPEG for one doc id: block-aligned
    grayscale with EVEN-valued constant 8×8 blocks, so the DC-only
    quantization is exactly invertible (k = (v−128)/2 is an integer —
    no half-integer rounding boundary for float DCT noise to flip) and
    the decode is pixel-exact, giving the full Huffman/DCT machinery a
    closed-form SQL oracle."""
    w = 8 * (1 + doc_id % 3)
    h = 8 * (1 + doc_id % 2)
    nbx, nby = w // 8, h // 8
    b = np.arange(nbx * nby, dtype=np.int64)
    vb = (2 * ((doc_id * 7 + b * 13) % 128)).reshape(nby, nbx)
    img = np.kron(vb, np.ones((8, 8), np.int64)).astype(np.uint8)
    return encode_jpeg(img)


def synth_avi(doc_id: int) -> bytes:
    """Deterministic REAL uncompressed AVI for one doc id: RIFF/LIST
    container around bottom-up padded DIB frames, pixels from a
    closed-form formula the oracle replays."""
    nf = 2 + doc_id % 5
    w = 3 + doc_id % 4
    h = 2 + doc_id % 3
    i = np.arange(h * w, dtype=np.int64)
    frames = np.stack([
        ((doc_id * 11 + f * 5 + i[:, None] * 13
          + np.array([0, 29, 58], dtype=np.int64)) % 256)
        .reshape(h, w, 3) for f in range(nf)]).astype(np.uint8)
    return encode_avi(frames)


def synth_gif(doc_id: int) -> bytes:
    """Deterministic REAL GIF89a animation for one doc id: grayscale
    palette, real variable-width LZW frame data, pixels from a
    closed-form formula the oracle replays (GIF is lossless, so the
    decode is pixel-exact by construction)."""
    nf = 1 + doc_id % 3
    w = 5 + doc_id % 6
    h = 4 + doc_id % 5
    i = np.arange(h * w, dtype=np.int64)
    frames = np.stack([
        ((doc_id * 13 + f * 7 + i * 3) % 256).reshape(h, w)
        for f in range(nf)]).astype(np.uint8)
    return encode_gif(frames)


def synth_audio(doc_id: int) -> bytes:
    """Deterministic PCM-16 mono WAV for one doc id."""
    n = 64 + doc_id % 64
    i = np.arange(n, dtype=np.int64)
    s = (doc_id * 31 + i * 17) % 4096 - 2048
    return encode_wav(s.astype(np.int16), WAV_RATE)


def synth_video(doc_id: int) -> bytes:
    """Deterministic "video" byte stream for one doc id."""
    n = FRAME_BYTES * (3 + doc_id % 13) + doc_id % 997
    j = np.arange(n, dtype=np.int64)
    return ((doc_id + j) % 256).astype(np.uint8).tobytes()


def _synth_batch(batch: pa.Table, fn) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": batch["doc_id"],
        "payload": pa.array([fn(int(d)) for d in ids], pa.binary()),
    })


def image_decode_stats(sf_dir: str):
    """doc ids → BMP payloads → REAL decode → exact per-channel sums."""
    return _read_ids(sf_dir) \
        .map_batches(lambda t: _synth_batch(t, synth_image),
                     batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE) \
        .map_batches(BmpStats, batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE,
                     concurrency=pool_size())


def image_resize_stats(sf_dir: str):
    """doc ids → BMP payloads → REAL decode → nearest-neighbor resize to
    8×6 → encode/decode roundtrip → exact per-channel sums."""
    return _read_ids(sf_dir) \
        .map_batches(lambda t: _synth_batch(t, synth_image),
                     batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE) \
        .map_batches(BmpResizeStats, batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE,
                     concurrency=pool_size())


def image_png_decode_stats(sf_dir: str):
    """doc ids → REAL PNG payloads (zlib-compressed, scanlines filtered
    with all five PNG filter types) → REAL decode (CRC walk + inflate +
    unfilter) → exact per-channel sums.  Same oracle as the BMP path:
    the pixel formula replayed in closed form — any bug in either codec
    direction (filter math, Paeth predictor, CRC, stride) breaks it."""
    return _read_ids(sf_dir) \
        .map_batches(lambda t: _synth_batch(t, synth_png),
                     batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE) \
        .map_batches(PngStats, batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE,
                     concurrency=pool_size())


def image_jpeg_decode_stats(sf_dir: str):
    """doc ids → REAL baseline JPEG payloads (custom canonical Huffman
    tables in DHT, byte-stuffed entropy segment, Annex-K quantization)
    → REAL decode (marker walk + Huffman + dequant + IDCT) → exact
    integer pixel sums.  The fixture's even-valued constant blocks make
    the lossy pipeline exactly invertible, so the oracle replays the
    block-value formula in closed form — any bug in either codec
    direction (zigzag, DC prediction, bit stuffing, IDCT scale) breaks
    the match."""
    return _read_ids(sf_dir) \
        .map_batches(lambda t: _synth_batch(t, synth_jpeg),
                     batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE) \
        .map_batches(JpegStats, batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE,
                     concurrency=pool_size())


def video_avi_frame_stats(sf_dir: str):
    """doc ids → REAL AVI payloads → REAL container demux (RIFF walk,
    LIST nesting, DIB row padding, bottom-up BGR unpack) → every 2nd
    frame fans out to its own row with exact integer pixel sums.  The
    oracle replays the frame/pixel formula in closed form, so any demux
    error (chunk sizes, padding, channel order, frame order) breaks the
    match."""
    sampler = AviFrameSampler(id_col="doc_id", stride=2)
    return _read_ids(sf_dir) \
        .map_batches(lambda t: _synth_batch(t, synth_avi),
                     batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE) \
        .map_batches(sampler, batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE)


def image_gif_decode_stats(sf_dir: str):
    """doc ids → REAL GIF payloads (LZW-compressed grayscale-palette
    animations) → REAL decode (sub-block walk + variable-width LZW +
    palette mapping) → frame counts and exact pixel sums.  Closed-form
    oracle: any bug in LZW width growth, dictionary reset, KwKwK
    handling or the block walk breaks the match."""
    return _read_ids(sf_dir) \
        .map_batches(lambda t: _synth_batch(t, synth_gif),
                     batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE) \
        .map_batches(GifStats, batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE,
                     concurrency=pool_size())


def audio_decode_stats(sf_dir: str):
    """doc ids → WAV payloads → REAL decode → amplitude/energy sums."""
    return _read_ids(sf_dir) \
        .map_batches(lambda t: _synth_batch(t, synth_audio),
                     batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE) \
        .map_batches(WavStats, batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE,
                     concurrency=pool_size())


def audio_resample_stats(sf_dir: str):
    """doc ids → WAV payloads → REAL decode → NN resample 8 kHz→3 kHz →
    encode/decode roundtrip → exact integer stats."""
    return _read_ids(sf_dir) \
        .map_batches(lambda t: _synth_batch(t, synth_audio),
                     batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE) \
        .map_batches(WavResampleStats, batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE,
                     concurrency=pool_size())


def frame_sample_stats(sf_dir: str):
    """doc ids → "video" payloads → frame sampling (flat_map fan-out) →
    per-doc sampled-frame count and byte checksum."""
    sampler = FrameSampler(id_col="doc_id", frame_bytes=FRAME_BYTES,
                           stride=FRAME_STRIDE)

    def agg(frames: pa.Table) -> pa.Table:
        ids = frames["doc_id"].to_numpy(zero_copy_only=False)
        sums = np.array(
            [int(np.frombuffer(f, dtype=np.uint8).sum())
             for f in frames["frame"].to_pylist()], dtype=np.int64)
        uniq, inv = np.unique(ids, return_inverse=True)
        return pa.table({
            "doc_id": pa.array(uniq, pa.int64()),
            "n_frames": pa.array(np.bincount(inv), pa.int64()),
            "frame_byte_sum": pa.array(
                np.bincount(inv, weights=sums).astype(np.int64),
                pa.int64()),
        })

    # frames of one doc never split across batches: the sampler fans out
    # within a batch and agg runs on the sampler's own output batch
    return _read_ids(sf_dir) \
        .map_batches(lambda t: agg(sampler(_synth_batch(t, synth_video))),
                     batch_format="pyarrow",
                     batch_size=BINARY_BATCH_SIZE)


def image_stats_sql() -> str:
    """Closed-form replay of the pixel formula (exact integer sums)."""
    return """
        WITH d AS (
            SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
            FROM documents
        ),
        px AS (
            SELECT doc_id, w, h,
                   unnest(generate_series(0, w * h - 1)) AS i
            FROM d
        )
        SELECT doc_id,
               CAST(any_value(w) AS BIGINT) AS img_width,
               CAST(any_value(h) AS BIGINT) AS img_height,
               CAST(sum((doc_id * 7 + i * 13) % 256) AS BIGINT)
                   AS px_sum_r,
               CAST(sum((doc_id * 7 + i * 13 + 29) % 256) AS BIGINT)
                   AS px_sum_g,
               CAST(sum((doc_id * 7 + i * 13 + 58) % 256) AS BIGINT)
                   AS px_sum_b
        FROM px GROUP BY doc_id
    """


def resize_stats_sql() -> str:
    """Closed-form replay of the nearest-neighbor index map over the
    pixel formula: output pixel (y2, x2) reads source flat index
    ``(y2*h//6)*w + (x2*w//8)``."""
    return """
        WITH d AS (
            SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
            FROM documents
        ),
        g AS (
            SELECT doc_id, w, h, unnest(generate_series(0, 47)) AS p
            FROM d
        ),
        m AS (
            SELECT doc_id,
                   ((p // 8) * h // 6) * w + ((p % 8) * w // 8) AS i
            FROM g
        )
        SELECT doc_id,
               CAST(8 AS BIGINT) AS out_width,
               CAST(6 AS BIGINT) AS out_height,
               CAST(sum((doc_id * 7 + i * 13) % 256) AS BIGINT)
                   AS px_sum_r,
               CAST(sum((doc_id * 7 + i * 13 + 29) % 256) AS BIGINT)
                   AS px_sum_g,
               CAST(sum((doc_id * 7 + i * 13 + 58) % 256) AS BIGINT)
                   AS px_sum_b
        FROM m GROUP BY doc_id
    """


def audio_stats_sql() -> str:
    return f"""
        WITH d AS (
            SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
        ),
        s AS (
            SELECT doc_id, n,
                   (doc_id * 31 + unnest(generate_series(0, n - 1)) * 17)
                       % 4096 - 2048 AS v
            FROM d
        )
        SELECT doc_id,
               CAST({WAV_RATE} AS BIGINT) AS sample_rate,
               CAST(any_value(n) AS BIGINT) AS n_samples,
               CAST(sum(v) AS BIGINT) AS amp_sum,
               CAST(sum(v * v) AS BIGINT) AS energy
        FROM s GROUP BY doc_id
    """


def resample_stats_sql() -> str:
    """Closed-form replay of the NN resample index map over the sample
    formula: output length ``n*3000//8000``, output sample ``i`` reads
    source index ``i*8000//3000``."""
    return f"""
        WITH d AS (
            SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
        ),
        g AS (
            SELECT doc_id, n,
                   unnest(generate_series(
                       0, n * 3000 // {WAV_RATE} - 1)) AS i
            FROM d
        ),
        s AS (
            SELECT doc_id,
                   (doc_id * 31 + (i * {WAV_RATE} // 3000) * 17)
                       % 4096 - 2048 AS v
            FROM g
        )
        SELECT doc_id,
               CAST(3000 AS BIGINT) AS dst_rate,
               CAST(count(*) AS BIGINT) AS n_samples,
               CAST(sum(v) AS BIGINT) AS amp_sum,
               CAST(sum(v * v) AS BIGINT) AS energy
        FROM s GROUP BY doc_id
    """


def frame_stats_sql() -> str:
    return f"""
        WITH d AS (
            SELECT doc_id,
                   ({FRAME_BYTES} * (3 + doc_id % 13) + doc_id % 997)
                       // {FRAME_BYTES} AS n_chunks
            FROM documents
        ),
        fr AS (
            SELECT doc_id,
                   unnest(generate_series(0, CAST(n_chunks - 1 AS BIGINT),
                                          {FRAME_STRIDE})) AS f
            FROM d
        ),
        by_ AS (
            SELECT doc_id, f,
                   (doc_id + f * {FRAME_BYTES}
                    + unnest(generate_series(0, {FRAME_BYTES - 1}))) % 256
                       AS v
            FROM fr
        )
        SELECT doc_id,
               CAST(count(DISTINCT f) AS BIGINT) AS n_frames,
               CAST(sum(v) AS BIGINT) AS frame_byte_sum
        FROM by_ GROUP BY doc_id
    """


def jpeg_stats_sql() -> str:
    """Closed-form replay of the JPEG fixture: per block
    ``v = 2*((doc_id*7 + b*13) % 128)`` and the even-value DC-only
    pipeline decodes pixel-exact, so px_sum = Σ_b 64·v_b."""
    return """
        WITH d AS (
            SELECT doc_id,
                   8 * (1 + doc_id % 3) AS w,
                   8 * (1 + doc_id % 2) AS h
            FROM documents
        ),
        blk AS (
            SELECT doc_id, w, h,
                   unnest(generate_series(0, (w // 8) * (h // 8) - 1))
                       AS b
            FROM d
        )
        SELECT doc_id,
               CAST(any_value(w) AS BIGINT) AS img_width,
               CAST(any_value(h) AS BIGINT) AS img_height,
               CAST(sum(64 * 2 * ((doc_id * 7 + b * 13) % 128))
                    AS BIGINT) AS px_sum
        FROM blk GROUP BY doc_id
    """


def avi_frame_stats_sql() -> str:
    """Closed-form replay of the AVI fixture: sampled frames
    (fno % 2 = 0) × the per-channel pixel formula."""
    return """
        WITH d AS (
            SELECT doc_id, 2 + doc_id % 5 AS nf,
                   3 + doc_id % 4 AS w, 2 + doc_id % 3 AS h
            FROM documents
        ),
        f AS (
            SELECT doc_id, w, h,
                   unnest(generate_series(0, nf - 1)) AS fno
            FROM d
        ),
        sf AS (SELECT * FROM f WHERE fno % 2 = 0),
        px AS (
            SELECT doc_id, fno, w, h,
                   unnest(generate_series(0, w * h * 3 - 1)) AS j
            FROM sf
        )
        SELECT doc_id, CAST(fno AS BIGINT) AS frame_no,
               CAST(any_value(h) AS BIGINT) AS frame_h,
               CAST(any_value(w) AS BIGINT) AS frame_w,
               CAST(sum((doc_id * 11 + fno * 5 + (j // 3) * 13
                         + (j % 3) * 29) % 256) AS BIGINT) AS px_sum
        FROM px GROUP BY doc_id, fno
    """


def gif_stats_sql() -> str:
    """Closed-form replay of the GIF fixture (lossless decode)."""
    return """
        WITH d AS (
            SELECT doc_id, 1 + doc_id % 3 AS nf,
                   5 + doc_id % 6 AS w, 4 + doc_id % 5 AS h
            FROM documents
        ),
        px AS (
            SELECT doc_id, nf, w, h,
                   unnest(generate_series(0, nf * w * h - 1)) AS j
            FROM d
        )
        SELECT doc_id,
               CAST(any_value(nf) AS BIGINT) AS n_frames,
               CAST(any_value(h) AS BIGINT) AS img_height,
               CAST(any_value(w) AS BIGINT) AS img_width,
               CAST(sum((doc_id * 13 + (j // (w * h)) * 7
                         + (j % (w * h)) * 3) % 256) AS BIGINT)
                   AS px_sum
        FROM px GROUP BY doc_id
    """
