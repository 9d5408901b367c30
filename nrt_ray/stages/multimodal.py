"""Multimodal (binary-payload) columns: schema, codecs, actor-pool stages.

Images / audio / video ride through the engine as opaque ``binary``
columns plus typed metadata, exactly like ``html`` does in the webtext
table.  Two codec tiers:

* **Real, library-free codecs** — uncompressed 24-bit BMP
  (:func:`encode_bmp` / :func:`decode_bmp`) and PCM-16 mono WAV
  (:func:`encode_wav` / :func:`decode_wav`) are pure byte arithmetic, so
  the decode → feature-extract path (:class:`BmpStats`,
  :class:`WavStats`) is a genuine binary decode pipeline with no
  container dependency; it is oracle-checked end-to-end in the driver
  catalog (``pipelines/mmops.py``).
* **Real compressed codecs** — PNG (8-bit grayscale/truecolor,
  non-interlaced) is zlib + per-scanline filters, both pure
  stdlib/numpy, so :func:`encode_png` / :func:`decode_png` are REAL
  compressed-image codecs: the encoder cycles through all five PNG
  filter types (None/Sub/Up/Average/Paeth) so a decode that mishandles
  any inverse filter breaks the oracle match.  JPEG (baseline
  sequential, 8-bit, 1×1 sampling) is implemented in full from the
  T.81 spec — FDCT, Annex-K quantization, zigzag, DC prediction,
  run-length AC, canonical Huffman with byte stuffing, all markers —
  as :func:`encode_jpeg` / :func:`decode_jpeg` (pure numpy, no
  libraries); progressive / subsampled / 12-bit streams raise at the
  documented plug-in point.
  GIF89a (grayscale palette, full frames) is a real from-scratch
  variable-width LZW codec (:func:`encode_gif` / :func:`decode_gif`),
  and AVI (:func:`encode_avi` / :func:`demux_avi`) is a real RIFF
  container demux over uncompressed DIB frames.
* **Stubbed codecs** — compressed video codecs (H.26x etc.) need
  libraries absent from this container, so :class:`FrameSampler` keeps
  a ``decode="stub"`` byte-chunking fake and ``decode="real"`` raises
  at the exact plug-in point (real container demux lives in
  :class:`AviFrameSampler`).

Stages:

* :class:`ImageMeta` — parse width/height/format from real magic bytes
  (PNG/JPEG/GIF/BMP headers are plain byte arithmetic).
* :class:`BmpStats` / :class:`WavStats` — REAL binary decode →
  per-payload statistics (actor-pool ``map_batches`` shape).
* :class:`ImageFeatures` — per-image feature vector (actor pool; the
  stub derives a deterministic float vector from a streaming hash of the
  payload, shaped like a real embedding head output).
* :class:`FrameSampler` — "video" payload → every k-th fixed-size chunk
  as a frame row (flat_map-shaped: one input row fans out to many).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

#: image/audio rows are wide — keep batches small so batch × concurrency
#: fits in a worker heap (see README scale notes)
BINARY_BATCH_SIZE = 256


def parse_image_header(payload: bytes):
    """(format, width, height) from magic bytes; (None, 0, 0) if unknown.

    Pure byte arithmetic — works without any imaging library.
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return "png", w, h
    if payload[:2] == b"\xff\xd8":  # JPEG: scan for SOF marker
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                h = int.from_bytes(payload[i + 5:i + 7], "big")
                w = int.from_bytes(payload[i + 7:i + 9], "big")
                return "jpeg", w, h
            i += 2 + seg_len
        return "jpeg", 0, 0
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return "gif", w, h
    if payload[:2] == b"BM" and len(payload) >= 26:
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = abs(int.from_bytes(payload[22:26], "little", signed=True))
        return "bmp", w, h
    return None, 0, 0


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → uncompressed 24-bit BI_RGB BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding)."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) // 4 * 4
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up row order, BGR channel order
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → (h, w, 3) uint8 RGB array.

    Handles bottom-up (positive height) and top-down (negative height)
    layouts and row padding; rejects compressed / non-24-bit files.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (planes={planes}, bpp={bpp}, "
                         f"compression={compression})")
    top_down = h < 0
    ah = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * ah,
                         offset=offset).reshape(ah, stride)
    rgb = rows[:, :w * 3].reshape(ah, w, 3)[:, :, ::-1]
    return rgb if top_down else rgb[::-1]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized (a=left, b=up, c=upper-left)."""
    p = a + b - c
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """uint8 array → REAL PNG bytes (8-bit, non-interlaced, zlib IDAT).

    ``(h, w, 3)`` encodes truecolor (color type 2), ``(h, w)`` grayscale
    (color type 0).  ``filter_mode="cycle"`` filters scanline ``r`` with
    type ``r % 5`` so every PNG filter (None/Sub/Up/Average/Paeth) is
    exercised; ``"none"`` emits filter 0 everywhere.  All filter math is
    the spec's mod-256 byte arithmetic (forward direction).
    """
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if gray:
        arr = arr[:, :, None]
    h, w, bpp = arr.shape
    raw = arr.astype(np.int64)
    zero = np.zeros((1, bpp), np.int64)
    prev = np.zeros((w, bpp), np.int64)
    out = bytearray()
    for r in range(h):
        cur = raw[r]
        ft = 0 if filter_mode == "none" else r % 5
        left = np.vstack([zero, cur[:-1]])
        if ft == 0:
            f = cur
        elif ft == 1:
            f = (cur - left) % 256
        elif ft == 2:
            f = (cur - prev) % 256
        elif ft == 3:
            f = (cur - (left + prev) // 2) % 256
        else:
            ul = np.vstack([zero, prev[:-1]])
            f = (cur - _paeth(left, prev, ul)) % 256
        out.append(ft)
        out += f.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode: 8-bit grayscale / truecolor, non-interlaced.

    Walks the chunk list with CRC verification, inflates the
    concatenated IDAT stream, and inverts all five scanline filter
    types per the PNG spec.  Returns ``(h, w)`` uint8 for grayscale,
    ``(h, w, 3)`` for truecolor; rejects other bit depths / color
    types / interlacing (the honest plug-in point for a full library).
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), \
            payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8 or ctype_ not in (0, 2) or comp or filt or interlace:
        raise ValueError(f"unsupported PNG (depth={depth}, "
                         f"color={ctype_}, interlace={interlace})")
    bpp = 3 if ctype_ == 2 else 1
    stride = w * bpp + 1
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != stride * h:
        raise ValueError("PNG pixel data length mismatch")
    raw = raw.reshape(h, stride)
    out = np.zeros((h, w, bpp), dtype=np.int64)
    prev = np.zeros((w, bpp), np.int64)
    for r in range(h):
        ft = int(raw[r, 0])
        f = raw[r, 1:].astype(np.int64).reshape(w, bpp)
        if ft == 0:
            cur = f
        elif ft == 1:                      # Sub: prefix sum along the row
            cur = np.cumsum(f, axis=0) % 256
        elif ft == 2:                      # Up
            cur = (f + prev) % 256
        elif ft == 3:                      # Average: sequential in x
            cur = np.empty_like(f)
            left = np.zeros(bpp, np.int64)
            for x in range(w):
                left = (f[x] + (left + prev[x]) // 2) % 256
                cur[x] = left
        elif ft == 4:                      # Paeth: sequential in x
            cur = np.empty_like(f)
            left = np.zeros(bpp, np.int64)
            ul = np.zeros(bpp, np.int64)
            for x in range(w):
                left = (f[x] + _paeth(left, prev[x], ul)) % 256
                cur[x] = left
                ul = prev[x]
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = cur
        prev = cur
    out = out.astype(np.uint8)
    return out[:, :, 0] if ctype_ == 0 else out


class PngStats:
    """Actor-pool stage: REAL PNG decode (inflate + unfilter) →
    per-image dimensions and exact per-channel integer pixel sums."""

    def __init__(self, payload_col: str = "payload"):
        self.col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, sr, sg, sb = [], [], [], [], []
        for b in batch[self.col].to_pylist():
            rgb = decode_png(b).astype(np.int64)
            hs.append(rgb.shape[0])
            ws.append(rgb.shape[1])
            csum = rgb.sum(axis=(0, 1))
            sr.append(int(csum[0]))
            sg.append(int(csum[1]))
            sb.append(int(csum[2]))
        return batch.drop_columns([self.col]) \
            .append_column("img_width", pa.array(ws, pa.int64())) \
            .append_column("img_height", pa.array(hs, pa.int64())) \
            .append_column("px_sum_r", pa.array(sr, pa.int64())) \
            .append_column("px_sum_g", pa.array(sg, pa.int64())) \
            .append_column("px_sum_b", pa.array(sb, pa.int64()))


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples → PCM-16 RIFF/WAVE bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """PCM-16 mono RIFF/WAVE bytes → (sample_rate, int16 sample array).

    Walks the RIFF chunk list (tolerates extra chunks before/between
    ``fmt `` and ``data``); rejects non-PCM / non-mono / non-16-bit.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            afmt, nch, rate, _, _, bits = struct.unpack_from("<HHIIHH",
                                                             body, 0)
            if afmt != 1 or nch != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={afmt}, ch={nch}, "
                                 f"bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)          # chunks are 2-byte aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


class BmpStats:
    """Actor-pool stage: REAL BMP decode → per-image statistics
    (dimensions + exact per-channel integer pixel sums)."""

    def __init__(self, payload_col: str = "payload"):
        self.col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, sr, sg, sb = [], [], [], [], []
        for b in batch[self.col].to_pylist():
            rgb = decode_bmp(b).astype(np.int64)
            hs.append(rgb.shape[0])
            ws.append(rgb.shape[1])
            csum = rgb.sum(axis=(0, 1))
            sr.append(int(csum[0]))
            sg.append(int(csum[1]))
            sb.append(int(csum[2]))
        return batch.drop_columns([self.col]) \
            .append_column("img_width", pa.array(ws, pa.int64())) \
            .append_column("img_height", pa.array(hs, pa.int64())) \
            .append_column("px_sum_r", pa.array(sr, pa.int64())) \
            .append_column("px_sum_g", pa.array(sg, pa.int64())) \
            .append_column("px_sum_b", pa.array(sb, pa.int64()))


def resize_nn(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) array — the standard
    ``src = floor(dst * src_size / dst_size)`` index map, pure numpy."""
    h, w, _ = rgb.shape
    sy = (np.arange(out_h) * h) // out_h
    sx = (np.arange(out_w) * w) // out_w
    return rgb[sy][:, sx]


class BmpResizeStats:
    """Actor-pool stage: REAL BMP decode → nearest-neighbor resize →
    re-encode → re-decode → exact per-channel sums of the resized image.
    The encode/decode roundtrip on the resized pixels exercises BOTH
    codec directions inside the transform."""

    def __init__(self, out_w: int = 8, out_h: int = 6,
                 payload_col: str = "payload"):
        self.out_w = out_w
        self.out_h = out_h
        self.col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sr, sg, sb = [], [], []
        for b in batch[self.col].to_pylist():
            small = resize_nn(decode_bmp(b), self.out_w, self.out_h)
            rt = decode_bmp(encode_bmp(small)).astype(np.int64)
            csum = rt.sum(axis=(0, 1))
            sr.append(int(csum[0]))
            sg.append(int(csum[1]))
            sb.append(int(csum[2]))
        n = batch.num_rows
        return batch.drop_columns([self.col]) \
            .append_column("out_width",
                           pa.array([self.out_w] * n, pa.int64())) \
            .append_column("out_height",
                           pa.array([self.out_h] * n, pa.int64())) \
            .append_column("px_sum_r", pa.array(sr, pa.int64())) \
            .append_column("px_sum_g", pa.array(sg, pa.int64())) \
            .append_column("px_sum_b", pa.array(sb, pa.int64()))


class WavStats:
    """Actor-pool stage: REAL WAV decode → sample stats (rate, count,
    exact integer amplitude sum and energy)."""

    def __init__(self, payload_col: str = "payload"):
        self.col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, ns, amps, energies = [], [], [], []
        for b in batch[self.col].to_pylist():
            rate, s = decode_wav(b)
            s64 = s.astype(np.int64)
            rates.append(rate)
            ns.append(len(s))
            amps.append(int(s64.sum()))
            energies.append(int((s64 * s64).sum()))
        return batch.drop_columns([self.col]) \
            .append_column("sample_rate", pa.array(rates, pa.int64())) \
            .append_column("n_samples", pa.array(ns, pa.int64())) \
            .append_column("amp_sum", pa.array(amps, pa.int64())) \
            .append_column("energy", pa.array(energies, pa.int64()))


def resample_nn(samples: np.ndarray, src_rate: int,
                dst_rate: int) -> np.ndarray:
    """Nearest-neighbor (zero-order-hold) resample of a 1-D sample
    array: output length ``n*dst//src``, sample ``i`` reads source
    index ``i*src//dst`` — the audio analog of :func:`resize_nn`."""
    n = len(samples)
    out_n = (n * dst_rate) // src_rate
    idx = (np.arange(out_n, dtype=np.int64) * src_rate) // dst_rate
    return samples[idx]


class WavResampleStats:
    """Actor-pool stage: REAL WAV decode → NN resample to ``dst_rate``
    → re-encode → re-decode → exact integer stats of the resampled
    signal (both codec directions exercised per payload)."""

    def __init__(self, dst_rate: int = 3000, payload_col: str = "payload"):
        self.dst_rate = dst_rate
        self.col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, amps, energies = [], [], []
        for b in batch[self.col].to_pylist():
            rate, s = decode_wav(b)
            r = resample_nn(s, rate, self.dst_rate)
            _, rt = decode_wav(encode_wav(r, self.dst_rate))
            r64 = rt.astype(np.int64)
            ns.append(len(r64))
            amps.append(int(r64.sum()))
            energies.append(int((r64 * r64).sum()))
        n = batch.num_rows
        return batch.drop_columns([self.col]) \
            .append_column("dst_rate",
                           pa.array([self.dst_rate] * n, pa.int64())) \
            .append_column("n_samples", pa.array(ns, pa.int64())) \
            .append_column("amp_sum", pa.array(amps, pa.int64())) \
            .append_column("energy", pa.array(energies, pa.int64()))


class ImageMeta:
    """Batch transform: binary image column → typed metadata columns."""

    def __init__(self, payload_col: str = "payload"):
        self.col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts, ws, hs, sizes = [], [], [], []
        for b in batch[self.col].to_pylist():
            f, w, h = parse_image_header(b or b"")
            fmts.append(f)
            ws.append(w)
            hs.append(h)
            sizes.append(len(b or b""))
        return batch.append_column("img_format",
                                   pa.array(fmts, pa.string())) \
            .append_column("img_width", pa.array(ws, pa.int32())) \
            .append_column("img_height", pa.array(hs, pa.int32())) \
            .append_column("img_bytes", pa.array(sizes, pa.int64()))


class ImageFeatures:
    """Actor-pool stage: binary image → fixed-size float32 feature vector.

    ``decode="real"`` genuinely decodes BMP (:func:`decode_bmp`) and PNG
    (:func:`decode_png`) payloads and emits a unit-norm ``dim``-bin
    grayscale-histogram vector — a real pixels→features head with no
    container dependency; JPEG/GIF payloads raise at the exact plug-in
    point (DCT/LZW codecs need a library absent here).  The default
    ``decode="stub"`` derives a deterministic unit-norm vector from a
    BLAKE2 stream over the raw bytes so downstream similarity / dedup
    stages exercise the same schema and batch shapes format-free.

    Use as ``ds.map_batches(ImageFeatures, fn_constructor_kwargs=...,
    batch_size=BINARY_BATCH_SIZE, concurrency=N, num_cpus=1)``.
    """

    def __init__(self, dim: int = 64, payload_col: str = "payload",
                 decode: str = "stub"):
        if decode not in ("stub", "real"):
            raise ValueError("decode must be 'stub' or 'real'")
        self.dim = dim
        self.col = payload_col
        self.decode = decode

    def _stub_features(self, payload: bytes) -> np.ndarray:
        raw = np.frombuffer(
            hashlib.blake2b(payload, digest_size=self.dim).digest(),
            dtype=np.uint8).astype(np.float32)
        v = (raw - 127.5) / 127.5
        n = np.linalg.norm(v)
        return v / (n if n else 1.0)

    def _real_features(self, payload: bytes) -> np.ndarray:
        fmt, _, _ = parse_image_header(payload)
        if fmt == "bmp":
            px = decode_bmp(payload)
        elif fmt == "png":
            px = decode_png(payload)
        elif fmt == "jpeg":
            px = decode_jpeg(payload)
        elif fmt == "gif":
            px = decode_gif(payload)
            if px.ndim == 3:
                px = px[0]               # first frame of an animation
        else:
            raise NotImplementedError(
                f"real decode of {fmt or 'unknown'} payloads requires an "
                "imaging library not present in this container; plug "
                "Pillow/torchvision in here")
        if px.ndim == 3:                       # ITU-R 601 integer luma
            px = (px.astype(np.int64) @ [299, 587, 114]) // 1000
        hist = np.bincount((px.ravel().astype(np.int64) * self.dim)
                           // 256, minlength=self.dim).astype(np.float32)
        n = np.linalg.norm(hist)
        return hist / (n if n else 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = (self._real_features if self.decode == "real"
              else self._stub_features)
        feats = [fn(b or b"") for b in batch[self.col].to_pylist()]
        col = pa.array([f.tolist() for f in feats],
                       pa.list_(pa.float32()))
        return batch.drop_columns([self.col]) \
            .append_column("features", col)


class FrameSampler:
    """Batch transform: "video" binary → every ``stride``-th fixed-size
    chunk as its own frame row (id, frame_no, frame payload).

    Real frame extraction would use a media library; the chunking layout,
    fan-out shape and output schema are the real plumbing.
    """

    def __init__(self, id_col: str = "id", payload_col: str = "payload",
                 frame_bytes: int = 4096, stride: int = 10,
                 decode: str = "stub"):
        if decode == "real":
            raise NotImplementedError(
                "real video frame decoding requires ffmpeg/av bindings "
                "not present in this container")
        self.id_col = id_col
        self.col = payload_col
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_nos, frames = [], [], []
        for vid, b in zip(batch[self.id_col].to_pylist(),
                          batch[self.col].to_pylist()):
            b = b or b""
            n_chunks = max(len(b) // self.frame_bytes, 0)
            for fno in range(0, n_chunks, self.stride):
                start = fno * self.frame_bytes
                ids.append(vid)
                frame_nos.append(fno)
                frames.append(b[start:start + self.frame_bytes])
        return pa.table({
            self.id_col: pa.array(ids),
            "frame_no": pa.array(frame_nos, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


# ---------------------------------------------------------------------------
# JPEG — REAL baseline sequential DCT codec (pure numpy, no libraries)
# ---------------------------------------------------------------------------
# Encoder and decoder implement the full ITU T.81 baseline pipeline:
# level shift → 8×8 FDCT → quantization → zigzag → DC-differential +
# AC run-length → canonical Huffman entropy coding with byte stuffing,
# wrapped in SOI/DQT/SOF0/DHT/SOS/EOI markers.  The Huffman tables are
# CUSTOM canonical tables carried in DHT segments (spec-compliant —
# optimized encoders routinely emit their own), so the decoder builds
# its codes from the stream like any real JPEG reader.  Only 8-bit
# baseline with 1×1 sampling (grayscale or 4:4:4 color) is supported;
# everything else raises at the documented plug-in point.

_JPEG_Q_LUM = np.array([        # ITU T.81 Annex K.1 luminance table
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.int64)

_JPEG_Q_CHR = np.array([        # Annex K.2 chrominance table
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.int64)


def _zigzag_order() -> np.ndarray:
    """The standard JPEG zigzag scan as flat 8×8 indices."""
    out = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 \
            else range(max(0, s - 7), min(s, 7) + 1)
        for u in rng:
            out.append(u * 8 + (s - u))
    return np.array(out, np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

_DCT_M = (np.array([[np.cos((2 * x + 1) * u * np.pi / 16)
                     for x in range(8)] for u in range(8)])
          * np.r_[1 / np.sqrt(2), np.ones(7)][:, None] / 2.0)

# canonical Huffman tables: 12 DC symbols (categories 0..11) at 4 bits,
# 162 AC symbols at 9 bits — Kraft-feasible, no all-ones max code
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s
                           for r in range(16) for s in range(1, 11)]
_DC_BITS = [0, 0, 0, 12] + [0] * 12          # all 12 codes length 4
_AC_BITS = [0] * 8 + [162] + [0] * 7         # all 162 codes length 9


def _canonical_codes(bits, syms):
    """(symbol → (code, length)) for a canonical Huffman table."""
    table, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[syms[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return table


_DC_ENC = _canonical_codes(_DC_BITS, _DC_SYMS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_SYMS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:               # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)   # pad with 1-bits per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, coefs: np.ndarray, dc_prev: int) -> int:
    """Huffman-encode one quantized zigzag block; returns its DC."""
    dc = int(coefs[0])
    diff = dc - dc_prev
    s = _category(diff)
    code, ln = _DC_ENC[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(coefs)[0])) if np.any(coefs) else 0
    for k in range(1, 64):
        v = int(coefs[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = _AC_ENC[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = _AC_ENC[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = _AC_ENC[0x00]              # EOB
        bw.write(code, ln)
    return dc


def _quantize_plane(plane: np.ndarray, q: np.ndarray, bw: _BitWriter,
                    dc_prev: int) -> int:
    """FDCT + quantize + entropy-code every 8×8 block of one plane."""
    h, w = plane.shape
    qz = q.reshape(-1)[_ZIGZAG].astype(np.float64)
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = plane[by:by + 8, bx:bx + 8].astype(np.float64) - 128.0
            coef = (_DCT_M @ blk @ _DCT_M.T).reshape(-1)[_ZIGZAG]
            kq = np.sign(coef) * np.floor(np.abs(coef) / qz + 0.5)
            dc_prev = _encode_block(bw, kq.astype(np.int64), dc_prev)
    return dc_prev


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _dht_segment(tc_th: int, bits, syms) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, q: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(
        int(v) for v in q.reshape(-1)[_ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(arr: np.ndarray) -> bytes:
    """uint8 array → REAL baseline JPEG bytes.

    ``(h, w)`` encodes single-component grayscale; ``(h, w, 3)`` encodes
    4:4:4 YCbCr color.  Dimensions must be multiples of 8 (no padding
    logic — the synthetic fixtures are block-aligned; a general encoder
    would edge-extend).  Quantization is round-half-away-from-zero over
    the Annex K tables; entropy coding uses the module's canonical
    Huffman tables, carried in DHT segments like any real stream.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg needs block-aligned dimensions")
    out = bytearray(b"\xff\xd8")                       # SOI
    out += _dqt_segment(0, _JPEG_Q_LUM)
    ncomp = 1 if gray else 3
    if not gray:
        out += _dqt_segment(1, _JPEG_Q_CHR)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, _DC_BITS, _DC_SYMS)      # DC table 0
    out += _dht_segment(0x10, _AC_BITS, _AC_SYMS)      # AC table 0
    if not gray:
        out += _dht_segment(0x01, _DC_BITS, _DC_SYMS)
        out += _dht_segment(0x11, _AC_BITS, _AC_SYMS)
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    bw = _BitWriter()
    if gray:
        _quantize_plane(arr, _JPEG_Q_LUM, bw, 0)
    else:
        ycc = _rgb_to_ycbcr(arr)
        # 4:4:4, 1×1 sampling: MCU = one block per component, raster
        # order — interleave per MCU as the spec requires
        dc = [0, 0, 0]
        qz = [_JPEG_Q_LUM, _JPEG_Q_CHR, _JPEG_Q_CHR]
        for by in range(0, h, 8):
            for bx in range(0, w, 8):
                for c in range(3):
                    blk = ycc[by:by + 8, bx:bx + 8, c] \
                        .astype(np.float64) - 128.0
                    coef = (_DCT_M @ blk @ _DCT_M.T) \
                        .reshape(-1)[_ZIGZAG]
                    qv = qz[c].reshape(-1)[_ZIGZAG].astype(np.float64)
                    kq = np.sign(coef) * np.floor(np.abs(coef) / qv
                                                  + 0.5)
                    dc[c] = _encode_block(bw, kq.astype(np.int64),
                                          dc[c])
    out += bw.flush()
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 de-stuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:                       # marker: feed pad bits
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huff_tables(body: bytes):
    """One DHT segment body → {(tc, th): (mincode, maxcode, valptr,
    vals)} canonical decode tables (may hold several tables)."""
    out = {}
    pos = 0
    while pos < len(body):
        tc_th = body[pos]
        bits = list(body[pos + 1:pos + 17])
        nvals = sum(bits)
        vals = list(body[pos + 17:pos + 17 + nvals])
        mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
        code, i = 0, 0
        for ln in range(1, 17):
            valptr[ln] = i
            mincode[ln] = code
            code += bits[ln - 1]
            i += bits[ln - 1]
            maxcode[ln] = code - 1 if bits[ln - 1] else -1
            code <<= 1
        out[(tc_th >> 4, tc_th & 0xF)] = (mincode, maxcode, valptr,
                                          vals)
        pos += 17 + nvals
    return out


def _read_symbol(br: _BitReader, table) -> int:
    mincode, maxcode, valptr, vals = table
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        if maxcode[ln] >= 0 and code <= maxcode[ln]:
            return vals[valptr[ln] + (code - mincode[ln])]
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """REAL baseline JPEG decode (8-bit, 1×1 sampling): marker walk,
    DHT canonical-code construction, entropy decode with de-stuffing,
    dequantize, inverse zigzag, IDCT, level shift; YCbCr→RGB for
    3-component scans.  Rejects progressive / subsampled / 12-bit
    streams (the honest plug-in point for a full library)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt, huff, sof, scomp = {}, {}, None, None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        m = payload[pos + 1]
        if m == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4:pos + 2 + ln]
        if m == 0xDB:
            p = 0
            while p < len(body):
                tq = body[p] & 0xF
                if body[p] >> 4:
                    raise ValueError("16-bit DQT unsupported")
                z = np.frombuffer(body[p + 1:p + 65], np.uint8) \
                    .astype(np.int64)
                tbl = np.zeros(64, np.int64)
                tbl[_ZIGZAG] = z
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif m == 0xC4:
            huff.update(_decode_huff_tables(body))
        elif m == 0xC0:
            depth, h, w, nc = body[0], *struct.unpack_from(">HH", body,
                                                           1), body[5]
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported")
                comps.append((cid, tq))
            if depth != 8:
                raise ValueError("non-8-bit JPEG unsupported")
            sof = (h, w, comps)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif m == 0xDA:
            ns = body[0]
            scomp = [(body[1 + 2 * c], body[2 + 2 * c] >> 4,
                      body[2 + 2 * c] & 0xF) for c in range(ns)]
            pos += 2 + ln
            break
        pos += 2 + ln
    if sof is None or scomp is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = sof
    tq_of = dict(comps)
    br = _BitReader(payload, pos)
    planes = [np.zeros((h, w), np.int64) for _ in scomp]
    dc = [0] * len(scomp)
    zq = [qt[tq_of[cid]].reshape(-1)[_ZIGZAG] for cid, _, _ in scomp]
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            for ci, (cid, td, ta) in enumerate(scomp):
                s = _read_symbol(br, huff[(0, td)])
                diff = _extend(br.read_bits(s), s) if s else 0
                dc[ci] += diff
                coefs = np.zeros(64, np.int64)
                coefs[0] = dc[ci]
                k = 1
                while k < 64:
                    rs = _read_symbol(br, huff[(1, ta)])
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += rs >> 4
                    ssz = rs & 0xF
                    coefs[k] = _extend(br.read_bits(ssz), ssz)
                    k += 1
                deq = (coefs * zq[ci]).astype(np.float64)
                blk = np.zeros(64, np.float64)
                blk[_ZIGZAG] = deq
                px = _DCT_M.T @ blk.reshape(8, 8) @ _DCT_M + 128.0
                planes[ci][by:by + 8, bx:bx + 8] = np.clip(
                    np.rint(px), 0, 255).astype(np.int64)
    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    ycc = np.stack(planes, axis=-1).astype(np.uint8)
    return _ycbcr_to_rgb(ycc)


class JpegStats:
    """Actor-pool stage: REAL baseline JPEG decode (Huffman + dequant +
    IDCT) → per-image dimensions and the exact integer pixel sum."""

    def __init__(self, payload_col: str = "payload"):
        self.col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, ps = [], [], []
        for b in batch[self.col].to_pylist():
            px = decode_jpeg(b).astype(np.int64)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            ps.append(int(px.sum()))
        return batch.drop_columns([self.col]) \
            .append_column("img_width", pa.array(ws, pa.int64())) \
            .append_column("img_height", pa.array(hs, pa.int64())) \
            .append_column("px_sum", pa.array(ps, pa.int64()))


# ---------------------------------------------------------------------------
# AVI — REAL RIFF video container: mux + demux of uncompressed DIB frames
# ---------------------------------------------------------------------------
# A real video CONTAINER path with no codec dependency: AVI is RIFF
# ('RIFF' size 'AVI ' [LIST hdrl [avih, LIST strl [strh, strf]]]
#  [LIST movi ['00db' frame]...] [idx1]), and uncompressed DIB frames
# are the BMP pixel array (bottom-up BGR rows, 4-byte-aligned) without
# the file header.  encode_avi/demux_avi implement the container per
# the RIFF/AVI spec, so frame sampling over AVI payloads is REAL demux:
# the chunk walk must parse sizes, LIST nesting and row padding, and
# any error breaks the pixel-sum oracle.  Compressed streams (anything
# with a non-zero biCompression) raise at the plug-in point.

def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → REAL uncompressed AVI bytes."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    row_bytes = (w * 3 + 3) & ~3
    frame_size = row_bytes * h

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<10I", 10 ** 6 // fps, frame_size * fps, 0,
                       0x10, n, 0, 1, frame_size, w, h) \
        + struct.pack("<4I", 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<I", 0)
            + struct.pack("<2H", 0, 0)
            + struct.pack("<8I", 0, 1, fps, 0, n, frame_size, 0,
                          0xFFFFFFFF)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi_body = b""
    for f in frames:
        bgr = f[::-1, :, ::-1]          # bottom-up BGR, padded rows
        rows = np.zeros((h, row_bytes), np.uint8)
        rows[:, :w * 3] = bgr.reshape(h, w * 3)
        movi_body += chunk(b"00db", rows.tobytes())
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def demux_avi(payload: bytes) -> np.ndarray:
    """REAL AVI demux: RIFF/LIST chunk walk → (n, h, w, 3) uint8 RGB.

    Parses avih for dimensions, walks the movi LIST for '00db'/'00dc'
    frame chunks, and unpacks each uncompressed DIB (bottom-up BGR,
    4-byte-aligned rows).  Rejects compressed streams ('00dc' with
    non-zero biCompression) — the honest plug-in point for codecs."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    w = h = None
    compression = 0
    frames = []

    def walk(buf: bytes):
        nonlocal w, h, compression
        pos = 0
        while pos + 8 <= len(buf):
            fourcc = buf[pos:pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body = buf[pos + 8:pos + 8 + size]
            if fourcc == b"LIST":
                walk(body[4:])
            elif fourcc == b"avih":
                vals = struct.unpack_from("<10I", body, 0)
                w, h = vals[8], vals[9]
            elif fourcc == b"strf":
                compression = struct.unpack_from("<I", body, 16)[0]
                if compression:
                    raise ValueError("compressed AVI streams "
                                     "unsupported (biCompression="
                                     f"{compression})")
            elif fourcc in (b"00db", b"00dc"):
                frames.append(body)
            pos += 8 + size + (size % 2)

    walk(payload[12:])
    if w is None or not frames:
        raise ValueError("missing avih header or frame chunks")
    row_bytes = (w * 3 + 3) & ~3
    out = np.empty((len(frames), h, w, 3), np.uint8)
    for i, body in enumerate(frames):
        if len(body) != row_bytes * h:
            raise ValueError("AVI frame size mismatch")
        rows = np.frombuffer(body, np.uint8).reshape(h, row_bytes)
        bgr = rows[:, :w * 3].reshape(h, w, 3)
        out[i] = bgr[::-1, :, ::-1]
    return out


class AviFrameSampler:
    """REAL video-frame fan-out: AVI payload → every ``stride``-th
    DEMUXED frame as its own row (id, frame_no, h, w, exact pixel sum).
    The FrameSampler shape (one row fans out to many) with a real
    container walk instead of byte chunking."""

    def __init__(self, id_col: str = "id", payload_col: str = "payload",
                 stride: int = 2):
        self.id_col = id_col
        self.col = payload_col
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fnos, hs, ws, sums = [], [], [], [], []
        for vid, b in zip(batch[self.id_col].to_pylist(),
                          batch[self.col].to_pylist()):
            frames = demux_avi(b)
            for fno in range(0, len(frames), self.stride):
                f = frames[fno].astype(np.int64)
                ids.append(vid)
                fnos.append(fno)
                hs.append(f.shape[0])
                ws.append(f.shape[1])
                sums.append(int(f.sum()))
        return pa.table({
            self.id_col: pa.array(ids),
            "frame_no": pa.array(fnos, pa.int32()),
            "frame_h": pa.array(hs, pa.int64()),
            "frame_w": pa.array(ws, pa.int64()),
            "px_sum": pa.array(sums, pa.int64()),
        })


# ---------------------------------------------------------------------------
# GIF — REAL GIF89a codec: LZW compression from scratch (pure python/numpy)
# ---------------------------------------------------------------------------
# Grayscale-palette GIF with one or more full-size frames (a lossless
# animation container).  The LZW coder is the real variable-width
# algorithm — clear/end codes, LSB-first bit packing, width growth to
# 12 bits, dictionary reset at 4096 — so the decoder exercises the same
# machinery as any web GIF.  Local color tables, interlacing, partial
# frames and transparency raise at the documented plug-in point.

def _lzw_compress(data: bytes, mcs: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = n = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n
        acc |= code << n                 # LSB-first packing
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    table = {bytes([i]): i for i in range(1 << mcs)}
    nxt, width = end + 1, mcs + 1
    emit(clear, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        if nxt == 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << mcs)}
            nxt, width = end + 1, mcs + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, mcs: int, npix: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    acc = n = pos = 0
    prev = None
    while len(out) < npix:
        while n < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):         # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return bytes(out[:npix])


def _gif_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames: np.ndarray) -> bytes:
    """(n, h, w) or (h, w) uint8 grayscale → REAL GIF89a bytes with a
    256-entry grayscale palette and real LZW-compressed frame data."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None]
    n, h, w = frames.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])           # global table: 256 entries
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += pal.tobytes()                 # grayscale palette
    for f in frames:
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(8)                    # LZW min code size
        out += _gif_subblocks(_lzw_compress(f.tobytes(), 8))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """REAL GIF decode: screen descriptor, palette, sub-block walk,
    variable-width LZW.  Returns ``(h, w)`` uint8 for single-frame
    grayscale-palette GIFs, ``(n, h, w)`` for animations.  Non-gray
    palettes return the palette-mapped luma; local color tables,
    interlacing and partial frames raise at the plug-in point."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    pal = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        pal = np.frombuffer(payload[pos:pos + 3 * size],
                            np.uint8).reshape(size, 3)
        pos += 3 * size
    frames = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:
            break
        if b == 0x21:                    # extension: skip sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            left, top, fw, fh = struct.unpack_from("<HHHH", payload,
                                                   pos + 1)
            fpacked = payload[pos + 9]
            if fpacked & 0x80:
                raise ValueError("local color tables unsupported")
            if fpacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if (left, top, fw, fh) != (0, 0, w, h):
                raise ValueError("partial GIF frames unsupported")
            mcs = payload[pos + 10]
            pos += 11
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decompress(bytes(data), mcs, w * h),
                np.uint8).reshape(h, w)
            if pal is None:
                frames.append(idx)
            else:
                rgb = pal[idx].astype(np.int64)
                gray = (rgb @ [299, 587, 114]) // 1000
                frames.append(gray.astype(np.uint8))
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF has no image data")
    out = np.stack(frames)
    return out[0] if len(frames) == 1 else out


class GifStats:
    """Actor-pool stage: REAL GIF decode (LZW + palette) → frame count,
    dimensions and the exact integer pixel sum over all frames."""

    def __init__(self, payload_col: str = "payload"):
        self.col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, hs, ws, ps = [], [], [], []
        for b in batch[self.col].to_pylist():
            px = decode_gif(b)
            if px.ndim == 2:
                px = px[None]
            ns.append(px.shape[0])
            hs.append(px.shape[1])
            ws.append(px.shape[2])
            ps.append(int(px.astype(np.int64).sum()))
        return batch.drop_columns([self.col]) \
            .append_column("n_frames", pa.array(ns, pa.int64())) \
            .append_column("img_height", pa.array(hs, pa.int64())) \
            .append_column("img_width", pa.array(ws, pa.int64())) \
            .append_column("px_sum", pa.array(ps, pa.int64()))
