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
* **Real compressed codec** — PNG (8-bit grayscale/truecolor,
  non-interlaced) is zlib + per-scanline filters, both pure
  stdlib/numpy, so :func:`encode_png` / :func:`decode_png` are REAL
  compressed-image codecs: the encoder cycles through all five PNG
  filter types (None/Sub/Up/Average/Paeth) so a decode that mishandles
  any inverse filter breaks the oracle match.
* **Stubbed compressed codecs** — JPEG pixel decode (DCT + Huffman) and
  real video demux need libraries absent from this container, so
  :class:`ImageFeatures`/:class:`FrameSampler` keep ``decode="stub"``
  deterministic fakes and ``decode="real"`` raises at the exact plug-in
  point for those formats.

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
