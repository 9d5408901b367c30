"""Multimodal (binary-payload) columns: schema, actor-pool stages, stubs.

Images / audio / video ride through the engine as opaque ``binary``
columns plus typed metadata, exactly like ``html`` does in the webtext
table.  The Ray-side plumbing here is real — batch schemas, actor-pool
``map_batches`` signatures, bounded batch sizes for wide binary rows,
output layouts — while the codec itself is stubbed: the decode libraries
are not available in this container, so ``decode="stub"`` (default) uses a
deterministic fake decoder and ``decode="real"`` raises
``NotImplementedError`` at the exact point a real decoder would plug in.

Stages:

* :class:`ImageMeta` — parse width/height/format from real magic bytes
  (PNG/JPEG/GIF headers are plain byte arithmetic, no library needed).
* :class:`ImageFeatures` — per-image feature vector (actor pool; the
  stub derives a deterministic float vector from a streaming hash of the
  payload, shaped like a real embedding head output).
* :class:`FrameSampler` — "video" payload → every k-th fixed-size chunk
  as a frame row (flat_map-shaped: one input row fans out to many).
"""

from __future__ import annotations

import hashlib

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
    return None, 0, 0


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

    The real decode+model path is a container-level dependency; the stub
    produces a deterministic unit-norm vector from a BLAKE2 stream over
    the payload so downstream similarity / dedup stages exercise the same
    schema and batch shapes.

    Use as ``ds.map_batches(ImageFeatures, fn_constructor_kwargs=...,
    batch_size=BINARY_BATCH_SIZE, concurrency=N, num_cpus=1)``.
    """

    def __init__(self, dim: int = 64, payload_col: str = "payload",
                 decode: str = "stub"):
        if decode not in ("stub", "real"):
            raise ValueError("decode must be 'stub' or 'real'")
        if decode == "real":
            raise NotImplementedError(
                "real image decoding requires an imaging library not "
                "present in this container; plug Pillow/torchvision in "
                "here")
        self.dim = dim
        self.col = payload_col

    def _stub_features(self, payload: bytes) -> np.ndarray:
        raw = np.frombuffer(
            hashlib.blake2b(payload, digest_size=self.dim).digest(),
            dtype=np.uint8).astype(np.float32)
        v = (raw - 127.5) / 127.5
        n = np.linalg.norm(v)
        return v / (n if n else 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._stub_features(b or b"")
                 for b in batch[self.col].to_pylist()]
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
