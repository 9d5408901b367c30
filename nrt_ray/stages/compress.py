"""Compressed time-series segments (Gorilla-family codecs, vectorized).

Closed rollup ranges are stored as binary segment blobs in Arrow ``binary``
columns: timestamps with **delta-of-delta** coding, values with **XOR**
coding (Facebook Gorilla, Pelkonen et al. 2015).  Unlike the classic
per-point bit-stream, both codecs here work on fixed blocks of points
(size recorded in each payload's header) with a per-block bit-width header — the same information-theoretic idea
(delta-of-delta ≈ 0 for regular cadence; XOR of similar floats has long
runs of leading/trailing zero bits) but encode AND decode are pure
vectorized NumPy (bit matrices + ``packbits``), which is what makes the
codec usable inside high-throughput ``map_batches`` stages.

Format v2 ("dod+xor2", little-endian) — SELF-DESCRIBING block size:
    dod segment:  u32 n | u16 block | i64 first | i64 first_delta |
                  blocks of ≤block zigzag(dod) values:
                  u8 width | ceil(cnt·width/8) bytes
    xor segment:  u32 n | u16 block | u64 first |
                  blocks of ≤block xor values:
                  u8 shift | u8 width | ceil(cnt·width/8) bytes

The ``block`` field in the header is what the decoder uses to chunk the
stream, so payloads written with ANY block size decode correctly — the
compile-time :data:`BLOCK` is only the encoder's default.  The previous
"dod+xor" (v1) format had no block field (the decoder assumed the
compile-time constant), which made a BLOCK change an on-disk format
break; v1 payloads are therefore refused by ``decode_segments_table``
and transparently re-encoded (not byte-reused) by the incremental path
in :func:`segments_from_rollups`.

Round-trip is exact (bit-for-bit) for any int64/float64 input including
NaN payloads; exhaustively tested in tests/test_compress.py.
"""

from __future__ import annotations

import numpy as np

#: default values per fixed-width block.  1024 (vs the classic 128)
#: trades a few % of compression (one wide outlier widens more
#: neighbours) for ~8x fewer python-level pack calls — the encode cost
#: was ~1/4 of the whole partition-processor task at 128 (profiled r4).
#: The chosen size is written into every payload header (u16), so
#: decoders never depend on this constant.
BLOCK = 1024

#: codec tag written to the segment table.  "2" = the self-describing
#: block-size header; bump again on any further layout change.
CODEC = "dod+xor2"


def _zigzag(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64)
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)
            ^ -(u & np.uint64(1)).astype(np.int64))


def _bit_width(x: np.ndarray) -> int:
    """Max bits needed for the values in x (0..64). Never underestimates:
    float log2 rounds across power-of-two boundaries only upward."""
    m = int(x.max()) if len(x) else 0
    return m.bit_length()


def _pack(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into a little-endian bitstream of ``width`` bits
    each.  Byte-multiple widths take the fast path (a pure byte-slice
    view of the little-endian u64s — ~10× the bit-matrix cost; encoders
    round widths up to a byte boundary for exactly this reason); any
    other width still packs via the (n, width) bit matrix so the stream
    format stays fully general."""
    if width == 0:
        return b""
    if width % 8 == 0:
        nb = width // 8
        le = values.astype("<u8", copy=False)
        return le.view(np.uint8).reshape(len(values), 8)[:, :nb].tobytes()
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((values[:, None] >> shifts[None, :]) & np.uint64(1)) \
        .astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def _unpack(buf: memoryview, count: int, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    nbytes = (count * width + 7) // 8
    if width % 8 == 0:
        nb = width // 8
        out = np.zeros((count, 8), dtype=np.uint8)
        out[:, :nb] = np.frombuffer(buf[:nbytes], dtype=np.uint8) \
            .reshape(count, nb)
        return out.view("<u8").reshape(count).astype(np.uint64,
                                                     copy=False)
    bits = np.unpackbits(np.frombuffer(buf[:nbytes], dtype=np.uint8),
                         bitorder="little")[:count * width]
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))
    return (bits.reshape(count, width).astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64)


def _round_width(width: int) -> int:
    """Encoder-side width policy: round up to a whole byte.  Costs ≤7
    bits/value of compression; buys the byte-aligned fast path in BOTH
    codec directions.  Decoders honor whatever width the stream says,
    so payloads from either policy remain readable."""
    return (width + 7) & ~7


def encode_dod(ts: np.ndarray, block: int = BLOCK) -> bytes:
    """Delta-of-delta encode an int64 array (e.g. epoch-µs timestamps).

    ``block`` (1..65535) is written into the header; decoders read it
    from the stream, so any value round-trips against the same decoder.
    """
    if not 1 <= block <= 0xFFFF:
        raise ValueError(f"block must fit u16 and be >=1, got {block}")
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    parts = [n.to_bytes(4, "little") + block.to_bytes(2, "little")]
    if n == 0:
        return parts[0]
    parts.append(ts[:1].tobytes())
    if n == 1:
        return b"".join(parts)
    deltas = np.diff(ts)
    parts.append(deltas[:1].tobytes())
    dod = _zigzag(np.diff(deltas))  # n-2 values
    for i in range(0, len(dod), block):
        blk = dod[i:i + block]
        width = _round_width(_bit_width(blk))
        parts.append(bytes([width]))
        parts.append(_pack(blk, width))
    return b"".join(parts)


def decode_dod(buf: bytes) -> np.ndarray:
    mv = memoryview(buf)
    n = int(np.frombuffer(mv[:4], dtype=np.uint32)[0])
    block = int(np.frombuffer(mv[4:6], dtype=np.uint16)[0])
    if block == 0:
        raise ValueError("corrupt or pre-v2 dod payload (block=0); "
                         "v1 'dod+xor' payloads must be re-encoded")
    if n == 0:
        return np.array([], dtype=np.int64)
    first = int(np.frombuffer(mv[6:14], dtype=np.int64)[0])
    if n == 1:
        return np.array([first], dtype=np.int64)
    first_delta = int(np.frombuffer(mv[14:22], dtype=np.int64)[0])
    pos = 22
    out = np.empty(max(n - 2, 0), dtype=np.uint64)
    done = 0
    while done < n - 2:
        cnt = min(block, n - 2 - done)
        width = mv[pos]
        pos += 1
        out[done:done + cnt] = _unpack(mv[pos:], cnt, width)
        pos += (cnt * width + 7) // 8
        done += cnt
    dod = _unzigzag(out)
    deltas = np.concatenate([np.array([first_delta], dtype=np.int64),
                             first_delta + np.cumsum(dod, dtype=np.int64)])
    return first + np.concatenate([np.array([0], dtype=np.int64),
                                   np.cumsum(deltas, dtype=np.int64)])


def encode_xor(values: np.ndarray, block: int = BLOCK) -> bytes:
    """XOR-encode a float64 array (Gorilla value stream, block-wise).

    ``block`` (1..65535) is written into the header; decoders read it
    from the stream, so any value round-trips against the same decoder.
    """
    if not 1 <= block <= 0xFFFF:
        raise ValueError(f"block must fit u16 and be >=1, got {block}")
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    parts = [n.to_bytes(4, "little") + block.to_bytes(2, "little")]
    if n == 0:
        return parts[0]
    parts.append(v[:1].tobytes())
    xors = v[1:] ^ v[:-1]
    for i in range(0, len(xors), block):
        blk = xors[i:i + block]
        nz = blk[blk != 0]
        if len(nz) == 0:
            shift, width = 0, 0
        else:
            # common trailing-zero count via lowest set bit of the OR;
            # width from the highest set bit (bit_length is exact on ints)
            ored = int(np.bitwise_or.reduce(nz))
            shift = (ored & -ored).bit_length() - 1
            width = min(64, _round_width(ored.bit_length() - shift))
        parts.append(bytes([shift, width]))
        parts.append(_pack(blk >> np.uint64(shift), width))
    return b"".join(parts)


def decode_xor(buf: bytes) -> np.ndarray:
    mv = memoryview(buf)
    n = int(np.frombuffer(mv[:4], dtype=np.uint32)[0])
    block = int(np.frombuffer(mv[4:6], dtype=np.uint16)[0])
    if block == 0:
        raise ValueError("corrupt or pre-v2 xor payload (block=0); "
                         "v1 'dod+xor' payloads must be re-encoded")
    if n == 0:
        return np.array([], dtype=np.float64)
    first = np.frombuffer(mv[6:14], dtype=np.uint64)[0]
    pos = 14
    xors = np.empty(n - 1, dtype=np.uint64)
    done = 0
    while done < n - 1:
        cnt = min(block, n - 1 - done)
        shift, width = mv[pos], mv[pos + 1]
        pos += 2
        xors[done:done + cnt] = _unpack(mv[pos:], cnt, width) \
            << np.uint64(shift)
        pos += (cnt * width + 7) // 8
        done += cnt
    stream = np.concatenate([[first], xors])
    return np.bitwise_xor.accumulate(stream).view(np.float64)


def segments_from_rollups(tier_tables: dict, max_points: int = 4096,
                          changed_urls: dict | None = None,
                          old_segments=None):
    """Build the compressed segment table from rolled-up tier tables.

    One segment per (url, tier) chunk of at most ``max_points`` rollup
    points: timestamps dod-coded, means xor-coded.

    Incremental reuse (O(touched) increments): when ``changed_urls``
    maps each tier name to the urls whose rollup rows changed this
    increment and ``old_segments`` is the previous commit's segment
    table, payloads for UNCHANGED (url, tier) pairs are carried over
    byte-identical instead of re-encoded — the codecs are deterministic,
    so re-encoding identical points would produce identical bytes.

    Returns:
        pyarrow.Table (url, tier, seg_start, seg_end, n_points,
        codec, payload_ts, payload_value)
    """
    import pyarrow as pa
    reused = []
    if changed_urls is not None and old_segments is not None \
            and old_segments.num_rows:
        import pyarrow.compute as pc
        # payloads from other codec versions (e.g. v1 "dod+xor", whose
        # block size is not recorded in the stream) must NOT be carried
        # over byte-identical: treat their urls as changed so they are
        # re-encoded in the current format below.
        legacy = old_segments.filter(pc.not_equal(
            old_segments.column("codec"), CODEC))
        if legacy.num_rows:
            changed_urls = dict(changed_urls)
            for tier_name in tier_tables:
                lt = legacy.filter(pc.equal(legacy.column("tier"),
                                            tier_name))
                if lt.num_rows:
                    changed_urls[tier_name] = sorted(
                        set(map(str, changed_urls.get(tier_name, ())))
                        | set(lt.column("url").to_pylist()))
            old_segments = old_segments.filter(pc.equal(
                old_segments.column("codec"), CODEC))
        keep_parts = []
        for tier_name in tier_tables:
            ch = np.asarray(changed_urls.get(tier_name, ()), dtype=object)
            tmask = pc.equal(old_segments.column("tier"), tier_name)
            tier_old = old_segments.filter(tmask)
            if not tier_old.num_rows:
                continue
            # hash-based membership — np.isin on object strings is
            # O(rows × changed) and dominated incremental applies
            chm = pc.is_in(tier_old.column("url"),
                           value_set=pa.array(ch, pa.string(),
                                              from_pandas=True))
            keep_parts.append(tier_old.filter(pc.invert(chm)))
        reused = [t for t in keep_parts if t.num_rows]
    rows = {k: [] for k in ("url", "tier", "seg_start", "seg_end",
                            "n_points", "codec", "payload_ts",
                            "payload_value")}
    for tier_name, table in tier_tables.items():
        if table.num_rows == 0:
            continue
        urls = table.column("url").to_pandas().to_numpy(dtype=object)
        if changed_urls is not None and old_segments is not None \
                and old_segments.num_rows:
            import pyarrow.compute as pc
            ch = np.asarray(changed_urls.get(tier_name, ()), dtype=object)
            marr = pc.is_in(table.column("url"),
                            value_set=pa.array(ch, pa.string(),
                                               from_pandas=True))
            m = marr.to_numpy(zero_copy_only=False)
            if not m.any():
                continue
            table = table.filter(marr)
            urls = urls[m]
        ts = table.column("bucket_ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        mean = table.column("mean").to_numpy(zero_copy_only=False)
        # contiguous runs per url (rollup output is url-grouped)
        starts = np.flatnonzero(np.r_[True, urls[1:] != urls[:-1]])
        ends = np.r_[starts[1:], len(urls)]
        for s, e in zip(starts, ends):
            for c in range(s, e, max_points):
                d = min(c + max_points, e)
                rows["url"].append(urls[s])
                rows["tier"].append(tier_name)
                rows["seg_start"].append(int(ts[c]))
                rows["seg_end"].append(int(ts[d - 1]))
                rows["n_points"].append(d - c)
                rows["codec"].append(CODEC)
                rows["payload_ts"].append(encode_dod(ts[c:d]))
                rows["payload_value"].append(encode_xor(mean[c:d]))
    out = pa.table({
        "url": pa.array(rows["url"], pa.string()),
        "tier": pa.array(rows["tier"], pa.string()),
        "seg_start": pa.array(rows["seg_start"], pa.int64()).cast(
            pa.timestamp("us")),
        "seg_end": pa.array(rows["seg_end"], pa.int64()).cast(
            pa.timestamp("us")),
        "n_points": pa.array(rows["n_points"], pa.int32()),
        "codec": pa.array(rows["codec"], pa.string()),
        "payload_ts": pa.array(rows["payload_ts"], pa.binary()),
        "payload_value": pa.array(rows["payload_value"], pa.binary()),
    })
    if reused:
        import pyarrow.compute as pc
        out = pa.concat_tables(reused + [out],
                               promote_options="default")
        out = out.take(pc.sort_indices(out, sort_keys=[
            ("tier", "ascending"), ("url", "ascending"),
            ("seg_start", "ascending")]))
    return out


def decode_segments_table(segments, tier: str | None = None,
                          t0_us: int | None = None,
                          t1_us: int | None = None):
    """Decode a segment table back to rollup points — the storage-layer
    read path (``(url, tier, bucket_ts, mean)`` rows).

    Runs fine inside ``map_batches`` over segment batches: each row
    decodes independently, so the read path scales exactly like the
    write path.

    ``t0_us``/``t1_us`` restrict the read to points in [t0, t1):
    segments whose (seg_start, seg_end) metadata falls outside the
    range are dropped WITHOUT decoding their payloads (callers should
    additionally push the same predicate into the parquet scan so
    non-overlapping row groups never leave storage — see the ``decode``
    CLI subcommand), and decoded points of straddling segments are
    filtered to the range.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    if tier is not None:
        segments = segments.filter(pc.equal(segments.column("tier"),
                                            tier))
    if segments.num_rows:
        nbad = segments.num_rows - pc.sum(pc.cast(pc.equal(
            segments.column("codec"), CODEC), pa.int64())).as_py()
        if nbad:
            others = sorted(set(segments.column("codec").to_pylist())
                            - {CODEC})
            raise ValueError(
                f"{nbad} segment(s) use codec(s) {others}; this reader "
                f"only decodes {CODEC!r}.  v1 'dod+xor' payloads do not "
                "record their block size — re-encode the store (any "
                "increment re-encodes touched urls automatically).")
    if t0_us is not None:
        segments = segments.filter(pc.greater_equal(
            segments.column("seg_end").cast(pa.int64()), t0_us))
    if t1_us is not None:
        segments = segments.filter(pc.less(
            segments.column("seg_start").cast(pa.int64()), t1_us))
    urls, tiers, ts_out, mean_out = [], [], [], []
    pts = segments.column("payload_ts").to_pylist()
    pvs = segments.column("payload_value").to_pylist()
    su = segments.column("url").to_pylist()
    st = segments.column("tier").to_pylist()
    for u, t, bts, bval in zip(su, st, pts, pvs):
        ts = decode_dod(bts)
        val = decode_xor(bval)
        if t0_us is not None or t1_us is not None:
            m = np.ones(len(ts), dtype=bool)
            if t0_us is not None:
                m &= ts >= t0_us
            if t1_us is not None:
                m &= ts < t1_us
            ts, val = ts[m], val[m]
        urls.extend([u] * len(ts))
        tiers.extend([t] * len(ts))
        ts_out.append(ts)
        mean_out.append(val)
    ts_all = np.concatenate(ts_out) if ts_out else np.array([], np.int64)
    mean_all = np.concatenate(mean_out) if mean_out else \
        np.array([], np.float64)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "tier": pa.array(tiers, pa.string()),
        "bucket_ts": pa.array(ts_all, pa.int64()).cast(
            pa.timestamp("us")),
        "mean": pa.array(mean_all, pa.float64()),
    })
