"""Multimodal column plumbing (SURVEY §2.M — charter extension).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing is real and tested: schema, Arrow-batched
``mapInPandas`` iteration, partition sizing, batch shapes.

Decoding has a REAL stdlib codec path for the formats the standard
library + numpy can parse — PNG (zlib inflate + per-scanline
unfilter), PPM/PGM (P6/P5), WAV (``wave`` module), GIF including
interlaced (LZW + appendix-E deinterlace), and JPEG both
baseline-sequential and progressive (huffman + dequant + IDCT) —
producing true pixel / sample statistics as the feature vector.
The remaining formats (arithmetic/lossless/12-bit JPEG, MP3, video
containers) fall back per-asset to a deterministic byte-hash feature
vector, since PIL/ffmpeg are not in this environment — see
COVERAGE.md's pinned format matrix; ``decode_stub="raise"`` marks
that integration point with ``NotImplementedError`` and
``decode_stub="fake"`` forces the fallback for every asset
(bit-stable output for oracle gates).

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` modest and never collect; the
``mapInPandas`` path streams Arrow batches so peak executor memory is
one batch of payloads, not one partition.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(content: bytes, media_type: str, feat_dim: int) -> dict:
    """Deterministic fallback for formats the stdlib can't parse:
    dimensions and a feature vector derived from a sha256 of the
    payload. Replace with PIL/ffmpeg in a full environment — the
    surrounding plumbing does not change."""
    digest = hashlib.sha256(content or b"").digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    feats = [
        (digest[(2 + i) % len(digest)] / 255.0) for i in range(feat_dim)
    ]
    return {
        "n_bytes": len(content or b""),
        "content_sha": digest.hex(),
        "width": width,
        "height": height,
        "features": feats,
    }


def _pixel_features(
    pixels: bytes, width: int, height: int, channels: int, feat_dim: int
) -> list[float]:
    """Per-channel mean + global std/min/max from raw 8-bit pixel
    bytes, cycled/truncated to ``feat_dim``. Vectorized — this runs
    per asset inside the Arrow batch loop, so per-byte Python
    arithmetic would dominate real image decodes."""
    import numpy as np

    if not pixels:
        return [0.0] * feat_dim
    arr = np.frombuffer(pixels, dtype=np.uint8)
    usable = (len(arr) // channels) * channels
    lanes = arr[:usable].reshape(-1, channels).astype(np.float64)
    ch_means = lanes.mean(axis=0) if usable else np.zeros(channels)
    base = [float(m) / 255.0 for m in ch_means] + [
        float(arr.std()) / 255.0,
        float(arr.min()) / 255.0,
        float(arr.max()) / 255.0,
    ]
    return [base[i % len(base)] for i in range(feat_dim)]


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_png(content: bytes, feat_dim: int) -> dict | None:
    """Real PNG decode, stdlib-only: IHDR parse, IDAT zlib inflate,
    per-scanline unfilter (filters 0-4), then pixel statistics.
    Supports 8-bit depth, non-interlaced, color types gray/RGB/
    palette-as-gray/gray+alpha/RGBA. Returns None (→ fallback) on
    anything else or on corrupt data."""
    if not content or not content.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    try:
        pos = 8
        width = height = None
        bit_depth = color_type = interlace = None
        idat = bytearray()
        while pos + 8 <= len(content):
            (length,) = struct.unpack(">I", content[pos : pos + 4])
            ctype = content[pos + 4 : pos + 8]
            data = content[pos + 8 : pos + 8 + length]
            if ctype == b"IHDR":
                (width, height, bit_depth, color_type, _, _, interlace) = (
                    struct.unpack(">IIBBBBB", data)
                )
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if (
            width is None
            or bit_depth != 8
            or interlace != 0
            or color_type not in _PNG_CHANNELS
        ):
            return None
        channels = _PNG_CHANNELS[color_type]
        raw = zlib.decompress(bytes(idat))
        stride = width * channels
        if len(raw) < height * (stride + 1):
            return None
        # Unfilter scanline by scanline (RFC 2083 §6). Filters
        # None/Sub/Up vectorize (Sub is a per-channel-lane cumsum);
        # Average/Paeth have a serial dependency along x and keep the
        # byte loop — they are the rare filters for the simple images
        # this stdlib path targets.
        import numpy as np

        out = bytearray()
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(height):
            off = y * (stride + 1)
            ftype = raw[off]
            line = np.frombuffer(
                raw[off + 1 : off + 1 + stride], dtype=np.uint8
            ).copy()
            if ftype == 1:  # Sub: cumulative sum along each lane
                lanes = line.reshape(-1, channels).astype(np.int64)
                line = (
                    lanes.cumsum(axis=0) % 256
                ).astype(np.uint8).reshape(-1)
            elif ftype == 2:  # Up
                line = line + prev  # uint8 wraps mod 256
            elif ftype == 3:  # Average
                lb = bytearray(line.tobytes())
                pb_ = prev
                for i in range(stride):
                    a = lb[i - channels] if i >= channels else 0
                    lb[i] = (lb[i] + (a + int(pb_[i])) // 2) & 0xFF
                line = np.frombuffer(bytes(lb), dtype=np.uint8)
            elif ftype == 4:  # Paeth
                lb = bytearray(line.tobytes())
                pb_ = prev
                for i in range(stride):
                    a = lb[i - channels] if i >= channels else 0
                    b = int(pb_[i])
                    c = int(pb_[i - channels]) if i >= channels else 0
                    p = a + b - c
                    pa, pb2, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb2 and pa <= pc else b if pb2 <= pc else c
                    lb[i] = (lb[i] + pred) & 0xFF
                line = np.frombuffer(bytes(lb), dtype=np.uint8)
            elif ftype != 0:
                return None
            out.extend(line.tobytes())
            prev = line
        return {
            "n_bytes": len(content),
            "content_sha": hashlib.sha256(content).hexdigest(),
            "width": width,
            "height": height,
            "features": _pixel_features(
                bytes(out), width, height, channels, feat_dim
            ),
        }
    except Exception:
        return None


def _decode_pnm(content: bytes, feat_dim: int) -> dict | None:
    """PPM (P6, RGB) / PGM (P5, gray) binary decode — whitespace-
    separated header then raw 8-bit samples."""
    if not content or content[:2] not in (b"P5", b"P6"):
        return None
    try:
        channels = 3 if content[:2] == b"P6" else 1
        # Header: magic, width, height, maxval — tokens separated by
        # whitespace, '#' comments to end-of-line.
        tokens: list[int] = []
        pos = 2
        while len(tokens) < 3 and pos < len(content):
            c = content[pos : pos + 1]
            if c == b"#":
                pos = content.index(b"\n", pos)
            elif c.isspace():
                pos += 1
            else:
                end = pos
                while end < len(content) and not content[end : end + 1].isspace():
                    end += 1
                tokens.append(int(content[pos:end]))
                pos = end
        width, height, maxval = tokens
        if maxval > 255:
            return None
        pos += 1  # single whitespace after maxval
        pixels = content[pos : pos + width * height * channels]
        if len(pixels) < width * height * channels:
            return None
        return {
            "n_bytes": len(content),
            "content_sha": hashlib.sha256(content).hexdigest(),
            "width": width,
            "height": height,
            "features": _pixel_features(
                pixels, width, height, channels, feat_dim
            ),
        }
    except Exception:
        return None


_JPEG_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}

# zigzag scan order: index i of the scan → (row, col) flat offset
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_huff_lut(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman table (Annex C): (code_length, code) → value."""
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


class _JpegBits:
    """MSB-first bit reader over an UNSTUFFED entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, lut: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            if (length, code) in lut:
                return lut[(length, code)]
        raise ValueError("bad huffman code")


def _jpeg_extend(v: int, n: int) -> int:
    """Sign-extend an n-bit magnitude (spec F.2.2.1 EXTEND)."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


_JPEG_IDCT_BASIS = None


def _jpeg_idct_basis():
    import numpy as np

    global _JPEG_IDCT_BASIS
    if _JPEG_IDCT_BASIS is None:
        x, u = np.meshgrid(np.arange(8), np.arange(8))
        c = np.cos((2 * x + 1) * u * np.pi / 16) / 2
        c[0, :] /= np.sqrt(2)
        _JPEG_IDCT_BASIS = c
    return _JPEG_IDCT_BASIS


def _jpeg_decode_baseline(
    content: bytes, feat_dim: int
) -> tuple[int, int, list[float]] | None:
    """Full baseline-sequential (SOF0/SOF1, 8-bit, Huffman) pixel
    decode in numpy + a Python bit loop: DQT/DHT/DRI/SOF/SOS parse,
    byte-unstuffing with restart handling, per-MCU Huffman + dequant
    + zigzag + 2-D IDCT, chroma upsampling by sampling factor, and
    YCbCr→RGB. Returns (width, height, features) or None for
    anything outside baseline (progressive SOF2, arithmetic coding,
    12-bit) — the caller then keeps the dims-only fallback."""
    import numpy as np

    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    sof = None
    restart = 0
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            return None
        marker = content[pos + 1]
        if marker == 0xFF:  # legal fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        data = content[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT — possibly several tables
            off = 0
            while off < len(data):
                pq, tq = data[off] >> 4, data[off] & 0xF
                if pq != 0:
                    return None  # 16-bit table → not baseline-8
                qt[tq] = np.frombuffer(
                    data[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int32)
                off += 65
        elif marker == 0xC4:  # DHT — possibly several tables
            off = 0
            while off < len(data):
                tc, th = data[off] >> 4, data[off] & 0xF
                bits_ = data[off + 1 : off + 17]
                n_vals = sum(bits_)
                vals = data[off + 17 : off + 17 + n_vals]
                huff[(tc, th)] = _jpeg_huff_lut(bits_, vals)
                off += 17 + n_vals
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, height, width, n_comp = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                return None
            comps = []
            for i in range(n_comp):
                cid, hv, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            sof = (width, height, comps)
        elif marker in _JPEG_SOF_MARKERS:
            return None  # progressive / arithmetic / lossless
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            if sof is None:
                return None
            width, height, comps = sof
            ns = data[0]
            scan = {}
            for i in range(ns):
                cs, tt = data[1 + 2 * i : 3 + 2 * i]
                scan[cs] = (tt >> 4, tt & 0xF)
            ecs_start = pos + 2 + seg_len
            return _jpeg_decode_scan(
                content, ecs_start, width, height, comps, scan, qt,
                huff, restart, feat_dim,
            )
        pos += 2 + seg_len
    return None


def _jpeg_decode_scan(
    content, ecs_start, width, height, comps, scan, qt, huff, restart,
    feat_dim,
):
    import numpy as np

    # Split the entropy-coded stream into restart intervals: scan for
    # 0xFF followed by a non-stuffing, non-RST byte = end of scan.
    segments = []
    cur = bytearray()
    pos = ecs_start
    n = len(content)
    while pos < n:
        b = content[pos]
        if b == 0xFF:
            nxt = content[pos + 1] if pos + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                pos += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RST — new interval
                segments.append(bytes(cur))
                cur = bytearray()
                pos += 2
                continue
            break  # EOI or another marker
        cur.append(b)
        pos += 1
    segments.append(bytes(cur))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    basis = _jpeg_idct_basis()
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    pred = [0] * len(comps)
    seg_idx = 0
    reader = _JpegBits(segments[0])
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu and mcu % restart == 0:
                seg_idx += 1
                reader = _JpegBits(segments[seg_idx])
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_lut = huff[(0, scan[c["id"]][0])]
                ac_lut = huff[(1, scan[c["id"]][1])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = reader.huff(dc_lut)
                        diff = _jpeg_extend(reader.bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(ac_lut)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _jpeg_extend(reader.bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_JPEG_ZIGZAG] = zz * q
                        block = coef.reshape(8, 8)
                        spatial = basis.T @ block @ basis + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu += 1

    return _jpeg_assemble(
        planes, comps, hmax, vmax, width, height, feat_dim
    )


def _jpeg_assemble(planes, comps, hmax, vmax, width, height, feat_dim):
    """Shared decode tail (baseline + progressive): upsample each
    IDCT'd component plane to full MCU-grid resolution, crop, do
    YCbCr→RGB for 3-component images, and reduce to features."""
    import numpy as np

    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.kron(p, np.ones((ry, rx)))
        full.append(p[:height, :width])
    if len(comps) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        pixels = np.clip(rgb + 0.5, 0, 255).astype(np.uint8).tobytes()
        channels = 3
    elif len(comps) == 1:
        pixels = np.clip(full[0] + 0.5, 0, 255).astype(np.uint8).tobytes()
        channels = 1
    else:
        return None
    # feat_dim threads through (hardcoding 8 re-cycled a truncated
    # 8-vector for feat_dim > 8, diverging from the PNG/PNM/GIF base
    # cycle on the same pixels)
    return width, height, _pixel_features(
        pixels, width, height, channels, feat_dim
    )


def _jpeg_progressive_scan(
    content, ecs_start, sof, scomps, ss, se, ah, al, huff, restart,
    coef, pred,
):
    """Decode ONE progressive scan (spec G.2) into the per-component
    zigzag-order coefficient arrays, mutating ``coef`` and the DC
    predictors. Returns the byte offset of the next marker, or None
    on malformed data. Handles all four scan kinds: DC first / DC
    refinement (interleaved or single-component) and AC first / AC
    refinement (always single-component, EOB-run coded)."""
    width, height, comps, hmax, vmax, mcus_x, mcus_y = sof

    # unstuff the entropy segment, splitting at RST markers
    segments = []
    cur = bytearray()
    pos = ecs_start
    n = len(content)
    while pos < n:
        b = content[pos]
        if b == 0xFF:
            nxt = content[pos + 1] if pos + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                pos += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                pos += 2
                continue
            break
        cur.append(b)
        pos += 1
    segments.append(bytes(cur))

    state = {"reader": _JpegBits(segments[0]), "seg": 0, "eobrun": 0}

    def maybe_restart(unit):
        if restart and unit and unit % restart == 0:
            state["seg"] += 1
            state["reader"] = _JpegBits(segments[state["seg"]])
            state["eobrun"] = 0
            for i in range(len(pred)):
                pred[i] = 0

    def nonint_blocks(c):
        """Non-interleaved block grid: ceil over the COMPONENT's
        sample dimensions, not the MCU-padded frame (A.2.2)."""
        cw = -(-width * c["h"] // hmax)
        ch = -(-height * c["v"] // vmax)
        return -(-ch // 8), -(-cw // 8)

    if ss == 0:  # ---- DC scan ----
        if se != 0:
            return None

        def dc_block(blk, ci, td):
            r = state["reader"]
            if ah == 0:
                t = r.huff(huff[(0, td)])
                pred[ci] += _jpeg_extend(r.bits(t), t)
                blk[0] = pred[ci] << al
            elif r.bit():
                blk[0] |= 1 << al

        unit = 0
        if len(scomps) > 1:  # interleaved MCU order
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_restart(unit)
                    for ci, td, _ta in scomps:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(
                                    coef[ci][
                                        my * c["v"] + by, mx * c["h"] + bx
                                    ],
                                    ci,
                                    td,
                                )
                    unit += 1
        else:
            ci, td, _ta = scomps[0]
            bh, bw = nonint_blocks(comps[ci])
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart(unit)
                    dc_block(coef[ci][by, bx], ci, td)
                    unit += 1
        return pos

    # ---- AC scan: exactly one component (B.2.3) ----
    if len(scomps) != 1:
        return None
    ci, _td, ta = scomps[0]
    ac_lut = huff[(1, ta)]
    bh, bw = nonint_blocks(comps[ci])
    p_one = 1 << al
    m_one = -1 << al

    def ac_first(blk):
        r = state["reader"]
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = r.huff(ac_lut)
            run, s = rs >> 4, rs & 0xF
            if s == 0:
                if run < 15:
                    state["eobrun"] = (1 << run) - 1
                    if run:
                        state["eobrun"] += r.bits(run)
                    return
                k += 16  # ZRL
                continue
            k += run
            if k > se:
                raise ValueError("AC index overrun")
            blk[k] = _jpeg_extend(r.bits(s), s) << al
            k += 1

    def ac_refine(blk):
        """Spec G.1.2.3 (the libjpeg AC-refine control flow):
        correction bits for already-nonzero coefficients are read
        while advancing through zero-runs and EOB spans."""
        r = state["reader"]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = r.huff(ac_lut)
                run, s = rs >> 4, rs & 0xF
                if s == 0:
                    if run < 15:
                        state["eobrun"] = 1 << run
                        if run:
                            state["eobrun"] += r.bits(run)
                        break
                    newval = 0  # ZRL: skip 16 zero-history coefs
                else:
                    if s != 1:
                        raise ValueError("bad refine magnitude")
                    newval = p_one if r.bit() else m_one
                while k <= se:
                    if blk[k] != 0:
                        if r.bit() and (blk[k] & p_one) == 0:
                            blk[k] += p_one if blk[k] > 0 else m_one
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if s and k <= se:
                    blk[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    if r.bit() and (blk[k] & p_one) == 0:
                        blk[k] += p_one if blk[k] > 0 else m_one
                k += 1
            state["eobrun"] -= 1

    decode = ac_first if ah == 0 else ac_refine
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            maybe_restart(unit)
            decode(coef[ci][by, bx])
            unit += 1
    return pos


def _jpeg_decode_progressive(
    content: bytes, feat_dim: int
) -> tuple[int, int, list[float]] | None:
    """Full progressive (SOF2, 8-bit, Huffman) pixel decode: walk
    the marker stream IN ORDER (tables may be redefined between
    scans), accumulate every scan's spectral/successive-approximation
    contribution into per-component zigzag coefficient arrays, then
    dequantize + IDCT all blocks in one vectorized einsum and reuse
    the baseline assembly tail. Returns None for anything outside
    8-bit Huffman progressive (arithmetic, 12-bit, mixed frames)."""
    import numpy as np

    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    coef = None
    pred: list[int] = []
    restart = 0
    pos = 2
    n = len(content)
    while pos + 2 <= n:
        if content[pos] != 0xFF:
            return None
        marker = content[pos + 1]
        if marker == 0xFF:  # legal fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        if pos + 4 > n:
            return None
        (seg_len,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        data = content[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            off = 0
            while off < len(data):
                pq, tq = data[off] >> 4, data[off] & 0xF
                if pq != 0:
                    return None
                qt[tq] = np.frombuffer(
                    data[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int32)
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(data):
                tc, th = data[off] >> 4, data[off] & 0xF
                bits_ = data[off + 1 : off + 17]
                n_vals = sum(bits_)
                vals = data[off + 17 : off + 17 + n_vals]
                huff[(tc, th)] = _jpeg_huff_lut(bits_, vals)
                off += 17 + n_vals
        elif marker == 0xC2:
            prec, height, width, n_comp = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                return None
            comps = []
            for i in range(n_comp):
                cid, hv, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            sof = (width, height, comps, hmax, vmax, mcus_x, mcus_y)
            coef = [
                np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32
                )
                for c in comps
            ]
            pred = [0] * n_comp
        elif marker in _JPEG_SOF_MARKERS:
            # any non-C2 SOF: baseline (the caller already tried that
            # path), arithmetic, lossless — not decodable here
            return None
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:
            if sof is None:
                return None
            ns = data[0]
            comps = sof[2]
            scomps = []
            for i in range(ns):
                cs, tt = data[1 + 2 * i : 3 + 2 * i]
                ci = next(
                    (j for j, c in enumerate(comps) if c["id"] == cs), None
                )
                if ci is None:
                    return None
                scomps.append((ci, tt >> 4, tt & 0xF))
            ss_, se_ = data[1 + 2 * ns], data[2 + 2 * ns]
            a = data[3 + 2 * ns]
            # new scan: DC predictors reset per scan (G.1.1.1.1)
            for i in range(len(pred)):
                pred[i] = 0
            nxt = _jpeg_progressive_scan(
                content, pos + 2 + seg_len, sof, scomps, ss_, se_,
                a >> 4, a & 0xF, huff, restart, coef, pred,
            )
            if nxt is None:
                return None
            pos = nxt
            continue
        pos += 2 + seg_len
    if sof is None or coef is None:
        return None
    width, height, comps, hmax, vmax, mcus_x, mcus_y = sof
    basis = _jpeg_idct_basis()
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        by, bx = coef[ci].shape[:2]
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[..., _JPEG_ZIGZAG] = coef[ci] * q[None, None, :]
        blocks = nat.reshape(by, bx, 8, 8)
        spatial = (
            np.einsum("ij,abjk,kl->abil", basis.T, blocks, basis) + 128.0
        )
        planes.append(spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    return _jpeg_assemble(
        planes, comps, hmax, vmax, width, height, feat_dim
    )


def _decode_jpeg(content: bytes, feat_dim: int) -> dict | None:
    """JPEG decode, stdlib+numpy only. Baseline-sequential files
    (SOF0/SOF1) and progressive files (SOF2), 8-bit Huffman — the
    overwhelming majority of real corpora — get a FULL pixel decode:
    Huffman entropy decode (multi-scan spectral-selection +
    successive-approximation for progressive), dequant, IDCT, chroma
    upsample, YCbCr→RGB, then real pixel statistics. Arithmetic /
    lossless / 12-bit files keep the previous contract — true
    width/height from the SOF header with byte-hash placeholder
    features — so no input ever errors out of the Arrow batch loop."""
    if not content or not content.startswith(b"\xff\xd8"):
        return None
    try:
        decoded = _jpeg_decode_baseline(content, feat_dim)
        if decoded is None:
            decoded = _jpeg_decode_progressive(content, feat_dim)
        if decoded is not None:
            width, height, base = decoded
            return {
                "n_bytes": len(content),
                "content_sha": hashlib.sha256(content).hexdigest(),
                "width": width,
                "height": height,
                "features": [base[i % len(base)] for i in range(feat_dim)],
            }
    except Exception:
        pass  # corrupt entropy data → dims-only fallback below
    try:
        pos = 2
        while pos + 4 <= len(content):
            if content[pos] != 0xFF:
                return None
            marker = content[pos + 1]
            if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers, no length
                continue
            (seg_len,) = struct.unpack(">H", content[pos + 2 : pos + 4])
            if marker in _JPEG_SOF_MARKERS:
                _, height, width, n_comp = struct.unpack(
                    ">BHHB", content[pos + 4 : pos + 10]
                )
                fake = _fake_decode(content, "image", feat_dim)
                fake["width"] = width
                fake["height"] = height
                return fake
            if marker == 0xDA:  # start of scan — no SOF seen
                return None
            pos += 2 + seg_len
        return None
    except Exception:
        return None


def _decode_wav(content: bytes, feat_dim: int) -> dict | None:
    """Real WAV decode via the stdlib ``wave`` module: sample rate /
    channel / duration metadata plus amplitude statistics (RMS, zero-
    crossing rate) over the 16-bit samples. ``width`` carries the
    sample rate and ``height`` the channel count (documented reuse of
    the image dims for the audio modality)."""
    if not content or not content.startswith(b"RIFF"):
        return None
    try:
        with wave.open(io.BytesIO(content)) as w:
            n_channels = w.getnchannels()
            rate = w.getframerate()
            n_frames = w.getnframes()
            sampwidth = w.getsampwidth()
            frames = w.readframes(n_frames)
        if sampwidth != 2 or not frames:
            return None
        # vectorized stats (same reason as _pixel_features): a real
        # 3-minute stereo WAV is ~16M samples, and four per-sample
        # Python passes dominated the executor batch. All four stats
        # reduce over exact int64 arithmetic, so the values are
        # bit-identical to the old per-sample loops.
        import numpy as np

        samples = np.frombuffer(
            frames[: (len(frames) // 2) * 2], dtype="<i2"
        ).astype(np.int64)
        n = len(samples)
        mean = int(samples.sum()) / n
        rms = (int((samples * samples).sum()) / n) ** 0.5 / 32768.0
        peak = int(np.abs(samples).max()) / 32768.0
        neg = samples < 0
        zcr = int((neg[1:] != neg[:-1]).sum()) / max(1, n - 1)
        duration = n_frames / rate if rate else 0.0
        base = [rms, peak, zcr, mean / 32768.0, min(1.0, duration)]
        return {
            "n_bytes": len(content),
            "content_sha": hashlib.sha256(content).hexdigest(),
            "width": rate,
            "height": n_channels,
            "features": [base[i % len(base)] for i in range(feat_dim)],
        }
    except Exception:
        return None


def _gif_interlace_order(h: int) -> list[int]:
    """GIF89a appendix E: an interlaced image stores its rows in 4
    passes — every 8th row from 0, every 8th from 4, every 4th from
    2, every 2nd from 1. Returns, for each STORED row position, the
    scanline it belongs to, so ``out[order] = stored`` deinterlaces."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes | None:
    """GIF-variant LZW decode (LSB-first bit packing, CLEAR/EOI
    codes, growing code width capped at 12 bits). Returns the index
    stream or None on a malformed code sequence."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                # the descriptor promised w·h pixels, and a stream
                # that produced them already returned from the
                # early-exit below — reaching EOI means the stream
                # was truncated; fall back rather than report
                # full-frame statistics over a partial buffer
                return None
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out.extend(entry)
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
    # stream ended without EOI: only a full w·h index buffer is
    # trustworthy — anything shorter falls through to the
    # deterministic byte-hash path instead of fabricating stats
    return bytes(out[:n_pixels]) if len(out) >= n_pixels else None


def _decode_gif(content: bytes, feat_dim: int) -> dict | None:
    """Real GIF decode, stdlib-only: logical screen descriptor,
    color tables, LZW index stream for the FIRST image (interlaced
    or not — appendix-E pass order is inverted after decode),
    palette → RGB, then pixel statistics. 87a/89a; returns None
    (→ fallback) on anything else or corrupt/truncated data."""
    if not content or content[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        sw, sh = struct.unpack("<HH", content[6:10])
        packed = content[10]
        pos = 13
        gct = b""
        if packed & 0x80:
            n = 3 * (2 << (packed & 0x07))
            gct = content[pos : pos + n]
            pos += n
        while pos < len(content):
            b0 = content[pos]
            if b0 == 0x21:  # extension: skip sub-blocks
                pos += 2
                while content[pos]:
                    pos += 1 + content[pos]
                pos += 1
            elif b0 == 0x2C:  # image descriptor
                _, _, w, h = struct.unpack("<HHHH", content[pos + 1 : pos + 9])
                ipacked = content[pos + 9]
                pos += 10
                lct = gct
                if ipacked & 0x80:
                    n = 3 * (2 << (ipacked & 0x07))
                    lct = content[pos : pos + n]
                    pos += n
                interlaced = bool(ipacked & 0x40)
                min_code = content[pos]
                pos += 1
                data = bytearray()
                while content[pos]:
                    ln = content[pos]
                    data += content[pos + 1 : pos + 1 + ln]
                    pos += 1 + ln
                idx = _gif_lzw_decode(bytes(data), min_code, w * h)
                if idx is None or not lct:
                    return None
                import numpy as np

                pal = np.frombuffer(lct, dtype=np.uint8).reshape(-1, 3)
                arr = np.frombuffer(idx, dtype=np.uint8)
                if interlaced:
                    stored = arr.reshape(h, w)
                    deinter = np.empty_like(stored)
                    deinter[_gif_interlace_order(h)] = stored
                    arr = deinter.reshape(-1)
                if arr.max(initial=0) >= len(pal):
                    return None
                pixels = pal[arr].tobytes()
                return {
                    "n_bytes": len(content),
                    "content_sha": hashlib.sha256(content).hexdigest(),
                    "width": w,
                    "height": h,
                    "features": _pixel_features(pixels, w, h, 3, feat_dim),
                }
            elif b0 == 0x3B:  # trailer
                return None
            else:
                return None
        return None
    except Exception:
        return None


def decode_asset(content: bytes, media_type: str, feat_dim: int) -> dict:
    """Stdlib codec dispatch by magic bytes (PNG, PPM/PGM, WAV,
    GIF incl. interlaced, baseline-sequential AND progressive JPEG
    fully; arithmetic/lossless/12-bit JPEG gets true dimensions
    with placeholder features), with the deterministic byte-hash
    fallback for everything else."""
    for codec in (_decode_png, _decode_pnm, _decode_wav, _decode_jpeg, _decode_gif):
        out = codec(content, feat_dim)
        if out is not None:
            return out
    return _fake_decode(content, media_type, feat_dim)


def extract_features(
    assets: DataFrame, feat_dim: int = 8, decode_stub: str = "fake"
) -> DataFrame:
    """Decode/feature-extract over ``mapInPandas`` (Arrow batches).

    ``decode_stub``: "auto" uses the real stdlib codecs
    (PNG/PNM/WAV/GIF/baseline+progressive JPEG) with byte-hash
    fallback per asset; "fake" forces the fallback for all assets
    (bit-stable — the oracle-gate mode); "raise" marks the
    PIL/ffmpeg integration point for formats beyond the stdlib.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "plug PIL/ffmpeg here"
                )
            decode = decode_asset if decode_stub == "auto" else _fake_decode
            rows = [
                {
                    "asset_id": row.asset_id,
                    "media_type": row.media_type,
                    **decode(row.content, row.media_type, feat_dim),
                }
                for row in batch.itertuples()
            ]
            yield pd.DataFrame(rows)

    return assets.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    assets: DataFrame, every_n: int = 10, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling *plan* for video assets: emits one row per
    requested frame index (``sequence`` + ``explode`` — plan-time
    fan-out, no decode). A downstream ``mapInPandas`` decode consumes
    (asset_id, frame_idx) pairs."""
    n_frames = F.least(
        F.lit(max_frames),
        (F.length("content") / F.lit(every_n)).cast("int") + 1,
    )
    return (
        assets.filter(F.col("media_type") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1)
            ).alias("frame_idx"),
        )
        .withColumn("frame_offset", F.col("frame_idx") * every_n)
    )


def resize_stub(features: DataFrame, width: int, height: int) -> DataFrame:
    """Resize marker: records target dims in the plan; the pixel work
    belongs to the codec UDF (stubbed here)."""
    return features.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def audio_chunk_plan(
    assets: DataFrame, chunk_ms: int = 1000, bytes_per_ms: int = 16
) -> DataFrame:
    """Audio chunking *plan*: one row per fixed-duration chunk with
    byte offsets (``sequence`` + ``explode``, no decode — same
    plan-time fan-out shape as :func:`frame_sample_plan`). A
    downstream codec UDF consumes (asset_id, byte_start, byte_end)
    slices; ``bytes_per_ms`` comes from the asset's sample-rate
    metadata in a real pipeline."""
    chunk_bytes = chunk_ms * bytes_per_ms
    n_chunks = (
        (F.length("content") + F.lit(chunk_bytes - 1)) / F.lit(chunk_bytes)
    ).cast("int")
    return (
        assets.filter(
            # zero-length content gives n_chunks=0 and sequence(0,-1)
            # — which Spark evaluates with an implicit step of -1,
            # emitting two bogus chunks [0, -1] (byte_start -16000!)
            # instead of none
            (F.col("media_type") == "audio") & (F.length("content") > 0)
        )
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
            F.length("content").alias("n_bytes"),
        )
        .withColumn("byte_start", F.col("chunk_idx") * chunk_bytes)
        .withColumn(
            "byte_end",
            F.least(F.col("byte_start") + chunk_bytes, F.col("n_bytes")),
        )
        .drop("n_bytes")
    )
