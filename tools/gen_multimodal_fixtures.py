"""One-time generator for the committed multimodal codec fixtures
(``fixtures/multimodal/``) and the oracle literal for the
``multimodal_decode_real`` driver gate.

The gate needs REAL bytes on disk (the driver's sf tables carry text,
not images), so tiny deterministic files are committed: PNG, PPM,
WAV, GIF (plain + interlaced), baseline JPEG, and one unknown-magic
blob that must take the byte-hash fallback. Expected outputs are
computed by running the exact Spark pipeline the gate runs
(extract_features, decode_stub="auto"), so the printed VALUES
literal is correct by construction — decode is pure stdlib/numpy and
bit-deterministic.

Rerun only if the codecs' feature definition changes:
    python tools/gen_multimodal_fixtures.py
then refresh MULTIMODAL_REAL_SQL in __spark_entry__.py from stdout.
"""

from __future__ import annotations

import os
import struct
import sys
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures", "multimodal")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def png_rgb(w: int, h: int, px) -> bytes:
    """Minimal PNG: 8-bit RGB, filter 0 rows, one IDAT."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload))
        )

    raw = bytearray()
    for y in range(h):
        raw.append(0)
        for x in range(w):
            raw += bytes(px(x, y))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def ppm(w: int, h: int, px) -> bytes:
    body = b"".join(bytes(px(x, y)) for y in range(h) for x in range(w))
    return f"P6\n{w} {h}\n255\n".encode() + body


def wav_pcm16(samples: list[int], rate: int = 8000) -> bytes:
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def gif(indices: list[int], w: int, h: int, palette, interlaced=False) -> bytes:
    """Same clear-before-literal LZW trick as the pytest encoder."""
    min_code = 2
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    acc = nbits = 0
    out = bytearray()

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for i in indices:
        put(clear)
        put(i)
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    pal = b"".join(bytes(c) for c in palette)
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0)
    flags = 0x40 if interlaced else 0x00
    img = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([flags])
    lzw = bytes([min_code]) + bytes([len(out)]) + bytes(out) + b"\x00"
    return hdr + pal + img + lzw + b"\x3b"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    files: dict[str, bytes] = {}
    files["101.png"] = png_rgb(
        16, 16, lambda x, y: (x * 16, y * 16, ((x + y) * 8) % 256)
    )
    files["102.ppm"] = ppm(
        8, 8, lambda x, y: ((x * 32) % 256, (y * 32) % 256, 128)
    )
    files["103.wav"] = wav_pcm16(
        [((i * 2741) % 4096) - 2048 for i in range(64)]
    )
    palette = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    files["104.gif"] = gif(
        [(x + y) % 4 for y in range(4) for x in range(4)], 4, 4, palette
    )
    rows = [[r % 4, r % 4] for r in range(5)]
    inter_rows = [rows[0], rows[4], rows[2], rows[1], rows[3]]
    files["105.gif"] = gif(
        [i for row in inter_rows for i in row],
        2,
        5,
        palette,
        interlaced=True,
    )
    from test_operators import (  # tests/ on sys.path
        _encode_jpeg,
        _encode_jpeg_progressive,
    )

    yy, xx = np.mgrid[0:16, 0:16]
    plane = (xx * 12 + yy * 4).astype(np.float64)
    files["106.jpg"] = _encode_jpeg([plane], [1], [1], quant=16)
    files["107.bin"] = bytes(range(64)) * 3  # unknown magic -> fallback
    # progressive (SOF2) with the default successive-approximation
    # scan script — decodes to the same pixels as 106.jpg
    files["108.jpg"] = _encode_jpeg_progressive(
        [plane], [1], [1], quant=16
    )

    for name, content in files.items():
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(content)
        print(f"wrote {name}: {len(content)} bytes")

    # Expected table: run the gate's own Spark pipeline.
    import __spark_entry__ as entry
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
        get_spark,
    )

    spark = get_spark()
    got = entry.multimodal_decode_real(spark, "/root/testdata/sf0.001")
    rows = sorted(map(tuple, got.collect()))
    cols = got.columns
    print("\n-- MULTIMODAL_REAL_SQL VALUES literal --")
    print("SELECT * FROM (VALUES")
    body = ",\n".join("  (" + ", ".join(str(v) for v in r) + ")" for r in rows)
    print(body)
    print(") AS t({})".format(", ".join(cols)))


if __name__ == "__main__":
    main()
