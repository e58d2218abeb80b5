"""Generate the committed PNG fixtures for the PIL decode path.

Pure zlib/struct — no imaging library needed to CREATE valid 8-bit
grayscale PNGs, so the fixtures are reproducible in this container even
though decoding them requires PIL.  tests/test_multimodal_pil.py
re-generates these bytes and asserts the committed files match
(fixture-rot guard), and — when PIL is importable — decodes them through
the real codec path and pins the recomputed pixel checksums.

Usage: python tools/gen_png_fixtures.py   (writes tests/golden/images/)
"""

from __future__ import annotations

import os
import struct
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "golden", "images")


def png_gray(pixels: list[list[int]]) -> bytes:
    """Minimal valid 8-bit grayscale PNG: IHDR + one zlib IDAT + IEND,
    filter byte 0 per scanline."""
    height = len(pixels)
    width = len(pixels[0])
    if any(len(row) != width for row in pixels):
        raise ValueError("ragged pixel rows")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def fixtures() -> dict[str, list[list[int]]]:
    """Three small deterministic images: gradient, solid, checkerboard."""
    gradient = [[(16 * r + 4 * c) % 256 for c in range(8)] for r in range(8)]
    solid = [[137] * 3 for _ in range(2)]
    checker = [[255 if (r + c) % 2 == 0 else 0 for c in range(16)] for r in range(16)]
    return {"gradient_8x8": gradient, "solid_3x2": solid, "checker_16x16": checker}


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, px in fixtures().items():
        path = os.path.join(OUT_DIR, f"{name}.png")
        with open(path, "wb") as fh:
            fh.write(png_gray(px))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
