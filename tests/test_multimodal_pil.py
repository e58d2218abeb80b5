"""Real-codec (PIL) decode path pins — VERDICT r7 item 5.

The container has no imaging libs, so the PIL-path tests are
skip-marked when PIL is absent; what ALWAYS runs here is the fixture-rot
guard (committed PNG bytes == pure-zlib regeneration, structural CRC
check) and the fail-loud contract (codec='pil' without PIL raises, never
falls back to fake data).

When PIL IS present (any deployment with Pillow installed), the real
path decodes the committed PNGs and the tests pin exact pixel
checksums computed from the fixture's known pixel grids — NEAREST
resampling at identity size is bit-exact, so the pins are not
PIL-version-dependent.
"""

from __future__ import annotations

import os
import struct
import sys
import zlib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import gen_png_fixtures as G  # noqa: E402

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (  # noqa: E402,E501
    multimodal as MM,
)

try:
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

IMG_DIR = os.path.join(REPO, "tests", "golden", "images")


def _committed() -> dict[str, bytes]:
    return {
        name: open(os.path.join(IMG_DIR, f"{name}.png"), "rb").read()
        for name in G.fixtures()
    }


def test_committed_fixtures_match_generator():
    for name, px in G.fixtures().items():
        want = G.png_gray(px)
        got = _committed()[name]
        assert got == want, f"fixture {name} drifted from tools/gen_png_fixtures.py"


def test_fixtures_are_structurally_valid_png():
    for name, blob in _committed().items():
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        pos, chunks = 8, {}
        while pos < len(blob):
            (ln,) = struct.unpack(">I", blob[pos : pos + 4])
            typ = blob[pos + 4 : pos + 8]
            data = blob[pos + 8 : pos + 8 + ln]
            (crc,) = struct.unpack(">I", blob[pos + 8 + ln : pos + 12 + ln])
            assert crc == zlib.crc32(typ + data), (name, typ)
            chunks[typ] = data
            pos += 12 + ln
        w, h = struct.unpack(">II", chunks[b"IHDR"][:8])
        raw = zlib.decompress(chunks[b"IDAT"])
        assert len(raw) == h * (w + 1), name


def _media_df(spark):
    rows = [
        (i, "image", blob) for i, (name, blob) in enumerate(sorted(_committed().items()))
    ]
    return spark.createDataFrame(rows, "media_id long, modality string, content binary")


@pytest.mark.skipif(HAVE_PIL, reason="PIL present: the fail-loud branch can't fire")
def test_pil_codec_fails_loudly_without_pil(spark):
    with pytest.raises(Exception, match="PIL|NotImplementedError"):
        MM.resize_images(_media_df(spark), 4, 4, codec="pil").collect()
    with pytest.raises(Exception, match="codec"):
        MM.decode_features(_media_df(spark), codec="pil").collect()


def test_bad_codec_rejected(spark):
    with pytest.raises(ValueError, match="codec"):
        MM.resize_images(_media_df(spark), codec="jpegxl")
    with pytest.raises(ValueError, match="codec"):
        MM.decode_features(_media_df(spark), codec="jpegxl")


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed in this container")
def test_pil_resize_identity_is_exact(spark):
    """Resize to the image's own size with NEAREST == the committed
    pixel grid exactly."""
    fixtures = G.fixtures()
    # one image per call so width/height match that image
    for i, (name, px) in enumerate(sorted(fixtures.items())):
        blob = G.png_gray(px)
        df = spark.createDataFrame(
            [(i, "image", blob)], "media_id long, modality string, content binary"
        )
        h, w = len(px), len(px[0])
        row = MM.resize_images(df, width=w, height=h, codec="pil").collect()[0]
        want = [v / 255.0 for r in px for v in r]
        assert row.out_width == w and row.out_height == h
        assert row.pixels == pytest.approx(want), name


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed in this container")
def test_pil_decode_features_pixel_stats(spark):
    """decode_features(codec='pil') folds DECODED pixel values: checksum
    recomputable from the fixture grids."""
    fixtures = G.fixtures()
    out = {
        r.media_id: r
        for r in MM.decode_features(_media_df(spark), codec="pil").collect()
    }
    for i, (name, px) in enumerate(sorted(fixtures.items())):
        flat = [v for r in px for v in r]
        s = sum(flat)
        r = out[i]
        assert r.n_bytes == len(G.png_gray(px)), name
        assert r.byte_mean == pytest.approx(round(s / len(flat), 6)), name
        assert r.byte_mod_sum == s % 997, name


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed in this container")
def test_pil_path_same_schema_as_stub(spark):
    df = _media_df(spark)
    assert (
        MM.resize_images(df, 4, 4, codec="pil").schema
        == MM.resize_images(df, 4, 4, codec="stub").schema
    )
    assert (
        MM.decode_features(df, codec="pil").schema
        == MM.decode_features(df, codec="stub").schema
    )
