"""Salted skew join correctness + multimodal resize/frame plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airflow_etl_elt_spark.operators.joins import salted_join
from airflow_etl_elt_spark.operators.multimodal import (
    documents_as_media,
    extract_media_features,
    frame_sample,
    resize_media,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows hit key 1 (the hot key), the rest spread over 2..10.
    fact = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise((F.col("id") % 9) + 2).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(1, 11).select(
        F.col("id").alias("dk"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    return fact, dim


def test_salted_join_matches_plain_join(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, fact.k == dim.dk).select("k", "v", "name")
    salted = salted_join(fact, dim, "k", "dk", salt=4).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer_preserves_unmatched(spark, skewed):
    fact, dim = skewed
    fact2 = fact.union(spark.createDataFrame([(99, -1)], "k long, v long"))
    out = salted_join(fact2, dim, "k", "dk", salt=4, how="left").filter(F.col("k") == 99)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["name"] is None


def test_salted_join_spreads_hot_key(spark, skewed):
    fact, dim = skewed
    out = salted_join(fact, dim, "k", "dk", salt=4)
    # pre-drop, the join key distribution carries the salt: peek at the plan
    # indirectly by checking result size (900 hot rows survive exactly once)
    assert out.filter(F.col("k") == 1).count() == 900


def _media(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    return documents_as_media(docs)


def test_resize_media_output_contract(spark):
    from airflow_etl_elt_spark.operators.multimodal import decode_pixels

    out = resize_media(_media(spark), target_w=8, target_h=4).collect()
    assert len(out) == 50
    formats = set()
    for r in out:
        assert r["width"] == 8 and r["height"] == 4
        assert r["n_bytes"] == len(r["payload"])
        # the payload is a REAL image (PPM/PNG/JPEG per the source format):
        # decoding it yields the target raster
        b = bytes(r["payload"])
        formats.add(b[:2])
        px = decode_pixels(b)
        assert px.shape == (4, 8, 3)
    assert formats == {b"P6", b"\x89P", b"\xff\xd8"}  # all three codecs exercised


def test_resize_media_deterministic(spark):
    a = {r["media_id"]: bytes(r["payload"]) for r in resize_media(_media(spark)).collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in resize_media(_media(spark)).collect()}
    assert a == b


def test_frame_sample_bounds(spark):
    frames = frame_sample(_media(spark), every_n_bytes=16, max_frames=4)
    per_doc = frames.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per_doc)


def test_extract_features_parses_real_headers(spark):
    feats = extract_media_features(_media(spark))
    assert feats.columns == ["media_id", "media_type", "width", "height", "n_bytes", "checksum"]
    rows = feats.collect()
    assert len(rows) == 50
    # decoded dims come from parsing the payload and must agree with the
    # renderer's declared metadata
    declared = {
        r["media_id"]: (r["meta"]["declared_w"], r["meta"]["declared_h"])
        for r in _media(spark).collect()
    }
    for r in rows:
        assert (r["width"], r["height"]) == declared[r["media_id"]]


def test_codec_roundtrip_and_sniffing():
    import numpy as np
    import pytest as _pytest

    from airflow_etl_elt_spark.operators.multimodal import (
        decode_bmp_dims,
        decode_dims,
        decode_ppm,
        encode_ppm,
    )

    px = (np.arange(5 * 7 * 3, dtype=np.uint8)).reshape(5, 7, 3)
    payload = encode_ppm(px)
    assert (decode_ppm(payload) == px).all()
    assert decode_dims(payload) == (7, 5)

    # minimal uncompressed BMP: 14-byte file header + BITMAPINFOHEADER
    import struct

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 31, -17) + b"\x00" * 20
    assert decode_bmp_dims(bmp) == (31, 17)
    assert decode_dims(bmp) == (31, 17)

    # PNG dims parse from the IHDR chunk (no inflate needed); PIL path is
    # preferred when the host has it, falling back to the native header parse
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + b"\x08\x02\x00\x00\x00"
    )
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:  # a real PIL would reject this CRC-less minimal fixture
        assert decode_dims(png) == (640, 480)
        with _pytest.raises(ValueError):
            decode_dims(b"\x89PNG\r\n\x1a\n" + b"rest")  # truncated

    # JPEG dims parse from the SOF0 marker segment (before entropy data)
    jpeg = (
        b"\xff\xd8"  # SOI
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9  # APP0
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 120, 200) + b"\x03" + b"\x00" * 9  # SOF0 h=120 w=200
        + b"\xff\xd9"
    )
    if not has_pil:
        assert decode_dims(jpeg) == (200, 120)

    with _pytest.raises(ValueError):
        decode_dims(b"garbage-bytes")


def test_png_roundtrip_all_channel_counts():
    import numpy as np

    from airflow_etl_elt_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for shape in [(5, 4), (5, 4, 3), (5, 4, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (decode_png(encode_png(px)) == px).all(), shape


def test_png_unfilters_every_filter_type():
    """Hand-assemble PNGs whose scanlines use each filter (Sub/Up/Average/
    Paeth, forward-filtered here per spec §9) and check the decoder inverts
    them — the encoder only emits filter 0, so roundtrip alone would never
    exercise these paths."""
    import struct
    import zlib

    import numpy as np

    from airflow_etl_elt_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8).astype(np.int32)
    h, w, bpp = 6, 5, 3
    stride = w * bpp

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    flat = px.reshape(h, stride)
    raw = b""
    for y in range(h):
        f = y % 5  # cycle through all five filter types
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        line = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            left = cur[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            pred = [0, left, up, (left + up) // 2, paeth(left, up, ul)][f]
            line[x] = (cur[x] - pred) & 0xFF
        raw += bytes([f]) + bytes(line.astype(np.uint8))

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(
            ">I", zlib.crc32(tag + data) & 0xFFFFFFFF
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == px.astype(np.uint8)).all()


def test_png_unsupported_features_raise():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from airflow_etl_elt_spark.operators.multimodal import decode_png, encode_png

    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    for offset, val, msg in [(24, 16, "bit depth"), (25, 3, "color type"), (28, 1, "interlacing")]:
        bad = bytearray(good)
        bad[offset] = val
        with _pytest.raises(ValueError, match=msg):
            decode_png(bytes(bad))


def test_resize_media_handles_png_payloads(spark):
    import numpy as np

    from airflow_etl_elt_spark.operators.multimodal import (
        decode_png,
        encode_png,
        resize_media,
    )

    rng = np.random.default_rng(3)
    rows = [
        (i, bytearray(encode_png(rng.integers(0, 256, size=(40, 30, 3), dtype=np.uint8))),
         "image/png", (0, 30, 40))
        for i in range(4)
    ]
    media = spark.createDataFrame(
        rows,
        "media_id bigint, payload binary, media_type string, "
        "meta struct<n_bytes: bigint, declared_w: int, declared_h: int>",
    )
    out = resize_media(media, target_w=8, target_h=8).collect()
    assert len(out) == 4
    for r in out:
        px = decode_png(bytes(r["payload"]))
        assert px.shape == (8, 8, 3)


# ---------------------------------------------------------------------------
# baseline JPEG codec (operators/_jpeg.py)
# ---------------------------------------------------------------------------


def _gradient(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(h + w - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_zigzag_is_antidiagonal_permutation():
    from airflow_etl_elt_spark.operators._jpeg import ZIGZAG

    assert sorted(ZIGZAG.tolist()) == list(range(64))
    rc = [(i // 8, i % 8) for i in ZIGZAG]
    # defining property: anti-diagonal index never decreases along the scan
    assert all(
        rc[k][0] + rc[k][1] <= rc[k + 1][0] + rc[k + 1][1] for k in range(63)
    )


def test_jpeg_huffman_tables_are_valid_canonical_codes():
    from airflow_etl_elt_spark.operators._jpeg import (
        AC_CHROMA_BITS,
        AC_CHROMA_VALS,
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_CHROMA_BITS,
        DC_CHROMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _canonical_codes,
    )

    for bits, vals in [
        (DC_LUMA_BITS, DC_LUMA_VALS),
        (AC_LUMA_BITS, AC_LUMA_VALS),
        (DC_CHROMA_BITS, DC_CHROMA_VALS),
        (AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]:
        codes = _canonical_codes(bits, vals)  # raises on overflow/mismatch
        assert len(codes) == len(vals)
        # prefix-free: no code is a prefix of a longer one
        as_strings = sorted(
            format(c, f"0{n}b") for c, n in codes.values()
        )
        for a, b in zip(as_strings, as_strings[1:]):
            assert not b.startswith(a)


def test_jpeg_roundtrip_within_quantization_error():
    import numpy as np

    from airflow_etl_elt_spark.operators._jpeg import decode_jpeg, encode_jpeg

    img = _gradient(37, 53)  # deliberately not multiples of 8/16
    for sub in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(img, subsampling=sub))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        # smooth content through the Annex-K tables: small mean error,
        # bounded worst pixel (420 pays extra for chroma averaging)
        assert err.mean() < 5.0
        assert err.max() <= 40


def test_jpeg_grayscale_and_noise_roundtrip():
    import numpy as np

    from airflow_etl_elt_spark.operators._jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:21, 0:19]
    gray = ((xx * 7 + yy * 3) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(gray))
    assert dec.shape == gray.shape and dec.ndim == 2
    # noise is the worst case for a lossy codec: only structural guarantees
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(noise, subsampling="420"))
    assert dec.shape == noise.shape


def test_jpeg_dims_and_sniffing_paths():
    from airflow_etl_elt_spark.operators._jpeg import encode_jpeg
    from airflow_etl_elt_spark.operators.multimodal import (
        _jpeg_sof_dims,
        decode_dims,
        decode_pixels,
    )

    img = _gradient(40, 30)
    enc = encode_jpeg(img)
    assert _jpeg_sof_dims(enc) == (30, 40)
    assert decode_dims(enc) == (30, 40)  # SOF scan, no entropy decode
    assert decode_pixels(enc).shape == (40, 30, 3)


def test_jpeg_unsupported_features_raise():
    import pytest

    from airflow_etl_elt_spark.operators._jpeg import decode_jpeg, encode_jpeg

    enc = bytearray(encode_jpeg(_gradient(16, 16)))
    # rewrite SOF0 (0xFFC0) into progressive SOF2 -> named refusal
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(_gradient(8, 8), subsampling="422")


def test_jpeg_malformed_streams_raise_named_errors():
    """T.81 edge cases (ADVICE r3): fill bytes, standalone markers, stray
    EOI, truncated data, and multi-scan subsets must parse or raise a named
    ValueError — never IndexError/KeyError."""
    import numpy as np
    import pytest

    from airflow_etl_elt_spark.operators._jpeg import decode_jpeg, encode_jpeg

    base = encode_jpeg(_gradient(16, 16))
    ref = decode_jpeg(base)

    # Legal 0xFF fill bytes + a standalone TEM marker between header
    # segments must be skipped transparently (identical decode).
    padded = base[:2] + b"\xff\xff" + b"\xff\x01" + base[2:]
    assert np.array_equal(decode_jpeg(padded), ref)

    # SOI immediately followed by EOI: named refusal, not a silent loop end.
    with pytest.raises(ValueError, match="EOI before SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")

    # Entropy data cut mid-stream: named truncation error, not IndexError.
    sos = base.find(b"\xff\xda")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(base[: sos + 20])

    # Header segment whose declared length runs past the payload.
    with pytest.raises(ValueError, match="truncated|corrupt"):
        decode_jpeg(base[: sos + 5])

    # First SOS covering a subset of frame components (multi-scan baseline):
    # named refusal, not a KeyError deep in the MCU loop.
    mut = bytearray(base)
    mut[sos + 4] = 1  # ns: 3 -> 1 (keeps only the first scan component)
    # shrink the SOS segment length to match (2 len + 1 ns + 2*ns + 3 tail)
    mut[sos + 2 : sos + 4] = (2 + 1 + 2 * 1 + 3).to_bytes(2, "big")
    del mut[sos + 7 : sos + 11]  # drop the two removed component specs
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(bytes(mut))


def test_documents_as_media_emits_all_three_codecs(spark):
    from airflow_etl_elt_spark.operators.multimodal import (
        JPEG_MIME,
        PNG_MIME,
        PPM_MIME,
        documents_as_media,
        extract_media_features,
    )

    docs = spark.createDataFrame(
        [(i, f"doc number {i} " * (3 + i)) for i in range(12)],
        "doc_id bigint, text string",
    )
    media = documents_as_media(docs)
    mimes = {r["media_id"]: r["media_type"] for r in media.collect()}
    assert {mimes[k] for k in mimes} == {PPM_MIME, PNG_MIME, JPEG_MIME}
    feats = extract_media_features(media, with_dims_check=True).collect()
    assert len(feats) == 12
    assert all(r["dims_match"] for r in feats)  # JPEG dims parse exactly


def test_resize_media_reencodes_jpeg_in_source_format(spark):
    from airflow_etl_elt_spark.operators._jpeg import decode_jpeg, encode_jpeg
    from airflow_etl_elt_spark.operators.multimodal import resize_media

    rows = [
        (i, bytearray(encode_jpeg(_gradient(40, 30), subsampling=s)), "image/jpeg",
         (0, 30, 40))
        for i, s in [(0, "444"), (1, "420")]
    ]
    media = spark.createDataFrame(
        rows,
        "media_id bigint, payload binary, media_type string, "
        "meta struct<n_bytes: bigint, declared_w: int, declared_h: int>",
    )
    out = resize_media(media, target_w=8, target_h=8).collect()
    assert len(out) == 2
    for r in out:
        px = decode_jpeg(bytes(r["payload"]))  # still a JPEG payload
        assert px.shape == (8, 8, 3)


# ---------------------------------------------------------------------------
# chart PDF sink (SURVEY §2 row 8 — the last boundary, now real)
# ---------------------------------------------------------------------------


def test_plot_kde_pdf_writes_valid_deterministic_pdf(spark, tmp_path):
    """The chart sink must emit a structurally valid PDF 1.4 (header, page
    object, decodable Flate content stream containing the per-group
    polylines and labels, xref offsets that land on their objects) and be
    byte-deterministic for the same input."""
    import re
    import zlib

    from airflow_etl_elt_spark.operators.chart_pdf import plot_kde_pdf

    rows = []
    import random as _r

    rng = _r.Random(5)
    for q in (5, 6, 7):
        for _ in range(80):
            rows.append((q, 8.0 + q * 0.5 + rng.gauss(0, 0.4)))
    df = spark.createDataFrame(rows, "quality int, alcohol double")

    p1 = plot_kde_pdf(df, "quality", "alcohol", str(tmp_path / "a"), title="Alcohol KDE")
    p2 = plot_kde_pdf(df, "quality", "alcohol", str(tmp_path / "b"), title="Alcohol KDE")
    raw = open(p1, "rb").read()
    assert p1.endswith("alcohol_kde.pdf")
    assert raw.startswith(b"%PDF-1.4") and raw.rstrip().endswith(b"%%EOF")
    assert raw == open(p2, "rb").read()  # deterministic bytes

    # xref offsets must point at their objects
    xref_at = int(raw.rsplit(b"startxref", 1)[1].split()[0])
    assert raw[xref_at : xref_at + 4] == b"xref"
    for i, line in enumerate(raw[xref_at:].split(b"\n")[3:8], start=1):
        off = int(line.split()[0])
        assert raw[off:].startswith(b"%d 0 obj" % i)

    # content stream decodes and draws 3 legend labels + the title
    m = re.search(rb"stream\n(.*?)\nendstream", raw, re.S)
    content = zlib.decompress(m.group(1)).decode("latin-1")
    assert "(Alcohol KDE) Tj" in content
    for q in ("5", "6", "7"):
        assert f"({q}) Tj" in content
    # three colored curves: one 64-point path per group
    assert content.count(" S") >= 3
    assert "Total 240 samples" in content
