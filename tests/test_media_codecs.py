"""Real-codec decode path (round 6): ``codec="auto"`` runs genuine
decoders through the SAME mapInPandas plumbing the oracle-checked stub
entries pin — stdlib ``wave`` here (always available), PIL when the
container has it (import-gated skip otherwise)."""

import io
import wave

import pytest

from steampipe_plugin_terraform_spark.operators.multimodal import (
    decode_image_stub,
    decode_payload_auto,
    decode_wav,
    extract_media_metadata,
)


def _wav_bytes(n_frames=800, rate=8000, channels=2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x01" * channels * n_frames)
    return buf.getvalue()


def test_wav_decode_is_real():
    meta = decode_wav(_wav_bytes())
    assert meta == {
        "n_bytes": meta["n_bytes"],
        "width": 800,        # frames
        "height": 8000,      # sample rate
        "channels": 2,
        "format": "audio/wav",
    }
    assert decode_wav(b"not a riff file at all") is None


def test_auto_dispatch_falls_back_to_stub():
    payload = b"opaque non-media payload"
    assert decode_payload_auto(payload) == decode_image_stub(payload)
    assert decode_payload_auto(_wav_bytes())["format"] == "audio/wav"


def test_auto_codec_through_spark_plumbing(spark):
    rows = [(1, _wav_bytes(100, 16000, 1)), (2, b"just-bytes")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r.asDict()
        for r in extract_media_metadata(df, codec="auto").collect()
    }
    assert got[1]["format"] == "audio/wav"
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (100, 16000, 1)
    stub = decode_image_stub(b"just-bytes")
    assert got[2]["format"] == stub["format"] and got[2]["width"] == stub["width"]


def test_pil_decode_when_available(spark):
    PIL = pytest.importorskip("PIL")  # noqa: F841 — container usually lacks PIL
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 17)).save(buf, format="PNG")
    df = spark.createDataFrame([(7, buf.getvalue())], "doc_id long, payload binary")
    (row,) = extract_media_metadata(df, codec="auto").collect()
    assert (row["width"], row["height"], row["channels"], row["format"]) == (
        32,
        17,
        3,
        "image/png",
    )


# ---- round 7: dependency-free header parsing (real in THIS container) ----

def _png_bytes(w=48, h=32, color_type=6) -> bytes:
    """A complete, spec-valid PNG built with stdlib zlib: signature, IHDR
    (with real CRCs), one IDAT of filtered zero scanlines, IEND."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    nchan = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = b"".join(b"\x00" + b"\x00" * (w * nchan) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg_bytes(w=31, h=22, ncomp=3) -> bytes:
    """A structurally-valid JPEG prefix: SOI, APP0/JFIF, a DQT to prove the
    marker walk skips unrelated segments, then SOF0 carrying the
    dimensions (header probing never needs entropy-coded data)."""
    import struct

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)
    sof0 = struct.pack(">BHHB", 8, h, w, ncomp) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"[: 3 * ncomp]
    out = b"\xff\xd8"
    for marker, body in ((b"\xff\xe0", app0), (b"\xff\xdb", dqt), (b"\xff\xc0", sof0)):
        out += marker + struct.pack(">H", len(body) + 2) + body
    return out


def test_png_header_parse_is_real():
    from steampipe_plugin_terraform_spark.operators.multimodal import (
        decode_image_headers,
    )

    meta = decode_image_headers(_png_bytes(48, 32, color_type=6))
    assert (meta["width"], meta["height"], meta["channels"], meta["format"]) == (
        48, 32, 4, "image/png"
    )
    assert decode_image_headers(_png_bytes(5, 9, color_type=2))["channels"] == 3
    assert decode_image_headers(b"\x89PNG\r\n\x1a\nTRUNC") is None


def test_jpeg_header_parse_walks_markers():
    from steampipe_plugin_terraform_spark.operators.multimodal import (
        decode_image_headers,
    )

    meta = decode_image_headers(_jpeg_bytes(31, 22, 3))
    assert (meta["width"], meta["height"], meta["channels"], meta["format"]) == (
        31, 22, 3, "image/jpeg"
    )
    assert decode_image_headers(_jpeg_bytes(640, 480, 1))["channels"] == 1
    assert decode_image_headers(b"\xff\xd8\xff") is None  # truncated
    assert decode_image_headers(b"not an image") is None
    # EOI before any SOFn ends the walk — the bytes after 0xFFD9 are not
    # segment data and must not be read as a length field (r7 advice)
    assert decode_image_headers(b"\xff\xd8\xff\xd9" + b"\xff\xc0\x00\x0b") is None
    # an APPn whose declared length (4 = length field + 2 payload bytes)
    # swallows a following EOI as payload: the walk never sees the EOI
    # marker, lands on the non-FF byte after it, and fails cleanly
    assert decode_image_headers(b"\xff\xd8\xff\xe0\x00\x04\xff\xd9\x00\x00\x00\x00") is None
    # ...and a zero-payload APPn (length exactly 2) that stops right AT
    # the EOI takes the explicit EOI stop
    assert decode_image_headers(b"\xff\xd8\xff\xe0\x00\x02\xff\xd9\x00\x00\x00\x00") is None


def test_gif_header_parse():
    from steampipe_plugin_terraform_spark.operators.multimodal import (
        decode_image_headers,
    )

    gif = b"GIF89a" + (257).to_bytes(2, "little") + (103).to_bytes(2, "little") + b"\x00\x00\x00;"
    meta = decode_image_headers(gif)
    assert (meta["width"], meta["height"], meta["format"]) == (257, 103, "image/gif")


def test_auto_dispatch_prefers_headers_over_stub(spark):
    """In this container (no PIL) the auto path must return REAL image
    metadata from header parsing — through the same Spark plumbing the
    stub entries pin. PIL, where present, sits earlier in the chain and
    agrees on these fields by construction."""
    rows = [(1, _png_bytes(48, 32)), (2, _jpeg_bytes(31, 22)), (3, b"opaque")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    from steampipe_plugin_terraform_spark.operators.multimodal import (
        decode_image_stub,
    )

    got = {
        r["doc_id"]: r.asDict()
        for r in extract_media_metadata(df, codec="auto").collect()
    }
    assert (got[1]["width"], got[1]["height"], got[1]["format"]) == (48, 32, "image/png")
    assert (got[2]["width"], got[2]["height"], got[2]["format"]) == (31, 22, "image/jpeg")
    stub = decode_image_stub(b"opaque")
    assert got[3]["format"] == stub["format"]


def test_png_bytes_fixture_is_decodable_where_pil_exists():
    """If PIL ever lands in the container, prove the synthetic PNG is a
    genuinely valid file, so the headers path and the full-decode path
    agree (skip silently where PIL is absent)."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from PIL import Image

    im = Image.open(io.BytesIO(_png_bytes(48, 32)))
    assert im.size == (48, 32)


def test_header_parser_total_on_arbitrary_bytes():
    """decode_payload_auto must be TOTAL: any byte string — including
    adversarially truncated container prefixes — yields a complete
    metadata dict (falling through to the stub), never an exception.
    At 100 TB the decode stage sees every corruption that exists."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from steampipe_plugin_terraform_spark.operators.multimodal import (
        MEDIA_META_SCHEMA,
        decode_payload_auto,
    )

    keys = {f.name for f in MEDIA_META_SCHEMA.fields} - {"doc_id"}
    prefixes = [b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"\xff\xd8\xff\xe0",
                b"GIF89a", b"GIF87a", b"RIFF", b"RIFFxxxxWAVE"]

    @settings(max_examples=200, deadline=None)
    @given(pre=st.sampled_from(prefixes), tail=st.binary(max_size=64))
    def check(pre, tail):
        meta = decode_payload_auto(pre + tail)
        assert keys <= set(meta)
        assert meta["n_bytes"] == len(pre + tail)

    check()
