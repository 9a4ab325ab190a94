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
