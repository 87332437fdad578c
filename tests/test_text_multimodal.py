"""Text-analysis + multimodal operator semantics."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tdei_extract_load_service_spark.multimodal import binary_ops as B
from tdei_extract_load_service_spark.operators import text as TX


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world, 42 times!"), (2, ""), (3, "   "), (4, "one")],
        "id int, text string",
    )
    rows = {r.id: r for r in df.select(
        "id",
        TX.token_count_ws("text").alias("ws"),
        TX.token_count_bpe_ish("text").alias("bpe"),
    ).collect()}
    assert rows[1].ws == 4
    # hello|world|,|4|2|times|! -> 7 BPE-ish tokens (digits count singly)
    assert rows[1].bpe == 7
    assert rows[2].ws == 0 and rows[3].ws == 0 and rows[4].ws == 1


def test_lang_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog is in a house"),
         (2, "el perro y la casa es un lugar"),
         (3, "le chat est dans la maison et les arbres"),
         (4, "xyzzy plugh qwerty")],
        "id int, text string",
    )
    got = {r.id: r.lang for r in df.select("id", TX.lang_id("text").alias("lang")).collect()}
    assert got[1] == "en" and got[2] == "es" and got[3] == "fr" and got[4] == "und"


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [(1, "the and of to is in a " * 20), (2, "!!! ??? ,,, ;;;")],
        "id int, text string",
    )
    rows = {r.id: r.q for r in df.select("id", TX.quality_score("text").alias("q")).collect()}
    assert 0.0 <= rows[2] <= rows[1] <= 1.0


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha  beta"), (3, "alpha beta delta")],
        "id int, text string",
    )
    fps = {r.id: r.fp for r in df.select("id", TX.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


PNG_BYTES = bytes.fromhex("89504E470D0A1A0A") + b"fakepngpayload" * 10
JPEG_BYTES = bytes.fromhex("FFD8FFE0") + b"fakejpegpayload" * 10


def test_binary_meta_magic_sniff(spark):
    df = spark.createDataFrame(
        [(1, PNG_BYTES), (2, JPEG_BYTES), (3, b"plain text bytes")],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in df.select("media_id", B.binary_meta("content").alias("m")).select(
        "media_id", "m.n_bytes", "m.sha256", "m.format").collect()}
    assert rows[1].format == "png" and rows[2].format == "jpeg" and rows[3].format == "unknown"
    assert rows[1].n_bytes == len(PNG_BYTES)
    assert rows[3].sha256 == hashlib.sha256(b"plain text bytes").hexdigest()


def test_decode_image_stub_plumbing(spark):
    df = spark.createDataFrame([(1, PNG_BYTES)], "media_id long, content binary")
    out = B.decode_image(df).collect()[0]
    assert out.media_id == 1
    # container has no Pillow: plumbing runs, decode reports the stub error
    try:
        import PIL  # noqa: F401

        assert out.decoded  # real decode would fail on fake bytes, but PIL absent here
    except ImportError:
        assert not out.decoded
        assert "NotImplementedError" in out.error


def test_frame_sample_deterministic(spark):
    df = spark.createDataFrame([(7, bytes(range(256)) * 16)], "media_id long, content binary")
    first = [(r.frame_idx, r.frame_hash, r.n_bytes) for r in B.frame_sample(df, n_frames=4).orderBy("frame_idx").collect()]
    second = [(r.frame_idx, r.frame_hash, r.n_bytes) for r in B.frame_sample(df, n_frames=4).orderBy("frame_idx").collect()]
    assert first == second
    assert len(first) == 4
    assert len({h for _, h, _ in first}) == 1  # repeating payload -> identical windows hash equal
