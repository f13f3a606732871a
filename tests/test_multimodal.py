"""Unit tests for multimodal.media: payload/metadata shapes, Arrow
mapInPandas decode, frame fan-out, codec stub, and the ASCII
assumption the byte-level oracles rely on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.multimodal import media as M
from tests.conftest import SF_CORRECTNESS_DIR


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "abcd"),
        (1, "hello world, twelve bytes!?"),
        (2, "x" * 100),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_attach_media_shapes(docs):
    m = M.attach_media(docs)
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.filter(F.col("doc_id") == 0).first()
    assert bytes(row.payload) == b"abcd"
    assert row.media_meta.n_bytes == 4
    assert row.media_meta.media_type == "image/fake"


def test_decode_features_byte_math(docs):
    feats = {r.doc_id: r for r in M.decode_features(M.attach_media(docs)).collect()}
    assert feats[0].n_bytes == 4
    assert feats[0].byte_sum == sum(b"abcd")
    assert feats[0].mean_byte == pytest.approx(sum(b"abcd") / 4)
    assert feats[2].byte_entropy == 0.0  # constant payload
    assert feats[1].byte_entropy > 2.0


def test_codec_stub_raises(docs):
    # executor-side NotImplementedError surfaces wrapped in PySpark's
    # PythonException — match on the message
    with pytest.raises(Exception, match="no codec available"):
        M.decode_features(M.attach_media(docs), use_codec=True).collect()
    with pytest.raises(NotImplementedError):
        M.decode_with_codec(b"bytes", "image/png")


def test_frame_sample_fanout(docs):
    frames = M.frame_sample(M.attach_media(docs), n_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 4 and all(f.frame_bytes == 1 for f in by_doc[0])
    # frame bytes re-assemble the payload exactly
    assert sum(f.frame_bytes for f in by_doc[1]) == 27
    # constant payload ⇒ identical equal-size frames hash identically
    hashes = {f.frame_hash for f in by_doc[2]}
    assert len(hashes) == 1


def test_resize_meta(docs):
    out = M.resize_meta(M.attach_media(docs), 224, 224)
    row = out.filter(F.col("doc_id") == 2).first().media_meta
    assert (row.width, row.height) == (224, 224)
    assert row.n_bytes == -(-100 * (224 * 224) // (100 * 100))  # ceil


def test_corpus_is_ascii(spark):
    """The byte-level oracles equate UTF-8 bytes with characters; that
    holds only for ASCII corpora — assert it so a future non-ASCII
    testdata drop fails loudly here instead of as a hash mismatch."""
    docs = spark.read.parquet(f"{SF_CORRECTNESS_DIR}/documents.parquet")
    non_ascii = docs.filter(~F.col("text").rlike(r"^[\x00-\x7F]*$")).count()
    assert non_ascii == 0


def test_decode_resize_stats_matches_hand_computation(spark):
    """4-char payload, meta dims forced to w=2, h=2 (len 4: 4%640=4 ...
    so build a frame whose text length gives known small dims is
    fiddly — instead verify against a direct python recomputation of
    the same index arithmetic for a couple of documents."""
    text = "abcdefghij"  # n=10, w = 10 % 640 = 10, h = 10 % 480 = 10
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = M.decode_resize_stats(M.attach_media(docs), target=8).first()
    raw = text.encode()
    n, w, h = len(raw), 10, 10
    expect = sum(
        raw[(((r * h) // 8) * w + (c * w) // 8) % n]
        for r in range(8)
        for c in range(8)
    )
    assert out.px_sum == expect
    assert out.px_mean == round(expect / 64, 6)


def test_decode_resize_skips_empty_payloads(spark):
    docs = spark.createDataFrame([(1, ""), (2, "xyz")], ["doc_id", "text"])
    out = M.decode_resize_stats(M.attach_media(docs)).collect()
    assert [r.doc_id for r in out] == [2]
