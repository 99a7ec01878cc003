"""Multimodal pipeline tests: binary payload schema, Arrow-batched
mapInPandas decode/features/frame-sample plumbing, stub gating."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators import multimodal as M
from hdfs_parquet_importer_spark.tables import load_table


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [], M.MEDIA_SCHEMA
    ) if False else M.synthesize_media(spark, n=30)
    return df.cache()


def test_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA
    assert media.count() == 30
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_payload_roundtrip_header(media):
    rows = M.decode_image(media).collect()
    assert len(rows) == 30
    by_id = {r["media_id"]: r for r in rows}
    meta = {r["media_id"]: r["meta"] for r in media.select("media_id", "meta").collect()}
    for mid, r in by_id.items():
        # decode recovered the header the synthesizer wrote
        assert r["width"] == meta[mid]["width"]
        assert r["height"] == meta[mid]["height"]
        assert r["n_bytes"] > 9  # header + >= 1 sha256 frame


def test_decode_deterministic(media):
    a = sorted(map(tuple, M.decode_image(media).collect()))
    b = sorted(map(tuple, M.decode_image(media).collect()))
    assert a == b


def test_decode_matches_local_computation(spark):
    payload = M.make_payload(7, "image", 32, 48)
    df = spark.createDataFrame(
        [(7, "image", payload, (32, 48, 1, "fake/v1"))], M.MEDIA_SCHEMA
    )
    r = M.decode_image(df).first()
    body = payload[M._HDR_SIZE:]
    assert r["byte_sum"] == sum(body)
    assert r["crc32"] == zlib.crc32(body)


def test_extract_features_shape_and_norm(media):
    rows = M.extract_features(media, dim=16).collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == 16
        n = sum(x * x for x in r["feature"])
        assert n == pytest.approx(1.0, abs=1e-3)


def test_frame_sample_multiplies_rows(media):
    frames = M.frame_sample(media.filter(F.col("kind") == "video"), every_n=2)
    per = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    meta = {
        r["media_id"]: r["meta"]["n_frames"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert per, "video rows expected"
    for mid, n in per.items():
        assert n == (meta[mid] + 1) // 2  # ceil(n_frames / every_n)


def test_resize_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        M.resize_image(media, 8, 8)


def test_documents_as_media_oracle_parity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    decoded = M.decode_image(M.documents_as_media(docs))
    got = {r["media_id"]: (r["n_bytes"], r["byte_sum"]) for r in decoded.collect()}
    want = {
        r["doc_id"]: (len(r["text"]), sum(r["text"].encode()))
        for r in docs.collect()
    }
    assert got == want
