"""Multimodal plumbing tests: schema, Arrow batch shape, deterministic
fake-decode kernel, frame-sample plan, stubbed real decoder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_snowflake_kinesis_airflow_pipeline_spark.catalog import load_table
from aws_snowflake_kinesis_airflow_pipeline_spark.operators import multimodal


def test_documents_as_media_schema(spark, sf_dir):
    media = multimodal.documents_as_media(load_table(spark, sf_dir, "documents"))
    fields = dict((f.name, f.dataType.simpleString()) for f in media.schema.fields)
    assert fields["content"] == "binary"
    assert fields["meta"].startswith("struct<mime:string,width:int,height:int")


def test_media_metadata_jvm_side(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(docs)
    meta = multimodal.media_metadata(media)
    row = meta.orderBy("media_id").first()
    doc = docs.orderBy("doc_id").first()
    assert row["n_bytes"] == len(doc["text"].encode())
    assert len(row["digest"]) == 64  # sha256 hex


def test_extract_features_deterministic_batches(spark, sf_dir):
    media = multimodal.documents_as_media(
        load_table(spark, sf_dir, "documents")
    ).repartition(7)  # force multiple Arrow batches/tasks
    f1 = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    f2 = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == multimodal.FEATURE_DIM for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(1, b"x", ("video/mp4", None, None, 3500))],
        multimodal.MEDIA_SCHEMA,
    )
    frames = multimodal.frame_sample_plan(media, every_ms=1000)
    assert [r["frame_ts_ms"] for r in frames.collect()] == [0, 1000, 2000, 3000]


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal._decode_image_real(b"payload")
