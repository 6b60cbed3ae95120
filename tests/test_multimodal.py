"""Multimodal plumbing: Arrow batch shape is real, decode is stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.operators.multimodal import (
    binary_features,
    decode_media,
)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG...", kind="image")


def test_fake_decode_deterministic():
    assert decode_media(b"abc", fake=True) == decode_media(b"abc", fake=True)


def test_binary_features_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "x" * 1000)], "doc_id long, text string"
    ).select("doc_id", F.encode("text", "utf-8").alias("payload"))
    rows = {r["doc_id"]: r for r in binary_features(df).collect()}
    assert rows[1]["n_bytes"] == 5
    assert rows[1]["first_byte"] == ord("h")
    assert rows[2]["n_bytes"] == 0 and rows[2]["first_byte"] == -1
    assert rows[3]["fake_width"] == 1000 % 640
    assert rows[3]["fake_height"] == (1000 * 7) % 480
    import hashlib

    assert rows[1]["payload_md5"] == hashlib.md5(b"hello").hexdigest()
