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


def test_frame_sampler_stride_and_partial_tail(spark):
    from hadoop_spark_pspd_spark.operators.multimodal import (
        FRAME_SIZE,
        sample_frames,
    )

    # 2.5 frames -> frame idxs 0,1,2 exist; stride 2 keeps 0 and 2;
    # frame 2 is the 32-byte partial tail
    payload = "a" * (FRAME_SIZE * 2 + 32)
    df = spark.createDataFrame(
        [(1, payload), (2, "")], "doc_id long, text string"
    ).select("doc_id", F.encode("text", "utf-8").alias("payload"))
    rows = sample_frames(df).collect()
    by_key = {(r["doc_id"], r["frame_idx"]): r for r in rows}
    assert set(by_key) == {(1, 0), (1, 2)}  # empty payload -> no frames
    assert by_key[(1, 0)]["frame_len"] == FRAME_SIZE
    assert by_key[(1, 2)]["frame_len"] == 32
    import hashlib

    assert (
        by_key[(1, 2)]["frame_md5"]
        == hashlib.md5(b"a" * 32).hexdigest()
    )


def test_resize_zero_width_guard(spark):
    from hadoop_spark_pspd_spark.operators.multimodal import resize_dims

    # len 640 -> fake width 640 % 640 == 0: the max(w,1) guard must keep
    # the scale finite
    df = spark.createDataFrame(
        [(1, "x" * 640)], "doc_id long, text string"
    ).select("doc_id", F.encode("text", "utf-8").alias("payload"))
    r = resize_dims(df).collect()[0]
    assert r["in_w"] == 0
    assert r["out_w"] == 64
    assert r["out_h"] == (640 * 7 % 480) * 64  # /max(0,1)==1


def test_binaryfile_ingestion_feeds_feature_extraction(spark, tmp_path):
    """End-to-end multimodal ingestion: opaque files on disk -> binaryFile
    source -> mapInPandas feature extraction. Closes the loop the
    documents-table payloads only simulate."""
    import hashlib

    from hadoop_spark_pspd_spark.sources.readers import read_binary_files

    blobs = {"a.img": b"\x89PNG-ish" * 10, "b.img": b"\x00\x01\x02"}
    for fn, b in blobs.items():
        (tmp_path / fn).write_bytes(b)
    (tmp_path / "ignore.txt").write_text("not media")

    df = read_binary_files(spark, str(tmp_path), glob="*.img")
    assert df.count() == 2
    feats = binary_features(
        df.select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("content").alias("payload"),
            F.element_at(F.split("path", "/"), -1).alias("fname"),
        ).select("doc_id", "payload")
    )
    got = sorted(r["payload_md5"] for r in feats.collect())
    want = sorted(hashlib.md5(b).hexdigest() for b in blobs.values())
    assert got == want


def test_audio_energy_known_pattern(spark):
    """A constructed payload with known windowed energies: 256 bytes of
    128 (silence -> energy 0) followed by 256 bytes alternating 0/255
    (max-ish energy), then a 100-byte tail that must be DROPPED (full
    windows only)."""
    from hadoop_spark_pspd_spark.operators.multimodal import (
        AUDIO_WIN,
        audio_energy,
    )

    silence = bytes([128]) * AUDIO_WIN
    loud = bytes([0, 255]) * (AUDIO_WIN // 2)
    tail = bytes([200]) * 100
    df = spark.createDataFrame(
        [(1, silence + loud + tail)], "doc_id long, payload binary"
    )
    row = audio_energy(df).collect()[0]
    assert row["n_windows"] == 2
    # silence window: (128-128)^2 * 256 = 0; loud: ((-128)^2+127^2)*128
    loud_e = ((-128) ** 2 + 127**2) * (AUDIO_WIN // 2)
    assert row["total_energy"] == loud_e
    assert row["max_window_energy"] == loud_e
    assert row["peak_abs"] == 128
    import math

    assert row["rms"] == math.sqrt(loud_e / (2 * AUDIO_WIN))


def test_audio_energy_sub_window_doc_dropped(spark):
    from hadoop_spark_pspd_spark.operators.multimodal import audio_energy

    df = spark.createDataFrame(
        [(1, b"short")], "doc_id long, payload binary"
    )
    assert audio_energy(df).count() == 0


def test_shot_boundaries_known_pattern(spark):
    from hadoop_spark_pspd_spark.operators.multimodal import (
        SHOT_FRAME,
        shot_boundaries,
    )

    # frames: [a*64][z*64][a*64] + partial tail (dropped). Byte-sum
    # signatures jump by 25*64=1600 > 96 at both transitions.
    payload = (b"a" * SHOT_FRAME + b"z" * SHOT_FRAME + b"a" * SHOT_FRAME
               + b"tail")
    flat = b"q" * (SHOT_FRAME * 2)      # no jump -> single shot
    short = b"x" * (SHOT_FRAME - 1)     # sub-frame -> dropped
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(flat)), (3, bytearray(short))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in shot_boundaries(df).collect()}
    assert set(rows) == {1, 2}
    r1 = rows[1]
    assert (r1["n_frames"], r1["n_shots"], r1["longest_shot"],
            r1["first_boundary"]) == (3, 3, 1, 1)
    r2 = rows[2]
    assert (r2["n_frames"], r2["n_shots"], r2["longest_shot"],
            r2["first_boundary"]) == (2, 1, 2, -1)
