"""Multimodal plumbing: struct layout, Arrow-batched decode values, and
codec-dispatch failure behavior."""

from __future__ import annotations

import duckdb
import pytest

from reactor_window_like_flink_spark.llm.multimodal import (
    _decode_payload,
    decode_media,
    with_media,
)
from reactor_window_like_flink_spark.sources.tables import load


def test_media_struct_shape(spark, sf_dir):
    media = with_media(load(spark, sf_dir, "documents"))
    row = media.orderBy("doc_id").first()
    assert set(row["media"].asDict()) == {
        "kind", "payload", "n_bytes", "width", "height", "checksum",
    }
    assert isinstance(row["media"]["payload"], (bytes, bytearray))
    assert row["media"]["n_bytes"] == len(row["media"]["payload"])


def test_decode_matches_python_recompute(spark, sf_dir):
    con = duckdb.connect()
    texts = dict(
        con.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    con.close()
    decoded = decode_media(with_media(load(spark, sf_dir, "documents")))
    for r in decoded.orderBy("doc_id").limit(20).collect():
        payload = texts[r["doc_id"]].encode("utf-8")
        kinds = ("image", "audio", "video")
        assert r["kind"] == kinds[r["doc_id"] % 3]
        assert r["n_bytes"] == len(payload)
        want = _decode_payload(payload, r["kind"])
        assert r["n_frames"] == want["n_frames"]
        assert abs(r["mean_byte"] - want["mean_byte"]) < 1e-9


def test_decode_unknown_kind_raises():
    with pytest.raises(NotImplementedError):
        _decode_payload(b"xx", "hologram")
