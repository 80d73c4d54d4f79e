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


def test_sample_frames_offsets_and_bytes(spark):
    from reactor_window_like_flink_spark.llm.multimodal import (
        _FRAME_BYTES,
        sample_frames,
        with_media,
    )

    # doc_id=2 -> kind 'video' (doc_id % 3 == 2); 200-char text = 3 frames
    docs = spark.createDataFrame(
        [(2, "v" * 200), (0, "img"), (1, "aud")], "doc_id LONG, text STRING"
    )
    rows = sorted(
        sample_frames(with_media(docs), every_k=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    # 200 // 64 = 3 frames, sampled every 2nd -> idx 0 and 2
    assert [(r["doc_id"], r["frame_idx"], r["frame_offset"]) for r in rows] == [
        (2, 0, 0),
        (2, 2, 2 * _FRAME_BYTES),
    ]
    payload = ("v" * 200).encode()
    assert bytes(rows[0]["frame_bytes"]) == payload[:_FRAME_BYTES]
    assert bytes(rows[1]["frame_bytes"]) == payload[2 * _FRAME_BYTES : 3 * _FRAME_BYTES]


def test_resize_images_aspect_preserving(spark):
    from reactor_window_like_flink_spark.llm.multimodal import (
        resize_images,
        with_media,
    )

    # doc_id=0 -> image, width 64, height 64 (<= 224: no upscale)
    # doc_id=192 -> image (192%3==0), width 64+192=256, height 64+(192*7)%512=384
    docs = spark.createDataFrame(
        [(0, "a"), (192, "b"), (1, "audio-skipped")], "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: (
            r["width"],
            r["height"],
            r["out_width"],
            r["out_height"],
            r["scale"],
        )
        for r in resize_images(with_media(docs), max_side=224).collect()
    }
    assert set(got) == {0, 192}
    assert got[0] == (64, 64, 64, 64, 1.0)  # never upscale
    assert got[192] == (256, 384, 149, 224, 0.5833)  # 224/384, round(256*scale)


def test_asset_dedup_collapses_across_container_kinds(spark):
    """Identical payload bytes embedded under different container kinds
    (doc_id % 3 differs) must collapse to ONE asset row with both kinds
    in provenance; unique payloads carry is_dup = 0."""
    import __spark_entry__ as entry_mod
    import reactor_window_like_flink_spark.llm.multimodal as mm

    rows = [
        # doc 3 -> 'image', doc 4 -> 'audio': same text, different kind
        (3, "shared bytes here", "en", "s0", 17),
        (4, "shared bytes here", "en", "s1", 17),
        (5, "unique bytes", "en", "s0", 12),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = mm.load
    mm.load = lambda s, d, t: df
    try:
        out = entry_mod.queries()["q_multimodal_dedup"](spark, "unused").collect()
    finally:
        mm.load = orig
    by_keep = {r["keep_doc_id"]: r for r in out}
    dup = by_keep[3]
    assert dup["n_assets"] == 2 and dup["is_dup"] == 1
    assert dup["kinds"] == "audio,image"  # cross-kind collapse, CSV-encoded
    assert by_keep[5]["is_dup"] == 0 and by_keep[5]["kinds"] == "video"


# --- perceptual near-dup (dHash) ---

from reactor_window_like_flink_spark.llm.multimodal import (  # noqa: E402
    PHASH_HAMMING,
    dhash64,
    dhash_media,
    phash_pairs,
    q_multimodal_phash,
)


def test_dhash_identical_and_near_payloads():
    base = ("the quick brown fox jumps over the lazy dog " * 20).encode()
    assert dhash64(base) == dhash64(bytes(base))
    # one-byte substitution changes at most one sampled grid cell ->
    # at most 2 gradient bits
    sub = bytearray(base)
    sub[100] = 255
    d = bin(dhash64(base) ^ dhash64(bytes(sub))).count("1")
    assert d <= 2
    # unrelated content is far
    other = bytes(range(256)) * 4
    far = bin(dhash64(base) ^ dhash64(other)).count("1")
    assert far > PHASH_HAMMING


def test_phash_pairs_planted_recall_vs_bruteforce(spark):
    # plant: 0/1 near-identical (1-byte sub), 2 unrelated, 3/4 exact dup
    base = ("lorem ipsum dolor sit amet consectetur " * 16).encode()
    near = bytearray(base)
    near[50] = 0
    rows = [
        (0, base),
        (1, bytes(near)),
        (2, bytes(range(1, 250)) * 3),
        (3, b"z" * 300 + bytes(base)),
        (4, b"z" * 300 + bytes(base)),
    ]
    docs = spark.createDataFrame(
        [(i, p.decode("latin-1")) for i, p in rows],
        "doc_id long, text string",
    )
    # bypass with_media's UTF-8 re-encode (latin-1 text round-trips) by
    # hashing the same bytes python-side for the brute-force oracle
    from pyspark.sql import functions as F

    media = docs.select(
        "doc_id",
        F.struct(
            F.lit("image").alias("kind"),
            F.encode("text", "ISO-8859-1").alias("payload"),
        ).alias("media"),
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_pairs(dhash_media(media)).collect()
    }
    sigs = {i: dhash64(p) for i, p in rows}
    want = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= PHASH_HAMMING
    }
    assert got == want           # full recall AND no extras
    assert (0, 1) in got         # the planted near-pair is found
    assert got[(3, 4)] == 0      # exact dup
    assert all((2 not in pair) for pair in got)


def test_phash_key_finds_exact_dups_with_hamming_zero(spark, sf_dir):
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in q_multimodal_phash(spark, sf_dir).collect()
    }
    for (a, b), h in got.items():
        assert a < b and h <= PHASH_HAMMING
    # every exact-payload duplicate pair (checksum groups) must surface
    # with hamming 0 — perceptual recall is a superset of byte identity
    from collections import defaultdict

    from reactor_window_like_flink_spark.sources.tables import load as _load

    by_text = defaultdict(list)
    for r in _load(spark, sf_dir, "documents").select("doc_id", "text").collect():
        by_text[r["text"]].append(r["doc_id"])
    for ids in by_text.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert got.get((ids[i], ids[j])) == 0


def test_phash_pairs_multi_signature_doc_keeps_qualifying_pair(spark):
    """Regression: dedup-before-filter could keep a non-qualifying
    candidate row for a pair and drop its qualifying asset match. A doc
    with two signatures — one identical to the partner, one far but
    sharing a chunk — must still pair at hamming 0."""
    base = 0x0123456789ABCDEF
    # far signature: same low 16-bit chunk as base (bucket collision in
    # chunk 0) but many other bits flipped -> hamming > threshold
    far = base ^ 0x7FFFFFFFFFFF0000
    sigs = spark.createDataFrame(
        [
            (1, "image", base),   # asset 1 of doc 1: exact match
            (1, "image", far),    # asset 2 of doc 1: far, collides chunk 0
            (2, "image", base),   # doc 2
        ],
        "doc_id long, kind string, dhash long",
    )
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in phash_pairs(sigs).collect()}
    assert got.get((1, 2)) == 0
