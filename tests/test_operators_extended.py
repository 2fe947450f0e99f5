"""Tests for multimodal plumbing, enrichment operators, branch/
workflow, format functions."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from connect_spark.catalog import load_table
from connect_spark.operators.branch import branch, branch_aggregate, workflow
from connect_spark.operators.enrichment import cached_enrich, map_in_pandas_enrich
from connect_spark.text.multimodal import (
    FEATURE_SCHEMA,
    as_media_frame,
    decode_media,
    resize_stub,
)

SF = "/root/testdata/sf0.001"


def test_multimodal_decode_stub(spark):
    docs = load_table(spark, SF, "documents")
    media = as_media_frame(docs, "doc_id", "text", "text/plain")
    feats = decode_media(media, decode_stub=True)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r["byte_len"] > 0
    assert 64 <= r["width"] < 128 and 64 <= r["height"] < 128
    assert len(r["feature"]) == 8
    # deterministic: same payload → same features
    rows2 = decode_media(media, decode_stub=True).collect()
    assert {x["media_id"]: x["feature"] for x in rows} == {
        x["media_id"]: x["feature"] for x in rows2
    }


def test_multimodal_real_decode_raises(spark):
    # image/webp has NO pure-stdlib codec (BMP/PNG/GIF/JPEG/WAV all
    # real-decode via media_codecs now), so decode_stub=False must hit
    # the honest gate for it
    docs = load_table(spark, SF, "documents").limit(2)
    media = as_media_frame(docs, "doc_id", "text", "image/webp")
    with pytest.raises(Exception, match="NotImplementedError|decode_stub"):
        decode_media(media, decode_stub=False).collect()


def test_multimodal_jpeg_real_decode(spark):
    # image/jpeg rides the REAL codec regardless of decode_stub: true
    # dimensions + channel means, and garbage bytes raise the codec's
    # own error instead of falling back to the stub
    from connect_spark.text.media_codecs import encode_jpeg

    jpg = encode_jpeg([[(120, 60, 30)] * 8 for _ in range(8)])
    df = spark.createDataFrame(
        [(1, bytearray(jpg), "image/jpeg", {})],
        "media_id long, payload binary, mime string, "
        "meta map<string,string>")
    row = decode_media(df, decode_stub=True).collect()[0]
    assert (row["width"], row["height"]) == (8, 8)
    bad = spark.createDataFrame(
        [(2, bytearray(b"not a jpeg"), "image/jpeg", {})],
        "media_id long, payload binary, mime string, "
        "meta map<string,string>")
    with pytest.raises(Exception, match="missing SOI"):
        decode_media(bad, decode_stub=True).collect()


def test_resize_stub_meta(spark):
    docs = load_table(spark, SF, "documents").limit(3)
    media = resize_stub(
        as_media_frame(docs, "doc_id", "text", "image/png"), 32, 32
    )
    metas = [r["meta"] for r in media.collect()]
    assert all(m["resize"] == "32x32" for m in metas)


def test_cached_enrich_runs_once_per_key(spark):
    ev = load_table(spark, SF, "events")

    def compute(keys_df):
        # expensive-per-key computation stand-in; must see DISTINCT keys
        return keys_df.withColumn(
            "enriched", F.concat(F.lit("u-"), F.col("user_id"))
        )

    out = cached_enrich(ev, "user_id", compute)
    assert out.count() == ev.count()
    sample = out.filter(F.col("user_id") == 7).select("enriched").first()
    assert sample["enriched"] == "u-7"


def test_map_in_pandas_enrich(spark):
    ev = load_table(spark, SF, "events").select("event_id", "event_type")

    def transport(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["reply"] = "ok:" + pdf["event_type"]
        return pdf

    schema = T.StructType(
        ev.schema.fields + [T.StructField("reply", T.StringType())]
    )
    out = map_in_pandas_enrich(ev, transport, schema)
    rows = out.collect()
    assert len(rows) == ev.count()
    assert all(r["reply"] == f"ok:{r['event_type']}" for r in rows[:20])


def test_map_in_pandas_enrich_rejects_bad_cardinality(spark):
    ev = load_table(spark, SF, "events").select("event_id").limit(10)

    def bad(pdf):
        return pdf.iloc[:1]

    with pytest.raises(Exception, match="one row per input"):
        map_in_pandas_enrich(ev, bad, ev.schema).collect()


def test_branch_and_aggregate_joinback(spark):
    li = load_table(spark, SF, "lineitem")
    b = branch(li, {"net": F.col("l_extendedprice") * (1 - F.col("l_discount"))})
    assert "net" in b.columns and b.count() == li.count()

    out = branch_aggregate(
        li,
        keys=["l_orderkey"],
        agg_fn=lambda d: d.groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("n_lines")
        ),
    )
    assert out.count() == li.count()
    one = out.filter(F.col("l_orderkey") == out.first()["l_orderkey"])
    vals = {r["n_lines"] for r in one.collect()}
    assert len(vals) == 1


def test_workflow_dependency_order(spark):
    li = load_table(spark, SF, "lineitem").limit(100)
    out = workflow(
        li,
        branches={
            "b": {"y": F.col("x") + 1},
            "a": {"x": F.col("l_quantity") * 2},
        },
        dependencies={"b": ["a"]},
    )
    r = out.select("l_quantity", "x", "y").first()
    assert r["x"] == r["l_quantity"] * 2
    assert r["y"] == r["x"] + 1


def test_grok_and_syslog(spark):
    from connect_spark.functions.formats import parse_syslog

    df = spark.createDataFrame(
        [Row(line="Jan  3 06:25:43 host1 sshd[4243]: session opened for user x")]
    )
    parsed = df.select(parse_syslog("line").alias("p")).select("p.*")
    r = parsed.first()
    assert r["hostname"] == "host1"
    assert r["appname"] == "sshd"
    assert r["procid"] == "4243"
    assert r["message"].startswith("session opened")


def test_text_chunks_cover_all_tokens(spark):
    from connect_spark.functions.formats import text_chunks

    docs = load_table(spark, SF, "documents")
    chunked = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n"),
        text_chunks("text", 20).alias("chunks"),
    )
    r = chunked.withColumn(
        "rejoined_tokens",
        F.size(
            F.filter(
                F.split(F.array_join("chunks", " "), " "), lambda t: t != ""
            )
        ),
    )
    bad = r.filter(F.col("n") != F.col("rejoined_tokens")).count()
    assert bad == 0


def test_schema_registry_frame_roundtrip(spark):
    from connect_spark.functions.schema_registry import (
        encode_confluent_frame,
        parse_confluent_frame,
        schema_registry_decode,
    )

    df = spark.createDataFrame(
        [Row(j='{"a": 1, "b": "x"}'), Row(j='{"a": 2, "b": "y"}')]
    )
    framed = df.select(
        encode_confluent_frame(F.col("j"), schema_id=7).alias("frame")
    )
    parsed = framed.select(parse_confluent_frame("frame").alias("p"))
    rows = parsed.select("p.*").collect()
    assert all(r["magic_ok"] and r["schema_id"] == 7 for r in rows)
    assert sorted(bytes(r["payload"]).decode() for r in rows) == [
        '{"a": 1, "b": "x"}',
        '{"a": 2, "b": "y"}',
    ]

    decoded = schema_registry_decode(
        framed, "frame", {7: "a INT, b STRING"}
    )
    out = decoded.collect()
    assert all(r["_error"] is None for r in out)
    assert sorted(r["decoded"] for r in out) == [
        '{"a":1,"b":"x"}',
        '{"a":2,"b":"y"}',
    ]


def test_schema_registry_unknown_id_flags_error(spark):
    from connect_spark.functions.schema_registry import (
        encode_confluent_frame,
        schema_registry_decode,
    )

    framed = spark.createDataFrame([Row(j='{"a":1}')]).select(
        encode_confluent_frame(F.col("j"), schema_id=99).alias("frame")
    )
    out = schema_registry_decode(framed, "frame", {7: "a INT"}).collect()
    assert out[0]["_error"] == "schema_registry: unknown schema id"
    assert out[0]["decoded"] is None


def test_multimodal_frame_sampling(spark):
    from connect_spark.text.multimodal import as_media_frame, sample_frames

    docs = spark.createDataFrame(
        [(1, b"0123456789abcdef"), (2, b"xyz")], ["id", "blob"]
    )
    media = as_media_frame(docs, "id", "blob", "video/mp4")
    frames = sample_frames(media, n_frames=4, frame_interval_ms=500)
    rows = sorted(
        frames.collect(), key=lambda r: (r.media_id, r.frame_idx)
    )
    assert len(rows) == 8  # one-to-many: 2 videos x 4 frames
    first = [r for r in rows if r.media_id == 1]
    assert [r.ts_ms for r in first] == [0, 500, 1000, 1500]
    assert bytes(first[0].frame) == b"0123"
    assert bytes(first[3].frame) == b"cdef"
    # stub gate raises where ffmpeg would go
    import pytest as _pytest

    with _pytest.raises(Exception, match="ffmpeg"):
        sample_frames(media, decode_stub=False).collect()


def test_multimodal_decoder_probe_selects_stub_without_pil(spark):
    """`decode_stub=\"auto\"` probes for PIL executor-side: absent in
    this container, the deterministic stub must be selected and
    produce the same output as the forced stub; a fake-present PIL
    selects the real decoder."""
    import sys

    from connect_spark.text.multimodal import _fake_decode, _select_decoder

    assert _select_decoder("auto") is _fake_decode
    assert _select_decoder(True) is _fake_decode
    fake_pil = type(sys)("PIL")
    sys.modules["PIL"] = fake_pil
    try:
        from connect_spark.text.multimodal import _pil_decode

        assert _select_decoder("auto") is _pil_decode
        assert _select_decoder(False) is _pil_decode
    finally:
        del sys.modules["PIL"]
    docs = load_table(spark, SF, "documents").limit(4)
    from connect_spark.text.multimodal import as_media_frame, decode_media

    media = as_media_frame(docs, "doc_id", "text", "text/plain")
    auto_rows = sorted(
        (r.media_id, r.width, r.height, tuple(r.feature))
        for r in decode_media(media, decode_stub="auto").collect()
    )
    stub_rows = sorted(
        (r.media_id, r.width, r.height, tuple(r.feature))
        for r in decode_media(media, decode_stub=True).collect()
    )
    assert auto_rows == stub_rows


def test_gapfill_locf_dense_and_filled(spark):
    from connect_spark.queries.extended import timeseries_gapfill_locf

    rows = timeseries_gapfill_locf(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    import datetime as _dt

    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["hour"])
        hours = [_dt.datetime.fromisoformat(r["hour"]) for r in rs]
        # dense spine: consecutive hours, no holes
        for a, b in zip(hours, hours[1:]):
            assert (b - a).total_seconds() == 3600
        # locf: filled rows carry the previous observed value
        prev = None
        for r in rs:
            if r["filled"] == 0:
                prev = r["cents_locf"]
                assert r["n_events"] > 0
            else:
                assert r["n_events"] == 0
                assert r["cents_locf"] == prev


def test_grouping_sets_totals_consistent(spark):
    from connect_spark.queries.extended import grouping_sets_orders

    rows = grouping_sets_orders(spark, SF).collect()
    grand = [r for r in rows if r["g_status"] == 1 and r["g_priority"] == 1]
    assert len(grand) == 1
    detail = sum(r["n"] for r in rows
                 if r["g_status"] == 0 and r["g_priority"] == 0)
    assert grand[0]["n"] == detail
    by_status = sum(r["n"] for r in rows
                    if r["g_status"] == 0 and r["g_priority"] == 1)
    assert by_status == detail
