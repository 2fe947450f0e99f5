"""Snowpipe Streaming bdec blob construction
(connect_spark/sinks/snowflake_ingest.py) vs the reference's
internal/impl/snowflake/streaming/{streaming,compat,stats,rest}.go:
golden roundtrips (build -> decrypt -> pyarrow read-back), pinned
vectors for key derivation and EP hex truncation, and the staged
2-partition executor flow."""

import base64
import hashlib
import io
import json

import pandas as pd
import pyarrow.parquet as pq
import pytest

from connect_spark.sinks.snowflake_ingest import (
    bdec_chunks,
    bdec_roundtrip,
    blob_metadata,
    build_bdec_blob,
    column_ep_properties,
    decrypt_bdec,
    derive_key,
    encrypt_bdec,
    generate_blob_path,
    md5_hex,
    normalize_column_name,
    pad_buffer,
    quote_column_name,
    register_blob_request,
    truncate_bytes_as_hex,
)

KEY = base64.b64encode(bytes(range(32))).decode()


# --- compat.go primitive vectors -------------------------------------


def test_normalize_column_name():
    # compat.go normalizeColumnName:137
    assert normalize_column_name("foo") == "FOO"
    assert normalize_column_name("foo bar") == "FOO BAR"
    assert normalize_column_name("foo\\ bar") == "foo bar".upper()
    assert normalize_column_name('"miXed"') == "miXed"
    assert normalize_column_name('"with""quote"') == 'with"quote'
    assert quote_column_name('a"b') == '"A""B"'


def test_truncate_bytes_as_hex_vectors():
    # compat.go truncateBytesAsHex:113
    assert truncate_bytes_as_hex(b"abc", True) == b"abc".hex()
    long = bytes(range(40))
    assert truncate_bytes_as_hex(long, False) == long[:32].hex()
    # MAX side increments the last byte (carry-free case)
    up = bytearray(long[:32])
    up[-1] += 1
    assert truncate_bytes_as_hex(long, True) == bytes(up).hex()
    # carry propagates through trailing 0xFF
    carry = bytes(30) + b"\x01\xff" + b"tail"
    assert truncate_bytes_as_hex(carry, True) == (bytes(30)
                                                  + b"\x02\x00").hex()
    # all-0xFF collapses to the sentinel
    assert truncate_bytes_as_hex(b"\xff" * 40, True) == "Z"


def test_derive_key_pinned_vector():
    # SHA256(base64decode(key) || diversifier) — compat.go:55
    got = derive_key(KEY, "2023/1/1/0/0/x_p_0_1.bdec")
    want = hashlib.sha256(
        bytes(range(32)) + b"2023/1/1/0/0/x_p_0_1.bdec").digest()
    assert got == want
    # diversifying by path changes the key
    assert derive_key(KEY, "other") != got


def test_pad_buffer_and_ctr_roundtrip():
    for n in (0, 1, 15, 16, 17, 100):
        padded = pad_buffer(bytes(n))
        assert len(padded) % 16 == 0 and len(padded) > n  # >=1 byte pad
    enc = encrypt_bdec(b"hello bdec", KEY, "p.bdec")
    assert len(enc) % 16 == 0
    assert decrypt_bdec(enc, KEY, "p.bdec")[:10] == b"hello bdec"
    assert decrypt_bdec(enc, KEY, "q.bdec")[:10] != b"hello bdec"


def test_generate_blob_path_shape():
    # compat.go generateBlobPath:100 — y/m/d/H/M/<base36>_<pfx>_t_c.bdec
    p = generate_blob_path("cli", 7, 3, 1_700_000_000)
    assert p == "2023/11/14/22/13/s44we8_cli_7_3.bdec"
    assert int("s44we8", 36) == 1_700_000_000


# --- EP stats --------------------------------------------------------


def test_column_ep_properties():
    ints = pd.Series([3, None, 1, 9], dtype="Int64").astype("float")
    # float dtype (nullable) -> real stats
    p = column_ep_properties(ints, 1)
    assert (p["minRealValue"], p["maxRealValue"], p["nullCount"]) == \
        (1.0, 9.0, 1)
    p2 = column_ep_properties(pd.Series([5, -2, 7]), 2)
    assert (p2["minIntValue"], p2["maxIntValue"]) == (-2, 7)
    ts = pd.Series(pd.to_datetime(["2024-01-01", "2024-06-01", None]))
    pt = column_ep_properties(ts, 9)
    assert (pt["minIntValue"], pt["maxIntValue"], pt["nullCount"]) == \
        (1704067200000000000, 1717200000000000000, 1)  # epoch nanos
    pb = column_ep_properties(pd.Series([True, False, True]), 8)
    assert (pb["minIntValue"], pb["maxIntValue"]) == (0, 1)
    s = pd.Series(["b" * 40, "a", None])
    p3 = column_ep_properties(s, 3)
    assert p3["minStrValue"] == b"a".hex()
    assert p3["maxStrValue"] == truncate_bytes_as_hex(b"b" * 40, True)
    assert (p3["maxLength"], p3["nullCount"], p3["distinctValues"]) == \
        (40, 1, -1)


# --- golden blob roundtrip -------------------------------------------


def _frame():
    return pd.DataFrame({
        "id": [1, 2, 3],
        "price": [1.5, None, 2.25],
        "note": ["x", "longer text value", None],
    })


def test_build_decrypt_readback_parity():
    path = generate_blob_path("t", 0, 1, 1_700_000_000)
    encrypted, chunk = build_bdec_blob(_frame(), path, KEY)
    # registration artifacts (streaming.go:476-545)
    assert chunk["chunk_md5"] == md5_hex(encrypted[:chunk["chunk_length"]])
    assert len(encrypted) % 16 == 0
    raw = decrypt_bdec(encrypted, KEY, path)[:chunk["chunk_length"]]
    pf = pq.ParquetFile(io.BytesIO(raw))
    # primaryFileId = blob basename (streaming.go:462)
    assert pf.metadata.metadata[b"primaryFileId"].decode() == \
        path.rsplit("/", 1)[-1]
    # totalUncompressedSize from parquet metadata (streaming.go:529)
    assert chunk["chunk_length_uncompressed"] == sum(
        pf.metadata.row_group(i).total_byte_size
        for i in range(pf.metadata.num_row_groups))
    out = pf.read().to_pandas()
    assert list(out.columns) == ["ID", "PRICE", "NOTE"]  # normalized
    assert out["ID"].tolist() == [1, 2, 3]
    assert out["NOTE"].tolist()[:2] == ["x", "longer text value"]
    # EP parity on the decoded frame
    eps = chunk["eps"]
    assert eps["rows"] == 3
    for i, name in enumerate(out.columns):
        assert column_ep_properties(out[name], i + 1) == \
            eps["columns"][name]


def test_blob_metadata_and_register_request_shape():
    path = generate_blob_path("t", 0, 1, 1_700_000_000)
    encrypted, chunk = build_bdec_blob(_frame(), path, KEY)
    bm = blob_metadata(path, encrypted, chunk, database="D", schema="S",
                       table="T", channel="ch")
    assert bm["bdec_version"] == 3 and bm["md5"] == md5_hex(encrypted)
    assert bm["chunks"][0]["channels"][0]["channel_name"] == "ch"
    body = json.loads(register_blob_request(
        [bm], request_id="r1", role="ingest"))
    assert body["blobs"][0]["path"] == path
    assert set(body) == {"request_id", "role", "blobs", "is_iceberg"}


# --- Spark integration -----------------------------------------------


def test_bdec_chunks_two_partitions_staged(spark, tmp_path):
    import os

    stage = str(tmp_path / "blobs")
    df = spark.createDataFrame(
        [(i, float(i) / 2, f"v{i}") for i in range(100)],
        "id LONG, price DOUBLE, note STRING").repartition(2)
    rows = bdec_chunks(df, KEY, stage_dir=stage).collect()
    assert len(rows) == 2 and sum(r.rows for r in rows) == 100
    got = []
    for r in rows:
        staged = os.path.join(stage, r.blob_path.replace("/", "_"))
        blob = open(staged, "rb").read()
        assert md5_hex(blob) == r.blob_md5
        assert md5_hex(blob[:r.chunk_length]) == r.chunk_md5
        raw = decrypt_bdec(blob, KEY, r.blob_path)[:r.chunk_length]
        out = pq.ParquetFile(io.BytesIO(raw)).read().to_pandas()
        eps = json.loads(r.eps_json)
        assert eps["rows"] == len(out)
        got += out["ID"].tolist()
    assert sorted(got) == list(range(100))


def test_bdec_roundtrip_dataframe(spark):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(50)],
        "k LONG, name STRING, v DOUBLE").repartition(3)
    back = bdec_roundtrip(df, KEY)
    assert back.columns == ["k", "name", "v"]
    assert sorted(r.k for r in back.collect()) == list(range(50))


def test_bdec_roundtrip_detects_tamper(spark, monkeypatch):
    import connect_spark.sinks.snowflake_ingest as si

    df = spark.createDataFrame([(1,), (2,)], "k LONG")
    real = si.build_bdec_blob

    def tampered(pdf, path, key, **kw):
        enc, chunk = real(pdf, path, key, **kw)
        chunk = dict(chunk, chunk_md5="0" * 32)
        return enc, chunk

    monkeypatch.setattr(si, "build_bdec_blob", tampered)
    with pytest.raises(Exception, match="md5|Spark"):
        si.bdec_roundtrip(df, KEY).collect()


def test_snowflake_streaming_sink_stages_bdec(spark, tmp_path):
    import glob
    import os

    from connect_spark.plans.pipeline import OUTPUT_KINDS

    stage = str(tmp_path / "st")
    df = spark.createDataFrame(
        [(i, f"p{i}") for i in range(20)],
        "id LONG, payload STRING").repartition(2)
    OUTPUT_KINDS["snowflake_streaming"](df, {
        "stage_path": stage, "channel_name": "ch1",
        "encryption_key": KEY, "database": "D", "table": "T",
    })
    chunks = spark.read.parquet(os.path.join(stage, "chunks")).collect()
    assert sum(r.rows for r in chunks) == 20
    regs = glob.glob(os.path.join(stage, "register_*.json"))
    assert len(regs) == 1
    reg = json.loads(open(regs[0]).read())
    assert {b["chunks"][0]["chunk_md5"] for b in reg["blobs"]} == \
        {r.chunk_md5 for r in chunks}
    assert reg["blobs"][0]["chunks"][0]["channels"][0][
        "channel_name"] == "ch1"
    # staged blobs decrypt back to the input rows
    ids = []
    for r in chunks:
        blob = open(os.path.join(
            stage, "blobs", r.blob_path.replace("/", "_")), "rb").read()
        raw = decrypt_bdec(blob, KEY, r.blob_path)[:r.chunk_length]
        ids += pq.ParquetFile(io.BytesIO(raw)).read().to_pandas()[
            "ID"].tolist()
    assert sorted(ids) == list(range(20))


def test_snowflake_streaming_second_run_never_overwrites(spark, tmp_path):
    """Two invocations on one stage: blob paths are run-unique, so
    run 1's staged blobs still match their registered MD5s after run 2
    (the overwrite hazard of fixed paths + appended chunk rows)."""
    import glob
    import os

    from connect_spark.plans.pipeline import OUTPUT_KINDS

    stage = str(tmp_path / "st")
    df = spark.createDataFrame([(1,), (2,)], "id LONG").coalesce(1)
    for _ in range(2):
        OUTPUT_KINDS["snowflake_streaming"](df, {
            "stage_path": stage, "channel_name": "ch",
            "encryption_key": KEY,
        })
    chunks = spark.read.parquet(os.path.join(stage, "chunks")).collect()
    assert len(chunks) == 2
    assert len({r.blob_path for r in chunks}) == 2  # distinct paths
    assert len(glob.glob(os.path.join(stage, "register_*.json"))) == 2
    for r in chunks:  # EVERY registered chunk still matches its blob
        blob = open(os.path.join(
            stage, "blobs", r.blob_path.replace("/", "_")), "rb").read()
        assert md5_hex(blob) == r.blob_md5
        assert md5_hex(blob[:r.chunk_length]) == r.chunk_md5


def test_example_yaml_pipeline_stages_bdec(spark, tmp_path, monkeypatch):
    """examples/snowflake_ingest.yaml end-to-end: the YAML-configured
    snowflake_streaming sink produces decryptable staged blobs whose
    rows match the routed purchases."""
    import base64
    import os

    import yaml

    from connect_spark.plans.pipeline import build_pipeline

    cfg = yaml.safe_load(open("examples/snowflake_ingest.yaml"))
    stage = str(tmp_path / "stage")
    case0 = cfg["output"]["switch"]["cases"][0]["output"]
    case0["snowflake_streaming"]["stage_path"] = stage
    cfg["output"]["switch"]["cases"][1]["output"]["parquet"]["path"] = \
        str(tmp_path / "other")
    build_pipeline(spark, cfg).run()

    chunks = spark.read.parquet(os.path.join(stage, "chunks"))
    n_purchases = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter("event_type = 'purchase'").count())
    assert sum(r.rows for r in chunks.collect()) == n_purchases
    import glob as _glob

    assert _glob.glob(os.path.join(stage, "register_*.json"))
    # default key (32 zero bytes) decrypts a staged blob
    r = chunks.orderBy("blob_path").first()
    blob = open(os.path.join(
        stage, "blobs", r.blob_path.replace("/", "_")), "rb").read()
    key = base64.b64encode(bytes(32)).decode()
    raw = decrypt_bdec(blob, key, r.blob_path)[:r.chunk_length]
    out = pq.ParquetFile(io.BytesIO(raw)).read()
    assert "VALUE_CENTS" in out.schema.names  # mapping ran, normalized
