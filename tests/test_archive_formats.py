"""archive/unarchive binary, tar, zip (operators/archive_formats.py)."""

from __future__ import annotations

import io
import tarfile
import zipfile

import pytest
from pyspark.sql import functions as F

from connect_spark.operators.archive_formats import (
    _pack_binary,
    _unpack_binary,
    archive_format,
    unarchive_format,
)


def test_binary_blob_golden_bytes():
    # 4-byte BE count, then per part 4-byte BE length + raw bytes
    blob = _pack_binary([b"ab", b"", b"xyz"])
    assert blob == (
        b"\x00\x00\x00\x03"
        b"\x00\x00\x00\x02ab"
        b"\x00\x00\x00\x00"
        b"\x00\x00\x00\x03xyz"
    )
    assert _unpack_binary(blob) == [("0", b"ab"), ("1", b""), ("2", b"xyz")]


def _df(spark):
    rows = [
        (1, "a.txt", b"alpha"),
        (1, "b.txt", b"beta"),
        (2, "c.txt", b"gamma"),
    ]
    return spark.createDataFrame(rows, "grp INT, name STRING, data BINARY")


@pytest.mark.parametrize("fmt", ["binary", "tar", "zip"])
def test_roundtrip(spark, fmt):
    df = _df(spark)
    arch = archive_format(
        df, fmt, group_by=["grp"], content=F.col("data"), path=F.col("name")
    )
    assert arch.count() == 2
    back = unarchive_format(arch, fmt)
    got = {
        (r["grp"], bytes(r["part"]))
        for r in back.collect()
    }
    assert got == {(1, b"alpha"), (1, b"beta"), (2, b"gamma")}
    if fmt != "binary":
        paths = {r["part_path"] for r in back.collect()}
        assert paths == {"a.txt", "b.txt", "c.txt"}


def test_tar_zip_externally_readable(spark):
    df = _df(spark).filter("grp = 1")
    tar_blob = bytes(
        archive_format(
            df, "tar", group_by=["grp"], content=F.col("data"),
            path=F.col("name"),
        ).collect()[0]["archive"]
    )
    with tarfile.open(fileobj=io.BytesIO(tar_blob)) as tf:
        assert sorted(m.name for m in tf.getmembers()) == ["a.txt", "b.txt"]
        assert tf.extractfile("a.txt").read() == b"alpha"
    zip_blob = bytes(
        archive_format(
            df, "zip", group_by=["grp"], content=F.col("data"),
            path=F.col("name"),
        ).collect()[0]["archive"]
    )
    with zipfile.ZipFile(io.BytesIO(zip_blob)) as zf:
        assert zf.read("b.txt") == b"beta"


def test_archive_bytes_are_deterministic(spark):
    df = _df(spark)
    blobs = []
    for _ in range(2):
        rows = archive_format(
            df, "tar", group_by=["grp"], content=F.col("data"),
            path=F.col("name"),
        ).orderBy("grp").collect()
        blobs.append([bytes(r["archive"]) for r in rows])
    assert blobs[0] == blobs[1]


def test_unknown_format_rejected(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        archive_format(df, "rar", group_by=["grp"], content=F.col("data"))
    with pytest.raises(ValueError):
        unarchive_format(df, "7z")


def test_pipeline_archive_unarchive_config(spark, sf_dir):
    from connect_spark.plans.pipeline import build_pipeline

    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
        "pipeline": {
            "processors": [
                {
                    "archive": {
                        "format": "zip",
                        "group_by": ["this.r_regionkey % 2"],
                        "value": "this.r_name.bytes()",
                        "path": "this.r_name",
                    }
                },
                {"unarchive": {"format": "zip", "field": "this.archive"}},
            ]
        },
    }
    out = build_pipeline(spark, config).dataframe()
    names = {bytes(r["part"]).decode() for r in out.collect()}
    assert names == {"AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"}
