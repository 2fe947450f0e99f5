"""Full scanner set (docs/modules/components/pages/scanners/): tar,
decompress+child, skip_bom, re_match, avro OCF, switch routing, plus
the original lines/chunker paths still intact."""

from __future__ import annotations

import gzip
import io
import json
import tarfile

from connect_spark.functions.avro_codec import read_ocf, write_ocf
from connect_spark.sources.files import read_file_messages


def _contents(df):
    return sorted(bytes(r.content).decode() for r in df.collect())


def test_tar_scanner(spark, tmp_path):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("a.txt", b"alpha"), ("d/b.txt", b"beta")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    p = tmp_path / "arch.tar"
    p.write_bytes(buf.getvalue())
    df = read_file_messages(spark, str(p), scanner="tar")
    assert _contents(df) == ["alpha", "beta"]


def test_decompress_scanner_with_lines_child(spark, tmp_path):
    p = tmp_path / "data.gz"
    p.write_bytes(gzip.compress(b"l1\nl2\nl3"))
    df = read_file_messages(
        spark,
        str(p),
        scanner="decompress",
        scanner_conf={"algorithm": "gzip", "into": {"scanner": "lines"}},
    )
    assert _contents(df) == ["l1", "l2", "l3"]


def test_skip_bom_scanner(spark, tmp_path):
    p = tmp_path / "bom.txt"
    p.write_bytes(b"\xef\xbb\xbffirst\nsecond")
    df = read_file_messages(spark, str(p), scanner="skip_bom")
    assert _contents(df) == ["first", "second"]
    # no BOM → untouched
    p2 = tmp_path / "plain.txt"
    p2.write_bytes(b"first\nsecond")
    df2 = read_file_messages(spark, str(p2), scanner="skip_bom")
    assert _contents(df2) == ["first", "second"]


def test_re_match_scanner_multiline_records(spark, tmp_path):
    log = (
        "2024-01-01 ERROR boom\n  stack line 1\n  stack line 2\n"
        "2024-01-02 INFO ok\n"
    )
    p = tmp_path / "app.log"
    p.write_text(log)
    df = read_file_messages(
        spark,
        str(p),
        scanner="re_match",
        scanner_conf={"pattern": r"\d{4}-\d{2}-\d{2} "},
    )
    got = _contents(df)
    assert len(got) == 2
    assert any("stack line 2" in g and g.startswith("2024-01-01") for g in got)


def test_avro_ocf_scanner(spark, tmp_path):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
        ],
    }
    recs = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    blob = write_ocf(recs, schema)
    # codec sanity: parse back directly
    rt_schema, rt = read_ocf(blob)
    assert rt == recs and rt_schema["name"] == "r"
    p = tmp_path / "data.avro"
    p.write_bytes(blob)
    df = read_file_messages(spark, str(p), scanner="avro")
    got = [json.loads(c) for c in _contents(df)]
    assert sorted(got, key=lambda r: r["id"]) == recs


def test_switch_scanner_routes_by_name(spark, tmp_path):
    (tmp_path / "x.jsonl").write_bytes(b"line1\nline2")
    (tmp_path / "y.bin").write_bytes(b"wholefile")
    df = read_file_messages(
        spark,
        str(tmp_path) + "/*",
        scanner="switch",
        scanner_conf={
            "cases": [
                {"re_match_name": r"\.jsonl$", "scanner": "lines"},
                {"re_match_name": r"\.bin$", "scanner": "to_the_end"},
            ]
        },
    )
    assert _contents(df) == ["line1", "line2", "wholefile"]
