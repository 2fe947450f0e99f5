"""fake() generators (functions/fake.py): the reference's full 44-name
list (internal/impl/lang/bloblang.go:122-160), deterministic."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from connect_spark.functions.fake import fake_value

ALL_KINDS = (
    "latitude longitude unix_time date time_string month_name "
    "year_string day_of_week day_of_month timestamp century timezone "
    "time_period email mac_address domain_name url username ipv4 ipv6 "
    "password jwt word sentence paragraph cc_type cc_number currency "
    "amount_with_currency title_male title_female first_name "
    "first_name_male first_name_female last_name name gender "
    "chinese_first_name chinese_last_name chinese_name phone_number "
    "toll_free_phone_number e164_phone_number uuid_hyphenated "
    "uuid_digit"
).split()

SHAPES = {
    "date": r"\d{4}-\d{2}-\d{2}",
    "time_string": r"\d{2}:\d{2}:\d{2}",
    "timestamp": r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}",
    "email": r"[a-z]+@[a-z]+\.[a-z]+",
    "mac_address": r"([0-9a-f]{2}:){5}[0-9a-f]{2}",
    "url": r"https://[a-z]+\.[a-z]+/[a-z]+",
    "ipv4": r"(\d{1,3}\.){3}\d{1,3}",
    "ipv6": r"([0-9a-f]{4}:){7}[0-9a-f]{4}",
    "jwt": r"ey[0-9a-f]{10}\.ey[0-9a-f]{10}\.[0-9a-f]{12}",
    "cc_number": r"\d{16}|4+\d*",
    "phone_number": r"\(\d{3}\) \d{3}-\d{4}",
    "toll_free_phone_number": r"\(800\) \d{3}-\d{4}",
    "e164_phone_number": r"\+1\d{10}",
    "uuid_hyphenated": r"[0-9a-f]{8}(-[0-9a-f]{4}){3}-[0-9a-f]{12}",
    "uuid_digit": r"[0-9a-f]{32}",
    "sentence": r"[A-Z][a-z]+( [a-z]+){4}\.",
}


def test_all_44_generators_produce_values(spark):
    assert len(ALL_KINDS) == 45  # 44 in the doc blurb + time_period in the case list
    df = spark.range(3)
    cols = [fake_value(k).cast("string").alias(k) for k in ALL_KINDS]
    rows = df.select(*cols).collect()
    for k in ALL_KINDS:
        for r in rows:
            v = r[k]
            assert v is not None and v != "", k
            if k in SHAPES:
                assert re.fullmatch(SHAPES[k], v), (k, v)


def test_fake_is_deterministic_and_varies_per_row(spark):
    df = spark.range(5).coalesce(1)
    a = [r["e"] for r in df.select(fake_value("email").alias("e")).collect()]
    b = [r["e"] for r in df.select(fake_value("email").alias("e")).collect()]
    assert a == b
    assert len(set(a)) > 1


def test_latitude_longitude_bounds(spark):
    df = spark.range(50)
    rows = df.select(
        fake_value("latitude").alias("lat"),
        fake_value("longitude").alias("lon"),
    ).collect()
    assert all(-90 <= r["lat"] <= 90 for r in rows)
    assert all(-180 <= r["lon"] <= 180 for r in rows)


def test_unknown_kind_raises(spark):
    with pytest.raises(ValueError, match="unknown function"):
        fake_value("blood_type")


def test_via_bloblang(spark):
    from connect_spark.bloblang.compiler import compile_mapping

    df = spark.range(2).toDF("i")
    row = compile_mapping(
        df, 'root.ip = fake("ipv4")\nroot.n = fake("name")'
    ).collect()[0]
    assert re.fullmatch(r"(\d{1,3}\.){3}\d{1,3}", row["ip"])
    assert " " in row["n"]
