"""Deterministic `fake(...)` generators — the reference's full list
(internal/impl/lang/bloblang.go:122-160: latitude … uuid_digit, 44
functions) as pure Column algebra.

Everything derives from a per-row md5 seed (kind + a stable row id),
so generated data is REPRODUCIBLE across runs — unlike the reference's
RNG — while keeping realistic shapes. All generators are JVM-side
expressions: no UDF, no shuffle, vectorized under codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MONTHS = (
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
)
_DAYS = (
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
    "Saturday", "Sunday",
)
_TZS = (
    "UTC", "America/New_York", "Europe/London", "Europe/Berlin",
    "Asia/Tokyo", "Australia/Sydney", "America/Los_Angeles",
)
_WORDS = (
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
    "theta", "iota", "kappa", "lambda", "sigma",
)
_FIRST_M = ("alan", "donald", "edsger", "tony", "dennis", "ken")
_FIRST_F = ("ada", "grace", "barbara", "frances", "margaret", "radia")
_LAST = ("turing", "knuth", "dijkstra", "hoare", "ritchie", "hopper")
_CN_FIRST = ("wei", "fang", "jie", "ming", "li", "hua")
_CN_LAST = ("wang", "li", "zhang", "liu", "chen", "yang")
_TLDS = ("com", "org", "net", "io", "dev")
_CC_TYPES = ("Visa", "MasterCard", "American Express", "Discover")
_CURRENCIES = ("USD", "EUR", "GBP", "JPY", "CHF")
_TITLES_M = ("Mr.", "Dr.", "Prof.", "Sir")
_TITLES_F = ("Ms.", "Mrs.", "Dr.", "Prof.", "Dame")
_CENTURIES = (
    "XVII", "XVIII", "XIX", "XX", "XXI",
)
_GENDERS = ("female", "male", "nonbinary")


def _pick(pool: tuple[str, ...], idx: Column) -> Column:
    return F.array(*[F.lit(x) for x in pool])[idx % len(pool)]


def fake_value(kind: str) -> Column:
    """One deterministic fake value per row for `kind` (bloblang.go
    supported-functions list; unknown kinds raise like the reference's
    GetFakeValue)."""
    seed = F.md5(
        F.concat(
            F.lit(kind), F.monotonically_increasing_id().cast("string")
        )
    )

    def h(start: int, width: int) -> Column:
        return F.conv(F.substring(seed, start, width), 16, 10).cast(
            "bigint"
        )

    idx = h(1, 6).cast("int")
    first = _pick(_FIRST_F + _FIRST_M, idx)
    last = _pick(_LAST, h(7, 6).cast("int"))
    word = _pick(_WORDS, idx)
    domain = F.concat(word, F.lit("."), _pick(_TLDS, h(13, 4).cast("int")))
    digits10 = F.lpad((h(1, 12) % 10_000_000_000).cast("string"), 10, "0")

    if kind == "latitude":
        return (h(1, 12) % 180_000_000) / 1e6 - 90.0
    if kind == "longitude":
        return (h(1, 12) % 360_000_000) / 1e6 - 180.0
    if kind == "unix_time":
        return 1_000_000_000 + h(1, 12) % 1_000_000_000
    if kind == "date":
        return F.date_format(
            F.date_add(F.lit("2000-01-01").cast("date"), (idx % 9000)),
            "yyyy-MM-dd",
        )
    if kind == "time_string":
        return F.concat_ws(
            ":",
            F.lpad((h(1, 4) % 24).cast("string"), 2, "0"),
            F.lpad((h(5, 4) % 60).cast("string"), 2, "0"),
            F.lpad((h(9, 4) % 60).cast("string"), 2, "0"),
        )
    if kind == "month_name":
        return _pick(_MONTHS, idx)
    if kind == "year_string":
        return (1970 + idx % 60).cast("string")
    if kind == "day_of_week":
        return _pick(_DAYS, idx)
    if kind == "day_of_month":
        return (1 + idx % 28).cast("string")
    if kind == "timestamp":
        return F.from_unixtime(
            1_000_000_000 + h(1, 12) % 1_000_000_000,
            "yyyy-MM-dd HH:mm:ss",
        )
    if kind == "century":
        return _pick(_CENTURIES, idx)
    if kind == "timezone":
        return _pick(_TZS, idx)
    if kind == "time_period":
        return _pick(("AM", "PM"), idx)
    if kind == "email":
        return F.concat(first, F.lit("@"), domain)
    if kind == "mac_address":
        return F.concat_ws(
            ":", *[F.substring(seed, 1 + 2 * i, 2) for i in range(6)]
        )
    if kind == "domain_name":
        return domain
    if kind == "url":
        return F.concat(
            F.lit("https://"), domain, F.lit("/"),
            _pick(_WORDS, h(17, 4).cast("int")),
        )
    if kind == "username":
        return F.concat(first, (idx % 1000).cast("string"))
    if kind == "ipv4":
        return F.concat_ws(
            ".",
            (h(1, 2) % 256).cast("string"),
            (h(3, 2) % 256).cast("string"),
            (h(5, 2) % 256).cast("string"),
            (h(7, 2) % 256).cast("string"),
        )
    if kind == "ipv6":
        return F.concat_ws(
            ":", *[F.substring(seed, 1 + 4 * i, 4) for i in range(8)]
        )
    if kind == "password":
        return F.substring(seed, 1, 12)
    if kind == "jwt":
        return F.concat(
            F.lit("ey"), F.substring(seed, 1, 10), F.lit("."),
            F.lit("ey"), F.substring(seed, 11, 10), F.lit("."),
            F.substring(seed, 21, 12),
        )
    if kind in ("word", ""):
        return word
    if kind == "sentence":
        words = [
            _pick(_WORDS, h(1 + 4 * i, 4).cast("int")) for i in range(5)
        ]
        return F.concat(
            F.initcap(words[0]), F.lit(" "),
            F.concat_ws(" ", *words[1:]), F.lit("."),
        )
    if kind == "paragraph":
        parts = []
        for i in range(3):
            w = [
                _pick(_WORDS, h(1 + 4 * j + i, 4).cast("int"))
                for j in range(4)
            ]
            parts.append(
                F.concat(
                    F.initcap(w[0]), F.lit(" "),
                    F.concat_ws(" ", *w[1:]), F.lit("."),
                )
            )
        return F.concat_ws(" ", *parts)
    if kind == "cc_type":
        return _pick(_CC_TYPES, idx)
    if kind == "cc_number":
        return F.lpad((h(1, 14) % 10**16).cast("string"), 16, "4")
    if kind == "currency":
        return _pick(_CURRENCIES, idx)
    if kind == "amount_with_currency":
        return F.concat(
            _pick(_CURRENCIES, idx), F.lit(" "),
            ((h(7, 8) % 1_000_000) / 100.0).cast("decimal(10,2)").cast("string"),
        )
    if kind == "title_male":
        return _pick(_TITLES_M, idx)
    if kind == "title_female":
        return _pick(_TITLES_F, idx)
    if kind == "first_name":
        return first
    if kind == "first_name_male":
        return _pick(_FIRST_M, idx)
    if kind == "first_name_female":
        return _pick(_FIRST_F, idx)
    if kind == "last_name":
        return last
    if kind == "name":
        return F.concat(F.initcap(first), F.lit(" "), F.initcap(last))
    if kind == "gender":
        return _pick(_GENDERS, idx)
    if kind == "chinese_first_name":
        return _pick(_CN_FIRST, idx)
    if kind == "chinese_last_name":
        return _pick(_CN_LAST, idx)
    if kind == "chinese_name":
        return F.concat(
            F.initcap(_pick(_CN_LAST, idx)), F.lit(" "),
            _pick(_CN_FIRST, h(7, 4).cast("int")),
        )
    if kind == "phone_number":
        return F.concat(
            F.lit("("), F.substring(digits10, 1, 3), F.lit(") "),
            F.substring(digits10, 4, 3), F.lit("-"),
            F.substring(digits10, 7, 4),
        )
    if kind == "toll_free_phone_number":
        return F.concat(
            F.lit("(800) "), F.substring(digits10, 1, 3), F.lit("-"),
            F.substring(digits10, 4, 4),
        )
    if kind == "e164_phone_number":
        return F.concat(F.lit("+1"), digits10)
    if kind == "uuid_hyphenated":
        return F.concat_ws(
            "-",
            F.substring(seed, 1, 8),
            F.substring(seed, 9, 4),
            F.substring(seed, 13, 4),
            F.substring(seed, 17, 4),
            F.substring(seed, 21, 12),
        )
    if kind == "uuid_digit":
        return seed
    # legacy aliases kept from earlier rounds
    if kind == "uuid":
        return F.expr("uuid()")
    if kind == "int":
        return idx
    raise ValueError(f"fake: unknown function {kind!r}")
