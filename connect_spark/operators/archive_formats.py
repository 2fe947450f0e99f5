"""``archive`` / ``unarchive`` file-based and binary formats.

Reference: `docs/modules/components/pages/processors/archive.adoc:26-80`
(formats binary / concatenate / json_array / lines / tar / zip; tar and
zip treat each batch part as a file whose path comes from the
interpolated ``path`` field; the archived message adopts the FIRST
part's metadata) and `unarchive.adoc` (the inverse). lines /
concatenate / json_array live in operators/core.py as pure Column
algebra; the three formats here need real encoders, so each batch
(group) folds through ONE Arrow-batched pandas UDF — the shuffle is
the same single groupBy(collect_list) any batch-fold requires, and the
archive bytes never exceed a batch.

The ``binary`` blob layout is benthos's batch serialization (4-byte
big-endian part count, then per part a 4-byte big-endian length and
the raw bytes) — pinned by golden bytes in tests/test_archive_formats.py
so the roundtrip contract is explicit, not incidental.

Determinism: tar entries carry zeroed mtime/uid/gid and fixed mode,
zip entries a fixed DOS timestamp and STORED compression, so archive
bytes are bit-stable across runs — required for the oracle gate and
for exactly-once sinks that hash their payloads.
"""

from __future__ import annotations

import io
import struct
import tarfile
import zipfile

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_FORMATS = ("binary", "tar", "zip")


def _pack_binary(parts: list[bytes]) -> bytes:
    out = [struct.pack(">I", len(parts))]
    for p in parts:
        out.append(struct.pack(">I", len(p)))
        out.append(p)
    return b"".join(out)


def _unpack_binary(blob: bytes) -> list[tuple[str, bytes]]:
    (n,) = struct.unpack_from(">I", blob, 0)
    off = 4
    parts = []
    for i in range(n):
        (ln,) = struct.unpack_from(">I", blob, off)
        off += 4
        parts.append((str(i), blob[off : off + ln]))
        off += ln
    return parts


def _pack_tar(named: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for path, data in named:
            info = tarfile.TarInfo(name=path)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _unpack_tar(blob: bytes) -> list[tuple[str, bytes]]:
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        return [
            (m.name, tf.extractfile(m).read())
            for m in tf.getmembers()
            if m.isfile()
        ]


def _pack_zip(named: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for path, data in named:
            info = zipfile.ZipInfo(path, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, data)
    return buf.getvalue()


def _unpack_zip(blob: bytes) -> list[tuple[str, bytes]]:
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        return [(n, zf.read(n)) for n in zf.namelist()]


_PACK = {"binary": None, "tar": _pack_tar, "zip": _pack_zip}
_UNPACK = {"binary": _unpack_binary, "tar": _unpack_tar, "zip": _unpack_zip}


def archive_format(
    df: DataFrame,
    fmt: str,
    *,
    group_by: list[str],
    content: Column,
    path: Column | None = None,
    order_by: Column | None = None,
    out: str = "archive",
) -> DataFrame:
    """Fold each ``group_by`` batch into one archive blob (archive.adoc).

    ``path`` names each entry (ignored for binary, per the doc);
    ``order_by`` pins the part order inside the archive (batch order —
    a set-based plan must make it explicit)."""
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {fmt!r}")
    pcol = (path if path is not None else F.lit("")).cast("string")
    ocol = order_by if order_by is not None else pcol
    packed = F.struct(
        ocol.alias("o"), pcol.alias("p"), content.cast("binary").alias("c")
    )
    agg = df.groupBy(*group_by).agg(
        F.sort_array(F.collect_list(packed)).alias("_parts")
    )

    @pandas_udf(T.BinaryType())
    def pack(parts: pd.Series) -> pd.Series:
        res = []
        for plist in parts:
            named = [(row["p"], bytes(row["c"])) for row in plist]
            if fmt == "binary":
                res.append(_pack_binary([c for _, c in named]))
            else:
                res.append(_PACK[fmt](named))
        return pd.Series(res)

    return agg.select(*group_by, pack(F.col("_parts")).alias(out))


def unarchive_format(
    df: DataFrame, fmt: str, col: str = "archive", out: str = "part"
) -> DataFrame:
    """One archive blob → many rows (unarchive.adoc): explodes to
    (`{out}_path`, `{out}`) columns; binary paths are part indexes."""
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {fmt!r}")

    @pandas_udf(
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("content", T.BinaryType()),
                ]
            )
        )
    )
    def unpack(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [
                    {"path": p, "content": c}
                    for p, c in _UNPACK[fmt](bytes(b))
                ]
                for b in blobs
            ]
        )

    exploded = df.withColumn("_entry", F.explode(unpack(F.col(col))))
    return (
        exploded.drop(col)
        .withColumn(f"{out}_path", F.col("_entry.path"))
        .withColumn(out, F.col("_entry.content"))
        .drop("_entry")
    )
