"""Bloom membership (queries/membership.py) vs an independent local
reimplementation, plus the filter's defining invariant: no false
negatives (every true member is flagged)."""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from connect_spark.queries.membership import (
    K_HASH, bloom_membership_probe)
from tests.conftest import SF_SMALL


def _local(sf_dir: str):
    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    docs = [
        (i, lg, hashlib.md5(t.strip().lower().encode()).hexdigest())
        for i, lg, t in zip(tbl.column("doc_id").to_pylist(),
                            tbl.column("lang").to_pylist(),
                            tbl.column("text").to_pylist())
    ]
    corpus = {fp for i, _, fp in docs if i % 3 != 0}

    def positions(fp):
        h = hashlib.md5(b"bloom:" + fp.encode()).hexdigest()
        return [int(h[4 * j:4 * j + 4], 16) for j in range(K_HASH)]

    bits = set()
    for fp in corpus:
        bits.update(positions(fp))
    agg = {}
    for i, lg, fp in docs:
        flagged = int(all(p in bits for p in positions(fp)))
        present = int(fp in corpus)
        row = agg.setdefault(lg, [0, 0, 0, 0, 0])
        row[0] += 1
        row[1] += flagged
        row[2] += present
        row[3] += flagged - present
        row[4] += i * flagged
    return agg


def test_bloom_matches_local_reference(spark):
    got = {
        r["lang"]: (r["n_probed"], r["n_flagged"], r["n_present"],
                    r["n_false_pos"], r["flagged_checksum"])
        for r in bloom_membership_probe(spark, SF_SMALL).collect()
    }
    want = {lg: tuple(v) for lg, v in _local(SF_SMALL).items()}
    assert got == want


def test_bloom_no_false_negatives(spark):
    for r in bloom_membership_probe(spark, SF_SMALL).collect():
        assert r["n_flagged"] >= r["n_present"]
        assert r["n_false_pos"] == r["n_flagged"] - r["n_present"]
        assert r["n_false_pos"] >= 0
