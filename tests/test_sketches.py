"""Count-Min and HyperLogLog sketches (queries/analytics.py) vs
independent local reimplementations + their defining guarantees."""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq

from connect_spark.queries.analytics import (
    CM_DEPTH, CM_WIDTH, HLL_M, sketch_countmin_freq, sketch_hll_distinct)
from tests.conftest import SF_SMALL


def _events(sf_dir: str):
    tbl = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["user_id", "event_type"])
    return list(zip(tbl.column("user_id").to_pylist(),
                    tbl.column("event_type").to_pylist()))


def test_countmin_matches_local_and_never_underestimates(spark):
    rows = _events(SF_SMALL)

    def cols(uid):
        h = hashlib.md5(f"cm:{uid}".encode()).hexdigest()
        return [int(h[4 * j:4 * j + 4], 16) % CM_WIDTH
                for j in range(CM_DEPTH)]

    sketch: dict[tuple[int, int], int] = {}
    truth: dict[int, int] = {}
    for uid, _ in rows:
        truth[uid] = truth.get(uid, 0) + 1
        for j, c in enumerate(cols(uid)):
            sketch[(j, c)] = sketch.get((j, c), 0) + 1
    want = {}
    for uid, t in truth.items():
        if uid % 20 != 0:
            continue
        est = min(sketch[(j, c)] for j, c in enumerate(cols(uid)))
        want[uid] = (t, est, est - t)

    got = {
        r["user_id"]: (r["true_count"], r["cm_estimate"],
                       r["overestimate"])
        for r in sketch_countmin_freq(spark, SF_SMALL).collect()
    }
    assert got == want
    for t, est, over in got.values():
        assert est >= t and over >= 0   # the CM guarantee


def test_hll_matches_local_and_error_bound(spark):
    rows = _events(SF_SMALL)
    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set[int]] = {}
    for uid, et in rows:
        h = hashlib.md5(str(uid).encode()).hexdigest()
        idx = int(h[:2], 16)
        v = int(h[2:15], 16)      # 52 bits
        rho = 53 - v.bit_length() if v else 53
        r = regs.setdefault(et, {})
        r[idx] = max(r.get(idx, 0), rho)
        exact.setdefault(et, set()).add(uid)

    want = {}
    for et, r in regs.items():
        s = sum(1 << (53 - m) for m in r.values())
        s += (HLL_M - len(r)) * (1 << 53)
        n_zero = HLL_M - len(r)
        raw = (0.7213 / (1.0 + 1.079 / 256.0) * HLL_M * HLL_M
               * float(1 << 53) / float(s))
        if n_zero > 0 and raw <= 2.5 * HLL_M:
            est = math.floor(HLL_M * math.log(HLL_M / n_zero))
        else:
            est = math.floor(raw)
        want[et] = (len(exact[et]), s, n_zero, est)

    got = {
        r["event_type"]: (r["exact_distinct"], r["reg_harmonic_sum"],
                          r["n_zero_registers"], r["hll_estimate"])
        for r in sketch_hll_distinct(spark, SF_SMALL).collect()
    }
    assert got == want
    for exact_n, _s, _z, est in got.values():
        # HLL standard error is 1.04/sqrt(m) ~ 6.5%; allow 4 sigma
        assert abs(est - exact_n) <= max(4, 0.26 * exact_n)


def test_binned_quantiles_within_bin_width_of_exact(spark):
    from connect_spark.queries.analytics import (
        QB_WIDTH_CENTS, sketch_binned_quantiles)

    tbl = pq.read_table(f"{SF_SMALL}/events.parquet",
                        columns=["event_type", "value"])
    by_type: dict[str, list[int]] = {}
    for et, v in zip(tbl.column("event_type").to_pylist(),
                     tbl.column("value").to_pylist()):
        by_type.setdefault(et, []).append(round(v * 100))
    rows = sketch_binned_quantiles(spark, SF_SMALL).collect()
    assert {r["event_type"] for r in rows} == set(by_type)
    for r in rows:
        vals = sorted(by_type[r["event_type"]])
        n = len(vals)
        assert r["n_events"] == n
        for p_num, p_den, col in ((1, 2, "p50_est_cents"),
                                  (19, 20, "p95_est_cents"),
                                  (99, 100, "p99_est_cents")):
            k = (n * p_num + p_den - 1) // p_den   # ceil(p*n)
            exact = vals[k - 1]
            est = r[col]
            # estimate = upper edge of the bin holding the k-th value
            assert est >= exact
            assert est - exact < QB_WIDTH_CENTS


def test_sketch_mergeability_merged_equals_direct(spark):
    from connect_spark.queries.analytics import (
        sketch_hll_distinct, sketch_hll_merged, sketch_kmv_distinct,
        sketch_kmv_merged)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(sketch_kmv_merged(spark, SF_SMALL)) == rows(
        sketch_kmv_distinct(spark, SF_SMALL))
    assert rows(sketch_hll_merged(spark, SF_SMALL)) == rows(
        sketch_hll_distinct(spark, SF_SMALL))
