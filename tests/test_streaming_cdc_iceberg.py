"""streaming_cdc_to_iceberg must converge to exactly the batch
materialization (cdc_materialize_orders) — stream/batch equivalence
of the full CDC -> Iceberg MERGE pipeline."""

from __future__ import annotations

from connect_spark.queries.cdc import cdc_materialize_orders
from connect_spark.queries.streaming_q import streaming_cdc_to_iceberg
from tests.conftest import SF_SMALL


def test_stream_matches_batch_materialization(spark):
    got = {
        r["o_orderkey"]: (r["src_op"], r["status"], r["price"])
        for r in streaming_cdc_to_iceberg(spark, SF_SMALL).collect()
    }
    want = {
        r["o_orderkey"]: (r["src_op"], r["status"], r["price"])
        for r in cdc_materialize_orders(spark, SF_SMALL).collect()
    }
    assert got == want
    assert len(got) > 0
    # deletes actually removed
    assert all(k % 13 != 0 for k in got)
    # updates won over snapshot/insert
    assert all(v[0] == "update" for k, v in got.items() if k % 5 == 0)
