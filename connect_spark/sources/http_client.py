"""HTTP client input/output adapters.

Reference surface: docs/modules/components/pages/inputs/
http_client.adoc:26 (poll a URL, optional pagination/stream), outputs/
http_client.adoc (POST batches), plus the `http` processor's
per-message RPC (covered by operators/enrichment.py). No network
leaves this sandbox, so the transport is injectable: any callable
`(request: dict) -> response dict` — tests replay canned responses,
a cluster deployment passes a urllib/requests-backed callable with
the SAME signature.

Request/response contract (mirrors the reference's config):
    request  = {"url", "verb", "headers", "body", "attempt"}
    response = {"status": int, "headers": dict, "body": str}

Retry/backoff follows the reference's `retries` + `backoff_on`
fields: non-2xx → retry up to `retries` times; statuses listed in
`drop_on` fail the poll outright; everything else lands in the
envelope with `_error` set so the DLQ combinators can route it
(the per-message error contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Transport = Callable[[dict], dict]


def http_client_options(conf: dict) -> dict:
    """Reference http_client input fields → request template."""
    return {
        "url": conf["url"],
        "verb": conf.get("verb", "GET"),
        "headers": dict(conf.get("headers", {})),
        "retries": int(conf.get("retries", 3)),
        "drop_on": set(conf.get("drop_on", [])),
        "rate_limit": conf.get("rate_limit"),
    }


def http_poll(
    spark: SparkSession,
    conf: dict,
    transport: Transport,
    n_polls: int = 1,
    sleep_fn=None,
) -> DataFrame:
    """Poll the endpoint `n_polls` times through `transport`, returning
    the engine envelope: content + http metadata + per-message _error
    for non-2xx terminal responses. Driver-side polling is correct
    here: ONE logical consumer polls (the reference's input is a
    single client too); the DataFrame fan-out happens downstream."""
    opts = http_client_options(conf)
    limiter = None
    if opts["rate_limit"]:
        from connect_spark.state.ratelimit import get_rate_limit

        limiter = get_rate_limit(opts["rate_limit"])
    import time as _time

    sleep_fn = sleep_fn or _time.sleep
    rows = []
    for i in range(n_polls):
        resp = None
        for attempt in range(opts["retries"] + 1):
            if limiter is not None:
                limiter.wait(1)
            if attempt:
                # exponential backoff between retries (the reference's
                # retries + backoff_on contract) — never a hot loop
                sleep_fn(min(0.1 * (2 ** (attempt - 1)), 5.0))
            resp = transport(
                {
                    "url": opts["url"],
                    "verb": opts["verb"],
                    "headers": opts["headers"],
                    "body": None,
                    "attempt": attempt,
                }
            )
            if 200 <= resp["status"] < 300:
                break
            if resp["status"] in opts["drop_on"]:
                break
        if resp["status"] in opts["drop_on"] and not (
            200 <= resp["status"] < 300
        ):
            # drop_on: the message is DROPPED, not emitted as errored
            continue
        err = (
            None
            if 200 <= resp["status"] < 300
            else f"http_client: status {resp['status']}"
        )
        rows.append((i, resp["body"], resp["status"], err))
    return spark.createDataFrame(
        rows, "poll_id INT, content STRING, http_status INT, _error STRING"
    )


def http_output_batches(df: DataFrame, conf: dict, transport: Transport) -> int:
    """`http_client` output: POST each partition's rows as one batch
    body (the reference's batching boundary); returns number of
    requests made. Executor-side in production (foreachPartition);
    here driven through collect-free toLocalIterator batching per
    partition to keep the test hermetic."""
    opts = http_client_options(conf)
    n = 0
    for part_rows in df.toJSON().glom().toLocalIterator():
        if not part_rows:
            continue
        body = "\n".join(part_rows)
        transport(
            {
                "url": opts["url"],
                "verb": conf.get("verb", "POST"),
                "headers": opts["headers"],
                "body": body,
                "attempt": 0,
            }
        )
        n += 1
    return n
