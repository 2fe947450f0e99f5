"""rate_limit resources (state/ratelimit.py) + pipeline throttle."""

from __future__ import annotations

import time

import pytest

from connect_spark.plans.pipeline import build_pipeline
from connect_spark.sources.http_client import http_poll
from connect_spark.state.ratelimit import (
    LocalRateLimit,
    clear_rate_limits,
    get_rate_limit,
    register_rate_limit,
)


@pytest.fixture(autouse=True)
def _clean():
    clear_rate_limits()
    yield
    clear_rate_limits()


def test_access_within_budget_is_free():
    rl = LocalRateLimit(count=3, interval="1s")
    assert rl.access() == 0.0
    assert rl.access(2) == 0.0
    delay = rl.access()  # 4th in the window
    assert 0.0 < delay <= 1.0


def test_window_resets():
    rl = LocalRateLimit(count=2, interval="100ms")
    assert rl.access(2) == 0.0
    assert rl.access() > 0.0
    time.sleep(0.12)
    assert rl.access() == 0.0


def test_wait_paces_to_rate():
    rl = LocalRateLimit(count=5, interval="100ms")
    start = time.monotonic()
    total = 0
    for _ in range(4):
        rl.wait(5)  # 20 tokens at 5/100ms → ≥3 window waits
        total += 5
    elapsed = time.monotonic() - start
    assert elapsed >= 0.25  # at least 3 full windows beyond the first


def test_oversized_request_granted_in_installments():
    rl = LocalRateLimit(count=2, interval="50ms")
    slept = rl.wait(5)  # needs 3 windows
    assert slept >= 0.08


def test_registry_and_validation():
    register_rate_limit("api", {"local": {"count": 7, "interval": "2s"}})
    rl = get_rate_limit("api")
    assert rl.count == 7 and rl.interval == "2s"
    with pytest.raises(KeyError):
        get_rate_limit("nope")
    # redis is a supported kind now (count/interval window; url
    # validated) — unknown kinds still reject
    rl_redis = register_rate_limit(
        "redis_rl", {"redis": {"url": "redis://h", "count": 3}})
    assert rl_redis.count == 3
    with pytest.raises(ValueError):
        register_rate_limit("bogus_rl", {"etcd": {}})
    with pytest.raises(ValueError):
        LocalRateLimit(count=0)


def test_pipeline_rate_limit_processor(spark, sf_dir):
    config = {
        "rate_limit_resources": [
            {"label": "slow", "local": {"count": 3, "interval": "200ms"}}
        ],
        "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
        "pipeline": {"processors": [{"rate_limit": {"resource": "slow"}}]},
    }
    pipe = build_pipeline(spark, config)
    df = pipe.dataframe().coalesce(1)
    start = time.monotonic()
    assert df.count() == 5
    # 5 rows at 3/200ms on one worker → at least one window wait
    assert time.monotonic() - start >= 0.15


def test_http_poll_honors_rate_limit(spark):
    register_rate_limit("api", {"local": {"count": 2, "interval": "150ms"}})
    calls = []

    def transport(req):
        calls.append(time.monotonic())
        return {"status": 200, "headers": {}, "body": "ok"}

    conf = {"url": "http://unit.test/x", "rate_limit": "api"}
    df = http_poll(spark, conf, transport, n_polls=4)
    assert df.count() == 4
    # 4 polls at 2/150ms → the 3rd call starts a new window
    assert calls[2] - calls[0] >= 0.12
