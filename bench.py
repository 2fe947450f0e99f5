#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries"
(per-query sec), "sf"}.

Each query is materialized through the noop sink (full computation,
all columns, no driver collect) — the closest local analogue to
writing results out on a cluster. A warmup pass initializes the JVM /
codegen so measured numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import re
import time

from connect_spark.queries import all_queries
from connect_spark.session import get_spark


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("connect_spark_bench")

    specs = [s for s in all_queries() if s.headline]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    # Warmup: JVM, codegen, parquet footer caches.
    warm = specs[0].fn(spark, sf_dir)
    materialize(warm)

    # Median of `runs` passes per query: single-run wall time on this
    # shared host carries ±40% noise (SCALE.md), which round 2 showed
    # can fabricate phantom regressions.  Passes are interleaved
    # (run 1 of all queries, then run 2, ...) so a transient host
    # stall hits one pass of many queries, not all passes of one.
    samples: dict[str, list[float]] = {s.name: [] for s in specs}
    for _ in range(runs):
        for spec in specs:
            t0 = time.perf_counter()
            materialize(spec.fn(spark, sf_dir))
            samples[spec.name].append(time.perf_counter() - t0)
            # queries that persist() intermediates (pagerank, triangle
            # projection) never see the final action inside their own
            # call, so their cached plans would otherwise accumulate
            # executor storage across the whole bench run (round-10
            # ADVICE). Outside the timed region.
            spark.catalog.clearCache()

    timings = {name: round(_median(ts), 3) for name, ts in samples.items()}
    total = round(sum(timings.values()), 3)

    # Throughput headlines comparable to BASELINE.md's connector
    # numbers (migrator GB/s, CDC MB/s): byte- and row-rates, not
    # query wall-time.
    throughput = _throughput(spark, sf_dir, runs)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs": runs,
                "stat": "median",
                "throughput": throughput,
            }
        )
    )


def _median(xs: list) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _tree_cpu_seconds() -> float:
    """CPU seconds (user+sys) consumed by this process AND all live
    descendants (the py4j JVM does the migrator work) — read from
    /proc so no psutil dependency. Used to normalize the migrator
    code series into MB per busy-core-second, a host-contention-
    independent number (r14 verdict task #4). Returns 0.0 where
    /proc is unavailable (the caller then skips the metric)."""
    try:
        clk = os.sysconf("SC_CLK_TCK")
    except (AttributeError, ValueError, OSError):
        return 0.0
    me = os.getpid()
    ppid: dict[int, int] = {}
    cpu: dict[int, float] = {}
    try:
        pids = [int(d) for d in os.listdir("/proc") if d.isdigit()]
    except OSError:
        return 0.0
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat", "rb") as fh:
                raw = fh.read().decode("ascii", "replace")
        except OSError:
            continue
        # comm may contain spaces/parens: fields after the LAST ')'
        rest = raw.rsplit(")", 1)[-1].split()
        ppid[pid] = int(rest[1])
        cpu[pid] = (int(rest[11]) + int(rest[12])) / clk
    total = cpu.get(me, 0.0)
    # walk descendants (children map from ppid relation)
    kids: dict[int, list[int]] = {}
    for pid, par in ppid.items():
        kids.setdefault(par, []).append(pid)
    stack = list(kids.get(me, []))
    while stack:
        pid = stack.pop()
        total += cpu.get(pid, 0.0)
        stack.extend(kids.get(pid, []))
    return total


def _disk_probe_mb_s(mib: int = 256) -> float:
    """Host disk health: fsync'd sequential write rate (MB/s) to the
    same tmp device the migrator harness copies through.  The migrator
    numbers are device-bound (r11 host: 1171 MB/s on an NVMe-class
    disk; r12: 169 MB/s on a 24 MB/s device with byte-identical code),
    so the bench records the denominator — readers normalize
    migrator_mb_s against this probe instead of comparing raw walls
    across hosts (r12 verdict task #1)."""
    import tempfile

    chunk = os.urandom(1 << 20) * 4  # 4 MiB of incompressible bytes
    fd, path = tempfile.mkstemp(prefix="bench_diskprobe_")
    try:
        t0 = time.perf_counter()
        with os.fdopen(fd, "wb") as f:
            for _ in range(mib // 4):
                f.write(chunk)
            f.flush()
            os.fsync(f.fileno())
        dt = time.perf_counter() - t0
    finally:
        try:
            os.remove(path)
        except OSError:
            pass
    return round(mib / dt, 1)


def _fsync_tree(path: str) -> None:
    """fsync every file (and directory entry) under `path` — the
    disk-staged migrator arm calls this INSIDE the timed window so
    "disk" means the device, not the page cache (r13 verdict task #1:
    the frozen r13 JSON reported disk 831.8 > tmpfs 489.4 MB/s on a
    19 MB/s device — physically impossible; the un-fsync'd arm was
    measuring cache)."""
    for root, _dirs, files in os.walk(path):
        for fn in files:
            fd = os.open(os.path.join(root, fn), os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        fd = os.open(root, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)


def _throughput(spark, sf_dir: str, runs: int = 1) -> dict:
    """Two rates: (1) migrator-style file->file copy of the documents
    table (bytes/s over the decoded payload, the baseline's unit);
    (2) CDC apply — change-log rows/s through the last-writer-wins
    materialization (cdc_materialize_orders's plan).

    Label semantics (r13 verdict task #1):
      - migrator_shm_mb_s   — tmpfs-staged copy: the CODE metric
        (scan + shuffle-free write + parquet codec, device excluded).
        This is the BASELINE.md-comparable series.
      - migrator_mb_s       — disk-staged copy with every output
        byte fsync'd inside the clock: the device-inclusive metric.
        By construction <= the shm series.  SKIPPED (with
        migrator_disk_skipped explaining why) when the host probe is
        under 50 MB/s — on a single-digit-MB/s device the number is
        100% denominator and disk_probe_mb_s already reports that.
      - disk_probe_mb_s     — raw fsync'd sequential write rate of
        the tmp device (the denominator readers normalize against).
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from connect_spark.catalog import load_table
    from connect_spark.queries.cdc import cdc_materialize_orders

    probe = _disk_probe_mb_s()
    out: dict = {"disk_probe_mb_s": probe}

    # Migrator: READ→WRITE copy of sf-scaled ~1KB messages (the
    # baseline's unit — 30M x 1KB msgs at 1.0 GB/s,
    # redpanda-migrator.md). Round-4 verdict task #6: the workload is
    # staged to parquet ONCE (untimed), then the timed loop copies
    # source→dest so both the read and write sides are measured; and
    # each payload is 32 DISTINCT md5 blocks (chained ids), not one
    # block repeated 32x — self-repetition was pathologically
    # compressible and flattered the bytes/s.
    m = re.search(r"sf([0-9.]+)", sf_dir)
    n_msgs = max(100_000, int(10_000_000 * (float(m.group(1)) if m else 0.01)))
    msgs = spark.range(n_msgs).select(
        F.col("id"),
        F.concat_ws(
            "",
            *[
                F.md5((F.col("id") * 32 + j).cast("string"))
                for j in range(32)
            ],
        ).alias("payload"),
    )

    # Primary (code) series: staged through tmpfs so the number
    # measures scan + shuffle-free write + parquet codec, not the
    # host disk (r11 1171 → r12 169 MB/s was entirely the device; a
    # shm series would have shown flat).  The passthrough twin
    # (streaming/migrator.py::migrate_files_passthrough — same bytes
    # moved format-identical, no decode) rides the same staging and
    # is reported ALONGSIDE, never instead.
    from connect_spark.streaming.migrator import (
        migrate_files_passthrough,
    )

    shm = "/dev/shm"
    stage_dir = None
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        try:
            if shutil.disk_usage(shm).free > n_msgs * 1032 * 3:
                stage_dir = shm
        except OSError:
            pass
    stmp = tempfile.mkdtemp(prefix="bench_migrate_", dir=stage_dir)
    on_shm = stage_dir is not None
    try:
        msgs.write.mode("overwrite").parquet(stmp + "/src")
        ssrc = spark.read.parquet(stmp + "/src")
        shm_ts, pt_ts, cpu_ds = [], [], []
        for _ in range(runs):
            c0 = _tree_cpu_seconds()
            t0 = time.perf_counter()
            ssrc.write.mode("overwrite").parquet(stmp + "/out")
            shm_ts.append(time.perf_counter() - t0)
            cpu_ds.append(_tree_cpu_seconds() - c0)
            t0 = time.perf_counter()
            migrate_files_passthrough(spark, stmp + "/src",
                                      stmp + "/pt")
            pt_ts.append(time.perf_counter() - t0)
        rate = round(n_msgs * 1032 / _median(shm_ts) / 1e6, 1)
        key = "migrator_shm_mb_s" if on_shm else "migrator_tmp_mb_s"
        out[key] = rate
        out["migrator_msg_s"] = round(n_msgs / _median(shm_ts))
        out["migrator_passthrough_mb_s"] = round(
            n_msgs * 1032 / _median(pt_ts) / 1e6, 1)
        cpu = _median(cpu_ds)
        if cpu > 0:
            # host-independent normalization (r14 verdict task #4):
            # MB per busy-core-second across the whole process tree
            # (python driver + JVM). A contended tenancy stretches
            # wall time but not CPU-seconds of the same CPU-bound
            # copy, so this series is comparable across hosts.
            out["migrator_code_mb_per_core_s"] = round(
                n_msgs * 1032 / cpu / 1e6, 1)
    finally:
        shutil.rmtree(stmp, ignore_errors=True)

    # Device-inclusive series: disk-staged, outputs fsync'd INSIDE
    # the clock.  Only meaningful on a healthy device — below
    # 50 MB/s the copy is pure device wait (~100x the code time) and
    # disk_probe_mb_s already reports the device.
    if probe >= 50.0:
        tmp = tempfile.mkdtemp(prefix="bench_migrate_")
        try:
            msgs.write.mode("overwrite").parquet(tmp + "/src")
            src = spark.read.parquet(tmp + "/src")
            copy_ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                src.write.mode("overwrite").parquet(tmp + "/out")
                _fsync_tree(tmp + "/out")
                copy_ts.append(time.perf_counter() - t0)
            out["migrator_mb_s"] = round(
                n_msgs * 1032 / _median(copy_ts) / 1e6, 1)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    else:
        # keep the key present (null) so downstream consumers keyed
        # on migrator_mb_s see an explicit skip, not a KeyError
        # (r14 ADVICE #5); pre-r14 disk numbers were un-fsync'd
        # page-cache rates and are NOT comparable to this series.
        out["migrator_mb_s"] = None
        out["migrator_disk_skipped"] = (
            f"device probe {probe} MB/s < 50 — disk arm is pure "
            "device wait; see disk_probe_mb_s + migrator_shm_mb_s")

    cdc_df = cdc_materialize_orders(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    # exact change-log size: every order appears once as read/insert,
    # plus an update for %5 keys and a delete for %13 keys
    n_changes = orders.select(
        F.sum(
            F.lit(1)
            + (F.col("o_orderkey") % 5 == 0).cast("int")
            + (F.col("o_orderkey") % 13 == 0).cast("int")
        ).alias("n")
    ).collect()[0]["n"]
    cdc_ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        materialize(cdc_df)
        cdc_ts.append(time.perf_counter() - t0)
    out["cdc_apply_rows_s"] = round(n_changes / _median(cdc_ts))
    return out


if __name__ == "__main__":
    main()
