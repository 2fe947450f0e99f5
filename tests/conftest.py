from __future__ import annotations

import os
import tempfile

import pytest

# Test scratch (tmp_path, mkdtemp) on tmpfs: this tenancy's disk probes
# 12-90 MB/s with multi-minute degradation bursts (SCALE.md), and the
# suite's table-roundtrip tests (iceberg, CDC, migrator) are otherwise
# device-bound.  Only applied when the caller hasn't pinned TMPDIR and
# /dev/shm is writable; test semantics are unchanged — the same files
# are written, to RAM.
if "TMPDIR" not in os.environ and os.path.isdir("/dev/shm") \
        and os.access("/dev/shm", os.W_OK):
    _scratch = "/dev/shm/connect_spark_test_scratch"
    os.makedirs(_scratch, exist_ok=True)
    os.environ["TMPDIR"] = _scratch
    tempfile.tempdir = None  # re-resolve gettempdir() from TMPDIR

from connect_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("connect_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 runs the parity gate at
    # the driver's correctness scale factor.
    return os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMALL)
