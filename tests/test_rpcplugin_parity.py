"""Wire-framing parity fuzz: ndjson vs arrow rpcplugin protocols
(r13 verdict task #7 — promote the manual A/B setup cross-check in
scripts/ab_rpcplugin_arrow.py into the suite).

Two REAL child processes implement the SAME transform — one speaking
the NDJSON protocol (per-row JSON messages, generic seam + typed
projection), one speaking `protocol: arrow` (JSON header +
binary Arrow-IPC bodies, typed end-to-end).  Hypothesis generates
batch contents and config values; both processors must produce
identical typed output, including the error/backoff and
crash-restart paths.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from connect_spark.plans.pipeline import PROCESSORS
from connect_spark.plans.rpcplugin import (
    discover_and_register_plugins,
)

_SCHEMA = ("doc_id BIGINT, out_text STRING, n_chars BIGINT, "
           "score DOUBLE")

# The shared transform (textually identical in both children):
#   out_text = text.upper() + suffix
#   n_chars  = len(text) + bias
#   score    = len(text) * mult
# plus three fault knobs: backoff_first (reply a backoff error for
# the first N process_batch calls), crash_marker (exit(1) once,
# sentinel file), fail_always (permanent non-backoff error).

_NDJSON_CHILD = '''\
import json, os, sys
CFG = {}
N_CALLS = 0
for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    res, err = {}, None
    if m == "init":
        CFG.update(p.get("config") or {})
    elif m == "process_batch":
        if CFG.get("fail_always"):
            err = {"message": "boom: permanent tool failure"}
        else:
            marker = CFG.get("crash_marker") or ""
            if marker and not os.path.exists(marker):
                open(marker, "w").write("x")
                sys.exit(1)
            N_CALLS += 1
            if N_CALLS <= int(CFG.get("backoff_first") or 0):
                err = {"message": "busy",
                       "detail": {"backoff_ms": 1}}
            else:
                out = []
                for msg in (p.get("batch") or {}).get(
                        "messages") or []:
                    doc = msg["structured"]
                    text = doc.get("text") or ""
                    out.append({"structured": {
                        "doc_id": doc["doc_id"],
                        "out_text": text.upper() + CFG.get(
                            "suffix", ""),
                        "n_chars": len(text) + int(CFG.get(
                            "bias") or 0),
                        "score": len(text) * float(CFG.get(
                            "mult") or 1.0),
                    }, "metadata": {}})
                res = {"batches": [{"messages": out}]}
    sys.stdout.write(json.dumps(
        {"id": rid, "result": res, "error": err}) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
'''

_ARROW_CHILD = '''\
import json, os, sys
import pyarrow as pa

stdin, stdout = sys.stdin.buffer, sys.stdout.buffer
CFG = {}
N_CALLS = 0


def reply(rid, result=None, error=None, body=None):
    hdr = {"id": rid, "result": result, "error": error}
    payload = b""
    if body is not None:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, body.schema) as w:
            w.write_table(body)
        payload = sink.getvalue().to_pybytes()
        hdr["body_len"] = len(payload)
    stdout.write(json.dumps(hdr).encode() + b"\\n")
    if payload:
        stdout.write(payload)
    stdout.flush()


while True:
    line = stdin.readline()
    if not line:
        break
    hdr = json.loads(line)
    rid, m = hdr["id"], hdr["method"]
    body = None
    n = int(hdr.get("body_len") or 0)
    if n:
        body = pa.ipc.open_stream(stdin.read(n)).read_all()
    if m == "init":
        CFG.update((hdr.get("params") or {}).get("config") or {})
        reply(rid, result={})
    elif m == "process_batch":
        if CFG.get("fail_always"):
            reply(rid, error={
                "message": "boom: permanent tool failure"})
            continue
        marker = CFG.get("crash_marker") or ""
        if marker and not os.path.exists(marker):
            open(marker, "w").write("x")
            sys.exit(1)
        N_CALLS += 1
        if N_CALLS <= int(CFG.get("backoff_first") or 0):
            reply(rid, error={"message": "busy",
                              "detail": {"backoff_ms": 1}})
            continue
        ids, texts = [], []
        for rec in body.to_pylist():
            ids.append(rec["doc_id"])
            texts.append(rec.get("text") or "")
        out = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "out_text": pa.array(
                [t.upper() + CFG.get("suffix", "") for t in texts],
                pa.string()),
            "n_chars": pa.array(
                [len(t) + int(CFG.get("bias") or 0) for t in texts],
                pa.int64()),
            "score": pa.array(
                [len(t) * float(CFG.get("mult") or 1.0)
                 for t in texts], pa.float64()),
        })
        reply(rid, result={}, body=out)
    else:
        reply(rid, result={})
        if m == "close":
            break
'''

_FIELDS = """\
fields:
  - name: suffix
    type: string
    default: ""
  - name: bias
    type: int
    default: 0
  - name: mult
    type: float
    default: 1.0
  - name: backoff_first
    type: int
    default: 0
  - name: crash_marker
    type: string
    default: ""
  - name: fail_always
    type: bool
    default: false
"""


@pytest.fixture(scope="module")
def plugin_pair():
    """Register one ndjson + one arrow processor plugin (fresh names
    per test session to dodge the duplicate-name guard)."""
    tag = uuid.uuid4().hex[:8]
    td = tempfile.mkdtemp(prefix="parity_plugins_")
    names = {}
    for proto, child in (("ndjson", _NDJSON_CHILD),
                         ("arrow", _ARROW_CHILD)):
        name = f"parity_{proto}_{tag}"
        pdir = os.path.join(td, name)
        os.makedirs(pdir)
        with open(os.path.join(pdir, "main.py"), "w",
                  encoding="utf-8") as fh:
            fh.write(child)
        import sys as _sys
        with open(os.path.join(pdir, "plugin.yaml"), "w",
                  encoding="utf-8") as fh:
            fh.write(
                f"name: {name}\n"
                f"type: processor\n"
                f"protocol: {proto}\n"
                f"command: [{_sys.executable}, main.py]\n"
                f'output_schema: "{_SCHEMA}"\n'
                + _FIELDS)
        discover_and_register_plugins(
            [os.path.join(pdir, "plugin.yaml")])
        names[proto] = name
    return names


def _df(spark, texts):
    # one slice at the SOURCE: createDataFrame over a local list
    # parallelizes to defaultParallelism slices, and coalesce(1) still
    # evaluates every empty source slice through its own Python-worker
    # round trip per action (the r16 testrunner measurement)
    rdd = spark.sparkContext.parallelize(
        [(i, t) for i, t in enumerate(texts)], 1)
    return spark.createDataFrame(rdd, "doc_id BIGINT, text STRING")


def _collect(df):
    rows = [(r.doc_id, r.out_text, r.n_chars, r.score)
            for r in df.collect()]
    return sorted(rows), [f.dataType.simpleString()
                          for f in df.schema.fields]


# ------------------------------------------------------------------
# the fuzz: generated batches + config through both wires
# ------------------------------------------------------------------


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    texts=st.lists(st.text(max_size=40), min_size=1, max_size=10),
    suffix=st.text(
        alphabet=st.characters(codec="utf-8",
                               blacklist_categories=("Cs",)),
        max_size=5),
    bias=st.integers(-1000, 1000),
    mult=st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e6, max_value=1e6),
)
def test_framing_parity_fuzz(spark, plugin_pair, texts, suffix,
                             bias, mult):
    conf = {"suffix": suffix, "bias": bias, "mult": mult}
    df = _df(spark, texts)
    nd_rows, nd_types = _collect(
        PROCESSORS[plugin_pair["ndjson"]](df, dict(conf)))
    ar_rows, ar_types = _collect(
        PROCESSORS[plugin_pair["arrow"]](df, dict(conf)))
    assert nd_types == ar_types
    assert nd_rows == ar_rows
    # and both actually computed the transform, not an echo
    assert nd_rows[0][1] == (texts[0].upper() + suffix)


# ------------------------------------------------------------------
# fault-path parity
# ------------------------------------------------------------------


def test_backoff_path_parity(spark, plugin_pair):
    """Both wires honor plugin-requested backoff_ms and converge to
    the same output after the child stops signaling busy."""
    df = _df(spark, ["alpha", "beta"])
    conf = {"suffix": "!", "backoff_first": 3}
    nd = _collect(PROCESSORS[plugin_pair["ndjson"]](df, dict(conf)))
    ar = _collect(PROCESSORS[plugin_pair["arrow"]](df, dict(conf)))
    assert nd == ar
    assert nd[0][0][1] == "ALPHA!"


def test_crash_restart_parity(spark, plugin_pair, tmp_path):
    """Both wires restart a crashed child (exit(1) mid-batch) and
    re-send the batch; the final outputs are identical."""
    results = {}
    for proto in ("ndjson", "arrow"):
        marker = str(tmp_path / f"crash_{proto}")
        df = _df(spark, ["survive", "the", "restart"])
        results[proto] = _collect(
            PROCESSORS[plugin_pair[proto]](
                df, {"crash_marker": marker}))
        assert os.path.exists(marker)  # the crash really happened
    assert results["ndjson"] == results["arrow"]
    assert results["ndjson"][0][0][1] == "SURVIVE"


def test_permanent_failure_parity(spark, plugin_pair):
    """A non-backoff plugin error fails the job on BOTH wires (no
    silent row drops), with the child's message surfaced."""
    df = _df(spark, ["x"])
    for proto in ("ndjson", "arrow"):
        out = PROCESSORS[plugin_pair[proto]](df, {"fail_always": True})
        with pytest.raises(Exception, match="boom"):
            out.collect()
