"""A/B: rpcplugin wire framing at volume (r12 verdict task #5).

Three arms over the same documents replica, all producing the gate's
(doc_id, head_rev, n_upper, text_chars) output through a REAL child
process per partition stream:

  ndjson        — the default protocol: per-row JSON messages,
                  base64 for bytes, generic (content, metadata) seam
                  + typed projection (the r12 gate's exact path)
  arrow_rowloop — protocol: arrow (binary Arrow-IPC bodies), child
                  still transforms row-at-a-time python — isolates
                  the FRAMING cost
  arrow_vector  — protocol: arrow, child uses pyarrow.compute — the
                  idiomatic columnar child the protocol enables

Usage: python scripts/ab_rpcplugin_arrow.py [replica_dir] [runs]
       [row_mult]
Default replica: /tmp/scalebench/16x (built by scale_measure.py);
row_mult explodes each document row N-fold (salted doc_id) to push
past the child-spawn floor and expose the per-row framing term.
Prints one JSON line per (arm, run) + a median summary.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_NDJSON_CHILD = '''\
import base64, json, sys
CFG = {}
for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    res = {}
    if m == "init":
        CFG.update(p.get("config") or {})
    elif m == "process_batch":
        out = []
        for msg in (p.get("batch") or {}).get("messages") or []:
            doc = msg["structured"]
            text = doc.get("text") or ""
            out.append({"structured": {
                "doc_id": doc["doc_id"],
                "head_rev": text[:12][::-1] + CFG.get("tag", ""),
                "n_upper": sum(1 for c in text if c.isupper()
                               and c.isascii()),
                "text_chars": len(text),
            }, "metadata": {}})
        res = {"batches": [{"messages": out}]}
    sys.stdout.write(json.dumps(
        {"id": rid, "result": res, "error": None}) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
'''

_ARROW_CHILD_COMMON = '''\
import json, sys
import pyarrow as pa

stdin = sys.stdin.buffer
stdout = sys.stdout.buffer
CFG = {}


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
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    n = int(req.get("body_len") or 0)
    tbl = pa.ipc.open_stream(stdin.read(n)).read_all() if n else None
    if m == "init":
        CFG.update(p.get("config") or {})
        reply(rid, {})
    elif m == "process_batch":
        reply(rid, {}, None, transform(tbl))
    elif m == "close":
        reply(rid, {})
        break
    else:
        reply(rid, {})
'''

_ARROW_ROWLOOP = '''\
def transform(tbl):
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    head, nup, chars = [], [], []
    tag = CFG.get("tag", "")
    for t in texts:
        t = t or ""
        head.append(t[:12][::-1] + tag)
        nup.append(sum(1 for c in t if c.isupper() and c.isascii()))
        chars.append(len(t))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "head_rev": head,
        "n_upper": pa.array(nup, pa.int32()),
        "text_chars": pa.array(chars, pa.int32()),
    })


''' + _ARROW_CHILD_COMMON

_ARROW_VECTOR = '''\
import pyarrow.compute as pc


def transform(tbl):
    text = pc.coalesce(tbl.column("text"), pa.scalar(""))
    head = pc.binary_join_element_wise(
        pc.utf8_reverse(pc.utf8_slice_codeunits(text, 0, 12)),
        CFG.get("tag", ""), "")
    nup = pc.cast(pc.utf8_length(
        pc.replace_substring_regex(text, "[^A-Z]", "")), pa.int32())
    chars = pc.cast(pc.utf8_length(text), pa.int32())
    return pa.table({
        "doc_id": tbl.column("doc_id"),
        "head_rev": head,
        "n_upper": nup,
        "text_chars": chars,
    })


''' + _ARROW_CHILD_COMMON


def main() -> None:
    replica = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/scalebench/16x"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from connect_spark.plans.rpcplugin import (
        make_processor_plugin, parse_manifest)
    from connect_spark.session import get_spark

    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark("ab_rpcplugin_arrow")
    docs = spark.read.parquet(
        os.path.join(replica, "documents.parquet")).select(
        "doc_id", "text")
    if mult > 1:
        from pyspark.sql import functions as F

        docs = docs.withColumn(
            "c", F.explode(F.sequence(F.lit(1), F.lit(mult)))
        ).select(
            (F.col("doc_id") * mult + F.col("c")).alias("doc_id"),
            "text")
    n_docs = docs.count()  # also warms the scan

    pdir = tempfile.mkdtemp(prefix="ab_rpc_")
    arms = {}
    for arm, (src, extra) in {
        "ndjson": (_NDJSON_CHILD, {}),
        "arrow_rowloop": (_ARROW_ROWLOOP, {"protocol": "arrow"}),
        "arrow_vector": (_ARROW_VECTOR, {"protocol": "arrow"}),
    }.items():
        path = os.path.join(pdir, f"{arm}.py")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(src)
        arms[arm] = parse_manifest({
            "name": f"ab_{arm}",
            "command": [sys.executable, path],
            "type": "processor",
            "fields": [{"name": "tag", "type": "string",
                        "default": ""}],
            "output_schema": ("doc_id BIGINT, head_rev STRING, "
                              "n_upper INT, text_chars INT"),
            **extra,
        })

    # correctness cross-check before timing: all arms agree
    samples = {}
    for arm, manifest in arms.items():
        out = make_processor_plugin(manifest)(
            docs.filter("doc_id % 997 = 0"), {"tag": "|ab"})
        samples[arm] = sorted(map(tuple, out.collect()))
    assert samples["ndjson"] == samples["arrow_rowloop"] \
        == samples["arrow_vector"], "arms disagree"
    print(json.dumps({"event": "parity_ok",
                      "sample_rows": len(samples["ndjson"])}))

    results: dict[str, list[float]] = {a: [] for a in arms}
    for r in range(runs):
        for arm, manifest in arms.items():
            t0 = time.perf_counter()
            make_processor_plugin(manifest)(docs, {"tag": "|ab"}) \
                .write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            results[arm].append(dt)
            print(json.dumps({"arm": arm, "run": r,
                              "wall_sec": round(dt, 2)}))

    med = {a: sorted(ts)[len(ts) // 2] for a, ts in results.items()}
    print(json.dumps({"event": "summary", "n_docs": n_docs,
                      "median_sec": {a: round(v, 2)
                                     for a, v in med.items()}}))


if __name__ == "__main__":
    main()
