"""Iceberg REST-catalog client (the public REST catalog API the
reference's iceberg output talks to — internal/impl/iceberg/
output_iceberg.go; API shape per the apache/iceberg open-api spec).

The client speaks the documented endpoints through the injectable
transport seam (config, namespaces, table create/load, and the
optimistic-concurrency commit: `requirements` asserting the current
main-branch snapshot + `updates` adding the new snapshot and moving
the ref). Data/manifest files write through the existing
catalog-less writer (sinks/iceberg_meta.py::IcebergTable) — the REST
catalog owns METADATA pointers, not data IO, so the split matches
Iceberg's design.

No live catalog service exists in this environment, so tests drive
the client against `LocalCatalogHandler` — an in-process
implementation of the same API over a directory that enforces the
commit requirements (a stale snapshot assertion gets a 409, the
spec's conflict answer). A real deployment points `url` at its
catalog and registers a real transport; the client is unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from connect_spark.sinks.iceberg_meta import IcebergTable

Transport = Callable[[str, str, dict, str], str]


class CatalogError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"catalog error {status}: {message}")
        self.status = status


class RestCatalog:
    """Client for the Iceberg REST catalog API over a transport."""

    def __init__(self, url: str, transport: Transport, prefix: str = ""):
        self.base = url.rstrip("/")
        self.prefix = f"/{prefix.strip('/')}" if prefix else ""
        self.transport = transport

    # ---- plumbing ---------------------------------------------------

    def _call(self, verb: str, path: str, body: dict | None = None) -> dict:
        url = f"{self.base}/v1{self.prefix}{path}"
        raw = self.transport(
            url, verb, {"Content-Type": "application/json"},
            json.dumps(body) if body is not None else "",
        )
        doc = json.loads(raw) if raw else {}
        if isinstance(doc, dict) and doc.get("error"):
            err = doc["error"]
            raise CatalogError(
                int(err.get("code", 500)), err.get("message", "")
            )
        return doc

    # ---- API --------------------------------------------------------

    def config(self) -> dict:
        return self._call("GET", "/config")

    def list_namespaces(self) -> list[list[str]]:
        return self._call("GET", "/namespaces").get("namespaces", [])

    def create_namespace(self, namespace: str) -> dict:
        return self._call(
            "POST", "/namespaces", {"namespace": [namespace]}
        )

    def list_tables(self, namespace: str) -> list[dict]:
        return self._call(
            "GET", f"/namespaces/{namespace}/tables"
        ).get("identifiers", [])

    def create_table(
        self, namespace: str, name: str, location: str
    ) -> dict:
        return self._call(
            "POST",
            f"/namespaces/{namespace}/tables",
            {"name": name, "location": location},
        )

    def load_table(self, namespace: str, name: str) -> dict:
        return self._call(
            "GET", f"/namespaces/{namespace}/tables/{name}"
        )

    def commit_append(
        self,
        spark: SparkSession,
        namespace: str,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Append `df` to the table: write data/manifests at the
        table's location, then commit the new snapshot through the
        catalog with the spec's optimistic requirement on the main
        ref. Raises CatalogError(409) when the catalog's current
        snapshot moved under us (retry by re-running the append)."""
        loaded = self.load_table(namespace, name)
        location = loaded["metadata"]["location"]
        # assert against the CATALOG's view of main — if another
        # writer commits between this load and our POST, the
        # requirement fails with the spec's 409
        prior_snapshot = loaded["metadata"].get(
            "current-snapshot-id", -1
        )
        table = IcebergTable(spark, location)
        local_version_before = table._version()
        meta = table.append(df, partition_by=partition_by)
        snapshot = meta["snapshots"][-1]
        try:
            return self._call(
                "POST",
                f"/namespaces/{namespace}/tables/{name}",
                {
                    "requirements": [
                        {
                            "type": "assert-ref-snapshot-id",
                            "ref": "main",
                            "snapshot-id": prior_snapshot,
                        }
                    ],
                    "updates": [
                        {"action": "add-snapshot", "snapshot": snapshot},
                        {
                            "action": "set-snapshot-ref",
                            "ref-name": "main",
                            "type": "branch",
                            "snapshot-id": snapshot["snapshot-id"],
                        },
                    ],
                },
            )
        except CatalogError:
            # the catalog rejected the commit — roll the LOCAL table
            # pointer back so the rejected snapshot is not readable
            # and a retry doesn't double-write (the orphaned metadata
            # and data files are the standard aborted-commit debris a
            # maintenance vacuum removes)
            hint = os.path.join(table.meta_dir, "version-hint.text")
            with open(hint, "w", encoding="utf-8") as fh:
                fh.write(str(local_version_before))
            raise


class LocalCatalogHandler:
    """In-process REST-catalog implementation over a directory —
    register as a transport to drive RestCatalog end-to-end. Enforces
    the commit requirements (stale assert → 409)."""

    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        self.state_path = os.path.join(warehouse, "_catalog.json")
        if not os.path.exists(self.state_path):
            os.makedirs(warehouse, exist_ok=True)
            self._save({"namespaces": {}, "tables": {}})

    def _load(self) -> dict:
        with open(self.state_path, encoding="utf-8") as fh:
            return json.load(fh)

    def _save(self, state: dict) -> None:
        with open(self.state_path, "w", encoding="utf-8") as fh:
            json.dump(state, fh)

    @staticmethod
    def _error(code: int, message: str) -> str:
        return json.dumps({"error": {"code": code, "message": message}})

    def __call__(self, url: str, verb: str, headers: dict,
                 body: str) -> str:
        path = url.split("/v1", 1)[1]
        doc = json.loads(body) if body else {}
        state = self._load()
        parts = [p for p in path.split("/") if p]
        if path == "/config":
            return json.dumps({"defaults": {}, "overrides": {}})
        if path == "/namespaces" and verb == "GET":
            return json.dumps({
                "namespaces": [[ns] for ns in sorted(state["namespaces"])]
            })
        if path == "/namespaces" and verb == "POST":
            ns = doc["namespace"][0]
            state["namespaces"][ns] = {}
            self._save(state)
            return json.dumps({"namespace": [ns]})
        if len(parts) == 3 and parts[2] == "tables" and verb == "GET":
            ns = parts[1]
            idents = [
                {"namespace": [ns], "name": n.split(".", 1)[1]}
                for n in sorted(state["tables"])
                if n.startswith(ns + ".")
            ]
            return json.dumps({"identifiers": idents})
        if len(parts) == 3 and parts[2] == "tables" and verb == "POST":
            ns = parts[1]
            if ns not in state["namespaces"]:
                return self._error(404, f"namespace {ns} not found")
            key = f"{ns}.{doc['name']}"
            if key in state["tables"]:
                return self._error(409, f"table {key} exists")
            location = doc.get("location") or os.path.join(
                self.warehouse, ns, doc["name"]
            )
            state["tables"][key] = {
                "location": location, "main-snapshot-id": -1,
            }
            self._save(state)
            return json.dumps({
                "metadata-location": None,
                "metadata": {"location": location},
            })
        if len(parts) == 4 and parts[2] == "tables":
            ns, name = parts[1], parts[3]
            key = f"{ns}.{name}"
            tbl = state["tables"].get(key)
            if tbl is None:
                return self._error(404, f"table {key} not found")
            if verb == "GET":
                return json.dumps({
                    "metadata-location": None,
                    "metadata": {
                        "location": tbl["location"],
                        "current-snapshot-id": tbl["main-snapshot-id"],
                    },
                })
            if verb == "POST":  # commit
                for req in doc.get("requirements", []):
                    if req.get("type") == "assert-ref-snapshot-id":
                        if tbl["main-snapshot-id"] != req.get(
                            "snapshot-id"
                        ):
                            return self._error(
                                409,
                                "requirement failed: main is at "
                                f"{tbl['main-snapshot-id']}, commit "
                                f"asserted {req.get('snapshot-id')}",
                            )
                for upd in doc.get("updates", []):
                    if upd.get("action") == "set-snapshot-ref" and (
                        upd.get("ref-name") == "main"
                    ):
                        tbl["main-snapshot-id"] = upd["snapshot-id"]
                self._save(state)
                return json.dumps({
                    "metadata-location": None,
                    "metadata": {
                        "location": tbl["location"],
                        "current-snapshot-id": tbl["main-snapshot-id"],
                    },
                })
        return self._error(400, f"unhandled {verb} {path}")
