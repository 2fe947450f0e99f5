"""In-process Python plugin discovery — the SURVEY §2.H
"entry-point registry" mapping that complements plans/rpcplugin.py's
out-of-process mechanism: users ship custom components as importable
Python modules instead of child processes when they are happy to run
inside the engine (reference analog: compiled-in components
registered via `service.MustRegister*` from imported packages).

A plugin module registers its components at import time using the
SAME decorators the engine's own components use:

    # my_plugins.py
    from connect_spark.plans.pipeline import (
        input_kind, output_kind, processor)

    @processor("my_enrich")
    def my_enrich(df, conf):
        ...

Discovery: `load_plugin_modules(["my_plugins", ...])` imports each
module (registration is the side effect), or set
`CONNECT_SPARK_PLUGINS=mod1,mod2` / pass `--plugins` on the CLI.
Modules are imported at most once per process (idempotent re-load)."""

from __future__ import annotations

import importlib
import os

from connect_spark.plans.pipeline import PipelineConfigError

PLUGINS_ENV = "CONNECT_SPARK_PLUGINS"

_LOADED: set[str] = set()


def load_plugin_modules(modules: list[str] | None = None) -> list[str]:
    """Import each plugin module (explicit list + the env var),
    returning the newly imported names.  Unknown modules raise
    PipelineConfigError naming the module."""
    names: list[str] = list(modules or [])
    env = os.environ.get(PLUGINS_ENV, "")
    names += [m.strip() for m in env.split(",") if m.strip()]
    loaded = []
    for mod in names:
        if mod in _LOADED:
            continue
        try:
            importlib.import_module(mod)
        except ImportError as exc:
            raise PipelineConfigError(
                f"cannot import plugin module {mod!r}: {exc}") from exc
        _LOADED.add(mod)
        loaded.append(mod)
    return loaded
