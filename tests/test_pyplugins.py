"""In-process Python plugin discovery (plans/pyplugins.py): modules
registering components at import time via the engine's own
decorators, discovered by explicit list, env var, or CLI flag."""

from __future__ import annotations

import os
import sys
import textwrap

import pytest

from connect_spark.plans.pipeline import (
    PipelineConfigError,
    PROCESSORS,
)
from connect_spark.plans.pyplugins import (
    PLUGINS_ENV,
    _LOADED,
    load_plugin_modules,
)

_PLUGIN_SRC = """\
from pyspark.sql import functions as F

from connect_spark.plans.pipeline import processor


@processor("{name}")
def _p(df, conf):
    return df.withColumn("tagged", F.lit(conf.get("tag", "x")))
"""


@pytest.fixture
def plugin_on_path(tmp_path, monkeypatch):
    def make(modname):
        (tmp_path / f"{modname}.py").write_text(
            _PLUGIN_SRC.format(name=modname))
        monkeypatch.syspath_prepend(str(tmp_path))
        return modname

    yield make
    for mod in list(sys.modules):
        if mod.startswith("csp_test_plugin"):
            del sys.modules[mod]
            _LOADED.discard(mod)
            PROCESSORS.pop(mod, None)


def test_explicit_module_registers(plugin_on_path):
    mod = plugin_on_path("csp_test_plugin_a")
    assert load_plugin_modules([mod]) == [mod]
    assert mod in PROCESSORS
    # idempotent: second load is a no-op
    assert load_plugin_modules([mod]) == []


def test_env_var_discovery(plugin_on_path, monkeypatch):
    mod = plugin_on_path("csp_test_plugin_b")
    monkeypatch.setenv(PLUGINS_ENV, f" {mod} ,")
    assert load_plugin_modules() == [mod]
    assert mod in PROCESSORS


def test_unknown_module_raises():
    with pytest.raises(PipelineConfigError, match="no_such_plugin"):
        load_plugin_modules(["no_such_plugin_module_xyz"])


def test_registered_processor_runs(plugin_on_path, spark):
    mod = plugin_on_path("csp_test_plugin_c")
    load_plugin_modules([mod])
    df = spark.createDataFrame([(1,)], "k INT")
    out = PROCESSORS[mod](df, {"tag": "hello"})
    assert out.collect()[0]["tagged"] == "hello"


def test_cli_plugins_flag(plugin_on_path, tmp_path, capsys):
    mod = plugin_on_path("csp_test_plugin_d")
    cfg = tmp_path / "c.yaml"
    cfg.write_text(textwrap.dedent(f"""\
        input:
          generate:
            count: 1
            mapping: 'root.n = counter()'
        pipeline:
          processors:
            - {mod}:
                tag: fromcli
        output:
          memory: {{}}
        """))
    from connect_spark.__main__ import main

    assert main(["run", str(cfg), "--plugins", mod]) == 0
    assert "fromcli" in capsys.readouterr().out
