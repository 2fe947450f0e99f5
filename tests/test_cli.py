"""CLI verbs (connect_spark/__main__.py): lint / list / echo / blobl /
create — the benthos CLI surface beside run/test."""

from __future__ import annotations

import io
import json

import pytest

from connect_spark.__main__ import lint_config, main


def test_lint_green(tmp_path, capsys):
    cfg = tmp_path / "ok.yaml"
    cfg.write_text(
        "input:\n  generate:\n    count: 1\n"
        "pipeline:\n  processors:\n    - mapping: 'root = this'\n"
        "output:\n  parquet:\n    path: /tmp/x\n"
    )
    assert main(["lint", str(cfg)]) == 0
    assert "OK" in capsys.readouterr().out


def test_lint_catches_unknown_kinds(tmp_path, capsys):
    cfg = tmp_path / "bad.yaml"
    cfg.write_text(
        "input:\n  kafkaa: {}\n"
        "pipeline:\n  processors:\n    - mappin: 'root = this'\n"
        "output:\n  broker:\n    outputs:\n      - parqet: {}\n"
    )
    assert main(["lint", str(cfg)]) == 1
    out = capsys.readouterr().out
    assert "unknown input kind 'kafkaa'" in out
    assert "unknown processor kind 'mappin'" in out
    assert "outputs[0]: unknown output kind 'parqet'" in out


def test_lint_config_nested_and_caches():
    errs = lint_config({
        "input": {"batched": {"child": {"generate": {}}}},
        "cache_resources": [{"label": "c", "memorry": {}}],
        "buffer": {"system_window": {}},
    })
    assert len(errs) == 1 and "memorry" in errs[0]


def test_list_sections(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for sec in ("inputs", "processors", "outputs", "caches", "buffers",
                "metrics", "tracers", "scanners"):
        assert f"== {sec}" in out
    assert main(["list", "inputs"]) == 0
    out = capsys.readouterr().out
    assert "postgres_cdc" in out and "mqtt" in out
    assert main(["list", "bogus"]) == 1


def test_echo_normalizes(tmp_path, capsys):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("input: {generate: {count: 1}}\n")
    assert main(["echo", str(cfg)]) == 0
    assert "generate:" in capsys.readouterr().out


def test_blobl_eval_stdin(monkeypatch, capsys):
    monkeypatch.setattr(
        "sys.stdin", io.StringIO('{"n": 4}\n{"n": 7}\n'))
    assert main(["blobl", "root.out = this.n * 2"]) == 0
    lines = capsys.readouterr().out.strip().split("\n")
    assert [json.loads(ln) for ln in lines] == [
        {"out": 8}, {"out": 14}]


def test_create_template(capsys):
    assert main(["create", "kafka//mapping,dedupe/parquet"]) == 0
    out = capsys.readouterr().out
    assert "kafka:" in out and "dedupe:" in out and "parquet:" in out


def test_lint_every_registered_kind_is_lintable(tmp_path):
    """Every registered kind passes lint when used as-is (the lint
    list and the registries must not drift)."""
    from connect_spark.__main__ import _known_kinds

    kinds = _known_kinds()

    def no_unknown(errs):
        return [e for e in errs if "unknown" in e] == []

    for name in kinds["inputs"]:
        assert no_unknown(lint_config({"input": {name: {}}})), name
    for name in kinds["outputs"]:
        assert no_unknown(lint_config({"output": {name: {}}})), name
    for name in kinds["processors"]:
        assert no_unknown(lint_config(
            {"pipeline": {"processors": [{name: {}}]}})), name


def test_create_three_segment_spec(capsys):
    assert main(["create", "kafka/mapping/parquet"]) == 0
    out = capsys.readouterr().out
    assert "kafka:" in out and "mapping:" in out and "parquet:" in out
    assert main(["create", "kafka/memory/mapping/parquet"]) == 0
    out = capsys.readouterr().out
    assert "buffer:" in out and "memory:" in out
    assert main(["create", "a/b/c/d/e"]) == 1


def test_lint_knows_template_kinds():
    errs = lint_config({
        "templates": [{"name": "my_proc", "type": "processor",
                       "mapping": "root = this"}],
        "pipeline": {"processors": [{"my_proc": {}}]},
    })
    assert errs == []


def test_lint_recurses_into_switch_cases():
    errs = lint_config({
        "pipeline": {"processors": [
            {"switch": [
                {"check": "this.x > 1",
                 "processors": [{"mappin": "root = this"}]},
            ]},
            {"try": [{"mapping": "root = this"}, {"bogus_proc": {}}]},
        ]},
    })
    assert len(errs) == 2
    assert any("mappin" in e for e in errs)
    assert any("bogus_proc" in e for e in errs)


def test_list_includes_redis_rate_limit(capsys):
    assert main(["list", "rate_limits"]) == 0
    assert "redis" in capsys.readouterr().out


def test_examples_lint_clean(capsys):
    import glob

    files = sorted(glob.glob("examples/*.yaml"))
    assert files
    assert main(["lint", *files]) == 0


def test_lint_required_fields():
    errs = lint_config({"input": {"postgres_cdc": {"wal_path": "/x"}}})
    assert any("requires field 'dsn'" in e for e in errs)
    assert lint_config({"input": {"postgres_cdc": {
        "dsn": "postgres://u@h/db", "wal_path": "/x"}}}) == []
    errs_o = lint_config({"output": {"mongodb": {"store_path": "/x"}}})
    assert any("requires field" in e for e in errs_o)


def test_lint_accepts_sibling_labels():
    assert lint_config({"pipeline": {"processors": [
        {"label": "x", "mapping": "root = this"},
    ]}}) == []


def test_run_set_overrides(tmp_path, capsys):
    cfg = tmp_path / "r.yaml"
    cfg.write_text(
        "input:\n  generate:\n    count: 1\n"
        "    mapping: 'root.n = counter()'\n"
        "output:\n  memory: {}\n"
    )
    assert main(["run", str(cfg), "-s", "input.generate.count=3"]) == 0
    out = capsys.readouterr().out
    assert out.count("|") > 0 and "2" in out  # rows 0..2 shown


def test_lint_resource_sections():
    errs = lint_config({
        "input_resources": [{"label": "a", "bogus_in": {}}],
        "output_resources": [{"label": "b", "parquet": {}}],
        "processor_resources": [{"label": "c", "mappin": {}}],
    })
    assert len(errs) == 2
    assert any("bogus_in" in e for e in errs)
    assert any("mappin" in e for e in errs)


def test_dry_run_healthy_config(tmp_path, capsys):
    """dry_run (reference internal/cli/enterprise.go:239): a config
    that lints AND builds reports OK with its pre-output schema."""
    cfg = tmp_path / "ok.yaml"
    cfg.write_text(
        "input:\n  generate:\n    count: 2\n"
        "    mapping: 'root.n = counter()'\n"
        "pipeline:\n  processors:\n"
        "    - mapping: 'root.n2 = this.n * 2'\n"
        "output:\n  memory: {}\n"
    )
    assert main(["dry_run", str(cfg)]) == 0
    out = capsys.readouterr().out
    assert "OK" in out and "output columns" in out


def test_dry_run_catches_unbuildable_mapping(tmp_path, capsys):
    """The case lint can NOT catch: the kind is known and the shape is
    right, but the Bloblang doesn't compile — dry_run constructs the
    component and fails."""
    cfg = tmp_path / "bad.yaml"
    cfg.write_text(
        "input:\n  generate:\n    count: 2\n"
        "    mapping: 'root.n = counter()'\n"
        "pipeline:\n  processors:\n"
        "    - mapping: 'root.x = this.n |||| broken ('\n"
        "output:\n  memory: {}\n"
    )
    from connect_spark.__main__ import lint_config
    import yaml
    assert lint_config(yaml.safe_load(cfg.read_text())) == []  # lints!
    assert main(["dry_run", str(cfg)]) == 1
    out = capsys.readouterr().out
    assert "build:" in out


def test_dry_run_catches_unknown_kind_via_lint(tmp_path, capsys):
    cfg = tmp_path / "unk.yaml"
    cfg.write_text("input:\n  not_a_real_input: {}\noutput:\n  memory: {}\n")
    assert main(["dry_run", str(cfg)]) == 1
    assert "lint:" in capsys.readouterr().out
