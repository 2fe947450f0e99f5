"""Config templates (docs/modules/configuration/pages/templating.adoc,
internal/template/): define a new component as parameter fields + a
Bloblang mapping that turns the field values into a config snippet.

Shape mirrors the reference's template files:

    name: dedupe_by
    type: processor
    fields:
      - name: key
        type: string
      - name: order
        type: string
        default: ts
    mapping: |
      root.dedupe = {"keys": [this.key], "order_by": [this.order]}

Templates register globally (`register_template`) or inline under the
config's `templates:` list; expansion happens at plan-build time (the
reference expands at config-parse time — same moment in our model).
The mapping runs through the driver-side Bloblang value evaluator
(bloblang/pyeval.py), so template logic — map_each over url lists,
conditionals on fields — works as documented."""

from __future__ import annotations

from typing import Any

from connect_spark.bloblang.pyeval import eval_mapping_value

_TEMPLATES: dict[str, dict] = {}


class TemplateError(ValueError):
    pass


def register_template(spec: dict) -> None:
    for req in ("name", "type", "mapping"):
        if req not in spec:
            raise TemplateError(f"template missing {req!r}")
    if spec["type"] not in ("processor", "input", "output"):
        raise TemplateError(f"unsupported template type {spec['type']!r}")
    _TEMPLATES[spec["name"]] = spec


def clear_templates() -> None:
    _TEMPLATES.clear()


def _field_values(spec: dict, given: Any) -> dict:
    given = dict(given or {})
    values: dict[str, Any] = {}
    for field in spec.get("fields", []):
        name = field["name"]
        if name in given:
            values[name] = given.pop(name)
        elif "default" in field:
            values[name] = field["default"]
        else:
            raise TemplateError(
                f"template {spec['name']!r}: missing required field {name!r}"
            )
    if given:
        raise TemplateError(
            f"template {spec['name']!r}: unknown fields {sorted(given)}"
        )
    return values


def expand_component(
    kind: str,
    conf: Any,
    component: str,
    _expanding: frozenset[str] = frozenset(),
) -> tuple[str, Any]:
    """If `kind` names a template of `component` type, evaluate its
    mapping over the field values and return the produced single-key
    snippet; otherwise pass through. A template may expand to another
    template, but revisiting a name already on the expansion path is a
    cycle and raises."""
    spec = _TEMPLATES.get(kind)
    if spec is None or spec["type"] != component:
        return kind, conf
    if kind in _expanding:
        chain = " -> ".join([*sorted(_expanding), kind])
        raise TemplateError(f"template expansion cycle: {chain}")
    values = _field_values(spec, conf)
    snippet = eval_mapping_value(spec["mapping"], values)
    if not isinstance(snippet, dict) or len(snippet) != 1:
        raise TemplateError(
            f"template {kind!r} mapping must produce one component, got "
            f"{snippet!r}"
        )
    (new_kind, new_conf), = snippet.items()
    return expand_component(
        new_kind, new_conf, component, _expanding | {kind}
    )
