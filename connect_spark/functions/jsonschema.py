"""`json_schema` processor (docs/.../processors/json_schema.adoc:26):
validate a JSON payload against a (subset) schema; failures set the
`_error` column instead of dropping rows — the reference's error-flag
contract.

Supported subset: type checks (object/number/integer/string/boolean/
array), required properties, numeric minimum/maximum (incl.
exclusive), string minLength/maxLength/pattern/enum, array minItems/
maxItems — compiled entirely to Column predicates over
get_json_object/variant accessors (no UDF, no jsonschema lib
dependency)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connect_spark.errors import flag_error


def _json_type(col: Column, name: str) -> Column:
    """The exact JSON type of a property (STRING/BIGINT/DOUBLE/
    DECIMAL/BOOLEAN/VOID/OBJECT/ARRAY; null when absent) via the
    variant accessor — get_json_object alone loses the distinction
    between the string "42" and the number 42."""
    return F.schema_of_variant(
        F.try_variant_get(F.parse_json(col), f"$.{name}", "variant")
    )


def _prop_checks(col: Column, name: str, spec: dict) -> list[tuple[Column, str]]:
    """(violation_condition, message) pairs for one property."""
    raw = F.get_json_object(col, f"$.{name}")
    jt = _json_type(col, name)
    checks: list[tuple[Column, str]] = []
    t = spec.get("type")
    if t in ("number", "integer"):
        num = raw.cast("double")
        checks.append(
            (
                raw.isNotNull()
                & ~jt.rlike("^(BIGINT|DOUBLE|DECIMAL|FLOAT|INT|SMALLINT|TINYINT)"),
                f"{name}: not a number",
            )
        )
        if t == "integer":
            checks.append(
                (
                    num.isNotNull() & (num != F.floor(num)),
                    f"{name}: not an integer",
                )
            )
        if "minimum" in spec:
            checks.append(
                (num < spec["minimum"], f"{name}: below minimum")
            )
        if "maximum" in spec:
            checks.append(
                (num > spec["maximum"], f"{name}: above maximum")
            )
        if "exclusiveMinimum" in spec:
            checks.append(
                (num <= spec["exclusiveMinimum"],
                 f"{name}: not above exclusive minimum")
            )
        if "exclusiveMaximum" in spec:
            checks.append(
                (num >= spec["exclusiveMaximum"],
                 f"{name}: not below exclusive maximum")
            )
    elif t == "string":
        # typed check via the variant accessor: numbers, booleans and
        # null must NOT validate as strings even though
        # get_json_object would return their text form
        checks.append(
            (
                raw.isNotNull() & (jt != "STRING"),
                f"{name}: not a string",
            )
        )
        if "minLength" in spec:
            checks.append(
                (F.length(raw) < spec["minLength"], f"{name}: too short")
            )
        if "maxLength" in spec:
            checks.append(
                (F.length(raw) > spec["maxLength"], f"{name}: too long")
            )
        if "pattern" in spec:
            checks.append(
                (~raw.rlike(spec["pattern"]),
                 f"{name}: does not match pattern")
            )
    elif t == "boolean":
        checks.append(
            (
                raw.isNotNull() & (jt != "BOOLEAN"),
                f"{name}: not a boolean",
            )
        )
    elif t == "array":
        arr = F.from_json(raw, "array<string>")
        checks.append(
            (raw.isNotNull() & ~raw.rlike(r"^\["), f"{name}: not an array")
        )
        if "minItems" in spec:
            checks.append(
                (F.size(arr) < spec["minItems"], f"{name}: too few items")
            )
        if "maxItems" in spec:
            checks.append(
                (F.size(arr) > spec["maxItems"], f"{name}: too many items")
            )
    if "enum" in spec:
        checks.append(
            (
                raw.isNotNull()
                & ~raw.isin(*[str(v) for v in spec["enum"]]),
                f"{name}: not in enum",
            )
        )
    return checks


def json_schema_validate(
    df: DataFrame, col: str, schema: dict
) -> DataFrame:
    """Validate `col` (JSON string) against the schema subset; set
    `_error` on the first violation per row."""
    c = F.col(col)
    props = schema.get("properties", {})
    required = schema.get("required", [])
    df = flag_error(
        df,
        c.isNull() | F.get_json_object(c, "$").isNull(),
        "invalid json",
    )
    for name in required:
        df = flag_error(
            df,
            F.get_json_object(c, f"$.{name}").isNull(),
            f"missing required property {name}",
        )
    for name, spec in props.items():
        for cond, msg in _prop_checks(c, name, spec):
            df = flag_error(df, F.coalesce(cond, F.lit(False)), msg)
    return df
