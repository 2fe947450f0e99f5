"""Bloblang → Spark Column compiler.

The reference's mapping language (docs/modules/guides/pages/bloblang/
about.adoc) compiled to Catalyst Column expressions: a mapping like

    root.revenue = this.price * (1 - this.discount)
    root.status = this.flag.uppercase()
    root.kind = if this.value > 30 { "high" } else { "low" }

becomes a single narrow projection — the optimizer the reference never
had (SURVEY.md intro) gets the whole expression tree.

Supported subset (SURVEY.md §2.G build step 1-2): root/this paths,
literals (incl. arrays/objects), arithmetic/boolean/comparison, if/else
expressions, match expressions, method calls (the ~80 methods with
native Column equivalents in methods.py), functions (now, uuid_v4,
counter, …), `deleted()` filtering, metadata access, let-variables.
"""

from connect_spark.bloblang.compiler import (
    BloblangError,
    compile_expression,
    compile_mapping,
)

__all__ = ["compile_expression", "compile_mapping", "BloblangError"]
