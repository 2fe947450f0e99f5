"""AST node types for the Bloblang subset."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional


class Node:
    pass


@dataclass(frozen=True)
class Lit(Node):
    value: Any  # int | float | str | bool | None


@dataclass(frozen=True)
class ArrayLit(Node):
    items: tuple[Node, ...]


@dataclass(frozen=True)
class ObjectLit(Node):
    pairs: tuple[tuple[str, Node], ...]


@dataclass(frozen=True)
class This(Node):
    """`this` — the whole input document."""


@dataclass(frozen=True)
class Field(Node):
    """Field access on a target expression (`x.foo`)."""

    target: Node
    name: str


@dataclass(frozen=True)
class Index(Node):
    target: Node
    index: Node


@dataclass(frozen=True)
class Var(Node):
    """`$name` — let-variable reference."""

    name: str


@dataclass(frozen=True)
class Func(Node):
    name: str
    args: tuple[Node, ...]


@dataclass(frozen=True)
class NamedArg(Node):
    """`name: expr` inside call args (functions.adoc named parameters,
    e.g. `range(start: 0, stop: this.max)`, `file(path: p, no_cache:
    true)`). Evaluators map these to keyword arguments."""

    name: str
    value: Node


@dataclass(frozen=True)
class Method(Node):
    target: Node
    name: str
    args: tuple[Node, ...]


@dataclass(frozen=True)
class Lambda(Node):
    params: tuple[str, ...]
    body: Node


@dataclass(frozen=True)
class Unary(Node):
    op: str
    operand: Node


@dataclass(frozen=True)
class Binary(Node):
    op: str
    left: Node
    right: Node


@dataclass(frozen=True)
class If(Node):
    cond: Node
    then: Node
    otherwise: Optional[Node]


@dataclass(frozen=True)
class MatchCase(Node):
    pattern: Optional[Node]  # None == default (`_`)
    result: Node


@dataclass(frozen=True)
class Match(Node):
    subject: Optional[Node]
    cases: tuple[MatchCase, ...]


@dataclass(frozen=True)
class Coalesce(Node):
    """`target.(a | b | c)` — first non-null wins
    (bloblang/about.adoc:98-110)."""

    alternatives: tuple[Node, ...]


@dataclass(frozen=True)
class Deleted(Node):
    """`deleted()` — marks the document for removal
    (bloblang/about.adoc:70-78)."""


# --- statements ---


@dataclass(frozen=True)
class Assign(Node):
    """`root.a.b = expr` (path empty == whole document `root = expr`)."""

    path: tuple[str, ...]
    expr: Node


@dataclass(frozen=True)
class MetaAssign(Node):
    """`meta foo = expr` (bloblang/about.adoc:89-96)."""

    key: str
    expr: Node


@dataclass(frozen=True)
class Let(Node):
    name: str
    expr: Node


@dataclass(frozen=True)
class MapDef(Node):
    """Named map (about.adoc maps section): `map name { root = ... }`,
    invoked with `.apply("name")`."""

    name: str
    statements: tuple[Node, ...]


@dataclass(frozen=True)
class Mapping(Node):
    statements: tuple[Node, ...]
    # 1-based source line of each statement (parallel to `statements`;
    # empty when unknown) — the dynamic evaluator's error messages
    # mirror the reference's "failed assignment (line N): ..." format
    lines: tuple[int, ...] = ()
