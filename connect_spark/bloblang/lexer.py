"""Tokenizer for the Bloblang subset.

Token grammar follows the reference's language docs
(docs/modules/guides/pages/bloblang/about.adoc:112-253 literals,
:264-277 operators, :280-314 if/match) — written from the documented
surface, not from any reference implementation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class BloblangSyntaxError(ValueError):
    pass


@dataclass(frozen=True)
class Token:
    kind: str
    value: str
    pos: int


KEYWORDS = {
    "if",
    "else",
    "match",
    "let",
    "root",
    "this",
    "true",
    "false",
    "null",
    "not",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<number>\d+\.\d+|\d+)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<op>=>|->|==|!=|<=|>=|&&|\|\||[-+*/%<>=!().,{}\[\]:|$])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


def tokenize(src: str) -> list[Token]:
    out: list[Token] = []
    pos = 0
    n = len(src)
    while pos < n:
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise BloblangSyntaxError(
                f"unexpected character {src[pos]!r} at offset {pos}"
            )
        kind = m.lastgroup or ""
        text = m.group()
        if kind == "ident" and text in KEYWORDS:
            kind = text
        if kind not in ("ws", "comment"):
            out.append(Token(kind, text, pos))
        pos = m.end()
    out.append(Token("eof", "", n))
    return out
