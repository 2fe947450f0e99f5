"""Recursive-descent parser for the Bloblang subset.

Grammar (documented surface: bloblang/about.adoc — assignments :19-52,
deleted :70-78, variables :80-87, metadata :89-96, literals :112-253,
operators :264-277, if :280-292, match :294-314):

    mapping    := statement*
    statement  := 'root' path? '=' expr
                | 'meta' IDENT '=' expr
                | 'let' IDENT '=' expr
    expr       := or_expr | if_expr | match_expr
    if_expr    := 'if' expr '{' expr '}' ('else' (if_expr | '{' expr '}'))?
    match_expr := 'match' expr? '{' (case ','?)* '}'
    case       := (expr | '_') '=>' expr
    or_expr    := and_expr ('||' and_expr)*
    and_expr   := cmp_expr ('&&' cmp_expr)*
    cmp_expr   := add_expr (('=='|'!='|'<'|'<='|'>'|'>=') add_expr)?
    add_expr   := mul_expr (('+'|'-') mul_expr)*
    mul_expr   := unary (('*'|'/'|'%') unary)*
    unary      := ('-'|'!') unary | postfix
    postfix    := primary ('.' IDENT call_args? | '[' expr ']')*
    primary    := literal | array | object | 'this' | '$' IDENT
                | IDENT call_args? | IDENT | '(' expr ')'
    lambda     := IDENT '->' expr        (only inside call_args)
"""

from __future__ import annotations

import re

from connect_spark.bloblang import ast as A
from connect_spark.bloblang.lexer import BloblangSyntaxError, Token, tokenize


class Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = tokenize(src)
        self.i = 0

    # --- token helpers ---

    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        tok = self.toks[self.i]
        if tok.kind != "eof":
            self.i += 1
        return tok

    def expect(self, kind: str, value: str | None = None) -> Token:
        tok = self.next()
        if tok.kind != kind or (value is not None and tok.value != value):
            raise BloblangSyntaxError(
                f"expected {value or kind!r}, got {tok.value!r} at {tok.pos}"
            )
        return tok

    def at_op(self, value: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.value == value

    def eat_op(self, value: str) -> bool:
        if self.at_op(value):
            self.next()
            return True
        return False

    # --- entry points ---

    def parse_mapping(self) -> A.Mapping:
        stmts: list[A.Node] = []
        lines: list[int] = []
        while self.peek().kind != "eof":
            pos = self.peek().pos
            lines.append(self.src[:pos].count("\n") + 1)
            stmts.append(self.parse_statement())
        return A.Mapping(tuple(stmts), tuple(lines))

    def parse_statement(self) -> A.Node:
        tok = self.peek()
        if tok.kind == "ident" and tok.value == "map":
            # named map definition (about.adoc maps): map name { ... }
            self.next()
            name_tok = self.peek()
            if name_tok.kind in ("ident", "string"):
                self.next()
                name = (
                    name_tok.value[1:-1]
                    if name_tok.kind == "string"
                    else name_tok.value
                )
            else:
                raise BloblangSyntaxError(
                    f"expected map name at {name_tok.pos}"
                )
            self.expect("op", "{")
            stmts: list[A.Node] = []
            while not self.at_op("}"):
                stmts.append(self.parse_statement())
            self.expect("op", "}")
            return A.MapDef(name, tuple(stmts))
        if tok.kind == "root":
            self.next()
            path: list[str] = []
            while self.eat_op("."):
                path.append(self.expect("ident").value)
            self.expect("op", "=")
            return A.Assign(tuple(path), self.parse_expr())
        if tok.kind == "let":
            self.next()
            name = self.expect("ident").value
            self.expect("op", "=")
            return A.Let(name, self.parse_expr())
        if tok.kind == "ident" and tok.value == "meta":
            self.next()
            key_tok = self.peek()
            if key_tok.kind == "string":
                # quoted metadata keys (about.adoc: meta "content-type" =)
                self.next()
                key = key_tok.value[1:-1]
            else:
                key = self.expect("ident").value
            self.expect("op", "=")
            return A.MetaAssign(key, self.parse_expr())
        if tok.kind == "ident":
            # naked-path assignment (about.adoc:19-52): `foo.bar = ...`
            # is shorthand for `root.foo.bar = ...` — the form the
            # reference's own test corpus uses throughout
            # (config/test/bloblang/env.yaml, windowed.yaml)
            save = self.i
            path = [self.next().value]
            while self.eat_op("."):
                path.append(self.expect("ident").value)
            if self.eat_op("="):
                return A.Assign(tuple(path), self.parse_expr())
            self.i = save
        raise BloblangSyntaxError(
            f"expected statement (root/let/meta), got {tok.value!r} at {tok.pos}"
        )

    def parse_single_expression(self) -> A.Node:
        expr = self.parse_expr()
        if self.peek().kind != "eof":
            t = self.peek()
            raise BloblangSyntaxError(
                f"unexpected trailing {t.value!r} at {t.pos}"
            )
        return expr

    # --- expressions ---

    def parse_expr(self) -> A.Node:
        if self.peek().kind == "if":
            return self.parse_if()
        if self.peek().kind == "match":
            return self.parse_match()
        return self.parse_pipe()

    def parse_pipe(self) -> A.Node:
        """`a | b` — the pipe/coalesce operator at lowest precedence
        (bloblang/about.adoc coalescing): falls through to the right
        side when the left resolves null or errors (the reference's
        `this.people.index(0) | {...}` fallback idiom)."""
        left = self.parse_or()
        if not self.at_op("|"):
            return left
        alts = [left]
        while self.eat_op("|"):
            alts.append(self.parse_or())
        return A.Coalesce(tuple(alts))

    def parse_if(self) -> A.Node:
        self.expect("if")
        cond = self.parse_or()
        self.expect("op", "{")
        then = self.parse_expr()
        self.expect("op", "}")
        otherwise: A.Node | None = None
        if self.peek().kind == "else":
            self.next()
            if self.peek().kind == "if":
                otherwise = self.parse_if()
            else:
                self.expect("op", "{")
                otherwise = self.parse_expr()
                self.expect("op", "}")
        return A.If(cond, then, otherwise)

    def parse_match(self) -> A.Node:
        self.expect("match")
        subject: A.Node | None = None
        if not self.at_op("{"):
            subject = self.parse_or()
        self.expect("op", "{")
        cases: list[A.MatchCase] = []
        while not self.at_op("}"):
            if self.peek().kind == "ident" and self.peek().value == "_":
                self.next()
                pattern: A.Node | None = None
            else:
                pattern = self.parse_expr()
            self.expect("op", "=>")
            cases.append(A.MatchCase(pattern, self.parse_expr()))
            self.eat_op(",")
        self.expect("op", "}")
        return A.Match(subject, tuple(cases))

    def parse_or(self) -> A.Node:
        left = self.parse_and()
        while self.eat_op("||"):
            left = A.Binary("||", left, self.parse_and())
        return left

    def parse_and(self) -> A.Node:
        left = self.parse_cmp()
        while self.eat_op("&&"):
            left = A.Binary("&&", left, self.parse_cmp())
        return left

    def parse_cmp(self) -> A.Node:
        left = self.parse_add()
        for op in ("==", "!=", "<=", ">=", "<", ">"):
            if self.eat_op(op):
                return A.Binary(op, left, self.parse_add())
        return left

    def parse_add(self) -> A.Node:
        left = self.parse_mul()
        while True:
            if self.eat_op("+"):
                left = A.Binary("+", left, self.parse_mul())
            elif self.eat_op("-"):
                left = A.Binary("-", left, self.parse_mul())
            else:
                return left

    def parse_mul(self) -> A.Node:
        left = self.parse_unary()
        while True:
            if self.eat_op("*"):
                left = A.Binary("*", left, self.parse_unary())
            elif self.eat_op("/"):
                left = A.Binary("/", left, self.parse_unary())
            elif self.eat_op("%"):
                left = A.Binary("%", left, self.parse_unary())
            else:
                return left

    def parse_unary(self) -> A.Node:
        if self.eat_op("-"):
            return A.Unary("-", self.parse_unary())
        if self.eat_op("!") or self.peek().kind == "not":
            if self.peek().kind == "not":
                self.next()
            return A.Unary("!", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self) -> A.Node:
        node = self.parse_primary()
        while True:
            if self.eat_op("."):
                # coalesce path group: `this.(a | b | c)`
                # (bloblang/about.adoc:98-110)
                if self.at_op("("):
                    self.next()
                    alts: list[A.Node] = [self._parse_rel_path(node)]
                    while self.eat_op("|"):
                        alts.append(self._parse_rel_path(node))
                    self.expect("op", ")")
                    node = A.Coalesce(tuple(alts))
                    continue
                if self.peek().kind == "number":
                    # numeric path segment (`this.0` — array element by
                    # position, bloblang/about.adoc paths; the
                    # reference's csv_formatter.blobl uses it)
                    node = A.Index(node, A.Lit(int(self.next().value)))
                    continue
                if self.peek().kind == "string":
                    # quoted path segment (`this."service.name"` —
                    # field names containing dots, about.adoc paths;
                    # config/test/json_contains_predicate.yaml)
                    node = A.Field(node, self.next().value[1:-1])
                    continue
                name = self.expect("ident").value
                if self.at_op("("):
                    node = A.Method(node, name, self.parse_call_args())
                else:
                    node = A.Field(node, name)
            elif self.at_op("["):
                self.next()
                idx = self.parse_expr()
                self.expect("op", "]")
                node = A.Index(node, idx)
            else:
                return node

    def _parse_rel_path(self, base: A.Node) -> A.Node:
        """Dotted ident path relative to `base` (inside a coalesce
        group)."""
        node: A.Node = A.Field(base, self.expect("ident").value)
        while (
            self.peek().kind == "op"
            and self.peek().value == "."
            and self.peek(1).kind == "ident"
        ):
            self.next()
            node = A.Field(node, self.next().value)
        return node

    def parse_call_args(self) -> tuple[A.Node, ...]:
        self.expect("op", "(")
        args: list[A.Node] = []
        while not self.at_op(")"):
            args.append(self.parse_arg())
            if not self.eat_op(","):
                break
        self.expect("op", ")")
        return tuple(args)

    def parse_arg(self) -> A.Node:
        # lambda: IDENT '->' expr  (single param; (a, b) -> not needed yet)
        if (
            self.peek().kind == "ident"
            and self.peek(1).kind == "op"
            and self.peek(1).value == "->"
        ):
            param = self.next().value
            self.next()  # ->
            return A.Lambda((param,), self.parse_expr())
        # named argument: IDENT ':' expr (functions.adoc named params,
        # e.g. `range(start: 0, stop: this.max)`)
        if (
            self.peek().kind == "ident"
            and self.peek(1).kind == "op"
            and self.peek(1).value == ":"
        ):
            name = self.next().value
            self.next()  # :
            return A.NamedArg(name, self.parse_expr())
        return self.parse_expr()

    def parse_primary(self) -> A.Node:
        tok = self.peek()
        if tok.kind == "number":
            self.next()
            return A.Lit(float(tok.value) if "." in tok.value else int(tok.value))
        if tok.kind == "string":
            self.next()
            raw = tok.value[1:-1]
            # Single left-to-right pass: sequential .replace() calls
            # corrupt escaped backslashes (source "a\\nb" must decode to
            # literal backslash + 'n', not newline).
            escapes = {"\\": "\\", '"': '"', "n": "\n", "t": "\t", "r": "\r"}
            return A.Lit(
                re.sub(
                    r"\\(.)",
                    lambda m: escapes.get(m.group(1), "\\" + m.group(1)),
                    raw,
                )
            )
        if tok.kind == "true":
            self.next()
            return A.Lit(True)
        if tok.kind == "false":
            self.next()
            return A.Lit(False)
        if tok.kind == "null":
            self.next()
            return A.Lit(None)
        if tok.kind == "this":
            self.next()
            return A.This()
        if self.at_op("$"):
            self.next()
            return A.Var(self.expect("ident").value)
        if self.at_op("["):
            self.next()
            items: list[A.Node] = []
            while not self.at_op("]"):
                items.append(self.parse_expr())
                if not self.eat_op(","):
                    break
            self.expect("op", "]")
            return A.ArrayLit(tuple(items))
        if self.at_op("{"):
            self.next()
            pairs: list[tuple[str, A.Node]] = []
            while not self.at_op("}"):
                key_tok = self.next()
                if key_tok.kind == "string":
                    key = key_tok.value[1:-1]
                elif key_tok.kind == "ident":
                    key = key_tok.value
                else:
                    raise BloblangSyntaxError(
                        f"bad object key {key_tok.value!r} at {key_tok.pos}"
                    )
                self.expect("op", ":")
                pairs.append((key, self.parse_expr()))
                if not self.eat_op(","):
                    break
            self.expect("op", "}")
            return A.ObjectLit(tuple(pairs))
        if self.at_op("("):
            self.next()
            inner = self.parse_expr()
            self.expect("op", ")")
            return inner
        if tok.kind == "ident":
            self.next()
            if tok.value == "deleted" and self.at_op("("):
                self.parse_call_args()
                return A.Deleted()
            if self.at_op("("):
                return A.Func(tok.value, self.parse_call_args())
            # bare identifier == field of `this` (about.adoc:19-52)
            return A.Field(A.This(), tok.value)
        raise BloblangSyntaxError(
            f"unexpected token {tok.value!r} at {tok.pos}"
        )


def parse_mapping(src: str) -> A.Mapping:
    return Parser(src).parse_mapping()


def parse_expression(src: str) -> A.Node:
    return Parser(src).parse_single_expression()
