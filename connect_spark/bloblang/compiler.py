"""AST → Column compiler + mapping executor.

`compile_mapping(df, src)` applies a Bloblang mapping as ONE Catalyst
projection (mapping processor semantics, mapping.adoc:26):
- `root.x = expr` assignments become select items;
- `root = deleted()` (possibly under if/match) becomes a filter
  (bloblang/about.adoc:70-78);
- `meta key = expr` writes into the `_meta` map column (about.adoc:89-96);
- `let` variables are compile-time Column bindings (about.adoc:80-87) —
  Catalyst CSE dedupes repeated use.

`mutation` semantics (mutation.adoc:26) keep unassigned columns.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connect_spark.bloblang import ast as A
from connect_spark.bloblang.lexer import BloblangSyntaxError
from connect_spark.bloblang.methods import METHODS
from connect_spark.bloblang.parser import parse_expression, parse_mapping

META_COL = "_meta"


class BloblangError(ValueError):
    pass


# --- functions (docs/.../bloblang/functions.adoc) ---


def _fn_now() -> Column:
    return F.current_timestamp()


def _fn_uuid_v4() -> Column:
    return F.expr("uuid()")


def _fn_counter() -> Column:
    """functions.adoc counter(): dense 0-based sequence. On a
    multi-partition frame monotonically_increasing_id() is unique but
    partition-offset (NOT dense), so the generic path pays one global
    row_number sort — honest for a semantics that is inherently
    sequential. The `generate` input avoids it entirely: compile_mapping
    rebinds counter() to the range index, which is already dense and
    global with zero shuffle (see Compiler.counter_col)."""
    from pyspark.sql import Window

    return (
        F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))
        - 1
    ).cast("long")


def _fn_random_int(max_: Any = 2147483647) -> Column:
    return (F.rand() * max_).cast("bigint")


def _fn_timestamp_unix() -> Column:
    return F.unix_timestamp(F.current_timestamp())


def _fn_range(start: Any, stop: Any, step: Any = 1) -> Column:
    # range() excludes `stop` in BOTH directions: pull the bound one
    # step-sign toward start (stop-1 ascending, stop+1 descending)
    if isinstance(step, Column):
        bound = F.lit(stop) - F.signum(step).cast("bigint")
    else:
        bound = F.lit(stop) - (1 if step >= 0 else -1)
    return F.sequence(F.lit(start), bound, F.lit(step))


def _fn_throw(msg: Any) -> Column:
    return F.raise_error(F.lit(msg))


def _fn_fake(kind: str = "word") -> Column:
    """fake() (functions.adoc:881; generator list
    internal/impl/lang/bloblang.go:122-160) made DETERMINISTIC: every
    one of the documented 44 generators, derived per row from a hash —
    reproducible test data, unlike the reference's RNG. Column algebra
    only (functions/fake.py)."""
    from connect_spark.functions.fake import fake_value

    return fake_value(kind)


# per-process trace root (tracers/*.adoc analog): every message of a
# run correlates under one root; per-message ids derive from it
import uuid as _uuid

_TRACE_ROOT = _uuid.uuid4().hex


def _fn_tracing_id() -> Column:
    """functions.adoc:659 tracing_id — 32-hex OTel-style trace id per
    message (deterministic within a run: md5 of the run's trace root +
    a stable row id)."""
    return F.md5(
        F.concat(
            F.lit(_TRACE_ROOT),
            F.monotonically_increasing_id().cast("string"),
        )
    )


def _fn_tracing_span() -> Column:
    """functions.adoc:681 tracing_span — text-map object carrying the
    W3C `traceparent` (00-<trace>-<span>-01)."""
    trace = _fn_tracing_id()
    span = F.substring(
        F.md5(F.concat(trace, F.lit("span"))), 1, 16
    )
    return F.struct(
        F.concat(
            F.lit("00-"), trace, F.lit("-"), span, F.lit("-01")
        ).alias("traceparent")
    )


_CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def _crockford_chars(value: Column, n_chars: int) -> Column:
    """Encode the low 5*n_chars bits of a non-negative long Column as
    n_chars Crockford base32 characters (most significant first)."""
    alphabet = F.split(F.lit(_CROCKFORD), "")
    parts = []
    for i in range(n_chars):
        shift = 5 * (n_chars - 1 - i)
        idx = (F.shiftrightunsigned(value, shift) % 32).cast("int")
        parts.append(F.element_at(alphabet, idx + 1))
    return F.concat(*parts)


def _fn_ulid(encoding: Any = "crockford",
             random_source: Any = "secure_random") -> Column:
    """ulid() (reference `internal/impl/lang/bloblang.go:315-380`):
    128-bit ULID = 48-bit millisecond timestamp + 80 random bits;
    'crockford' → the canonical 26-char Base32 form (10 time chars +
    16 random chars), 'hex' → 32 hex chars.  Randomness derives from
    Spark's per-row uuid() (122 random bits — the engine's secure
    generator; the reference's fast/secure knob selects entropy
    sources, which Spark does not distinguish, so both accept).  The
    v4 version nibble (hex char 13, always '4') and the variant
    nibble (char 17, 2 fixed bits) are skipped so all 80 emitted
    bits are genuinely random."""
    if encoding not in ("crockford", "hex"):
        raise BloblangError(f"invalid ulid encoding: {encoding}")
    if random_source not in ("secure_random", "fast_random"):
        raise BloblangError(
            f"invalid randomness source: {random_source}")
    ts = F.unix_millis(F.current_timestamp())
    raw_hex = F.upper(
        F.regexp_replace(F.expr("uuid()"), "-", ""))  # 32 hex chars
    # 20 fully-random hex chars: drop the fixed version nibble
    # (position 13) and variant nibble (position 17).
    rnd_hex = F.concat(F.substring(raw_hex, 1, 12),
                       F.substring(raw_hex, 14, 3),
                       F.substring(raw_hex, 18, 5))
    if encoding == "hex":
        return F.concat(F.lpad(F.hex(ts), 12, "0"), rnd_hex)
    # crockford: 10 chars of 48-bit time, 16 chars of 80 random bits
    time_part = _crockford_chars(ts.cast("bigint"), 10)
    r1 = F.conv(F.substring(rnd_hex, 1, 10), 16, 10).cast("bigint")
    r2 = F.conv(F.substring(rnd_hex, 11, 10), 16, 10).cast("bigint")
    return F.concat(time_part, _crockford_chars(r1, 8),
                    _crockford_chars(r2, 8))


# bwmarrin/snowflake's default epoch (Twitter's), public constant
_SNOWFLAKE_EPOCH_MS = 1288834974657


def _fn_snowflake_id(node_id: Any = 1) -> Column:
    """snowflake_id(node_id) (reference
    `internal/impl/lang/bloblang.go:162-190`): 64-bit time-ordered id —
    41 bits of ms since the Twitter epoch, 10 node bits, 12 sequence
    bits — returned as a decimal string.  The distributed mapping: in
    the reference one PROCESS is a generator node with a sequential
    counter that BLOCKS until the next millisecond when the 4096/ms
    sequence overflows; here each Spark TASK is one generator.  The
    node bits are (node_id + spark_partition_id) mod 1024; the
    per-partition row counter's overflow past 12 sequence bits is
    folded into the millisecond field (row >> 12 extra ms — the
    batch analogue of block-until-next-ms), and partitions that
    alias to the same node (1024 apart) are separated by folding
    (partition_id >> 10) into bit 33 of the virtual counter, so the
    (timestamp, node, sequence) triple is injective over every
    (partition, row) pair — no silent collisions at any row count."""
    if isinstance(node_id, Column):
        base = node_id.cast("bigint")
    else:
        node_id = int(node_id)
        if not 0 <= node_id <= 1023:
            raise BloblangError(
                f"snowflake_id node_id must be 0-1023, got {node_id}")
        base = F.lit(node_id)
    pid = F.spark_partition_id().cast("bigint")
    node = F.pmod(base + pid, F.lit(1024))
    ts = F.unix_millis(F.current_timestamp()) - F.lit(
        _SNOWFLAKE_EPOCH_MS)
    # monotonically_increasing_id = partition_id<<33 | row counter;
    # keep the 33-bit row counter, then place partition_id>>10 (the
    # node-alias group) above it so vrow is unique per (node, row).
    row = F.monotonically_increasing_id().bitwiseAND(
        F.lit((1 << 33) - 1))
    vrow = row + F.shiftleft(F.shiftrightunsigned(pid, 10), 33)
    seq = F.pmod(vrow, F.lit(4096))
    ts = ts + F.shiftrightunsigned(vrow, 12)
    return (
        (ts * F.lit(1 << 22)) + (node * F.lit(1 << 12)) + seq
    ).cast("string")


def _fn_with_schema_registry_header(schema_id: Any,
                                    message: Any) -> Column:
    """with_schema_registry_header(schema_id, message) (reference
    `internal/impl/confluent/bloblang.go:30-46`): prepend the
    Confluent wire header — magic byte 0x00 + 4-byte big-endian
    schema id — to the serialized message bytes.  Column-typed
    schema ids are range-checked at runtime (raise_error) so an
    out-of-uint32 value fails loudly, matching the literal path."""
    if not isinstance(schema_id, Column):
        sid_val = int(schema_id)
        if not 0 <= sid_val <= 0xFFFFFFFF:
            raise BloblangError(
                f"schema_id must be 0-4294967295, got {sid_val}")
        sid = F.lit(sid_val)
    else:
        sid = schema_id.cast("bigint")
        sid = F.when(
            (sid >= 0) & (sid <= F.lit(0xFFFFFFFF)), sid
        ).otherwise(F.raise_error(F.concat(
            F.lit("schema_id must be 0-4294967295, got "),
            sid.cast("string"))))
    header = F.unhex(F.lpad(F.hex(sid.cast("bigint")), 8, "0"))
    msg = message if isinstance(message, Column) else F.lit(message)
    return F.concat(F.lit(bytes([0])), header, msg.cast("binary"))


def _fn_env(name: Any, no_cache: Any = False) -> Column:
    """env(name) (functions.adoc:707): plan-time environment lookup
    (the reference resolves once at config parse unless no_cache)."""
    import os as _os

    return F.lit(_os.environ.get(str(name)))


def _fn_hostname() -> Column:
    import socket as _socket

    return F.lit(_socket.gethostname())


def _fn_pi() -> Column:
    import math as _math

    return F.lit(_math.pi)


_NANOID_ALPHABET = (
    "useandom-26T198340PX75pxJACKVERYMINDBUSHWOLF_GQZbfghjklqvwyzrict"
)


def _fn_nanoid(length: Any = 21, alphabet: Any = None) -> Column:
    """nanoid() (functions.adoc:196): 21 chars from the canonical
    64-symbol alphabet. Column algebra: each char consumes one random
    BYTE (two hex chars) mod 64 — 256 % 64 == 0, so the draw is
    UNBIASED; entropy from md5 chains over per-row uuid()."""
    n = int(length)
    if alphabet is not None:
        raise BloblangError(
            "nanoid custom alphabets run on the dynamic path")
    if not 1 <= n <= 64:
        raise BloblangError(f"nanoid length must be 1-64, got {n}")
    seed = F.expr("uuid()")
    # 2 hex chars per output char → need ceil(2n/32) md5 blocks
    blocks = [F.md5(F.concat(seed, F.lit(str(i))))
              for i in range((2 * n + 31) // 32)]
    hexs = F.concat(*blocks)
    alpha = F.split(F.lit(_NANOID_ALPHABET), "")
    chars = [
        F.element_at(
            alpha,
            (F.conv(F.substring(hexs, 2 * i + 1, 2), 16, 10)
             .cast("int") % 64) + 1,
        )
        for i in range(n)
    ]
    return F.concat(*chars)


def _fn_bytes(length: Any) -> Column:
    """bytes(length) (functions.adoc:33): zero-initialized byte array
    of the given size."""
    if isinstance(length, Column):
        return F.unhex(F.repeat(F.lit("00"), length.cast("int")))
    n = int(length)
    if n < 0:
        raise BloblangError(f"bytes() length must be >= 0, got {n}")
    return F.lit(bytes(n))


def _fn_uuid_v7(time: Any = None) -> Column:
    """uuid_v7([time]) (functions.adoc:423): RFC 9562 time-ordered
    UUID — 48-bit unix milliseconds, version nibble 7, variant bits
    10, 74 random bits. Randomness derives from Spark's per-row
    uuid() with the v4 fixed version/variant nibbles excised (same
    technique as ulid())."""
    if time is None:
        ms = F.unix_millis(F.current_timestamp())
    elif isinstance(time, Column):
        ms = F.unix_millis(time.cast("timestamp"))
    else:
        ms = F.unix_millis(F.lit(time).cast("timestamp"))
    time_hex = F.lower(F.lpad(F.hex(ms.cast("bigint")), 12, "0"))
    raw = F.lower(F.regexp_replace(F.expr("uuid()"), "-", ""))
    # 20 genuinely random hex chars (drop v4's fixed nibbles 13 & 17)
    rnd = F.concat(F.substring(raw, 1, 12), F.substring(raw, 14, 3),
                   F.substring(raw, 18, 5))
    variant = F.element_at(
        F.array(F.lit("8"), F.lit("9"), F.lit("a"), F.lit("b")),
        (F.conv(F.substring(rnd, 4, 1), 16, 10).cast("int") % 4) + 1,
    )
    return F.concat(
        F.substring(time_hex, 1, 8), F.lit("-"),
        F.substring(time_hex, 9, 4), F.lit("-"),
        F.lit("7"), F.substring(rnd, 1, 3), F.lit("-"),
        variant, F.substring(rnd, 5, 3), F.lit("-"),
        F.substring(rnd, 8, 12),
    )


# plan-time file() cache (functions.adoc:733 caches after first read)
_FILE_CACHE: dict[str, bytes] = {}


def _read_file(path: str, base_dir: str | None = None,
               no_cache: bool = False) -> Any:
    """file()/file_rel() (functions.adoc:733,759): plan-time read —
    config-time lookups like env(), not a per-row distributed read.
    Returns str when the content is valid UTF-8 (the engine's string
    norm; .string() is then the identity), bytes otherwise."""
    import os as _os

    p = path if _os.path.isabs(path) else _os.path.join(
        base_dir or ".", path)
    p = _os.path.abspath(p)
    if no_cache or p not in _FILE_CACHE:
        with open(p, "rb") as fh:
            data = fh.read()
        if no_cache:
            return _decode_file(data)
        _FILE_CACHE[p] = data
    return _decode_file(_FILE_CACHE[p])


def _decode_file(data: bytes) -> Any:
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return data


FUNCTIONS = {
    "now": _fn_now,
    "uuid_v4": _fn_uuid_v4,
    "uuid_v7": _fn_uuid_v7,
    "bytes": _fn_bytes,
    "env": _fn_env,
    "hostname": _fn_hostname,
    "pi": _fn_pi,
    "nanoid": _fn_nanoid,
    "counter": _fn_counter,
    "random_int": _fn_random_int,
    "timestamp_unix": _fn_timestamp_unix,
    "timestamp_unix_milli": lambda: F.unix_millis(F.current_timestamp()),
    "timestamp_unix_micro": lambda: F.unix_micros(F.current_timestamp()),
    "timestamp_unix_nano": lambda: F.unix_micros(
        F.current_timestamp()) * 1000,
    "range": _fn_range,
    "throw": _fn_throw,
    "fake": _fn_fake,
    "tracing_id": _fn_tracing_id,
    "tracing_span": _fn_tracing_span,
    "ulid": _fn_ulid,
    "snowflake_id": _fn_snowflake_id,
    "with_schema_registry_header": _fn_with_schema_registry_header,
}


class Compiler:
    def __init__(self, env: dict[str, Column] | None = None):
        self.env: dict[str, Column] = dict(env or {})
        # named maps (about.adoc maps): name -> A.MapDef, applied via
        # .apply("name"); expansion is static (Column algebra cannot
        # recurse on data depth), guarded by a cycle stack
        self.maps: dict[str, "A.MapDef"] = {}
        self._apply_stack: list[str] = []
        # when set, counter() compiles to this column instead of the
        # global-sort fallback (generate inputs bind the range index)
        self.counter_col: Column | None = None
        # document context, bound by compile_mapping: the frame's
        # non-reserved columns, whether the frame is a raw `content`
        # envelope, batch-scope keys (group_key / batch_id / window
        # stamps), arrival-order column, and whether the frame carries
        # the _error / _error_source columns (errors.py model)
        self.doc_cols: list[str] | None = None
        # every frame column incl. internal (_-prefixed) ones:
        # `this._gen_index` must keep resolving even though internal
        # columns are outside the document
        self.all_cols: list[str] | None = None
        # names assigned by EARLIER statements of the mapping being
        # compiled: `this.<name>` resolves to them through Spark's
        # lateral column aliases (the engine's sequential-assignment
        # behavior, pinned by test_bloblang.py::test_if_else_and_match);
        # only genuinely-absent names compile to Bloblang's null
        self.assigned: set[str] = set()
        self.raw_content: bool = False
        self.batch_keys: list[Column] = []
        self.order_col: Column | None = None
        self.has_error_col: bool = False
        self.has_error_source: bool = False
        self.has_meta_col: bool = False
        # root_meta(): meta assignments made so far in this mapping
        self.meta_env: dict[str, Column] = {}
        # file_rel() base directory (the mapping file's dir when known)
        self.mapping_dir: str | None = None
        # set when a batch-scoped function/method (batch_index,
        # batch_size, count, from_all, from) compiled — compile_mapping
        # then materializes assignments BEFORE any deleted() filter so
        # window aggregates see the whole batch
        self.used_batch: bool = False

    def _order(self) -> Column:
        """Within-batch order for batch_index()/from_all(). An
        explicit `_arrival_order`/`_gen_index` column gives the exact
        arrival order (deterministic across runs); without one,
        monotonically_increasing_id() yields SOME stable total order
        for the run — fine for order-insensitive reduces (the
        sum/unique shapes of the reference's worked examples) but an
        order-sensitive mapping should stamp an arrival column."""
        return (
            self.order_col
            if self.order_col is not None
            else F.monotonically_increasing_id()
        )

    def _batch_index_col(self) -> Column:
        """batch_index() (functions.adoc:446): zero-based position of
        the message within its batch, in arrival order. Batch = the
        frame's batch-scope keys (group_key after group_by_value,
        window stamps after the system_window buffer, batch_id after a
        batching policy); with no keys the whole input is one batch
        (the reference's input batch). One shuffle on the batch keys;
        all batch functions in a mapping share the same Window spec so
        Catalyst plans a single WindowExec."""
        from pyspark.sql import Window

        self.used_batch = True
        w = Window.partitionBy(*self.batch_keys).orderBy(self._order())
        return (F.row_number().over(w) - 1).cast("long")

    def _batch_size_col(self) -> Column:
        """batch_size() (functions.adoc:463): message count of the
        current batch."""
        from pyspark.sql import Window

        self.used_batch = True
        w = (
            Window.partitionBy(*self.batch_keys)
            .orderBy(self._order())
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)
        )
        return F.count(F.lit(1)).over(w).cast("long")

    def _from_all_col(self, target: Column) -> Column:
        """.from_all() (methods.adoc message-info): the target
        expression evaluated across EVERY message of the batch, as an
        array in arrival order — collect_list over the batch window."""
        from pyspark.sql import Window

        self.used_batch = True
        w = (
            Window.partitionBy(*self.batch_keys)
            .orderBy(self._order())
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)
        )
        out = F.collect_list(target).over(w)
        out._bl_arrayish = True
        return out

    def _count_col(self) -> Column:
        """count(name) (functions.adoc:919, deprecated): shared named
        counter starting at 1 — within one mapping execution each row
        draws the next value in arrival order. Global row_number (the
        semantics is inherently a global sequence, same note as
        counter()); generate inputs bind the dense range index."""
        from pyspark.sql import Window

        self.used_batch = True
        if self.counter_col is not None:
            return (self.counter_col + 1).cast("long")
        w = Window.orderBy(self._order())
        return F.row_number().over(w).cast("long")

    def _content_col(self) -> Column:
        """content() (functions.adoc:480): the full raw message
        payload — the `content` column on raw-envelope frames, the
        serialized document on structured frames."""
        if self.raw_content:
            out = F.col("content")
            out._bl_stringish = True
            return out
        if self.doc_cols:
            out = F.to_json(F.struct(*[F.col(c) for c in self.doc_cols]))
            out._bl_stringish = True
            return out
        raise BloblangError(
            "content() needs a document context (mapping over a frame)"
        )

    def _json_col(self, args: list) -> Column:
        """json([path]) (functions.adoc): the document root or a
        dot-path within it. On raw `content` frames the path reads via
        get_json_object (pushed to the JSON scan when possible); on
        structured frames it navigates columns/struct fields."""
        if not args:
            if self.raw_content:
                raise BloblangError(
                    "json() whole-document on a raw frame is dynamic "
                    "(no static schema); use json(path)"
                )
            if self.doc_cols:
                return F.struct(*[F.col(c) for c in self.doc_cols])
            raise BloblangError("json() needs a document context")
        path = args[0]
        if not isinstance(path, str):
            raise BloblangError("json() needs a literal string path")
        if self.raw_content:
            return F.get_json_object(F.col("content"), "$." + path)
        parts = path.split(".")
        if self.doc_cols is not None and parts[0] not in self.doc_cols:
            raise BloblangError(
                f"json({path!r}): no column {parts[0]!r} in the document"
            )
        out = F.col(parts[0])
        for part in parts[1:]:
            out = out.getField(part)
        return out

    def _error_fn_col(self, name: str) -> Column:
        """error()/errored()/error_source_* (functions.adoc:504-583)
        over the _error/_error_source column model (errors.py)."""
        if not self.has_error_col:
            if name == "errored":
                return F.lit(False)
            return F.lit(None).cast("string")
        err = F.col("_error")
        if name == "error":
            return err
        if name == "errored":
            return err.isNotNull()
        field = name[len("error_source_"):]  # label | name | path
        if not self.has_error_source:
            # label → "" when errored but unlabeled; name/path → null
            if field == "label":
                return F.when(err.isNotNull(), F.lit(""))
            return F.lit(None).cast("string")
        src = F.col("_error_source").getField(field)
        if field == "label":
            return F.when(err.isNotNull(), F.coalesce(src, F.lit("")))
        return F.when(err.isNotNull(), src)

    def _root_meta_col(self, args: list) -> Column:
        """root_meta(key) (functions.adoc:962): metadata of the NEW
        message — reflects `meta k = v` assignments made so far in
        this mapping, falling back to the input's _meta entry."""
        if not args:
            entries = [
                x for k, v in self.meta_env.items()
                for x in (F.lit(k), v.cast("string"))
            ]
            assigned = (
                F.create_map(*entries) if entries
                else F.create_map().cast("map<string,string>")
            )
            if self.doc_cols is not None and self.has_meta_col:
                keys = list(self.meta_env.keys())
                base = F.col(META_COL)
                if keys:
                    base = F.map_filter(
                        base, lambda k, _v: ~k.isin(*keys))
                return F.map_concat(base, assigned)
            return assigned
        key = args[0]
        if not isinstance(key, str):
            raise BloblangError("root_meta() needs a literal key")
        if key in self.meta_env:
            return self.meta_env[key].cast("string")
        if self.has_meta_col:
            return F.col(META_COL).getItem(key)
        return F.lit(None).cast("string")

    # value may be a Column or a plain Python literal; the caller lifts
    # literals with F.lit only where a Column is required, so method
    # impls can see real Python values (formats, codec names, …).
    def eval(self, node: A.Node, scope: dict[str, Column] | None = None) -> Any:
        scope = scope or {}
        if isinstance(node, A.Lit):
            return node.value
        if isinstance(node, A.ArrayLit):
            return F.array(*[self.col(i, scope) for i in node.items])
        if isinstance(node, A.ObjectLit):
            return F.struct(
                *[self.col(v, scope).alias(k) for k, v in node.pairs]
            )
        if isinstance(node, A.This):
            if "__this__" in scope:
                # inside an applied named map, `this` IS the applied
                # value (about.adoc maps)
                return scope["__this__"]
            raise BloblangError(
                "`this` used as a whole document is only valid in "
                "`root = this` (identity); reference fields as this.<name>"
            )
        if isinstance(node, A.Field):
            if isinstance(node.target, A.This):
                # lambda params shadow document fields (`x -> x * 2`
                # parses `x` as a bare field ref)
                if node.name in scope:
                    return scope[node.name]
                if "__this__" in scope:
                    return scope["__this__"].getField(node.name)
                if self.raw_content and node.name != "content":
                    # a raw `content` envelope has no static schema
                    # for this.<field> — the dynamic evaluator parses
                    # the payload per message (mapping fallback)
                    raise BloblangError(
                        f"this.{node.name} on a raw content frame is "
                        "dynamic (no static schema)"
                    )
                if (
                    self.doc_cols is not None
                    and node.name not in self.doc_cols
                    and node.name not in (self.all_cols or ())
                    and node.name not in self.assigned
                ):
                    # Bloblang: a missing document field is null
                    # (about.adoc paths) — never an analysis error
                    return F.lit(None)
                return F.col(node.name)
            target = self.col(node.target, scope)
            return target.getField(node.name)
        if isinstance(node, A.Index):
            target = self.col(node.target, scope)
            idx = self.eval(node.index, scope)
            if isinstance(idx, int):
                return F.element_at(target, idx + 1 if idx >= 0 else idx)
            return F.element_at(target, idx)
        if isinstance(node, A.Var):
            if node.name in scope:
                return scope[node.name]
            if node.name not in self.env:
                raise BloblangError(f"unknown variable ${node.name}")
            return self.env[node.name]
        if isinstance(node, A.Unary):
            operand = self.col(node.operand, scope)
            return -operand if node.op == "-" else ~operand
        if isinstance(node, A.Binary):
            return self._binary(node, scope)
        if isinstance(node, A.If):
            cond = self.col(node.cond, scope)
            then = self.col(node.then, scope)
            if node.otherwise is None:
                return F.when(cond, then)
            return F.when(cond, then).otherwise(
                self.col(node.otherwise, scope)
            )
        if isinstance(node, A.Match):
            return self._match(node, scope)
        if isinstance(node, A.Func):
            name = node.name
            if name == "meta":
                key = self.eval(node.args[0], scope) if node.args else None
                if not isinstance(key, str):
                    raise BloblangError("meta() needs a literal key")
                out = F.col(META_COL).getItem(key)
                # metadata values are strings — `meta(k) + content()`
                # is concatenation (about.adoc:264-277)
                out._bl_stringish = True
                return out
            if name == "counter" and self.counter_col is not None:
                return self.counter_col
            # context-bound functions (document / batch / error model)
            if name == "batch_index":
                return self._batch_index_col()
            if name == "batch_size":
                return self._batch_size_col()
            if name == "count":
                return self._count_col()
            if name == "content":
                return self._content_col()
            if name in ("error", "errored", "error_source_label",
                        "error_source_name", "error_source_path"):
                return self._error_fn_col(name)
            pos, kw = self._call_args(node.args, scope)
            if name == "json":
                return self._json_col(pos)
            if name == "root_meta":
                return self._root_meta_col(pos)
            if name in ("file", "file_rel"):
                path = kw.pop("path", pos[0] if pos else None)
                if not isinstance(path, str):
                    raise BloblangError(
                        f"{name}() needs a literal string path")
                no_cache = bool(
                    kw.pop("no_cache",
                           pos[1] if len(pos) > 1 else False))
                base = self.mapping_dir if name == "file_rel" else None
                return F.lit(_read_file(path, base, no_cache))
            fn = FUNCTIONS.get(name)
            if fn is None:
                raise BloblangError(f"unknown function {name}()")
            return fn(*pos, **kw)
        if isinstance(node, A.Method):
            target = self.col(node.target, scope)
            if node.name == "apply":
                if len(node.args) != 1 or not isinstance(node.args[0], A.Lit):
                    raise BloblangError('.apply needs a literal map name')
                return self._apply_map(node.args[0].value, target, scope)
            if node.name == "from_all":
                return self._from_all_col(target)
            if node.name == "from":
                # .from(n): the expression evaluated on batch message n
                idx = self.eval(node.args[0], scope)
                if not isinstance(idx, int):
                    raise BloblangError(".from() needs a literal index")
                out = F.element_at(
                    self._from_all_col(target),
                    idx + 1 if idx >= 0 else idx,
                )
                if isinstance(target, Column) and target.__dict__.get(
                    "_bl_stringish", False
                ):
                    # element type follows the target expression
                    out._bl_stringish = True
                return out
            arrayish = isinstance(target, Column) and target.__dict__.get(
                "_bl_arrayish", False)
            if node.name == "length" and arrayish:
                # .length() on a from_all() array is element count
                return F.size(target)
            impl = METHODS.get(node.name)
            if impl is None:
                raise BloblangError(f"unknown method .{node.name}()")
            args = [self._method_arg(a, scope) for a in node.args]
            out = impl(target, *args)
            if arrayish and node.name in (
                "unique", "sort", "reverse", "flatten", "filter",
                "map_each", "slice", "append", "concat",
            ):
                out._bl_arrayish = True
            if node.name in (
                "split", "keys", "values", "re_find_all",
                "enumerated", "key_values", "zip", "array",
            ):
                # these methods PRODUCE arrays whatever the target —
                # a following .length() must count elements
                out._bl_arrayish = True
            return out
        if isinstance(node, A.Coalesce):
            return F.coalesce(
                *[self.col(alt, scope) for alt in node.alternatives]
            )
        if isinstance(node, A.Deleted):
            raise BloblangError(
                "deleted() is only valid as an assignment result"
            )
        raise BloblangError(f"cannot compile node {node!r}")

    def col(self, node: A.Node, scope: dict[str, Column] | None = None) -> Column:
        v = self.eval(node, scope or {})
        return v if isinstance(v, Column) else F.lit(v)

    def _call_args(
        self, args: tuple, scope: dict[str, Column]
    ) -> tuple[list, dict]:
        """Split call args into (positional, keyword) — NamedArg nodes
        become kwargs (functions.adoc named parameters)."""
        pos: list = []
        kw: dict = {}
        for a in args:
            if isinstance(a, A.NamedArg):
                kw[a.name] = self.eval(a.value, scope)
            else:
                pos.append(self.eval(a, scope))
        return pos, kw

    def _apply_map(
        self, name: str, target: Column, scope: dict[str, Column]
    ) -> Column:
        """Statically expand a named map with `this` bound to the
        receiver. Recursion cannot be expressed in Column algebra, so a
        cycle raises (the reference recurses on data depth at runtime;
        `bloblang/pyeval.py` covers that dynamic path)."""
        mp = self.maps.get(name)
        if mp is None:
            raise BloblangError(f"unknown map {name!r}")
        if name in self._apply_stack:
            raise BloblangError(
                f"recursive map application {' -> '.join(self._apply_stack)}"
                f" -> {name} is not expressible as a static plan"
            )
        self._apply_stack.append(name)
        try:
            local = dict(scope)
            local["__this__"] = target
            whole: Column | None = None
            tree: dict = {}
            for stmt in mp.statements:
                if isinstance(stmt, A.Let):
                    local[stmt.name] = self.col(stmt.expr, local)
                elif isinstance(stmt, A.Assign):
                    if not stmt.path:
                        whole = self.col(stmt.expr, local)
                    elif len(stmt.path) == 1:
                        tree[stmt.path[0]] = self.col(stmt.expr, local)
                    else:
                        _nested_set(tree, stmt.path, self.col(stmt.expr, local))
                else:
                    raise BloblangError(
                        f"maps support root/let statements, got {stmt!r}"
                    )
            if whole is not None and not tree:
                return whole
            if not tree:
                raise BloblangError(f"map {name!r} assigns nothing")
            return _tree_to_struct(tree)
        finally:
            self._apply_stack.pop()

    def _method_arg(self, node: A.Node, scope: dict[str, Column]) -> Any:
        if isinstance(node, A.Lambda):
            param = node.params[0]

            def fn(c: Column) -> Column:
                inner = dict(scope)
                inner[param] = c
                return self.col(node.body, inner)

            return fn
        if isinstance(node, A.ArrayLit) and all(
            isinstance(i, A.Lit) for i in node.items
        ):
            # all-literal array args arrive as plain Python lists so
            # methods like replace_many can iterate them; methods that
            # want a Column lift with _lit (F.lit accepts lists)
            return [i.value for i in node.items]
        return self.eval(node, scope)

    def _binary(self, node: A.Binary, scope: dict[str, Column]) -> Column:
        left_v = self.eval(node.left, scope)
        right_v = self.eval(node.right, scope)
        op = node.op
        # `+` on strings is concatenation (about.adoc:264-277); the
        # intent is unambiguous when either operand is a string
        # literal OR a Column already known to be string-ish (a prior
        # concat / .string() — tracked via a marker attribute), so
        # chains like `a + " " + b + c` stay concatenation throughout.
        def _stringish(v) -> bool:
            # NB: Column.__getattr__ fabricates field-access Columns,
            # so probe __dict__ directly instead of getattr
            return isinstance(v, str) or (
                isinstance(v, Column)
                and v.__dict__.get("_bl_stringish", False)
            )

        if op == "+" and (_stringish(left_v) or _stringish(right_v)):
            if isinstance(left_v, str) and isinstance(right_v, str):
                return F.lit(left_v + right_v)
            out = F.concat(
                left_v if isinstance(left_v, Column) else F.lit(left_v),
                right_v if isinstance(right_v, Column) else F.lit(right_v),
            )
            out._bl_stringish = True
            return out
        left = left_v if isinstance(left_v, Column) else F.lit(left_v)
        right = right_v if isinstance(right_v, Column) else F.lit(right_v)
        if op == "+":
            return left + right
        if op == "-":
            return left - right
        if op == "*":
            return left * right
        if op == "/":
            return left / right
        if op == "%":
            return left % right
        if op == "==":
            return left == right
        if op == "!=":
            return left != right
        if op == "<":
            return left < right
        if op == "<=":
            return left <= right
        if op == ">":
            return left > right
        if op == ">=":
            return left >= right
        if op == "&&":
            return left & right
        if op == "||":
            return left | right
        raise BloblangError(f"unknown operator {op}")

    def _match(self, node: A.Match, scope: dict[str, Column]) -> Column:
        subject = (
            self.col(node.subject, scope) if node.subject is not None else None
        )
        if subject is not None:
            # the matched value rebinds `this` inside patterns and
            # results (about.adoc:294-314: `match expr { this == .. }`)
            scope = dict(scope)
            scope["__this__"] = subject
        expr: Column | None = None
        default: Column | None = None
        for case in node.cases:
            if case.pattern is None:
                default = self.col(case.result, scope)
                # Bloblang takes the FIRST matching case; a `_` default
                # matches everything, so later cases are unreachable.
                break
            pat_v = self.eval(case.pattern, scope)
            if subject is not None and not isinstance(pat_v, Column):
                cond = subject == F.lit(pat_v)
            elif subject is not None and isinstance(pat_v, Column):
                # boolean-expression case inside a value match
                cond = pat_v.cast("boolean")
            else:
                cond = pat_v if isinstance(pat_v, Column) else F.lit(bool(pat_v))
            result = self.col(case.result, scope)
            expr = F.when(cond, result) if expr is None else expr.when(cond, result)
        if expr is None:
            if default is None:
                raise BloblangError("match with no cases")
            return default
        return expr.otherwise(default) if default is not None else expr


def _frame_compiler(
    df, env: dict[str, Column] | None = None
) -> "Compiler":
    """A Compiler bound to a frame's document context (doc columns,
    raw-content envelope detection, meta/error columns, batch keys) —
    the same setup compile_mapping performs."""
    comp = Compiler(env)
    reserved = {META_COL, "_error", "_error_source"}
    comp.doc_cols = [
        c for c in df.columns
        if c not in reserved and c not in BATCH_KEY_COLS
        and not c.startswith("_")
    ]
    comp.raw_content = comp.doc_cols == ["content"]
    comp.all_cols = list(df.columns)
    comp.has_error_col = "_error" in df.columns
    comp.has_error_source = "_error_source" in df.columns
    comp.has_meta_col = META_COL in df.columns
    comp.batch_keys = [
        F.col(c) for c in BATCH_KEY_COLS if c in df.columns
    ]
    if "_arrival_order" in df.columns:
        comp.order_col = F.col("_arrival_order")
    elif "_gen_index" in df.columns:
        comp.order_col = F.col("_gen_index")
    return comp


def compile_expression(
    src: str, env: dict[str, Column] | None = None, df=None
) -> Column:
    """Compile a single Bloblang expression to a Column. Pass `df` to
    bind document context (content()/meta()/json() resolve against
    the frame's envelope shape instead of assuming typed columns)."""
    comp = _frame_compiler(df, env) if df is not None else Compiler(env)
    return comp.col(parse_expression(src))


def _surviving_branch(node: A.Node):
    """For `root = if cond { deleted() } else { X }` forms, the branch
    surviving rows take (None when both delete or not an if)."""
    if isinstance(node, A.If):
        then_del = isinstance(node.then, A.Deleted)
        else_del = node.otherwise is not None and isinstance(
            node.otherwise, A.Deleted
        )
        if then_del and not else_del:
            return node.otherwise
        if else_del and not then_del:
            return node.then
    return None


def _delete_condition(node: A.Node, comp: Compiler) -> Column | None:
    """For `root = if cond { deleted() } ...` forms, the row-drop
    predicate; None when the expr never deletes."""
    if isinstance(node, A.Deleted):
        return F.lit(True)
    if isinstance(node, A.If):
        cond = comp.col(node.cond)
        then_del = isinstance(node.then, A.Deleted)
        else_del = node.otherwise is not None and isinstance(
            node.otherwise, A.Deleted
        )
        if then_del and else_del:
            return F.lit(True)
        if then_del:
            return cond
        if else_del:
            return ~cond
    return None


def _nested_set(tree: dict, path: tuple[str, ...], value: Column) -> None:
    node = tree.setdefault(path[0], {})
    for part in path[1:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def _tree_to_struct(tree) -> Column:
    if isinstance(tree, Column):
        return tree
    return F.struct(
        *[_tree_to_struct(v).alias(k) for k, v in tree.items()]
    )


def compile_interpolation(
    src: str, env: dict[str, Column] | None = None, df=None
) -> Column:
    """Interpolation strings `prefix-${! expr }-suffix`
    (docs/modules/configuration: field interpolation, e.g.
    config/examples/joining_streams.yaml:21,51-53) → one concat
    Column. Plain strings compile to a literal. Pass `df` to bind
    document context (content()/meta() against the frame's shape)."""
    import re as _re

    parts = _re.split(r"\$\{!\s*(.*?)\s*\}", src)
    if len(parts) == 1:
        return F.lit(src)
    cols: list[Column] = []
    for i, part in enumerate(parts):
        if i % 2 == 0:
            if part:
                cols.append(F.lit(part))
        else:
            comp = (
                _frame_compiler(df, env) if df is not None
                else Compiler(env)
            )
            cols.append(
                comp.col(parse_expression(part)).cast("string")
            )
    return F.concat(*cols) if len(cols) > 1 else cols[0]


BATCH_KEY_COLS = (
    "group_key", "batch_id", "window_start", "window_end_timestamp",
)


def compile_mapping(
    df: DataFrame, src: str, mode: str = "mapping",
    mapping_dir: str | None = None,
) -> DataFrame:
    """Apply a Bloblang mapping/mutation to a DataFrame.

    mode="mapping": output has exactly the assigned columns (a fresh
    document, mapping.adoc:26). mode="mutation": assignments merge into
    the existing columns (mutation.adoc:26).

    Batch scope (batch_index/batch_size/from_all, functions.adoc:446):
    the frame's batch-stamp columns — group_key (group_by_value),
    batch_id (batching policy), window_start/window_end_timestamp
    (system_window buffer) — define the batch; with none, the whole
    input is one batch. Batch functions compile to window expressions
    over those keys (one shuffle, shared WindowExec).
    """
    ast = parse_mapping(src)
    comp = Compiler()
    comp.mapping_dir = mapping_dir
    reserved = {META_COL, "_error", "_error_source"}
    comp.doc_cols = [
        c for c in df.columns
        if c not in reserved and c not in BATCH_KEY_COLS
        and not c.startswith("_")
    ]
    comp.raw_content = comp.doc_cols == ["content"]
    comp.all_cols = list(df.columns)
    comp.has_error_col = "_error" in df.columns
    comp.has_error_source = "_error_source" in df.columns
    comp.has_meta_col = META_COL in df.columns
    comp.batch_keys = [
        F.col(c) for c in BATCH_KEY_COLS if c in df.columns
    ]
    if "_arrival_order" in df.columns:
        comp.order_col = F.col("_arrival_order")
    elif "_gen_index" in df.columns:
        comp.order_col = F.col("_gen_index")
    if "_gen_index" in df.columns:
        # generate-input frames carry a dense global range index;
        # counter() binds to it directly (no global sort needed)
        comp.counter_col = F.col("_gen_index")
    assigns: dict[str, Column] = {}
    nested: dict = {}
    meta_assigns: dict[str, Column] = {}
    delete_cond: Column | None = None
    identity_root = False

    # named maps are hoisted: usable regardless of definition order
    for stmt in ast.statements:
        if isinstance(stmt, A.MapDef):
            comp.maps[stmt.name] = stmt

    for stmt in ast.statements:
        if isinstance(stmt, A.MapDef):
            continue
        if isinstance(stmt, A.Let):
            comp.env[stmt.name] = comp.col(stmt.expr)
        elif isinstance(stmt, A.MetaAssign):
            value = comp.col(stmt.expr)
            meta_assigns[stmt.key] = value
            # root_meta() sees assignments made so far (sequential
            # new-message metadata, functions.adoc:962)
            comp.meta_env[stmt.key] = value
        elif isinstance(stmt, A.Assign):
            if not stmt.path:
                dc = _delete_condition(stmt.expr, comp)
                if dc is not None:
                    other = _surviving_branch(stmt.expr)
                    if other is not None and not isinstance(
                        other, (A.This, A.Deleted)
                    ):
                        if isinstance(other, A.ObjectLit):
                            for k, v in other.pairs:
                                assigns[k] = comp.col(v)
                        else:
                            raise BloblangError(
                                "root = if .. deleted() forms support "
                                "`this` or an object literal on the "
                                "surviving branch"
                            )
                    delete_cond = (
                        dc if delete_cond is None else delete_cond | dc
                    )
                    continue
                if isinstance(stmt.expr, A.This):
                    identity_root = True
                    continue
                if isinstance(stmt.expr, A.ObjectLit):
                    # root = { ... } — expand keys into assignments
                    for k, v in stmt.expr.pairs:
                        assigns[k] = comp.col(v)
                        comp.assigned.add(k)
                    continue
                raise BloblangError(
                    "whole-document `root =` supports `this`, object "
                    "literals, or deleted() forms; assign named "
                    "fields otherwise"
                )
            if len(stmt.path) > 1:
                # `root.a.b = expr` → struct assembly under `a`
                # (about.adoc:19-52 nested assignment). Sequential
                # semantics: if `a` was already assigned FLAT, the
                # nested write updates that value in place
                # (withField), never silently disappears.
                top = stmt.path[0]
                if top in assigns:
                    assigns[top] = assigns[top].withField(
                        ".".join(stmt.path[1:]), comp.col(stmt.expr)
                    )
                else:
                    _nested_set(nested, stmt.path, comp.col(stmt.expr))
                comp.assigned.add(top)
                continue
            # a flat assignment AFTER nested writes overwrites the
            # whole value (sequential semantics) — drop the pending
            # nested tree for that key
            nested.pop(stmt.path[0], None)
            assigns[stmt.path[0]] = comp.col(stmt.expr)
            comp.assigned.add(stmt.path[0])
        else:  # pragma: no cover
            raise BloblangError(f"unknown statement {stmt!r}")

    # merge nested trees into struct columns (later flat assignment to
    # the same name wins, matching sequential Bloblang semantics)
    for top, tree in nested.items():
        if top not in assigns:
            assigns[top] = _tree_to_struct(tree)

    out = df
    if comp.used_batch:
        # Batch-scoped window aggregates must see the WHOLE batch, and
        # Spark cannot host window functions in a WHERE clause — so
        # materialize every assignment plus the deleted() predicate in
        # ONE projection first, then filter on the materialized
        # boolean. All batch expressions share the same Window spec,
        # so this stays a single WindowExec after one exchange on the
        # batch keys.
        tmp_names = {k: f"_bl_v_{i}" for i, k in enumerate(assigns)}
        proj = [F.col(c) for c in out.columns]
        proj += [v.alias(tmp_names[k]) for k, v in assigns.items()]
        if delete_cond is not None:
            proj.append(delete_cond.alias("_bl_del"))
        out = out.select(*proj)
        if delete_cond is not None:
            out = out.filter(~F.col("_bl_del")).drop("_bl_del")
        assigns = {k: F.col(tmp_names[k]) for k in assigns}
    elif delete_cond is not None:
        out = out.filter(~delete_cond)

    if meta_assigns:
        if META_COL not in out.columns:
            out = out.withColumn(
                META_COL,
                F.create_map().cast("map<string,string>"),
            )
        entries = [
            x
            for k, v in meta_assigns.items()
            for x in (F.lit(k), v.cast("string"))
        ]
        out = out.withColumn(
            META_COL,
            F.map_concat(
                F.map_filter(
                    F.col(META_COL),
                    lambda k, _v: ~k.isin(*meta_assigns.keys()),
                ),
                F.create_map(*entries),
            ),
        )

    if comp.raw_content and assigns and (
        mode == "mutation" or identity_root
    ):
        # merging field assignments INTO a raw content envelope needs
        # the payload parsed per message — Column algebra would bolt
        # typed columns beside the unparsed `content` (the d6fd1df
        # envelope-corruption class); the dynamic fallback owns this
        raise BloblangError(
            "assignments into a raw content frame are dynamic "
            "(no static schema to merge into)"
        )
    if mode == "mutation" or identity_root:
        if assigns:
            out = out.withColumns(assigns)
        tmps = [c for c in out.columns if c.startswith("_bl_v_")]
        return out.drop(*tmps) if tmps else out
    if mode == "mapping":
        if not assigns:
            return out
        keep = [v.alias(k) for k, v in assigns.items()]
        if META_COL in out.columns:
            keep.append(F.col(META_COL))
        return out.select(*keep)
    raise BloblangError(f"unknown mode {mode!r}")
