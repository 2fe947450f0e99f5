"""Property tests (hypothesis) for the round-4 codecs: transform-ABI
varint/record serde, bcrypt base64, WASM LEB128 + i32/i64 arithmetic
laws, argon2 PHC roundtrip, UAX #29 concat invariant."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from connect_spark.wasm.transform import (
    TransformMessage,
    _get_sized,
    _get_varint,
    _put_sized,
    _put_varint,
)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_go_varint_roundtrips_any_int(n):
    buf = _put_varint(n)
    got, pos = _get_varint(buf, 0)
    assert got == n and pos == len(buf)


@settings(max_examples=150, deadline=None)
@given(st.one_of(st.none(), st.binary(max_size=200)))
def test_sized_bytes_roundtrip(b):
    buf = _put_sized(b)
    got, pos = _get_sized(buf, 0)
    assert pos == len(buf)
    if b is None:
        assert got is None
    else:
        assert bytes(got) == b


@settings(max_examples=100, deadline=None)
@given(
    st.binary(max_size=120),
    st.one_of(st.none(), st.binary(max_size=40)),
    st.lists(
        st.tuples(
            st.text(max_size=10).filter(lambda s: "\x00" not in s),
            st.binary(max_size=30),
        ),
        max_size=4,
    ),
)
def test_transform_message_serde_roundtrips(value, key, headers):
    m = TransformMessage(value=value, key=key, headers=headers)
    back = TransformMessage.deserialize(m.serialize())
    assert back.value == value
    assert (back.key is None) == (key is None)
    if key is not None:
        assert back.key == key
    assert back.headers == headers


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=1, max_size=60))
def test_bcrypt_base64_roundtrips(b):
    from connect_spark.functions.bcrypt_py import _b64_decode, _b64_encode

    enc = _b64_encode(b)
    assert _b64_decode(enc)[: len(b)] == b


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_wasm_uleb_roundtrips(n):
    from connect_spark.wasm.interp import _Reader
    from tests.wasm_asm import leb

    r = _Reader(leb(n))
    assert r.u32() == n


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_wasm_sleb_roundtrips(n):
    from connect_spark.wasm.interp import _Reader
    from tests.wasm_asm import sleb

    r = _Reader(sleb(n))
    assert r.s32() == n


@settings(max_examples=120, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_wasm_i32_arith_matches_two_complement(a, b):
    from connect_spark.wasm.interp import Instance, _s32

    M = 1 << 32
    assert Instance._i32_arith(0x6A, a, b) == (a + b) % M
    assert Instance._i32_arith(0x6B, a, b) == (a - b) % M
    assert Instance._i32_arith(0x6C, a, b) == (a * b) % M
    if b != 0:
        # div_s truncates toward zero like C/wasm
        import math

        q = math.trunc(_s32(a) / _s32(b)) if _s32(b) != 0 else None
        if q is not None:
            assert _s32(Instance._i32_arith(0x6D, a, b)) == q
        assert Instance._i32_arith(0x6E, a, b) == a // b
    # shifts mask the count mod 32
    sh = b % 32
    assert Instance._i32_arith(0x74, a, b) == (a << sh) % M
    assert Instance._i32_arith(0x76, a, b) == a >> sh


@settings(max_examples=30, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), max_codepoint=0x2FFFF
        ),
        max_size=60,
    )
)
def test_unicode_segments_concat_invariant(s):
    from connect_spark.text.segmentation import unicode_segments

    for kind in ("grapheme", "word", "sentence"):
        assert "".join(unicode_segments(s, kind)) == s


@settings(max_examples=5, deadline=None)
@given(
    st.binary(min_size=1, max_size=24),
    st.binary(min_size=8, max_size=16),
)
def test_argon2_phc_verify_roundtrip(password, salt):
    from connect_spark.functions.argon2_py import (
        argon2_phc_hash,
        compare_argon2,
    )

    h = argon2_phc_hash(
        password, salt, memory_cost=8, time_cost=1, parallelism=1
    )
    assert compare_argon2(password, h) is True
    assert compare_argon2(password + b"x", h) is False


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**64 - 1),
    st.integers(min_value=0, max_value=2**64 - 1),
)
def test_wasm_i64_divrem_integer_exact(a, b):
    from connect_spark.wasm.interp import Instance, WasmTrap, _s64

    if b % (1 << 64) == 0:
        return
    sa, sb = _s64(a), _s64(b)
    if sa == -(2**63) and sb == -1:
        import pytest as _pytest

        with _pytest.raises(WasmTrap, match="overflow"):
            Instance._i64_arith(0x7F, a, b)
        return
    import math

    q = abs(sa) // abs(sb)
    q = q if (sa < 0) == (sb < 0) else -q
    assert _s64(Instance._i64_arith(0x7F, a, b)) == q
    assert _s64(Instance._i64_arith(0x81, a, b)) == sa - sb * q
    assert Instance._i64_arith(0x80, a, b) == a // b
    assert Instance._i64_arith(0x82, a, b) == a % b
