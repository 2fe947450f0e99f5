"""Property tests (hypothesis): the avro/msgpack/protobuf codecs
roundtrip arbitrary generated values; mirrors the reference's
fuzz-style format tests."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from connect_spark.functions import msgpack_codec as mp
from connect_spark.functions import protobuf_codec as pb
from connect_spark.functions.avro_codec import decode as avro_decode
from connect_spark.functions.avro_codec import encode as avro_encode
from connect_spark.functions.avro_codec import read_ocf, write_ocf

# JSON-safe scalars (no NaN/inf — JSON bridges reject them, same as
# the reference's to_json operators)
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=80),
)

_json_values = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=12), children, max_size=6),
    ),
    max_leaves=25,
)


@settings(max_examples=150, deadline=None)
@given(_json_values)
def test_msgpack_roundtrips_any_json_value(v):
    assert mp.unpackb(mp.packb(v)) == v


_AVRO_SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "i", "type": ["null", "long"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "arr", "type": {"type": "array",
                                 "items": ["null", "string"]}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ],
}


@settings(max_examples=150, deadline=None)
@given(
    st.fixed_dictionaries(
        {
            "i": st.none() | st.integers(-(2 ** 62), 2 ** 62),
            "d": st.none() | st.floats(allow_nan=False, allow_infinity=False),
            "s": st.none() | st.text(max_size=60),
            "arr": st.lists(st.none() | st.text(max_size=20), max_size=5),
            "m": st.dictionaries(
                st.text(max_size=10), st.integers(-(2 ** 40), 2 ** 40),
                max_size=5,
            ),
        }
    )
)
def test_avro_roundtrips_generated_records(rec):
    assert avro_decode(avro_encode(rec, _AVRO_SCHEMA), _AVRO_SCHEMA) == rec


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {"id": st.integers(0, 2 ** 40), "name": st.text(max_size=30)}
        ),
        max_size=20,
    )
)
def test_avro_ocf_roundtrips_record_lists(records):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
        ],
    }
    _, back = read_ocf(write_ocf(records, schema))
    assert back == records


_PB_DESC = {
    "fields": {
        1: {"name": "i", "type": "int64"},
        2: {"name": "s", "type": "sint64"},
        3: {"name": "d", "type": "double"},
        4: {"name": "txt", "type": "string"},
        5: {"name": "flag", "type": "bool"},
        6: {"name": "tags", "type": "string", "repeated": True},
    }
}


@settings(max_examples=150, deadline=None)
@given(
    st.fixed_dictionaries(
        {
            "i": st.integers(-(2 ** 62), 2 ** 62),
            "s": st.integers(-(2 ** 62), 2 ** 62),
            "d": st.floats(allow_nan=False, allow_infinity=False),
            "txt": st.text(max_size=60),
            "flag": st.booleans(),
            "tags": st.lists(st.text(max_size=15), max_size=5),
        }
    )
)
def test_protobuf_roundtrips_generated_messages(msg):
    assert pb.decode(pb.encode(msg, _PB_DESC), _PB_DESC) == msg


@settings(max_examples=100, deadline=None)
@given(_json_values)
def test_jq_identity_preserves_any_document(v):
    from connect_spark.functions.jq import JqFilter

    assert JqFilter(".").run(v) == [v]
    # tostring|fromjson-style stability: identity through JSON text
    out = JqFilter(".").run_json(json.dumps(v))
    assert json.loads(out[0]) == v
