"""Regressions for the four r13 ADVICE findings (ADVICE.md r13→r14).

1. high — media_codecs.py SOF5 differential-DCT area guard rejected
   legitimate well-compressed streams (the repo's own encoder output
   for a 600x600 constant plane): the guard now counts 8x8 BLOCKS
   (legal floor ~2 bits/block) with a 2^26-sample allocation cap,
   never samples-per-byte.
2. low — decode_jpeg_pixels(_return_coefs=True) on a hierarchical
   (DHP) stream must raise BEFORE running the full pyramid decode.
3. low — agent-mode partition shim: central-server proxy failures
   (URLError / refused connection) surface as a JSON 502, not a
   crashed handler / dropped connection.
4. low — the shim's shutdown path calls server_close() so the
   listening fd is released (no fd leak per partition stream).
"""

from __future__ import annotations

import json
import socket
import urllib.request

import pytest

from connect_spark.text.media_codecs import (
    decode_jpeg_hierarchical,
    decode_jpeg_pixels,
    encode_jpeg_hierarchical_dct,
)


# ------------------------------------------------------------------
# 1. SOF5 area guard: block-count bound, not samples-per-byte
# ------------------------------------------------------------------

def test_sof5_guard_accepts_well_compressed_600x600():
    # A constant plane compresses to ~11KB at 600x600 = 360K samples;
    # the old 4-samples/byte bound rejected it (ADVICE repro).
    plane = [[128] * 600 for _ in range(600)]
    payload = encode_jpeg_hierarchical_dct(plane, levels=2)
    d = decode_jpeg_hierarchical(payload)
    assert d["width"] == 600 and d["height"] == 600
    assert d["planes"][0] == plane  # documented bit-exact roundtrip


def test_sof5_guard_accepts_large_smooth_gradient():
    # smooth gradients also compress far below 4 samples/byte
    plane = [[(x // 64 + y // 64) % 256 for x in range(512)]
             for y in range(512)]
    payload = encode_jpeg_hierarchical_dct(plane, levels=3)
    d = decode_jpeg_hierarchical(payload)
    assert d["planes"][0] == plane


def test_sof5_guard_still_rejects_absurd_frame_area():
    # Take a real stream and inflate the DHP+frame dims far past the
    # 2^26 allocation cap — must still be rejected, not allocated.
    plane = [[10 * (x % 7) for x in range(16)] for _ in range(16)]
    payload = bytearray(encode_jpeg_hierarchical_dct(plane, levels=1))
    big = (16384).to_bytes(2, "big")  # 16384 x 16384 = 2^28 > 2^26
    n = 0
    i = 2
    while i + 1 < len(payload):
        if payload[i] == 0xFF and payload[i + 1] in (0xDE, 0xC0, 0xC5):
            ln = int.from_bytes(payload[i + 2:i + 4], "big")
            payload[i + 5:i + 7] = big  # height
            payload[i + 7:i + 9] = big  # width
            n += 1
            i += 2 + ln
        else:
            i += 1
    assert n >= 2  # DHP + at least one frame header patched
    with pytest.raises(ValueError):
        decode_jpeg_hierarchical(bytes(payload))


# ------------------------------------------------------------------
# 2. _return_coefs on DHP raises before the expensive decode
# ------------------------------------------------------------------

def test_return_coefs_on_hierarchical_raises_fast():
    plane = [[128] * 256 for _ in range(256)]
    payload = bytearray(encode_jpeg_hierarchical_dct(plane, levels=1))
    # Truncate right after the DHP segment: if the contract check ran
    # AFTER the pyramid decode, this would raise "truncated stream" /
    # some decode error instead of the contract message.
    i = 2
    while i + 1 < len(payload):
        if payload[i] == 0xFF and payload[i + 1] == 0xDE:
            ln = int.from_bytes(payload[i + 2:i + 4], "big")
            i += 2 + ln
            break
        i += 1
    truncated = bytes(payload[:i])
    with pytest.raises(ValueError, match="carry samples"):
        decode_jpeg_pixels(truncated, _return_coefs=True)


# ------------------------------------------------------------------
# 3 + 4. partition shim: central-server failure -> JSON 502; fd freed
# ------------------------------------------------------------------

def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_shim_unreachable_central_returns_json_502():
    from connect_spark.agent_mode import _serve_partition_shim

    dead = f"http://127.0.0.1:{_free_port()}/tools"
    srv, port = _serve_partition_shim(
        {"echo": {"description": "d",
                  "mappings": ["root.content = this.content"]}},
        central=dead,
    )
    try:
        # stateful (non-inline) tool name -> proxied to the dead
        # central server -> must be a JSON 502 body, not a dropped
        # connection
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tools/stateful_thing",
            data=b'{"content": "x"}', method="POST")
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected HTTP 502")
        except urllib.error.HTTPError as exc:
            assert exc.code == 502
            doc = json.loads(exc.read())
            assert "unreachable" in doc["error"]
        # GET /tools degrades to the inline listing with the error
        # noted, still a 200
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/tools", timeout=10) as resp:
            doc = json.loads(resp.read())
        assert [t["name"] for t in doc["tools"]] == ["echo"]
        assert "central_error" in doc
    finally:
        srv.shutdown()
        srv.server_close()


def test_shim_server_close_releases_port():
    from connect_spark.agent_mode import _serve_partition_shim

    srv, port = _serve_partition_shim(
        {"echo": {"description": "d",
                  "mappings": ["root.content = this.content"]}},
        central=None,
    )
    srv.shutdown()
    srv.server_close()
    # the listening fd is gone: rebinding the exact port succeeds
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("127.0.0.1", port))
    s.close()
