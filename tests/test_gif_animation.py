"""GIF89a inter-frame animation semantics (media_codecs r12):
partial-canvas sub-frames, transparency, disposal methods 1/2/3,
interlaced row order — encoder (encode_gif_animation) ↔ decoder
(decode_gif_frames + compose_gif_frames) with hand-computed
compositing vectors and hypothesis roundtrips."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from connect_spark.text.media_codecs import (
    compose_gif_frames,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
)

PAL = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
K, R, G, B = PAL


def test_partial_frame_and_transparency():
    specs = [
        {"grid": [[1] * 4 for _ in range(4)], "disposal": 1},
        {"grid": [[2, 0], [0, 2]], "left": 1, "top": 1,
         "disposal": 1, "transparent": 0},
    ]
    c = compose_gif_frames(encode_gif_animation(specs, PAL, 4, 4))
    f1 = c["frames"][1]
    assert f1[1][1] == G and f1[2][2] == G
    assert f1[1][2] == R and f1[2][1] == R  # transparent holes
    assert f1[0][0] == R  # outside the patch untouched


def test_disposal_restore_background():
    specs = [
        {"grid": [[1] * 4 for _ in range(4)], "disposal": 1},
        {"grid": [[2, 2], [2, 2]], "left": 1, "top": 1,
         "disposal": 2},
        {"grid": [[3]], "disposal": 0},
    ]
    c = compose_gif_frames(
        encode_gif_animation(specs, PAL, 4, 4, bg_index=0))
    assert c["frames"][1][1][1] == G
    assert c["frames"][2][1][1] == K  # region → background
    assert c["frames"][2][2][2] == K
    assert c["frames"][2][3][3] == R  # outside region keeps frame 1
    assert c["frames"][2][0][0] == B


def test_disposal_restore_previous():
    specs = [
        {"grid": [[1] * 4 for _ in range(4)], "disposal": 1},
        {"grid": [[2, 2], [2, 2]], "left": 1, "top": 1,
         "disposal": 3},
        {"grid": [[3]], "left": 3, "top": 3},
    ]
    c = compose_gif_frames(encode_gif_animation(specs, PAL, 4, 4))
    assert c["frames"][1][1][1] == G
    assert c["frames"][2][1][1] == R  # restored to pre-frame canvas
    assert c["frames"][2][3][3] == B


def test_disposal_leave_in_place_accumulates():
    specs = [
        {"grid": [[1]], "left": 0, "top": 0, "disposal": 1},
        {"grid": [[2]], "left": 1, "top": 0, "disposal": 1},
        {"grid": [[3]], "left": 2, "top": 0, "disposal": 1},
    ]
    c = compose_gif_frames(
        encode_gif_animation(specs, PAL, 3, 1, bg_index=0))
    assert c["frames"][2][0] == [R, G, B]


def test_interlace_roundtrip():
    grid = [[(x + y) % 4 for x in range(5)] for y in range(11)]
    enc = encode_gif_animation(
        [{"grid": grid, "interlace": True}], PAL, 5, 11)
    d = decode_gif_frames(enc)
    assert d["frames"][0] == grid
    assert d["descriptors"][0]["interlaced"] is True
    # the on-wire row order really is permuted: a naive sequential
    # read of the raster differs from the source for h > 4
    plain = encode_gif_animation([{"grid": grid}], PAL, 5, 11)
    assert enc != plain


def test_descriptor_surface_and_bg_index():
    specs = [{"grid": [[2, 0]], "left": 3, "top": 2, "disposal": 2,
              "transparent": 0, "delay_cs": 7}]
    d = decode_gif_frames(
        encode_gif_animation(specs, PAL, 6, 4, bg_index=1))
    assert d["bg_index"] == 1
    assert d["descriptors"][0] == {
        "left": 3, "top": 2, "width": 2, "height": 1,
        "disposal": 2, "transparent": 0, "interlaced": False}
    assert d["delays_cs"][0] == 7


def test_background_color_from_bg_index():
    # canvas pixels never painted stay the DECLARED background color
    specs = [{"grid": [[2]], "left": 0, "top": 0}]
    c = compose_gif_frames(
        encode_gif_animation(specs, PAL, 2, 1, bg_index=3))
    assert c["frames"][0] == [[G, B]]


def test_frame_exceeding_canvas_rejected():
    with pytest.raises(ValueError, match="logical screen"):
        encode_gif_animation(
            [{"grid": [[1, 1]], "left": 3}], PAL, 4, 1)
    with pytest.raises(ValueError, match="disposal"):
        encode_gif_animation(
            [{"grid": [[1]], "disposal": 5}], PAL, 1, 1)


def test_plain_encode_gif_unchanged():
    grid = [[(x * 3 + y) % 4 for x in range(6)] for y in range(4)]
    d = decode_gif_frames(encode_gif([grid, grid], PAL, delay_cs=9))
    assert d["frames"] == [grid, grid]
    assert d["delays_cs"] == [9, 9]
    assert all(not x["interlaced"] and x["transparent"] is None
               for x in d["descriptors"])


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    w=st.integers(2, 10),
    h=st.integers(2, 12),
    interlace=st.booleans(),
)
def test_property_subframe_roundtrip(data, w, h, interlace):
    fw = data.draw(st.integers(1, w))
    fh = data.draw(st.integers(1, h))
    left = data.draw(st.integers(0, w - fw))
    top = data.draw(st.integers(0, h - fh))
    grid = [[data.draw(st.integers(0, 3)) for _ in range(fw)]
            for _ in range(fh)]
    enc = encode_gif_animation(
        [{"grid": grid, "left": left, "top": top,
          "interlace": interlace}], PAL, w, h)
    d = decode_gif_frames(enc)
    assert d["frames"][0] == grid
    desc = d["descriptors"][0]
    assert (desc["left"], desc["top"]) == (left, top)


@settings(max_examples=15, deadline=None)
@given(data=st.data(), n=st.integers(2, 4))
def test_property_compose_reference(data, n):
    """Compositing matches an independent straight-line reference
    model over random partial frames with random disposal and
    transparency."""
    w = h = 6
    specs = []
    for _ in range(n):
        fw = data.draw(st.integers(1, w))
        fh = data.draw(st.integers(1, h))
        specs.append({
            "grid": [[data.draw(st.integers(0, 3))
                      for _ in range(fw)] for _ in range(fh)],
            "left": data.draw(st.integers(0, w - fw)),
            "top": data.draw(st.integers(0, h - fh)),
            "disposal": data.draw(st.integers(0, 3)),
            "transparent": data.draw(
                st.sampled_from([None, 0, 3])),
        })
    got = compose_gif_frames(
        encode_gif_animation(specs, PAL, w, h, bg_index=0))["frames"]
    # reference model
    canvas = [[K] * w for _ in range(h)]
    want = []
    for sp in specs:
        prev = [row[:] for row in canvas]
        for y, row in enumerate(sp["grid"]):
            for x, idx in enumerate(row):
                if idx != sp["transparent"]:
                    canvas[sp["top"] + y][sp["left"] + x] = PAL[idx]
        want.append([row[:] for row in canvas])
        if sp["disposal"] == 2:
            for y in range(len(sp["grid"])):
                for x in range(len(sp["grid"][0])):
                    canvas[sp["top"] + y][sp["left"] + x] = K
        elif sp["disposal"] == 3:
            canvas = prev
    assert got == want


def test_lzw_tail_width_regression():
    """r12 fuzz find: when the entry count lands exactly on a power
    of two at the final flush, the decoder widens before reading EOI
    (its table lags one entry and still adds on the last data code);
    the encoder must mirror that bump.  This raster desynced before
    the fix — pinned forever."""
    from connect_spark.text.media_codecs import (
        _lzw_decode, _lzw_encode)

    raw = bytes([1, 3, 1, 3, 1, 2, 0, 0, 2, 2, 3, 2])
    assert _lzw_decode(_lzw_encode(raw, 2), 2) == raw
    grid = [[1, 3, 1, 3], [1, 2, 0, 0], [2, 2, 3, 2]]
    d = decode_gif_frames(encode_gif([grid], PAL))
    assert d["frames"][0] == grid


@settings(max_examples=30, deadline=None)
@given(data=st.data(), mcs=st.sampled_from([2, 3, 4, 8]),
       n=st.integers(1, 400))
def test_lzw_property_roundtrip(data, mcs, n):
    raw = bytes(data.draw(st.integers(0, (1 << mcs) - 1))
                for _ in range(n))
    from connect_spark.text.media_codecs import (
        _lzw_decode, _lzw_encode)

    assert _lzw_decode(_lzw_encode(raw, mcs), mcs) == raw
