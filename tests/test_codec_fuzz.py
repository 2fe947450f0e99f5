"""Seeded roundtrip fuzz over every handwritten wire/compression
codec (r12 — the sweep that surfaced the GIF LZW tail-width bug,
kept as a permanent deterministic guard): lz4 block+frame, snappy,
msgpack, zigzag varints, RESP, AMQP 1.0 typed values, Kafka
RecordBatch v2 across all compression codecs.  Seeds are fixed so
failures reproduce exactly."""

from __future__ import annotations

import random
import string

SEED = 20260816


def test_lz4_roundtrip_fuzz():
    from connect_spark.functions import lz4_codec as L

    rng = random.Random(SEED)
    for t in range(1200):
        kind = rng.randrange(3)
        n = rng.choice([0, 1, 12, 13, 15, 64, 255, 256, 4000])
        if kind == 0:
            data = rng.randbytes(min(n, 2000))
        elif kind == 1:
            data = bytes([rng.randrange(4)]) * n
        else:
            unit = rng.randbytes(rng.randint(1, 9))
            data = (unit * (n // max(1, len(unit)) + 1))[:n]
        assert L.decompress_block(L.compress_block(data)) == data
        assert L.decompress(L.compress(data)) == data


def test_snappy_roundtrip_fuzz():
    from connect_spark.functions import snappy_codec as S

    rng = random.Random(SEED + 1)
    for t in range(1200):
        n = rng.choice([0, 1, 3, 59, 60, 61, 255, 1024, 66000])
        kind = rng.randrange(3)
        if kind == 0:
            data = rng.randbytes(min(n, 2000))
        elif kind == 1:
            data = bytes([7]) * n
        else:
            unit = rng.randbytes(rng.randint(1, 10))
            data = (unit * (n // max(1, len(unit)) + 1))[:n]
        assert S.decompress(S.compress(data)) == data


def _rand_doc(rng, depth=0):
    r = rng.randrange(10 if depth < 3 else 7)
    if r == 0:
        return rng.randint(-2**63, 2**63 - 1)
    if r == 1:
        return None
    if r == 2:
        return rng.random() * 10 ** rng.randint(-5, 5)
    if r == 3:
        return "".join(rng.choices(string.printable,
                                   k=rng.randrange(200)))
    if r == 4:
        return rng.randbytes(rng.randrange(200))
    if r == 5:
        return rng.choice([True, False])
    if r == 6:
        return rng.randint(0, 2**64 - 1)
    if r == 7:
        return [_rand_doc(rng, depth + 1)
                for _ in range(rng.randrange(6))]
    if r == 8:
        return {str(i): _rand_doc(rng, depth + 1)
                for i in range(rng.randrange(5))}
    return rng.randint(-32, 127)


def test_msgpack_roundtrip_fuzz():
    from connect_spark.functions.msgpack_codec import packb, unpackb

    rng = random.Random(SEED + 2)
    for t in range(1500):
        v = _rand_doc(rng)
        assert unpackb(packb(v)) == v


def test_zigzag_roundtrip_fuzz():
    from connect_spark.functions.varints import (
        zigzag_decode, zigzag_encode)

    rng = random.Random(SEED + 3)
    for t in range(4000):
        n = rng.choice([rng.randint(-2**63, 2**63 - 1),
                        rng.randint(-100, 100), 0, -1,
                        2**62, -2**62])
        assert zigzag_decode(zigzag_encode(n), 0)[0] == n


def test_resp_roundtrip_fuzz():
    from connect_spark.functions.resp_codec import (
        decode_resp, encode_resp)

    rng = random.Random(SEED + 4)

    def rand_resp(depth=0):
        r = rng.randrange(5 if depth < 3 else 3)
        if r == 0:
            return rng.randint(-2**50, 2**50)
        if r == 1:
            return rng.randbytes(rng.randrange(50))
        if r == 2:
            return None
        if r == 3:
            return "".join(rng.choices(string.ascii_letters,
                                       k=rng.randrange(50))).encode()
        return [rand_resp(depth + 1) for _ in range(rng.randrange(5))]

    for t in range(1500):
        v = rand_resp()
        out, _ = decode_resp(encode_resp(v))
        assert out == v


def test_amqp1_value_roundtrip_fuzz():
    from connect_spark.functions.amqp1_codec import (
        Symbol, decode_value, encode_value)

    rng = random.Random(SEED + 5)

    def rv(depth=0):
        r = rng.randrange(9 if depth < 3 else 6)
        if r == 0:
            return None
        if r == 1:
            return rng.choice([True, False])
        if r == 2:
            return rng.randint(-2**31, 2**31 - 1)
        if r == 3:
            return rng.randint(-2**63, 2**63 - 1)
        if r == 4:
            return "".join(rng.choices(string.printable,
                                       k=rng.randrange(200)))
        if r == 5:
            return rng.randbytes(rng.randrange(200))
        if r == 6:
            return [rv(depth + 1) for _ in range(rng.randrange(5))]
        if r == 7:
            return {str(i): rv(depth + 1)
                    for i in range(rng.randrange(4))}
        return Symbol("".join(rng.choices(string.ascii_letters,
                                          k=rng.randrange(30))))

    for t in range(1200):
        v = rv()
        out, _ = decode_value(encode_value(v))
        assert out == v


def test_kafka_recordbatch_roundtrip_fuzz():
    from connect_spark.functions.kafka_records import (
        KafkaRecord, decode_batch, encode_batch)

    rng = random.Random(SEED + 6)
    for t in range(400):
        n = rng.randint(1, 15)
        base = rng.randint(0, 2**40)
        recs = []
        for j in range(n):
            recs.append(KafkaRecord(
                offset=base + j,
                timestamp_ms=rng.randint(0, 2**41),
                key=(None if rng.random() < 0.3
                     else rng.randbytes(rng.randrange(40))),
                value=(None if rng.random() < 0.1
                       else rng.randbytes(rng.randrange(200))),
                headers=[
                    ("".join(chr(rng.randint(97, 122))
                             for _ in range(rng.randint(1, 8))),
                     rng.randbytes(rng.randrange(20)))
                    for _ in range(rng.randrange(3))
                ],
            ))
        codec = rng.choice([0, 1, 2, 3, 4])
        blob = encode_batch(recs, base_offset=base, codec=codec)
        batch, nxt = decode_batch(blob)
        assert nxt == len(blob) and batch["codec"] == codec
        out = batch["records"]
        assert len(out) == n
        for a, b in zip(recs, out):
            assert a.offset == b.offset
            assert a.timestamp_ms == b.timestamp_ms
            assert (a.key or None) == (b.key or None)
            assert (a.value or None) == (b.value or None)
            assert list(a.headers or []) == list(b.headers or [])


def test_media_decoder_malformed_input_contract():
    """Seeded mutation fuzz over the media decoders (r12 hardening):
    random byte flips / truncations / insertions of valid streams
    must raise ValueError (the module's malformed-input contract) or
    decode cleanly — never IndexError/KeyError/struct.error.  The
    interactive sweep ran 10K mutations at zero violations after the
    guards landed; this keeps 1.5K of them as a deterministic
    regression net."""
    import struct

    from connect_spark.text.media_codecs import (
        compose_gif_frames,
        decode_avi_frames,
        decode_bmp_pixels,
        decode_jpeg_lossless,
        decode_jpeg_pixels,
        decode_png_pixels,
        decode_wav,
        encode_avi_mjpeg,
        encode_bmp,
        encode_gif_animation,
        encode_jpeg,
        encode_jpeg_arith,
        encode_jpeg_lossless,
        encode_jpeg_lossless_arith,
        encode_png,
        encode_wav_mulaw,
    )

    rng = random.Random(SEED + 7)
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    plane = [[(7 * x + 13 * y) % 256 for x in range(6)]
             for y in range(5)]
    px16 = [[((x * 31 + y * 17) % 256, (x * 13) % 256, (y * 7) % 256)
             for x in range(16)] for y in range(16)]
    cases = (
        (encode_jpeg_lossless([plane], predictor=4),
         decode_jpeg_lossless),
        (encode_jpeg_lossless_arith([plane], predictor=4),
         decode_jpeg_lossless),
        (encode_jpeg(px16), decode_jpeg_pixels),
        (encode_jpeg_arith(px16), decode_jpeg_pixels),
        (encode_gif_animation(
            [{"grid": [[1] * 4] * 4, "disposal": 1},
             {"grid": [[2, 0], [0, 2]], "left": 1, "top": 1,
              "transparent": 0}], pal, 4, 4), compose_gif_frames),
        (encode_png([[(x * 9 % 256, 0, x) for x in range(8)]] * 6),
         decode_png_pixels),
        (encode_bmp([[(x, 2 * x % 256, 9) for x in range(8)]] * 6),
         decode_bmp_pixels),
        (encode_wav_mulaw([(i * 37) % 4096 - 2048
                           for i in range(64)]), decode_wav),
        (encode_avi_mjpeg([[[(10, 20, 30)] * 8] * 8] * 2),
         decode_avi_frames),
    )
    for blob, fn in cases:
        for t in range(300):
            b = bytearray(blob)
            mode = rng.randrange(3)
            if mode == 0:
                for _ in range(rng.randint(1, 4)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            elif mode == 1:
                b = b[:rng.randrange(len(b))]
            else:
                pos = rng.randrange(len(b))
                b = (b[:pos]
                     + bytes(rng.randrange(256)
                             for _ in range(rng.randint(1, 8)))
                     + b[pos:])
            try:
                fn(bytes(b))
            except ValueError:
                pass  # the contract
            except (struct.error, IndexError, KeyError, TypeError,
                    OverflowError, ZeroDivisionError) as exc:
                raise AssertionError(
                    f"contract violation {type(exc).__name__} on "
                    f"mutation {t} of {fn.__name__}") from exc


def test_jpeg_hierarchical_malformed_input_contract():
    """r13 extension of the mutation net to the hierarchical
    decoder (DHP/EXP/SOF7/SOFF): byte flips, truncations,
    insertions AND cross-stream splices of valid pyramids must
    raise ValueError or decode cleanly — never IndexError/
    struct.error/etc.  The interactive hunt ran 10.8K mutations
    over 12 stream shapes (both entropy arms x depths 1-3 x 1/3
    components) at zero violations; 1.2K pinned here."""
    import struct

    from connect_spark.text.media_codecs import (
        decode_jpeg_hierarchical,
        encode_jpeg_hierarchical,
    )

    rng = random.Random(SEED + 13)
    plane = [[(7 * x + 13 * y) % 256 for x in range(9)]
             for y in range(8)]
    from connect_spark.text.media_codecs import (
        encode_jpeg_hierarchical_dct,
    )

    blobs = [
        encode_jpeg_hierarchical([plane], levels=2),
        encode_jpeg_hierarchical([plane], levels=3,
                                 arithmetic=True),
        encode_jpeg_hierarchical([plane, plane, plane], levels=2,
                                 predictor=5),
        encode_jpeg_hierarchical([plane, plane, plane], levels=1,
                                 arithmetic=True),
        # DCT-base + lossless-residual streams exercise the
        # substream-extraction path (r13: this hunt found the
        # truncated-SOF cid read and the ns==0 SOS hole)
        encode_jpeg_hierarchical_dct(plane),
        encode_jpeg_hierarchical_dct(plane,
                                     arithmetic_residual=True),
        # multi-level DCT pyramids exercise the SOF5 differential
        # path (r13: this hunt found the unbounded-DC-category hole
        # in decode_jpeg_pixels' Huffman scan)
        encode_jpeg_hierarchical_dct(plane, levels=3),
    ]
    for blob in blobs:
        for t in range(300):
            b = bytearray(blob)
            mode = rng.randrange(4)
            if mode == 0:
                for _ in range(rng.randint(1, 6)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            elif mode == 1:
                b = b[:rng.randrange(len(b))]
            elif mode == 2:
                pos = rng.randrange(len(b))
                b = (b[:pos]
                     + bytes(rng.randrange(256)
                             for _ in range(rng.randint(1, 12)))
                     + b[pos:])
            else:
                other = blobs[rng.randrange(len(blobs))]
                b = (b[:rng.randrange(len(b))]
                     + other[rng.randrange(len(other)):])
            try:
                decode_jpeg_hierarchical(bytes(b))
            except ValueError:
                pass  # the contract
            except (struct.error, IndexError, KeyError, TypeError,
                    OverflowError, ZeroDivisionError) as exc:
                raise AssertionError(
                    f"contract violation {type(exc).__name__} on "
                    f"mutation {t}") from exc
