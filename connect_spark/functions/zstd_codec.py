"""Zstandard frame compress/decompress via pyarrow's bundled codec
(no zstandard package needed — pyarrow ships libzstd), closing the
last compression gate in the Kafka RecordBatch codec.

pyarrow's Codec API requires the decompressed size up front, so this
module parses the zstd FRAME HEADER (RFC 8878 §3.1.1) to recover the
Frame_Content_Size every standard one-shot encoder embeds:

  magic 0xFD2FB528 (LE) | Frame_Header_Descriptor | [Window_Descriptor]
  | [Dictionary_ID 0/1/2/4B] | [Frame_Content_Size 0/1/2/4/8B]

  descriptor bits: 7-6 FCS-field-size flag (0→1B when Single_Segment
  else absent; 1→2B value+256; 2→4B; 3→8B), 5 Single_Segment,
  2 Content_Checksum, 1-0 Dictionary_ID size flag.

Streaming-mode frames without an embedded content size fall back to a
doubling-buffer retry (bounded), so any valid frame still decodes.
"""

from __future__ import annotations

import struct

_MAGIC = b"\x28\xb5\x2f\xfd"
_DID_BYTES = [0, 1, 2, 4]


def frame_content_size(data: bytes) -> int | None:
    """Frame_Content_Size from a zstd frame header, or None when the
    encoder omitted it (streaming mode)."""
    if data[:4] != _MAGIC:
        raise ValueError("zstd: bad frame magic")
    fhd = data[4]
    fcs_flag = fhd >> 6
    single_segment = bool(fhd & 0x20)
    did_flag = fhd & 0x03
    i = 5
    if not single_segment:
        i += 1  # Window_Descriptor
    i += _DID_BYTES[did_flag]
    if fcs_flag == 0:
        return data[i] if single_segment else None
    if fcs_flag == 1:
        return struct.unpack_from("<H", data, i)[0] + 256
    if fcs_flag == 2:
        return struct.unpack_from("<I", data, i)[0]
    return struct.unpack_from("<Q", data, i)[0]


def compress(data: bytes, level: int = 3) -> bytes:
    import pyarrow as pa

    return pa.Codec("zstd", compression_level=level).compress(
        data, asbytes=True)


def decompress(data: bytes) -> bytes:
    import pyarrow as pa

    codec = pa.Codec("zstd")
    size = frame_content_size(data)
    if size is not None:
        return codec.decompress(data, decompressed_size=size,
                                asbytes=True)
    # streaming frame with no embedded size: bounded doubling retry
    guess = max(len(data) * 4, 1 << 16)
    for _ in range(16):  # caps at ~4 TB — far past any record batch
        try:
            return codec.decompress(data, decompressed_size=guess,
                                    asbytes=True)
        except Exception:  # noqa: BLE001 — size mismatch, grow
            guess *= 2
    raise ValueError("zstd: could not determine decompressed size")
