"""vg "stream" framing: gzip-wrapped varint-framed message groups.

Wire layout (reference: stream.hpp:25-111): a gzip stream containing
repeated groups of [varint64 count][count × (varint32 size, message
bytes)]. Readers must tolerate multiple gzip members concatenated in one
file and multiple groups per member.

A native C++ fast path (native/ga_native.cpp) is used when available for
pangenome-scale files; this module is the always-available implementation
and the behavioral specification.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterable, Iterator

from . import wire


def _decompress_all(data: bytes) -> bytes:
    """Decompress possibly-concatenated gzip members (or raw data)."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated gzip stream")
        consumed = len(data) - pos - len(d.unused_data)
        pos += consumed
    return bytes(out)


def iter_messages(data: bytes) -> Iterator[bytes]:
    """Yield raw message payloads from framed (possibly gzipped) bytes.

    Uses the native codec (io.native) when available; pure-Python
    otherwise."""
    from . import native

    if data[:2] == b"\x1f\x8b":
        raw = native.gunzip(data)
        if raw is None:
            raw = _decompress_all(data)
    else:
        raw = data
    frames = native.frame_offsets(raw)
    if frames is not None:
        offsets, lengths = frames
        for off, ln in zip(offsets, lengths):
            yield raw[off : off + ln]
        return
    pos = 0
    n = len(raw)
    while pos < n:
        count, pos = wire.decode_varint(raw, pos)
        for _ in range(count):
            size, pos = wire.decode_varint(raw, pos)
            yield raw[pos : pos + size]
            pos += size


def read_messages(path: str, message_cls) -> list:
    """Read all messages of ``message_cls`` from a GAM/VG stream file."""
    with open(path, "rb") as f:
        data = f.read()
    return [message_cls.decode(m) for m in iter_messages(data)]


def frame_messages(messages: Iterable, group_size: int = 1000) -> bytes:
    """Frame encoded messages into uncompressed stream layout."""
    return frame_payloads([m.encode() for m in messages], group_size)


def frame_payloads(payloads: list, group_size: int = 1000) -> bytes:
    """Frame already-encoded message payloads (no protobuf decode/encode
    round trip — the streaming-merge path)."""
    out = bytearray()
    for start in range(0, len(payloads), group_size) or [0]:
        group = payloads[start : start + group_size]
        out += wire.encode_varint(len(group))
        for p in group:
            out += wire.encode_varint(len(p))
            out += p
    if not payloads:
        out += wire.encode_varint(0)
    return bytes(out)


def write_payloads(path: str, payloads: list, group_size: int = 1000) -> None:
    """Write raw message payloads as a gzip-compressed vg stream file —
    byte-identical to write_messages of the decoded objects, without
    touching protobuf."""
    from . import native

    framed = frame_payloads(payloads, group_size)
    compressed = native.gzip_bytes(framed, level=6)
    if compressed is None:
        compressed = _gzip_fallback(framed)
    with open(path, "wb") as f:
        f.write(compressed)


def _gzip_fallback(framed: bytes) -> bytes:
    """Python-gzip fallback matching the native header byte-for-byte:
    mtime=0 (protobuf's GzipOutputStream writes zero) and OS=3 (Unix,
    what the reference's zlib emits — Python's default 255 made the
    container differ from reference GAM files at byte 9)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=6, mtime=0) as gz:
        gz.write(framed)
    out = bytearray(buf.getvalue())
    out[9] = 3
    return bytes(out)


def write_messages(path: str, messages: Iterable, group_size: int = 1000) -> None:
    """Write messages as a gzip-compressed vg stream (GAM) file."""
    from . import native

    framed = frame_messages(messages, group_size)
    compressed = native.gzip_bytes(framed, level=6)
    if compressed is None:
        compressed = _gzip_fallback(framed)
    with open(path, "wb") as f:
        f.write(compressed)
