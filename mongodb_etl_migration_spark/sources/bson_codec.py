"""Minimal pure-Python BSON codec — no pymongo/bson dependency.

Implements the subset of the public BSON spec (bsonspec.org) that
mongodump collection files contain in practice: double, string,
embedded document, array, binary, ObjectId, bool, UTC datetime, null,
regex, int32/int64, Mongo timestamp, decimal128 (surfaced as raw hex —
exact, lossless, and sortable enough for audit; full IEEE 754-2008
decimal decoding is out of scope). Used by the ``mongodump`` Python
DataSource (sources/mongodump_source.py) to ingest backup files
directly, the reference's restore-then-extract path
(run_etl.py / etl/extractors/mongo_extractor.py) collapsed into one
Spark-native scan.

Decoding conventions (aligned with readers.normalize_extended_json so
downstream code sees one shape): ObjectId → 24-char lowercase hex
string; datetime → naive UTC ``datetime``; binary → bytes; regex →
"/pattern/options" string; Mongo internal timestamp → int64
(seconds<<32|increment, the wire value).

The encoder exists for tests and fixture generation (round-trip
property: decode(encode(doc)) == doc for the supported types).
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timedelta, timezone

_EPOCH = datetime(1970, 1, 1)


# --------------------------------------------------------------- decode


def decode_document(
    buf: bytes, offset: int = 0, wanted: frozenset | set | None = None
) -> tuple[dict, int]:
    """Decode one document starting at ``offset``; returns (doc,
    next_offset). Raises ValueError on malformed input.

    ``wanted`` restricts decoding to the named TOP-LEVEL fields:
    every other value is SKIPPED by length arithmetic (strings,
    binaries and nested documents carry length prefixes, fixed-width
    types have fixed sizes) — no allocation, no recursion, no UTF-8
    decode. This is the column-pruning path for wide documents: a
    2-field projection over 100-field docs touches ~2 values per
    row."""
    if offset + 4 > len(buf):
        raise ValueError("truncated document header")
    (total,) = struct.unpack_from("<i", buf, offset)
    end = offset + total
    if total < 5 or end > len(buf) or buf[end - 1] != 0:
        raise ValueError(f"malformed document at {offset}: size {total}")
    out: dict = {}
    pos = offset + 4
    try:
        while pos < end - 1:
            etype = buf[pos]
            pos += 1
            name, pos = _cstring(buf, pos)
            if wanted is not None and name not in wanted:
                pos = _skip_value(etype, buf, pos)
            else:
                out[name], pos = _decode_value(etype, buf, pos)
    except struct.error as err:  # truncated fixed-width value
        raise ValueError(f"truncated value near {pos}: {err}") from err
    return out, end


def _skip_value(etype: int, buf: bytes, pos: int) -> int:
    """Advance past a value without materializing it."""
    if etype in (0x01, 0x09, 0x11, 0x12):  # double/datetime/ts/int64
        return pos + 8
    if etype == 0x02:  # string: int32 len incl. NUL
        (ln,) = struct.unpack_from("<i", buf, pos)
        _check_len(ln, 1, buf, pos + 4)
        return pos + 4 + ln
    if etype in (0x03, 0x04):  # doc/array: int32 total size
        (ln,) = struct.unpack_from("<i", buf, pos)
        _check_len(ln, 5, buf, pos)
        return pos + ln
    if etype == 0x05:  # binary: int32 len + subtype byte
        (ln,) = struct.unpack_from("<i", buf, pos)
        _check_len(ln, 0, buf, pos + 5)
        return pos + 5 + ln
    if etype == 0x07:
        return pos + 12
    if etype == 0x08:
        return pos + 1
    if etype == 0x0A:
        return pos
    if etype == 0x0B:  # regex: two cstrings
        pos = buf.index(0, pos) + 1
        return buf.index(0, pos) + 1
    if etype == 0x10:
        return pos + 4
    if etype == 0x13:
        return pos + 16
    raise ValueError(f"unsupported BSON type 0x{etype:02x}")


def iter_documents(buf: bytes):
    """Yield every concatenated document in a mongodump collection
    file (the format is back-to-back BSON documents)."""
    pos = 0
    while pos < len(buf):
        doc, pos = decode_document(buf, pos)
        yield doc


def _cstring(buf: bytes, pos: int) -> tuple[str, int]:
    nul = buf.index(0, pos)
    return buf[pos:nul].decode("utf-8"), nul + 1


def _check_len(ln: int, lo: int, buf: bytes, pos: int) -> None:
    """Validate an inner length prefix: negative or out-of-bounds
    lengths would move the cursor backwards (an adversarial document
    could loop the parser forever) or past the buffer — both must be
    the promised ValueError, never a hang or struct.error."""
    if ln < lo or pos + ln > len(buf):
        raise ValueError(f"bad length {ln} at {pos}")


def _decode_value(etype: int, buf: bytes, pos: int):
    if etype == 0x01:  # double
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if etype == 0x02:  # string
        (ln,) = struct.unpack_from("<i", buf, pos)
        _check_len(ln, 1, buf, pos + 4)
        s = buf[pos + 4 : pos + 4 + ln - 1].decode("utf-8")
        return s, pos + 4 + ln
    if etype == 0x03:  # embedded document
        return decode_document(buf, pos)
    if etype == 0x04:  # array — document with "0","1",... keys
        doc, nxt = decode_document(buf, pos)
        return [doc[k] for k in doc], nxt
    if etype == 0x05:  # binary
        (ln,) = struct.unpack_from("<i", buf, pos)
        _check_len(ln, 0, buf, pos + 5)
        return bytes(buf[pos + 5 : pos + 5 + ln]), pos + 5 + ln
    if etype == 0x07:  # ObjectId
        return buf[pos : pos + 12].hex(), pos + 12
    if etype == 0x08:  # bool
        return buf[pos] == 1, pos + 1
    if etype == 0x09:  # UTC datetime, int64 millis
        (ms,) = struct.unpack_from("<q", buf, pos)
        return _EPOCH + timedelta(milliseconds=ms), pos + 8
    if etype == 0x0A:  # null
        return None, pos
    if etype == 0x0B:  # regex: two cstrings
        pat, pos = _cstring(buf, pos)
        opts, pos = _cstring(buf, pos)
        return f"/{pat}/{opts}", pos
    if etype == 0x10:  # int32
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    if etype == 0x11:  # Mongo internal timestamp (uint64 wire value)
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if etype == 0x12:  # int64
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if etype == 0x13:  # decimal128 — raw little-endian bytes as hex
        return buf[pos : pos + 16].hex(), pos + 16
    raise ValueError(f"unsupported BSON type 0x{etype:02x}")


# --------------------------------------------------------------- encode


def encode_document(doc: dict) -> bytes:
    body = b"".join(_encode_element(k, v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _encode_element(name: str, v) -> bytes:
    key = name.encode("utf-8") + b"\x00"
    if isinstance(v, bool):  # before int — bool is an int subclass
        return b"\x08" + key + (b"\x01" if v else b"\x00")
    if isinstance(v, float):
        return b"\x01" + key + struct.pack("<d", v)
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + key + struct.pack("<i", v)
        return b"\x12" + key + struct.pack("<q", v)
    if isinstance(v, ObjectIdHex):  # before str — it IS a str subclass
        return b"\x07" + key + bytes.fromhex(str(v))
    if isinstance(v, str):
        s = v.encode("utf-8") + b"\x00"
        return b"\x02" + key + struct.pack("<i", len(s)) + s
    if isinstance(v, bytes):
        return b"\x05" + key + struct.pack("<i", len(v)) + b"\x00" + v
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        ms = round((v - _EPOCH).total_seconds() * 1000)
        return b"\x09" + key + struct.pack("<q", ms)
    if isinstance(v, date):  # BSON has no date-only type: UTC midnight
        ms = round((datetime(v.year, v.month, v.day) - _EPOCH).total_seconds() * 1000)
        return b"\x09" + key + struct.pack("<q", ms)
    if v is None:
        return b"\x0a" + key
    if isinstance(v, list):
        as_doc = {str(i): x for i, x in enumerate(v)}
        return b"\x04" + key + encode_document(as_doc)
    if isinstance(v, dict):
        return b"\x03" + key + encode_document(v)
    raise TypeError(f"cannot encode {type(v).__name__} for field {name!r}")


class ObjectIdHex(str):
    """Marker type: a 24-hex-char string to encode as BSON ObjectId."""

    def __new__(cls, s: str):
        if len(s) != 24 or any(c not in "0123456789abcdef" for c in s.lower()):
            raise ValueError(f"not a 24-hex ObjectId: {s!r}")
        return super().__new__(cls, s.lower())
