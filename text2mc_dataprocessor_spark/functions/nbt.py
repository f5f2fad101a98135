"""Minimal NBT (Named Binary Tag) codec — pure Python, stdlib only.

NBT is Minecraft's public, documented container format (big-endian,
twelve tag types); this is a from-scratch reader/writer of that public
spec, sized to what the engine's schematic sources need. The reference
delegates parsing to the schematic4j Java library
(/root/reference/schematic-loader/src/main/java/org/text2mc/
SchematicHandler.java:19); the engine decodes the same bytes in Python
inside Arrow-batched tasks instead of a JVM sidecar process.

Reading returns plain Python values (dict / list / int / float / str /
bytes / list[int]) — consumers don't care about tag widths. Writing
needs explicit widths (a .schem ``Width`` must be a TAG_Short, not an
Int), so values are wrapped in the typed classes below.
"""

from __future__ import annotations

import struct
from io import BytesIO

TAG_END, TAG_BYTE, TAG_SHORT, TAG_INT, TAG_LONG = 0, 1, 2, 3, 4
TAG_FLOAT, TAG_DOUBLE, TAG_BYTE_ARRAY, TAG_STRING = 5, 6, 7, 8
TAG_LIST, TAG_COMPOUND, TAG_INT_ARRAY, TAG_LONG_ARRAY = 9, 10, 11, 12


# --- typed write-side wrappers -------------------------------------------------

class _Tagged:
    tag: int

    def __init__(self, value):
        self.value = value


class Byte(_Tagged):
    tag = TAG_BYTE


class Short(_Tagged):
    tag = TAG_SHORT


class Int(_Tagged):
    tag = TAG_INT


class Long(_Tagged):
    tag = TAG_LONG


class Float(_Tagged):
    tag = TAG_FLOAT


class Double(_Tagged):
    tag = TAG_DOUBLE


class ByteArray(_Tagged):
    tag = TAG_BYTE_ARRAY


class String(_Tagged):
    tag = TAG_STRING


class List_(_Tagged):
    tag = TAG_LIST

    def __init__(self, elem_tag: int, value: list):
        super().__init__(value)
        self.elem_tag = elem_tag


class Compound(_Tagged):
    tag = TAG_COMPOUND


class IntArray(_Tagged):
    tag = TAG_INT_ARRAY


class LongArray(_Tagged):
    tag = TAG_LONG_ARRAY


# --- reader --------------------------------------------------------------------

_SCALAR = {
    TAG_BYTE: ">b", TAG_SHORT: ">h", TAG_INT: ">i", TAG_LONG: ">q",
    TAG_FLOAT: ">f", TAG_DOUBLE: ">d",
}
_ARRAY_ELEM = {TAG_BYTE_ARRAY: ">b", TAG_INT_ARRAY: ">i", TAG_LONG_ARRAY: ">q"}


def _read_payload(buf: BytesIO, tag: int):
    if tag in _SCALAR:
        fmt = _SCALAR[tag]
        return struct.unpack(fmt, buf.read(struct.calcsize(fmt)))[0]
    if tag == TAG_BYTE_ARRAY:
        (n,) = struct.unpack(">i", buf.read(4))
        return buf.read(n)  # bytes, not list — BlockData wants raw bytes
    if tag in (TAG_INT_ARRAY, TAG_LONG_ARRAY):
        (n,) = struct.unpack(">i", buf.read(4))
        fmt = _ARRAY_ELEM[tag]
        w = struct.calcsize(fmt)
        return list(struct.unpack(f">{n}{fmt[1]}", buf.read(n * w)))
    if tag == TAG_STRING:
        (n,) = struct.unpack(">H", buf.read(2))
        return buf.read(n).decode("utf-8", errors="replace")
    if tag == TAG_LIST:
        elem_tag = buf.read(1)[0]
        (n,) = struct.unpack(">i", buf.read(4))
        return [_read_payload(buf, elem_tag) for _ in range(n)]
    if tag == TAG_COMPOUND:
        out = {}
        while True:
            t = buf.read(1)
            if not t or t[0] == TAG_END:
                return out
            (nlen,) = struct.unpack(">H", buf.read(2))
            name = buf.read(nlen).decode("utf-8", errors="replace")
            out[name] = _read_payload(buf, t[0])
    raise ValueError(f"unknown NBT tag {tag}")


def loads(data: bytes) -> tuple[str, dict]:
    """Parse an (uncompressed) NBT blob → (root name, root compound)."""
    buf = BytesIO(data)
    tag = buf.read(1)[0]
    if tag != TAG_COMPOUND:
        raise ValueError(f"root must be TAG_Compound, got {tag}")
    (nlen,) = struct.unpack(">H", buf.read(2))
    name = buf.read(nlen).decode("utf-8", errors="replace")
    return name, _read_payload(buf, TAG_COMPOUND)


# --- writer --------------------------------------------------------------------

def _write_payload(out: bytearray, v: _Tagged) -> None:
    t = v.tag
    if t in _SCALAR:
        out += struct.pack(_SCALAR[t], v.value)
    elif t == TAG_BYTE_ARRAY:
        out += struct.pack(">i", len(v.value))
        out += bytes(v.value)
    elif t in (TAG_INT_ARRAY, TAG_LONG_ARRAY):
        fmt = _ARRAY_ELEM[t]
        out += struct.pack(">i", len(v.value))
        out += struct.pack(f">{len(v.value)}{fmt[1]}", *v.value)
    elif t == TAG_STRING:
        b = v.value.encode("utf-8")
        out += struct.pack(">H", len(b)) + b
    elif t == TAG_LIST:
        out.append(v.elem_tag)
        out += struct.pack(">i", len(v.value))
        for e in v.value:
            _write_payload(out, e)
    elif t == TAG_COMPOUND:
        for name, e in v.value.items():
            out.append(e.tag)
            b = name.encode("utf-8")
            out += struct.pack(">H", len(b)) + b
            _write_payload(out, e)
        out.append(TAG_END)
    else:
        raise ValueError(f"unknown NBT tag {t}")


def dumps(name: str, compound: Compound) -> bytes:
    """Serialize a root compound (typed wrappers) → NBT bytes."""
    out = bytearray([TAG_COMPOUND])
    b = name.encode("utf-8")
    out += struct.pack(">H", len(b)) + b
    _write_payload(out, compound)
    return bytes(out)
