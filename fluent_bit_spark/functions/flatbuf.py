"""Minimal FlatBuffers wire-format reader and writer (pure Python).

The FlatBuffers binary layout is public and small:

- every offset is little-endian;
- the file starts with a uoffset32 to the root table (bytes 4-7 may
  carry a 4-char file identifier, e.g. ``TFL3`` for TFLite);
- a table starts with an soffset32 pointing BACK to its vtable
  (``vtable_pos = table_pos - soffset``); the vtable is
  ``[u16 vtable_bytes, u16 table_bytes, u16 field_off...]`` where each
  field offset is relative to the table start and 0 means "absent,
  use the schema default";
- field slot for schema id ``i`` lives at vtable byte ``4 + 2*i``;
- scalars are stored inline in the table; subobjects (tables, vectors,
  strings) are stored as uoffset32 values relative to the field's own
  location, pointing forward;
- a vector is ``[u32 count, elements...]`` (scalar elements inline,
  table/string elements as uoffset32 relative to each element slot);
- a string is ``[u32 len, bytes, NUL]``.

This is everything needed to parse (and emit) a TFLite model file;
no schema compiler, no third-party package.
"""

from __future__ import annotations

import struct


class FlatBufferReader:
    """Positional accessors over a flatbuffer byte string. All `pos`
    arguments are absolute byte offsets into the buffer."""

    def __init__(self, buf: bytes):
        self.buf = buf

    # -- scalars ------------------------------------------------------------
    def u8(self, pos: int) -> int:
        return self.buf[pos]

    def i8(self, pos: int) -> int:
        return struct.unpack_from("<b", self.buf, pos)[0]

    def u16(self, pos: int) -> int:
        return struct.unpack_from("<H", self.buf, pos)[0]

    def i32(self, pos: int) -> int:
        return struct.unpack_from("<i", self.buf, pos)[0]

    def u32(self, pos: int) -> int:
        return struct.unpack_from("<I", self.buf, pos)[0]

    def i64(self, pos: int) -> int:
        return struct.unpack_from("<q", self.buf, pos)[0]

    def f32(self, pos: int) -> float:
        return struct.unpack_from("<f", self.buf, pos)[0]

    def f64(self, pos: int) -> float:
        return struct.unpack_from("<d", self.buf, pos)[0]

    # -- structure ----------------------------------------------------------
    def root(self) -> int:
        """Absolute position of the root table."""
        return self.u32(0)

    def file_identifier(self) -> bytes:
        return self.buf[4:8]

    def indirect(self, pos: int) -> int:
        """Follow a uoffset32 stored at `pos`."""
        return pos + self.u32(pos)

    def field(self, table: int, fid: int) -> int | None:
        """Absolute position of field `fid` inside `table`, or None if
        the field is absent (schema default applies)."""
        vtable = table - self.i32(table)
        slot = 4 + 2 * fid
        if slot + 2 > self.u16(vtable):
            return None
        rel = self.u16(vtable + slot)
        return table + rel if rel else None

    def table_field(self, table: int, fid: int) -> int | None:
        """Field holding a uoffset to a sub-table -> its position."""
        f = self.field(table, fid)
        return self.indirect(f) if f is not None else None

    def vector(self, table: int, fid: int) -> tuple[int, int] | None:
        """Field holding a vector -> (first-element position, count)."""
        f = self.field(table, fid)
        if f is None:
            return None
        v = self.indirect(f)
        return v + 4, self.u32(v)

    def vector_u8s(self, table: int, fid: int) -> bytes | None:
        got = self.vector(table, fid)
        if got is None:
            return None
        pos, n = got
        return self.buf[pos : pos + n]

    def vector_i32s(self, table: int, fid: int) -> list[int] | None:
        got = self.vector(table, fid)
        if got is None:
            return None
        pos, n = got
        return list(struct.unpack_from(f"<{n}i", self.buf, pos))

    def vector_i64s(self, table: int, fid: int) -> list[int] | None:
        got = self.vector(table, fid)
        if got is None:
            return None
        pos, n = got
        return list(struct.unpack_from(f"<{n}q", self.buf, pos))

    def vector_f32s(self, table: int, fid: int) -> list[float] | None:
        got = self.vector(table, fid)
        if got is None:
            return None
        pos, n = got
        return list(struct.unpack_from(f"<{n}f", self.buf, pos))

    def vector_tables(self, table: int, fid: int) -> list[int]:
        """Vector of tables -> absolute table positions."""
        got = self.vector(table, fid)
        if got is None:
            return []
        pos, n = got
        return [self.indirect(pos + 4 * i) for i in range(n)]

    def string(self, table: int, fid: int) -> str | None:
        f = self.field(table, fid)
        if f is None:
            return None
        s = self.indirect(f)
        n = self.u32(s)
        return self.buf[s + 4 : s + 4 + n].decode("utf-8")

    def scalar(self, table: int, fid: int, kind: str, default=0):
        """Inline scalar field with schema default."""
        f = self.field(table, fid)
        if f is None:
            return default
        return {
            "u8": self.u8, "i8": self.i8, "u16": self.u16,
            "i32": self.i32, "u32": self.u32, "i64": self.i64,
            "f32": self.f32, "f64": self.f64,
        }[kind](f)


class FlatBufferWriter:
    """Back-to-front flatbuffer builder (the standard construction
    order: children first, parents after, since uoffsets point
    forward). Positions are tracked as offsets from the buffer END;
    `finish` flips them into a real file."""

    def __init__(self):
        self.buf = bytearray()  # grows at the FRONT (prepend)

    # offset-from-end of the current write head
    def _head(self) -> int:
        return len(self.buf)

    def _prepend(self, data: bytes) -> None:
        self.buf[:0] = data

    def _align(self, n: int, extra: int = 0) -> None:
        """Pad so that (head + extra) % n == 0 in final-file terms.
        Final absolute position of a byte written now is
        total_len - head - written_so_far; aligning from the end works
        because the total is itself padded to the max alignment."""
        while (len(self.buf) + extra) % n:
            self._prepend(b"\x00")

    def bytes_vector(self, data: bytes) -> int:
        self._align(4, extra=len(data))
        self._prepend(bytes(data))
        self._prepend(struct.pack("<I", len(data)))
        return self._head()

    def scalar_vector(self, fmt: str, width: int, values) -> int:
        values = list(values)
        body = struct.pack(f"<{len(values)}{fmt}", *values)
        # align the DATA to the element width; the u32 length prefix
        # then lands 4-aligned directly in front of it
        self._align(max(4, width), extra=len(body))
        self._prepend(body)
        self._prepend(struct.pack("<I", len(values)))
        return self._head()

    def string(self, s: str) -> int:
        raw = s.encode("utf-8") + b"\x00"
        self._align(4, extra=len(raw))
        self._prepend(raw)
        self._prepend(struct.pack("<I", len(raw) - 1))
        return self._head()

    def offset_vector(self, ends: list[int]) -> int:
        """Vector of uoffsets to already-written objects (given as
        offset-from-end positions)."""
        n = len(ends)
        self._align(4, extra=4 * n + 4)
        # element i sits at head_after + 4 + 4*i (from end: ...)
        total_after = len(self.buf) + 4 + 4 * n
        body = bytearray(struct.pack("<I", n))
        for i, e in enumerate(ends):
            elem_from_end = total_after - 4 - 4 * i
            body += struct.pack("<I", elem_from_end - e)
        self._prepend(bytes(body))
        return self._head()

    def table(self, fields: list[tuple[int, str, object]]) -> int:
        """fields: (field_id, kind, value); kind 'off' means `value`
        is an offset-from-end of a child object; scalar kinds are
        'i8'/'u8'/'i32'/'u32'/'i64'/'f32'. Fields with value None are
        omitted (schema default)."""
        fields = [f for f in fields if f[2] is not None]
        widths = {"i8": 1, "u8": 1, "i32": 4, "u32": 4, "f32": 4,
                  "i64": 8, "off": 4}
        fmts = {"i8": "b", "u8": "B", "i32": "i", "u32": "I",
                "f32": "f", "i64": "q"}
        max_id = max((f[0] for f in fields), default=-1)
        # table body layout: soffset32 at 0, then fields widest-first
        # (flatc packs by size for alignment; any aligned layout is valid)
        order = sorted(fields, key=lambda f: -widths[f[1]])
        layout: dict[int, tuple[int, str, object]] = {}
        cursor = 4
        for fid, kind, value in order:
            w = widths[kind]
            cursor = (cursor + w - 1) // w * w
            layout[fid] = (cursor, kind, value)
            cursor += w
        table_bytes = (cursor + 3) // 4 * 4
        vtable_bytes = 4 + 2 * (max_id + 1)
        # write the table body; uoffset fields point forward to
        # already-written children
        self._align(8 if any(k == "i64" for _, k, _v in fields) else 4,
                    extra=table_bytes)
        body = bytearray(table_bytes)
        total_after = len(self.buf) + table_bytes
        for _fid, (off, kind, value) in layout.items():
            if kind == "off":
                field_from_end = total_after - off
                struct.pack_into("<I", body, off, field_from_end - value)
            else:
                struct.pack_into("<" + fmts[kind], body, off, value)
        self._prepend(bytes(body))
        table_end = self._head()
        # vtable sits directly in front of the table
        vt = bytearray(struct.pack("<HH", vtable_bytes, table_bytes))
        for fid in range(max_id + 1):
            vt += struct.pack("<H", layout[fid][0] if fid in layout else 0)
        self._prepend(bytes(vt))
        # the table's soffset points back: table_pos - vtable_pos
        struct.pack_into("<i", self.buf, len(vt), len(vt))
        return table_end

    def finish(self, root_end: int, file_identifier: bytes = b"") -> bytes:
        """Prepend the root uoffset (+ optional 4-byte identifier).
        Pads so the total size is 8-aligned, which makes every
        offset-from-end alignment used above hold absolutely."""
        prefix = 8 if file_identifier else 4
        self._align(8, extra=prefix)
        total = len(self.buf) + prefix
        head = struct.pack("<I", total - root_end)
        if file_identifier:
            if len(file_identifier) != 4:
                raise ValueError("file identifier must be 4 bytes")
            head += file_identifier
        else:
            head += b"\x00" * 0
        return bytes(head) + (b"\x00" * (prefix - len(head))) + bytes(self.buf)
