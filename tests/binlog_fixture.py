"""Binlog fixture ENCODER: synthesize valid MySQL binlog v4 bytes for
the wire-format decoder tests (go_cdc_spark/sources/binlog.py).

Written from the same public layout the decoder parses (MySQL
Internals manual / libbinlogevents): magic + v4 common headers,
FORMAT_DESCRIPTION with a CRC32 checksum declaration, GTID, QUERY,
XID, TABLE_MAP (with 8.0 optional-metadata TLVs: SIGNEDNESS,
COLUMN_NAME, SIMPLE_PRIMARY_KEY), and WRITE/UPDATE/DELETE_ROWS v2.
Round-tripping through an independent encoder is the strongest
no-MySQL test we can run: every byte the decoder consumes was produced
by arithmetic, not copied from its own output.
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib
from dataclasses import dataclass

from go_cdc_spark.sources.binlog import (
    BINLOG_MAGIC,
    COMMON_HEADER_LEN,
    DELETE_ROWS_EVENT,
    FORMAT_DESCRIPTION_EVENT,
    GTID_EVENT,
    MYSQL_TYPE_BLOB,
    MYSQL_TYPE_DATE,
    MYSQL_TYPE_DATETIME2,
    MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_FLOAT,
    MYSQL_TYPE_INT24,
    MYSQL_TYPE_LONG,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_NEWDECIMAL,
    MYSQL_TYPE_SHORT,
    MYSQL_TYPE_STRING,
    MYSQL_TYPE_TIME2,
    MYSQL_TYPE_TIMESTAMP2,
    MYSQL_TYPE_TINY,
    MYSQL_TYPE_VARCHAR,
    MYSQL_TYPE_YEAR,
    QUERY_EVENT,
    TABLE_MAP_EVENT,
    UPDATE_ROWS_EVENT,
    WRITE_ROWS_EVENT,
    XID_EVENT,
    _DEC_DIG_BYTES,
    decimal_byte_len,
)

_NUMERIC = {
    MYSQL_TYPE_TINY, MYSQL_TYPE_SHORT, MYSQL_TYPE_INT24, MYSQL_TYPE_LONG,
    MYSQL_TYPE_LONGLONG, MYSQL_TYPE_FLOAT, MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_NEWDECIMAL, MYSQL_TYPE_YEAR,
}
_INT_SIZES = {
    MYSQL_TYPE_TINY: 1, MYSQL_TYPE_SHORT: 2, MYSQL_TYPE_INT24: 3,
    MYSQL_TYPE_LONG: 4, MYSQL_TYPE_LONGLONG: 8,
}


@dataclass
class Col:
    name: str
    type: int
    meta: object = None  # varchar max_len | (prec, scale) | blob len-bytes | fsp
    signed: bool = True


def _lenenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + n.to_bytes(2, "little")
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + n.to_bytes(8, "little")


def encode_newdecimal(value: str, precision: int, scale: int) -> bytes:
    neg = value.startswith("-")
    value = value.lstrip("-+")
    int_part, _, frac_part = value.partition(".")
    intg = precision - scale
    int_digits = (int_part or "0").zfill(intg)
    frac_digits = (frac_part or "").ljust(scale, "0")[:scale]
    out = bytearray()

    def put(digits: str):
        nb = _DEC_DIG_BYTES[len(digits)]
        if nb:
            out.extend(int(digits).to_bytes(nb, "big"))

    lead = intg % 9
    put(int_digits[:lead])
    for i in range(intg // 9):
        put(int_digits[lead + i * 9 : lead + (i + 1) * 9])
    for i in range(scale // 9):
        put(frac_digits[i * 9 : (i + 1) * 9])
    tail = scale % 9
    if tail:
        put(frac_digits[scale - tail :])
    assert len(out) == decimal_byte_len(precision, scale)
    out[0] ^= 0x80
    if neg:
        out = bytearray(b ^ 0xFF for b in out)
    return bytes(out)


def _frac_bytes(micros: int, fsp: int) -> bytes:
    nb = (fsp + 1) // 2
    if nb == 0:
        return b""
    return (micros // 10 ** (6 - fsp)).to_bytes(nb, "big")


def _encode_value(col: Col, v) -> bytes:
    ct = col.type
    if ct in _INT_SIZES:
        n = _INT_SIZES[ct]
        return (v & ((1 << (8 * n)) - 1)).to_bytes(n, "little")
    if ct == MYSQL_TYPE_FLOAT:
        return struct.pack("<f", v)
    if ct == MYSQL_TYPE_DOUBLE:
        return struct.pack("<d", v)
    if ct == MYSQL_TYPE_NEWDECIMAL:
        prec, scale = col.meta
        return encode_newdecimal(str(v), prec, scale)
    if ct in (MYSQL_TYPE_VARCHAR,):
        b = v.encode("utf-8")
        pre = len(b).to_bytes(2, "little") if col.meta > 255 else bytes([len(b)])
        return pre + b
    if ct == MYSQL_TYPE_STRING:
        b = v.encode("utf-8")
        return bytes([len(b)]) + b
    if ct == MYSQL_TYPE_BLOB:
        return len(v).to_bytes(col.meta, "little") + v
    if ct == MYSQL_TYPE_DATE:
        y, m, d = (int(x) for x in v.split("-"))
        return ((y << 9) | (m << 5) | d).to_bytes(3, "little")
    if ct == MYSQL_TYPE_YEAR:
        return bytes([v - 1900 if v else 0])
    if ct == MYSQL_TYPE_DATETIME2:
        fsp = col.meta
        date, _, time = v.partition(" ")
        y, mo, d = (int(x) for x in date.split("-"))
        hms, _, frac = time.partition(".")
        h, mi, s = (int(x) for x in hms.split(":"))
        micros = int(frac.ljust(6, "0")) if frac else 0
        packed = (
            ((y * 13 + mo) << 22) | (d << 17) | (h << 12) | (mi << 6) | s
        ) + 0x8000000000
        return packed.to_bytes(5, "big") + _frac_bytes(micros, fsp)
    if ct == MYSQL_TYPE_TIMESTAMP2:
        fsp = col.meta
        from datetime import datetime, timezone

        hms, _, frac = v.partition(".")
        dt = datetime.strptime(hms, "%Y-%m-%d %H:%M:%S").replace(
            tzinfo=timezone.utc
        )
        micros = int(frac.ljust(6, "0")) if frac else 0
        return int(dt.timestamp()).to_bytes(4, "big") + _frac_bytes(micros, fsp)
    if ct == MYSQL_TYPE_TIME2:
        fsp = col.meta
        neg = v.startswith("-")
        hms, _, frac = v.lstrip("-").partition(".")
        h, mi, s = (int(x) for x in hms.split(":"))
        packed = (h << 12) | (mi << 6) | s
        if neg:
            packed = -packed
        micros = int(frac.ljust(6, "0")) if frac else 0
        return (packed + 0x800000).to_bytes(3, "big") + _frac_bytes(micros, fsp)
    raise ValueError(f"fixture encoder: unsupported type {ct}")


class BinlogWriter:
    """Accumulates a synthetic binlog file. ``checksum=True`` writes
    CRC32 trailers (and declares them in the FDE)."""

    def __init__(self, server_id: int = 1, checksum: bool = True, fde: bool = True):
        self.server_id = server_id
        self.checksum = checksum
        self.buf = bytearray(BINLOG_MAGIC)
        self.tables: dict[int, list[Col]] = {}
        if fde:
            self._fde()

    # -- low-level -----------------------------------------------------------

    def _emit(self, type_code: int, body: bytes, timestamp: int = 0) -> None:
        trailer = 4 if self.checksum else 0
        size = COMMON_HEADER_LEN + len(body) + trailer
        log_pos = len(self.buf) + size
        header = (
            timestamp.to_bytes(4, "little")
            + bytes([type_code])
            + self.server_id.to_bytes(4, "little")
            + size.to_bytes(4, "little")
            + log_pos.to_bytes(4, "little")
            + (0).to_bytes(2, "little")
        )
        ev = header + body
        if self.checksum:
            ev += (zlib.crc32(ev) & 0xFFFFFFFF).to_bytes(4, "little")
        self.buf.extend(ev)

    def _fde(self) -> None:
        body = (
            (4).to_bytes(2, "little")
            + b"8.0.99-fixture".ljust(50, b"\x00")
            + (0).to_bytes(4, "little")
            + bytes([COMMON_HEADER_LEN])
            + bytes(40)  # post-header length table (decoder ignores)
            + bytes([1 if self.checksum else 0])  # checksum algorithm
        )
        self._emit(FORMAT_DESCRIPTION_EVENT, body)

    # -- events --------------------------------------------------------------

    def gtid(self, sid: str, gno: int) -> None:
        body = bytes([1]) + _uuid.UUID(sid).bytes + gno.to_bytes(8, "little")
        self._emit(GTID_EVENT, body)

    def query(self, schema: str, query: str) -> None:
        sb, qb = schema.encode(), query.encode()
        body = (
            (0).to_bytes(4, "little")          # thread_id
            + (0).to_bytes(4, "little")        # exec_time
            + bytes([len(sb)])
            + (0).to_bytes(2, "little")        # error_code
            + (0).to_bytes(2, "little")        # status_vars_length
            + sb + b"\x00" + qb
        )
        self._emit(QUERY_EVENT, body)

    def xid(self, xid: int = 1) -> None:
        self._emit(XID_EVENT, xid.to_bytes(8, "little"))

    def table_map(
        self,
        table_id: int,
        schema: str,
        table: str,
        cols: list[Col],
        with_names: bool = True,
        pk: list[int] | None = None,
    ) -> None:
        self.tables[table_id] = cols
        sb, tb = schema.encode(), table.encode()
        meta = bytearray()
        for c in cols:
            if c.type in (MYSQL_TYPE_VARCHAR,):
                meta += c.meta.to_bytes(2, "little")
            elif c.type == MYSQL_TYPE_NEWDECIMAL:
                meta += bytes([c.meta[0], c.meta[1]])
            elif c.type == MYSQL_TYPE_STRING:
                meta += bytes([MYSQL_TYPE_STRING, c.meta])
            elif c.type == MYSQL_TYPE_BLOB:
                meta += bytes([c.meta])
            elif c.type in (MYSQL_TYPE_FLOAT, MYSQL_TYPE_DOUBLE):
                meta += bytes([4 if c.type == MYSQL_TYPE_FLOAT else 8])
            elif c.type in (MYSQL_TYPE_TIMESTAMP2, MYSQL_TYPE_DATETIME2, MYSQL_TYPE_TIME2):
                meta += bytes([c.meta])
        n = len(cols)
        body = bytearray()
        body += table_id.to_bytes(6, "little") + (1).to_bytes(2, "little")
        body += bytes([len(sb)]) + sb + b"\x00"
        body += bytes([len(tb)]) + tb + b"\x00"
        body += _lenenc(n) + bytes(c.type for c in cols)
        body += _lenenc(len(meta)) + meta
        body += b"\xff" * ((n + 7) // 8)  # nullability bitmap (all nullable)
        # optional metadata TLVs
        numeric = [c for c in cols if c.type in _NUMERIC]
        if numeric:
            bm = bytearray((len(numeric) + 7) // 8)
            for i, c in enumerate(numeric):
                if not c.signed:  # set bit = UNSIGNED, MSB-first
                    bm[i // 8] |= 0x80 >> (i % 8)
            body += bytes([1]) + _lenenc(len(bm)) + bm
        if with_names:
            val = bytearray()
            for c in cols:
                nb = c.name.encode()
                val += _lenenc(len(nb)) + nb
            body += bytes([4]) + _lenenc(len(val)) + val
        if pk is not None:
            val = bytearray()
            for ix in pk:
                val += _lenenc(ix)
            body += bytes([8]) + _lenenc(len(val)) + val
        self._emit(TABLE_MAP_EVENT, bytes(body))

    def _image(self, cols: list[Col], img: dict) -> bytes:
        null_bm = bytearray((len(cols) + 7) // 8)
        vals = bytearray()
        for i, c in enumerate(cols):
            v = img.get(c.name)
            if v is None:
                null_bm[i // 8] |= 1 << (i % 8)
            else:
                vals += _encode_value(c, v)
        return bytes(null_bm) + bytes(vals)

    def _rows(self, type_code: int, table_id: int, payload: bytes, n_bitmaps: int) -> None:
        cols = self.tables[table_id]
        n = len(cols)
        body = bytearray()
        body += table_id.to_bytes(6, "little") + (1).to_bytes(2, "little")
        body += (2).to_bytes(2, "little")  # v2 extra-data length (just itself)
        body += _lenenc(n)
        body += (b"\xff" * ((n + 7) // 8)) * n_bitmaps  # all columns present
        body += payload
        self._emit(type_code, bytes(body))

    def write_rows(self, table_id: int, images: list[dict]) -> None:
        cols = self.tables[table_id]
        self._rows(
            WRITE_ROWS_EVENT, table_id,
            b"".join(self._image(cols, i) for i in images), 1,
        )

    def delete_rows(self, table_id: int, images: list[dict]) -> None:
        cols = self.tables[table_id]
        self._rows(
            DELETE_ROWS_EVENT, table_id,
            b"".join(self._image(cols, i) for i in images), 1,
        )

    def update_rows(self, table_id: int, pairs: list[tuple[dict, dict]]) -> None:
        cols = self.tables[table_id]
        payload = b"".join(
            self._image(cols, b) + self._image(cols, a) for b, a in pairs
        )
        self._rows(UPDATE_ROWS_EVENT, table_id, payload, 2)

    def bytes(self) -> bytes:
        return bytes(self.buf)

    def write(self, path) -> str:
        with open(path, "wb") as f:
            f.write(self.buf)
        return str(path)
