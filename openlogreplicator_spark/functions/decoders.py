"""Vectorized value decoders for Oracle on-disk encodings (SURVEY.md §2.7).

The reference decodes these scalar-per-value in C++ (`Builder::processValue`,
/root/reference/src/builder/Builder.cpp:129-580); here each decoder is an
Arrow-batched pandas UDF over a binary column (input_hint: no per-row Python
in the hot path — numpy/pandas per batch), plus native-expression renderers
where Spark builtins suffice.

Encodings implemented (all publicly documented Oracle formats):
* NUMBER   — exponent byte + base-100 mantissa; negatives are 101-complement
             digits with a 0x66 terminator (reference `parseNumber`,
             Builder.h:353-488).
* DATE     — 7 bytes: century+100, year-in-century+100, month, day, hour+1,
             minute+1, second+1 (reference Builder.cpp:201-242).
* binary_double/float — IEEE with Oracle's order-preserving sign trick:
             positives have the sign bit flipped, negatives are fully
             inverted (reference `decodeDouble/decodeFloat`).
* ROWID    — (dataObj, afn, dba, slot) → 18-char base-64 text
             (reference typeRowId.h; BuilderJson.cpp:394-410).
* XID      — usn.slt.sqn rendered %04x.%03x.%08x (reference typeXid.h).
"""

from __future__ import annotations

import struct
from decimal import Decimal

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType, TimestampType

# ----------------------------------------------------------------- NUMBER


def decode_oracle_number(b: bytes | None) -> Decimal | None:
    """Pure-python reference decoder for one Oracle NUMBER value."""
    if b is None or len(b) == 0:
        return None
    if b == b"\x80":
        return Decimal(0)
    exp_byte = b[0]
    if exp_byte & 0x80:  # positive
        exp = (exp_byte & 0x7F) - 64  # power of 100
        digits = [d - 1 for d in b[1:]]
        sign = 1
    else:  # negative: digits are 101-complement, trailing 0x66 marker
        exp = (~exp_byte & 0x7F) - 64
        mant = b[1:-1] if b[-1] == 0x66 else b[1:]
        digits = [101 - d for d in mant]
        sign = -1
    val = Decimal(0)
    for i, d in enumerate(digits):
        val += Decimal(d) * (Decimal(100) ** (exp - 1 - i))
    return sign * val


def _number_batch(s: pd.Series) -> pd.Series:
    return s.map(lambda b: None if b is None else str(decode_oracle_number(bytes(b))))


# Decimal scale varies per value; render as string (the reference also emits
# NUMBER as a decimal string, BuilderJson.cpp).
oracle_number_udf = pandas_udf(_number_batch, StringType())


def encode_oracle_number(v) -> bytes:
    """Inverse of decode_oracle_number (property-test fixture generator).
    Any finite Decimal is exactly representable (base 100 = 10²)."""
    v = Decimal(v)
    if v == 0:
        return b"\x80"
    sign = 1 if v > 0 else -1
    a = abs(v)
    # smallest e with a < 100^e  (i.e. 100^(e-1) <= a < 100^e)
    e = a.adjusted() // 2 + 1
    while a >= Decimal(100) ** e:
        e += 1
    while a < Decimal(100) ** (e - 1):
        e -= 1
    digits = []
    rem = a
    k = e - 1
    while rem != 0 and len(digits) < 20:
        d = int(rem / (Decimal(100) ** k))
        digits.append(d)
        rem -= Decimal(d) * (Decimal(100) ** k)
        k -= 1
    while digits and digits[-1] == 0:
        digits.pop()
    if sign > 0:
        return bytes([0xC0 + e] + [d + 1 for d in digits])
    out = [(~(0xC0 + e)) & 0xFF] + [101 - d for d in digits]
    if len(out) < 21:
        out.append(0x66)
    return bytes(out)


# ------------------------------------------------------------------- DATE


def decode_oracle_date(b: bytes | None):
    import datetime as dt

    if b is None or len(b) < 7:
        return None
    cc, yy, mm, dd, h, mi, s = b[0] - 100, b[1] - 100, b[2], b[3], b[4] - 1, b[5] - 1, b[6] - 1
    year = cc * 100 + yy
    try:
        return dt.datetime(year, mm, dd, h, mi, s)
    except ValueError:
        return None


def _date_batch(s: pd.Series) -> pd.Series:
    return s.map(lambda b: None if b is None else decode_oracle_date(bytes(b)))


oracle_date_udf = pandas_udf(_date_batch, TimestampType())


# ---------------------------------------------------- binary_double/float


def decode_oracle_double(b: bytes | None) -> float | None:
    if b is None or len(b) != 8:
        return None
    raw = bytearray(b)
    if raw[0] & 0x80:  # stored-positive: clear the flipped sign bit
        raw[0] &= 0x7F
    else:  # stored-negative: invert every bit
        raw = bytearray(x ^ 0xFF for x in raw)
    return struct.unpack(">d", bytes(raw))[0]


def _double_batch(s: pd.Series) -> pd.Series:
    return s.map(lambda b: None if b is None else decode_oracle_double(bytes(b)))


oracle_double_udf = pandas_udf(_double_batch, DoubleType())


def encode_oracle_double(v: float) -> bytes:
    """Inverse of decode_oracle_double (test fixture generator)."""
    raw = bytearray(struct.pack(">d", v))
    if raw[0] & 0x80:  # negative double -> fully inverted
        return bytes(x ^ 0xFF for x in raw)
    raw[0] |= 0x80  # positive -> flip sign bit
    return bytes(raw)


# ------------------------------------------------------- ROWID / XID text

_B64 = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"


def rowid_expr(data_obj: Column, afn: Column, dba: Column, slot: Column) -> Column:
    """18-char rowid text via native expressions (no UDF): 6 chars dataObj,
    3 afn, 6 block (dba & 0x3FFFFF), 3 slot, base-64 alphabet."""

    def b64(col: Column, width: int) -> Column:
        parts = [
            F.substr(
                F.lit(_B64),
                (F.shiftrightunsigned(col, 6 * i).bitwiseAND(F.lit(0x3F)) + 1).cast("int"),
                F.lit(1),
            )
            for i in range(width - 1, -1, -1)
        ]
        return F.concat(*parts)

    block = dba.bitwiseAND(F.lit(0x3FFFFF))
    return F.concat(b64(data_obj, 6), b64(afn, 3), b64(block, 6), b64(slot, 3))


def xid_expr(usn: Column, slt: Column, sqn: Column) -> Column:
    """usn.slt.sqn rendered as 0x%04x.%03x.%08x (reference typeXid hex form)."""
    return F.format_string("0x%04x.%03x.%08x", usn, slt, sqn)
