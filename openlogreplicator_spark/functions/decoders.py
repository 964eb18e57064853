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
from pyspark.sql.types import DoubleType, LongType, StringType, TimestampType

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


def decode_oracle_timestamp(b: bytes | None):
    """7- or 11-byte TIMESTAMP: the 7-byte DATE prefix plus an optional
    4-byte big-endian NANOSECOND fraction (reference Builder.cpp:243-291,
    ``fraction = Ctx::read32Big(data + 7)``). Microsecond precision kept
    (Spark timestamps are µs); sub-µs truncated like the reference's digit
    cut at the column's scale."""
    base = decode_oracle_date(b)
    if base is None:
        return None
    if len(b) >= 11:
        nanos = struct.unpack(">I", b[7:11])[0]
        if nanos < 1_000_000_000:
            base = base.replace(microsecond=nanos // 1000)
    return base


def encode_oracle_timestamp(ts, nanos: int | None = None) -> bytes:
    """Inverse of decode_oracle_timestamp (property-test fixture generator)."""
    b = bytes([
        ts.year // 100 + 100, ts.year % 100 + 100, ts.month, ts.day,
        ts.hour + 1, ts.minute + 1, ts.second + 1,
    ])
    if nanos is None:
        nanos = ts.microsecond * 1000
    return b + struct.pack(">I", nanos)


def _date_batch(s: pd.Series) -> pd.Series:
    return s.map(lambda b: None if b is None else decode_oracle_date(bytes(b)))


oracle_date_udf = pandas_udf(_date_batch, TimestampType())


def _timestamp_batch(s: pd.Series) -> pd.Series:
    return s.map(lambda b: None if b is None else decode_oracle_timestamp(bytes(b)))


oracle_timestamp_udf = pandas_udf(_timestamp_batch, TimestampType())


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


# ------------------------------------------------- charset decode (F2)


# Oracle charset name → Java charset name (public mapping, Oracle NLS docs /
# IANA names). Covers the charsets seen in practice; the reference instead
# ships per-charset byte tables (src/locales/*, ~6,400 LoC) because it
# decodes raw redo bytes in-process — JVM charsets are the Spark-native
# equivalent. Names absent here pass through unchanged (Java may still know
# them under the given alias).
ORACLE_CHARSET_MAP: dict[str, str] = {
    # Oracle's "UTF8" is CESU-8, NOT true UTF-8: supplementary characters are
    # stored as 6-byte surrogate pairs — routed to the CESU-8-aware kernel
    # below (only AL32UTF8 is real UTF-8). ADVICE r02.
    "AL32UTF8": "UTF-8", "UTF8": "cesu-8", "AL16UTF16": "UTF-16BE",
    "US7ASCII": "US-ASCII",
    "WE8ISO8859P1": "ISO-8859-1", "WE8ISO8859P15": "ISO-8859-15",
    "EE8ISO8859P2": "ISO-8859-2", "SE8ISO8859P3": "ISO-8859-3",
    "NEE8ISO8859P4": "ISO-8859-4", "CL8ISO8859P5": "ISO-8859-5",
    "AR8ISO8859P6": "ISO-8859-6", "EL8ISO8859P7": "ISO-8859-7",
    "IW8ISO8859P8": "ISO-8859-8", "WE8ISO8859P9": "ISO-8859-9",
    "NE8ISO8859P10": "ISO-8859-10", "BLT8ISO8859P13": "ISO-8859-13",
    "CEL8ISO8859P14": "ISO-8859-14",
    "WE8MSWIN1252": "windows-1252", "EE8MSWIN1250": "windows-1250",
    "CL8MSWIN1251": "windows-1251", "EL8MSWIN1253": "windows-1253",
    "TR8MSWIN1254": "windows-1254", "IW8MSWIN1255": "windows-1255",
    "AR8MSWIN1256": "windows-1256", "BLT8MSWIN1257": "windows-1257",
    "VN8MSWIN1258": "windows-1258",
    # NOTE (round 4): the CJK names below are retained as documentation of
    # the nearest stock codec, but charset_decode routes them through the
    # generated reference-parity WIDE tables (charset_tables_2b) — the
    # stock codecs diverge (shift_jis vs JA16SJIS: 10k+ fullwidth
    # mappings; gbk vs ZHS16GBK: 2k PUA cells). Only GB18030 stays on the
    # stock codec: the reference implements it algorithmically and the
    # codec is pinned by the GB 18030 standard itself.
    "JA16SJIS": "shift_jis", "JA16EUC": "euc_jp",
    "KO16KSC5601": "euc_kr", "KO16MSWIN949": "cp949",
    "ZHS16GBK": "gbk", "ZHS16CGB231280": "gb2312", "ZHT16BIG5": "big5",
    "ZHS32GB18030": "gb18030",
    "TH8TISASCII": "tis-620",
    "RU8PC866": "cp866", "US8PC437": "cp437", "WE8PC850": "cp850",
    "WE8EBCDIC37": "cp037", "WE8EBCDIC500": "cp500",
}

# charsets Spark's builtin `decode` accepts (the JVM fast path); everything
# else decodes through the Arrow-batched codec kernel below
_SPARK_DECODE_BUILTIN = {
    "utf-8", "utf-16", "utf-16be", "utf-16le", "utf-32", "iso-8859-1",
    "us-ascii",
}


def _mcs_table() -> tuple:
    """DEC Multinational Character Set (Oracle WE8DEC) — a charset absent
    from both the Python and Java codec registries, decoded via a hand-built
    256-entry table exactly the way the reference's CharacterSet8bit tables
    work (src/locales/CharacterSet8bit.cpp). The mapping is public (DEC
    STD 070): Latin-1 except the positions below; unassigned positions
    decode to U+FFFD like every other malformed input here."""
    t = [chr(i) for i in range(256)]  # latin-1 identity baseline
    for pos in range(0x80, 0xA0):
        t[pos] = "�"  # C1 area unassigned in MCS (DEC STD 070)
    for pos in (0xA0, 0xA4, 0xA6, 0xA8, 0xAC, 0xAD, 0xAE, 0xAF, 0xB4, 0xB8,
                0xBE, 0xD0, 0xDE, 0xF0, 0xFE, 0xFF):
        t[pos] = "�"  # unassigned in MCS
    t[0xA8] = "¤"   # ¤ currency sign (Latin-1 puts it at A4)
    t[0xD7] = "Œ"   # Œ  (Latin-1: ×)
    t[0xDD] = "Ÿ"   # Ÿ  (Latin-1: Ý)
    t[0xF7] = "œ"   # œ  (Latin-1: ÷)
    t[0xFD] = "ÿ"   # ÿ  (Latin-1: ý)
    return tuple(t)


# Oracle-only single-byte charsets with no BYTE-EXACT Python/Java codec:
# 256-entry decode tables (the reference's CharacterSet{7,8}bit pattern).
# Since round 4 the full set (96 tables — every 7/8-bit charset the
# reference instantiates whose mapping differs from every stock codec,
# incl. the 5-undefined-position divergence of the windows-125x family)
# is generated from the public standards data in
# functions/charset_tables.py (provenance + regeneration:
# scripts/gen_charset_tables.py; parity gate: tests/test_charset_parity).
# The hand-built WE8DEC entry is kept as an independent derivation of the
# same public DEC STD 070 data — the parity test cross-checks the two.
from .charset_tables import STOCK_EXACT, byte_tables as _gen_byte_tables

ORACLE_BYTE_TABLES: dict[str, tuple] = {
    **_gen_byte_tables(),
    "WE8DEC": _mcs_table(),
}

# stock-codec fast path for sets audited byte-exact vs the reference tables
ORACLE_CHARSET_MAP.update(STOCK_EXACT)


# Multi-byte Oracle charsets (F2 tail, round 4): generated reference-parity
# tables for the 19 JA16/KO16/ZHS16/ZHT16/ZHT32 sets (JIS/KSC/GB/Big5/CNS
# standards data — provenance: scripts/gen_charset_tables_2b.py; parity:
# tests/test_charset_parity.py). Expanded lazily — the 4-byte planes hold
# ~230k entries and most sessions never decode CJK.
from .charset_tables_2b import WIDE_ALIASES, WIDE_SPEC

_WIDE_CACHE: dict | None = None


def _wide_entry(name: str) -> dict:
    global _WIDE_CACHE
    if _WIDE_CACHE is None:
        from .charset_tables_2b import wide_tables

        _WIDE_CACHE = wide_tables()
    return _WIDE_CACHE[name]


def _decode_wide_one(ent: dict, b: bytes) -> str:
    """Reference CharacterSet16bit/JA16EUC/ZHT32* decode semantics over the
    generated tables: ASCII passthrough, optional single-byte rules
    (SJIS half-width katakana, GBK euro), optional 3-/4-byte prefixed
    planes, rectangular range checks, U+FFFD on any malformed/truncated
    sequence (badChar — consuming exactly the bytes read, as the
    reference does)."""
    sp = ent["spec"]
    r2, t2 = sp.get("2b"), ent.get("2b")
    r3, t3 = sp.get("3b"), ent.get("3b")
    r4, t4 = sp.get("4b"), ent.get("4b")
    sb = sp.get("sb") or ()
    out: list[str] = []
    i, n = 0, len(b)
    while i < n:
        b1 = b[i]
        i += 1
        if b1 <= 0x7F:
            out.append(chr(b1))
            continue
        matched_sb = False
        for lo, hi, base in sb:
            if lo <= b1 <= hi:
                out.append(chr(base + b1 - lo))
                matched_sb = True
                break
        if matched_sb:
            continue
        if r4 is not None and b1 == r4[0]:
            if i + 3 > n:
                out.append("�")
                i = n
                continue
            b2, b3, b4 = b[i], b[i + 1], b[i + 2]
            i += 3
            if (r4[1] <= b2 <= r4[2] and r4[3] <= b3 <= r4[4]
                    and r4[5] <= b4 <= r4[6]):
                out.append(t4[
                    (b2 - r4[1]) * (r4[4] - r4[3] + 1) * (r4[6] - r4[5] + 1)
                    + (b3 - r4[3]) * (r4[6] - r4[5] + 1)
                    + (b4 - r4[5])
                ])
            else:
                out.append("�")
            continue
        if r3 is not None and b1 == r3[0]:
            if i + 2 > n:
                out.append("�")
                i = n
                continue
            b2, b3 = b[i], b[i + 1]
            i += 2
            if r3[1] <= b2 <= r3[2] and r3[3] <= b3 <= r3[4]:
                out.append(t3[
                    (b2 - r3[1]) * (r3[4] - r3[3] + 1) + (b3 - r3[3])
                ])
            else:
                out.append("�")
            continue
        if r2 is None or i >= n:
            out.append("�")
            continue
        b2 = b[i]
        i += 1
        if r2[0] <= b1 <= r2[1] and r2[2] <= b2 <= r2[3]:
            out.append(t2[(b1 - r2[0]) * (r2[3] - r2[2] + 1) + (b2 - r2[2])])
        else:
            out.append("�")
    return "".join(out)


def _decode_cesu8(b: bytes) -> str:
    """CESU-8 (Oracle's 'UTF8'): decode bytes allowing UTF-8-encoded UTF-16
    surrogates, then re-pair them into supplementary characters. Falls back
    to replacement characters on malformed input, like the other codecs."""
    try:
        s = b.decode("utf-8", errors="surrogatepass")
        # re-combine surrogate pairs: utf-16 round-trip pairs them back up
        return s.encode("utf-16", "surrogatepass").decode("utf-16")
    except UnicodeError:
        return b.decode("utf-8", errors="replace")


def _codec_decode_udf(codec: str):
    if codec.lower() == "cesu-8":
        decode_one = _decode_cesu8
    elif codec.upper() in WIDE_SPEC or codec.upper() in WIDE_ALIASES:
        ent = _wide_entry(codec.upper())

        def decode_one(b: bytes) -> str:
            return _decode_wide_one(ent, b)
    elif codec.upper() in ORACLE_BYTE_TABLES:
        table = ORACLE_BYTE_TABLES[codec.upper()]

        def decode_one(b: bytes) -> str:
            return "".join(table[c] for c in b)
    else:
        def decode_one(b: bytes) -> str:
            return b.decode(codec, errors="replace")

    def _batch(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else decode_one(bytes(b)))

    return pandas_udf(_batch, StringType())


def charset_decode(col: Column, charset: str = "UTF-8") -> Column:
    """F2: charset → UTF-8 string. Accepts either an ORACLE charset name
    (resolved through ORACLE_CHARSET_MAP — the dictionary's
    NLS_CHARACTERSET value can be passed straight in) or a codec name.
    Unicode/Latin-1 decode stays on Spark's builtin `decode` (JVM,
    whole-stage codegen); the long tail (windows-125x, Shift_JIS, GBK,
    EBCDIC, ...) decodes through an Arrow-batched codec kernel with
    replacement-character semantics. The reference instead ships ~6,400 LoC
    of per-charset byte tables (src/locales/*) because it decodes raw redo
    bytes in C++. Multi-chunk continuation (prevChars overlap for split
    multibyte sequences, Builder.h:1022-1045) is unnecessary here: a
    DataFrame value is always a complete byte string."""
    cu = charset.upper()
    if cu in ORACLE_BYTE_TABLES or cu in WIDE_SPEC or cu in WIDE_ALIASES:
        # reference-parity table takes priority over any APPROXIMATE codec
        # alias (e.g. WE8MSWIN1252 differs from cp1252 in the five
        # undefined positions; JA16SJIS differs from shift_jis in 10k+
        # fullwidth mappings); byte-exact sets are NOT in the table dicts,
        # so the JVM/codec fast paths below still serve them
        return _codec_decode_udf(cu)(col)
    name = ORACLE_CHARSET_MAP.get(cu, charset)
    if name.lower() in _SPARK_DECODE_BUILTIN:
        return F.decode(col, name)
    return _codec_decode_udf(name)(col)


# --------------------------------------------- intervals (F5) + TSTZ (F4)


def decode_interval_ym(b: bytes | None) -> tuple[int, int] | None:
    """5-byte INTERVAL YEAR TO MONTH: years+0x80000000 (4B BE), months+60."""
    if b is None or len(b) != 5:
        return None
    years = struct.unpack(">I", b[:4])[0] - (1 << 31)
    months = b[4] - 60
    return years, months


def decode_interval_ds(b: bytes | None) -> tuple[int, int, int, int, int] | None:
    """11-byte INTERVAL DAY TO SECOND: days+2^31 (4B), h+60, m+60, s+60,
    nanos+2^31 (4B)."""
    if b is None or len(b) != 11:
        return None
    days = struct.unpack(">I", b[:4])[0] - (1 << 31)
    h, m, s = b[4] - 60, b[5] - 60, b[6] - 60
    nanos = struct.unpack(">I", b[7:11])[0] - (1 << 31)
    return days, h, m, s, nanos


def _interval_ym_batch(s: pd.Series) -> pd.Series:
    def conv(b):
        t = decode_interval_ym(bytes(b)) if b is not None else None
        return None if t is None else t[0] * 12 + t[1]

    return s.map(conv)


# months since zero — cast to YearMonthIntervalType downstream via
# make_ym_interval; kept LongType here (Arrow has no YM interval)
interval_ym_months_udf = pandas_udf(_interval_ym_batch, LongType())


def _interval_ds_micros_batch(s: pd.Series) -> pd.Series:
    def conv(b):
        t = decode_interval_ds(bytes(b)) if b is not None else None
        if t is None:
            return None
        days, h, m, sec, nanos = t
        return ((days * 86400 + h * 3600 + m * 60 + sec) * 1_000_000
                + nanos // 1000)

    return s.map(conv)


interval_ds_micros_udf = pandas_udf(_interval_ds_micros_batch, LongType())


def interval_ym_col(raw: Column) -> Column:
    """F5: raw bytes → YearMonthIntervalType via make_ym_interval."""
    months = interval_ym_months_udf(raw)
    return F.make_ym_interval(
        (months / 12).cast("int"), F.pmod(months, F.lit(12)).cast("int")
    )


def interval_ds_col(raw: Column) -> Column:
    """F5: raw bytes → DayTimeIntervalType via make_dt_interval."""
    us = interval_ds_micros_udf(raw)
    return F.make_dt_interval(
        F.floor(us / F.lit(86_400_000_000)).cast("int"),
        F.lit(0), F.lit(0),
        (F.pmod(us, F.lit(86_400_000_000)) / 1_000_000).cast("double"),
    )


# Oracle tz-region key ((byte11 << 8) | byte12) → IANA name: the FULL
# 595-entry public mapping (the reference mirrors Oracle's timezone files in
# src/locales/Locales.cpp:191-786). Unknown keys render as tz#0x<key> so no
# information is lost — the reference emits "TZ?" (Builder.cpp:332).
from .tz_regions import TZ_REGION_NAMES  # noqa: E402


def decode_tstz(b: bytes | None, tz_names: dict[int, str] | None = None):
    """F4: 13-byte TIMESTAMP WITH TIME ZONE: 7-byte UTC date + 4-byte nanos +
    2 tz bytes. Mirrors the reference's branch exactly (Builder.cpp:296-333):
    byte11 in [5, 36] → fixed offset (hours biased +20, minutes +60, the
    rendered sign comes from the COMPOSITE value so -00:30 keeps its minus);
    anything else → region-key lookup of (byte11<<8)|byte12 — so malformed
    bytes outside both ranges degrade to the tz#0x<key> unknown marker, never
    a nonsense offset (round-2 ADVICE item 4). Returns (utc_datetime,
    tz_string); region names resolve through ``tz_names`` or the built-in
    full TZ_REGION_NAMES table."""
    if b is None or len(b) < 13:
        return None
    base = decode_oracle_date(b[:7])
    if base is None:
        return None
    nanos = struct.unpack(">I", b[7:11])[0]
    base = base.replace(microsecond=nanos // 1000)
    if 5 <= b[11] <= 36:  # fixed offset
        neg = b[11] < 20 or (b[11] == 20 and b[12] < 60)
        oh = 20 - b[11] if b[11] < 20 else b[11] - 20
        om = 60 - b[12] if b[12] < 60 else b[12] - 60
        tz = f"{'-' if neg else '+'}{oh:02d}:{om:02d}"
    else:  # region key (0x80-flagged in practice; out-of-range = unknown)
        key = (b[11] << 8) | b[12]
        tz = (tz_names if tz_names is not None else TZ_REGION_NAMES).get(
            key, f"tz#0x{key:04x}"
        )
    return base, tz


# ---------------------------------------------------------- XMLType (F9)

# Binary-XML section opcodes + flag bits (reference Builder.h:53-62; the
# values are Oracle's public binary-XML ["CSX"] framing as the reference
# reads it)
_XML_OP_HEADER = 158
_XML_OP_PROLOG = 159
_XML_HEADER_STANDALONE = 0x01
_XML_HEADER_XMLDECL = 0x02
_XML_HEADER_ENCODING = 0x04
_XML_HEADER_VERSION_1_1 = 0x08
_XML_HEADER_STANDALONE_YES = 0x10
_XML_PROLOG_DOCID = 0x08
_XML_PROLOG_PATHID = 0x10


def decode_xmltype(b: bytes | None) -> str | None:
    """F9: partial XMLType decode at parity with the reference's experimental
    ``Builder::parseXml`` (Builder.cpp:1611-1756, flag "experimental-xmltype"
    Ctx.h:89): walk the binary-XML stream, parse the header section (opcode
    158 → xmldecl/standalone/encoding/version flags) and the prolog (opcode
    159 → version check, skip docid/pathid), and emit the XML declaration
    followed by a hex rendering of the undecoded body bytes — the reference
    likewise hex-dumps the remaining payload "for future development". Body
    token-stream decode (element/attribute dictionary) is NOT implemented on
    either side. Returns None on malformed input (short header, prolog
    version ≠ 1), matching the reference's ``return false`` fallback. One
    deliberate divergence: the declaration renders ``encoding="UTF-8"`` (the
    reference emits the literal typo ``UTF=8``)."""
    if b is None:
        return None
    xml_decl = False
    standalone = ""
    version = '"1.0"'
    encoding = ""
    body = bytearray()
    pos, n = 0, len(b)
    while pos < n:
        op = b[pos]
        if op == _XML_OP_HEADER:
            pos += 1
            if pos + 2 >= n:
                return None  # header too short, can't read flags
            flags2 = b[pos + 2]
            pos += 3
            if flags2 & _XML_HEADER_XMLDECL:
                xml_decl = True
            if flags2 & _XML_HEADER_STANDALONE:
                standalone = (
                    ' standalone="yes"'
                    if flags2 & _XML_HEADER_STANDALONE_YES
                    else ' standalone="no"'
                )
            if flags2 & _XML_HEADER_ENCODING:
                encoding = ' encoding="UTF-8"'
            if flags2 & _XML_HEADER_VERSION_1_1:
                version = '"1.1"'
        elif op == _XML_OP_PROLOG:
            pos += 1
            if pos + 1 >= n:
                return None  # prolog too short
            if b[pos] != 1:
                return None  # unsupported binary-XML version
            flags0 = b[pos + 1]
            pos += 2
            if flags0 & _XML_PROLOG_DOCID:
                if pos >= n:
                    return None
                ln = b[pos]
                pos += 1
                if pos + ln > n:
                    return None
                pos += ln
            if flags0 & _XML_PROLOG_PATHID:
                for _ in range(2):  # two length-prefixed pathid blocks
                    if pos >= n:
                        return None
                    ln = b[pos]
                    pos += 1
                    if pos + ln > n:
                        return None
                    pos += ln
        else:
            body.append(op)
            pos += 1
    out = []
    if xml_decl:
        out.append(f"<?xml version={version}{standalone}{encoding}?>")
    if body:
        out.append(bytes(body).hex())
    return "".join(out)


def _xmltype_batch(s: pd.Series) -> pd.Series:
    return s.map(lambda b: None if b is None else decode_xmltype(bytes(b)))


xmltype_udf = pandas_udf(_xmltype_batch, StringType())


def xmltype_decode(col: Column) -> Column:
    """F9 column form: binary XMLType → declaration + hex-body string; NULL
    on malformed input (the caller can coalesce to a raw hex render, the
    reference's parseXml-returns-false path, Builder.cpp:184)."""
    return xmltype_udf(col)


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
