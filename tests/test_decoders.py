"""Oracle on-disk-format decoders (SURVEY.md §2.7 F1/F3/F6/F7/F10): verified
against hand-computed encodings from the public format documentation."""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.functions.decoders import (
    decode_oracle_date,
    decode_oracle_double,
    decode_oracle_number,
    encode_oracle_double,
    oracle_date_udf,
    oracle_double_udf,
    oracle_number_udf,
    rowid_expr,
    xid_expr,
)

NUMBER_VECTORS = [
    (b"\x80", Decimal(0)),
    (b"\xc1\x02", Decimal(1)),            # 1 = 0.01 * 100^1, digit 1 -> 2
    (b"\xc2\x02\x18", Decimal(123)),      # 1,23 -> digits 2, 24
    (b"\xc2\x64", Decimal(9900)),         # digit 99 -> 100
    (b"\xc1\x0b", Decimal(10)),
    (b"\xc0\x33", Decimal("0.5")),        # 50 * 100^-1
    (b"\x3e\x64\x66", Decimal(-1)),       # negative 1: ~0xc1, 101-1=100, 0x66
    (b"\x3d\x64\x4e\x66", Decimal(-123)), # ~0xc2, digits 101-1, 101-23
]


def test_number_python_vectors():
    for raw, want in NUMBER_VECTORS:
        assert decode_oracle_number(raw) == want, raw.hex()


def test_date_python():
    # 2014-06-30 12:34:56 -> bytes(120, 114, 6, 30, 13, 35, 57)
    assert decode_oracle_date(bytes([120, 114, 6, 30, 13, 35, 57])) == dt.datetime(
        2014, 6, 30, 12, 34, 56
    )
    assert decode_oracle_date(None) is None


@pytest.mark.parametrize("v", [0.0, 1.5, -1.5, 3.14159, -2.75e10, 1e-300])
def test_double_roundtrip(v):
    assert decode_oracle_double(encode_oracle_double(v)) == v


def test_double_order_preserving():
    # Oracle's trick exists so that memcmp order == numeric order
    vals = [-2.5, -1.0, 0.0, 0.5, 3.25]
    encs = [encode_oracle_double(v) for v in vals]
    assert encs == sorted(encs)


def test_udfs_on_spark(spark):
    rows = [
        (1, b"\xc2\x02\x18", bytes([120, 114, 6, 30, 13, 35, 57]),
         encode_oracle_double(3.5)),
        (2, b"\x3e\x64\x66", None, encode_oracle_double(-0.25)),
        (3, None, None, None),
    ]
    df = spark.createDataFrame(rows, "id int, num binary, dte binary, dbl binary")
    got = {
        r["id"]: (r["n"], r["d"], r["f"])
        for r in df.select(
            "id",
            oracle_number_udf("num").alias("n"),
            oracle_date_udf("dte").alias("d"),
            oracle_double_udf("dbl").alias("f"),
        ).collect()
    }
    assert got[1] == ("123", dt.datetime(2014, 6, 30, 12, 34, 56), 3.5)
    assert got[2][0] == "-1" and got[2][2] == -0.25
    assert got[3] == (None, None, None)


def test_rowid_and_xid_exprs(spark):
    df = spark.createDataFrame(
        [(92, 4, (1 << 22) | 0x81, 7, 5, 11, 0x1234)],
        "data_obj long, afn long, dba long, slot long, usn long, slt long, sqn long",
    )
    out = df.select(
        rowid_expr(F.col("data_obj"), F.col("afn"), F.col("dba"), F.col("slot")).alias("rid"),
        xid_expr(F.col("usn"), F.col("slt"), F.col("sqn")).alias("xid"),
    ).collect()[0]
    # independent python rendering of the same fields
    b64 = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"

    def enc(v, w):
        return "".join(b64[(v >> (6 * i)) & 0x3F] for i in range(w - 1, -1, -1))

    assert out["rid"] == enc(92, 6) + enc(4, 3) + enc(((1 << 22) | 0x81) & 0x3FFFFF, 6) + enc(7, 3)
    assert len(out["rid"]) == 18
    assert out["xid"] == "0x0005.00b.00001234"


def test_interval_decoders(spark):
    import struct as _s

    from openlogreplicator_spark.functions.decoders import (
        decode_interval_ds,
        decode_interval_ym,
        interval_ds_col,
        interval_ym_col,
    )

    ym = _s.pack(">I", (1 << 31) + 3) + bytes([60 + 7])      # 3 years 7 months
    ds = _s.pack(">I", (1 << 31) + 2) + bytes([60 + 5, 60 + 30, 60 + 15]) + _s.pack(
        ">I", (1 << 31) + 500_000_000
    )  # 2d 5h30m15.5s
    assert decode_interval_ym(ym) == (3, 7)
    assert decode_interval_ds(ds) == (2, 5, 30, 15, 500_000_000)

    df = spark.createDataFrame([(ym, ds)], "ym binary, ds binary")
    row = df.select(
        interval_ym_col(F.col("ym")).cast("string").alias("ymi"),
        interval_ds_col(F.col("ds")).alias("dsi"),
    ).collect()[0]
    # YearMonthIntervalType can't round-trip to Python; assert the rendering
    assert row["ymi"] == "INTERVAL '3-7' YEAR TO MONTH"
    import datetime as dt

    assert row["dsi"] == dt.timedelta(days=2, hours=5, minutes=30, seconds=15.5)


def test_tstz_decoder():
    import struct as _s

    from openlogreplicator_spark.functions.decoders import decode_tstz

    date7 = bytes([120, 114, 6, 30, 13, 35, 57])  # 2014-06-30 12:34:56 UTC
    nanos = _s.pack(">I", 123_000_000)
    fixed = date7 + nanos + bytes([20 + 2, 60 + 30])          # +02:30
    region = date7 + nanos + bytes([0x81, 0x44])              # raw key 0x8144
    got_f = decode_tstz(fixed)
    assert got_f[1] == "+02:30" and got_f[0].microsecond == 123_000
    got_r = decode_tstz(region, {0x8144: "Custom/Zone"})
    assert got_r[1] == "Custom/Zone"
    # built-in region table (reference Locales.cpp keys): 0x85c4 = London
    assert decode_tstz(date7 + nanos + bytes([0x85, 0xc4]))[1] == "Europe/London"
    # unknown key keeps a lossless placeholder
    assert decode_tstz(date7 + nanos + bytes([0xff, 0xfe]))[1] == "tz#0xfffe"
    # negative composite offset: sign comes from (h, m) jointly, like the
    # reference (Builder.cpp:296-313) — -00:30 keeps its minus
    assert decode_tstz(date7 + nanos + bytes([20, 30]))[1] == "-00:30"
    assert decode_tstz(date7 + nanos + bytes([15, 30]))[1] == "-05:30"
    # byte11 outside [5,36] and not a known region key is NOT an offset:
    # degrade to the unknown marker, never a nonsense offset (ADVICE r02)
    assert decode_tstz(date7 + nanos + bytes([2, 10]))[1] == "tz#0x020a"
    assert decode_tstz(date7 + nanos + bytes([40, 0]))[1] == "tz#0x2800"


def test_tz_region_table_is_complete():
    """The full public key->IANA table ships (round-2 verdict task 8): every
    key the reference resolves (Locales.cpp:191-786, 595 entries) resolves
    here too."""
    from openlogreplicator_spark.functions.decoders import TZ_REGION_NAMES

    assert len(TZ_REGION_NAMES) == 595
    assert TZ_REGION_NAMES[0x80a8] == "Africa/Abidjan"
    assert TZ_REGION_NAMES[0x85c4] == "Europe/London"
    assert TZ_REGION_NAMES[0x8c10] == "Asia/Kolkata"
    assert TZ_REGION_NAMES[0xd004] == "UTC"


def test_timestamp_fraction_roundtrip_property():
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from openlogreplicator_spark.functions.decoders import (
        decode_oracle_timestamp,
        encode_oracle_timestamp,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.datetimes(
            min_value=dt.datetime(1, 1, 1),
            max_value=dt.datetime(9999, 12, 31, 23, 59, 59),
        ).map(lambda d: d.replace(microsecond=(d.minute * 7919) % 1_000_000))
    )
    def roundtrip(ts):
        assert decode_oracle_timestamp(encode_oracle_timestamp(ts)) == ts

    roundtrip()
    # 7-byte form still decodes (no fraction)
    ts = dt.datetime(2014, 6, 30, 12, 34, 56)
    assert decode_oracle_timestamp(encode_oracle_timestamp(ts)[:7]) == ts


def test_timestamp_udf_fraction(spark):
    import datetime as dt

    from openlogreplicator_spark.functions.decoders import (
        encode_oracle_timestamp,
        oracle_timestamp_udf,
    )

    ts = dt.datetime(2021, 3, 14, 15, 9, 26, 535_897)
    df = spark.createDataFrame([(encode_oracle_timestamp(ts),)], "raw binary")
    got = df.select(oracle_timestamp_udf("raw").alias("ts")).collect()[0]["ts"]
    assert got == ts


def test_charset_decode(spark):
    from openlogreplicator_spark.functions.decoders import charset_decode

    df = spark.createDataFrame(
        [("café".encode("iso-8859-1"), "über".encode("utf-16-le"))],
        "latin binary, utf16 binary",
    )
    row = df.select(
        charset_decode(F.col("latin"), "ISO-8859-1").alias("a"),
        charset_decode(F.col("utf16"), "UTF-16LE").alias("b"),
    ).collect()[0]
    assert row["a"] == "café" and row["b"] == "über"


def test_oracle_charset_names_decode(spark):
    """F2: the dictionary's NLS charset names resolve to JVM charsets."""
    from openlogreplicator_spark.functions.decoders import charset_decode

    df = spark.createDataFrame(
        [(
            "café".encode("iso-8859-1"),
            "zażółć".encode("windows-1250"),
            "東京".encode("shift_jis"),
            "Привет".encode("windows-1251"),
        )],
        "p1 binary, pl binary, ja binary, ru binary",
    )
    row = df.select(
        charset_decode(F.col("p1"), "WE8ISO8859P1").alias("p1"),
        charset_decode(F.col("pl"), "EE8MSWIN1250").alias("pl"),
        charset_decode(F.col("ja"), "JA16SJIS").alias("ja"),
        charset_decode(F.col("ru"), "CL8MSWIN1251").alias("ru"),
    ).collect()[0]
    assert row["p1"] == "café"
    assert row["pl"] == "zażółć"
    assert row["ja"] == "東京"
    assert row["ru"] == "Привет"


def test_oracle_utf8_is_cesu8(spark):
    """Oracle's 'UTF8' charset is CESU-8: supplementary characters are
    stored as 6-byte UTF-8-encoded surrogate PAIRS (only AL32UTF8 is true
    UTF-8). The pair must re-combine, and BMP text must pass through
    unchanged (ADVICE r02)."""
    from openlogreplicator_spark.functions.decoders import charset_decode

    # U+1F600 in CESU-8: surrogates D83D DE00, each UTF-8 encoded
    cesu_emoji = b"\xed\xa0\xbd\xed\xb8\x80"
    bmp = "grüße 東京".encode("utf-8")  # BMP-only: CESU-8 == UTF-8
    df = spark.createDataFrame([(cesu_emoji, bmp)], "e binary, b binary")
    row = df.select(
        charset_decode(F.col("e"), "UTF8").alias("e"),
        charset_decode(F.col("b"), "UTF8").alias("b"),
    ).collect()[0]
    assert row["e"] == "\U0001F600"
    assert row["b"] == "grüße 東京"
    # true-UTF-8 path stays on the JVM builtin and does NOT pair surrogates
    row2 = df.select(charset_decode(F.col("b"), "AL32UTF8").alias("b")).collect()[0]
    assert row2["b"] == "grüße 東京"


def test_we8dec_byte_table(spark):
    """WE8DEC (DEC MCS) has no Python/Java codec: decoded via a hand-built
    256-entry table, the reference's CharacterSet8bit pattern. Latin-1-like
    positions pass through; MCS-specific positions differ; unassigned bytes
    yield replacement characters."""
    from openlogreplicator_spark.functions.decoders import charset_decode

    df = spark.createDataFrame(
        [(b"caf\xe9", bytes([0xD7, 0xF7, 0xDD, 0xFD]), b"\xa4")],
        "a binary, b binary, c binary",
    )
    row = df.select(
        charset_decode(F.col("a"), "WE8DEC").alias("a"),
        charset_decode(F.col("b"), "WE8DEC").alias("b"),
        charset_decode(F.col("c"), "WE8DEC").alias("c"),
    ).collect()[0]
    assert row["a"] == "café"
    assert row["b"] == "ŒœŸÿ"   # MCS-specific codepoints (Latin-1: ×÷Ýý)
    assert row["c"] == "�"      # unassigned in MCS


class TestXmltype:
    """F9: partial XMLType decode at parity with the reference's
    experimental Builder::parseXml (header/prolog flags → declaration,
    body hex-dumped, malformed → NULL)."""

    def test_header_flags_render_declaration(self):
        from openlogreplicator_spark.functions.decoders import decode_xmltype

        # header op 158, flags0, flags1, flags2 = XMLDECL|STANDALONE|YES|ENC
        raw = bytes([158, 0, 0, 0x02 | 0x01 | 0x10 | 0x04])
        assert decode_xmltype(raw) == (
            '<?xml version="1.0" standalone="yes" encoding="UTF-8"?>'
        )
        # version 1.1, standalone=no
        raw = bytes([158, 0, 0, 0x02 | 0x01 | 0x08])
        assert decode_xmltype(raw) == '<?xml version="1.1" standalone="no"?>'

    def test_prolog_skips_docid_pathid_and_body_hexdumps(self):
        from openlogreplicator_spark.functions.decoders import decode_xmltype

        prolog = bytes([159, 1, 0x08 | 0x10, 2, 0xAA, 0xBB,  # docid len 2
                        1, 0xCC, 1, 0xDD])                   # two pathid blocks
        header = bytes([158, 0, 0, 0x02])
        body = b"\x01\x02"
        assert decode_xmltype(header + prolog + body) == (
            '<?xml version="1.0"?>' + "0102"
        )

    def test_malformed_returns_null(self):
        from openlogreplicator_spark.functions.decoders import decode_xmltype

        assert decode_xmltype(bytes([158, 0])) is None        # header short
        assert decode_xmltype(bytes([159, 2, 0])) is None     # bad version
        assert decode_xmltype(bytes([159, 1, 0x08, 9, 1])) is None  # docid short

    def test_spark_column(self, spark):
        from openlogreplicator_spark.functions.decoders import xmltype_decode

        df = spark.createDataFrame(
            [(bytes([158, 0, 0, 0x02]) + b"\xfe",), (bytes([159, 2]),), (None,)],
            "x binary",
        )
        rows = df.select(xmltype_decode(F.col("x")).alias("s")).collect()
        assert rows[0]["s"] == '<?xml version="1.0"?>fe'
        assert rows[1]["s"] is None
        assert rows[2]["s"] is None
