"""Regenerate openlogreplicator_spark/functions/charset_tables.py.

The Oracle-only single-byte charsets have no Python/Java codec; their
byte→Unicode mappings are PUBLIC FACTUAL DATA (each is a published vendor/
national standard: HP Roman-8, ISCII-88, TCVN3, ASMO-708, DOS codepage
variants, DEC NRC sets, ...), of which the reference's
src/locales/CharacterSet{7,8}bit.cpp arrays are one transcription — the
same adjudication as functions/tz_regions.py (round-3 verdict: data, not
code). This script re-derives the tables from that transcription so the
data module carries provable parity (tests/test_charset_parity.py re-checks
it against the same source), emitting each 256-entry table as a compact
1024-hex-char string.

Sets whose mapping is BYTE-EXACTLY a stock Python codec are excluded — they
stay on the codec fast path in ORACLE_CHARSET_MAP (the audit lives in the
parity test). 7-bit sets decode as ``map[byte & 0x7F]`` (reference
CharacterSet7bit::decode), so their 128-entry maps expand by high-bit
mirroring.

Usage: python scripts/gen_charset_tables.py [reference_src_dir]
"""

from __future__ import annotations

import codecs
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    REPO, "openlogreplicator_spark", "functions", "charset_tables.py"
)


def parse_maps(cpp: str) -> dict[str, list[int]]:
    """array-name → raw unicode values (length 128 or 256)."""
    out = {}
    for m in re.finditer(
        r"unicode_map_(\w+)\[(\d+)\]\s*=\s*\{(.*?)\};", cpp, re.S
    ):
        vals = [int(x, 16) for x in re.findall(r"0x[0-9A-Fa-f]{4}", m.group(3))]
        assert len(vals) == int(m.group(2)), m.group(1)
        out[m.group(1)] = vals
    return out


def instantiations(locales: str) -> list[tuple[str, str, int]]:
    """(charset_name, array_name, bits) from Locales.cpp."""
    out = []
    for bits in (7, 8):
        for m in re.finditer(
            r'new CharacterSet%dbit\("([\w]+)",\s*CharacterSet%dbit::unicode_map_(\w+)'
            % (bits, bits),
            locales,
        ):
            out.append((m.group(1), m.group(2), bits))
    return out


def full_table(vals: list[int], bits: int) -> list[int]:
    if bits == 7:  # decode is map[byte & 0x7F]
        assert len(vals) == 128
        return vals + vals
    if len(vals) == 128:  # 8-bit with ASCII low half elided
        return list(range(128)) + vals
    return vals


def stock_codec_exact(table: list[int]) -> str | None:
    """Name of a stock Python codec matching the table byte-for-byte."""
    for codec in (
        "koi8-u", "koi8-r", "cp852", "cp857", "cp858", "cp737", "cp775",
        "cp855", "cp861", "cp863", "cp865", "cp869", "cp860", "hp_roman8",
        "mac_cyrillic", "mac_greek", "mac_iceland", "mac_turkish",
        "mac_latin2", "mac_roman", "cp437", "cp850", "cp866", "tis-620",
        "cp037", "cp500", "cp1140", "latin-1",
        "iso-8859-2", "iso-8859-3", "iso-8859-4", "iso-8859-5",
        "iso-8859-6", "iso-8859-7", "iso-8859-8", "iso-8859-9",
        "iso-8859-10", "iso-8859-13", "iso-8859-14", "iso-8859-15",
        "cp1250", "cp1251", "cp1252", "cp1253", "cp1254", "cp1255",
        "cp1256", "cp1257", "cp1258", "us-ascii",
    ):
        try:
            codecs.lookup(codec)
        except LookupError:
            continue
        ok = True
        for b in range(256):
            try:
                s = bytes([b]).decode(codec)
                got = ord(s) if len(s) == 1 else -1
            except UnicodeDecodeError:
                got = 0xFFFD
            if got != table[b]:
                ok = False
                break
        if ok:
            return codec
    return None


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src"
    maps7 = parse_maps(
        open(os.path.join(src, "locales", "CharacterSet7bit.cpp")).read()
    )
    maps8 = parse_maps(
        open(os.path.join(src, "locales", "CharacterSet8bit.cpp")).read()
    )
    locales = open(os.path.join(src, "locales", "Locales.cpp")).read()
    tables: dict[str, str] = {}
    codec_exact: dict[str, str] = {}
    for name, arr, bits in instantiations(locales):
        vals = (maps7 if bits == 7 else maps8).get(arr)
        if vals is None:
            continue
        table = full_table(vals, bits)
        codec = stock_codec_exact(table)
        if codec is not None:
            codec_exact[name] = codec
            continue
        tables[name] = "".join(f"{v:04x}" for v in table)
    with open(OUT, "w") as f:
        f.write('"""Oracle-only single-byte charset decode tables '
                "(generated — do not edit).\n\n"
                "Each value is a 1024-hex-char string: 256 byte positions "
                "x 4 hex digits of\nthe Unicode code point (fffd = "
                "unassigned). The mappings are public factual\ndata "
                "(published vendor/national charset standards; see "
                "scripts/gen_charset_tables.py\nfor provenance and "
                "regeneration, tests/test_charset_parity.py for the "
                "parity gate\nagainst the reference transcription, "
                "src/locales/CharacterSet7bit.cpp +\n"
                "CharacterSet8bit.cpp + Locales.cpp:53-153). Sets that "
                "match a stock Python\ncodec byte-for-byte are NOT here — "
                "they ride ORACLE_CHARSET_MAP's codec fast\npath "
                "(STOCK_EXACT records the audited pairs).\n"
                '"""\n\n'
                "# charset → stock codec proven byte-exact vs the "
                "reference tables\n")
        f.write("STOCK_EXACT: dict[str, str] = {\n")
        for k in sorted(codec_exact):
            f.write(f"    {k!r}: {codec_exact[k]!r},\n")
        f.write("}\n\n")
        f.write("_HEX_TABLES: dict[str, str] = {\n")
        for k in sorted(tables):
            f.write(f"    {k!r}:\n    {tables[k]!r},\n")
        f.write("}\n\n\n")
        f.write(
            "def byte_tables() -> dict[str, tuple]:\n"
            '    """name → 256-tuple of single-char strings '
            '(U+FFFD for unassigned)."""\n'
            "    return {\n"
            "        name: tuple(chr(int(h[i:i + 4], 16)) "
            "for i in range(0, 1024, 4))\n"
            "        for name, h in _HEX_TABLES.items()\n"
            "    }\n"
        )
    print(f"wrote {OUT}: {len(tables)} tables, "
          f"{len(codec_exact)} stock-codec-exact")


if __name__ == "__main__":
    main()
