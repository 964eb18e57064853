"""Regenerate openlogreplicator_spark/functions/charset_tables_2b.py.

Multi-byte Oracle charset decode tables — the F2 tail beyond the
single-byte sets. Same adjudication as charset_tables.py / tz_regions.py:
byte→Unicode mappings of published national/vendor standards (JIS X 0208,
KS X 1001/KSCCS, GB 2312/GBK, Big5/HKSCS, CNS 11643 ...) are public
factual data; the reference's src/locales/ arrays are one transcription,
re-derived here so the data module carries provable parity
(tests/test_charset_parity.py section 2 re-checks every plane).

Decode semantics baked at generation time so the runtime kernel stays a
pure table walk (see decoders.charset_decode wide path):

* plain 16-bit sets — rectangular (b1,b2) table, ASCII passthrough
  (reference CharacterSet16bit::decode);
* JA16SJIS — plus the single-byte half-width-katakana rule
  0xA1..0xDF → U+FF61.. (CharacterSetJA16SJIS::decode);
* ZHS16GBK — plus the single-byte euro 0x80 → U+20AC;
* JA16EUC — 2-byte plane + the 0x8F-prefixed 3-byte plane, with
  validCode (b1 0x90..0xA0 invalid) baked to U+FFFD
  (CharacterSetJA16EUC::decode/validCode);
* ZHT32EUC — 2-byte plane + the 0x8E-prefixed 4-byte plane;
* ZHT32TRIS — 0x8E-prefixed 4-byte plane only;
* ZHT16HKSCS31 — values reach the supplementary planes (6-hex entries);
* YEN/TILDE variants — pure aliases/overrides of their base tables
  (JA16SJISTILDE: 0x81,0x60 → U+FF5E; JA16EUCTILDE: 0xA1,0xC1 → U+FF5E;
  the YEN names decode identically to the base in the reference).

2-byte planes are stored as plain hex strings (reviewable); the two huge
4-byte planes (ZHT32EUC/ZHT32TRIS, ~100k entries each) are
zlib+base85-compressed hex — the parity test decompresses and verifies
every entry against the source transcription.

Usage: python scripts/gen_charset_tables_2b.py [reference_src_dir]
"""

from __future__ import annotations

import base64
import os
import re
import sys
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    REPO, "openlogreplicator_spark", "functions", "charset_tables_2b.py"
)


def consts_of(*paths) -> dict[str, int]:
    out: dict[str, int] = {}
    for p in paths:
        try:
            src = open(p).read()
        except OSError:
            continue
        out.update({
            k: int(v, 16)
            for k, v in re.findall(
                r"#define\s+(\w+)\s+0x([0-9A-Fa-f]+)", src
            )
        })
    return out


def parse_array(path: str, arr: str, hexw: int) -> list[int]:
    src = open(path).read()
    m = re.search(r"unicode_map_%s\[[^;]*?=\s*\{(.*?)\};" % arr, src, re.S)
    return [
        int(x, 16)
        for x in re.findall(r"0x[0-9A-Fa-f]{%d}" % hexw, m.group(1))
    ]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src"
    L = os.path.join(src, "locales")

    def P(f):  # noqa: E743
        return os.path.join(L, f)

    c = consts_of(
        P("CharacterSet16bit.h"), P("CharacterSetJA16SJIS.h"),
        P("CharacterSetJA16EUC.h"), P("CharacterSetKO16KSCCS.h"),
        P("CharacterSetZHS16GBK.h"), P("CharacterSetZHT16HKSCS31.h"),
        P("CharacterSetZHT32EUC.h"), P("CharacterSetZHT32TRIS.h"),
    )

    # (name, cpp file, array name, const prefix, value hex width)
    plain_2b = [
        ("JA16VMS", "CharacterSet16bit.cpp", "JA16VMS", "JA16VMS", 4),
        ("KO16KSC5601", "CharacterSet16bit.cpp", "KO16KSC5601_2b",
         "KO16KSC5601", 4),
        ("KO16MSWIN949", "CharacterSet16bit.cpp", "KO16MSWIN949_2b",
         "KO16MSWIN949", 4),
        ("ZHS16CGB231280", "CharacterSet16bit.cpp", "ZHS16CGB231280_2b",
         "ZHS16CGB231280", 4),
        ("ZHT16BIG5", "CharacterSet16bit.cpp", "ZHT16BIG5_2b",
         "ZHT16BIG5", 4),
        ("ZHT16CCDC", "CharacterSet16bit.cpp", "ZHT16CCDC_2b",
         "ZHT16CCDC", 4),
        ("ZHT16MSWIN950", "CharacterSet16bit.cpp", "ZHT16MSWIN950_2b",
         "ZHT16MSWIN950", 4),
        ("ZHT16HKSCS", "CharacterSet16bit.cpp", "ZHT16HKSCS_2b",
         "ZHT16HKSCS", 4),
        ("KO16KSCCS", "CharacterSetKO16KSCCS.cpp", "KO16KSCCS_2b",
         "KO16KSCCS", 4),
        ("JA16SJIS", "CharacterSetJA16SJIS.cpp", "JA16SJIS_2b",
         "JA16SJIS", 4),
        ("ZHS16GBK", "CharacterSetZHS16GBK.cpp", "ZHS16GBK_2b",
         "ZHS16GBK", 4),
        ("ZHT16HKSCS31", "CharacterSetZHT16HKSCS31.cpp", "ZHT16HKSCS31_2b",
         "ZHT16HKSCS31", 8),
    ]

    spec: dict[str, dict] = {}
    hex2b: dict[str, str] = {}
    for name, f, arr, pre, hexw in plain_2b:
        b1min, b1max = c[f"{pre}_b1_min"], c[f"{pre}_b1_max"]
        b2min, b2max = c[f"{pre}_b2_min"], c[f"{pre}_b2_max"]
        vals = parse_array(P(f), arr, hexw)
        exp = (b1max - b1min + 1) * (b2max - b2min + 1)
        assert len(vals) == exp, (name, len(vals), exp)
        width = 6 if max(vals) > 0xFFFF else 4
        spec[name] = {"2b": (b1min, b1max, b2min, b2max), "w": width}
        hex2b[name] = "".join(f"{v:0{width}x}" for v in vals)

    # single-byte side rules baked from the decode() overrides
    spec["JA16SJIS"]["sb"] = [(0xA1, 0xDF, 0xFF61)]
    spec["ZHS16GBK"]["sb"] = [(0x80, 0x80, 0x20AC)]

    # JA16EUC: 2b (validCode: b1 0x90..0xA0 → invalid) + 0x8F-prefixed 3b
    b1min, b1max = c["JA16EUC_b1_min"], c["JA16EUC_b1_max"]
    b2min, b2max = c["JA16EUC_b2_min"], c["JA16EUC_b2_max"]
    b3min, b3max = c["JA16EUC_b3_min"], c["JA16EUC_b3_max"]
    vals = parse_array(P("CharacterSetJA16EUC.cpp"), "JA16EUC_2b", 4)
    w2 = b2max - b2min + 1
    for b1 in range(0x90, 0xA1):  # validCode baked
        if b1min <= b1 <= b1max:
            for j in range(w2):
                vals[(b1 - b1min) * w2 + j] = 0xFFFD
    spec["JA16EUC"] = {"2b": (b1min, b1max, b2min, b2max), "w": 4,
                       "3b": (0x8F, b2min, b2max, b3min, b3max)}
    hex2b["JA16EUC"] = "".join(f"{v:04x}" for v in vals)
    vals3 = parse_array(P("CharacterSetJA16EUC.cpp"), "JA16EUC_3b", 4)
    assert len(vals3) == (b2max - b2min + 1) * (b3max - b3min + 1)
    hex3b = {"JA16EUC": "".join(f"{v:04x}" for v in vals3)}

    # 4-byte planes (compressed)
    hex4b: dict[str, str] = {}
    b1min, b1max = c["ZHT32EUC_2_b1_min"], c["ZHT32EUC_2_b1_max"]
    b2min, b2max = c["ZHT32EUC_2_b2_min"], c["ZHT32EUC_2_b2_max"]
    vals = parse_array(P("CharacterSetZHT32EUC.cpp"), "ZHT32EUC_2b", 4)
    assert len(vals) == (b1max - b1min + 1) * (b2max - b2min + 1)
    spec["ZHT32EUC"] = {
        "2b": (b1min, b1max, b2min, b2max), "w": 4,
        "4b": (c["ZHT32EUC_4_b1"], c["ZHT32EUC_4_b2_min"],
               c["ZHT32EUC_4_b2_max"], c["ZHT32EUC_4_b3_min"],
               c["ZHT32EUC_4_b3_max"], c["ZHT32EUC_4_b4_min"],
               c["ZHT32EUC_4_b4_max"]),
    }
    hex2b["ZHT32EUC"] = "".join(f"{v:04x}" for v in vals)
    v4 = parse_array(P("CharacterSetZHT32EUC.cpp"), "ZHT32EUC_4b", 4)
    n4 = ((c["ZHT32EUC_4_b2_max"] - c["ZHT32EUC_4_b2_min"] + 1)
          * (c["ZHT32EUC_4_b3_max"] - c["ZHT32EUC_4_b3_min"] + 1)
          * (c["ZHT32EUC_4_b4_max"] - c["ZHT32EUC_4_b4_min"] + 1))
    assert len(v4) == n4, (len(v4), n4)
    hex4b["ZHT32EUC"] = base64.b85encode(
        zlib.compress("".join(f"{v:04x}" for v in v4).encode(), 9)
    ).decode()

    spec["ZHT32TRIS"] = {
        "w": 4,
        "4b": (c["ZHT32TRIS_b1"], c["ZHT32TRIS_b2_min"],
               c["ZHT32TRIS_b2_max"], c["ZHT32TRIS_b3_min"],
               c["ZHT32TRIS_b3_max"], c["ZHT32TRIS_b4_min"],
               c["ZHT32TRIS_b4_max"]),
    }
    v4 = parse_array(P("CharacterSetZHT32TRIS.cpp"), "ZHT32TRIS_4b", 4)
    n4 = ((c["ZHT32TRIS_b2_max"] - c["ZHT32TRIS_b2_min"] + 1)
          * (c["ZHT32TRIS_b3_max"] - c["ZHT32TRIS_b3_min"] + 1)
          * (c["ZHT32TRIS_b4_max"] - c["ZHT32TRIS_b4_min"] + 1))
    assert len(v4) == n4, (len(v4), n4)
    hex4b["ZHT32TRIS"] = base64.b85encode(
        zlib.compress("".join(f"{v:04x}" for v in v4).encode(), 9)
    ).decode()

    aliases = {
        "JA16SJISYEN": ("JA16SJIS", []),
        "JA16EUCYEN": ("JA16EUC", []),
        "JA16SJISTILDE": ("JA16SJIS", [(0x81, 0x60, 0xFF5E)]),
        "JA16EUCTILDE": ("JA16EUC", [(0xA1, 0xC1, 0xFF5E)]),
    }

    with open(OUT, "w") as f:
        f.write('"""Oracle multi-byte charset decode tables '
                "(generated — do not edit).\n\n"
                "Public standards data (JIS X 0208, KS X 1001, GB 2312/GBK, "
                "Big5/HKSCS,\nCNS 11643 ...); provenance + regeneration: "
                "scripts/gen_charset_tables_2b.py;\nparity gate: "
                "tests/test_charset_parity.py. 2-byte planes are plain hex\n"
                "(entry width per WIDE_SPEC['w']); the two ~100k-entry "
                "4-byte planes are\nzlib+base85 (the parity test verifies "
                "every decompressed entry).\n"
                '"""\n\n'
                "import base64 as _b64\nimport zlib as _zlib\n\n")
        f.write(f"WIDE_SPEC: dict[str, dict] = {spec!r}\n\n")
        f.write(f"WIDE_ALIASES: dict[str, tuple] = {aliases!r}\n\n")
        f.write("_HEX_2B: dict[str, str] = {\n")
        for k in sorted(hex2b):
            f.write(f"    {k!r}:\n    {hex2b[k]!r},\n")
        f.write("}\n\n_HEX_3B: dict[str, str] = {\n")
        for k in sorted(hex3b):
            f.write(f"    {k!r}:\n    {hex3b[k]!r},\n")
        f.write("}\n\n_Z85_4B: dict[str, str] = {\n")
        for k in sorted(hex4b):
            f.write(f"    {k!r}:\n    {hex4b[k]!r},\n")
        f.write("}\n\n\n")
        f.write(
            "def _expand(h: str, width: int) -> tuple:\n"
            "    return tuple(\n"
            "        chr(int(h[i:i + width], 16))\n"
            "        for i in range(0, len(h), width)\n"
            "    )\n\n\n"
            "def wide_tables() -> dict[str, dict]:\n"
            '    """name -> spec/2b/3b/4b dict with expanded char tuples;\n'
            '    aliases resolved with overrides applied."""\n'
            "    out: dict[str, dict] = {}\n"
            "    for name, sp in WIDE_SPEC.items():\n"
            "        w = sp[\"w\"]\n"
            "        ent: dict = {\"spec\": sp}\n"
            "        if name in _HEX_2B:\n"
            "            ent[\"2b\"] = _expand(_HEX_2B[name], w)\n"
            "        if name in _HEX_3B:\n"
            "            ent[\"3b\"] = _expand(_HEX_3B[name], w)\n"
            "        if name in _Z85_4B:\n"
            "            ent[\"4b\"] = _expand(\n"
            "                _zlib.decompress(\n"
            "                    _b64.b85decode(_Z85_4B[name])\n"
            "                ).decode(), w,\n"
            "            )\n"
            "        out[name] = ent\n"
            "    for alias, (base, overrides) in WIDE_ALIASES.items():\n"
            "        ent = dict(out[base])\n"
            "        if overrides:\n"
            "            sp = ent[\"spec\"]\n"
            "            b1min, b1max, b2min, b2max = sp[\"2b\"]\n"
            "            t = list(ent[\"2b\"])\n"
            "            for b1, b2, cp in overrides:\n"
            "                t[(b1 - b1min) * (b2max - b2min + 1)\n"
            "                  + (b2 - b2min)] = chr(cp)\n"
            "            ent[\"2b\"] = tuple(t)\n"
            "        out[alias] = ent\n"
            "    return out\n"
        )
    import os as _os

    print(f"wrote {OUT}: {_os.path.getsize(OUT)} bytes, "
          f"{len(spec)} base sets + {len(aliases)} aliases")


if __name__ == "__main__":
    main()
