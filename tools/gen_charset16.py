#!/usr/bin/env python3
"""Transcribe the reference's custom multibyte charset tables into a TSV
resource (src/main/resources/graft/charset16_map.tsv) — the final charset
residual: vendor CJK composites with no JVM charset.

PROVENANCE: same rule as charset8_map.tsv / timezone_map.tsv — these are
the published vendor byte-pair→Unicode assignments (DEC JA16VMS, Taiwan
CCDC, Oracle's KSCCS Korean composite, the 4-byte TRIS plane), factual
content carried by the reference in CharacterSet16bit.cpp /
CharacterSetKO16KSCCS.cpp / CharacterSetZHT32TRIS.cpp.

Row format: id, name, kind(2b|4b), byte ranges, codepoints(hex).
  2b: b1min b1max b2min b2max, map size (b1span × b2span)
  4b: fixed lead byte b1, then b2/b3/b4 ranges (ZHT32TRIS layout)

Usage: python3 tools/gen_charset16.py  (re-run only if the set changes;
the TSV is committed.)
"""
import re
import pathlib

REF = pathlib.Path("/root/reference/src/locales")
OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "src/main/resources/graft/charset16_map.tsv"


def table(path, name):
    src = (REF / path).read_text()
    m = re.search(r"unicode_map_%s(?:_2b|_4b)?\[[^\]]*\]\{(.*?)\};" % name,
                  src, re.S)
    vals = [int(x, 16) for x in re.findall(r"0x([0-9A-Fa-f]+)", m.group(1))]
    return vals


ROWS = [
    # (id, name, file, table, b1min, b1max, b2min, b2max)
    (829, "JA16VMS", "CharacterSet16bit.cpp", "JA16VMS",
     0xA1, 0xF4, 0xA1, 0xFE),
    (845, "KO16KSCCS", "CharacterSetKO16KSCCS.cpp", "KO16KSCCS",
     0x84, 0xF9, 0x31, 0xFE),
    (866, "ZHT16CCDC", "CharacterSet16bit.cpp", "ZHT16CCDC",
     0xA1, 0xFB, 0x21, 0xFE),
]

with open(OUT, "w") as f:
    f.write("# Custom multibyte vendor charsets without a JVM equivalent —\n")
    f.write("# byte-pair->Unicode tables transcribed from the published\n")
    f.write("# vendor assignments (reference: src/locales/CharacterSet16bit\n")
    f.write("# .cpp, CharacterSetKO16KSCCS.cpp, CharacterSetZHT32TRIS.cpp).\n")
    f.write("# 2b rows: id name 2b b1min b1max b2min b2max codepoints\n")
    f.write("# 4b rows: id name 4b b1 b2min b2max b3min b3max b4min b4max"
            " codepoints\n")
    for cid, name, path, tab, b1min, b1max, b2min, b2max in ROWS:
        vals = table(path, tab)
        want = (b1max - b1min + 1) * (b2max - b2min + 1)
        assert len(vals) == want, (name, len(vals), want)
        f.write(f"{cid}\t{name}\t2b\t{b1min:02X}\t{b1max:02X}\t"
                f"{b2min:02X}\t{b2max:02X}\t"
                + ",".join(f"{v:04X}" for v in vals) + "\n")
    # ZHT16HKSCS31 (Hong Kong supplementary set 3.1): 2-byte but with
    # typeUnicode32 entries — code points beyond the BMP ride as full
    # hex (the decoder appendCodePoint's them as surrogate pairs)
    vals = table("CharacterSetZHT16HKSCS31.cpp", "ZHT16HKSCS31")
    want = (0xFE - 0x81 + 1) * (0xFE - 0x40 + 1)
    assert len(vals) == want, (len(vals), want)
    assert max(vals) > 0xFFFF  # the set genuinely uses plane 2
    f.write("992\tZHT16HKSCS31\t2b\t81\tFE\t40\tFE\t"
            + ",".join(f"{v:04X}" for v in vals) + "\n")
    # ZHT32TRIS: 4-byte, lead 0x8E, b2 0xA1-0xAE, b3/b4 0xA1-0xFE
    vals = table("CharacterSetZHT32TRIS.cpp", "ZHT32TRIS")
    want = 14 * 94 * 94
    assert len(vals) == want, (len(vals), want)
    f.write("863\tZHT32TRIS\t4b\t8E\tA1\tAE\tA1\tFE\tA1\tFE\t"
            + ",".join(f"{v:04X}" for v in vals) + "\n")
print(f"wrote {OUT}")
