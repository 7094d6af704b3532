#!/usr/bin/env python3
"""Transcribe the reference's 8-bit vendor code-page tables into a TSV
resource (src/main/resources/graft/charset8_map.tsv).

PROVENANCE: the tables in CharacterSet8bit.cpp are the published vendor
code pages (DOS Arabic pages, DEC multinational variants, HP Roman-8,
NeXTSTEP, etc.) — factual byte→Unicode assignments, the same category as
timezone_map.tsv. This script extracts only the ids whose encoding the
JVM does NOT ship (those are handled natively in OracleCharsets.idTable);
each emitted row records the Oracle charset id, name, whether the low
ASCII half is custom (256-entry map) and the hex code points.

Usage: python3 tools/gen_charset8.py  (re-run only when the residual
set changes; the TSV is committed.)
"""
import re
import pathlib

REF = pathlib.Path("/root/reference/src/locales")
OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "src/main/resources/graft/charset8_map.tsv"

# ids already decoded natively via JVM charsets or NRC override tables
# (keep in sync with OracleCharsets.idTable / nrcOverrides)
COVERED = {
    1, 4, 10, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 41, 45, 46, 47,
    51, 150, 152, 155, 156, 159, 160, 161, 162, 163, 164, 165, 166,
    167, 170, 171, 174, 175, 177, 178, 179, 190, 196, 197, 352, 354, 382,
    390, 560, 830, 832, 840, 846, 850, 852, 854, 860, 865, 867, 868,
    871, 873, 2000,
    11, 13, 14, 15, 16, 17, 21, 202, 203, 204, 205, 206, 207,
    # NOT in this set (so their tables ARE emitted) although idTable maps
    # them: 40 NE8ISO8859P10, 48 CEL8ISO8859P14, 385 EL8PC869 — the
    # headless JDK in this container lacks ISO-8859-10/-14 and x-IBM869,
    # so the reference tables back them up (decode prefers the table)
}

src = (REF / "CharacterSet8bit.cpp").read_text()
tables = {}
for m in re.finditer(
        r"unicode_map_(\w+)\[(?:128|256)\]\{(.*?)\};", src, re.S):
    name, body = m.group(1), m.group(2)
    vals = [int(x, 16) for x in re.findall(r"0x([0-9A-Fa-f]+)", body)]
    assert len(vals) in (128, 256), (name, len(vals))
    tables[name] = vals

loc = (REF / "Locales.cpp").read_text()
rows = []
for m in re.finditer(
        r'characterMap\[(\d+)\] = new CharacterSet8bit\("([\w]+)",\s*'
        r"CharacterSet8bit::unicode_map_(\w+)(,\s*true)?\)", loc):
    cid, name, tab, custom = int(m.group(1)), m.group(2), m.group(3), \
        bool(m.group(4))
    if cid in COVERED:
        continue
    vals = tables[tab]
    rows.append((cid, name, 1 if custom else 0,
                 ",".join(f"{v:04X}" for v in vals)))

rows.sort()
with open(OUT, "w") as f:
    f.write("# Oracle 8-bit vendor code pages without a JVM charset —\n")
    f.write("# byte->Unicode tables transcribed from the published vendor\n")
    f.write("# assignments (reference: src/locales/CharacterSet8bit.cpp,\n")
    f.write("# id registry Locales.cpp:648-800). custom=1: 256-entry map\n")
    f.write("# replacing the ASCII half too; custom=0: 128-entry upper\n")
    f.write("# half, bytes 0x00-0x7F are ASCII identity.\n")
    f.write("# id\tname\tcustom\tcodepoints(hex)\n")
    for cid, name, custom, cps in rows:
        f.write(f"{cid}\t{name}\t{custom}\t{cps}\n")
print(f"wrote {len(rows)} tables to {OUT}")
