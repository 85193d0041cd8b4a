#!/usr/bin/env python3
"""Replicate an OSM extract N times with disjoint id/user spaces.

The reference's published workload is the 306 MB Hong_Kong.osm
(case_study_osm.pdf p.7); the bundled extract is the 3.9 MB shatin.osm.
This tool tiles the bundled extract into a reference-scale file so the
full pipeline can be measured at the published size with EXACTLY known
expected counts (N x the golden counts of the base extract).

Per copy k (copy 0 is byte-identical to the original body):
  - node/way/relation ids, <nd ref>, <member ref>:  +k * 10**10
    (uniform offset keeps every intra-copy reference resolvable and the
    copies' id spaces disjoint -- way_nodes joins land in-copy)
  - uid: +k * 10**9; user: suffix "_c<k>"  (contributor census scales N x)
  - tags, timestamps, changesets, lat/lon: byte-identical
    (audit/tag-family row counts scale exactly N x)

Usage: python3 tools/scale_osm.py <in.osm> <out.osm> [copies=80]

Line-oriented transform (the element-start lines of OSM XML carry all
id-bearing attributes; <tag>/<nd>/<member> children sit on their own
lines). The INPUT is held in memory once (the base extract is a few MB)
and the output streams, so memory is O(input size), independent of the
copy count. The tool asserts every input uid < UID_OFF so uid spaces
stay disjoint across copies (real OSM uids are < 10**9 today).
"""
import re
import sys

ID_OFF = 10 ** 10
UID_OFF = 10 ** 9

ELEM_ID = re.compile(r'(<(?:node|way|relation)\b[^>]*?\bid=")(\d+)(")')
ND_REF = re.compile(r'(<nd\b[^>]*?\bref=")(\d+)(")')
MEMBER_REF = re.compile(r'(<member\b[^>]*?\bref=")(\d+)(")')
UID = re.compile(r'(\buid=")(\d+)(")')
USER = re.compile(r'(\buser=")([^"]*)(")')


def shift(rx, line, off):
    return rx.sub(lambda m: m.group(1) + str(int(m.group(2)) + off) +
                  m.group(3), line)


def transform(line: str, k: int) -> str:
    if k == 0:
        return line
    out = line
    if "<node" in out or "<way" in out or "<relation" in out:
        out = shift(ELEM_ID, out, k * ID_OFF)
        out = shift(UID, out, k * UID_OFF)
        out = USER.sub(lambda m: m.group(1) + m.group(2) + f"_c{k}" +
                       m.group(3), out)
    if "<nd" in out:
        out = shift(ND_REF, out, k * ID_OFF)
    if "<member" in out:
        out = shift(MEMBER_REF, out, k * ID_OFF)
    return out


def main(src: str, dst: str, copies: int) -> None:
    lines = open(src, encoding="utf-8").read().splitlines(keepends=True)
    # header: everything up to and including <bounds .../> (or the <osm>
    # open tag if no bounds line follows it); the <osm ...> line always
    # precedes <bounds>, so find the open tag FIRST, then advance past a
    # bounds line if one is present — otherwise the bounds line would
    # land inside the replicated body and be duplicated N times.
    # footer: the closing </osm>.
    osm_open = next(i for i, l in enumerate(lines)
                    if "<osm" in l and "/>" not in l)
    # header = everything before the first ELEMENT line: the <osm> open
    # tag plus any <bounds>/<note>/<meta> lines stay un-replicated, and a
    # bounds line EMBEDDED in the body (Overpass `out geom` puts one
    # inside way/relation elements) is body like its siblings — searching
    # the whole file for '<bounds' would jump body_start into the data
    # and silently emit everything before it once, unreplicated.
    body_end = next(i for i in range(len(lines) - 1, -1, -1)
                    if "</osm>" in lines[i])
    # clamp to body_end: with no element line at all, an unclamped default
    # of len(lines) would write the whole file (incl. </osm>) as "header"
    # and then append the footer again -- invalid XML with a doubled tail
    body_start = next((i for i, l in enumerate(lines)
                       if i > osm_open and any(t in l for t in
                         ("<node", "<way", "<relation"))), body_end)
    max_uid = max((int(m.group(2)) for l in lines[body_start:body_end]
                   for m in UID.finditer(l)), default=0)
    assert max_uid < UID_OFF, (
        f"input uid {max_uid} >= UID_OFF {UID_OFF}: copies' uid spaces "
        "would collide — raise UID_OFF")
    with open(dst, "w", encoding="utf-8") as f:
        f.writelines(lines[:body_start])
        for k in range(copies):
            for line in lines[body_start:body_end]:
                f.write(transform(line, k))
        f.writelines(lines[body_end:])
    print(f"wrote {dst}: {copies} copies of {src}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 80)
