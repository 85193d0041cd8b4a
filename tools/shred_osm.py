#!/usr/bin/env python3
"""Independent XML shredder for the OSM ingest oracle.

Run by `graft.Verify` (driver-side, like tools/selfcheck.py) to give the six
raw XML-ingest queries a true two-implementation cross-check: this script
re-derives the raw relations from the bundled XML with stdlib ElementTree —
mirroring the reference's iterparse semantics (parse_clean_and_csv.py:
115-176 shape_element/get_element and 296-340 get_official_name_list) —
and writes them to parquet so the driver's DuckDB can compare them against
the Spark XML-source ingest. No Spark code is involved on this side.

Usage: python3 tools/shred_osm.py <shatin.osm> <official_psi.xml> <outDir>

Relations written (one parquet file per subdirectory):
  nodes(id, lat, lon, user, uid, version, changeset, timestamp)   all VARCHAR
  ways(id, user, uid, version, changeset, timestamp)
  way_nodes(id, node_id, position INT32)
  relations(id, user, uid, version, changeset, timestamp)
  relation_members(id, member_type, member_ref, role, position INT32)
  official_raw(eng, chi)      -- the CLEANED-but-uncorrected official list
                                 (capwords + null filter + dedup + the
                                 XOR-conflict removal), matching the
                                 engine's `officialUncorrected`

Attribute representation note: XML attributes are kept verbatim as strings
(the reference's CSV model); a MISSING attribute is NULL, an EMPTY
attribute (e.g. role="") is the empty string — both engines agree on that
encoding by construction of the XML data model.
"""
import string
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

NODE_FIELDS = ["id", "lat", "lon", "user", "uid", "version", "changeset",
               "timestamp"]
WAY_FIELDS = ["id", "user", "uid", "version", "changeset", "timestamp"]


def iter_elements(osm_path, tags=("node", "way", "relation")):
    """Stream top-level elements like the reference's get_element
    (iterparse + root.clear() so memory stays flat on a big extract)."""
    context = ET.iterparse(osm_path, events=("start", "end"))
    _, root = next(context)
    for event, elem in context:
        if event == "end" and elem.tag in tags:
            yield elem
            root.clear()


def shred_osm(osm_path):
    nodes, ways, way_nodes, relations, rel_members = [], [], [], [], []
    for elem in iter_elements(osm_path):
        a = elem.attrib
        if elem.tag == "node":
            nodes.append([a.get(f) for f in NODE_FIELDS])
        elif elem.tag == "way":
            ways.append([a.get(f) for f in WAY_FIELDS])
            pos = 0
            for child in elem:
                if child.tag == "nd":
                    way_nodes.append([a.get("id"), child.attrib.get("ref"),
                                      pos])
                    pos += 1
        elif elem.tag == "relation":
            relations.append([a.get(f) for f in WAY_FIELDS])
            pos = 0
            for child in elem:
                if child.tag == "member":
                    m = child.attrib
                    rel_members.append([a.get("id"), m.get("type"),
                                        m.get("ref"), m.get("role"), pos])
                    pos += 1
    return nodes, ways, way_nodes, relations, rel_members


def official_raw(psi_path):
    """get_official_name_list re-implemented (capwords, null filter, exact
    dedup, XOR-conflict removal) — distinct (eng, chi) pairs where both the
    English and the Chinese name are unique among the distinct pairs.
    Empty text normalizes to null (ElementTree hands back None for
    self-closed elements and '' never occurs with a real name)."""
    pairs = []
    for row in ET.parse(psi_path).getroot().findall("Row"):
        eng = row.findtext("English_Street_Name") or None
        chi = row.findtext("Chinese_Street_Name") or None
        if eng is None or chi is None:
            continue
        pairs.append((string.capwords(eng), chi))
    distinct = list(dict.fromkeys(pairs))
    eng_n, chi_n = {}, {}
    for e, c in distinct:
        eng_n[e] = eng_n.get(e, 0) + 1
        chi_n[c] = chi_n.get(c, 0) + 1
    return [[e, c] for e, c in distinct if eng_n[e] == 1 and chi_n[c] == 1]


def write(out_dir, name, rows, cols, int_cols=()):
    fields = [pa.field(c, pa.int32() if c in int_cols else pa.string())
              for c in cols]
    arrays = [pa.array([r[i] for r in rows], type=f.type)
              for i, f in enumerate(fields)]
    d = Path(out_dir) / name
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.table(arrays, schema=pa.schema(fields)),
                   d / "part-0.parquet")


def main(osm_path, psi_path, out_dir):
    nodes, ways, way_nodes, relations, rel_members = shred_osm(osm_path)
    write(out_dir, "nodes", nodes, NODE_FIELDS)
    write(out_dir, "ways", ways, WAY_FIELDS)
    write(out_dir, "way_nodes", way_nodes, ["id", "node_id", "position"],
          int_cols={"position"})
    write(out_dir, "relations", relations, WAY_FIELDS)
    write(out_dir, "relation_members", rel_members,
          ["id", "member_type", "member_ref", "role", "position"],
          int_cols={"position"})
    write(out_dir, "official_raw", official_raw(psi_path), ["eng", "chi"])
    print(f"shred_osm: wrote 6 relations to {out_dir} "
          f"({len(nodes)} nodes, {len(ways)} ways, {len(way_nodes)} "
          f"way_nodes, {len(relations)} relations, {len(rel_members)} "
          f"members)")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], sys.argv[3])
