#!/usr/bin/env python3
"""Self-test for scale_osm.py's degenerate and normal inputs.

The header-only case (a file with <osm>/<bounds> but ZERO element
lines) regressed once: an unclamped body_start defaulted past the
</osm> footer and the tiler wrote the whole file as "header" plus a
SECOND footer -- invalid XML with a doubled tail. body_start is now
clamped to body_end; this test pins that, plus the normal-path
invariants (N x element counts, well-formed XML, disjoint id spaces).

Usage: python3 tools/test_scale_osm.py   (exits nonzero on failure)
"""
import os
import sys
import tempfile
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scale_osm


def run(src_text, copies):
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.osm")
        dst = os.path.join(d, "out.osm")
        with open(src, "w", encoding="utf-8") as f:
            f.write(src_text)
        scale_osm.main(src, dst, copies)
        return open(dst, encoding="utf-8").read()


def main():
    header_only = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<osm version="0.6" generator="test">\n'
        '  <bounds minlat="22.0" minlon="114.0" '
        'maxlat="22.5" maxlon="114.5"/>\n'
        '</osm>\n')
    out = run(header_only, 80)
    # well-formed XML, exactly one footer, no replicated body
    ET.fromstring(out)
    assert out.count("</osm>") == 1, "doubled footer on header-only input"
    assert out == header_only, "header-only input must pass through intact"

    normal = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<osm version="0.6" generator="test">\n'
        '  <bounds minlat="22.0" minlon="114.0" '
        'maxlat="22.5" maxlon="114.5"/>\n'
        '  <node id="7" lat="22.1" lon="114.1" uid="42" user="amy" '
        'version="1" changeset="9" timestamp="2017-01-01T00:00:00Z">\n'
        '    <tag k="name" v="x"/>\n'
        '  </node>\n'
        '  <way id="9" uid="42" user="amy" version="1" changeset="9" '
        'timestamp="2017-01-01T00:00:00Z">\n'
        '    <nd ref="7"/>\n'
        '    <tag k="highway" v="primary"/>\n'
        '  </way>\n'
        '</osm>\n')
    out = run(normal, 3)
    root = ET.fromstring(out)
    nodes = root.findall("node")
    ways = root.findall("way")
    assert len(nodes) == 3 and len(ways) == 3, "element counts must be Nx"
    ids = sorted(int(n.get("id")) for n in nodes)
    assert ids == [7, 7 + 10**10, 7 + 2 * 10**10], ids
    # every intra-copy <nd ref> resolves to its own copy's node
    for w in ways:
        refs = [int(nd.get("ref")) for nd in w.findall("nd")]
        assert refs == [int(w.get("id")) - 2], (w.get("id"), refs)
    assert out.count("</osm>") == 1
    print("scale_osm selftest: all ok")


if __name__ == "__main__":
    main()
