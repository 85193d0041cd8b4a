#!/usr/bin/env python3
"""Per-family scaling-ratio table from two/three Bench artifacts.

Usage: bench_ratio.py SF01.json SF1.json [SF2.json]

Prints a markdown table of per-query times with the x10 (sf0.1->sf1) and
x2 (sf1->sf2) hop ratios, plus a per-family rollup (family = prefix up to
the second underscore-ish group, hand-tuned below), and flags any query
whose x2 hop exceeds 3.0 - the adjudication threshold from VERDICT r9 #4.
"""
import json
import sys

FAMILIES = [
    ("osm", lambda q: q.startswith("q_osm") or q in (
        "q_key_split", "q_phone_canon", "q_capwords")),
    ("dedup", lambda q: q.startswith(("q_dedup", "q_seg_dedup", "q_dup_",
        "q_boilerplate", "q_incremental", "q_corpus_diff", "q_decontaminate",
        "q_contamination", "q_containment", "q_span", "q_novelty",
        "q_jaccard", "q_minhash", "q_simhash", "q_semantic",
        "q_embed_neardup", "q_winnow"))),
    ("ann", lambda q: q.startswith(("q_knn", "q_ann", "q_quantize",
        "q_rand_proj", "q_cluster"))),
    ("text", lambda q: q.startswith(("q_token", "q_langid", "q_quality",
        "q_lexical", "q_fertility", "q_strip", "q_rag",
        "q_gopher", "q_repetition", "q_redact", "q_fingerprint", "q_keywords",
        "q_pmi", "q_chunk", "q_vocab", "q_freq", "q_lm", "q_linear",
        "q_domain", "q_bpe", "q_skipgram", "q_hash_features", "q_zscore",
        "q_ntile", "q_oov", "q_doc_gate", "q_nfc"))),
    ("retrieval", lambda q: q.startswith(("q_bm25", "q_hybrid", "q_postings",
        "q_hard_negatives", "q_heavy_hitters"))),
    ("mix/sample", lambda q: q.startswith(("q_stratified", "q_source_quota",
        "q_temperature", "q_mix", "q_materialize", "q_training",
        "q_train_split", "q_packing", "q_curation", "q_pipeline",
        "q_landing", "q_jsonl", "q_manifest", "q_profile", "q_dup_profile"))),
    ("sketch", lambda q: q.startswith(("q_hll", "q_quantile", "q_cm"))),
    ("events", lambda q: q.startswith(("q_sessionize", "q_hourly", "q_funnel",
        "q_hopping", "q_rolling", "q_session", "q_event", "q_click",
        "q_window", "q_asof", "q_pagerank"))),
    ("relational", lambda q: True),  # catch-all
]


def family(q):
    for name, pred in FAMILIES:
        if pred(q):
            return name
    return "other"


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    arts = [load(p) for p in sys.argv[1:]]
    base, mid = arts[0], arts[1]
    top = arts[2] if len(arts) > 2 else None
    common = sorted(set(base) & set(mid) & (set(top) if top else set(mid)))
    fam_tot = {}
    flagged = []
    print("| query | sf0.1 | sf1 | sf2 | x10 | x2 |")
    print("|---|---|---|---|---|---|")
    for q in common:
        b, m = base[q], mid[q]
        t = top[q] if top else None
        x10 = m / b if b > 0 else float("inf")
        x2 = (t / m) if (top and m > 0) else None
        f = fam_tot.setdefault(family(q), [0.0, 0.0, 0.0])
        f[0] += b
        f[1] += m
        f[2] += t or 0.0
        if x2 is not None and x2 > 3.0 and t > 1.0:
            flagged.append((q, x2))
        print(f"| {q} | {b:.2f} | {m:.2f} | "
              + (f"{t:.2f} | " if t is not None else "- | ")
              + f"{x10:.2f} | " + (f"{x2:.2f} |" if x2 is not None else "- |"))
    print()
    print("| family | sf0.1 | sf1 | sf2 | x10 | x2 |")
    print("|---|---|---|---|---|---|")
    for name, (b, m, t) in sorted(fam_tot.items()):
        x10 = m / b if b else 0
        x2 = t / m if m else 0
        print(f"| {name} | {b:.1f} | {m:.1f} | {t:.1f} | {x10:.2f} | {x2:.2f} |")
    print()
    if flagged:
        print("x2-hop > 3.0 (and sf2 > 1s) - needs adjudication:")
        for q, r in sorted(flagged, key=lambda x: -x[1]):
            print(f"  {q}: x2 = {r:.1f}")
    else:
        print("No query exceeds the x2-hop 3.0 threshold (at sf2 > 1s).")


if __name__ == "__main__":
    main()
