"""MinHash band S-curve probe (round 7 — the last analytic knob claim).

config.py sizes ``minhash_hashes`` / ``minhash_bands`` by the textbook
S-curve P(candidate | jaccard s) = 1-(1-s^r)^b with r = hashes/bands.
This probe measures that curve on the 50k-doc sf1 probe corpus:

  * ground truth = `llm_dedup_ngram_jaccard` (exact prefix-filtered
    AllPairs at JACCARD_THRESHOLD — every true pair with its exact
    jaccard value);
  * measured    = `llm_dedup_minhash` (banded LSH candidates,
    exact-verified, so its output is a SUBSET of the truth and the
    per-pair miss probability is pure banding).

Recall is reported per jaccard bucket against the closed form at the
bucket midpoint (default knobs: 16 hashes / 4 bands -> r=4, b=4). The
planted near-dups are one-word edits (jaccard >= ~0.8), so the buckets
above threshold are well populated at 50k docs (~1772 true pairs).
Results: BENCH_sf1.md round-7 addendum.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

SF1 = os.path.join(ROOT, ".scale_probe", "sf1")

BUCKETS = [(0.80, 0.85), (0.85, 0.90), (0.90, 0.95), (0.95, 1.0001)]


def closed_form(s: float, hashes: int, bands: int) -> float:
    r = hashes // bands
    return 1.0 - (1.0 - s**r) ** bands


def main() -> None:
    from pipelinejobs_indexer_spark import registry
    from pipelinejobs_indexer_spark.config import CONFIG
    from pipelinejobs_indexer_spark.session import get_spark

    spark = get_spark("minhash-scurve")
    registry.load_all()

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry.QUERIES["llm_dedup_ngram_jaccard"](spark, SF1).collect()
    }
    found = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["llm_dedup_minhash"](spark, SF1).collect()
    }
    extra = found - set(exact)
    assert not extra, f"minhash emitted pairs absent from truth: {sorted(extra)[:5]}"

    results = {"true_pairs": len(exact), "found_pairs": len(found)}
    table = []
    for lo, hi in BUCKETS:
        bucket = [p for p, j in exact.items() if lo <= j < hi]
        got = sum(1 for p in bucket if p in found)
        mid = (lo + min(hi, 1.0)) / 2
        table.append(
            {
                "bucket": f"[{lo:.2f},{min(hi, 1.0):.2f})",
                "n": len(bucket),
                "recall": round(got / len(bucket), 4) if bucket else None,
                "predicted": round(
                    closed_form(mid, CONFIG.minhash_hashes, CONFIG.minhash_bands), 4
                ),
            }
        )
    results["buckets"] = table
    results["overall_recall"] = round(len(found) / len(exact), 4)
    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
