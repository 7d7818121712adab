"""Measure the generalized image seam (VERDICT r11 item 4): the same
mapInPandas contract with SPARK_GRAFT_IMAGE_DECODER=pure vs imageio for
the PNG / GIF / TIFF decode legs (L5d / L5i / L5r).

Subprocess per knob setting (CONFIG is captured at import); each leg
asserts the two settings return byte-identical full results (md5 over
every sorted row — the decoder-invariance claim at query level), then
reports best-of-3 wall clock. The registered corpora are tiny synthetic
streams, so like the JPEG probe this measures the seam's overhead
floor, not the native decoder's real-corpus speedup (that lives in the
codec-leg numbers of scripts/jpeg_seam_probe.py and scales with image
size).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

SF = "/root/testdata/sf0.1"
QUERIES = [
    "llm_multimodal_thumbnail_png",
    "llm_multimodal_gif",
    "llm_multimodal_tiff",
    "llm_multimodal_tiff_fax",
]


def run_leg(mode: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_IMAGE_DECODER=mode)
    code = (
        "import sys, time, json, hashlib; sys.path.insert(0, %r)\n"
        "from pipelinejobs_indexer_spark import registry\n"
        "from pipelinejobs_indexer_spark.session import get_spark\n"
        "spark = get_spark('image-seam')\n"
        "registry.load_all()\n"
        "res = {}\n"
        "for name in %r:\n"
        "    q = registry.QUERIES[name]\n"
        "    best = None\n"
        "    for _ in range(3):\n"
        "        spark.catalog.clearCache()\n"
        "        t0 = time.perf_counter()\n"
        "        rows = q(spark, %r).collect()\n"
        "        dt = time.perf_counter() - t0\n"
        "        best = dt if best is None else min(best, dt)\n"
        "    digest = hashlib.md5(json.dumps(sorted(tuple(r) for r in rows),\n"
        "                         default=str).encode()).hexdigest()\n"
        "    res[name] = {'sec': round(best, 3), 'md5': digest,\n"
        "                 'n': len(rows)}\n"
        "print('RESULT', json.dumps(res))\n"
        "spark.stop()\n"
    ) % (ROOT, QUERIES, SF)
    p = subprocess.run(
        [sys.executable, "-c", code], env=env,
        capture_output=True, text=True, timeout=1200,
    )
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")]
    if not line:
        raise SystemExit(f"{mode} leg failed:\n{p.stderr[-2000:]}")
    return json.loads(line[0][7:])


def main() -> None:
    legs = {mode: run_leg(mode) for mode in ("pure", "imageio")}
    out = {}
    for name in QUERIES:
        a, b = legs["pure"][name], legs["imageio"][name]
        assert (a["n"], a["md5"]) == (b["n"], b["md5"]), (
            f"{name}: decoder changed query results")
        out[name] = {
            "pure_sec": a["sec"],
            "imageio_sec": b["sec"],
            "rows": a["n"],
            "identical_rows": True,
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
