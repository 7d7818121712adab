"""Measure the native-JPEG seam (VERDICT r10 item 7): the same
mapInPandas contract with SPARK_GRAFT_JPEG_DECODER=pure vs imageio.

Two measurements, because the codec tax depends on image size:

1. QUERY leg — llm_multimodal_jpeg at sf0.1 under both knob settings
   (subprocess per setting: CONFIG is captured at import). The
   registered corpus is tiny DC-only 16x16 streams, so this measures
   the seam's OVERHEAD floor (pipe round-trips vs pure decode of a
   trivial stream), plus asserts the two settings return identical
   rows (the bit-exactness claim at query level).

2. CODEC leg — single-process decode throughput on realistic
   AC-bearing streams (synth_ac_jpeg at 256x256), pure vs sidecar,
   amortized over a batch. This is where the r10 seam note's 18-175x
   pure-Python tax lives; the sidecar's speedup here is the number a
   real-corpus deployment buys.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

SF = "/root/testdata/sf0.1"


def query_leg() -> dict:
    out = {}
    rows = {}
    for mode in ("pure", "imageio"):
        env = dict(os.environ, SPARK_GRAFT_JPEG_DECODER=mode)
        code = (
            "import sys, time, json; sys.path.insert(0, %r)\n"
            "from pipelinejobs_indexer_spark import registry\n"
            "from pipelinejobs_indexer_spark.session import get_spark\n"
            "spark = get_spark('jpeg-seam')\n"
            "registry.load_all()\n"
            "q = registry.QUERIES['llm_multimodal_jpeg']\n"
            "best = None\n"
            "for _ in range(3):\n"
            "    spark.catalog.clearCache()\n"
            "    t0 = time.perf_counter()\n"
            "    rows = q(spark, %r).collect()\n"
            "    dt = time.perf_counter() - t0\n"
            "    best = dt if best is None else min(best, dt)\n"
            "import hashlib\n"
            "digest = hashlib.md5(json.dumps(sorted(tuple(r) for r in rows),\n"
            "                     default=str).encode()).hexdigest()\n"
            "print('RESULT', json.dumps({'sec': round(best, 3),\n"
            "      'md5': digest, 'n': len(rows)}))\n"
            "spark.stop()\n"
        ) % (ROOT, SF)
        p = subprocess.run(
            [sys.executable, "-c", code], env=env,
            capture_output=True, text=True, timeout=600,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")]
        if not line:
            raise SystemExit(f"{mode} leg failed:\n{p.stderr[-2000:]}")
        r = json.loads(line[0][7:])
        out[mode] = r["sec"]
        # full-result digest (ADVICE r11): an md5 over EVERY sorted row,
        # not a 5-row prefix — a divergence anywhere fails the assert
        rows[mode] = (r["n"], r["md5"])
    assert rows["pure"] == rows["imageio"], "decoder changed query results"
    out["identical_rows"] = True
    return out


def codec_leg() -> dict:
    import random

    from pipelinejobs_indexer_spark.llm.jpeg import decode_jpeg, synth_ac_jpeg
    from pipelinejobs_indexer_spark.llm.native_jpeg import (
        decode_jpeg_native,
        shutdown,
    )

    rnd = random.Random(7)
    streams = []
    n_blocks = (256 // 8) * (256 // 8)
    for _ in range(20):
        blocks = [
            (rnd.randint(-80, 80), rnd.randint(1, 7),
             rnd.choice((-1, 1)) * rnd.randint(1, 30))
            for _ in range(n_blocks)
        ]
        streams.append(synth_ac_jpeg(blocks, 256, 256))
    decode_jpeg_native(streams[0])  # warm the sidecar + JIT
    t0 = time.perf_counter()
    for s in streams:
        decode_jpeg(s)
    pure = time.perf_counter() - t0
    t0 = time.perf_counter()
    for s in streams:
        decode_jpeg_native(s)
    native = time.perf_counter() - t0
    shutdown()
    return {
        "streams": len(streams),
        "size_px": "256x256 AC-bearing",
        "pure_sec": round(pure, 3),
        "native_sec": round(native, 3),
        "speedup": round(pure / native, 1),
    }


if __name__ == "__main__":
    result = {"codec_leg": codec_leg(), "query_leg": query_leg()}
    print(json.dumps(result, indent=2))
