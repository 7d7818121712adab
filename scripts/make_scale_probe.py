"""Generate the sf1 scale-probe tables (documents + embeddings at 10x
the sf0.1 row counts) under .scale_probe/sf1/.

/root/testdata stops at sf0.1, but the heavy-tail operators (minhash
dedup, connected components, curation DAG, ANN) need one probe beyond
the bench scale to validate their task-sizing assumptions
(EDGES_PER_TASK, LSH bucket occupancy) against super-linear blowup.
This generator reproduces sf0.1's MEASURED marginals at 10x:

  documents  (50,000 rows): the same 31-word vocabulary with sf0.1's
      empirical word frequencies, 10-100 words/doc, ~0.16% exact
      duplicate rows, ~4% planted near-duplicates (ONE-word edits of an
      earlier doc — jaccard stays >=0.8 except for the shortest docs;
      sf0.1 carries 255 jaccard>=0.8 pairs / 5000 docs, the probe
      yields 1772 / 50,000, the same order of magnitude), lang/source
      drawn with sf0.1's proportions.
  embeddings (20,000 rows): unit-norm isotropic 64-d float32 vectors,
      label uniform over 10 — sf0.1's embeddings measure ZERO label
      cluster structure (within-label mean cosine == cross-label), so
      isotropic is the faithful reproduction.

Deterministic (seed 42); outputs are NOT committed (see .gitignore) —
rerun this script to materialize the probe.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = "/root/testdata/sf0.1"

# sf10 (a second decade, documents at 100x sf0.1) exists for the curation
# family, the one group whose sf1 ratio (2.43x at 10x data) warranted a
# trend check (VERDICT r4 item 7); embeddings stay at sf1 size — the
# curation DAGs never read them.
# emb10 (round 7): embeddings at 10x the sf1 probe's 20k vectors, for
# the iterative-trainer scale probe (`scale_probe.py train10`) — the
# trainers never read documents, so those stay at sf0.1 size there.
SCALES = {"sf1": 50_000, "sf10": 500_000, "emb10": 5_000}
VEC_SCALES = {"sf1": 20_000, "sf10": 20_000, "emb10": 200_000}
SCALE = sys.argv[1] if len(sys.argv) > 1 else "sf1"
OUT = os.path.join(os.path.dirname(HERE), ".scale_probe", SCALE)

N_DOCS = SCALES[SCALE]
N_VECS = VEC_SCALES[SCALE]
EXACT_DUP_RATE = 8 / 5000
NEAR_DUP_RATE = 0.04  # with one single-word edit -> jaccard>=0.8 pair
# density ~ sf0.1's measured 255/5000 (short docs fall below threshold)
SEED = 42


def _source_marginals():
    import duckdb

    con = duckdb.connect()
    d = f"read_parquet('{SRC}/documents.parquet')"
    words = con.execute(
        f"SELECT w, count(*) c FROM (SELECT unnest(string_split(text,' ')) w FROM {d})"
        " GROUP BY w ORDER BY w"
    ).fetchall()
    langs = con.execute(
        f"SELECT lang, count(*) c FROM {d} GROUP BY lang ORDER BY lang"
    ).fetchall()
    sources = con.execute(
        f"SELECT source, count(*) c FROM {d} GROUP BY source ORDER BY source"
    ).fetchall()
    return words, langs, sources


def make_documents(rng: np.random.Generator) -> pa.Table:
    words, langs, sources = _source_marginals()
    vocab = np.array([w for w, _ in words])
    w_p = np.array([c for _, c in words], dtype=float)
    w_p /= w_p.sum()
    lang_v = [v for v, _ in langs]
    lang_p = np.array([c for _, c in langs], dtype=float)
    lang_p /= lang_p.sum()
    src_v = [v for v, _ in sources]
    src_p = np.array([c for _, c in sources], dtype=float)
    src_p /= src_p.sum()

    texts: list[str] = []
    for i in range(N_DOCS):
        r = rng.random()
        if i > 10 and r < EXACT_DUP_RATE:
            texts.append(texts[rng.integers(0, i)])
        elif i > 10 and r < EXACT_DUP_RATE + NEAR_DUP_RATE:
            base = texts[rng.integers(0, i)].split(" ")
            pos = rng.integers(0, len(base))  # one-word edit: jaccard stays
            base[pos] = vocab[rng.choice(len(vocab), p=w_p)]  # >=0.8 for all
            texts.append(" ".join(base))  # but the shortest docs
        else:
            n = rng.integers(10, 101)
            texts.append(" ".join(vocab[rng.choice(len(vocab), p=w_p, size=n)]))
    lang = rng.choice(lang_v, p=lang_p, size=N_DOCS)
    source = rng.choice(src_v, p=src_p, size=N_DOCS)
    return pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(source, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def make_embeddings(rng: np.random.Generator) -> pa.Table:
    v = rng.standard_normal((N_VECS, 64))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=N_VECS), pa.int32()),
        }
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(SEED)
    pq.write_table(make_documents(rng), os.path.join(OUT, "documents.parquet"))
    pq.write_table(make_embeddings(rng), os.path.join(OUT, "embeddings.parquet"))
    for f in sorted(os.listdir(OUT)):
        print(f, os.path.getsize(os.path.join(OUT, f)))


if __name__ == "__main__":
    main()
