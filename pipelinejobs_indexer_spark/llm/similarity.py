"""L3: similarity search over the embeddings table (BASELINE.json:6
mandate; pattern ref PAPERS.md:9 — top-k similarity search, EDBT 2020).

Two plans for the same question ("k nearest neighbors by cosine"):

  * llm_similarity_topk — brute force: broadcast the (small) query set,
    score every (query, vector) pair, window top-k. Exact; linear in the
    corpus, so it IS the right plan even at 100 TB when the query set is
    small: one broadcast + one narrow scan + a top-k per query
    (partial top-k map-side via TakeOrderedAndProject semantics).

  * llm_similarity_ann — hyperplane-LSH bucketed: N_PLANES deterministic
    pseudo-random hyperplanes (weights derived from md5, identical in
    Spark/DuckDB/Python) sign-quantize every vector to an 8-bit bucket;
    candidates = same-bucket vectors only, then exact cosine + top-k
    within the bucket. The pair join becomes an equi-join on the bucket
    key — at 100 TB this is a shuffle on a low-cardinality key, so use
    multi-probe (flip low-margin bits) or more planes (2^p buckets) to
    keep buckets balanced; planes/bands are config, not constants.

Cross-engine determinism: hyperplane weight w[p][d] =
strpos(hexdigits, first-hex-char(md5(f"{p}:{d}"))) - 8.5, so the oracle
reproduces the bucket assignment exactly. Products (half-integer weight x
float32-valued coordinate) are exact in double; both engines fold
sequentially, so signs agree bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, spread

TOP_K = 10
N_QUERIES = 5  # query set: vec_id < 5
N_PLANES = 4  # 2^4 buckets ~ 31 vectors/bucket at the 500-row test scale;
# raise at real scale (planes are the recall/cost knob, not a constant)

_HEX = "0123456789abcdef"


def _plane_weight(p: int, d: int) -> float:
    """Deterministic hyperplane weight in [-7.5, 7.5], mean 0."""
    ch = hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0]
    return _HEX.index(ch) + 1 - 8.5


def _cos(va: str, vb: str):
    dot = F.expr(
        f"aggregate(zip_with({va}, {vb}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    na = F.sqrt(F.expr(f"aggregate({va}, 0D, (acc, x) -> acc + x * x)"))
    nb = F.sqrt(F.expr(f"aggregate({vb}, 0D, (acc, x) -> acc + x * x)"))
    return dot / (na * nb)


_COS_SQL = """
  list_sum([q.v[i] * e.v[i] for i in generate_series(1, len(q.v))]) /
  (sqrt(list_sum([x * x for x in q.v])) * sqrt(list_sum([x * x for x in e.v])))
"""


@register(
    "llm_similarity_topk",
    sql=f"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
         scored AS (
           SELECT q.qid, e.vec_id, e.label,
                  round(
                    list_sum([q.qv[i] * e.v[i] for i in generate_series(1, len(q.qv))]) /
                    (sqrt(list_sum([x * x for x in q.qv])) *
                     sqrt(list_sum([x * x for x in e.v]))), 6) AS cosine
           FROM q CROSS JOIN e
           WHERE e.vec_id <> q.qid
         )
         SELECT qid, vec_id, label, cosine, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY qid
                                        ORDER BY cosine DESC, vec_id) AS rank
           FROM scored
         ) WHERE rank <= {TOP_K}""",
)
def llm_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for a broadcast query set.

    Rank on the *rounded* cosine with vec_id tiebreak so the ordering is
    engine-independent.
    """
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "label",
            F.round(_cos("qv", "v"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "label", "cosine", "rank")
    )


def _bucket_expr_spark(vcol: str):
    """8-char '0'/'1' bucket string from hyperplane projection signs."""
    bits = []
    for p in range(N_PLANES):
        w = ", ".join("%.1fD" % _plane_weight(p, d) for d in range(64))
        proj = (
            f"aggregate(zip_with({vcol}, array({w}), (x, y) -> x * y),"
            " 0D, (acc, x) -> acc + x)"
        )
        bits.append(f"if({proj} > 0D, '1', '0')")
    return F.expr("concat(" + ", ".join(bits) + ")")


def _bucket_expr_sql(valias: str) -> str:
    bits = []
    for p in range(N_PLANES):
        proj = (
            f"list_sum([(strpos('{_HEX}', substr(md5('{p}:' || (i-1)), 1, 1)) - 8.5)"
            f" * {valias}[i] for i in generate_series(1, 64)])"
        )
        bits.append(f"CASE WHEN {proj} > 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


_PROBES_SQL = f"""[bucket] || [substr(bucket, 1, i-1)
       || (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END)
       || substr(bucket, i+1, {N_PLANES}-i)
       for i in generate_series(1, {N_PLANES})]"""

_PROBES_SPARK = (
    f"concat(array(bucket), transform(sequence(1, {N_PLANES}),"
    " i -> concat(substring(bucket, 1, i-1),"
    " if(substring(bucket, i, 1) = '1', '0', '1'),"
    f" substring(bucket, i+1, {N_PLANES}-i))))"
)


@register(
    "llm_similarity_ann",
    sql=f"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         hashed AS (SELECT vec_id, label, v, {_bucket_expr_sql('v')} AS bucket FROM e),
         q AS (
           SELECT qid, qv, unnest(probes) AS pb FROM (
             SELECT vec_id AS qid, v AS qv, {_PROBES_SQL} AS probes
             FROM hashed WHERE vec_id < {N_QUERIES}
           )
         ),
         scored AS (
           SELECT q.qid, h.vec_id,
                  round(
                    list_sum([q.qv[i] * h.v[i] for i in generate_series(1, len(q.qv))]) /
                    (sqrt(list_sum([x * x for x in q.qv])) *
                     sqrt(list_sum([x * x for x in h.v]))), 6) AS cosine
           FROM q JOIN hashed h ON h.bucket = q.pb AND h.vec_id <> q.qid
         )
         SELECT qid, vec_id, cosine, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY qid
                                        ORDER BY cosine DESC, vec_id) AS rank
           FROM scored
         ) WHERE rank <= {TOP_K}""",
)
def llm_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: multi-probe hyperplane-LSH. Each query probes
    its own bucket plus every hamming-1 neighbor bucket (the standard
    multi-probe recall lever — more probes, not more replicas), then
    exact-cosine re-ranks the candidates. Recall vs brute force is pinned
    by tests/test_llm.py; the bucket equi-join replaces the cross join —
    the scale win that makes this the 100 TB plan.
    """
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    hashed = e.withColumn("bucket", _bucket_expr_spark("v"))
    q = (
        hashed.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.explode(F.expr(_PROBES_SPARK)).alias("pb"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(
            hashed.select("vec_id", "v", F.col("bucket").alias("hb")),
            (F.col("hb") == F.col("pb")) & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id", F.round(_cos("qv", "v"), 6).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "cosine", "rank")
    )
