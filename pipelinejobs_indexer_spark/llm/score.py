"""The L4c quality score as a shared, import-cycle-free primitive.

`text.py` (llm_text_quality, the curation DAGs) and `dedup.py`
(llm_dedup_canonical) both consume the scoring policy; it lives here —
importing neither — so the two modules' mutual at-decoration-time SQL
builders can't deadlock the package import, and the policy can't fork
between consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def _sw_array_sql() -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def _sw_array_spark() -> str:
    return "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def quality_score_sql(rel: str = "documents") -> str:
    """The L4c score as a (doc_id, score) relation over ``rel`` — the
    DuckDB side of the policy (round-6 grid, pure arithmetic: no libm)."""
    return f"""SELECT doc_id,
                  round(least(1.0, greatest(0.0,
                        0.2 + n_words / 1000.0 + stop_ratio - 0.05 * n_punct)), 6)
                    AS score
           FROM (
             SELECT doc_id,
                    len(w) AS n_words,
                    CAST(len(list_filter(w, x -> list_contains({_sw_array_sql()}, x)))
                         AS DOUBLE) / len(w) AS stop_ratio,
                    length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct
             FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM {rel})
           )"""


def quality_score_frame(docs: DataFrame) -> DataFrame:
    """The L4c score as a (doc_id, score) frame over any (doc_id, text)
    input — the Spark twin of quality_score_sql (same clamp, same
    round-6 grid)."""
    t = docs.select("doc_id", "text", F.split("text", " ").alias("w"))
    feat = t.select(
        "doc_id",
        F.size("w").alias("n_words"),
        (
            F.expr(f"size(filter(w, x -> array_contains({_sw_array_spark()}, x)))").cast(
                "double"
            )
            / F.size("w")
        ).alias("stop_ratio"),
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")).alias("n_punct"),
    )
    score = F.round(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                F.lit(0.2)
                + F.col("n_words") / 1000.0
                + F.col("stop_ratio")
                - 0.05 * F.col("n_punct"),
            ),
        ),
        6,
    )
    return feat.select("doc_id", score.alias("score"))


def quality_score_col():
    """The L4c score as a single Column over a frame carrying `text` —
    the same clamp and round-6 grid as quality_score_frame, for
    consumers that need the score ALONGSIDE other columns without a
    corpus-scale join-back (L6m corpus report). One policy, three
    entry points."""
    w = F.split("text", " ")
    stop_ratio = (
        F.expr(
            f"size(filter(split(text, ' '), x -> array_contains("
            f"{_sw_array_spark()}, x)))"
        ).cast("double")
        / F.size(w)
    )
    return F.round(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                F.lit(0.2)
                + F.size(w) / 1000.0
                + stop_ratio
                - 0.05 * F.length(F.regexp_replace("text", "[a-z0-9 ]", "")),
            ),
        ),
        6,
    )
