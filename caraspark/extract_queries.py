"""Extraction-side qkeys + the flagship query (SURVEY.md Part A rows).

``doc_extract_roundtrip`` is the hash-verified end-to-end proof: documents
from the driver testdata are wrapped in HTML boilerplate JVM-side, pushed
through the full mapInArrow extraction pipeline, and the oracle SQL predicts
the extracted text in closed form — so the whole engine (routing, HTML
strip, Arrow plumbing, salting) is value-hash-checked against DuckDB.

The PDF-side operators are verified by the committed byte goldens in
tests/ (they are not SQL-expressible); their qkeys here run the real
pipeline over the synthetic corpus and get the driver's rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from caraspark.corpus import corpus_rows_for_sf, synth_df
from caraspark.extract import extract
from caraspark.relational import Q, REGISTRY as _REL  # reuse the dataclass
from caraspark.tables import load

REGISTRY: dict[str, Q] = {}


def _q(name: str, sql):
    def deco(fn):
        REGISTRY[name] = Q(fn, sql)
        return fn

    return deco


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract(synth_df(spark, corpus_rows_for_sf(sf_dir)))


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry(): full pipeline over the synthetic corpus → verdict stats."""
    ex = _extracted(spark, sf_dir)
    return (
        ex.groupBy("kind", F.col("verdict.valid").alias("valid"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("text_bytes"),
            F.avg("metrics.n_objects").alias("avg_objects"),
            F.sum("metrics.bytes_in").alias("bytes_in"),
        )
        .orderBy("kind", "valid")
    )


@_q(
    "doc_extract_roundtrip",
    """SELECT CAST(doc_id AS VARCHAR) AS url, text AS extracted
       FROM documents""",
)
def doc_extract_roundtrip(spark, sf):
    # closed-form invariant: the HTML wrap adds only boilerplate (nav/
    # footer/script) around one <p>; the SPEC strips it and whitespace-
    # normalizes — documents.text is already single-spaced, so
    # extracted == text exactly.
    docs = load(spark, sf, "documents")
    raw = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.lit(None).cast("timestamp_ntz").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit(
                    "<html><head><title>t</title></head><body>"
                    "<nav><a href='/'>home</a><a href='/a'>about</a></nav>"
                    "<main><p>"
                ),
                F.col("text"),
                F.lit(
                    "</p></main><footer>(c) synth</footer>"
                    "<script>x()</script></body></html>"
                ),
            ),
            "utf-8",
        ).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )
    ex = extract(raw)
    return ex.select(
        "url", F.decode("text", "utf-8").alias("extracted")
    )


@_q("doc_extract", None)  # PDF semantics aren't SQL-expressible → rows-only
def doc_extract(spark, sf):
    ex = _extracted(spark, sf)
    return ex.select(
        "url",
        F.col("verdict.valid").alias("valid"),
        F.col("verdict.strict").alias("strict"),
        "kind",
        F.length("text").alias("text_bytes"),
        F.md5("text").alias("text_md5"),
    )


@_q("doc_stats", None)
def doc_stats(spark, sf):
    # C23: corpus-level stats fold over extraction metrics
    ex = _extracted(spark, sf)
    return ex.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("verdict.valid"), 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(F.col("verdict.strict"), 1).otherwise(0)).alias("n_strict"),
        F.sum("metrics.n_objects").alias("total_objects"),
        F.sum("metrics.n_streams").alias("total_streams"),
        F.sum("metrics.bytes_in").alias("bytes_in"),
        F.sum("metrics.bytes_decoded").alias("bytes_decoded"),
        F.max("metrics.n_updates").alias("max_updates"),
    )


@_q("partition_metrics", None)
def partition_metrics(spark, sf):
    """north_rule: per-partition lineage + parse-error metrics — the view an
    operator watches on a 1000-executor run (which partitions were slow,
    error-dense, or retried). Pure rollup over the lineage/metrics structs
    every extracted row already carries; one map-side-combined hash agg."""
    ex = _extracted(spark, sf)
    return (
        ex.groupBy(
            F.col("lineage.partition_id").alias("partition_id"),
            F.col("lineage.attempt").alias("attempt"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("metrics.bytes_in").alias("bytes_in"),
            F.round(F.sum("metrics.parse_ms"), 3).alias("parse_ms_total"),
            F.sum(F.when(~F.col("verdict.valid"), 1).otherwise(0)).alias(
                "n_invalid"
            ),
            F.sum(F.size("errors")).alias("n_errors"),
        )
        .orderBy("partition_id", "attempt")
    )


@_q("doc_taxonomy", None)
def doc_taxonomy(spark, sf):
    # C27: the error taxonomy as a first-class table — explode + count
    ex = _extracted(spark, sf)
    return (
        ex.select(F.explode("errors").alias("e"))
        .groupBy(F.col("e.code").alias("code"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("code")
    )


@_q("corpus_pipeline", None)
def corpus_pipeline(spark, sf):
    """The training-data story end-to-end in ONE lazy plan: extract →
    keep valid docs → score (chars / whitespace tokens / alpha ratio) →
    exact-dedup on content hash → per-kind corpus stats. One mapInArrow
    stage plus one dedup shuffle plus one agg — nothing else moves data."""
    ext = _extracted(spark, sf)
    txt = ext.filter(F.col("verdict.valid")).select(
        "url",
        F.col("text").cast("string").alias("text"),
    )
    scored = (
        txt.withColumns(
            {
                "n_chars": F.length("text"),
                "n_tokens": F.size(F.split(F.trim("text"), r"\s+")),
                "alpha_ratio": F.when(
                    F.length("text") > 0,
                    F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
                    / F.length("text"),
                ).otherwise(F.lit(0.0)),
                "fingerprint": F.sha2(F.col("text"), 256),
            }
        )
        .filter(F.col("n_chars") > 0)
    )
    deduped = scored.dropDuplicates(["fingerprint"])
    return deduped.agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.round(F.avg("alpha_ratio"), 4).alias("avg_alpha_ratio"),
    )


@_q("doc_scan", None)
def doc_scan(spark, sf):
    # C1: metadata-only scan of the corpus — the blob column is pruned;
    # only url/lang reach the executors (check ReadSchema in .explain)
    df = synth_df(spark, corpus_rows_for_sf(sf))
    return df.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
