"""Text/JSON queries (SURVEY §2.8 F6-F10, §2.2 P5/P9/P10, §2.4 A3/A4,
§2.9 G3).

``events.props`` carries the JSON-ish payload; ``documents.text``
carries free text. Where the reference parses LLM responses, these
queries parse deterministic constructions of the same shapes so the
DuckDB oracle can check them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import validity_counters
from ..sources.readers import read_table
from .registry import register


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: typed JSON field extraction + predicate on the result.

    Reference analogue: schema'd parse of LLM JSON
    (utils/recent_history_utils.py:154-163).
    """
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") >= 50)
        .select("event_id", "event_type", "k")
    )


@register(
    "json_validity_counters",
    oracle="""
    WITH mangled AS (
        SELECT event_type,
               CASE WHEN event_id % 7 = 0
                    THEN substr(props, 1, length(props) - 1)
                    ELSE props END AS payload
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN json_valid(payload)
                          AND json_extract_string(payload, '$.k') IS NOT NULL
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid,
           round(sum(CASE WHEN json_valid(payload)
                           AND json_extract_string(payload, '$.k') IS NOT NULL
                          THEN 0 ELSE 1 END)::DOUBLE / count(*), 6) AS error_rate
    FROM mangled
    GROUP BY event_type
    """,
)
def json_validity_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9/A3/P10: invalid-payload counters per group.

    Emulates the reference's LLM-response validation: every 7th
    event's payload is deterministically truncated (broken JSON), and
    the counters count parse failures — the reference's
    invalid_types/invalid_keys/error_rate block
    (utils/recent_history_utils.py:138-186).
    """
    ev = read_table(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 7 == 0,
        F.expr("substr(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    parsed = F.from_json(payload, "k LONG")
    valid = parsed.isNotNull() & parsed["k"].isNotNull()
    return validity_counters(
        ev.withColumn("__valid", valid),
        valid_col=F.col("__valid"),
        group_cols=("event_type",),
    ).select("event_type", "n_rows", "n_invalid", "error_rate")


@register(
    "extract_bracketed_interests",
    oracle="""
    WITH constructed AS (
        SELECT doc_id, lang,
               'Interests: ["' || replace(substr(text, 1, 40), ' ', '", "')
                   || '"] trailing noise' AS payload
        FROM documents
    ), extracted AS (
        SELECT doc_id, lang,
               regexp_extract(payload, '\\[(.*?)\\]', 1) AS lst
        FROM constructed
    ), exploded AS (
        SELECT doc_id, lang,
               trim(trim(unnest(string_split(lst, ',')), ' '), '"') AS interest
        FROM extracted
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_interests,
           CAST(count(DISTINCT interest) AS BIGINT) AS n_distinct
    FROM exploded
    WHERE interest <> ''
    GROUP BY lang
    """,
)
def extract_bracketed_interests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6+G3+A4: bracketed-list extraction → split → trim → explode →
    distinct count per group.

    Reference: utils/old_history_utils.py:38-45 (regex ``\\[(.*?)\\]``
    then strip quotes/split on comma), explode+distinct at
    assets/old_history.py:118-124 and utils/old_history_utils.py:113-122.
    The list is constructed deterministically from document text so
    both engines see identical payloads.
    """
    docs = read_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit('Interests: ["'),
        F.regexp_replace(F.substring("text", 1, 40), " ", '", "'),
        F.lit('"] trailing noise'),
    )
    lst = F.regexp_extract(payload, r"\[(.*?)\]", 1)
    items = F.transform(
        F.split(lst, ","),
        lambda x: F.trim(F.regexp_replace(F.trim(x), '^"|"$', "")),
    )
    exploded = (
        docs.withColumn("interest", F.explode(items))
        .filter(F.col("interest") != "")
        .select("lang", "interest")
    )
    return exploded.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_interests"),
        F.countDistinct("interest").alias("n_distinct"),
    )


@register(
    "props_pattern_match",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN regexp_matches(props, '"k": [0-9]{2}\\}$')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_two_digit
    FROM events
    GROUP BY event_type
    """,
)
def props_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/F7: regex predicate counting (the reference's HH:MM check
    shape, utils/recent_history_utils.py:164-168)."""
    ev = read_table(spark, sf_dir, "events")
    two_digit = F.col("props").rlike(r'"k": [0-9]{2}\}$').cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(two_digit).alias("n_two_digit"),
    )


@register(
    "pii_scrub_counts",
    oracle=r"""
    WITH seeded AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' reach me at user' || doc_id || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' see https://ex.io/d/' || doc_id || '?ref=x'
                       ELSE '' END
               || CASE WHEN doc_id % 13 = 0
                       THEN ' call +1-555-' || (1000000 + doc_id) ELSE '' END
                   AS text
        FROM documents
    ), counted AS (
        SELECT doc_id, text,
               len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_url,
               regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g') AS t1
        FROM seeded
    ), c2 AS (
        SELECT doc_id, n_url,
               len(regexp_extract_all(
                   t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
               )) AS n_email,
               regexp_replace(
                   t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'
               ) AS t2
        FROM counted
    ), c3 AS (
        SELECT doc_id, n_url, n_email,
               len(regexp_extract_all(t2, '\+?[0-9][0-9()\-\s]{7,}[0-9]'))
                   AS n_phone,
               regexp_replace(
                   t2, '\+?[0-9][0-9()\-\s]{7,}[0-9]', '<PHONE>', 'g'
               ) AS scrubbed
        FROM c2
    )
    SELECT doc_id,
           CAST(n_url AS BIGINT) AS n_url,
           CAST(n_email AS BIGINT) AS n_email,
           CAST(n_phone AS BIGINT) AS n_phone,
           CAST(length(scrubbed) AS BIGINT) AS scrubbed_len,
           md5(scrubbed) AS scrubbed_md5
    FROM c3
    """,
)
def pii_scrub_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (pre-tokenization corpus hygiene): deterministic
    emails/URLs/phones are seeded onto the synthetic corpus (which
    has none), then scrubbed with the engine-parity patterns in
    functions.redact; output pins per-type counts and the md5 of the
    scrubbed text so the oracle verifies the exact replacement
    byte-for-byte. Row-local projection — zero shuffle."""
    from ..functions.redact import pii_counts, scrub_pii

    docs = read_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" reach me at user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" see https://ex.io/d/"),
                    F.col("doc_id").cast("string"),
                    F.lit("?ref=x"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    (F.col("doc_id") + 1_000_000).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    counts = pii_counts(F.col("text"))
    return seeded.select(
        "doc_id",
        counts["n_url"].alias("n_url"),
        counts["n_email"].alias("n_email"),
        counts["n_phone"].alias("n_phone"),
        F.length(scrub_pii(F.col("text"))).cast("long").alias("scrubbed_len"),
        F.md5(scrub_pii(F.col("text"))).alias("scrubbed_md5"),
    )
