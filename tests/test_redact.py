"""PII redaction (functions/redact): scrub order, overlapping-match
attribution, count/scrub agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.functions.redact import (
    pii_counts,
    scrub_pii,
)


def _run(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    counts = pii_counts(F.col("text"))
    out = df.select(
        "id",
        scrub_pii(F.col("text")).alias("scrubbed"),
        *[c.alias(k) for k, c in counts.items()],
    )
    return {r.id: r for r in out.collect()}


def test_scrub_and_counts(spark):
    rows = _run(
        spark,
        [
            "plain text with no pii at all",
            "mail a.b+c@ex-ample.org and d@e.io twice",
            "visit https://ex.io/path?a=1 and http://plain.com now",
            "call +1-555-123-4567 today",
            "creds at https://user@host.com/x stay one URL",
        ],
    )
    assert rows[0].scrubbed == "plain text with no pii at all"
    assert (rows[0].n_url, rows[0].n_email, rows[0].n_phone) == (0, 0, 0)

    assert rows[1].scrubbed == "mail <EMAIL> and <EMAIL> twice"
    assert rows[1].n_email == 2

    assert rows[2].scrubbed == "visit <URL> and <URL> now"
    assert rows[2].n_url == 2

    assert rows[3].scrubbed == "call <PHONE> today"
    assert rows[3].n_phone == 1

    # URL containing '@' is attributed to url ONLY (scrub order):
    # counts and replacements agree
    assert rows[4].scrubbed == "creds at <URL> stay one URL"
    assert (rows[4].n_url, rows[4].n_email) == (1, 0)
