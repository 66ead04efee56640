"""Python UDTFs — the SQL-callable table-function extension point.

Spark 4's ``@udtf`` lets a Python generator stand in a FROM clause
(``SELECT ... FROM docs, LATERAL word_bigrams(docs.text)``) — the
right home for row-expanding logic SQL genuinely can't express
(custom tokenizers, format parsers, model-driven span extractors).
Everything expressible as built-in expressions stays JVM-side (this
repo's chunking, shingling, and PMI pairs are all
generate-and-explode for that reason); the UDTF here is deliberately
one SQL-replayable example so the correctness harness can pin the
MECHANISM — registration, lateral join, arrow-batched exec — against
an independent engine, which it could not do for a genuinely
SQL-inexpressible function.

Arrow execution (``spark.sql.execution.pythonUDTF.arrow.enabled``)
batches rows across the Python boundary; without it each row is a
pickled round trip.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, w1 string, w2 string")
class WordBigrams:
    """Adjacent word pairs with positions: one output row per
    consecutive token pair of the input text."""

    def eval(self, text: str):  # noqa: D102 — generator contract
        if not text:
            return
        toks = text.split(" ")
        for i in range(len(toks) - 1):
            yield i, toks[i], toks[i + 1]


def register_udtfs(spark: SparkSession) -> None:
    """Make the UDTFs SQL-visible (idempotent) and turn on arrow
    transfer for the Python boundary."""
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("word_bigrams", WordBigrams)
