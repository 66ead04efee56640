"""External DB sink (SURVEY §2.1 S5): partition upsert over JDBC.

The reference lands results in Postgres with delete-then-insert per
user — open a connection, DELETE the user's rows, then a typed binary
COPY of the replacement batch (assets/recent_history.py:127-178).
The Spark-native equivalent keeps the same idempotency contract
(replaying one partition's batch replaces exactly that partition)
but ships rows through the JDBC batch writer, partition-parallel:

1. distinct partition keys of the incoming frame are collected —
   bounded by the number of logical partitions in the batch (users),
   never row count;
2. those keys' existing rows are DELETEd in ONE prepared-statement
   batch on the driver (parameterized — keys come from data and are
   never interpolated into SQL);
3. ``df.write.jdbc(mode="append")`` streams the new rows in, one
   connection per Spark partition, ``batchsize`` rows per round trip.

Crash between 2 and 3 leaves the partitions empty (retryable — the
operation is idempotent by construction); crash mid-3 leaves a
partial append which the NEXT replay's delete clears. That is the
same failure contract as the reference's non-transactional
delete+COPY. For stronger atomicity wrap both steps in a staging
table + rename on the DB side.

The engine-internal stance (persist to engine tables, SURVEY §2.1)
still holds for pipeline intermediates; this sink is for the final
hand-off to an operational store.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_$.]*$")


def _check_identifier(name: str) -> str:
    """Guard table/column identifiers that must be inlined into SQL
    (values are always bound as prepared-statement parameters)."""
    if not _IDENT.match(name):
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    return name


def delete_partition_sql(table: str, partition_col: str) -> str:
    """The parameterized per-key DELETE (one ``?`` placeholder).

    The column is double-quoted (ANSI identifier quoting — Postgres/
    Derby/Oracle; MySQL needs ``ANSI_QUOTES``) because Spark's JDBC
    writer CREATEs columns through ``dialect.quoteIdentifier`` — an
    unquoted ``user_id`` would case-fold and miss the writer-created
    ``"user_id"`` column. The table name stays unquoted, matching the
    writer, which inlines it as-given (so it case-folds identically
    on both paths).
    """
    return (
        f"DELETE FROM {_check_identifier(table)} "
        f'WHERE "{_check_identifier(partition_col)}" = ?'
    )


def _table_exists(jconn, table: str) -> bool:
    """Existence probe via DatabaseMetaData — works across dialects
    without issuing a failing SELECT. Checks the identifier as-given
    plus upper/lower foldings (Derby/Postgres fold unquoted names in
    opposite directions)."""
    meta = jconn.getMetaData()
    for candidate in {table, table.upper(), table.lower()}:
        rs = meta.getTables(None, None, candidate, None)
        try:
            if rs.next():
                return True
        finally:
            rs.close()
    return False


def write_jdbc_partition_upsert(
    df: DataFrame,
    url: str,
    table: str,
    partition_col: str = "user_id",
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> list:
    """S5: idempotent partition upsert into an external DB.

    Returns the partition keys that were replaced (handy for logging
    and for tests). First-ever write skips the DELETE (no table yet)
    and lets the JDBC writer create it.
    """
    spark = df.sparkSession
    keys = [
        r[0] for r in df.select(partition_col).distinct().collect()
    ]

    jvm = spark._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    jconn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        if _table_exists(jconn, table):
            ps = jconn.prepareStatement(
                delete_partition_sql(table, partition_col)
            )
            try:
                for key in keys:
                    ps.setObject(1, key)
                    ps.addBatch()
                ps.executeBatch()
            finally:
                ps.close()
    finally:
        jconn.close()

    writer = df.write.mode("append").option("batchsize", str(batchsize))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.jdbc(url, table, properties=properties or {})
    return keys


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_col: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC source twin: single-connection by default; pass
    ``partition_col`` + bounds for a range-partitioned parallel read
    (each Spark task reads one key-range slice)."""
    reader = spark.read
    if partition_col is not None:
        return reader.jdbc(
            url,
            table,
            column=partition_col,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=properties or {},
        )
    return reader.jdbc(url, table, properties=properties or {})


def jdbc_stream_sink(
    stream_df,
    url: str,
    table: str,
    partition_col: str = "user_id",
    properties: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
):
    """Streaming twin of :func:`write_jdbc_partition_upsert`: each
    micro-batch delete-then-appends the partition keys it touches —
    the foreachBatch composition that gives effectively-once delivery
    to an external database from an at-least-once stream: a replayed
    micro-batch re-deletes and re-appends the same keys, converging
    to the same table instead of duplicating rows (idempotence comes
    from the keyed rewrite, not from transactions the sink may not
    have).

    Per trigger the DB work is proportional to the batch's key set,
    not the table; keys untouched by a batch are never rewritten —
    the same contract as streaming/sinks.partition_upsert_sink with
    the database as the layout."""

    def _upsert(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_jdbc_partition_upsert(
            batch_df, url, table,
            partition_col=partition_col, properties=properties,
        )

    w = stream_df.writeStream.foreachBatch(_upsert).outputMode("update")
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()
