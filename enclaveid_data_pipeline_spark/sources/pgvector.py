"""pgvector-typed Postgres hand-off (SURVEY §2.1 S5 refinement).

The reference's final sink is a typed binary COPY into Postgres:
``vector`` embeddings, ``text[]`` interest lists, ``time`` columns
(reference: assets/recent_history.py:153-176). Spark's JDBC writer
cannot emit those types natively (no TIME type, arrays only as
dialect ARRAY, no pgvector at all), so this module supplies the
standard JDBC-era bridge:

- each special column is RENDERED row-locally to its Postgres text
  literal (``[0.1,0.2]`` for vector, ``{"a","b"}`` for text[],
  ``HH:MM:SS`` for time) — native SQL expressions, no UDF;
- the table is created with the REAL column types via
  ``createTableColumnTypes``;
- the connection sets ``stringtype=unspecified`` so the Postgres
  driver lets the server infer each parameter's type from the target
  column — the text literal arrives as ``vector``/``text[]``/
  ``time``, not ``varchar``.

Everything composes with the delete-then-append partition upsert
(sources.jdbc) — same idempotency contract as the reference's
per-user DELETE + COPY. The rendering layer is hermetically testable
(string in, string out); the type mapping needs a real Postgres and
is exercised there only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .jdbc import _check_identifier, write_jdbc_partition_upsert


def vector_literal(col: Column) -> Column:
    """``array<float/double>`` → pgvector input literal
    ``[v1,v2,...]``. NULL arrays stay NULL (nullable vector
    column)."""
    return F.when(
        col.isNotNull(),
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(col, lambda x: x.cast("string")), ","
            ),
            F.lit("]"),
        ),
    )


def text_array_literal(col: Column) -> Column:
    """``array<string>`` → Postgres ``text[]`` input literal
    ``{"a","b"}`` with in-element ``\\`` and ``"`` escaped (the
    array-literal quoting rules); NULL elements render as
    unquoted NULL."""
    def _elem(x: Column) -> Column:
        escaped = F.regexp_replace(
            F.regexp_replace(x, r"\\", r"\\\\"), '"', r'\\"'
        )
        return F.when(
            x.isNotNull(), F.concat(F.lit('"'), escaped, F.lit('"'))
        ).otherwise(F.lit("NULL"))

    return F.when(
        col.isNotNull(),
        F.concat(
            F.lit("{"), F.array_join(F.transform(col, _elem), ","), F.lit("}")
        ),
    )


def time_literal(col: Column) -> Column:
    """Timestamp/HH:MM string → Postgres ``time`` literal
    ``HH:MM:SS``. Accepts either a timestamp column (formats its
    clock time) or an ``HH:MM``/``HH:MM:SS`` string (normalized) —
    the reference stores session start/end as ``time`` columns."""
    ts_form = F.date_format(col.cast("timestamp"), "HH:mm:ss")
    str_form = F.when(
        col.cast("string").rlike(r"^\d{2}:\d{2}$"),
        F.concat(col.cast("string"), F.lit(":00")),
    ).otherwise(col.cast("string"))
    return F.coalesce(ts_form, str_form)


def prepare_pgvector_frame(
    df: DataFrame,
    vector_cols: dict[str, int] | None = None,
    text_array_cols: tuple[str, ...] = (),
    time_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, str]:
    """Render the typed columns and build the
    ``createTableColumnTypes`` fragment for them:
    ``vector_cols`` maps column → dimension (``vector(n)`` DDL).
    Returns ``(rendered_df, column_types_ddl)`` — untouched columns
    keep Spark's default JDBC mapping."""
    ddl: list[str] = []
    for name, dim in (vector_cols or {}).items():
        df = df.withColumn(name, vector_literal(F.col(name)))
        ddl.append(f"{_check_identifier(name)} vector({int(dim)})")
    for name in text_array_cols:
        df = df.withColumn(name, text_array_literal(F.col(name)))
        ddl.append(f"{_check_identifier(name)} text[]")
    for name in time_cols:
        df = df.withColumn(name, time_literal(F.col(name)))
        ddl.append(f"{_check_identifier(name)} time")
    return df, ", ".join(ddl)


def write_pgvector_upsert(
    df: DataFrame,
    url: str,
    table: str,
    partition_col: str = "user_id",
    vector_cols: dict[str, int] | None = None,
    text_array_cols: tuple[str, ...] = (),
    time_cols: tuple[str, ...] = (),
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> list:
    """The reference's typed Postgres hand-off, Spark-shaped:
    delete-then-append per partition key (sources.jdbc contract)
    with pgvector/text[]/time columns created and populated with
    their real types. Requires the pgvector extension on the target
    and a Postgres JDBC URL; ``stringtype=unspecified`` is forced so
    rendered literals bind as the column types."""
    rendered, ddl = prepare_pgvector_frame(
        df, vector_cols, text_array_cols, time_cols
    )
    props = dict(properties or {})
    props.setdefault("stringtype", "unspecified")
    if ddl:
        # rides to the writer as an option (write_jdbc_partition_
        # upsert forwards properties as writer options too)
        props["createTableColumnTypes"] = ddl
    return write_jdbc_partition_upsert(
        rendered,
        url,
        table,
        partition_col=partition_col,
        properties=props,
        batchsize=batchsize,
    )
