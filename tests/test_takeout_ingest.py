"""S1/S10/P1/P2 — the reference's primary ingest path
(assets/takeout.py:36-76): schema'd JSON scan with typed ``time``,
rename to ``timestamp``, deployment row limit, derived time columns.
"""

from __future__ import annotations

import json

from enclaveid_data_pipeline_spark.sources.readers import (
    read_takeout_json,
    with_derived_time_columns,
)

_ROWS = [
    {
        "header": "YouTube",
        "title": "Watched a video",
        "titleUrl": "https://example.test/v/1",
        "time": "2023-05-01T08:30:15.123Z",
        "products": ["YouTube"],
        "activityControls": ["Web & App Activity"],
    },
    {
        "header": "Search",
        "title": "Searched for spark session window",
        "titleUrl": None,
        "time": "2023-05-02T22:05:00Z",
        "products": ["Search"],
        "activityControls": ["Web & App Activity"],
    },
    {
        # malformed time must yield NULL timestamp, not a crash
        "header": "Maps",
        "title": "Looked at a place",
        "titleUrl": None,
        "time": "not-a-timestamp",
        "products": [],
        "activityControls": [],
    },
]


def test_takeout_json_ingest(spark, tmp_path):
    p = tmp_path / "MyActivity.json"
    p.write_text(json.dumps(_ROWS))  # one JSON array, like the export

    df = read_takeout_json(spark, str(p))
    assert [f.name for f in df.schema.fields] == [
        "header",
        "title",
        "titleUrl",
        "timestamp",
        "products",
        "activityControls",
    ]
    rows = {r.header: r for r in df.collect()}
    assert len(rows) == 3
    # typed time override (schema, not inference) — UTC session tz
    assert rows["YouTube"].timestamp.strftime("%Y-%m-%d %H:%M:%S") == (
        "2023-05-01 08:30:15"
    )
    assert rows["Maps"].timestamp is None  # malformed → NULL, row kept
    assert rows["Search"].products == ["Search"]

    derived = with_derived_time_columns(df).collect()
    by_header = {r.header: r for r in derived}
    assert str(by_header["YouTube"].date) == "2023-05-01"
    assert by_header["YouTube"].hour == "08:30"
    assert by_header["Search"].month == "2023-05-02"
    assert by_header["Maps"].date is None

    # S10: limit applies after the scan
    assert read_takeout_json(spark, str(p), row_limit=2).count() == 2


def test_apply_row_limit_and_append_sink(spark, tmp_path):
    """S10 (env-gated limit helper) + S7 (table-to-table append)."""
    from enclaveid_data_pipeline_spark.sources.readers import apply_row_limit
    from enclaveid_data_pipeline_spark.sources.writers import (
        insert_into_partitioned,
        write_partitioned,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "user_id long, v string"
    )
    assert apply_row_limit(df, None).count() == 3
    assert apply_row_limit(df, 2).count() == 2

    out = str(tmp_path / "t")
    write_partitioned(df, out)
    # seed-copy shape (reference INSERT INTO ... SELECT): append one
    # user's rows into the same table without touching others
    insert_into_partitioned(
        spark.createDataFrame([(1, "d")], "user_id long, v string")
        .select("v", "user_id"),  # partition col position-independent
        out,
    )
    got = sorted((r.user_id, r.v) for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (1, "b"), (1, "d"), (2, "c")]
