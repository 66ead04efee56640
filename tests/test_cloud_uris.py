"""S4: object-store path handling. No cloud connector jars exist in
this environment, so these tests pin the property that matters: the
engine's own layers (path construction, session self-tuning, sink
wiring) pass ``s3a://``/``abfss://`` URIs through UNTOUCHED — the URI
reaches Hadoop's filesystem resolution intact, where a deployed
cluster's connector jar takes over (the reference env-switches
``az://`` the same way, consts.py:16-27)."""

from __future__ import annotations

import posixpath

import pytest

from enclaveid_data_pipeline_spark.sources.readers import (
    _autotune_shuffle_partitions,
    read_table,
)


@pytest.mark.parametrize(
    "uri",
    ["s3a://bucket/corpora/sf1", "abfss://fs@acct.dfs.core.windows.net/sf1"],
)
def test_table_path_construction_preserves_uris(uri):
    # read_table builds paths with os.path.join; on POSIX that is
    # posixpath and URIs concatenate without scheme damage
    joined = posixpath.join(uri, "events.parquet")
    assert joined == f"{uri}/events.parquet"


def test_autotune_noops_on_object_store_dirs(spark):
    # the size probe is local-fs only; a URI dir must leave the
    # session untouched even when the session LOOKS untuned (the
    # OSError branch, not the already-tuned early return)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        _autotune_shuffle_partitions(spark, "s3a://bucket/corpora/sf1")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "200"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_uri_reaches_hadoop_filesystem_layer(spark):
    """The failure for an unwired scheme must come from Hadoop's
    FileSystem registry (scheme intact, engine layers passed it
    through) — not from a python path error."""
    with pytest.raises(Exception) as ei:
        read_table(spark, "nosuchscheme://bucket/sf1", "events").count()
    msg = str(ei.value)
    assert "nosuchscheme" in msg
    assert "No FileSystem for scheme" in msg or "UnsupportedFileSystem" in msg
