from __future__ import annotations

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.functions.jsonextract import (
    SESSION_SCHEMA,
    extract_json_candidates,
    json_candidates_udf,
    parse_json_spans,
)
from enclaveid_data_pipeline_spark.operators.quality import (
    session_shape_valid,
    validity_counters,
)


def test_extract_json_candidates_pure():
    assert extract_json_candidates(None) == []
    assert extract_json_candidates("no json here") == []
    assert extract_json_candidates('x {"a": 1} y') == ['{"a": 1}']
    # multiple spans, nested, array
    got = extract_json_candidates('a {"x": {"y": [1,2]}} b [3,4] c')
    assert got == ['{"x": {"y": [1,2]}}', "[3,4]"]
    # string-literal braces must not confuse the scanner
    assert extract_json_candidates('{"s": "}{"}') == ['{"s": "}{"}']
    # unbalanced → skipped
    assert extract_json_candidates('{"a": 1') == []


def test_json_candidates_udf_and_parse(spark):
    df = spark.createDataFrame(
        [
            (1, 'intro {"time_start":"09:00","time_end":"10:00",'
                '"description":"d","interests":["a","b"]} outro'),
            (2, "garbage"),
            (3, '{"time_start":"9am","time_end":"10:00",'
                '"description":"d","interests":[]}'),
        ],
        "id long, raw string",
    )
    spans = df.withColumn("cand", F.explode_outer(json_candidates_udf("raw")))
    parsed = spans.withColumn("s", parse_json_spans(F.col("cand"), SESSION_SCHEMA))
    out = parsed.withColumn("ok", session_shape_valid(F.col("s")))
    rows = {r.id: r for r in out.collect()}
    assert rows[1].ok is True
    assert rows[2].ok is False  # no candidate at all
    assert rows[3].ok is False  # time_start fails HH:MM regex


def test_validity_counters(spark):
    df = spark.createDataFrame(
        [("a", True), ("a", False), ("a", True), ("b", True)],
        "g string, ok boolean",
    )
    out = {
        r.g: r
        for r in validity_counters(df, F.col("ok"), group_cols=("g",)).collect()
    }
    assert out["a"].n_rows == 3 and out["a"].n_invalid == 1
    assert abs(out["a"].error_rate - 0.333333) < 1e-9
    assert out["b"].n_invalid == 0


def test_observe_validity_piggybacks_on_action(spark):
    """M9 via Dataset.observe: counters arrive with the action that
    consumes the frame — no second scan."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.operators.quality import (
        observe_validity,
    )

    df = spark.createDataFrame(
        [("08:00",), ("bad",), ("23:59",), (None,)], "t string"
    )
    obs = Observation("q")
    valid = F.col("t").rlike(r"^\d{2}:\d{2}$")
    observed = df.observe(
        obs, F.count(F.lit(1)).alias("n_rows"),
        F.sum((~F.coalesce(valid, F.lit(False))).cast("long")).alias("n_invalid"),
    )
    assert observed.count() == 4
    assert obs.get == {"n_rows": 4, "n_invalid": 2}

    # the named-observation wrapper drives the same machinery
    out = observe_validity(df, F.coalesce(valid, F.lit(False)), name="q2")
    assert out.count() == 4


def test_flatten_json_objects_reference_semantics(spark):
    """Reference flatten (recent_history_utils.py:125-137): dict
    spans append themselves, LIST spans extend element-wise, falsy
    ({}/[]) and unparseable spans contribute nothing; non-dict list
    elements are kept (they count as invalid_types downstream)."""
    from enclaveid_data_pipeline_spark.functions.jsonextract import (
        flatten_json_objects,
        object_is_dict,
        object_keys_valid,
    )
    from pyspark.sql import functions as F

    rows = [
        ('pre {"a": 1} mid [{"b": 2}, 3, "x"] post {} [] {bad} tail',),
        ("no json here",),
        ('[{"time_start":"01:02","time_end":"03:04",'
         '"description":"d","interests":["k"]}]',),
    ]
    df = spark.createDataFrame(rows, "response string")
    got = df.select(
        flatten_json_objects(F.col("response")).alias("objs")
    ).collect()
    # list elements are re-serialized by the JSON parser (whitespace
    # normalized); top-level dict spans keep their original text
    assert got[0]["objs"] == ['{"a": 1}', '{"b":2}', "3", "x"]
    assert got[1]["objs"] == []
    assert len(got[2]["objs"]) == 1

    objs = df.select(
        F.explode(flatten_json_objects(F.col("response"))).alias("o")
    ).select(
        "o",
        object_is_dict(F.col("o")).alias("d"),
        object_keys_valid(F.col("o")).alias("k"),
    ).collect()
    flags = {r["o"]: (r["d"], r["k"]) for r in objs}
    assert flags['{"a": 1}'] == (True, False)
    assert flags["3"] == (False, False)
    assert flags["x"] == (False, False)
    # the full 4-key session object passes the strict key check
    sess = [o for o in flags if "time_start" in o][0]
    assert flags[sess] == (True, True)


def test_flatten_matches_reference_loop_on_random_responses(spark):
    """Seeded-random parity sweep: Spark's flatten_json_objects must
    agree with a pure-Python replay of the reference's extract loop
    (scan spans; dict appends, list EXTENDS, falsy/unparseable spans
    skipped) on responses mixing every envelope and garbage shape."""
    import json
    import random

    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.functions.jsonextract import (
        extract_json_candidates,
        flatten_json_objects,
    )

    def reference_flatten(text):
        out = []
        for span in extract_json_candidates(text):
            try:
                parsed = json.loads(span)
            except Exception:
                continue
            if not parsed:
                continue  # falsy: {}, []
            if isinstance(parsed, dict):
                out.append(parsed)
            elif isinstance(parsed, list):
                out.extend(parsed)
        return out

    rng = random.Random(42)
    frags = [
        '{"a": 1}', '{"t": "x{y}"}', "{bad json}", "{}", "[]",
        '[1, "two", {"k": [1,2]}]', "plain text", '[{"a":1},{"b":2}]',
        '{"s": "quote \\" and [bracket]"}', "[[1],[2]]", '"str"',
        '{"n": null}', "[null]", "] stray [", "{unclosed",
    ]
    responses = []
    for _ in range(60):
        n = rng.randint(0, 6)
        responses.append(" ".join(rng.choice(frags) for _ in range(n)))
    df = spark.createDataFrame([(r,) for r in responses], "response string")
    got = (
        df.select("response",
                  flatten_json_objects(F.col("response")).alias("objs"))
        .collect()
    )
    def norm_ref(x):
        # scalar list elements surface as their token text on the
        # Spark side (Jackson string-capture); all the downstream
        # semantics need is dict-vs-not plus dict contents
        if x is None or isinstance(x, (dict, list, str)):
            return x
        return str(x)

    def norm_have(o):
        if o is None:
            return None
        return json.loads(o) if o.lstrip()[:1] in "{[" else o

    for row in got:
        want = [norm_ref(x) for x in reference_flatten(row["response"])]
        have = [norm_have(o) for o in row["objs"]]
        assert have == want, (row["response"], have, want)


def test_duplicate_required_key_accepted_like_python_dict(spark):
    """r4 ADVICE: the reference's json.loads→dict dedupes duplicated
    keys (d.keys() == {...} accepts), so a doubled required key must
    be VALID here too — json_object_keys reports duplicates verbatim
    and the raw 5-element array used to be rejected."""
    from enclaveid_data_pipeline_spark.functions.jsonextract import (
        object_keys_valid,
    )

    dup = (
        '{"time_start": "09:00", "time_start": "09:30", '
        '"time_end": "10:00", "description": "d", "interests": ["x"]}'
    )
    extra = (
        '{"time_start": "09:00", "time_end": "10:00", '
        '"description": "d", "interests": ["x"], "zzz": 1}'
    )
    df = spark.createDataFrame([(dup,), (extra,)], "obj string")
    got = [
        r[0]
        for r in df.select(
            object_keys_valid(F.col("obj"))
        ).collect()
    ]
    assert got == [True, False]
