"""Mechanized registry==artifact freshness (round-9, judge r8 #3).

Twice now (r7, r8) the committed full-registry sf0.1 correctness
artifact was cut BEFORE the round's last registry additions, so the
artifact silently under-covered the registry — benign both times
because the judge re-ran the stragglers green, but "the rule exists
because one day the late query will be red". This test makes the gap
mechanical: the NEWEST committed ``CORRECTNESS_sf0.1_full_r*.txt``
must name every query the registry currently holds (ok / ok* /
sf-pinned / FAIL lines all count as "covered" — coverage is about
the artifact having SEEN the query, pass/fail is its own signal).

Red mid-round is the intended behavior: adding a query without
regenerating the artifact should fail until the artifact is re-cut
(the regeneration is the round's literal last act). Queries newer
than the artifact are listed by name so the fix is one command:

    python3 scripts/check_correctness.py /root/testdata/sf0.1 \
        > CORRECTNESS_sf0.1_full_r<N>.txt
"""

from __future__ import annotations

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LINE = re.compile(r"^(ok\*?|pin|FAIL)\s+([A-Za-z0-9_]+):")


def _newest_artifact() -> str:
    arts = glob.glob(os.path.join(REPO, "CORRECTNESS_sf0.1_full_r*.txt"))
    assert arts, "no committed full sf0.1 artifact found"
    return max(
        arts,
        key=lambda p: int(
            re.search(r"_r(\d+)", os.path.basename(p)).group(1)
        ),
    )


def _artifact_names(path: str) -> set[str]:
    names = set()
    with open(path) as f:
        for line in f:
            m = _LINE.match(line)
            if m:
                names.add(m.group(2))
    return names


def test_newest_full_artifact_covers_entire_registry():
    from enclaveid_data_pipeline_spark.queries import REGISTRY

    art = _newest_artifact()
    covered = _artifact_names(art)
    registry = set(REGISTRY)
    missing = sorted(registry - covered)
    stale = sorted(covered - registry)
    assert not missing, (
        f"{os.path.basename(art)} predates {len(missing)} registered "
        f"queries: {missing} — regenerate the artifact "
        f"(scripts/check_correctness.py /root/testdata/sf0.1)"
    )
    assert not stale, (
        f"{os.path.basename(art)} names {len(stale)} queries no longer "
        f"registered: {stale} — regenerate the artifact"
    )
