"""Partition discovery (SURVEY §2.1 S9, §2.7 U2).

The reference's sensor lists bucket directories every ~30s, diffs
against a serialized cursor, and adds/removes dynamic user partitions
(sensors/__init__.py:16-40). The engine equivalent is a pure
set-diff over listed prefixes — callers decide cadence (cron/stream);
for continuous arrival prefer the file-source stream
(streaming.sessions.read_event_stream), which subsumes the sensor.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class DiscoveryDiff:
    to_add: frozenset[str]
    to_remove: frozenset[str]

    @property
    def changed(self) -> bool:
        return bool(self.to_add or self.to_remove)


def list_partition_dirs(base_dir: str) -> frozenset[str]:
    """Immediate child directories = discoverable partitions (the
    reference's one-dir-per-user layout)."""
    if not os.path.isdir(base_dir):
        return frozenset()
    return frozenset(
        e.name for e in os.scandir(base_dir) if e.is_dir()
    )


def diff_partitions(
    current: frozenset[str], known: frozenset[str]
) -> DiscoveryDiff:
    """U2: the sensor's set difference (dirs_to_add / dirs_to_delete,
    sensors/__init__.py:26-27)."""
    return DiscoveryDiff(
        to_add=current - known, to_remove=known - current
    )
