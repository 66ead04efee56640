"""Multi-table atomic commits: a versioned catalog over the
single-table snapshot layer.

Single-table snapshot commits (``layout.write_snapshot``) are atomic
per table, but a pipeline step that publishes e.g. a fact table AND
its rollup must not expose readers to one without the other. This
module adds the Nessie/lakeFS-style answer: a tiny versioned CATALOG
whose every version is one immutable JSON mapping
``table name → snapshot version``. A transaction writes its tables'
data as ordinary per-table snapshot commits (invisible to catalog
readers), then publishes ONE new catalog version containing the
updated mapping — readers that resolve versions through the catalog
see either all of the transaction's tables or none.

Concurrency is optimistic, Nessie-style: the commit captures the
catalog state at its start; at publish time it REBASES onto any
catalog versions that landed meanwhile (merging mappings) and raises
:class:`CatalogConflict` if a rebased-over commit touched one of the
transaction's own tables — last-wins would silently drop a committed
update. Disjoint concurrent transactions therefore both land; racing
writes to the same table surface as a conflict the caller retries at
the transaction level.

The catalog's own versioning reuses the SAME pluggable
:class:`~.commitstore.CommitBackend` protocol as data commits
(rename-CAS on POSIX, create-only manifest PUT on object stores), so
the whole stack has exactly one commit primitive to reason about.
Crash-safety: a writer that dies after its table snapshots but
before the catalog publish leaves orphan table versions (inert,
vacuumable) and a byte-unchanged catalog — readers never observe the
partial transaction.

At 100 TB the catalog publish is O(tables) metadata (one small JSON),
never O(data); table data commits carry the actual weight and those
are already zero-copy where possible (hardlinked restore/DML files).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from .layout import read_snapshot, write_snapshot

_CATALOG_JSON = "catalog.json"


class CatalogConflict(RuntimeError):
    """Another transaction committed one of this transaction's
    tables between its start and its publish."""


class SnapshotCatalog:
    """A root directory holding ``tables/<name>`` snapshot tables and
    a ``_catalog`` version history of table→version mappings."""

    def __init__(self, root: str, backend=None) -> None:
        from .commitstore import DEFAULT_BACKEND

        self.root = root
        self.cat_dir = os.path.join(root, "_catalog")
        self.be = backend if backend is not None else DEFAULT_BACKEND

    # ---- paths / resolution -------------------------------------

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, "tables", name)

    def current_version(self) -> int | None:
        return self.be.current_version(self.cat_dir)

    def versions(self) -> list[int]:
        return self.be.versions(self.cat_dir)

    def _payload(self, version: int | None) -> dict:
        v = self.current_version() if version is None else version
        if v is None:
            return {"tables": {}, "meta": {}}
        p = os.path.join(self.be.data_dir(self.cat_dir, v), _CATALOG_JSON)
        with open(p) as f:
            raw = json.load(f)
        if "tables" in raw:
            return {
                "tables": {k: int(x) for k, x in raw["tables"].items()},
                "meta": raw.get("meta", {}),
            }
        # pre-meta catalogs stored the bare mapping
        return {"tables": {k: int(x) for k, x in raw.items()}, "meta": {}}

    def mapping(self, version: int | None = None) -> dict[str, int]:
        """The table→snapshot-version mapping at a catalog version
        (default: current). Empty mapping when no catalog commit
        exists yet."""
        return self._payload(version)["tables"]

    def commit_meta(self, version: int | None = None) -> dict:
        """The metadata dict attached to a catalog commit (e.g. a
        streaming sink's batch id). Empty for meta-less commits."""
        return self._payload(version)["meta"]

    def read(
        self,
        spark: SparkSession,
        table: str,
        catalog_version: int | None = None,
    ) -> DataFrame:
        """Read a table at the version the catalog (current or
        time-traveled) points to. For a multi-table-consistent view,
        resolve ``mapping()`` ONCE and pass its catalog version to
        every read."""
        m = self.mapping(catalog_version)
        if table not in m:
            raise KeyError(
                f"table {table!r} not in catalog version "
                f"{catalog_version if catalog_version is not None else self.current_version()}; "
                f"tables: {sorted(m)}"
            )
        return read_snapshot(
            spark, self.table_path(table), version=m[table], backend=self.be
        )

    # ---- transaction commit -------------------------------------

    def commit(
        self,
        tables: dict[str, DataFrame],
        stats_cols: dict[str, list[str]] | None = None,
        max_retries: int = 64,
        meta: dict | None = None,
    ) -> int:
        """Atomically publish new versions of every frame in
        ``tables``. ``meta`` rides in the catalog commit (never in
        the tables — the streaming sink's batch-id replay guard
        lives here). Returns the new catalog version. Raises
        :class:`CatalogConflict` when a concurrent transaction
        committed an overlapping table (retry the whole transaction:
        recompute from fresh reads, commit again)."""
        base_v = self.current_version()
        base_map = self.mapping(base_v)
        stats_cols = stats_cols or {}
        written = {
            name: write_snapshot(
                df,
                self.table_path(name),
                max_retries=max_retries,
                backend=self.be,
                stats_cols=stats_cols.get(name),
            )
            for name, df in tables.items()
        }
        return self._publish(base_v, base_map, written, max_retries, meta)

    def _publish(
        self,
        base_v: int | None,
        base_map: dict[str, int],
        updates: dict[str, int],
        max_retries: int,
        meta: dict | None = None,
    ) -> int:
        os.makedirs(self.cat_dir, exist_ok=True)
        for _ in range(max_retries):
            # rebase against the highest CLAIMED version, not the
            # pointer: a rival that has claimed but not yet advanced
            # the pointer is already committed (claims are total-
            # ordered by the CAS; pointer advance is monotonic max),
            # and merging against the stale pointer would silently
            # drop its table updates
            claimed = self.be.versions(self.cat_dir)
            ptr = self.current_version()
            cands = claimed + ([ptr] if ptr is not None else [])
            cur = max(cands) if cands else None
            if cur != base_v:
                # rebase: merge mappings that landed since our start,
                # but an overlapping-table commit is a real conflict
                cur_map = self.mapping(cur)
                for t in updates:
                    if cur_map.get(t) != base_map.get(t):
                        raise CatalogConflict(
                            f"table {t!r} was committed concurrently "
                            f"(catalog {base_v} → {cur}); retry the "
                            "transaction from fresh reads"
                        )
                base_v, base_map = cur, cur_map
            merged = {**base_map, **updates}
            staging = os.path.join(
                self.cat_dir, f".staging-{uuid.uuid4().hex}"
            )
            os.makedirs(staging)
            won = False
            try:
                with open(os.path.join(staging, _CATALOG_JSON), "w") as f:
                    json.dump(
                        {"tables": merged, "meta": meta or {}},
                        f,
                        sort_keys=True,
                    )
                # cand derives from the SAME versions read the rebase
                # used — re-reading here would let a rival claim slip
                # between rebase and claim and be skipped over (its
                # mapping silently dropped). With cand = cur + 1, any
                # such rival makes THIS claim fail, and the retry
                # rebases onto it.
                cand = (cur if cur is not None else 0) + 1
                won = self.be.claim_version(self.cat_dir, cand, staging)
                if won:
                    self.be.advance_pointer(self.cat_dir, cand)
                    return cand
            finally:
                if not won:
                    # NEVER on success: a manifest-style backend's
                    # claim leaves the data living in staging
                    shutil.rmtree(staging, ignore_errors=True)
            # lost the claim race: loop re-reads, rebases, retries
        raise RuntimeError(
            f"catalog publish lost the version race {max_retries} times "
            f"at {self.cat_dir} — writer storm, raise max_retries"
        )

    # ---- maintenance ---------------------------------------------

    def vacuum_unreferenced(self, keep_last: int = 1) -> dict[str, list[int]]:
        """Drop table snapshot versions referenced by NO retained
        catalog version (retained = the newest ``keep_last`` catalog
        versions), plus the older catalog versions themselves.
        Orphans from crashed transactions (table versions that never
        made it into any catalog) are reclaimed here too. Run only
        while no writer is active (standard vacuum caveat). Returns
        the dropped versions per table."""
        cat_versions = self.versions()
        keep_cats = cat_versions[-keep_last:] if keep_last else []
        referenced: dict[str, set[int]] = {}
        for cv in keep_cats:
            for t, tv in self.mapping(cv).items():
                referenced.setdefault(t, set()).add(tv)
        dropped: dict[str, list[int]] = {}
        tables_dir = os.path.join(self.root, "tables")
        try:
            names = os.listdir(tables_dir)
        except OSError:
            names = []
        for t in names:
            tp = self.table_path(t)
            keep = set(referenced.get(t, set()))
            # the table's own pointer counts as a reference: pointers
            # can never regress, so dropping the version under one
            # would leave direct (non-catalog) reads dangling
            cur_t = self.be.current_version(tp)
            if cur_t is not None:
                keep.add(cur_t)
            for tv in self.be.versions(tp):
                if tv not in keep:
                    loc = self.be.drop_version(tp, tv)
                    if loc:
                        shutil.rmtree(loc, ignore_errors=True)
                    dropped.setdefault(t, []).append(tv)
            # keep each table's own pointer consistent with the
            # newest retained reference (readers SHOULD go through
            # the catalog, but a stale _CURRENT pointing at a dropped
            # version would break direct reads)
            if keep:
                self.be.advance_pointer(tp, max(keep))
        for cv in cat_versions:
            if cv not in keep_cats:
                loc = self.be.drop_version(self.cat_dir, cv)
                if loc:
                    shutil.rmtree(loc, ignore_errors=True)
        return dropped
