"""☆ Atomic snapshot table on plain parquet — the commit protocol the
lineage checkpoint needs (SURVEY.md §2.10 O8; BASELINE.json's "Iceberg
checkpoint table ... resumes idempotently").

Iceberg's essential guarantee for a checkpoint table is: readers see a
COMMITTED snapshot or the previous one, never a torn write, and two
concurrent committers can't both win the same version. That protocol —
not the jar — is what resume correctness depends on, so it's implemented
here directly over parquet:

- data files land under ``<path>/data/<commit-uuid>/`` (invisible to
  readers until published — readers never list the data directory);
- a manifest ``<path>/_manifests/v<N>.json`` names every data file in
  snapshot N (parent snapshot's files + this commit's, append semantics);
- the manifest is published by writing a temp file, fsyncing, then
  ``os.link``-ing it to its final name — on POSIX an atomic
  create-if-absent, so a torn manifest is impossible and a version
  collision raises for one of two racing committers, which retries at
  N+1 (optimistic concurrency, exactly Iceberg's loop).

On an object store, step 3 becomes the catalog's conditional PUT /
compare-and-swap (what iceberg-spark-runtime does against a Hive/REST
catalog; plain S3 has no atomic link) — the manifest format and retry
loop are unchanged; only the publish primitive is injected
(``publish=`` parameter). The container has no Iceberg jar (COVERAGE.md),
so the local primitive is the tested one.

Scale notes: a manifest holds file PATHS only (KBs per thousand commits);
reads load exactly the listed files — no directory listing, no eventual-
consistency window; orphaned data from crashed commits is invisible and
GC-able by comparing ``data/`` against the latest manifest (``orphans()``).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another committer published this version first (retryable)."""


def _publish_link(tmp: str, final: str) -> None:
    """Atomic create-if-absent publish (POSIX link semantics)."""
    try:
        os.link(tmp, final)
    except FileExistsError as e:
        raise CommitConflict(final) from e
    finally:
        os.unlink(tmp)


class SnapshotTable:
    """Versioned, atomically-committed parquet table (append-only)."""

    def __init__(self, path: str, publish=_publish_link):
        self.path = path
        self._publish = publish
        os.makedirs(os.path.join(path, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # -- manifest bookkeeping ------------------------------------------------

    def _mdir(self) -> str:
        return os.path.join(self.path, "_manifests")

    def versions(self) -> list[int]:
        out = []
        for f in os.listdir(self._mdir()):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int) -> dict:
        with open(os.path.join(self._mdir(), f"v{version:08d}.json")) as f:
            return json.load(f)

    # -- commit / read -------------------------------------------------------

    def commit(self, df: DataFrame, run_id: str, max_retries: int = 10) -> int:
        """Atomically append ``df`` as a new snapshot; returns its version.

        The Spark write happens ONCE (data files are commit-private);
        only the manifest publish retries on version collision.
        """
        cid = f"{run_id}-{uuid.uuid4().hex[:12]}"
        ddir = os.path.join(self.path, "data", cid)
        df.write.mode("error").parquet(ddir)
        files = sorted(
            f"data/{cid}/{f}" for f in os.listdir(ddir) if f.endswith(".parquet")
        )
        for _ in range(max_retries):
            latest = self.latest_version()
            parent = self.manifest(latest)["files"] if latest is not None else []
            version = (latest if latest is not None else -1) + 1
            doc = {
                "version": version,
                "parent": latest,
                "run_id": run_id,
                "files": parent + files,
                "added": files,
            }
            tmp = os.path.join(self._mdir(), f".tmp-{uuid.uuid4().hex}.json")
            with open(tmp, "w") as f:
                json.dump(doc, f)
                f.flush()
                os.fsync(f.fileno())
            try:
                self._publish(tmp, os.path.join(self._mdir(), f"v{version:08d}.json"))
                return version
            except CommitConflict:
                continue  # re-read latest, rebase file list, try N+1
        raise CommitConflict(f"gave up after {max_retries} retries at {self.path}")

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        """Snapshot ``version`` (default latest) as a DataFrame; ``None``
        when the table has no committed snapshot yet. Reads exactly the
        manifest's files — orphans from crashed commits are invisible."""
        v = self.latest_version() if version is None else version
        if v is None:
            return None
        files = self.manifest(v)["files"]
        if not files:
            return None
        return spark.read.parquet(*[os.path.join(self.path, f) for f in files])

    def orphans(self) -> list[str]:
        """Data directories not referenced by the latest snapshot — debris
        from crashed commits, safe to GC."""
        v = self.latest_version()
        live = set()
        if v is not None:
            live = {f.split("/")[1] for f in self.manifest(v)["files"]}
        ddir = os.path.join(self.path, "data")
        return sorted(d for d in os.listdir(ddir) if d not in live)

    def vacuum(self, keep_versions: int = 1, min_age_s: float = 3600.0) -> list[str]:
        """Delete orphaned data directories and manifests older than the
        newest ``keep_versions`` snapshots (time travel shrinks
        accordingly; the latest snapshot is never touched). Because the
        latest manifest is self-contained, vacuum never breaks a reader
        that re-resolves the manifest; a reader holding an OLD version
        open races with its deletion — the same contract as Iceberg's
        expire_snapshots. Orphans younger than ``min_age_s`` are KEPT: an
        in-flight committer's data directory looks orphaned between its
        Spark write and its manifest publish, and deleting it would let
        the publish succeed pointing at dead files (Iceberg's
        remove_orphan_files ``older_than`` rule). Returns what was
        deleted."""
        import shutil
        import time

        deleted = []
        now = time.time()
        for d in self.orphans():
            full = os.path.join(self.path, "data", d)
            if now - os.path.getmtime(full) < min_age_s:
                continue  # possibly an in-flight commit
            shutil.rmtree(full)
            deleted.append(f"data/{d}")
        vs = self.versions()
        for v in vs[:-keep_versions] if keep_versions > 0 else []:
            os.unlink(os.path.join(self._mdir(), f"v{v:08d}.json"))
            deleted.append(f"_manifests/v{v:08d}.json")
        return deleted
