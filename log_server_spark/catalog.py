"""Parquet-directory warehouse.

The production design point is an Iceberg catalog (atomic snapshot commits,
file-level stats pruning, ``rewrite_data_files`` compaction — see SURVEY.md
§1.5). This container ships no Iceberg runtime jar, so tables are plain
parquet directories behind the same narrow interface; swapping
``format="iceberg"`` in is a config change, not a redesign. Semantics we rely
on (append-only writes + idempotence via the lineage protocol in
plans/pipeline.py) hold for both backends.
"""

from __future__ import annotations

import contextlib
import glob
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class WarehouseLockTimeout(TimeoutError):
    pass


class ArchivedBatchError(RuntimeError):
    """Write attempted against an archived (read-only) batch.

    The reference flips archived segments read-only and refuses subsequent
    writes (HeaderStorage readOnly byte, HeaderStorage.scala:242-275;
    enforcement BigStorage.scala:267-273). Anything that would rewrite an
    archived batch's history — id-remap reprocessing, resume=False sweeps —
    must fail loudly instead of silently rewriting compacted data."""


class Warehouse:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    def _recover_interrupted_archive(self) -> None:
        """Finish any crashed table swap (``archive``'s records compaction or
        a bookkeeping rewrite, see ``swap_in``): the swap protocol is
        rename(T -> T.old); rename(T.<tmp> -> T); rm(T.old) — a crash leaves
        either both T and T.old (drop the old copy) or only T.old (restore
        it). Stale build dirs (``*.rewrite``/``*.compact`` next to a live
        table) are incomplete builds and are discarded.

        Runs on LOCK ACQUISITION, never unlocked: an unlocked recovery could
        "finish" a swap another process is legitimately mid-way through
        under the lock (restoring T.old while the owner is about to
        rename the build dir into place)."""
        for old in glob.glob(os.path.join(self.root, "*.old")):
            base = old[: -len(".old")]
            if os.path.isdir(base):
                shutil.rmtree(old)
            else:
                os.rename(old, base)
        for suffix in (".rewrite", ".compact"):
            for tmp in glob.glob(os.path.join(self.root, "*" + suffix)):
                if os.path.isdir(tmp[: -len(suffix)]):
                    shutil.rmtree(tmp)

    def swap_in(self, name: str, build_dir: str) -> None:
        """Atomically-enough replace table ``name`` with the fully-built
        ``build_dir``: ``name`` is never absent without ``name.old`` present,
        so a crash at any point is recoverable on the next lock acquisition.
        Caller must hold the warehouse lock."""
        d = self.path(name)
        old = d + ".old"
        os.rename(d, old)
        os.rename(build_dir, d)
        shutil.rmtree(old)

    @contextlib.contextmanager
    def lock(self, timeout: float = 60.0, poll: float = 0.25):
        """Advisory exclusive lock on the warehouse dir.

        The reference locks its db dir with a ``db.lock`` file and a 60 s
        wait timeout (Directory.scala:140-170; RecordStorage.scala:40;
        unlock shutdown hook BigStorage.scala:360-372). Two overlapping
        ``update`` runs would otherwise interleave torn-write cleanup with
        each other's in-flight writes. A lock whose owner pid is dead is
        stolen (the crashed-process case the reference's shutdown hook
        can't cover).
        """
        lock_path = os.path.join(self.root, "db.lock")
        deadline = time.monotonic() + timeout
        while True:
            try:
                fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                break
            except FileExistsError:
                owner = None
                alive = False
                try:
                    with open(lock_path) as f:
                        owner = int(f.read().strip() or "0")
                    os.kill(owner, 0)
                    alive = True
                except ProcessLookupError:
                    alive = False  # owner pid is gone: stale
                except PermissionError:
                    alive = True  # owner is alive under another uid
                except (OSError, ValueError):
                    alive = False  # unreadable/corrupt lock: stale
                if not alive:
                    # steal via rename: exactly ONE contender wins the
                    # rename (the loser gets FileNotFoundError and loops),
                    # closing the read-check-unlink TOCTOU where two
                    # waiters both "remove the stale lock" and both end up
                    # holding their own fresh one
                    stale = f"{lock_path}.stale-{os.getpid()}"
                    with contextlib.suppress(FileNotFoundError):
                        os.rename(lock_path, stale)
                        os.remove(stale)
                    continue
                if time.monotonic() >= deadline:
                    raise WarehouseLockTimeout(
                        f"{lock_path} held by pid {owner} after {timeout}s"
                    ) from None
                time.sleep(poll)
        try:
            self._recover_interrupted_archive()
            yield self
        finally:
            with contextlib.suppress(FileNotFoundError):
                os.remove(lock_path)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        if not os.path.isdir(p):
            return False
        for _dirpath, _dirs, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "append",
        partition_by: list[str] | None = None,
    ) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def write_small(
        self, rows: list[tuple], schema_ddl: str, name: str, filename: str | None = None
    ) -> None:
        """Append a tiny table (lineage/metrics rows) driver-side via pyarrow.

        A 2-row bookkeeping append costs ~3 s as a Spark job in local mode
        (job scheduling + committer); pyarrow writes it in milliseconds. The
        files are plain parquet parts, so ``read`` sees them like any other.

        Pass ``filename`` (e.g. the batch id) to make the write idempotent:
        a reprocessed batch overwrites its own bookkeeping file instead of
        appending a duplicate row.
        """
        import time as _time

        import pyarrow as pa
        import pyarrow.parquet as pq

        _TYPES = {
            "string": pa.string(),
            "long": pa.int64(),
            "double": pa.float64(),
            "binary": pa.binary(),
            "date": pa.date32(),
            "timestamp": pa.timestamp("us", tz="UTC"),
        }
        fields = []
        for part in schema_ddl.split(","):
            col, typ = part.strip().rsplit(" ", 1)
            fields.append(pa.field(col, _TYPES[typ]))
        schema = pa.schema(fields)
        cols = list(zip(*rows)) if rows else [[] for _ in fields]
        tbl = pa.table({f.name: pa.array(list(c), f.type) for f, c in zip(schema, cols)})
        d = self.path(name)
        os.makedirs(d, exist_ok=True)
        tag = filename if filename is not None else f"{_time.time_ns():020d}"
        pq.write_table(tbl, os.path.join(d, f"part-{tag}.parquet"))

    def drop(self, name: str) -> None:
        p = self.path(name)
        if os.path.isdir(p):
            shutil.rmtree(p)

    # -- archived (read-only) batches ------------------------------------
    # One id per line in <root>/archived_batches; `archive` marks every
    # compacted batch, and _drop_batch refuses to touch marked batches
    # (the parquet-dir stand-in for the reference's readOnly header byte,
    # HeaderStorage.scala:242-275).

    def archived_batches(self) -> set[str]:
        p = os.path.join(self.root, "archived_batches")
        if not os.path.isfile(p):
            return set()
        with open(p) as f:
            return {line.strip() for line in f if line.strip()}

    def mark_archived(self, batch_ids, unmark: bool = False) -> set[str]:
        """Add (or remove) batch ids in the read-only set; atomic replace."""
        ids = self.archived_batches()
        ids = ids - set(batch_ids) if unmark else ids | set(batch_ids)
        p = os.path.join(self.root, "archived_batches")
        tmp = f"{p}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            f.write("".join(f"{i}\n" for i in sorted(ids)))
        os.replace(tmp, p)
        return ids
