package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SaveMode, SparkSession}

/** Mutable metadata catalog over immutable Parquet — the reference's SQLite
  * CRUD surface (SURVEY.md §2.11 D1-D7) as read→transform→overwrite with a
  * crash-safe directory swap.
  *
  * Spark tables are immutable, so each mutation writes a fresh directory and
  * atomically renames it over the old one (temp-dir swap; web_scheduler.py's
  * rename-copy-drop migration D3 uses the same shape at table level).
  * Single-writer discipline from the driver mirrors the reference's one
  * scheduler thread + SQLite write lock.
  *
  * Catalog tables are metadata-sized (thousands of rows), so full-rewrite
  * upserts are cheap; the 100 TB data path never goes through this store.
  * Append-only log tables use `append` mode instead of rewrite, so log
  * writes scale with the increment, not history size.
  */
final class CatalogStore(spark: SparkSession, root: String) {

  // Cross-PROCESS ownership (r9): the writer discipline below serializes
  // THREADS via in-JVM monitors, but two JVMs interleaving swap moves on
  // one root would corrupt it — the reference has the same constraint
  // (one Flask process per scheduler.db; SQLite enforces it with its own
  // file lock). Enforce it the same way: claim an OS file lock on the
  // root for this process's lifetime, FAIL LOUD if another process owns
  // it, and let the OS release the claim on (even abnormal) exit. A
  // second CatalogStore over the same root in THIS process is fine — the
  // claim is idempotent and the static per-root table locks already
  // serialize in-JVM writers. CrossProcessLockSpec pins the two-process
  // behavior with a forked JVM.
  if (!graft.core.Locks.tryOwnProcessWide(Paths.get(root, "_graft_owner.lock")))
    throw new IllegalStateException(
      s"catalog root '$root' is owned by another running graft process; " +
      "two processes must not write one catalog (reference parity: one " +
      "scheduler process per scheduler.db). Point this instance at its " +
      "own root, or stop the other process.")

  private def dir(table: String): Path = Paths.get(root, table)

  /** Per-table writer lock: appends (run-now handler threads), overwrites,
    * and compaction all serialize per table. Without it, an append landing
    * between compaction's two swap moves recreates the live dir and the
    * second ATOMIC_MOVE fails — stranding the whole history in `.bak`
    * until the next tmp/bak cleanup deletes it. Reentrant (synchronized),
    * so the compaction test seam's same-thread append still works. */
  private val canonicalRoot: String =
    Paths.get(root).toAbsolutePath.normalize.toString
  private def lockFor(table: String): Object =
    CatalogStore.tableLocks.computeIfAbsent(
      canonicalRoot + "\u0000" + table, _ => new Object)

  /** Crash recovery, called first on every entry path (under the table
    * lock for mutators). Two windows exist:
    *  - a JVM death between the swap's live→bak and tmp→live moves leaves
    *    no live dir but an intact `.bak` → restore it, else read() sees an
    *    empty table forever and the next cleanup deletes the history;
    *  - a death between a COMPACTION swap and its carry-over loop leaves
    *    live (compacted) + `.bak` holding straggler appends that landed
    *    after the snapshot. The compaction manifest (written before the
    *    swap, deleted after carry-over) records the snapshotted file set,
    *    so the stragglers are identifiable and swept into live instead of
    *    silently deleted with `.bak`. An overwrite's `.bak` (no manifest)
    *    is old displaced data and must NOT be resurrected. */
  private def recover(table: String): Unit = {
    val live = dir(table)
    val bak = Paths.get(root, table + ".bak")
    val manifest = manifestPath(table)
    if ((!Files.exists(live) && Files.exists(bak)) ||
        Files.exists(manifest)) lockFor(table).synchronized {
      if (!Files.exists(live) && Files.exists(bak))
        Files.move(bak, live, StandardCopyOption.ATOMIC_MOVE)
      if (Files.exists(manifest)) {
        if (Files.exists(bak)) {
          val snapshot = new String(Files.readAllBytes(manifest), "UTF-8")
            .split("\n").toSet
          parquetFiles(bak).diff(snapshot).foreach { f =>
            if (!Files.exists(live.resolve(f))) moveWithCrc(bak, live, f)
          }
          deleteRecursively(bak)
        }
        Files.delete(manifest)
      }
    }
  }

  private def manifestPath(table: String): Path =
    Paths.get(root, table + ".compact-manifest")

  def exists(table: String): Boolean = { recover(table); Files.exists(dir(table)) }

  /** Read a table as a typed Dataset; empty if never written. Reads are
    * NOT serialized against compaction (a Spark action executes after this
    * returns, outside any lock scope) — `ignoreMissingFiles` is set PER
    * READ here, so a catalog scan racing a compaction swap degrades to a
    * transient partial read instead of failing the request (the next read
    * sees the compacted table), while the engine's DATA path keeps strict
    * missing-file semantics: a pipeline over real tables must fail loudly
    * on incomplete input, never silently succeed on partial rows. */
  def read[T <: Product: TypeTag](table: String): Dataset[T] = {
    implicit val enc: Encoder[T] = Encoders.product[T]
    def build(): Dataset[T] =
      if (Files.exists(dir(table)))
        // both options scope the documented swap-race degradation (a
        // transient partial read) to CATALOG reads only: missing files
        // for data displaced after planning, corrupt/IOException for a
        // checksum sibling vanishing between list and open — neither is
        // surfaced as a 500, and the next read sees the settled table
        spark.read.option("ignoreMissingFiles", "true")
          .option("ignoreCorruptFiles", "true")
          .schema(enc.schema).parquet(dir(table).toString).as[T]
      else spark.emptyDataset[T]
    // Fast path is LOCK-FREE (a read must not tail-latency behind a
    // writer's multi-second Spark job — appends/upserts hold the table
    // lock across whole writes). The one hazard is the swap window:
    // during a compaction/overwrite swap the live dir is briefly ABSENT
    // between the two ATOMIC_MOVEs. That absence surfaces two ways and
    // BOTH retry once under the lock (which waits out the in-flight
    // swap): build() throwing path-not-found after its own existence
    // check passed, and — subtler — the fast path's Files.exists itself
    // returning false, which without the locked re-check would return a
    // silently EMPTY catalog for a table that has data (a wrong read, not
    // a failed one). Displaced files after return still degrade to a
    // transient partial read via ignoreMissingFiles as before.
    recover(table)
    quarantineTorn(table)
    try {
      if (!Files.exists(dir(table)))
        lockFor(table).synchronized { recover(table); build() }
      else build()
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        lockFor(table).synchronized { recover(table); build() }
    }
  }

  /** [[read]] sets ignoreCorruptFiles for the transient vanished-`.crc`
    * swap race — but that option would ALSO permanently and silently hide
    * a torn parquet file left by a crash mid-append (append is not
    * atomic), dropping its rows from every future read with no signal.
    * So each part file is structurally validated ONCE (parquet magic
    * `PAR1` at head and tail — a torn write can't have both) and a file
    * that fails is moved to `<table>.quarantine/` with a loud warning:
    * permanent corruption is surfaced and preserved for inspection, never
    * silently skipped forever. Validated names are memoized, so the
    * steady-state cost is one directory listing per read. */
  private val validatedParts =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.Set[String]]()
  private def quarantineTorn(table: String): Unit = {
    val d = dir(table)
    if (!Files.exists(d)) return
    val seen = validatedParts.computeIfAbsent(
      table, _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    parquetFiles(d).foreach { f =>
      if (!seen.contains(f)) {
        hasParquetMagic(d.resolve(f)) match {
          case Some(true) => seen.add(f)
          case Some(false) => // read SUCCEEDED and the magic is absent —
            // structurally torn for sure; only this case may quarantine
            val q = Paths.get(root, table + ".quarantine")
            Files.createDirectories(q)
            try {
              moveWithCrc(d, q, f)
              System.err.println(s"[graft] catalog table '$table': part file " +
                s"'$f' is structurally torn (missing parquet magic) — " +
                s"quarantined to $q for inspection")
            } catch { // concurrent reader quarantined it first — same outcome
              case _: java.nio.file.NoSuchFileException => ()
            }
          case None => () // could NOT read (fd pressure, permissions, a
            // concurrent move) — never quarantine on a failed check: a
            // transient IOException on a VALID committed file must not
            // permanently drop its rows. Not memoized; re-checked next read.
        }
      }
    }
  }

  /** Some(true)=valid, Some(false)=definitively torn (successful read,
    * magic absent), None=unreadable right now (verdict withheld). */
  private def hasParquetMagic(p: Path): Option[Boolean] = {
    val magic = "PAR1".getBytes("US-ASCII")
    var ch: java.nio.channels.SeekableByteChannel = null
    try {
      ch = Files.newByteChannel(p)
      if (ch.size < 8) return Some(false)
      def readAt(pos: Long): Array[Byte] = {
        val buf = java.nio.ByteBuffer.allocate(4)
        ch.position(pos)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        buf.array()
      }
      Some(java.util.Arrays.equals(readAt(0), magic) &&
           java.util.Arrays.equals(readAt(ch.size - 4), magic))
    } catch { case _: java.io.IOException => None }
    finally if (ch != null) ch.close()
  }

  /** Overwrite a table with a crash-safe swap: write to `<table>.tmp`, then
    * rename old → `.bak`, tmp → live, drop `.bak`. A crash leaves either the
    * old or the new directory intact, never a half-written live dir. */
  def overwrite[T](ds: Dataset[T], table: String): Unit = lockFor(table).synchronized {
    recover(table)
    val live = dir(table)
    val tmp = Paths.get(root, table + ".tmp")
    val bak = Paths.get(root, table + ".bak")
    deleteRecursively(tmp); deleteRecursively(bak)
    ds.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (Files.exists(live)) Files.move(live, bak, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(bak)
  }

  /** Append rows (log tables — task_logs / sql_alert_logs / notification_logs
    * are insert-only in the reference, S12). Serialized per table so an
    * append can never interleave with a compaction swap (its committer
    * renames into the directory being displaced). */
  def append[T](ds: Dataset[T], table: String): Unit = lockFor(table).synchronized {
    recover(table)
    ds.write.mode(SaveMode.Append).parquet(dir(table).toString)
  }

  /** Move a part file AND its hidden ChecksumFileSystem `.crc` sibling —
    * a straggler carried over without its checksum leaves a reader that
    * just listed the `.crc` opening a vanished file (NoSuchFileException,
    * which is NOT the FileNotFoundException ignoreMissingFiles covers). */
  private def moveWithCrc(from: Path, to: Path, f: String): Unit = {
    Files.move(from.resolve(f), to.resolve(f), StandardCopyOption.ATOMIC_MOVE)
    val crc = "." + f + ".crc"
    if (Files.exists(from.resolve(crc)))
      Files.move(from.resolve(crc), to.resolve(crc),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def parquetFiles(p: Path): Set[String] =
    if (!Files.exists(p)) Set.empty
    else {
      val s = Files.list(p)
      try s.filter(f => f.getFileName.toString.endsWith(".parquet"))
        .map[String](_.getFileName.toString).toArray.map(_.toString).toSet
      finally s.close()
    }

  /** Compact a fragmented log table: append mode writes ONE parquet file
    * per append, so a 1 s-tick daemon produces ~86k files/day and scan
    * cost grows with the file count, not the row count (the classic
    * small-files problem). When fragmentation exceeds `maxFiles`, rewrite
    * the SNAPSHOTTED file set into `numPartitions` files and swap.
    *
    * Concurrency: the expensive Spark rewrite runs OUTSIDE the table lock
    * (appends proceed during it — snapshot files are immutable, appends
    * only add files); only the swap + carry-over holds the lock, so an
    * append either completes before the swap (carried over via the
    * snapshot diff — part-file names are unique) or briefly waits and
    * lands in the new live dir. A FULL rewrite (overwrite/upsert/delete)
    * completing during the unlocked window invalidates the snapshot
    * entirely — the locked swap detects it (live no longer ⊇ snapshot)
    * and YIELDS the cycle rather than sweeping the racer's new state on
    * top of stale compacted rows. Crash-safety: the tmp/bak swap of
    * [[overwrite]] plus a manifest of the snapshotted file set written
    * before the swap — recover() uses it to sweep straggler appends out
    * of a `.bak` orphaned between the moves and the carry-over, instead
    * of the next cleanup silently deleting them. Returns true if a
    * compaction ran.
    *
    * `beforeSwap` is a test seam: CatalogStoreSpec injects appends there
    * (same-thread and cross-thread) to pin the carry-over path. */
  def compactIfFragmented[T <: Product: TypeTag](
      table: String, maxFiles: Int = 512, numPartitions: Int = 4,
      beforeSwap: () => Unit = () => ()): Boolean = {
    val live = dir(table)
    val ctmp = Paths.get(root, table + ".ctmp") // distinct from overwrite's .tmp
    val bak = Paths.get(root, table + ".bak")
    // snapshot + cleanup under a brief lock; the multi-second Spark
    // rewrite below runs UNLOCKED so appends stay concurrent with it
    // (snapshot files are immutable — append only adds files) and land in
    // live, to be carried over after the swap
    val snapshot = lockFor(table).synchronized {
      recover(table)
      // same torn-file pass read() runs: a crash mid-append leaves a part
      // file without parquet magic, and snapshotting it would make EVERY
      // compaction attempt of this table throw in the Spark rewrite below
      // until an unrelated read() happens to quarantine it — for a
      // rarely-read log table the small-files debt then grows unboundedly
      quarantineTorn(table)
      deleteRecursively(ctmp)
      // a `.bak` surviving recover() here can only be overwrite residue
      // (live exists, no manifest — a crash between overwrite's tmp→live
      // move and its bak cleanup). Clear it now: left in place, the swap's
      // live→bak ATOMIC_MOVE below would throw AFTER the manifest is
      // written, and the next recover() would sweep the STALE bak's files
      // (not in the snapshot) into live, silently resurrecting displaced
      // rows.
      deleteRecursively(bak)
      parquetFiles(live)
    }
    if (snapshot.size <= maxFiles) return false
    implicit val enc: Encoder[T] = Encoders.product[T]
    spark.read.schema(enc.schema)
      .parquet(snapshot.toSeq.map(f => live.resolve(f).toString): _*)
      .repartition(numPartitions)
      .write.mode(SaveMode.Overwrite).parquet(ctmp.toString)
    beforeSwap()
    // swap + carry-over under the lock: an append either completes before
    // the swap acquires the lock (carried over via the snapshot diff) or
    // waits and lands in the NEW live — never mid-swap. The manifest makes
    // the carry-over crash-recoverable: a death between the moves and the
    // diff loop leaves stragglers in .bak identifiable by recover().
    lockFor(table).synchronized {
      // same stale-overwrite-residue guard as the snapshot section: an
      // overwrite crashing during the unlocked rewrite above could leave
      // a fresh `.bak`; fail-safe is to clear it BEFORE the manifest
      // exists, so recover() can never mistake its files for stragglers
      deleteRecursively(bak)
      // YIELD if a FULL REWRITE (overwrite/upsert/delete) completed during
      // the unlocked Spark rewrite: its part files are all new names, so
      // the snapshot diff below would sweep the racer's ENTIRE new state on
      // top of the compacted OLD snapshot — resurrecting rows the racer
      // deleted and duplicating rows it kept. Only append deltas (live ⊇
      // snapshot still holds: appends never remove snapshot files) may
      // carry over; compaction of a stale snapshot must skip this cycle.
      if (!snapshot.subsetOf(parquetFiles(live))) {
        deleteRecursively(ctmp)
        return false
      }
      Files.write(manifestPath(table), snapshot.mkString("\n").getBytes("UTF-8"))
      Files.move(live, bak, StandardCopyOption.ATOMIC_MOVE)
      Files.move(ctmp, live, StandardCopyOption.ATOMIC_MOVE)
      parquetFiles(bak).diff(snapshot).foreach(f => moveWithCrc(bak, live, f))
      deleteRecursively(bak)
      Files.delete(manifestPath(table))
    }
    true
  }

  /** Row-level upsert by key: replaces rows whose key is present in `rows`,
    * keeps the rest (the reference's dynamic partial-UPDATE builders D7,
    * web_scheduler.py:2216-2271, as read-modify-overwrite). */
  def upsert[T <: Product: TypeTag](table: String, rows: Seq[T], key: T => Long): Unit =
    lockFor(table).synchronized { // atomic read-modify-write (lock is reentrant)
      val existing = read[T](table).collect().toSeq
      val keys = rows.map(key).toSet
      val merged = existing.filterNot(r => keys.contains(key(r))) ++ rows
      implicit val enc: Encoder[T] = Encoders.product[T]
      overwrite(spark.createDataset(merged), table)
    }

  /** Read-modify-write of the rows matching `pred` under the table lock:
    * re-reads the CURRENT rows and applies `f` to them, so a caller that
    * only wants to stamp one field (run-now's lastRun, the scheduler's
    * next_run advance) cannot revert a concurrent admin edit by upserting
    * a stale pre-execution snapshot — the lost-update the plain
    * read-early-then-upsert shape had. Returns the matched count. */
  def updateRows[T <: Product: TypeTag](table: String, pred: T => Boolean,
                                        f: T => T): Int =
    lockFor(table).synchronized {
      val existing = read[T](table).collect().toSeq
      val updated = existing.map(r => if (pred(r)) f(r) else r)
      implicit val enc: Encoder[T] = Encoders.product[T]
      overwrite(spark.createDataset(updated), table)
      existing.count(pred)
    }

  /** Delete rows by key predicate (FK-guard checks live in callers,
    * web_scheduler.py:3920-3938). */
  def delete[T <: Product: TypeTag](table: String, pred: T => Boolean): Long =
    lockFor(table).synchronized {
      val existing = read[T](table).collect()
      val keep = existing.filterNot(pred)
      implicit val enc: Encoder[T] = Encoders.product[T]
      overwrite(spark.createDataset(keep.toSeq), table)
      (existing.length - keep.length).toLong
    }

  private def deleteRecursively(p: Path): Unit =
    graft.core.Fs.deleteRecursively(p)
}

object CatalogStore {
  /** Writer locks keyed by canonical root + table, shared across ALL store
    * instances in this JVM — two instances over the same root serialize
    * against each other (previously each instance had its own lock map and
    * the interleaved-swap failure the lock prevents returned in that
    * configuration). The manifest/recover protocol is file-based but the
    * locks are not: CROSS-PROCESS writers over one root are NOT supported —
    * mirror of the reference's one-scheduler-process + SQLite write lock
    * assumption. */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
}
