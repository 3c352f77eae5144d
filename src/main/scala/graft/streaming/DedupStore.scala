package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Liveness + compaction for the persisted streaming-dedup store
  * ([[EventStreams.streamingDedupIncrement]]'s `storeDir`).
  *
  * Why: continuous ingestion appends one `docs/batch=bN` +
  * `sigs/batch=bN` parquet dir per micro-batch forever; at 100 TB
  * micro-batching that is thousands of small-file partitions on the
  * LSH join's build side (the r13 VERDICT's named unbounded term).
  * Compaction folds every committed batch partition up to a watermark
  * into ONE consolidated `base-g<gen>` partition, after which the
  * store read is a handful of dirs again.
  *
  * Crash-safety protocol (no transactional FS assumed — works on
  * local FS, HDFS, and object stores with directory semantics):
  *
  *   - A consolidated partition `batch=base-g<g>` (or a minor
  *     `batch=delta-g<g>`) is VISIBLE to readers only once
  *     `manifest-g<g>.txt` exists: readers compute maxGen = max
  *     published manifest generation and treat `base-g<k>` /
  *     `delta-g<k>` with k > maxGen as not-yet-published (a compaction
  *     that crashed after writing data but before its manifest leaves
  *     the store exactly as it was).
  *   - The manifest is immutable and versioned (`manifest-g<g>.txt`,
  *     line 1 = generation, remaining lines = TOMBSTONED partition
  *     names); readers take the highest generation's tombstone set.
  *     Publication is write-tmp + rename — and if the rename loses to
  *     an identical earlier attempt, the content was deterministic,
  *     so the loser just deletes its tmp.
  *   - Source partitions are deleted only AFTER the manifest commits,
  *     and deletion is best-effort: a tombstoned-but-undeleted dir is
  *     ignored by every reader and swept by the next compaction.
  *
  * Re-running `compact(upTo)` at any point is therefore idempotent:
  * before the manifest commit it rewrites the same deterministic
  * `base-g<g>` dirs; after, it no-ops (generation already published).
  *
  * Watermark contract: `upToBatchId` must not exceed the stream's
  * last COMMITTED micro-batch ([[lastCommittedBatch]] reads it from
  * the checkpoint) — an uncommitted batch can replay after a restart,
  * and a replay overwrites its own `batch=bN` dirs assuming the store
  * still holds them; folding it into base first would double its docs
  * and self-dedup the replay to nothing.
  */
object DedupStore {

  private val ManifestRe = "manifest-g(\\d+)\\.txt".r
  private val BaseGenRe = "base-g(\\d+)".r
  private val DeltaGenRe = "delta-g(\\d+)".r
  private val BatchRe = "b(\\d+)".r

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (maxGen, tombstoned partition names) from the highest published
    * manifest; (-1, empty) for a store that has never compacted.
    */
  private[graft] def manifest(spark: SparkSession, storeDir: String): (Long, Set[String]) = {
    val f = fs(spark, storeDir)
    val root = new Path(storeDir)
    if (!f.exists(root)) return (-1L, Set.empty)
    val gens = f.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case ManifestRe(g) => Some(g.toLong)
        case _ => None
      }
    }
    if (gens.isEmpty) return (-1L, Set.empty)
    val g = gens.max
    val in = f.open(new Path(root, s"manifest-g$g.txt"))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    (g, lines.drop(1).map(_.trim).filter(_.nonEmpty).toSet)
  }

  /** Partition names physically present under `storeDir/<sub>`. */
  private def physicalParts(spark: SparkSession, storeDir: String,
      sub: String = "docs"): Seq[String] = {
    val f = fs(spark, storeDir)
    val docs = new Path(s"$storeDir/$sub")
    if (!f.exists(docs)) Seq.empty
    else f.listStatus(docs).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch="))
  }

  /** The partitions a reader may see: physical, not tombstoned, and
    * consolidated partitions only up to the published generation.
    */
  private[graft] def liveParts(spark: SparkSession, storeDir: String): Seq[String] = {
    val (maxGen, dead) = manifest(spark, storeDir)
    physicalParts(spark, storeDir).filter {
      case p if dead(p) => false
      case BaseGenRe(g) => g.toLong <= maxGen
      case DeltaGenRe(g) => g.toLong <= maxGen
      case _ => true
    }
  }

  /** `storeDir/docs` (or sigs) restricted to live partitions — the
    * read every store consumer must use once compaction exists.
    * Partition pruning keeps tombstoned dirs zero-IO.
    */
  private[graft] def readLive(spark: SparkSession, storeDir: String,
      sub: String): DataFrame = {
    val live = liveParts(spark, storeDir)
    spark.read.parquet(s"$storeDir/$sub")
      .filter(col("batch").isin(live: _*))
  }

  /** Highest micro-batch id the checkpoint has COMMITTED — the safe
    * compaction watermark. None before the first commit.
    */
  def lastCommittedBatch(spark: SparkSession, checkpointDir: String): Option[Long] = {
    val f = fs(spark, checkpointDir)
    val commits = new Path(s"$checkpointDir/commits")
    if (!f.exists(commits)) None
    else f.listStatus(commits).toSeq
      .flatMap(st => st.getPath.getName.toLongOption).maxOption
  }

  /** Fold live store partitions up to the watermark; publish; then
    * sweep the sources. No-op when the published generation already
    * covers upToBatchId or there is nothing to fold. See the object
    * doc for the crash-safety protocol and the watermark contract.
    *
    * Two modes, the minor/major split of any LSM-shaped store:
    *   - `foldBase = true` (MAJOR, default): base + every prior
    *     generation + batches <= watermark -> `base-g<upTo>`. One
    *     consolidated partition, but the rewrite is O(store) — at
    *     continuous-ingestion scale this must be RARE.
    *   - `foldBase = false` (MINOR): ONLY `batch=bN` partitions
    *     <= watermark -> `delta-g<upTo>`. Per-compaction IO is
    *     O(new data since the last compaction), independent of store
    *     size; deltas accumulate until the next major fold. This is
    *     the steady-state cadence for 100 TB ingestion: minor often,
    *     major rarely, read side bounded by #deltas + 1 instead of
    *     #micro-batches.
    * Both publish through the same versioned manifest, so generation
    * gating and crash windows are identical.
    */
  def compact(spark: SparkSession, storeDir: String, upToBatchId: Long,
      foldBase: Boolean = true,
      subs: Seq[String] = Seq("docs", "sigs"),
      rewrite: Map[String, (String, DataFrame) => DataFrame] = Map.empty): Unit = {
    val (maxGen, dead) = manifest(spark, storeDir)
    if (upToBatchId <= maxGen) return
    val phys = physicalParts(spark, storeDir)
    val live = phys.filter {
      case p if dead(p) => false
      case BaseGenRe(g) => g.toLong <= maxGen
      case DeltaGenRe(g) => g.toLong <= maxGen
      case _ => true
    }
    val toFold = live.filter {
      case "base" => foldBase
      case BaseGenRe(_) => foldBase
      case DeltaGenRe(_) => foldBase
      case BatchRe(n) => n.toLong <= upToBatchId
      case _ => false
    }
    // Nothing to consolidate: a lone already-consolidated base (or an
    // empty store) gains nothing from a rewrite; skip WITHOUT
    // publishing a generation so the cheap no-op stays a no-op.
    if (toFold.size <= 1) return
    val gen = if (foldBase) s"base-g$upToBatchId" else s"delta-g$upToBatchId"
    // ORPHAN SWEEP: a compaction that crashed after writing its data
    // dir but before publishing left an UNPUBLISHED `base-g<k>` /
    // `delta-g<k>` with k > maxGen. Today it is invisible (g > maxGen)
    // — but the manifest THIS call is about to publish raises maxGen,
    // and any orphan with k <= upToBatchId would flip to LIVE and
    // duplicate every doc it holds (or expose a partial write). Such
    // dirs are unpublished by definition, so tombstoning + deleting
    // them is safe — but ONLY within the range THIS publish can
    // activate (maxGen < g <= upToBatchId): a racing compactor in
    // another JVM (the scenario WarmStore.publish designs for) may
    // have written a HIGHER generation it hasn't published yet, and
    // sweeping g > upToBatchId would delete its data out from under
    // it. Higher gens can't flip live off this manifest; if truly
    // orphaned they fall into a later publish's sweep range. `gen`
    // itself is excluded: that is the dir we are (re)writing.
    val orphans = subs.flatMap(physicalParts(spark, storeDir, _)).distinct.filter {
      case p if p == gen => false
      case BaseGenRe(g) => g.toLong > maxGen && g.toLong <= upToBatchId
      case DeltaGenRe(g) => g.toLong > maxGen && g.toLong <= upToBatchId
      case _ => false
    }
    for (sub <- subs) {
      // a sub may lack some partitions (e.g. a pairs log with no seed
      // entry): fold whatever of toFold exists there. A `rewrite`
      // entry receives (generation name, the sub's folded rows) and
      // replaces those rows for the new generation (e.g. a re-ranked
      // containment prefix, or a distinct over folded bookkeeping —
      // see EventStreams.containmentCompact); the rewriter may also
      // read sibling subs' ALREADY-FOLDED `batch=<gen>` dirs, so subs
      // are processed in the caller's order. Rewriters must be
      // deterministic given the folded inputs: the rename-races-safe
      // publish below relies on identical content across retries.
      val f0 = fs(spark, storeDir)
      if (f0.exists(new Path(s"$storeDir/$sub"))) {
        val folded = spark.read.parquet(s"$storeDir/$sub")
          .filter(col("batch").isin(toFold: _*))
          .drop("batch")
        rewrite.get(sub).map(_(gen, folded)).getOrElse(folded)
          .write.mode("overwrite").parquet(s"$storeDir/$sub/batch=$gen")
      }
    }
    // Publish: the manifest names the consumed partitions (previous
    // tombstones ride along so a single read of the latest manifest
    // suffices), via tmp + rename. Ride-along tombstones are PRUNED to
    // names still physically present on either side: a fully swept dir
    // is invisible without a tombstone, and keeping its name forever
    // (a) grows the set without bound and (b) silently blanks a future
    // `batch=bN` written by a fresh-checkpoint restart that reuses the
    // id (see the guard in EventStreams.dedupIncrementBatch).
    val f = fs(spark, storeDir)
    val present = subs.flatMap(physicalParts(spark, storeDir, _)).toSet
    val tombstones = (dead.filter(present) ++ toFold ++ orphans).toSeq.sorted
    val tmp = new Path(storeDir, s".manifest-g$upToBatchId.tmp")
    val dst = new Path(storeDir, s"manifest-g$upToBatchId.txt")
    val out = f.create(tmp, true)
    try out.write((upToBatchId.toString +: tombstones)
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, dst)) {
      // lost to an identical earlier attempt — deterministic content,
      // so the publication already happened
      f.delete(tmp, false); ()
    }
    // Sweep (best-effort: tombstoned dirs are invisible regardless)
    for (sub <- subs; p <- toFold ++ orphans)
      try { f.delete(new Path(s"$storeDir/$sub/batch=$p"), true); () }
      catch { case _: java.io.IOException => () }
  }
}
