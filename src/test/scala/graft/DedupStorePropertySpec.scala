package graft

import org.apache.spark.sql.functions._
import graft.streaming.DedupStore

/** Randomized-interleaving property test for the DedupStore manifest
  * protocol: any sequence of {append batch, minor compact, major
  * compact, simulated crashed-compaction write} must preserve the doc
  * set EXACTLY (nothing lost, nothing duplicated), keep the sigs side
  * in lockstep, and never surface an unpublished generation. The
  * named crash windows are pinned one-by-one in StreamingSpec; this
  * sweeps the interleavings nobody thought to name.
  */
class DedupStorePropertySpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long) =
    (id, s"doc $id alpha beta gamma delta epsilon zeta id$id")

  test("manifest protocol: random op interleavings preserve the doc set, dedupe nothing, leak nothing") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_dsprop_$seed").toFile
      val store = new java.io.File(root, "store").getAbsolutePath

      // seed base
      var nextId = 100L
      var added = Set(1L)
      graft.streaming.EventStreams.seedDedupBase(
        Seq(doc(1L)).toDF("doc_id", "text"), "doc_id", "text", store)

      var nextBatch = 0L
      var maxCommitted = -1L
      val nOps = 8 + rnd.nextInt(5)
      val log = new StringBuilder(s"seed=$seed:")
      (0 until nOps).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 | 1 => // append a committed micro-batch (docs + sigs)
            val ids = (0 to rnd.nextInt(2)).map(_ => { nextId += 1; nextId })
            val rows = ids.map(doc).toDF("doc_id", "text")
            rows.write.mode("overwrite")
              .parquet(s"$store/docs/batch=b$nextBatch")
            graft.operators.Dedup
              .minhashSignaturesFast(rows, "doc_id", "text", 3, 32)
              .write.mode("overwrite")
              .parquet(s"$store/sigs/batch=b$nextBatch")
            added ++= ids
            maxCommitted = nextBatch
            log ++= s" b$nextBatch(${ids.size})"
            nextBatch += 1
          case 2 => // compact up to a random committed watermark
            if (maxCommitted >= 0) {
              val upTo = rnd.nextInt(maxCommitted.toInt + 1).toLong
              val major = rnd.nextBoolean()
              DedupStore.compact(spark, store, upTo, foldBase = major)
              log ++= s" ${if (major) "major" else "minor"}($upTo)"
            }
          case 3 => // crashed compaction: data written, manifest never
            // published. Planted in the ACTIVATABLE range
            // (maxGen, maxCommitted] when it exists — a later publish
            // with m >= ghostGen used to flip these LIVE (the r14
            // ADVICE hole; the orphan sweep now tombstones them at the
            // next publish) — else far-future (stays unpublished).
            val (mg, _) = DedupStore.manifest(spark, store)
            val ghostGen =
              if (maxCommitted > mg) mg + 1 + rnd.nextInt((maxCommitted - mg).toInt)
              else 1000L + rnd.nextInt(100)
            val kind = if (rnd.nextBoolean()) "base-g" else "delta-g"
            Seq(doc(99999L)).toDF("doc_id", "text").write
              .mode("overwrite")
              .parquet(s"$store/docs/batch=$kind$ghostGen")
            if (rnd.nextBoolean()) // crash can land between the two writes
              graft.operators.Dedup.minhashSignaturesFast(
                  Seq(doc(99999L)).toDF("doc_id", "text"), "doc_id", "text", 3, 32)
                .write.mode("overwrite")
                .parquet(s"$store/sigs/batch=$kind$ghostGen")
            log ++= s" crash($kind$ghostGen)"
        }
        // invariants after EVERY op
        val docs = graft.streaming.EventStreams
          .dedupStoreDocs(spark, store).select(col("doc_id"))
          .collect().map(_.getLong(0))
        assert(docs.toSet == added,
          s"${log} -> doc set diverged: got ${docs.toSet}, want $added")
        assert(docs.length == added.size,
          s"${log} -> duplicated docs after compaction: ${docs.length} rows for ${added.size} ids")
        val sigIds = DedupStore.readLive(spark, store, "sigs")
          .select(col("id")).collect().map(_.getLong(0))
        assert(sigIds.toSet == added && sigIds.length == added.size,
          s"${log} -> sigs diverged from docs: ${sigIds.length} rows, ids ${sigIds.toSet}")
      }
    }
  }
}
