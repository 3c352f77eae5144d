package graft.tools

import org.apache.spark.sql.functions._

/** Corpus-scale twin gate for the streaming containment shape
  * (StreamingSpec pins it on toy docs; this runs the REAL corpus):
  * split the sfDir documents table into a seed base (doc_id % 3 != 0)
  * and two increments, drive [[graft.streaming.EventStreams
  * .containmentIncrementBatch]] exactly as foreachBatch would, and
  * assert the accumulated pair log is BYTE-IDENTICAL (as an (a,b)
  * set, with na/inter checked through the count) to the batch
  * operator run once over the full corpus. Prints one JSON line for
  * BASELINE.md / scale records.
  *
  * Run: SPARK_GRAFT_SHUFFLE=32 sbt "runMain graft.tools.ContainmentStreamGate /root/testdata/sf0.1"
  */
object ContainmentStreamGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.ExecMode.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.EventStreams

    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 3 === 0)
    val inc0 = docs.filter(col("doc_id") % 3 === 1)
    val inc1 = docs.filter(col("doc_id") % 3 === 2)
    val root = java.nio.file.Files.createTempDirectory("graft_csg").toFile
    val store = new java.io.File(root, "store").getAbsolutePath

    val t0 = System.nanoTime()
    EventStreams.seedContainmentBase(base, "doc_id", "text", store)
    val tSeed = (System.nanoTime() - t0) / 1e9
    def batch(df: org.apache.spark.sql.DataFrame, id: Long): Double = {
      val b0 = System.nanoTime()
      EventStreams.containmentIncrementBatch(df, id, store,
        "doc_id", "text", 3, 5, graft.operators.Dedup.DefaultMaxPosting)
      (System.nanoTime() - b0) / 1e9
    }
    val tB0 = batch(inc0, 0L)
    val tB1 = batch(inc1, 1L)

    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      df.select(col("a"), col("b"), col("na"), col("inter")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = pairSet(EventStreams.containmentStorePairs(spark, store))
    val batchTwin = pairSet(
      graft.operators.Dedup.containmentPairs(docs, "doc_id", "text"))
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val equal = streamed == batchTwin
    println(s"""{"gate":"containment_stream_twin","sf":"$sfDir","streamed_pairs":${streamed.size},"batch_pairs":${batchTwin.size},"equal":$equal,"seed_sec":${String.format(java.util.Locale.ROOT, "%.1f", Double.box(tSeed))},"batch0_sec":${String.format(java.util.Locale.ROOT, "%.1f", Double.box(tB0))},"batch1_sec":${String.format(java.util.Locale.ROOT, "%.1f", Double.box(tB1))}}""")
    require(equal, s"streamed pair log diverged: streamed-only=${(streamed -- batchTwin).take(5)} batch-only=${(batchTwin -- streamed).take(5)}")
    spark.stop()
  }
}
