package graft.tools

import org.apache.spark.sql.functions._

/** Measure the minor-vs-major compaction cost split on a realistic
  * store shape: a LARGE seeded base (the sfDir documents corpus) plus
  * a handful of SMALL committed micro-batch partitions — the
  * steady-state layout of continuous ingestion. Times
  * `DedupStore.compact(foldBase=false)` (fold only the batches into a
  * delta) against `compact(foldBase=true)` (full rewrite including
  * the base) on twin stores, and prints the store doc counts so the
  * O(new data) vs O(store) claim is a measured ratio, not prose.
  *
  * Run: sbt "runMain graft.tools.CompactionBench [sfDir] [batches] [batchDocs]"
  */
object CompactionBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 8
    val batchDocs = if (args.length > 2) args(2).toInt else 200
    val spark = graft.ExecMode.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val baseN = docs.count()
    val root = java.nio.file.Files.createTempDirectory("graft_cbench").toFile

    def build(name: String): String = {
      val store = new java.io.File(root, name).getAbsolutePath
      graft.streaming.EventStreams.seedDedupBase(
        docs, "doc_id", "text", store)
      // committed micro-batch partitions, written in the store's own
      // format (novel synthetic docs — content is irrelevant to the
      // compaction cost being measured)
      (0 until nBatches).foreach { b =>
        val rows = spark.range(batchDocs).select(
          (col("id") + 10000000L * (b + 1)).as("doc_id"),
          concat(lit(s"novel batch $b doc "), col("id"),
            lit(" alpha beta gamma delta epsilon")).as("text"))
        rows.write.mode("overwrite").parquet(s"$store/docs/batch=b$b")
        graft.operators.Dedup
          .minhashSignaturesFast(rows, "doc_id", "text", 3, 32)
          .write.mode("overwrite").parquet(s"$store/sigs/batch=b$b")
      }
      store
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val minorStore = build("minor")
    val majorStore = build("major")
    val up = (nBatches - 1).toLong
    val tMinor = timed(graft.streaming.DedupStore
      .compact(spark, minorStore, up, foldBase = false))
    val tMajor = timed(graft.streaming.DedupStore
      .compact(spark, majorStore, up, foldBase = true))
    val newDocs = nBatches.toLong * batchDocs
    println(s"""{"metric":"compaction","base_docs":$baseN,"new_docs":$newDocs,"minor_sec":$tMinor,"major_sec":$tMajor,"ratio":${tMajor / tMinor}}""")
    spark.stop()
  }
}
