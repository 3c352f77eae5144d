package graft.tools

import org.apache.spark.sql.functions._

/** Scratch decomposition of one containmentIncrementBatch at a given
  * base size: forces each internal stage with a noop sink and prints
  * rough per-stage seconds, so optimization effort goes where the
  * time is. Measurement-only; stages overlap in the real fused plan,
  * so the parts legitimately sum to more than the whole.
  *
  * Run: SPARK_GRAFT_SHUFFLE=64 sbt "runMain graft.tools.ContainmentBatchProbe /root/repo/target/scale/sf1 10 2000"
  */
object ContainmentBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scale/sf1")
    val reps = if (args.length > 1) args(1).toInt else 10
    val batchDocs = if (args.length > 2) args(2).toInt else 2000
    val spark = graft.ExecMode.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.streaming.{DedupStore, EventStreams}

    val docs0 = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val base = if (reps <= 1) docs0
      else (0 until reps).map(r => docs0.select(
        (col("doc_id") + r.toLong * 100000000L).as("doc_id"),
        col("text"))).reduce(_.unionByName(_))
    val root = java.nio.file.Files.createTempDirectory("graft_cbp").toFile
    val store = new java.io.File(root, "store").getAbsolutePath
    EventStreams.seedContainmentBase(base, "doc_id", "text", store,
      minePairs = false)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val batch = spark.range(batchDocs).select(
      (col("id") + 2000000000L).as("doc_id"),
      concat(lit("novel probe doc "), col("id"),
        lit(" alpha beta gamma delta epsilon")).as("text"))

    // warm-up: one full real batch (JIT + page cache), then decompose
    EventStreams.containmentIncrementBatch(batch, 1000L, store,
      "doc_id", "text", 3, 5, Dedup.DefaultMaxPosting)

    val MAD = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val newSh = Dedup.containmentShingles(batch, "doc_id", "text", 3, 5)
      .persist(MAD)
    val storeSh = DedupStore.readLive(spark, store, "docs")
      .filter(col("batch") =!= "b1001").select(col("doc_id"), col("sh"))
    val postsNew = newSh.select(col("doc_id"), size(col("sh")).as("nsh"),
      explode(col("sh")).as("g"))
    val newG = postsNew.select(col("g")).distinct()
    timed("newSh+newG") { noop(newG) }
    val postsStore = DedupStore.readLive(spark, store, "postings")
      .filter(col("batch") =!= "b1001")
      .select(col("doc_id"), col("nsh"), col("g"))
      .join(broadcast(newG), Seq("g"), "left_semi")
      .persist(MAD)
    timed("postsStore scan+prune") { noop(postsStore) }
    val aggAll = postsStore.unionByName(postsNew)
      .groupBy(col("g")).agg(count(lit(1)).as("df"),
        min(struct(col("doc_id"), col("nsh"))).as("rep"))
      .persist(MAD)
    timed("aggAll") { noop(aggAll) }
    val storePrefix = DedupStore.readLive(spark, store, "prefix")
      .filter(col("batch") =!= "b1001")
      .select(col("a"), col("nsha"), col("g"))
      .join(broadcast(newG), Seq("g"), "left_semi")
      .persist(MAD)
    timed("storePrefix scan+prune") { noop(storePrefix) }
    val prefixNew = Dedup.containmentPrefixRows(newSh,
      aggAll.select(col("g"), col("df"))).persist(MAD)
    timed("prefixNew") { noop(prefixNew) }
    val hotTab = aggAll.filter(col("df") > Dedup.DefaultMaxPosting)
    val cand = EventStreams.containmentCandidates(
      newSh, storePrefix, prefixNew, postsStore, hotTab).persist(MAD)
    timed("candidates") { noop(cand) }
    timed("verify (corpus-pruned)") {
      noop(EventStreams.containmentVerify(
        storeSh.unionByName(newSh), cand, pruneCorpus = true))
    }
    timed("verify (unpruned legacy)") {
      noop(EventStreams.containmentVerify(
        storeSh.unionByName(newSh), cand, pruneCorpus = false))
    }
    timed("full real batch") {
      EventStreams.containmentIncrementBatch(batch, 1001L, store,
        "doc_id", "text", 3, 5, Dedup.DefaultMaxPosting)
    }
    spark.stop()
  }
}
