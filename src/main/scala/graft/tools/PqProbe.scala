package graft.tools

import org.apache.spark.sql.functions._

/** Stage-split probe for the `ann_pq_topk` entry: times codebook
  * training, encoding, the ADC search, the exact contract side, and
  * the full entry separately (one JVM, shared warmup) so the wall can
  * be attributed before optimizing. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PqProbe"
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.ExecMode.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    import graft.operators.Similarity
    val e = graft.Tables(spark, sfDir, "embeddings")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PQPROBE $name%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def timedDf(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      timed(name) {
        df.write.format("noop").mode("overwrite").save()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    val prep = Similarity.prepared(e, "vec_id", "embedding")
    val n = timed("count")(prep.count())
    val cb = timed("codebooks")(
      Similarity.pqCodebooks(prep, m = 16, ksub = 64, iters = 2,
        knownCount = n))
    timedDf("encode")(Similarity.pqEncode(prep, cb))
    timedDf("encode2")(Similarity.pqEncode(prep, cb))
    val enc = Similarity.pqEncode(prep, cb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    enc.count()
    val r = math.max(100, (4.0 * math.sqrt(n.toDouble)).ceil.toInt)
    timedDf("search_warm")(Similarity.pqSearch(prep, enc, cb, 0L, 10, r))
    enc.unpersist(false)
    timedDf("exact_side") {
      val q = prep.filter(col("id") === 0L).select(col("v").as("qv"))
      prep.filter(col("id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("id"),
          round(Similarity.cosine(col("v"), col("qv")), 4).as("sim"))
        .orderBy(col("sim").desc, col("id"))
        .limit(10)
    }
    timedDf("full_entry")(graft.SparkEntry.queries("ann_pq_topk")(spark, sfDir))
    spark.stop()
  }
}
