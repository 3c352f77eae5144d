package graft.tools

import org.apache.spark.sql.functions._

/** Stage-split probe for the `ann_ivf_batch_topk` entry (VERDICT r11
  * task 8): times, in one JVM with the shared warmup,
  *   (1) the brute-force EXACT contract side alone,
  *   (2) the IVF operator side alone (k-means refineIters=2 + probe),
  *   (3) the full entry (exact + ann + recall summary),
  * so the sf10 wall can be attributed between the operator and the
  * recall scaffold. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.AnnProbe"
  */
object AnnProbe {
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
    def qids = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"))
    def timed(name: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"ANNPROBE $name%-12s $s%.3f s")
      s
    }
    timed("brute")(Similarity.bruteTopKBatch(e, "vec_id", "embedding", qids, k = 10))
    timed("ivf")(Similarity.ivfTopKBatch(e, "vec_id", "embedding", qids,
      k = 10, nlist = 32, nprobe = 8, refineIters = 2))
    timed("ivf_refine0")(Similarity.ivfTopKBatch(e, "vec_id", "embedding", qids,
      k = 10, nlist = 32, nprobe = 8, refineIters = 0))
    timed("full")(graft.SparkEntry.queries("ann_ivf_batch_topk")(spark, sfDir))
    spark.stop()
  }
}
