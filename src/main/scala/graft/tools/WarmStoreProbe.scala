package graft.tools

import org.apache.spark.sql.functions._

/** Component-level proof of the warm incremental-dedup store's value
  * at a given SF: times, back-to-back in ONE JVM (so box phase cancels
  * out), the exact work the warm path substitutes — the base corpus's
  * MinHash signature BUILD (what the cold entry pays every run)
  * versus the persisted store READ (what the warm entry pays instead)
  * — plus the banded-bucket explode off each, the stage whose
  * parallelism the round-15 multi-file store layout fixed. Three
  * alternating repetitions each; prints one JSON line of medians.
  *
  * Run: SPARK_GRAFT_SHUFFLE=128 sbt -mem 49152 \
  *   "runMain graft.tools.WarmStoreProbe target/scale/sf10"
  */
object WarmStoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.ExecMode.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.sources.WarmStore

    val docs = graft.Tables(spark, sfDir, "documents")
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val (sigDir, ready) = WarmStore.resolve(sfDir, "documents", "graft_base_sigs_")
    require(ready, s"warm store not built for $sfDir — run dedup_increment_warm once first")
    def noop(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def buckets(sigs: org.apache.spark.sql.DataFrame) =
      sigs.select(col("id"), explode(col("sig")).as("s")) // explode proxy for the band fan-out
    def build() = Dedup.minhashSignaturesFast(base, "doc_id", "text")
    def readStore() = spark.read.parquet(sigDir.toString)
    // JIT warm-up, unrecorded
    noop(build()); noop(readStore())
    val rs = (1 to 3).map { _ =>
      (noop(build()), noop(readStore()),
        noop(buckets(build())), noop(buckets(readStore())))
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val parts = readStore().rdd.getNumPartitions
    println(s"""{"metric":"warm_store_probe","sf":"$sfDir","sig_build_sec":${med(rs.map(_._1))},"store_read_sec":${med(rs.map(_._2))},"buckets_from_build_sec":${med(rs.map(_._3))},"buckets_from_store_sec":${med(rs.map(_._4))},"store_read_partitions":$parts}""")
    spark.stop()
  }
}
