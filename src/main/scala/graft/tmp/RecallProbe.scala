package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.Tables

/** Throwaway probe for the round-9 oracle conversions. DELETE after use. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the fixed +/-1 hyperplane matrix for bits=6, table 0, dim 64
    val bits = 6
    (0 until bits).foreach { k =>
      val hk = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(k, org.apache.spark.sql.types.IntegerType, 42L)
      val row = (0 until 64).map { j =>
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(j, org.apache.spark.sql.types.IntegerType, hk)
        if (((h >>> 13) & 1L) == 1L) "1" else "-1"
      }
      println(s"SIGNS k=$k [${row.mkString(",")}]")
    }

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables(spark, dir, "embeddings")
      val prep = Similarity.prepared(emb, "vec_id", "embedding")
      val bmax = Similarity.lshBuckets(prep, bits = 6)
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).collect()(0).getLong(0)
      println(s"$sf emb_lsh_max_bucket=$bmax")
      val cur = graft.p6.Queries.all("emb_neardup")(spark, dir).collect()(0)
      println(s"$sf emb_neardup current: n_pairs=${cur.getLong(0)} max_cos=${cur.getDouble(1)}")

      val docs = Tables(spark, dir, "documents").filter(col("doc_id") < 2000)
      val sigs = Dedup.simhash(docs, "doc_id", "text")
      val banded = sigs.select(col("id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sig"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*))
          .as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val smax = banded.groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).collect()(0).getLong(0)
      println(s"$sf simhash_band_max_bucket=$smax (cap ${Dedup.DefaultMaxBucket})")
      val ndocs = Tables(spark, dir, "documents").count()
      println(s"$sf n_documents=$ndocs")
    }
    spark.stop()
  }
}
