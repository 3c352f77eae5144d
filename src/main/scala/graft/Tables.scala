package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. At real cluster
  * scale these would be multi-file partitioned datasets; `spark.read
  * .parquet` handles both shapes identically, and all downstream
  * operators are written against the schema, not the file layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    // default; read nanos as long and truncate to microseconds (the same
    // conversion DuckDB applies for its microsecond TIMESTAMP).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every corpus table as a temp view (catalog-of-views model,
    * mirroring the reference's dict-of-DataFrames workbook —
    * /root/reference/src/P6/loader.py:30).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
