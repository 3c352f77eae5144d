package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.p6._

/** S4 sink layouts and the SQL-view API surface. */
class SinksAndSqlSpec extends SparkSpec {
  import spark.implicits._

  private def onePatientBundles = {
    val geno = Seq(
      ("P100", "u@e.co", "1", "16", "1", "1", "A", "G", "G1",
        "16:g.1A>G", "NM_1:c.1A>G", "p.X", "het", "inherited"),
      ("P200", "u@e.co", "1", "16", "2", "2", "A", "G", "G1",
        "16:g.2A>G", "NM_1:c.2A>G", "p.X", "hom", "denovo"))
      .toDF("genotype_patient_ID", "contact_email", "phasing", "chromosome",
        "start_position", "end_position", "reference", "alternate",
        "gene_symbol", "hgvsg", "hgvsc", "hgvsp", "zygosity", "inheritance")
    val g = Mappers.mapGenotypeTable(geno)
    Assemble.groupByPatient(g.records,
      spark.emptyDataset[PhenotypeRecord].toDF(),
      spark.emptyDataset[DiseaseRecord].toDF(),
      spark.emptyDataset[MeasurementRecord].toDF(),
      spark.emptyDataset[BiosampleRecord].toDF())
  }

  test("S4 numbered sink: 1.json..N.json in patient order") {
    val dir = Files.createTempDirectory("sink").toString
    val n = Assemble.writeNumberedJson(Assemble.phenopackets(onePatientBundles), dir)
    assert(n == 2)
    val one = Files.readString(java.nio.file.Paths.get(dir, "1.json"))
    val two = Files.readString(java.nio.file.Paths.get(dir, "2.json"))
    assert(one.contains("\"id\":\"P100\"") && two.contains("\"id\":\"P200\""))
  }

  test("S4 numbered sink fails fast above the cap, naming the knob and the scale path") {
    val dir = Files.createTempDirectory("sinkcap").toString
    val packets = Assemble.phenopackets(onePatientBundles)
    val prev = sys.props.put("graft.maxNumberedFiles", "1")
    try {
      val e = intercept[IllegalArgumentException] {
        Assemble.writeNumberedJson(packets, dir)
      }
      assert(e.getMessage.contains("graft.maxNumberedFiles"))
      assert(e.getMessage.contains("writePartitioned"))
      // nothing was collected or written
      assert(new java.io.File(dir).listFiles().isEmpty)
    } finally prev match {
      case Some(v) => sys.props.put("graft.maxNumberedFiles", v)
      case None => sys.props.remove("graft.maxNumberedFiles")
    }
    // back under the cap, the sink works unchanged
    assert(Assemble.writeNumberedJson(packets, dir) == 2)
  }

  test("S4 partitioned sink: patient_id=... directory layout (the at-scale shape)") {
    val dir = Files.createTempDirectory("sinkp").toString + "/out"
    Assemble.writePartitioned(Assemble.phenopackets(onePatientBundles), dir)
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(subdirs == Set("patient_id=P100", "patient_id=P200"))
    val read = spark.read.text(dir + "/patient_id=P100").collect()
    assert(read.length == 1 && read(0).getString(0).contains("GENO:0000135"))
  }

  test("shard writer: partitionBy(shard_id) preserves the prefix-scan layout end-to-end") {
    import graft.operators.Dedup
    import graft.sources.ShardLayout
    val out = Files.createTempDirectory("shards").toString + "/corpus"
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), size(Dedup.tokens(col("text"))).cast("long").as("ntoks"))
    val target = 512L
    val assigned = ShardLayout.write(docs, Seq(col("doc_id")), col("ntoks"), target, out)

    // the whole assign+write pipeline contains exactly ONE exchange —
    // the range partitioning the prefix scan needs; partitionBy added none
    val plan = assigned.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"extra exchange in:\n$plan")

    // read-back: nothing lost, shards are contiguous curriculum runs,
    // budgets loader-even within the documented (heaviest row) bound
    val back = ShardLayout.read(spark, out)
    assert(back.count() == docs.count())
    val shards = back.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n"), sum(col("ntoks")).as("toks"),
        min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .orderBy(col("shard_id")).collect()
    assert(shards.length > 3, s"want a multi-shard layout, got ${shards.length}")
    shards.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) < b.getLong(3), // hi(k) < lo(k+1)
        s"shards ${a.get(0)} and ${b.get(0)} interleave")
    }
    val wMax = docs.agg(max(col("ntoks"))).head.getLong(0)
    shards.dropRight(1).foreach { r =>
      val toks = r.getLong(2)
      assert(toks > target - wMax && toks < target + wMax,
        s"shard ${r.get(0)} holds $toks tokens (target $target, wMax $wMax)")
    }

    // layout proof: contiguous runs mean a shard's directory gets files
    // from the task(s) whose range covers it — a handful, never one per
    // task, which is what a shuffle-scrambled write would produce
    val filesPerShard = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
      .map(_.listFiles().count(f => f.getName.endsWith(".parquet")))
    assert(filesPerShard.nonEmpty && filesPerShard.max <= 3,
      s"shard smeared over ${filesPerShard.max} files")

    // partition pruning: a single-shard read touches one directory
    val one = ShardLayout.read(spark, out).filter(col("shard_id") === 1)
    val scanned = one.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString
    assert(one.count() == shards(1).getLong(1))
    assert(scanned.contains("PartitionFilters: [isnotnull(shard_id"),
      s"shard filter not pushed to partition pruning:\n$scanned")
  }

  test("shard writer degenerate input: an empty corpus writes a readable empty layout") {
    import graft.sources.ShardLayout
    val out = Files.createTempDirectory("shards0").toString + "/out"
    val empty = spark.range(0).select(col("id"), lit(1L).as("w"))
    ShardLayout.write(empty, Seq(col("id")), col("w"), 10L, out)
    val back = ShardLayout.read(spark, out)
    assert(back.count() == 0)
    assert(back.columns.contains("shard_id"))
  }

  test("catalog-of-views: registerAll exposes the corpus to plain SQL") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT n_name, count(*) AS n FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC LIMIT 3""").collect()
    assert(n.length == 3 && n(0).getLong(1) > 0)
    assert(spark.sql("SELECT count(*) FROM documents").collect()(0).getLong(0) > 0)
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark drops replays") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = stream.toDF().toDF("id", "ts", "payload")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def ts(m: Long) = new java.sql.Timestamp(m * 60000L)
    stream.addData((1L, ts(0), "a"), (2L, ts(1), "b"), (1L, ts(2), "a-replay"))
    q.processAllAvailable()
    stream.addData((1L, ts(3), "a-replay-2"), (3L, ts(4), "c"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }
}
