package graft.enrich

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S6/S7: VariantValidator-style gene cross-reference enrichment
  * (ref: src/P6/vv_lookup.py:164-223).
  *
  * The reference calls the REST API per row with an lru_cache; on a
  * cluster that shape is a per-row network storm. The Spark-correct
  * shape (SURVEY.md §3.3): distinct gene set -> one lookup per gene via
  * mapPartitions (per-partition client + retry/backoff) -> broadcast
  * the tiny xref table back onto the fact side.
  *
  * OFF by default, mirroring P6_SKIP_VV (ref: src/P6/genotype.py:206) —
  * this container is zero-egress, so the transport is pluggable and
  * only exercised with fakes in tests. The retry policy matches the
  * reference: 4 attempts, 0.25 * 2^i seconds backoff.
  */
object VvEnrichment {

  final case class GeneXref(gene: String, hgncId: String, ensemblGeneId: String,
      refseqTranscripts: Seq[String], ensemblTranscripts: Seq[String])

  /** gene symbol -> xref, or Left(error). Implementations wrap HTTP. */
  type Transport = String => Either[String, GeneXref]

  final case class RetryPolicy(attempts: Int = 4, baseDelayMs: Long = 250,
      sleeper: Long => Unit = Thread.sleep)

  /** Exponential backoff wrapper (0.25 * 2^i s, ref: vv_lookup.py:58-83). */
  def withRetry(transport: Transport, policy: RetryPolicy = RetryPolicy()): Transport = {
    gene =>
      var last: Either[String, GeneXref] = Left("no attempts made")
      var i = 0
      var done = false
      while (!done && i < policy.attempts) {
        last = try transport(gene) catch { case e: Exception => Left(e.getMessage) }
        if (last.isRight) done = true
        else {
          i += 1
          if (i < policy.attempts) policy.sleeper(policy.baseDelayMs << (i - 1))
        }
      }
      last
  }

  private val xrefSchema = StructType(Seq(
    StructField("gene", StringType),
    StructField("hgnc_id", StringType),
    StructField("ensembl_gene_id", StringType),
    StructField("refseq_transcripts", ArrayType(StringType)),
    StructField("ensembl_transcripts", ArrayType(StringType)),
    StructField("vv_error", StringType)))

  /** Resolve xrefs for the DISTINCT genes of `records` and broadcast-join
    * them back. `geneCol` gains sibling columns hgnc_id /
    * ensembl_gene_id / refseq_transcripts / ensembl_transcripts /
    * vv_error (null when disabled or lookup failed).
    */
  def enrich(records: DataFrame, geneCol: String, transport: Transport,
      enabled: Boolean = sys.env.get("P6_SKIP_VV").forall(_ == "0"),
      policy: RetryPolicy = RetryPolicy()): DataFrame = {
    val spark = records.sparkSession
    if (!enabled) {
      return records
        .withColumn("hgnc_id", lit(null).cast("string"))
        .withColumn("ensembl_gene_id", lit(null).cast("string"))
        .withColumn("refseq_transcripts", lit(null).cast("array<string>"))
        .withColumn("ensembl_transcripts", lit(null).cast("array<string>"))
        .withColumn("vv_error", lit(null).cast("string"))
    }
    val genes = records.select(trim(col(geneCol)).as("gene"))
      .filter(length(col("gene")) > 0).distinct()
    val resolved = genes.rdd.mapPartitions { it =>
      // one client (+ its cache) per partition, like the per-partition
      // HTTP session a real transport would hold
      val call = withRetry(transport, policy)
      it.map { r =>
        val g = r.getString(0)
        call(g) match {
          case Right(x) => Row(g, x.hgncId, x.ensemblGeneId,
            x.refseqTranscripts, x.ensemblTranscripts, null)
          case Left(err) => Row(g, null, null, null, null, err)
        }
      }
    }
    val xrefs = spark.createDataFrame(resolved, xrefSchema)
    records.join(broadcast(xrefs), trim(col(geneCol)) === xrefs("gene"), "left")
      .drop("gene")
  }
}
