package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleUp

/** Pins the invariants `ScaleUp` (the 10x scale-run corpus generator)
  * promises in its scaladoc — the sf1 correctness gates in
  * `tools/sf1_invariant.py` are only as strong as these constructions,
  * and both were violated by earlier drafts (a trailing suffix token
  * left cross-replica Jaccard at ~1; see BASELINE.md round 10):
  *
  *  - keys shift by replica * KeyStride with referential integrity
  *    (every replicated lineitem still matches exactly one order);
  *  - fixed dims (region/nation) are verbatim, not replicated;
  *  - the text perturbation is a BIJECTIVE per-token renaming:
  *    within-replica shingle Jaccard between any two docs is exactly
  *    the replica-0 value, cross-replica token sets are disjoint;
  *  - `n_chars == length(text)` survives the rewrite;
  *  - replica-0 embeddings are verbatim; replica>0 are redrawn with
  *    nonzero norms.
  *
  * Runs at sf0.001 with K=3 into a scratch dir (never /root/testdata).
  */
class ScaleUpSpec extends SparkSpec {

  private val K = 3
  private val out = java.nio.file.Paths
    .get(sys.props("java.io.tmpdir"), "graft_scaleup_spec").toString

  private lazy val generated: Unit =
    ScaleUp.scaleAll(spark, "/root/testdata/sf0.001", out, K)

  private def t(name: String) = { generated; spark.read.parquet(s"$out/$name.parquet") }
  private def src(name: String) =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")

  test("row counts are K x and fixed dims verbatim") {
    assert(t("lineitem").count() === src("lineitem").count() * K)
    assert(t("documents").count() === src("documents").count() * K)
    assert(t("region").count() === src("region").count())
    assert(t("nation").exceptAll(src("nation")).isEmpty &&
      src("nation").exceptAll(t("nation")).isEmpty)
  }

  test("key shifting preserves referential integrity across replicas") {
    val orphans = t("lineitem").join(t("orders"),
        col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphans === 0L)
    // and the per-replica join cardinality equals the 1x one: zero
    // cross-replica fan-out by construction
    val perReplica = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_orderkey") / ScaleUp.KeyStride).cast("long").as("r"))
      .count().collect().map(_.getLong(1)).toSeq
    assert(perReplica.size === K && perReplica.distinct.size === 1)
  }

  test("text rewrite is bijective per replica: within-replica Jaccard exact, cross-replica zero") {
    val toks = t("documents").select(col("doc_id"),
      array_distinct(split(lower(trim(col("text"))), "\\s+")).as("tk"))
    def jacc(a: String, b: String) = {
      val inter = size(array_intersect(col(s"$a.tk"), col(s"$b.tk"))).cast("double")
      inter / (size(col(s"$a.tk")) + size(col(s"$b.tk")) - inter)
    }
    // cross-replica: the SAME source doc in different replicas shares
    // zero tokens — the construction that keeps near-dup groups
    // replica-local
    val cross = toks.as("x").join(toks.as("y"),
        col("x.doc_id") % ScaleUp.KeyStride === col("y.doc_id") % ScaleUp.KeyStride &&
        col("x.doc_id") < col("y.doc_id"))
      .select(jacc("x", "y").as("j"))
      .agg(max(col("j"))).head().getDouble(0)
    assert(cross === 0.0)
    // within-replica: every pairwise Jaccard among the first 40 docs of
    // replica K-1 equals the replica-0 value exactly (bijection)
    def pairs(rep: Long) = toks
      .filter(col("doc_id") >= rep * ScaleUp.KeyStride &&
        col("doc_id") < rep * ScaleUp.KeyStride + 40)
      .as("x").join(toks.as("y"),
        col("x.doc_id") % ScaleUp.KeyStride < col("y.doc_id") % ScaleUp.KeyStride &&
        col("y.doc_id") >= rep * ScaleUp.KeyStride &&
        col("y.doc_id") < rep * ScaleUp.KeyStride + 40)
      .select((col("x.doc_id") % ScaleUp.KeyStride).as("a"),
        (col("y.doc_id") % ScaleUp.KeyStride).as("b"),
        round(jacc("x", "y"), 6).as("j"))
    assert(pairs(K - 1L).exceptAll(pairs(0L)).isEmpty &&
      pairs(0L).exceptAll(pairs(K - 1L)).isEmpty)
  }

  test("no bare replica tags and no replica-0 tag collisions") {
    // bare "zNq" tokens would mean an empty token got tagged (edge
    // whitespace through regex split — the trim+filter guard)
    assert(t("documents")
      .filter(col("text").rlike("(^|\\s)z[0-9]+q(\\s|$)")).count() === 0L)
    // replica-0 text is verbatim: generation requires no base token
    // matches the tag shape (else cross-replica disjointness breaks)
    assert(t("documents").filter(col("doc_id") < ScaleUp.KeyStride)
      .filter(col("text").rlike("(^|\\s)z[0-9]+q")).count() === 0L)
  }

  test("planted semantic dups: (a, a+1) pairs in replicas > 0 at cosine ~0.99, others at noise") {
    val e = t("embeddings").select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    def cos = {
      val dot = aggregate(zip_with(col("x.v"), col("y.v"), (a, b) => a * b),
        lit(0.0d), (acc, z) => acc + z)
      val nx = sqrt(aggregate(col("x.v"), lit(0.0d), (acc, z) => acc + z * z))
      val ny = sqrt(aggregate(col("y.v"), lit(0.0d), (acc, z) => acc + z * z))
      dot / (nx * ny)
    }
    // every planted pair: local a % 50 == 0, b = a + 1, replica > 0
    val plantedCos = e.as("x").filter(col("x.vec_id") >= ScaleUp.KeyStride &&
        pmod(pmod(col("x.vec_id"), lit(ScaleUp.KeyStride)), lit(50)) === 0)
      .join(e.as("y"), col("y.vec_id") === col("x.vec_id") + 1)
      .select(cos.as("c"))
    val n = plantedCos.count()
    assert(n >= 2 * (K - 1).toLong, s"expected planted pairs in each replica > 0, got $n")
    val minPlanted = plantedCos.agg(min(col("c"))).head().getDouble(0)
    assert(minPlanted > 0.9, s"planted pair cosine fell to $minPlanted")
    // adjacent NON-planted pairs of the same replicas stay at noise
    // level — the planting is surgical, not a corpus-wide shift
    val noiseMax = e.as("x").filter(col("x.vec_id") >= ScaleUp.KeyStride &&
        pmod(pmod(col("x.vec_id"), lit(ScaleUp.KeyStride)), lit(50)) === 5)
      .join(e.as("y"), col("y.vec_id") === col("x.vec_id") + 1)
      .select(cos.as("c")).agg(max(col("c"))).head().getDouble(0)
    assert(noiseMax < 0.8, s"non-planted adjacent cosine at $noiseMax")
  }

  test("n_chars invariant and embedding norms survive the rewrite") {
    assert(t("documents")
      .filter(col("n_chars") =!= length(col("text"))).count() === 0L)
    val e = t("embeddings")
    assert(e.count() === src("embeddings").count() * K)
    // replica 0 verbatim
    assert(e.filter(col("vec_id") < ScaleUp.KeyStride)
      .exceptAll(src("embeddings")).isEmpty)
    // replicas > 0: redrawn, nonzero norm (cosine stays defined)
    val minNorm = e.filter(col("vec_id") >= ScaleUp.KeyStride)
      .select(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x).as("n2"))
      .agg(min(col("n2"))).head().getDouble(0)
    assert(minNorm > 0.0)
  }
}
