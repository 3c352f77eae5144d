package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Similarity search over embedding columns (SURVEY.md §7.4).
  *
  * Brute-force cosine is the exact baseline (Queries.annCosineTopK);
  * the scale path here is random-hyperplane LSH: K sign-bits from
  * pseudo-random +/-1 hyperplanes bucket the vectors, ANN work then
  * touches only the query's bucket (multi-probe: + Hamming-1
  * neighbors). At 100 TB the bucketing pass is one explode +
  * codegen'd scalar arithmetic + a map-side-combined groupBy — no
  * shuffle of the raw vectors — and the per-bucket exact rerank sees
  * ~n/2^K of the corpus.
  *
  * Hyperplanes are deterministic: component j of plane k is +/-1 by a
  * bit of xxhash64(k, j) — reproducible across runs and executors with
  * no side files.
  */
object Similarity {

  /** (id, v double[]) with the embedding cast to double.
    *
    * Every call site passes the CORPUS side (never a k-row probe
    * frame). `spread = true` applies the [[Par.spread]] scan
    * parallelism floor (no-op on any multi-split input) for the
    * consumers whose per-row kernel is HEAVY — all-pairs dot blocks
    * (exactCosinePairs) and the k-means cluster family (semDedup) —
    * where the r19 A/B matrix measured the floor a clear win
    * (semdedup 3.70 vs 4.62 s). It stays OFF by default: for the
    * light map kernels (sign_project LSH, PQ/ADC lookups, JL dots)
    * the same matrix measured the exchange costing more than the
    * parallelism saves (guide §8 — don't move more bytes than the
    * compute is worth).
    */
  def prepared(df: DataFrame, idCol: String, vecCol: String,
      spread: Boolean = false): DataFrame = {
    val base = if (spread) Par.spread(df) else df
    base.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
  }

  /** Cosine similarity between two double-array columns via the native
    * codegen'd DotProduct expression (same sequential summation order
    * as the higher-order fold, so results are bit-identical).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine_similarity(a, b)

  /** Margin-based bitext mining (Artetxe & Schwenk 2019; the CCMatrix
    * recipe). Scores every (x, y) pair with the RATIO margin —
    * cos(x,y) / ((avgTopK(x) + avgTopK(y)) / 2) — and keeps MUTUAL
    * best matches with margin >= threshold. The normalization demotes
    * hub vectors (near everything, so their denominator inflates) that
    * plain cosine top-1 would wrongly align to many partners.
    *
    * Inputs are two (id, v double[]) frames (see [[prepared]]); output
    * is (x_id, y_id, margin), one row per mutual pair, margin rounded
    * to 1e-6 (+0.0 canonicalizes -0.0) so the threshold boundary is
    * libm-noise independent. The pair frame is a broadcast cross join
    * — quadratic by contract, the bipartite sibling of
    * [[exactCosinePairs]]; at 100 TB generate candidates with the
    * ann_* paths and compute the margin over candidates instead.
    * Per-side top-k averages run on the native TopKPerKey bounded
    * heaps (no WindowExec); the forward/backward argmaxes are
    * struct-max hash aggregates tie-broken by ascending partner id.
    */
  def marginBitext(x: DataFrame, y: DataFrame, k: Int, threshold: Double): DataFrame = {
    val xs = x.select(col("id").as("xid"), col("v").as("xv"))
    val ys = y.select(col("id").as("yid"), col("v").as("yv"))
    val sims = xs.crossJoin(broadcast(ys))
      .select(col("xid"), col("yid"),
        (round(cosine(col("xv"), col("yv")), 6) + lit(0.0)).as("sim"))
    val kx = org.apache.spark.sql.graft.TopKPerKeyApi.topKPerKey(
        sims, Seq("xid"), Seq("sim" -> false, "yid" -> true), k)
      .groupBy(col("xid")).agg(avg(col("sim")).as("ax"))
    val ky = org.apache.spark.sql.graft.TopKPerKeyApi.topKPerKey(
        sims, Seq("yid"), Seq("sim" -> false, "xid" -> true), k)
      .groupBy(col("yid")).agg(avg(col("sim")).as("ay"))
    val m = sims.join(kx, "xid").join(ky, "yid")
      .select(col("xid"), col("yid"),
        (round(col("sim") / ((col("ax") + col("ay")) / 2), 6) + lit(0.0))
          .as("margin"))
    val fwd = m.groupBy(col("xid"))
      .agg(max(struct(col("margin"), (-col("yid")).as("ny"))).as("b"))
      .select(col("xid"), (-col("b.ny")).as("yid"), col("b.margin").as("margin"))
    val bwd = m.groupBy(col("yid"))
      .agg(max(struct(col("margin"), (-col("xid")).as("nx"))).as("b"))
      .select(col("yid").as("byid"), (-col("b.nx")).as("bxid"))
    fwd.join(bwd, fwd("xid") === col("bxid") && fwd("yid") === col("byid"))
      .filter(col("margin") >= threshold)
      .select(col("xid").as("x_id"), col("yid").as("y_id"), col("margin"))
      .orderBy(col("x_id"))
  }

  /** Sign-random-projection bucket id (K bits) per vector: explode to
    * (id, j, x), give each component its +/-1 weight per hyperplane
    * (a bit of xxhash64(k, j)), sum per plane in one groupBy, pack the
    * K signs into a long.
    */
  def lshBuckets(prep: DataFrame, bits: Int = 12): DataFrame =
    lshBucketsMulti(prep, bits, tables = 1).select(col("id"), col("bucket"))

  /** Multi-table LSH membership: `tables` INDEPENDENT hyperplane sets
    * (plane index t*bits+k seeds the hash, so table 0 reproduces
    * [[lshBuckets]]), all computed MAP-ONLY by the native
    * [[graft.functions.VectorExpressions.sign_project]] kernel — one
    * codegen'd pass per vector, no component explode, no
    * (id x numPlanes) aggregate, NO SHUFFLE. Returns
    * (id, table, bucket), `tables` rows per vector, a few dozen bytes
    * each. Bucket ids are bit-identical to the historical
    * explode + per-plane-sum formulation (same hash family, same
    * summation order — SimilaritySpec pins the equivalence), which
    * this replaced after the 96-plane batch entry showed the
    * aggregate's compile + exchange cost dominating the query.
    *
    * Multiple tables are the standard recall lever when neighbors sit
    * at wide angles (each table is an independent chance to collide);
    * probing stays cheap because candidates come from the membership
    * index, and the raw vectors are only touched for the candidate
    * rerank.
    */
  def lshBucketsMulti(prep: DataFrame, bits: Int, tables: Int): DataFrame =
    prep.select(col("id"),
      posexplode(graft.functions.VectorExpressions.sign_project(
        col("v"), bits, tables)).as(Seq("table", "bucket")))

  /** Per-bucket size above which the ANN candidate side truncates to
    * the bucket's lowest-id members (see [[cappedMembership]]).
    */
  val DefaultMaxAnnBucket = 10000

  /** Hot-bucket defense for the ANN candidate join: a DEGENERATE
    * bucket (near-constant embeddings all sharing one sign pattern)
    * would otherwise make every probing query rerank the whole bucket
    * — corpus-sized at the pathological limit, the exact blowup
    * Dedup.cappedPairs guards against in the pair pipelines. Buckets
    * over `maxBucket` keep only their `maxBucket` LOWEST-ID members as
    * candidates: deterministic, one window over the light membership
    * frame (which the join shuffles anyway). The trade is the usual
    * bounded-recall one — but inside a degenerate bucket the members
    * are near-identical by construction (they collided on every sign
    * bit), so any `maxBucket`-sized subset still yields a valid top-k
    * of ~equal similarities; ScaleStressSpec pins exactly that.
    */
  private[operators] def cappedMembership(memb: DataFrame,
      maxBucket: Int): DataFrame =
    memb.withColumn("__rn", row_number().over(
        Window.partitionBy(col("table"), col("bucket")).orderBy(col("id"))))
      .filter(col("__rn") <= maxBucket)
      .drop("__rn")

  /** Approximate top-k neighbors of `queryId`: exact cosine rerank
    * restricted to the union, over `tables` independent LSH tables, of
    * the query's bucket plus its `bits` Hamming-1 neighbor buckets
    * (multi-probe). A sign bit flips exactly when the projection is
    * near the hyperplane, so the nearest missed neighbors concentrate
    * in Hamming-1 buckets; each extra table is an independent chance
    * to catch a neighbor the first hyperplane set split away. The
    * probe set is a broadcast of tables*(bits+1) rows against the
    * light (id, table, bucket) membership index — the raw vectors are
    * only touched for the bucketing scan and the candidate rerank,
    * and a degenerate bucket contributes at most `maxBucket`
    * candidates ([[cappedMembership]]).
    */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int = 10, bits: Int = 12, tables: Int = 8,
      maxBucket: Int = DefaultMaxAnnBucket): DataFrame = {
    val prep = prepared(df, idCol, vecCol)
    val memb = lshBucketsMulti(prep, bits, tables)
    val qv = prep.filter(col("id") === queryId).select(col("v").as("qv"))
    val probes = memb.filter(col("id") === queryId)
      .select(col("table").as("ptable"), explode(array(
        col("bucket") +:
          (0 until bits).map(b => col("bucket").bitwiseXOR(lit(1L << b))): _*
      )).as("pbucket"))
    val candidates = cappedMembership(memb, maxBucket).join(broadcast(probes),
        col("table") === col("ptable") && col("bucket") === col("pbucket"))
      .select(col("id")).distinct()
    prep.join(candidates, Seq("id"), "left_semi")
      .filter(col("id") =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col("id"), round(cosine(col("v"), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** EXACT batch top-k: every query in `queryIds` (one `qid` column)
    * against the corpus in a single pass — the production reranking
    * shape, where queries arrive as a SET, not one id per job. The
    * query vectors broadcast (|Q| rows), the corpus scan stays fully
    * parallel, and the per-query top-k is one window over the scored
    * frame (partitioned by qid — no global sort, no driver loop).
    * Scoring work is |corpus| x |Q| dot products on purpose: this is
    * the exact baseline; [[annTopKBatch]] is the pruned path.
    */
  def bruteTopKBatch(df: DataFrame, idCol: String, vecCol: String,
      queryIds: DataFrame, k: Int = 10): DataFrame = {
    val prep = prepared(df, idCol, vecCol)
    val qids = queryIds.select(col("qid").cast("long").as("qid"))
    val qvecs = prep.join(broadcast(qids), col("id") === col("qid"))
      .select(col("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    prep.crossJoin(broadcast(qvecs))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), round(cosine(col("v"), col("qv")), 4).as("sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Batch multi-probe LSH ANN: [[annTopK]] for a query SET in one
    * plan — the membership index is built once and joined once for ALL
    * queries (probes = |Q| x tables x (bits+1) light rows, broadcast),
    * instead of one Spark job per query id. Candidates are
    * (qid, id) pairs from probe-bucket collisions; the raw vectors are
    * touched only for the bucketing scan and the candidate rerank, and
    * the per-query top-k is a qid-partitioned window — nothing in the
    * plan scales with |Q| except the candidate frame itself.
    */
  def annTopKBatch(df: DataFrame, idCol: String, vecCol: String,
      queryIds: DataFrame, k: Int = 10, bits: Int = 12,
      tables: Int = 8, maxBucket: Int = DefaultMaxAnnBucket): DataFrame = {
    val prep = prepared(df, idCol, vecCol)
    val memb = lshBucketsMulti(prep, bits, tables)
    val qids = queryIds.select(col("qid").cast("long").as("qid"))
    val probes = memb.join(broadcast(qids), col("id") === col("qid"))
      .select(col("qid"), col("table").as("ptable"), explode(array(
        col("bucket") +:
          (0 until bits).map(b => col("bucket").bitwiseXOR(lit(1L << b))): _*
      )).as("pbucket"))
    val candidates = cappedMembership(memb, maxBucket).join(broadcast(probes),
        col("table") === col("ptable") && col("bucket") === col("pbucket") &&
          col("id") =!= col("qid"))
      .select(col("qid"), col("id")).distinct()
    val qvecs = prep.join(broadcast(qids), col("id") === col("qid"))
      .select(col("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    candidates.join(prep, "id")
      .join(broadcast(qvecs), "qid")
      .select(col("qid"), col("id"), round(cosine(col("v"), col("qv")), 4).as("sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Nearest-centroid assignment: (id, cid) in ONE map-only pass
    * (argmax cosine; ties break to the lowest centroid id). The
    * centroid table is nlist-bounded by contract (k-means pin /
    * warm-store index metadata), so it collects to the driver and
    * rides into the codegen kernel — the historical
    * `crossJoin(broadcast) + groupBy(id).max_by` shape materialized
    * N x nlist rows and re-shuffled ALL of them just to pick each
    * row's argmax (guide §2.4: remove shuffles outright).
    * Bit-equivalent argmax: see [[org.apache.spark.sql.graft.NearestCentroid]].
    */
  def assignNearest(prep: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    if (cents.isEmpty) prep.filter(lit(false)).select(col("id"), lit(0L).as("cid"))
    else prep.select(col("id"),
      VectorExpressions.nearest_centroid(col("v"), cents).as("cid"))
  }

  /** Driver-side (cid, cv) pin of an nlist-bounded centroid frame —
    * the same bounded-collect contract as the k-means pin.
    */
  private[operators] def collectCentroids(centroids: DataFrame)
      : Seq[(Long, Seq[Double])] =
    centroids.select(col("cid").cast("long"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)

  /** The deterministic seed centroids: the `nlist` lowest-id vectors
    * (no side files, reproducible across runs).
    */
  private def seedCentroids(prep: DataFrame, nlist: Int): DataFrame =
    prep.orderBy(col("id")).limit(nlist)
      .select(col("id").as("cid"), col("v").as("cv"))

  /** Spherical k-means refinement of the IVF centroids: bounded Lloyd
    * iterations from the lowest-id seeds — assign every vector to its
    * nearest centroid by cosine, replace each centroid with the
    * component-wise MEAN of its list (the mean's direction is the
    * spherical-k-means update; cosine ignores its magnitude), repeat.
    * Empty lists keep their previous centroid, so exactly `nlist`
    * centroids survive with their original cids.
    *
    * Each iteration is one corpus pass (broadcast assignment +
    * posexplode/avg recombine); the centroid table itself is `nlist`
    * rows, so it is pinned on the DRIVER between iterations — a
    * bounded collect that breaks the per-iteration lineage chain
    * (the same two-tier reasoning as Dedup.connectedComponents).
    * Drop-in: feeds [[ivfIndex]]'s `refineIters` parameter; quality-
    * blind lowest-id seeds put several centroids in the same dense
    * region, k-means spreads them to match the data distribution,
    * which raises recall at a fixed nprobe (pinned in SimilaritySpec).
    */
  /** Pinned partition count for the Lloyd-loop cache: the component-
    * mean partial sums are grouped BY PARTITION, so this must be a
    * constant, not `defaultParallelism` — see the comment at the
    * `spreadTo` call site in [[kmeansCentroids]].
    */
  private[graft] val KmeansSpreadPartitions = 32

  def kmeansCentroids(prep: DataFrame, nlist: Int, iters: Int = 5): DataFrame = {
    val spark = prep.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    // every Lloyd iteration scans the corpus ONCE — pin the prepared
    // vectors for the loop instead of re-reading and re-casting
    // parquet per iteration; MEMORY_AND_DISK so an executor that
    // cannot hold its slice spills, not OOMs. Par.spreadTo first:
    // every iteration's kernel-assignment + partial-agg pass runs at
    // the cached frame's parallelism, so a single-split scan would
    // serialize ALL iterations (no-op at multi-split scale). The
    // target is PINNED (not defaultParallelism): the avg below does
    // non-associative double partial sums per partition, so a
    // core-count-dependent partition count would make the centroids —
    // and any near-tie assignment they feed — vary between the
    // driver's 8- and 32-core bench sessions (r19 ADVICE, medium).
    // 32 matches the count every committed oracle verification ran
    // at; on fewer cores it is a few task waves, at multi-split
    // production scale the spread is a no-op either way.
    val cached = Par.spreadTo(prep, KmeansSpreadPartitions).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // centroids live DRIVER-SIDE between iterations (nlist rows —
      // the historical pin's bounded-collect contract, minus its
      // parallelize round-trip). Each iteration is ONE job: map-only
      // kernel assignment fused into the component-mean aggregate;
      // hash partial aggregation shrinks the exchange to
      // ~partitions x nlist x d rows, and the collected final frame
      // is nlist x d (cid, j, m) rows assembled back into arrays
      // here — replacing the historical
      // crossJoin+max_by / join(assign) / double groupBy / left-join
      // recombine, which cost 4 exchanges + 2 jobs per iteration for
      // the same arithmetic (guide §2.4). Empty clusters keep their
      // previous centroid (the old coalesce), so exactly nlist
      // centroids survive with their original cids.
      var cents: Seq[(Long, Seq[Double])] =
        collectCentroids(seedCentroids(cached, nlist))
      var i = 0
      while (i < iters && cents.nonEmpty) {
        val means = cached
          .select(VectorExpressions.nearest_centroid(col("v"), cents).as("cid"),
            posexplode(col("v")).as(Seq("j", "x")))
          .groupBy(col("cid"), col("j")).agg(avg(col("x")).as("m"))
          .collect()
          .groupBy(_.getLong(0))
          .map { case (cid, rs) =>
            cid -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
        cents = cents.map { case (cid, prev) =>
          (cid, means.getOrElse(cid, prev)) }
        i += 1
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          cents.map(c => org.apache.spark.sql.Row(c._1, c._2)), 1), schema)
    } finally { cached.unpersist(false); () }
  }

  /** IVF (inverted-file) coarse quantization: assign every vector to
    * its nearest centroid ([[assignNearest]]). Centroids are the
    * `nlist` lowest-id vectors — deterministic, no side files — unless
    * `refineIters` > 0, which runs that many [[kmeansCentroids]] Lloyd
    * iterations first. Returns (assignments(id, cid),
    * centroids(cid, cv)).
    */
  def ivfIndex(prep: DataFrame, nlist: Int,
      refineIters: Int = 0): (DataFrame, DataFrame) = {
    val centroids =
      if (refineIters > 0) kmeansCentroids(prep, nlist, refineIters)
      else seedCentroids(prep, nlist)
    (assignNearest(prep, centroids), centroids)
  }

  /** IVF ANN top-k: probe the `nprobe` centroids closest to the query,
    * exact-rerank only vectors assigned to those lists — the classic
    * coarse-quantization scale path (~nprobe/nlist of the corpus sees
    * a distance computation; the rest is pruned by the broadcast
    * probe-list semi join). `refineIters` > 0 swaps in k-means-refined
    * centroids (higher recall at the same nprobe).
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int = 10, nlist: Int = 32, nprobe: Int = 8,
      refineIters: Int = 0): DataFrame = {
    val prep = prepared(df, idCol, vecCol)
    val (assign, centroids) = ivfIndex(prep, nlist, refineIters)
    ivfProbe(prep, assign, centroids, queryId, k, nprobe)
  }

  /** The probe half of [[ivfTopK]], over a PREBUILT index — the
    * amortized path: at the design point the index (assignment +
    * centroids) is a persisted artifact built once per corpus (see the
    * `ann_ivf_warm` registry entry), and each batch of queries pays
    * only this — one broadcast centroid ranking plus the
    * semi-join-pruned exact rerank of ~nprobe/nlist of the corpus.
    */
  def ivfProbe(prep: DataFrame, assign: DataFrame, centroids: DataFrame,
      queryId: Long, k: Int = 10, nprobe: Int = 8): DataFrame = {
    val q = prep.filter(col("id") === queryId).select(col("v").as("qv"))
    val probed = centroids.crossJoin(broadcast(q))
      .select(col("cid"), cosine(col("cv"), col("qv")).as("csim"))
      .orderBy(col("csim").desc, col("cid")).limit(nprobe)
      .select(col("cid"))
    prep.join(assign, "id").join(broadcast(probed), "cid")
      .filter(col("id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("id"), round(cosine(col("v"), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** Batch IVF ANN: [[ivfTopK]] for a query SET in one plan — the
    * coarse index (assignment + centroids) is built once, every query
    * picks its `nprobe` nearest centroids through one broadcast
    * centroid pass (a qid-partitioned window over |Q| x nlist rows),
    * and the candidate rerank joins the probed (qid, cid) lists
    * against the assignment in a single pass. Per-query work scales
    * with nprobe/nlist of the corpus exactly like the single-query
    * entry; nothing re-runs per query.
    */
  def ivfTopKBatch(df: DataFrame, idCol: String, vecCol: String,
      queryIds: DataFrame, k: Int = 10, nlist: Int = 32, nprobe: Int = 8,
      refineIters: Int = 0): DataFrame = {
    val prep = prepared(df, idCol, vecCol)
    val (assign, centroids) = ivfIndex(prep, nlist, refineIters)
    ivfSearchBatch(prep, assign, centroids, queryIds, k, nprobe)
  }

  /** The search stage of [[ivfTopKBatch]] against a PREBUILT coarse
    * index — the warm path: centroids and assignments can come from a
    * persisted store (index metadata survives between batches; only
    * new vectors pay assignment work), `prep` supplies the raw vectors
    * for the exact rerank exactly as the lake supplies them at scale.
    */
  def ivfSearchBatch(prep: DataFrame, assign: DataFrame,
      centroids: DataFrame, queryIds: DataFrame, k: Int = 10,
      nprobe: Int = 8): DataFrame = {
    val qids = queryIds.select(col("qid").cast("long").as("qid"))
    val qvecs = prep.join(broadcast(qids), col("id") === col("qid"))
      .select(col("qid"), col("v").as("qv"))
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("cid"))
    val probed = centroids.crossJoin(broadcast(qvecs))
      .select(col("qid"), col("cid"), cosine(col("cv"), col("qv")).as("csim"))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("cid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    prep.join(assign, "id")
      .join(broadcast(probed), "cid")
      .filter(col("id") =!= col("qid"))
      .join(broadcast(qvecs), "qid")
      .select(col("qid"), col("id"), round(cosine(col("v"), col("qv")), 4).as("sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Int8 scalar quantization: per-vector max-abs scale, components
    * mapped to [-127, 127] bytes — 4x the vectors per byte of shuffle
    * and cache, the first lever when the embedding table itself is
    * the IO bottleneck. cos(a,b) is scale-invariant, so similarity
    * search runs directly in the quantized domain (error ~1/254 per
    * component); exact rerank on the float vectors can follow for the
    * finalists.
    */
  def quantize(prep: DataFrame): DataFrame = {
    val absMax = greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-30))
    prep.select(col("id"), (absMax / 127.0).as("scale"),
      transform(col("v"), x => round(x / (absMax / 127.0)).cast("byte")).as("q"))
  }

  /** Approximate top-k by cosine over the QUANTIZED vectors (the
    * reduced-precision rerank path; compose with lshBuckets/ivfIndex
    * for candidate pruning at scale).
    */
  def quantizedTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int = 10): DataFrame = {
    val qz = quantize(prepared(df, idCol, vecCol))
      .select(col("id"), transform(col("q"), x => x.cast("double")).as("qv"))
    val q = qz.filter(col("id") === queryId).select(col("qv").as("query"))
    qz.join(broadcast(q))
      .filter(col("id") =!= queryId)
      .select(col("id"), round(cosine(col("qv"), col("query")), 4).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** EXACT cosine-threshold pair mining — every (a < b) pair with
    * round(cos(a,b), 4) >= `threshold`, bit-identical to the
    * brute-force all-pairs filter — via a LOSSLESS int8
    * filter-and-refine over a triangle block-pair join. Exact pair
    * mining is inherently quadratic (no sublinear exact method exists
    * for general cosine), so the levers at scale are the SHAPE and the
    * COST of the quadratic pass, not its existence:
    *
    *   - Shape: never a cartesian product. Each vector hashes into one
    *     of `blocks` blocks; a vector in block b is emitted to the
    *     "low" side of block-pair keys (b, q), q >= b, and the "high"
    *     side of keys (p, b), p <= b — so an EQUI-join on the
    *     (kp, kq) key covers every unordered pair exactly once across
    *     blocks*(blocks+1)/2 independent, uniformly-sized tasks
    *     (hash-assigned blocks, so no skew), each holding 2n/blocks
    *     rows. `blocks = 0` (the default) derives the count from a
    *     cheap corpus count as ~n/sqrt(targetPairsPerTask) (see
    *     [[autoBlocks]]) so each block-pair task carries a BOUNDED
    *     ~4M candidate pairs at any corpus size — the fixed-8 sizing
    *     this replaced grew per-task work 100x for every 10x corpus
    *     growth. Replication is (blocks+1)x of the SMALL side only.
    *   - Cost: the joined rows are the int8-quantized twin (~8x
    *     smaller than the double vectors) plus four scalars; the
    *     prescreen keeps a pair only when a provable UPPER BOUND on
    *     its true cosine — integer multiply-adds via the codegen'd
    *     [[org.apache.spark.sql.graft.ByteDot]] kernel — clears the
    *     threshold. The full double vectors are touched only for the
    *     (tiny) survivor set, which is re-verified exactly.
    *
    * The bound: with per-vector scale s and q_i = round(v_i/s),
    * |v_i - s*q_i| <= s/2, so
    * dot(a,b) <= sa*sb*dotq + sa*sb/2 * ||qa||_1 + sa/2 * ||b||_1
    * — all terms from per-vector precomputed scalars plus the
    * quantized dot product. A pair is discarded only when even the
    * upper bound (minus a 6e-5 slack covering the output's round-to-4
    * boundary and float evaluation error) falls below `threshold`, so
    * no qualifying pair is ever lost: the prescreen is pure speedup
    * (SimilaritySpec pins equality with the unscreened brute force).
    */
  def exactCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, blocks: Int = 0): DataFrame = {
    require(blocks >= 0,
      s"blocks must be >= 1, or 0 to derive it from the corpus size; got $blocks")
    // a zero vector has no direction: its cosine is 0/0 = NaN, which
    // Spark's SQL ordering ranks ABOVE every threshold — exclude
    // zero-norm rows up front rather than leak NaN "pairs"
    val prep = prepared(df, idCol, vecCol, spread = true)
      .filter(VectorExpressions.dot_product(col("v"), col("v")) > 0.0)
    val b = if (blocks > 0) blocks else autoBlocks(prep.count())
    exactCosineCandidates(prep, threshold, b)
      .join(prep.select(col("id").as("a"), col("v").as("va")), "a")
      .join(prep.select(col("id").as("b"), col("v").as("vb")), "b")
      .select(col("a"), col("b"), round(cosine(col("va"), col("vb")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Triangle block count for an n-vector exact pair mine: each of the
    * blocks*(blocks+1)/2 block-pair tasks sees ~(n/blocks)^2 candidate
    * pairs, so blocks ~ n/sqrt(targetPairsPerTask) holds per-task work
    * at ~`targetPairsPerTask` int8 prescreen evaluations regardless of
    * corpus size. Floored at 8 (36 tasks) so small corpora — where the
    * formula asks for 1 block — still parallelize; at the floor the
    * whole mine is cheap anyway.
    */
  private[graft] def autoBlocks(n: Long,
      targetPairsPerTask: Long = 4L * 1000 * 1000): Int = {
    require(targetPairsPerTask >= 1, s"targetPairsPerTask must be >= 1")
    math.max(8L, math.ceil(n / math.sqrt(targetPairsPerTask.toDouble)).toLong)
      .min(Int.MaxValue).toInt
  }

  /** The prescreen-survivor (a, b) pairs [[exactCosinePairs]] sends to
    * exact verification — package-visible so the spec can pin the
    * PRUNING claim (survivors << all pairs), not just correctness.
    */
  private[graft] def exactCosineCandidates(prep: DataFrame,
      threshold: Double, blocks: Int): DataFrame = {
    require(blocks >= 1, s"blocks must be >= 1, got $blocks")
    val s = greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-30)) / 127.0
    val qm = prep
      .select(col("id"), col("v"), s.as("scale"),
        transform(col("v"), x => round(x / s).cast("byte")).as("q"))
      .select(col("id"), col("scale"), col("q"),
        sqrt(VectorExpressions.dot_product(col("v"), col("v"))).as("nrm"),
        aggregate(col("v"), lit(0.0), (acc, x) => acc + abs(x)).as("l1"),
        aggregate(col("q"), lit(0), (acc, x) => acc + abs(x).cast("int")).as("ql1"))
      .withColumn("blk", pmod(hash(col("id")), lit(blocks)))
    val lo = qm.withColumn("kp", col("blk"))
      .withColumn("kq", explode(sequence(col("blk"), lit(blocks - 1))))
    val hi = qm.withColumn("kq", col("blk"))
      .withColumn("kp", explode(sequence(lit(0), col("blk"))))
    def side(d: DataFrame, sfx: String) =
      d.select(d.columns.map(c => col(c).as(c + sfx)): _*)
    val ub = col("scalea") * col("scaleb") *
        (VectorExpressions.byte_dot(col("qa"), col("qb")) +
          col("ql1a") / 2.0) +
      col("scalea") / 2.0 * col("l1b")
    side(lo, "a").join(side(hi, "b"),
        col("kpa") === col("kpb") && col("kqa") === col("kqb"))
      // same-block pairs appear on both sides: order by id. Cross-block
      // pairs appear exactly once (low block is always the "a" side).
      .where(col("blka") =!= col("blkb") || col("ida") < col("idb"))
      .where(ub >= (lit(threshold) - 6e-5) * col("nrma") * col("nrmb"))
      .select(least(col("ida"), col("idb")).as("a"),
        greatest(col("ida"), col("idb")).as("b"))
  }

  /** Embedding-cosine near-duplicate pairs: candidates = same LSH
    * bucket (a < b), verified by exact cosine >= threshold. The
    * pairwise work is per-bucket, never corpus x corpus; a bucket
    * larger than `maxBucket` (near-constant embeddings all hashing to
    * one sign pattern) degrades to star pairs against the bucket's
    * min-id representative via [[graft.operators.Dedup.cappedPairs]],
    * so one degenerate bucket cannot go quadratic.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 10,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    // zero-norm exclusion: 0/0 cosine is NaN, which Spark ranks above
    // every threshold — same contract as exactCosinePairs, mirrored in
    // the DuckDB oracle
    val prep = prepared(df, idCol, vecCol)
      .filter(VectorExpressions.dot_product(col("v"), col("v")) > 0.0)
    val withB = prep.join(lshBuckets(prep, bits), "id")
      .select(col("id"), col("v").as("p"), lit(0).as("band"), col("bucket").as("key"))
    Dedup.cappedPairs(withB, maxBucket)
      .select(col("a"), col("b"),
        round(cosine(col("pa"), col("pb")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering the embedding space with k-means and
    * dropping, within each cluster, every vector that duplicates an
    * earlier-id one at cosine >= `threshold`. Returns the DROPPED ids
    * with their cluster and best-match evidence (`kept` = the earlier
    * survivor-or-not id it duplicated); anti-join against the corpus
    * for the survivors.
    *
    * Scale shape: the pairwise stage never sees corpus x corpus —
    * candidates are intra-cluster only ([[ivfIndex]] assignment, one
    * broadcast-centroid pass), and a degenerate cluster (embedding
    * collapse) above `maxCluster` degrades to star pairs against the
    * cluster's min-id representative via
    * [[graft.operators.Dedup.cappedPairs]], the same bounded-recall
    * trade as every other hot-bucket defense in this library. At the
    * paper's operating point clusters are sized ~sqrt(N), so the
    * verify cost is ~N^1.5 worst-case but distributed per-cluster;
    * `nlist` controls that knob directly.
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, refineIters: Int = 4, threshold: Double = 0.99,
      maxCluster: Int = Dedup.DefaultMaxBucket): DataFrame = {
    // zero-norm exclusion, same contract as exactCosinePairs: a zero
    // vector duplicates nothing (cosine undefined), never NaN-passes
    val prep = prepared(df, idCol, vecCol, spread = true)
      .filter(VectorExpressions.dot_product(col("v"), col("v")) > 0.0)
    // map-only cluster assignment fused onto the corpus scan: the
    // historical `prep.join(assignNearest(prep,..), "id")` was a
    // self-join on id — two exchanges re-attaching a column that is a
    // pure function of v (guide §2.4). Identical (id, key) mapping:
    // same kernel, same centroids.
    val centroids =
      if (refineIters > 0) kmeansCentroids(prep, nlist, refineIters)
      else seedCentroids(prep, nlist)
    val cents = collectCentroids(centroids)
    val clustered =
      if (cents.isEmpty) prep.filter(lit(false))
        .select(col("id"), col("v").as("p"), lit(0).as("band"), lit(0L).as("key"))
      else prep.select(col("id"), col("v").as("p"), lit(0).as("band"),
        VectorExpressions.nearest_centroid(col("v"), cents).as("key"))
    Dedup.cappedPairs(clustered, maxCluster)
      .select(col("a"), col("b"), cosine(col("pa"), col("pb")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(col("b").as("id"))
      .agg(min(col("a")).as("kept"), round(max(col("cos")), 4).as("max_cos"))
  }

  /** Product-quantization codebooks (Jegou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): split each vector
    * into `m` contiguous subvectors and k-means each subspace to
    * `ksub` centroids — so a vector compresses to m small codes
    * (+ one stored norm), a ~(4*d)/(m) byte-level shrink that is THE
    * public path to billion-vector in-memory ANN.
    *
    * Scale shape: codebooks are a DISTRIBUTION ESTIMATE — training
    * reads a hash-deterministic sample of at most ~`sampleCap`
    * vectors (the full corpus adds nothing at 100 TB) and runs the
    * Lloyd iterations DRIVER-SIDE over that bounded sample: one Spark
    * job total regardless of `iters`, the same bounded-collect
    * contract as [[kmeansCentroids]]' per-iteration pin and
    * Curation's capped driver histogram. (A first cut trained
    * distributed; at sf0.1 the per-iteration stage/broadcast/plan
    * latency was 6.8 s of a 7.5 s entry for milliseconds of actual
    * arithmetic — the distributed passes are encode and search, which
    * scale with the corpus; training does not.) Seeds are the ksub
    * lowest-id subvectors per subspace: deterministic, no side files.
    * Argmin ties break to the lowest code; empty cells keep their
    * previous centroid so the codebook shape never shrinks.
    *
    * Returns the codebook as a driver-side m x ksub' x dsub array
    * (ksub' <= ksub when the sample is tiny).
    */
  def pqCodebooks(prep: DataFrame, m: Int = 8, ksub: Int = 16,
      iters: Int = 2, sampleCap: Long = 20000L,
      knownCount: Long = -1L): Array[Array[Array[Double]]] = {
    val n = if (knownCount >= 0) knownCount else prep.count()
    val den = math.max(1L, n / math.max(1L, sampleCap))
    val sampled =
      if (den <= 1L) prep
      else prep.filter(pmod(xxhash64(col("id")), lit(den)) === 0)
    val sample = sampled.select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(sample.nonEmpty, "PQ training sample is empty")
    val d = sample.head._2.length
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    Array.tabulate(m) { mi =>
      val subs = sample.map { case (_, v) =>
        java.util.Arrays.copyOfRange(v, mi * dsub, (mi + 1) * dsub) }
      val k = math.min(ksub, subs.length)
      val cents = Array.tabulate(k)(c => subs(c).clone) // lowest-id seeds
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k, dsub)(0.0)
        val cnts = new Array[Long](k)
        subs.foreach { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var dd = 0.0; var j = 0
            while (j < dsub) { val t = s(j) - cents(c)(j); dd += t * t; j += 1 }
            if (dd < bestD) { bestD = dd; best = c } // strict < => lowest code
            c += 1
          }
          var j = 0
          while (j < dsub) { sums(best)(j) += s(j); j += 1 }
          cnts(best) += 1
        }
        var c = 0
        while (c < k) {
          if (cnts(c) > 0) {
            var j = 0
            while (j < dsub) { cents(c)(j) = sums(c)(j) / cnts(c); j += 1 }
          } // empty cell keeps its previous centroid
          c += 1
        }
        it += 1
      }
      cents
    }
  }

  /** MAP-ONLY PQ encoding: each vector becomes its m codebook codes
    * plus its EXACT norm — the per-vector state an ADC scan needs —
    * in ONE projection through the native
    * [[graft.functions.VectorExpressions.pq_encode]] kernel (one
    * compiled eval per vector; the codebook serializes with the
    * expression). No join, no shuffle, no broadcast variable: at
    * 100 TB this is the pass that shrinks the corpus ~16x before any
    * search touches it, and it composes with whatever partitioning
    * the corpus already has. (Measured at sf10, 200k vectors: 148 s
    * as an exploded broadcast-join assign, 17 s as a higher-order
    * transform with a native dot per centroid, sub-second as this
    * kernel — see PqEncodeCodes' scaladoc.)
    */
  def pqEncode(prep: DataFrame, cb: Array[Array[Array[Double]]]): DataFrame =
    prep.select(col("id"),
      VectorExpressions.pq_encode(col("v"),
        cb.map(_.map(_.toSeq).toSeq).toSeq).as("codes"),
      sqrt(VectorExpressions.dot_product(col("v"), col("v"))).as("norm"))

  /** PQ asymmetric-distance top-k (ADC) with exact rerank: the query
    * stays un-quantized; its dot product against every codebook
    * centroid is precomputed into an m x ksub lookup table (driver
    * arithmetic over one bounded-collected row), and the corpus scan
    * approximates each cosine as table-lookup-sum / (norm_x * norm_q)
    * — m array lookups and adds per vector, NO vector arithmetic, no
    * join, no shuffle until the final top-`rerank` TakeOrdered. The
    * top `rerank` candidates are then re-scored EXACTLY against the
    * full vectors (broadcast 1-row query), so quantization error only
    * costs recall when a true neighbor falls outside the candidate
    * set, never precision of the returned sims.
    */
  def pqSearch(prep: DataFrame, encoded: DataFrame,
      cb: Array[Array[Array[Double]]], queryId: Long, k: Int = 10,
      rerank: Int = 50): DataFrame = {
    val m = cb.length
    val qv = prep.filter(col("id") === queryId)
      .select(col("v")).head().getSeq[Double](0).toArray
    val dsub = qv.length / m
    require(qv.length == m * dsub && cb.head.head.length == dsub,
      s"dim ${qv.length} not divisible into $m subspaces of $dsub")
    val qnorm = math.max(math.sqrt(qv.map(x => x * x).sum), 1e-30)
    val adc: Seq[Seq[Double]] = cb.zipWithIndex.map { case (book, mi) =>
      book.map { cv =>
        var s = 0.0; var j = 0
        while (j < dsub) { s += cv(j) * qv(mi * dsub + j); j += 1 }
        s
      }.toSeq
    }.toSeq
    val adcLit = typedLit(adc)
    val cand = encoded.filter(col("id") =!= queryId)
      .select(col("id"),
        (aggregate(
          transform(col("codes"), (c, mi) =>
            element_at(element_at(adcLit, mi + 1), c + 1)),
          lit(0.0), (acc, x) => acc + x)
          / (greatest(col("norm"), lit(1e-30)) * lit(qnorm))).as("approx"))
      .orderBy(col("approx").desc, col("id"))
      .limit(rerank)
    val q = prep.filter(col("id") === queryId).select(col("v").as("qv"))
    cand.select(col("id")).join(prep, "id")
      .crossJoin(broadcast(q))
      .select(col("id"), round(cosine(col("v"), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** End-to-end PQ ANN: train codebooks (sampled), encode (map-only),
    * ADC-scan + exact rerank. The cold path; at the design point the
    * codebook + encoded frame are a persisted artifact built once per
    * corpus and each query pays only [[pqSearch]].
    *
    * `rerank = 0` (the default) scales the candidate set as
    * ~4*sqrt(N): ADC error is corpus-size-independent, but the sim
    * DENSITY near the top-k boundary grows with N, so a FIXED rerank
    * loses recall as the corpus grows (measured: recall_ok flipped
    * false at 10x under rerank=100). sqrt keeps the rerank a
    * vanishing fraction of the corpus (2.8% at 20k, 0.9% at 200k,
    * ~0.01% at 1e9) while tracking the boundary crowding.
    */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int = 10, m: Int = 16, ksub: Int = 64, iters: Int = 2,
      rerank: Int = 0, sampleCap: Long = 100000L): DataFrame = {
    val prep = prepared(df, idCol, vecCol)
    val n = prep.count()
    val cb = pqCodebooks(prep, m, ksub, iters, sampleCap, knownCount = n)
    val r =
      if (rerank > 0) rerank
      else math.max(100, (4.0 * math.sqrt(n.toDouble)).ceil.toInt)
    pqSearch(prep, pqEncode(prep, cb), cb, queryId, k, r)
  }

  /** Driver-pin a SMALL frame (the nlist-row centroid table): one
    * bounded collect, re-created as a local DataFrame so downstream
    * consumers (assignment broadcast, residual joins, the probe's
    * collect) stop re-executing the centroid lineage — the same
    * bounded-collect contract as [[kmeansCentroids]]' per-iteration
    * pin.
    */
  private def pinSmall(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows = df.collect().toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), df.schema)
  }

  /** Residual frame for IVF-PQ: every vector minus its assigned coarse
    * centroid — (id, v) where v is the residual. PQ codebooks trained
    * on residuals capture the LOCAL error distribution around each
    * list instead of the global vector distribution, the refinement
    * that makes IVFADC (Jegou et al. 2011 §IV) beat flat PQ at equal
    * code length. One broadcast centroid join; a sample filter on `id`
    * pushes through the assignment's groupBy to the scan, so training
    * reads only the sampled slice.
    */
  def ivfPqResiduals(prep: DataFrame, assign: DataFrame,
      centroids: DataFrame): DataFrame =
    prep.join(assign, "id")
      .join(broadcast(centroids), "cid")
      .select(col("id"), zip_with(col("v"), col("cv"), (x, c) => x - c).as("v"))

  /** MAP-ONLY IVF-PQ encoding: (id, cid, codes, norm) — the coarse
    * list id, the m residual PQ codes via the native
    * [[graft.functions.VectorExpressions.pq_encode]] kernel (one
    * compiled eval per vector, codebook serialized with the
    * expression), and the vector's EXACT norm for the cosine
    * denominator. One broadcast centroid join + one projection: at
    * 100 TB this is the pass that shrinks the corpus to list-bucketed
    * ~m-byte codes, and it composes with whatever partitioning the
    * corpus already has (writing it partitioned BY cid is the
    * persisted-index layout — each probe then touches only
    * nprobe/nlist of the files).
    */
  def ivfPqEncode(prep: DataFrame, assign: DataFrame, centroids: DataFrame,
      cb: Array[Array[Array[Double]]]): DataFrame =
    prep.join(assign, "id")
      .join(broadcast(centroids), "cid")
      .select(col("id"), col("cid"),
        VectorExpressions.pq_encode(
          zip_with(col("v"), col("cv"), (x, c) => x - c),
          cb.map(_.map(_.toSeq).toSeq).toSeq).as("codes"),
        sqrt(VectorExpressions.dot_product(col("v"), col("v"))).as("norm"))

  /** IVF-PQ (IVFADC) search: probe the `nprobe` coarse lists nearest
    * the query, ADC-scan ONLY those lists' residual codes, exact-rerank
    * the top `rerank`. The inner-product decomposition
    * <q,v> = <q,c_list> + <q,residual> means ONE ADC table (built from
    * q alone, driver arithmetic) serves every probed list — the
    * per-list term is a literal-map lookup on `cid` — so the scan cost
    * is m lookups+adds per CANDIDATE (nprobe/nlist of the corpus), not
    * per corpus vector: the two pruning levers (coarse quantization
    * and code compression) multiply. Centroids are a bounded
    * nlist-row collect (same contract as [[kmeansCentroids]]' pin);
    * the probed-list filter is an `isin` over nprobe ids — partition-
    * prunable when the encoded frame is stored partitioned by cid.
    * Exact rerank on the full vectors, so quantization error only
    * costs recall, never precision of the returned sims.
    */
  def ivfPqSearch(prep: DataFrame, encoded: DataFrame, centroids: DataFrame,
      cb: Array[Array[Array[Double]]], queryId: Long, k: Int = 10,
      nprobe: Int = 8, rerank: Int = 50): DataFrame = {
    val m = cb.length
    val qv = prep.filter(col("id") === queryId)
      .select(col("v")).head().getSeq[Double](0).toArray
    val dsub = qv.length / m
    require(qv.length == m * dsub && cb.head.head.length == dsub,
      s"dim ${qv.length} not divisible into $m subspaces of $dsub")
    val qnorm = math.max(math.sqrt(qv.map(x => x * x).sum), 1e-30)
    def ip(c: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < c.length) { s += c(j) * qv(j); j += 1 }
      s
    }
    // bounded collect: nlist centroid rows; probe ranking matches
    // ivfProbe's (cosine desc, cid asc)
    val cents = centroids.select(col("cid"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probed = cents.map { case (cid, cv) =>
      val cn = math.max(math.sqrt(cv.map(x => x * x).sum), 1e-30)
      (cid, ip(cv), ip(cv) / (cn * qnorm))
    }.sortBy { case (cid, _, cs) => (-cs, cid) }.take(nprobe)
    val ipQC: Map[Long, Double] =
      probed.map { case (cid, ipv, _) => cid -> ipv }.toMap
    val probedIds = probed.map(_._1).toSeq
    val adc: Seq[Seq[Double]] = cb.zipWithIndex.map { case (book, mi) =>
      book.map { cv =>
        var s = 0.0; var j = 0
        while (j < dsub) { s += cv(j) * qv(mi * dsub + j); j += 1 }
        s
      }.toSeq
    }.toSeq
    val adcLit = typedLit(adc)
    val ipLit = typedLit(ipQC)
    val cand = encoded
      .filter(col("cid").isin(probedIds: _*))
      .filter(col("id") =!= queryId)
      .select(col("id"),
        ((element_at(ipLit, col("cid")) +
          aggregate(
            transform(col("codes"), (c, mi) =>
              element_at(element_at(adcLit, mi + 1), c + 1)),
            lit(0.0), (acc, x) => acc + x))
          / (greatest(col("norm"), lit(1e-30)) * lit(qnorm))).as("approx"))
      .orderBy(col("approx").desc, col("id"))
      .limit(rerank)
    val q = prep.filter(col("id") === queryId).select(col("v").as("qv"))
    cand.select(col("id")).join(prep, "id")
      .crossJoin(broadcast(q))
      .select(col("id"), round(cosine(col("v"), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** End-to-end IVF-PQ ANN (Jegou et al. 2011's IVFADC): coarse IVF
    * lists + PQ on the residuals + one-table ADC scan of the probed
    * lists + exact rerank — the composition that is THE public
    * billion-vector index shape (coarse pruning bounds how much is
    * scanned; residual codes bound the bytes per scanned vector). The
    * cold path; centroids + assignment + encoded codes + codebooks are
    * the persisted artifact at the design point (see `ann_ivfpq_warm`).
    * `rerank = 0` scales candidates as ~4*sqrt(N), same boundary-
    * crowding reasoning as [[pqTopK]].
    */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int = 10, nlist: Int = 32, nprobe: Int = 8, m: Int = 16,
      ksub: Int = 64, iters: Int = 2, rerank: Int = 0,
      sampleCap: Long = 100000L, refineIters: Int = 0): DataFrame = {
    val prep = prepared(df, idCol, vecCol)
    val n = prep.count()
    val (cents, _, cb, encoded) = ivfPqIndex(prep, nlist, m, ksub, iters,
      sampleCap, refineIters, knownCount = n)
    val r =
      if (rerank > 0) rerank
      else math.max(100, (4.0 * math.sqrt(n.toDouble)).ceil.toInt)
    ivfPqSearch(prep, encoded, cents, cb, queryId, k, nprobe, r)
  }

  /** Build the full IVF-PQ index over a prepared corpus:
    * (centroids, assign, codebooks, encoded). At the design point all
    * four are persisted once per corpus (see the `ann_ivfpq_warm`
    * entry — encoded written partitioned by cid so probes prune
    * files); each query then pays only [[ivfPqSearch]].
    */
  def ivfPqIndex(prep: DataFrame, nlist: Int = 32, m: Int = 16,
      ksub: Int = 64, iters: Int = 2, sampleCap: Long = 100000L,
      refineIters: Int = 0, knownCount: Long = -1L)
      : (DataFrame, DataFrame, Array[Array[Array[Double]]], DataFrame) = {
    val n = if (knownCount >= 0) knownCount else prep.count()
    val cents = pinSmall(
      if (refineIters > 0) kmeansCentroids(prep, nlist, refineIters)
      else prep.orderBy(col("id")).limit(nlist)
        .select(col("id").as("cid"), col("v").as("cv")))
    val assign = assignNearest(prep, cents)
    val cb = pqCodebooks(ivfPqResiduals(prep, assign, cents), m, ksub,
      iters, sampleCap, knownCount = n)
    (cents, assign, cb, ivfPqEncode(prep, assign, cents, cb))
  }

  /** Component j of Johnson-Lindenstrauss projection row k: +/-1 by
    * bit 13 of xxhash64(j, xxhash64(k, seed)) — the same deterministic
    * no-side-files hash family as the LSH hyperplanes (seed 1789
    * keeps the JL matrix independent of the seed-42 LSH planes).
    */
  def jlRow(k: Int, dim: Int, seed: Long = 1789L): Array[Double] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.IntegerType
    val hk = XxHash64Function.hash(k, IntegerType, seed)
    Array.tabulate(dim) { j =>
      val h = XxHash64Function.hash(j, IntegerType, hk)
      if (((h >>> 13) & 1L) == 1L) 1.0 else -1.0
    }
  }

  /** Johnson-Lindenstrauss random projection to `r` dimensions: each
    * output component is the native codegen'd dot product of the
    * vector with a deterministic +/-1 row, scaled by 1/sqrt(r) — the
    * standard distance-preserving (in expectation, and within
    * (1 +/- eps) w.h.p. for r = O(log n / eps^2)) shrink applied
    * BEFORE clustering / LSH / pair mining when the raw dimension is
    * the cost driver. MAP-ONLY: r compiled dot products per vector,
    * no shuffle, no side files (the matrix is hash-tabulated), and it
    * composes with whatever partitioning the corpus has. Returns
    * (id, p double[r]). Restrict `r` to powers of two if bit-exact
    * cross-engine replay matters (1/sqrt(r) is then exact in binary).
    */
  def jlProject(prep: DataFrame, r: Int, dim: Int,
      seed: Long = 1789L): DataFrame = {
    val scale = 1.0 / math.sqrt(r.toDouble)
    val comps = (0 until r).map { k =>
      VectorExpressions.dot_product(col("v"),
        typedLit(jlRow(k, dim, seed).toSeq)) * lit(scale)
    }
    prep.select(col("id"), array(comps: _*).as("p"))
  }

  /** Batch IVF-PQ search: [[ivfPqSearch]] for a query SET in ONE plan
    * — the amortized production shape. All per-query preparation
    * (probed-list ranking, <q,c_list> terms, the ADC table, the query
    * norm) is bounded driver arithmetic over the |Q| collected query
    * vectors and the nlist centroid rows; the corpus-scale work is a
    * single pass: encoded codes join the broadcast (qid, cid, ipqc)
    * probe frame on cid — each code row fans out ONLY to the queries
    * probing its list — the per-candidate approx is m table lookups
    * against a literal qid-keyed ADC map (hoisted to one map lookup
    * per row), and a qid-partitioned window takes the rerank set. No
    * per-query jobs, no per-query corpus scans.
    */
  def ivfPqSearchBatch(prep: DataFrame, encoded: DataFrame,
      centroids: DataFrame, cb: Array[Array[Array[Double]]],
      queryIds: Seq[Long], k: Int = 10, nprobe: Int = 8,
      rerank: Int = 50): DataFrame = {
    val m = cb.length
    val spark = prep.sparkSession
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { s += a(j) * b(j); j += 1 }
      s
    }
    // bounded collects by contract: |Q| query vectors + nlist centroids
    val qrows = prep.filter(col("id").isin(queryIds: _*))
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    require(qrows.nonEmpty, "no query vectors found")
    val dsub = qrows.head._2.length / m
    require(qrows.head._2.length == m * dsub && cb.head.head.length == dsub,
      s"dim ${qrows.head._2.length} not divisible into $m subspaces of $dsub")
    val cents = centroids.select(col("cid"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probeRows = Seq.newBuilder[(Long, Long, Double)]
    val adcMap: Map[Long, Seq[Seq[Double]]] = qrows.map { case (qid, qv) =>
      val qn = math.max(math.sqrt(dot(qv, qv)), 1e-30)
      cents.map { case (cid, cv) =>
        val ip = dot(cv, qv)
        (cid, ip, ip / (math.max(math.sqrt(dot(cv, cv)), 1e-30) * qn))
      }.sortBy { case (cid, _, cs) => (-cs, cid) }.take(nprobe)
        .foreach { case (cid, ip, _) => probeRows += ((qid, cid, ip)) }
      qid -> cb.zipWithIndex.map { case (book, mi) =>
        book.map { cv =>
          var s = 0.0; var j = 0
          while (j < dsub) { s += cv(j) * qv(mi * dsub + j); j += 1 }
          s
        }.toSeq
      }.toSeq
    }.toMap
    val qnorms: Map[Long, Double] = qrows.map { case (qid, qv) =>
      qid -> math.max(math.sqrt(dot(qv, qv)), 1e-30) }.toMap
    val probes = spark.createDataFrame(probeRows.result())
      .toDF("qid", "cid", "__ipqc")
    val adcLit = typedLit(adcMap)
    val qnLit = typedLit(qnorms)
    val candW = Window.partitionBy(col("qid"))
      .orderBy(col("approx").desc, col("id"))
    val cand = encoded.join(broadcast(probes), "cid")
      .filter(col("id") =!= col("qid"))
      // ONE qid-keyed table lookup per row BY CONSTRUCTION: the table
      // is zip_with's second ARGUMENT (evaluated once per row, before
      // the lambda runs), not an aliased column the lambda reads — a
      // hoisted two-step select would be re-merged by CollapseProject
      // (single textual reference), landing the map lookup back inside
      // the per-code lambda
      .select(col("qid"), col("id"),
        ((col("__ipqc") +
          aggregate(
            zip_with(col("codes"), element_at(adcLit, col("qid")),
              (c, sub) => element_at(sub, c + 1)),
            lit(0.0), (acc, x) => acc + x))
          / (greatest(col("norm"), lit(1e-30))
            * element_at(qnLit, col("qid")))).as("approx"))
      .withColumn("__rn", row_number().over(candW))
      .filter(col("__rn") <= rerank)
      .select(col("qid"), col("id"))
    val qvecs = prep.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    cand.join(prep, "id").join(broadcast(qvecs), "qid")
      .select(col("qid"), col("id"),
        round(cosine(col("v"), col("qv")), 4).as("sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Codebook -> (mi, code, cv) rows, the persisted form of a trained
    * PQ codebook (m*ksub tiny rows — driver-created, bounded by
    * construction).
    */
  def codebookToDf(spark: org.apache.spark.sql.SparkSession,
      cb: Array[Array[Array[Double]]]): DataFrame = {
    import org.apache.spark.sql.types._
    val rows = for {
      (book, mi) <- cb.zipWithIndex.toSeq
      (cv, c) <- book.zipWithIndex.toSeq
    } yield org.apache.spark.sql.Row(mi, c, cv.toSeq)
    val schema = StructType(Seq(
      StructField("mi", IntegerType), StructField("code", IntegerType),
      StructField("cv", ArrayType(DoubleType))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Inverse of [[codebookToDf]]: one bounded collect of the m*ksub
    * codebook rows, rebuilt as the driver-side array the encode/search
    * kernels take.
    */
  def codebookFromDf(df: DataFrame): Array[Array[Array[Double]]] = {
    val rows = df.select(col("mi"), col("code"), col("cv")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    Array.tabulate(m)(mi => rows.filter(_._1 == mi).sortBy(_._2).map(_._3))
  }
}
