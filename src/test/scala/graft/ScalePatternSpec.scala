package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin, Skew}

/** Scale-pattern specs: salting, as-of join, and bucketed co-located
  * joins — the shapes that keep plans healthy at 1000 executors.
  */
class ScalePatternSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("salted sum equals plain groupBy sum exactly") {
    val li = Tables(spark, sfDir, "lineitem")
    val salted = graft.p6.Queries.all("q14_salted_agg")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val plain = li.groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("funnel_depth: planted users land at every depth; steps are strictly ordered") {
    // the corpus is dense (every user completes the funnel), so the
    // 0/1/2 branches and the strict-ordering rule are pinned here
    def ns(m: Long) = m * 60000000000L // minutes -> nanos (events.ts encoding)
    val ev = Seq(
      (1L, "view", ns(0)),                                           // depth 1
      (2L, "view", ns(0)), (2L, "click", ns(1)),                     // depth 2
      (3L, "view", ns(0)), (3L, "click", ns(1)), (3L, "purchase", ns(2)), // 3
      (4L, "purchase", ns(0)), (4L, "click", ns(1)), (4L, "view", ns(2)), // reversed: 1
      (5L, "error", ns(0)),                                          // depth 0
      (6L, "click", ns(0)), (6L, "purchase", ns(1)),                 // no view: 0
      (7L, "view", ns(0)), (7L, "click", ns(0)))    // same instant: NOT after -> 1
      .toDF("user_id", "event_type", "ts")
    val dirTmp = java.nio.file.Files.createTempDirectory("funnel").toString
    ev.write.mode("overwrite").parquet(s"$dirTmp/events.parquet")
    val got = graft.p6.Queries.all("funnel_depth")(spark, dirTmp)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 2L, 1 -> 3L, 2 -> 1L, 3 -> 1L), s"got $got")
  }

  test("exact-pair triangle blocks stay balanced at 10x the bench corpus") {
    // at 10x the sf0.1 embedding corpus the auto sizing moves past the
    // floor (10 blocks, 55 block-pair tasks); hash assignment must keep
    // the per-block row counts — and so the per-task join inputs —
    // near-uniform, or one straggler task dominates the quadratic pass
    val n = 20000L
    val b = graft.operators.Similarity.autoBlocks(n)
    assert(b == 10)
    val counts = spark.range(n)
      .select(pmod(hash(col("id")), lit(b)).as("blk"))
      .groupBy("blk").count()
      .collect().map(r => r.getLong(1))
    assert(counts.length == b, s"expected $b non-empty blocks, got ${counts.length}")
    val (mx, mn) = (counts.max, counts.min)
    assert(mx <= mn * 1.2,
      s"block skew ${mx.toDouble / mn} over $b blocks — tasks unbalanced")
  }

  test("salted join equals plain join") {
    val li = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_totalprice"))
    val plainN = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    val saltedN = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", 8).count()
    assert(plainN == saltedN && plainN > 0)
  }

  test("GlobalRank.ntile matches the single-partition window formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables(spark, sfDir, "customer")
    val order = Seq(col("c_acctbal"), col("c_custkey"))
    val viaWindow = cust
      .withColumn("quartile", ntile(4).over(Window.orderBy(order: _*)))
      .select(col("c_custkey"), col("quartile"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val viaRank = graft.operators.GlobalRank.ntile(cust, 4, order, "quartile")
      .select(col("c_custkey"), col("quartile"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaRank == viaWindow)
    // uneven split: 7 rows into 3 buckets -> sizes 3/2/2
    val seven = (1 to 7).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    val sizes = graft.operators.GlobalRank.ntile(seven, 3, Seq(col("v"), col("id")))
      .groupBy("bucket").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 3L, 2L -> 2L, 3L -> 2L))
    // fewer rows than buckets: each row its own leading bucket
    val two = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val tiny = graft.operators.GlobalRank.ntile(two, 4, Seq(col("v"), col("id")))
      .select("id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiny == Set((1L, 1L), (2L, 2L)))
  }

  test("GlobalRank.withPrefixSum matches the single-partition window running sum") {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").cast("long").as("w"))
    val order = Seq(col("l_orderkey"), col("l_linenumber"))
    val viaWindow = li
      .withColumn("excl", coalesce(sum(col("w")).over(
        Window.orderBy(order: _*).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    val viaScan = graft.operators.GlobalRank.withPrefixSum(li, order, col("w"), "excl")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    // ~6k rows through the 32-partition range sort: the offsets-seeded
    // scan must agree with the window across every partition boundary
    assert(viaScan == viaWindow && viaScan.size > 1000)
  }

  test("GlobalRank.shardAssign: contiguous shards, token budgets within one doc of target") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(graft.operators.Dedup.tokens(col("text"))).cast("long").as("ntoks"))
    val target = 512L
    val sharded = graft.operators.GlobalRank
      .shardAssign(docs, Seq(col("doc_id")), col("ntoks"), target)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxDoc = sharded.map(_._2).max
    val byShard = sharded.groupBy(_._3).toSeq.sortBy(_._1)
    // shard ids are dense from 0
    assert(byShard.map(_._1) == (0L until byShard.size.toLong))
    // shards are contiguous runs of the doc_id order
    val ranges = byShard.map { case (sid, rs) =>
      (sid, rs.map(_._1).min, rs.map(_._1).max) }
    ranges.sliding(2).foreach {
      case Seq((_, _, hi), (_, lo2, _)) => assert(hi < lo2, "shards overlap")
      case _ =>
    }
    // every non-final shard's tokens land in [target - maxDoc + 1, target + maxDoc - 1]
    byShard.dropRight(1).foreach { case (sid, rs) =>
      val tot = rs.map(_._2).sum
      assert(tot > target - maxDoc && tot < target + maxDoc,
        s"shard $sid total $tot vs target $target (max doc $maxDoc)")
    }
  }

  test("token_budget_pack: distributed greedy fill matches a sequential driver reference") {
    import graft.functions.VectorExpressions
    val row = graft.p6.Queries.all("token_budget_pack")(spark, sfDir).collect()(0)
    // sequential reference: same score/ntoks columns, greedy fill in
    // (score desc, doc_id) order on the driver
    val toks = split(trim(lower(col("text"))), "\\s+")
    val ws = transform(toks, tk =>
      shiftrightunsigned(VectorExpressions.md5_lower64(tk), 3)
        .bitwiseAND(lit(4095L)).cast("double"))
    val meanW = aggregate(ws, lit(0.0), (acc, x) => acc + x) /
      size(toks).cast("double")
    val z = (meanW / lit(2048.0) - lit(1.0)) * lit(6.0)
    val score = round(lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z)), 4)
    val scored = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), score.as("score"),
        size(toks).cast("long").as("ntoks"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, sc, _) => (-sc, id) }
    val budget = scored.map(_._3).sum * 2 / 5
    var run = 0L; var nKept = 0L; var tokKept = 0L
    scored.foreach { case (_, _, n) =>
      // the entry's keep rule is prefix-over-ALL-docs + ntoks <= B
      // (dropped docs still advance the running position)
      if (run + n <= budget) { nKept += 1; tokKept += n }
      run += n
    }
    assert(row.getLong(0) == scored.length.toLong)
    assert(row.getLong(1) == nKept, s"n_kept ${row.getLong(1)} vs ref $nKept")
    assert(row.getLong(3) == budget)
    assert(row.getLong(4) == tokKept)
    assert(tokKept <= budget && nKept > 0 && nKept < scored.length)
  }

  test("as-of join semantics: latest right at-or-before left, per key") {
    def ts(m: Long) = new java.sql.Timestamp(m * 60000L)
    val clicks = Seq((1L, ts(10), "c1"), (1L, ts(30), "c2"), (2L, ts(5), "c3"))
      .toDF("user_id", "ts", "tag")
    val snapshots = Seq((1L, ts(0), 100.0), (1L, ts(30), 300.0), (2L, ts(6), 999.0))
      .toDF("user_id", "ts", "score")
    val out = AsOfJoin.asof(clicks, snapshots, "user_id", "ts", "ts",
        Map("score" -> "score"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("score")).map(_.toDouble)).toMap
    assert(out("c1") == Some(100.0)) // before the t=30 snapshot
    assert(out("c2") == Some(300.0)) // same-time snapshot visible (inclusive)
    assert(out("c3") == None)        // only future snapshots exist for user 2
  }

  test("TopKPerKey exec: matches the window formulation, no sort in the plan") {
    import org.apache.spark.sql.graft.TopKPerKeyApi
    val orders = Tables(spark, sfDir, "orders")
    val topk = TopKPerKeyApi.topKPerKey(orders,
      Seq("o_orderstatus"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 5)
    val plan = topk.queryExecution.executedPlan.toString
    // physical node prints without the Exec suffix (TreeNode.nodeName)
    assert(plan.contains("TopKPerKey 5,"), "custom exec not planned")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      "should shuffle exactly once on the key")
    assert(!plan.contains("Sort "), "bounded-heap operator must not sort partitions")

    val got = topk.collect()
      .map(r => (r.getAs[String]("o_orderstatus"), r.getAs[Long]("o_orderkey"))).toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("o_orderstatus"), col("o_orderkey")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("range join: empty intervals (end == start) match zero points, both paths") {
    val points = Seq((5L, 1.0), (15L, 2.0), (25L, 3.0)).toDF("t", "v")
    val intervals = Seq(
      (1L, 10L, 30L),  // covers t=15, t=25
      (2L, 10L, 10L),  // EMPTY: must match nothing (Spark's descending
                       // sequence(s, s-1) would wrongly yield 2 bins)
      (3L, 0L, 10L))   // covers t=5
      .toDF("iv", "s", "e")
    val matched = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", 10L)
      .groupBy(col("iv")).count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(matched == Map(1L -> 2L, 3L -> 1L))
    val partials = RangeJoin.pointPartialsPerInterval(points, "t", "v",
        intervals, "s", "e", 10L)
      .groupBy(col("iv")).agg(sum(col("__cnt")).as("n"), sum(col("__sum")).as("sv"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(partials == Map(1L -> (2L, 5.0), 3L -> (1L, 1.0)))
  }

  test("driver-side and distributed transitive closure agree") {
    val edges = Tables(spark, sfDir, "part").filter(col("p_partkey") >= 2)
      .select(col("p_partkey").as("child"),
        (col("p_partkey") / 2).cast("long").as("parent"))
    val driver = graft.p6.Ontology.transitiveClosure(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val distributed = graft.p6.Ontology.transitiveClosure(edges, driverMaxEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(driver == distributed && driver.nonEmpty)
  }

  test("bloom join: no false negatives, real pruning, exact results") {
    import graft.operators.BloomJoin
    import org.apache.spark.sql.graft.BloomApi
    val li = Tables(spark, sfDir, "lineitem")
    val hi = Tables(spark, sfDir, "orders").filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"))
    // exactness: bloom-pruned join == plain join
    val plain = li.join(hi, col("l_orderkey") === col("o_orderkey")).count()
    val bloomed = BloomJoin.join(li, hi, "l_orderkey", "o_orderkey").count()
    assert(bloomed == plain && plain > 0)
    // no false negatives: every true key survives the pre-filter
    val prunedKeys = BloomJoin.pruned(li, hi, "l_orderkey", "o_orderkey")
      .select(col("l_orderkey")).distinct()
    val lost = li.join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey")).distinct()
      .except(prunedKeys).count()
    assert(lost == 0)
    // real pruning: non-matching rows are mostly dropped (fp rate small)
    val totalRows = li.count()
    val keptRows = BloomJoin.pruned(li, hi, "l_orderkey", "o_orderkey").count()
    val matchRows = plain
    val fpRate = (keptRows - matchRows).toDouble / math.max(1, totalRows - matchRows)
    assert(fpRate < 0.05, s"bloom fp rate too high: $fpRate")
    // string keys round-trip too, and interpreted eval agrees with codegen
    val strBloom = hi.select(col("o_orderkey").cast("string").as("k"))
      .agg(BloomApi.bloom_agg(col("k"), 1 << 16).as("b"))
    val probed = li.select(col("l_orderkey").cast("string").as("k")).distinct()
      .crossJoin(broadcast(strBloom))
      .select(col("k"), BloomApi.bloom_might_contain(col("b"), col("k")).as("hit"))
    val hitsCodegen = probed.filter(col("hit")).count()
    // every hi key that actually appears in lineitem must hit (+ fps)
    val trueHits = li.select(col("l_orderkey")).distinct()
      .join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(hitsCodegen >= trueHits && trueHits > 0)
  }

  test("bloom probe survives codegen-strict mode (no silent interpreted fallback)") {
    import org.apache.spark.sql.graft.BloomApi
    // spark.sql.codegen.fallback=false turns a Janino CompileException
    // into a hard failure instead of a quiet drop to interpreted
    // execution — exactly how the MODULE$ forwarder bug hid for three
    // rounds while the plans still returned correct rows.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val hi = Tables(spark, sfDir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"))
      val bloom = hi.agg(BloomApi.bloom_agg(col("o_orderkey"), 1 << 16).as("b"))
      val hits = Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey")).distinct()
        .crossJoin(broadcast(bloom))
        .filter(BloomApi.bloom_might_contain(col("b"), col("l_orderkey")))
        .count()
      assert(hits > 0)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("partitionBy write reads back with partition pruning at the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("part_prune").toString
    val orders = Tables(spark, sfDir, "orders")
    orders.withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").mode("overwrite").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("status") === "F")
    val scans = read.queryExecution.sparkPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "status filter must prune partitions, not scan-and-filter")
    assert(read.count() == orders.filter(col("o_orderstatus") === "F").count())
  }

  test("bucketed tables join without a shuffle") {
    val li = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    try {
      val joined = spark.table("li_bucketed").join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("WarmStore: content change re-keys the store and reclaims the superseded one") {
    import graft.sources.WarmStore
    val tmp = java.nio.file.Files.createTempDirectory("graft_ws_src")
    val src = tmp.resolve("documents.parquet")
    java.nio.file.Files.writeString(src, "v1")
    val (s1, ready1) = WarmStore.resolve(tmp.toString, "documents", "graft_ws_test_")
    assert(!ready1)
    java.nio.file.Files.createDirectories(s1)
    java.nio.file.Files.writeString(s1.resolve("_SUCCESS"), "")
    WarmStore.markSource(s1, tmp.toString)
    // same content -> same store, now warm
    val (s1b, ready1b) = WarmStore.resolve(tmp.toString, "documents", "graft_ws_test_")
    assert(s1b == s1 && ready1b)
    // changed content -> new fingerprint -> different cold store, and
    // the superseded store for this source dir is reclaimed
    java.nio.file.Files.writeString(src, "v2-with-different-size")
    val (s2, ready2) = WarmStore.resolve(tmp.toString, "documents", "graft_ws_test_")
    assert(s2 != s1 && !ready2)
    assert(!java.nio.file.Files.exists(s1),
      "superseded store was not reclaimed")
    // a different parameterization keys its own store
    val (s3, _) = WarmStore.resolve(tmp.toString, "documents",
      "graft_ws_test_", extraKey = "k=2")
    assert(s3 != s2)
  }

  test("WarmStore: differently-parameterized SIBLING stores coexist — cleanup only supersedes same-key stores") {
    import graft.sources.WarmStore
    // the r12 regression: ann_ivf's refined-index store (extraKey ri2)
    // and seed-index store (ri0) share prefix AND source — building
    // one must NOT reclaim the other (they are siblings, not
    // supersessions of each other)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ws_sib")
    val src = tmp.resolve("documents.parquet")
    java.nio.file.Files.writeString(src, "v1")
    val (a, _) = WarmStore.resolve(tmp.toString, "documents",
      "graft_ws_sib_", extraKey = "ri0")
    WarmStore.publish(a, extraKey = "ri0") { t =>
      java.nio.file.Files.writeString(t.resolve("_SUCCESS"), "")
    }
    WarmStore.markSource(a, tmp.toString)
    // building the differently-keyed sibling (cold -> cleanup runs)
    val (b, readyB) = WarmStore.resolve(tmp.toString, "documents",
      "graft_ws_sib_", extraKey = "ri2")
    assert(!readyB && b != a)
    assert(java.nio.file.Files.exists(a.resolve("_SUCCESS")),
      "sibling store with a different extraKey was wrongly reclaimed")
    WarmStore.publish(b, extraKey = "ri2") { t =>
      java.nio.file.Files.writeString(t.resolve("_SUCCESS"), "")
    }
    WarmStore.markSource(b, tmp.toString)
    // content change: each key's store supersedes only its OWN
    // predecessor
    java.nio.file.Files.writeString(src, "v2-with-different-size")
    val (a2, _) = WarmStore.resolve(tmp.toString, "documents",
      "graft_ws_sib_", extraKey = "ri0")
    assert(a2 != a)
    assert(!java.nio.file.Files.exists(a),
      "same-key superseded store was not reclaimed")
    assert(java.nio.file.Files.exists(b.resolve("_SUCCESS")),
      "other-key sibling was reclaimed by a same-source rebuild")
  }

  test("WarmStore.publish: atomic build — loser of a race is discarded, winner's store intact") {
    import graft.sources.WarmStore
    val tmp = java.nio.file.Files.createTempDirectory("graft_ws_pub")
    val store = tmp.resolve("graft_ws_pub_deadbeef")
    // winner publishes a complete store
    val won = WarmStore.publish(store, extraKey = "k1") { t =>
      java.nio.file.Files.writeString(t.resolve("part"), "winner")
      java.nio.file.Files.writeString(t.resolve("_READY"), "ok")
    }
    assert(won)
    assert(java.nio.file.Files.readString(store.resolve("part")) == "winner")
    assert(java.nio.file.Files.readString(store.resolve("_extra_key")) == "k1")
    // a second builder loses the race: its temp is discarded, the
    // winner's store is untouched, and the call reports the loss
    val lost = WarmStore.publish(store, extraKey = "k1") { t =>
      java.nio.file.Files.writeString(t.resolve("part"), "loser")
      java.nio.file.Files.writeString(t.resolve("_READY"), "ok")
    }
    assert(!lost)
    assert(java.nio.file.Files.readString(store.resolve("part")) == "winner")
    // no temp debris survives either outcome
    val ls = java.nio.file.Files.list(tmp)
    val names = try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.map(_.getFileName.toString).toList
    } finally ls.close()
    assert(names == List("graft_ws_pub_deadbeef"), names.toString)
    // a failing build never leaves a half-store behind
    intercept[RuntimeException] {
      WarmStore.publish(tmp.resolve("graft_ws_pub_other"), "k") { _ =>
        throw new RuntimeException("boom")
      }
    }
    assert(!java.nio.file.Files.exists(tmp.resolve("graft_ws_pub_other")))
  }

  test("BucketedLayout.append: the grown twin still joins exchange-free and loses no rows") {
    import graft.sources.BucketedLayout
    // an ISOLATED copy of the source — appending into the shared
    // fingerprint-keyed twin would silently change bucketed_join's
    // oracle-gated answer for every later run against this tmpdir
    val srcDir = java.nio.file.Files.createTempDirectory("graft_bkt_append")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sfDir, "lineitem.parquet"),
      srcDir.resolve("lineitem.parquet"))
    val twin = BucketedLayout.bucketedTable(spark, srcDir.toString,
      "lineitem", "l_orderkey", 8)
    val before = twin.count()
    // a re-keyed increment (distinct ids so the union is checkable)
    val batch = Tables(spark, sfDir, "lineitem").limit(200)
      .withColumn("l_orderkey", col("l_orderkey") + 1000000L)
    BucketedLayout.append(spark, twin, batch)
    val grown = spark.table(twin.queryExecution.analyzed.collectLeaves().collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation
        if r.catalogTable.isDefined => r.catalogTable.get.identifier.table
    }.get)
    assert(grown.count() == before + 200)
    assert(grown.filter(col("l_orderkey") >= 1000000L).count() == 200)
    // the grown layout still carries the bucket spec: self-join with no exchange
    val joined = grown.hint("merge").join(
      grown.select(col("l_orderkey").as("k"), col("l_quantity").as("q2")),
      col("l_orderkey") === col("k"))
    val plan = joined.queryExecution.sparkPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"append broke the bucketed layout:\n${plan.toString.take(1500)}")
  }

  test("BucketedLayout: twin matches the source; re-registration reuses files without rewriting") {
    import graft.sources.BucketedLayout
    val twin = BucketedLayout.bucketedTable(spark, sfDir, "orders", "o_orderkey", 8)
    val src = Tables(spark, sfDir, "orders")
    // layout must never change content
    assert(twin.count() == src.count())
    assert(twin.exceptAll(src).isEmpty && src.exceptAll(twin).isEmpty)
    // find the twin's files and record mtimes
    val name = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_bkt_orders_"))
      .collect().map(_.name).head
    val loc = java.nio.file.Paths.get(new java.net.URI(
      spark.sql(s"DESCRIBE TABLE EXTENDED $name")
        .filter(col("col_name") === "Location")
        .collect().head.getString(1)))
    def mtimes = {
      val st = java.nio.file.Files.list(loc)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(p =>
          p.getFileName.toString -> java.nio.file.Files.getLastModifiedTime(p))
          .toMap
      } finally st.close()
    }
    val before = mtimes
    // simulate a new JVM: catalog forgets the table, parquet survives
    spark.sql(s"DROP TABLE $name")
    val again = BucketedLayout.bucketedTable(spark, sfDir, "orders", "o_orderkey", 8)
    assert(mtimes == before, "warm re-registration rewrote the layout files")
    // the re-registered twin still carries the bucket spec (exchange-free join)
    val joined = again.join(again.select(col("o_orderkey").as("k"), col("o_totalprice").as("p2")),
      col("o_orderkey") === col("k"))
    val plan = joined.queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"re-registered twin lost its bucket spec:\n${plan.take(1500)}")
  }
}
