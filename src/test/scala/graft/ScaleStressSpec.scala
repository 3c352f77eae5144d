package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Similarity, Skew}

/** Adversarial scale-stress suite: every scaladoc in this library that
  * claims a skew/hot-bucket defense gets exercised here on data BUILT
  * to trigger it, at ~10x the sf0.1 volumes (1M events, 50k docs, 20k
  * vectors). Benign corpora leave the defenses dormant (the
  * hot-bucket test in DedupSpec proves exactly that), so without this
  * suite the 100-TB claims rest on reading the code, not running it.
  *
  * Corpora are generated once into a scratch dir (never
  * /root/testdata) and read back through parquet so each operator
  * sees the real scan path. Each scenario prints a `[stress]`
  * wall-time line; the round-7 numbers are recorded in BASELINE.md.
  *
  * Scenarios, one per documented defense:
  *   - one user holding 50% of 1M events  -> salted agg/join stay exact
  *   - 5k identical boilerplate docs      -> cappedPairs bounds pairs,
  *     hotBucketReport names the bucket, dedup still resolves to 1
  *   - one mega-domain at 90% of 50k rows -> exactQuotaSample matches
  *     the naive global rank with a bounded driver histogram
  *   - 19k near-constant embeddings       -> cosineNearDupPairs stays
  *     linear via star pairs instead of ~180M bucket pairs
  */
class ScaleStressSpec extends SparkSpec {
  import spark.implicits._

  private val scratch = java.nio.file.Paths.get(
    sys.props("java.io.tmpdir"), "graft_stress_r7")

  /** Generate-once-per-scratch-dir, then always read via parquet. */
  private def corpus(name: String)(gen: => DataFrame): DataFrame = {
    val p = scratch.resolve(name)
    if (!java.nio.file.Files.exists(p.resolve("_SUCCESS")))
      gen.write.mode("overwrite").parquet(p.toString)
    spark.read.parquet(p.toString)
  }

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $name%-28s ${s}%7.2f s")
    r
  }

  // ---------------------------------------------------------------- A
  // 1,000,000 events, user 42 holds 500,000 of them (50%).
  private lazy val skewedEvents = corpus("events_skew") {
    spark.range(1000000L).select(
      when(col("id") < 500000L, 42L)
        .otherwise(col("id") % 100000L + 100L).as("user_id"),
      col("id").as("event_id"),
      (col("id") % 97).cast("double").as("value"))
  }

  test("skewed events: salted aggregation is exact under a 50%-hot key") {
    val (salted, plain) = timed("salted_agg_1m") {
      val s = Skew.saltedSum(skewedEvents, col("user_id"), col("value"),
        salts = 32, keyName = "user_id", sumName = "total")
      val p = skewedEvents.groupBy(col("user_id"))
        .agg(sum(col("value")).as("total"), count(lit(1)).as("total_count"))
      // join-compare: zero groups may disagree on sum or count
      val mismatches = s.join(p, Seq("user_id"))
        .filter(s("total") =!= p("total") || s("total_count") =!= p("total_count"))
        .count()
      (mismatches, p.count())
    }
    assert(salted == 0L)
    assert(plain == 100001L) // user 42 + 100000 tail users (ids 100..100099 via %)
  }

  test("skewed events: salted join replicates the dim and loses no rows") {
    val users = spark.range(100100L).select(col("id").as("uid"),
      (col("id") % 7).as("segment"))
    val n = timed("salted_join_1m") {
      Skew.saltedJoin(skewedEvents, users, "user_id", "uid", salts = 16).count()
    }
    assert(n == 1000000L) // every event matched exactly once
  }

  // ---------------------------------------------------------------- B
  // 50,000 docs; ids 0..4999 are ONE identical 40-token boilerplate,
  // the rest are pseudo-random 40-token docs over a 5k-word vocab.
  private lazy val boilerDocs = corpus("docs_boiler") {
    val boiler = (0 until 40).map(i => s"b$i").mkString(" ")
    spark.range(50000L).select(
      col("id").as("doc_id"),
      when(col("id") < 5000L, lit(boiler))
        .otherwise(array_join(transform(sequence(lit(0), lit(39)),
          i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(5000)))), " "))
        .as("text"))
  }

  test("boilerplate corpus: hot bucket is reported and candidate pairs stay linear") {
    val (reported, skipped, nPairs) = timed("boiler_candidates_50k") {
      val buckets = Dedup.minhashBuckets(boilerDocs, "doc_id", "text")
      val report = Dedup.hotBucketReport(buckets).collect()
      val pairs = Dedup.minhashCandidates(boilerDocs, "doc_id", "text").count()
      (report, report.map(_.getLong(3)).sum, pairs)
    }
    // the 5000-member boilerplate bucket shows up in EVERY band
    assert(reported.nonEmpty && reported.map(_.getLong(2)).max >= 5000L)
    // the star degradation skipped the quadratic blowup: ~12.5M pairs
    // per hot band never materialized
    assert(skipped > 10000000L, s"expected >10M skipped pairs, got $skipped")
    // what DID materialize is linear: 4999 star pairs for the hot
    // bucket (+ organic noise), nowhere near the 12.5M uncapped
    assert(nPairs >= 4999L && nPairs < 200000L, s"pair count $nPairs")
  }

  test("boilerplate corpus: dedup still resolves the 5k duplicates to one survivor") {
    val survivors = timed("boiler_dedup_50k") {
      Dedup.dedupDocuments(boilerDocs, "doc_id", "text", jaccardThreshold = 0.5)
        .select(col("doc_id")).collect().map(_.getLong(0))
    }
    assert(survivors.count(_ < 5000L) == 1) // one of the 5000 identical lives
    assert(survivors.min == 0L)             // min-id canonicalization
    assert(survivors.length == 45001)       // all organic docs survive
  }

  test("boilerplate increment: inc-vs-base candidates stay linear, copies die, novel docs live") {
    // increment = 1000 MORE copies of the boilerplate (sharing the
    // base's degenerate bucket — the |inc| x |base| blowup scenario
    // incBaseCandidates caps) + 1000 novel docs
    val boiler = (0 until 40).map(i => s"b$i").mkString(" ")
    val inc = spark.range(50000L, 52000L).select(
      col("id").as("doc_id"),
      when(col("id") < 51000L, lit(boiler))
        .otherwise(array_join(transform(sequence(lit(0), lit(39)),
          i => concat(lit("n"), pmod(xxhash64(col("id"), i), lit(5000)))), " "))
        .as("text"))
    val survivors = timed("boiler_increment_50k") {
      Dedup.dedupIncrement(boilerDocs, inc, "doc_id", "text",
          jaccardThreshold = 0.5)
        .select(col("doc_id")).collect().map(_.getLong(0))
    }
    // base wins: every boilerplate copy dies against the base corpus;
    // every novel doc survives
    assert(survivors.forall(_ >= 51000L), s"boiler copies survived: " +
      survivors.filter(_ < 51000L).take(5).mkString(", "))
    assert(survivors.length == 1000, s"got ${survivors.length} survivors")
  }

  test("boilerplate corpus: containment hot postings star-degrade, candidates stay linear") {
    // The exact adversary VERDICT r12 flagged: on the 5k-identical
    // block every shingle has df=5000, so the uncapped rarest-df
    // prefix would join ~0.2·|sh|·5000² ≈ 190M candidate rows for the
    // boiler block alone. The hot-posting tier must (a) report the
    // degradation, (b) emit exactly the bidirectional star around the
    // min-id rep for the block, (c) leave organic pairs untouched.
    val (report, skipped, boilerPairs, totalPairs) = timed("boiler_containment_50k") {
      val rep = Dedup.hotPostingReport(boilerDocs, "doc_id", "text").collect()
      val pairs = Dedup.containmentPairs(boilerDocs, "doc_id", "text")
        .select(col("a"), col("b"))
        .persist()
      try {
        val boiler = pairs.filter(col("a") < 5000L && col("b") < 5000L).count()
        (rep, rep.map(_.getAs[Long]("skipped_pairs")).sum, boiler, pairs.count())
      } finally { pairs.unpersist(false); () }
    }
    // every boiler shingle (40 tokens -> 38 distinct 3-shingles) is hot
    assert(report.nonEmpty && report.forall(_.getAs[Long]("df") == 5000L))
    assert(report.length == 38, s"expected 38 hot shingles, got ${report.length}")
    // the quadratic never materialized: ~25M ordered pairs skipped PER
    // hot shingle
    assert(skipped > 100000000L, s"expected >100M skipped pairs, got $skipped")
    // what DID materialize for the block is exactly the star: (0,x)
    // and (x,0) for x in 1..4999, all verifying at containment 1.0
    assert(boilerPairs == 2L * 4999L, s"boiler block pairs: $boilerPairs")
    // organic noise stays bounded — nowhere near the 190M uncapped
    assert(totalPairs < 200000L, s"total pair count $totalPairs")
  }

  test("boilerplate corpus: distributed CC fixpoint equals the driver union-find at volume") {
    // the two-tier connectedComponents normally closes this graph on
    // the driver; force the distributed min-label-propagation path and
    // require identical components over the ~40k-edge star graph the
    // capped candidates produce
    val (viaDriver, viaFixpoint) = timed("boiler_cc_50k") {
      val pairs = Dedup.jaccardVerify(
          Dedup.minhashCandidates(boilerDocs, "doc_id", "text"),
          boilerDocs, "doc_id", "text")
        .filter(col("jaccard") >= 0.5)
        .select(col("a"), col("b"))
        .persist() // consumed by BOTH engines; don't re-verify per call
      try {
        val d = Dedup.connectedComponents(pairs)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val f = Dedup.connectedComponents(pairs, driverMaxPairs = 0L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (d, f)
      } finally { pairs.unpersist(false); () }
    }
    assert(viaDriver.nonEmpty && viaDriver == viaFixpoint)
    // the 5k identical docs form one component rooted at doc 0
    assert(viaDriver.count(_._2 == 0L) >= 4999)
  }

  // ---------------------------------------------------------------- B2
  // Retrieval-block adversary (VERDICT r12 #7): a corpus where the
  // query term "spark" appears in 90% of 50k docs — the posting
  // explode's hottest possible key. Expected fine by construction
  // (the scan-side isin filter is linear, partial aggregation absorbs
  // the skewed term's 45k rows before the df shuffle, the hot term's
  // ~0.1 idf cannot drown the ranking) — this scenario PROVES it with
  // wall-time + row-count + ranking assertions instead of reading the
  // plan. Embeddings ship alongside so the hybrid and MMR stages run
  // their real rerank path over the skewed candidates.
  private lazy val retrSkewDir: String = {
    val p = scratch.resolve("retr_skew")
    if (!java.nio.file.Files.exists(
        p.resolve("documents.parquet").resolve("_SUCCESS"))) {
      val filler = array_join(transform(sequence(lit(0), lit(25)),
        i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(5000)))), " ")
      spark.range(50000L).select(
        col("id").as("doc_id"),
        when(col("id") < 100L,
          concat(lit("join window hash spark spark spark "), filler))
          .when(col("id") < 45000L, concat(lit("spark spark spark "), filler))
          .otherwise(filler).as("text"))
        .write.mode("overwrite").parquet(p.resolve("documents.parquet").toString)
      spark.range(50000L).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)),
          j => (pmod(xxhash64(col("id"), j), lit(1000)).cast("double") / 500.0
            - 1.0).cast("float")).as("embedding"))
        .write.mode("overwrite").parquet(p.resolve("embeddings.parquet").toString)
    }
    p.toString
  }

  test("retrieval skew: a 90%-df query term leaves bm25/hybrid/mmr linear and correctly ranked") {
    val (bm25, hybrid, mmr) = timed("retr_skew_50k") {
      val b = graft.p6.Queries.all("bm25_topk")(spark, retrSkewDir).collect()
      val h = graft.p6.Queries.all("hybrid_retrieval")(spark, retrSkewDir).collect()
      val m = graft.p6.Queries.all("mmr_rerank")(spark, retrSkewDir).collect()
      (b, h, m)
    }
    assert(bm25.length == 15 && hybrid.length == 10 && mmr.length == 10)
    // the rare terms (df=100, idf ~6.2) dominate the hot term (idf
    // ~0.105): every top-15 doc is one of the 100 rare-term docs —
    // the hot posting cannot drown the ranking
    assert(bm25.forall(_.getLong(0) < 100L),
      s"hot-term docs leaked into top-15: ${bm25.map(_.getLong(0)).mkString(",")}")
    assert(hybrid.forall(_.getLong(0) < 100L))
    assert(mmr.forall(_.getLong(1) < 100L)) // (rank, doc_id, mmr)
  }

  // ---------------------------------------------------------------- C
  // 50,000 rows; domain "mega" holds 45,000 (90%), 50 tail domains
  // hold 100 each.
  private lazy val megaDomain = corpus("docs_mega") {
    spark.range(50000L).select(
      col("id").as("row_id"),
      when(col("id") < 45000L, lit("mega"))
        .otherwise(concat(lit("d"), col("id") % 50)).as("dom"))
  }

  test("mega-domain mixture: exact quota under 90% skew, equal to the naive global rank") {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col("row_id").cast("string"))
    val quotas = Map("mega" -> 10000L, "d7" -> 50L)
    val got = timed("mega_quota_50k") {
      Curation.exactQuotaSample(megaDomain, "dom", h, col("row_id"), quotas)
        .select(col("row_id"), col("dom")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    }
    assert(got.count(_._2 == "mega") == 10000)
    assert(got.count(_._2 == "d7") == 50)
    val naive = megaDomain.withColumn("__h", h)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dom")).orderBy(col("__h"), col("row_id"))))
      .filter(col("dom") === "mega" && col("rn") <= 10000 ||
        col("dom") === "d7" && col("rn") <= 50)
      .select(col("row_id"), col("dom")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == naive)
  }

  test("mega-domain cap: executor-side perDomainCap equals the naive rank at volume") {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col("row_id").cast("string"))
    val got = timed("mega_domain_cap_50k") {
      Curation.perDomainCap(megaDomain, "dom", h, col("row_id"), cap = 1000L)
        .select(col("row_id")).collect().map(_.getLong(0)).toSet
    }
    // mega capped to 1000; all 50 tail domains (100 rows each) pass whole
    assert(got.size == 1000 + 50 * 100)
    val naive = megaDomain.withColumn("__h", h)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dom")).orderBy(col("__h"), col("row_id"))))
      .filter(col("rn") <= 1000)
      .select(col("row_id")).collect().map(_.getLong(0)).toSet
    assert(got == naive)
  }

  // ---------------------------------------------------------------- D
  // 20,000 vectors, dim 32; ids 2..18999 are the constant direction
  // plus one tiny per-id jitter component; ids 0 and 1 are EXACTLY the
  // base (the planted pair); ids 19000+ are diverse sign patterns.
  private lazy val constEmbeddings = corpus("emb_const") {
    val base = array((0 until 32).map(_ => lit(1.0)): _*)
    spark.range(20000L).select(
      col("id").as("vec_id"),
      when(col("id") < 2L, base)
        .when(col("id") < 19000L,
          transform(base, (_, j) =>
            when(j === pmod(col("id"), lit(32)).cast("int"),
              lit(1.0) + pmod(col("id"), lit(100)).cast("double") / lit(1e6))
              .otherwise(lit(1.0))))
        .otherwise(transform(sequence(lit(0), lit(31)),
          j => when(pmod(xxhash64(col("id"), j), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0))))
        .as("embedding"))
  }

  test("skewed events: gap sessions survive a 500k-event single-user window partition") {
    // the hot user's events land in ONE window partition — the real
    // skew pain point for lag/window sessionization; both session
    // engines must complete and agree under it
    import org.apache.spark.sql.expressions.Window
    val gap = 1800000L
    val ev = corpus("events_skew_ts") {
      spark.range(1000000L).select(
        when(col("id") < 500000L, 42L)
          .otherwise(col("id") % 100000L + 100L).as("user_id"),
        col("id").as("event_id"),
        // hot user: one event per second -> one giant session; tail
        // users: sparse events -> mostly 1-event sessions
        timestamp_millis(lit(1704067200000L) + col("id") * 1000L).as("ts"))
    }
    val (viaLag, viaSessionWindow) = timed("sessionize_skew_1m") {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val lagSessions = ev
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev").isNull ||
            unix_millis(col("ts")) - unix_millis(col("prev")) > gap, 1L)
            .otherwise(0L))
        .agg(sum(col("is_new"))).collect().head.getLong(0)
      val sw = ev.groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes")).count()
        .count()
      (lagSessions, sw)
    }
    assert(viaLag == viaSessionWindow, s"lag=$viaLag session_window=$viaSessionWindow")
    assert(viaLag >= 100000L) // at least one session per user
  }

  test("collapsed embedding space: semDedup stays linear and still drops the duplicates") {
    val dropped = timed("semdedup_20k") {
      Similarity.semDedup(constEmbeddings, "vec_id", "embedding",
          nlist = 8, refineIters = 0, threshold = 0.999)
        .collect().map(_.getLong(0))
    }
    // the 19k near-constant vectors collapse to at most one survivor
    // PER CLUSTER (each capped cluster keeps its min-id representative;
    // the 8 near-identical seeds may split them across clusters), and
    // the 1000 diverse vectors are never dropped
    assert(dropped.length >= 19000 - 8 && dropped.length <= 18999,
      s"dropped ${dropped.length}")
    assert(dropped.forall(id => id >= 1L && id < 19000L))
  }

  test("degenerate-bucket ANN: capped membership bounds the rerank, top-k stays valid") {
    // 19k near-constant vectors share every sign bucket; uncapped, each
    // of the 5 queries would rerank the whole bucket. With the cap the
    // candidate side is at most maxBucket ids per (table, bucket), and
    // because degenerate-bucket members are near-identical BY
    // CONSTRUCTION, the truncated top-k still returns cosine ~1 rows.
    val qids = spark.range(5L).select(col("id").as("qid"))
    val topk = timed("ann_batch_degenerate_20k") {
      Similarity.annTopKBatch(constEmbeddings, "vec_id", "embedding", qids,
          k = 10, bits = 8, tables = 4, maxBucket = 512)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    val byQ = topk.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet)
    // full k for every query, all at cosine ~1.0 (the bucket is honest)
    assert(byQ.values.forall(_.length == 10))
    assert(topk.forall(_._3 >= 0.9999), topk.filter(_._3 < 0.9999).take(3).mkString(", "))
  }

  test("collapsed embedding space: IVF-PQ degrades to a bounded ADC scan, top-k stays valid") {
    // all 19k near-constant vectors land in one coarse list, so a
    // probing query ADC-scans that whole list — the designed worst
    // case: the scan is m table lookups PER CANDIDATE (linear, no
    // pairwise blowup), TakeOrdered bounds the rerank set, and the
    // exact rerank returns cosine ~1 rows because the hot list's
    // members are near-identical by construction
    import graft.operators.Similarity
    val prep = Similarity.prepared(constEmbeddings, "vec_id", "embedding")
    val (cents, _, cb, encoded) = timed("ivfpq_index_degenerate_20k") {
      val t = Similarity.ivfPqIndex(prep, nlist = 8, m = 8, ksub = 16,
        iters = 1, sampleCap = 2000L)
      t._4.count() // materialize the encode pass inside the timer
      t
    }
    val topk = timed("ivfpq_search_degenerate_20k") {
      Similarity.ivfPqSearch(prep, encoded, cents, cb, queryId = 1L,
        k = 10, nprobe = 2, rerank = 512)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
    }
    assert(topk.length == 10)
    assert(topk.forall(_._2 >= 0.9999),
      topk.filter(_._2 < 0.9999).take(3).mkString(", "))
  }

  test("exact pair mining at 20k vectors: 200M-pair space, prescreen prunes, blocks balance") {
    // diverse random +/-1 vectors (expected cosine ~0, sd ~ 1/sqrt(32))
    // with 50 PLANTED near-identical pairs the miner must return: the
    // inherent work is the 2x10^8-pair quadratic prescreen, run on int8
    // rows across blocks*(blocks+1)/2 uniform block-pair tasks
    val emb = corpus("emb_pairs_20k") {
      val planted = transform(sequence(lit(0), lit(31)),
        j => when(pmod(xxhash64(pmod(col("id"), lit(50L)), j), lit(2)) === 0,
          lit(1.0)).otherwise(lit(-1.0)))
      val flip = transform(sequence(lit(0), lit(31)),
        j => when(j === 0 && col("id") >= 50L, lit(-1.0)).otherwise(lit(1.0)))
      spark.range(20000L).select(
        col("id").as("vec_id"),
        when(col("id") < 100L,
          zip_with(planted, flip, (a, b) => a * b)) // 50 pairs, 1 flipped sign
          .otherwise(transform(sequence(lit(0), lit(31)),
            j => when(pmod(xxhash64(col("id"), j, lit(7)), lit(2)) === 0,
              lit(1.0)).otherwise(lit(-1.0)))).as("embedding"))
    }
    val pairs = timed("exact_pairs_20k") {
      Similarity.exactCosinePairs(emb, "vec_id", "embedding",
          threshold = 0.9, blocks = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    // every planted pair (i, i+50) survives at cos = 30/32 = 0.9375;
    // random +/-1 pairs at cos >= 0.9 are ~impossible (needs 31+/32
    // agreeing signs)
    val planted = pairs.filter(p => p._2 == p._1 + 50L && p._1 < 50L)
    assert(planted.length == 50, s"planted pairs found: ${planted.length}")
    assert(planted.forall(_._3 == 0.9375))
    assert(pairs.length < 200, s"expected ~50 pairs, got ${pairs.length}")
  }

  test("near-constant embeddings: near-dup pairs stay linear via the star degradation") {
    val (pairs, n) = timed("emb_neardup_20k") {
      val p = Similarity.cosineNearDupPairs(constEmbeddings, "vec_id", "embedding",
        threshold = 0.99, bits = 10)
      val rows = p.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      (rows, rows.length.toLong)
    }
    // 18,998 star pairs from the one degenerate bucket (+ organic
    // noise), not the ~180M intra-bucket enumeration
    assert(n >= 18998L && n < 30000L, s"pair count $n")
    // the planted exact duplicate surfaces through the representative
    val planted = pairs.find(p => p._1 == 0L && p._2 == 1L)
    assert(planted.exists(_._3 == 1.0), s"planted pair missing: $planted")
  }

  // ---------------------------------------------------------------- E
  // 100x sf0.1 (round-8): the 10x scenarios amortize some driver-side
  // and single-partition costs that another order of magnitude
  // exposes. Same adversarial shapes, 500k docs / 10M events, still on
  // the deliberately undersized shared local[4] session (harsher than
  // the 128 GiB local[32] the box could offer).

  private lazy val boilerDocs500k = corpus("docs_boiler_500k") {
    val boiler = (0 until 40).map(i => s"b$i").mkString(" ")
    spark.range(500000L).select(
      col("id").as("doc_id"),
      when(col("id") < 50000L, lit(boiler))
        .otherwise(array_join(transform(sequence(lit(0), lit(39)),
          i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(50000)))), " "))
        .as("text"))
  }

  test("100x boilerplate corpus: 50k identical docs in 500k still dedup linearly") {
    val docs = boilerDocs500k
    val survivors = timed("boiler_dedup_500k") {
      Dedup.dedupDocuments(docs, "doc_id", "text", jaccardThreshold = 0.5)
        .select(col("doc_id")).collect().map(_.getLong(0))
    }
    // one survivor from the 50k identical docs, min-id canonical; the
    // 450k organic docs (5x the vocab of the 10x corpus, so organic
    // near-dups stay rare) survive minus any true organic dups
    assert(survivors.count(_ < 50000L) == 1)
    assert(survivors.min == 0L)
    assert(survivors.length >= 449000 && survivors.length <= 450001,
      s"got ${survivors.length} survivors")
  }

  test("100x boilerplate increment: 20k increment vs 500k base sharing one degenerate bucket") {
    // the |inc| x |base| blowup scenario at 100x: 10k MORE copies of
    // the boilerplate (every one collides with the base's 50k-member
    // bucket in every band — 10k x 50k = 500M uncapped inc-base pairs)
    // + 10k novel docs on a vocabulary disjoint from the base's
    val boiler = (0 until 40).map(i => s"b$i").mkString(" ")
    val inc = corpus("docs_boiler_inc_20k") {
      spark.range(500000L, 520000L).select(
        col("id").as("doc_id"),
        when(col("id") < 510000L, lit(boiler))
          .otherwise(array_join(transform(sequence(lit(0), lit(39)),
            i => concat(lit("x"), pmod(xxhash64(col("id"), i), lit(50000)))), " "))
          .as("text"))
    }
    val survivors = timed("boiler_increment_500k") {
      Dedup.dedupIncrement(boilerDocs500k, inc, "doc_id", "text",
          jaccardThreshold = 0.5)
        .select(col("doc_id")).collect().map(_.getLong(0))
    }
    // base wins through the capped candidate join: all 10k boilerplate
    // copies die against the base corpus, all 10k novel docs live
    assert(survivors.forall(_ >= 510000L), s"boiler copies survived: " +
      survivors.filter(_ < 510000L).take(5).mkString(", "))
    assert(survivors.length == 10000, s"got ${survivors.length} survivors")
  }

  test("100x skewed events: 5M-event single-user window partition still sessionizes") {
    import org.apache.spark.sql.expressions.Window
    val gap = 1800000L
    val ev = corpus("events_skew_ts_10m") {
      spark.range(10000000L).select(
        when(col("id") < 5000000L, 42L)
          .otherwise(col("id") % 1000000L + 100L).as("user_id"),
        col("id").as("event_id"),
        timestamp_millis(lit(1704067200000L) + col("id") * 1000L).as("ts"))
    }
    val (viaLag, viaSessionWindow) = timed("sessionize_skew_10m") {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val lagSessions = ev
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev").isNull ||
            unix_millis(col("ts")) - unix_millis(col("prev")) > gap, 1L)
            .otherwise(0L))
        .agg(sum(col("is_new"))).collect().head.getLong(0)
      val sw = ev.groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes")).count()
        .count()
      (lagSessions, sw)
    }
    assert(viaLag == viaSessionWindow, s"lag=$viaLag session_window=$viaSessionWindow")
    assert(viaLag >= 1000000L) // at least one session per user
  }

  test("boilerplate flood into the stream: near-dup bucket state caps, pairs stay linear") {
    // 2000 identical docs arrive over two micro-batches with
    // maxBucket=64: every band's bucket fills at 64 members and the
    // remaining 1936 arrivals each do ONE representative popcount —
    // state and per-arrival work both bounded, no 2M-pair blowup.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val flood = (0L until 2000L).map(i => (i, "the same boilerplate line over and over"))
      val stream = MemoryStream[(Long, String)]
      val q = graft.streaming.EventStreams.streamingNearDup(
          stream.toDF().toDF("doc_id", "text"), maxBucket = 64)
        .writeStream.format("memory").queryName("flood_out")
        .outputMode("append").start()
      val n = timed("stream_flood_2k") {
        flood.grouped(1000).foreach { chunk =>
          stream.addData(chunk: _*)
          q.processAllAvailable()
        }
        q.stop()
        spark.table("flood_out").count()
      }
      val pairs = spark.table("flood_out")
        .select("a", "b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // full pairing among the first 64 (64*63/2), star pairs (0, i)
      // for the 1936 capped arrivals — and nothing quadratic beyond:
      // 2016 + 1936 distinct pairs per the cap, never ~2M
      assert(pairs.size == 64 * 63 / 2 + 1936, s"pair count ${pairs.size}")
      assert((64L until 2000L).forall(i => pairs.contains((0L, i))),
        "capped arrivals must star-link to the min-id representative")
      // emitted rows are bounded by bands x distinct pairs (identical
      // sigs collide in all 4 bands)
      assert(n <= 4L * pairs.size, s"emitted $n rows")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
