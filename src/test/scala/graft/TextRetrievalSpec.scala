package graft

import org.apache.spark.sql.functions._

/** Specs for the retrieval/boilerplate entries: naive re-computations
  * over tiny hand-built corpora (where every df / tf / idf is
  * checkable by hand) must equal the registry entries run over the
  * same frames.
  */
class TextRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def entry(name: String, docs: org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files
      .createTempDirectory("textretr").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try graft.p6.Queries.all(name)(spark, dir).collect()
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("bpe_train: single-token corpus exhausts pairs — fewer merges, no throw") {
    // Every doc is one token: round 1 finds no adjacent pair, the
    // learner must stop early and emit ZERO merges (previously a
    // NoSuchElementException from .head() on the empty argmax frame).
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    assert(entry("bpe_train", docs).isEmpty)
    // and a corpus that exhausts after ONE merge emits exactly one:
    // "a a" has pair (a,a) once; after merging, every doc is single-token
    val docs2 = Seq((1L, "a a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val merges = entry("bpe_train", docs2)
    assert(merges.length == 1 &&
      merges(0).getString(1) == "a" && merges(0).getString(2) == "a")
  }

  test("boilerplate_strip: hand-built corpus — planted 3-gram crosses the df floor, unique text does not") {
    // K = max(5, ceil(0.004 * 7)) = 5; "the end of" appears in docs
    // 0-4 (df 5, boilerplate), "a b c" in docs 0-3 (df 4, below K).
    val boiler = "the end of"
    val near = "a b c"
    val docs = (0L to 6L).map { i =>
      val uniq = s"u$i v$i w$i x$i"
      val t =
        if (i <= 3) s"$boiler $near $uniq"
        else if (i == 4L) s"$boiler $uniq"
        else s"$near-not $uniq" // hyphen => different tokens, unique
      (i, t)
    }.toDF("doc_id", "text")
    val rows = entry("boilerplate_strip", docs)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc lands in its own bucket (ids 0-6)
    assert(rows.length == 7)
    val byBucket = rows.map(r => r._1 -> r).toMap
    // docs 0-3: 10 tokens -> 8 positions; exactly one ("the end of") is boilerplate
    (0L to 3L).foreach { b =>
      assert(byBucket(b) == ((b, 1L, 8L, 1L)), s"bucket $b: ${byBucket(b)}")
    }
    // doc 4: 7 tokens -> 5 positions, 1 boilerplate
    assert(byBucket(4L) == ((4L, 1L, 5L, 1L)))
    // docs 5-6: nothing crosses the floor
    (5L to 6L).foreach { b => assert(byBucket(b)._4 == 0L) }
  }

  test("boilerplate_strip: relative floor binds — df 5 shingle stops being boilerplate in a 1500-doc corpus") {
    // K = max(5, ceil(0.004 * 1500)) = 6, so the same df-5 plant is clean.
    val plantIn = (0L until 5L).toSet
    val docs = (0L until 1500L).map { i =>
      val t = if (plantIn(i)) s"the end of u$i v$i" else s"u$i v$i w$i x$i y$i"
      (i, t)
    }.toDF("doc_id", "text")
    val totalBp = entry("boilerplate_strip", docs).map(_.getLong(3)).sum
    assert(totalBp == 0L, s"df-5 plant flagged despite K=6 floor (n_bp_pos=$totalBp)")
  }

  test("containment_neardup: planted excerpt has containment 1.0 despite Jaccard far below the dedup threshold") {
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 8).map(i => s"w$i").mkString(" ") // C(excerpt->big)=1.0, J ~= 6/58
    val docs = Seq((10L, big), (20L, excerpt), (30L, "x1 x2 x3 x4 x5 x6 x7"))
      .toDF("doc_id", "text")
    val rows = entry("containment_neardup", docs)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(rows.toSeq == Seq((20L, 10L, 1.0)),
      s"expected only the excerpt->container pair, got ${rows.toSeq}")
  }

  test("containment_neardup: prefix filter is lossless — equals all-pairs brute force on random corpora") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val docs = (0L until 40L).map { i =>
        // skewed vocab so some shingles are corpus-common and others rare
        val n = 7 + rnd.nextInt(30)
        val words = (0 until n).map(_ => s"t${rnd.nextInt(12)}")
        // plant occasional exact prefixes of an earlier doc
        val t = if (i % 7 == 3) (0 until 9).map(k => s"p${trial}_$k").mkString(" ")
          else if (i % 7 == 5) (0 until 20).map(k => s"p${trial}_$k").mkString(" ")
          else words.mkString(" ")
        (i, t)
      }.toDF("doc_id", "text")
      val got = entry("containment_neardup", docs)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // brute force: all ordered pairs, exact distinct-3-gram containment
      val sh = docs.collect().map { r =>
        val toks = r.getString(1).trim.toLowerCase.split("\\s+")
        r.getLong(0) -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.filter(_._2.size >= 5)
      val want = (for {
        (a, sa) <- sh; (b, sb) <- sh if a != b
        inter = (sa & sb).size
        if inter.toDouble / sa.size >= 0.8
      } yield (a, b, sa.size.toLong, inter.toLong)).toSet
      assert(got == want, s"trial $trial: missing ${want -- got}, extra ${got -- want}")
      assert(want.nonEmpty, s"trial $trial: degenerate corpus, nothing verified")
    }
  }

  test("weighted_sample: equals the driver-side A-ES replay; heavy weights dominate the sample") {
    // 250 heavy (w=2000) + 250 light (w=50) docs
    val docs = (0L until 500L).map { i =>
      (i, "t", if (i < 250) 2000L else 50L)
    }.toDF("doc_id", "text", "n_chars")
    val got = entry("weighted_sample", docs)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // driver-side replay of the exact key construction
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      md.reset()
      val d = md.digest(s"$id:ws".getBytes("UTF-8"))
      val h = java.nio.ByteBuffer.wrap(d, 8, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      val u = ((h >>> 11).toDouble + 0.5) / 9007199254740992.0
      val r = BigDecimal(math.log(u) / w.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      r + 0.0
    }
    val want = (0L until 500L).map(i => (i, if (i < 250) 2000L else 50L))
      .map { case (i, w) => (i, w, key(i, w)) }
      .sortBy { case (i, _, k) => (-k, i) }
      .take(100)
    assert(got == want)
    // the E-S property: inclusion probability rises with weight —
    // with a 40x weight ratio the heavy class must dominate
    val heavy = got.count(_._2 == 2000L)
    assert(heavy >= 85, s"heavy docs in sample: $heavy/100")
  }

  test("bm25_topk: equals a driver-side naive BM25 over a hand corpus, ties broken by doc_id") {
    val docs = Seq(
      (0L, "spark join window hash spark"), // all 4 terms, tf(spark)=2
      (1L, "spark spark spark filler filler filler filler filler"),
      (2L, "join window"),
      (3L, "hash"),
      (4L, "filler only text no terms"),
      (5L, "join window"), // exact tie with doc 2 -> doc_id order
      (6L, "spark join window hash spark")) // exact tie with doc 0
      .toDF("doc_id", "text")
    val got = entry("bm25_topk", docs)
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // naive recompute
    val q = Seq("spark", "join", "window", "hash")
    val toks = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.toLowerCase.split("\\s+").toSeq).toMap
    val n = toks.size
    val sumdl = toks.values.map(_.size).sum.toDouble
    val df = q.map(t => t -> toks.count(_._2.contains(t))).toMap
    def score(id: Long): (Double, Int) = {
      val dl = toks(id).size
      val hits = q.filter(t => toks(id).contains(t))
      val s = hits.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl * n / sumdl))
      }.sum
      (BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        hits.size)
    }
    val want = toks.keys.toSeq.map(id => (id, score(id)))
      .filter(_._2._2 > 0)
      .sortBy { case (id, (s, _)) => (-s, id) }
      .map { case (id, (s, h)) => (id, s, h.toLong) }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // the two planted exact-tie pairs hold their doc_id order
    val order = got.map(_._1).toSeq
    assert(order.indexOf(0L) < order.indexOf(6L))
    assert(order.indexOf(2L) < order.indexOf(5L))
  }
}
