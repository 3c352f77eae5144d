package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: cross-
  * document chunk dedup (the CCNet "drop duplicated paragraphs" shape
  * re-expressed over token chunks, since the corpus has no newlines)
  * and exact-quota domain mixture sampling that never sorts a whole
  * domain through one task.
  *
  * Reference behaviors generalized from VarenyaJ/P6's table-at-a-time
  * curation idiom (p6/mappers.py: whole-table filter passes with issue
  * accounting); the operators here are the corpus-scale additions the
  * mandate asks for, not reference ports.
  */
object Curation {

  /** Snapshot diff between two corpus versions: one row per doc id
    * with status `added` (current only), `removed` (previous only),
    * `changed` (both, fingerprint differs), or `unchanged` — the
    * bookkeeping pass every incremental ingestion runs before deciding
    * what to re-process (only `added`+`changed` flow into the
    * re-embed / re-dedup stages; `removed` drives tombstones).
    *
    * Scale shape: each side is projected to (id, md5 fingerprint)
    * BEFORE the full-outer join, so the only thing that shuffles is
    * 32 hex chars per doc — never the text — and the join is a plain
    * co-partitioned equi-join on the id (bucketize both snapshots on
    * id and it is exchange-free, see sources.BucketedLayout).
    */
  def snapshotDiff(current: DataFrame, previous: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def fp(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(s"__id_$side"), md5(col(textCol)).as(s"__fp_$side"))
    fp(current, "cur").join(fp(previous, "prev"),
        col("__id_cur") === col("__id_prev"), "full_outer")
      .select(
        coalesce(col("__id_cur"), col("__id_prev")).as(idCol),
        when(col("__id_prev").isNull, lit("added"))
          .when(col("__id_cur").isNull, lit("removed"))
          .when(col("__fp_cur") =!= col("__fp_prev"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** One row per (doc, chunk): non-overlapping `chunkLen`-token chunks
    * with a 128-bit md5 chunk fingerprint. The trailing partial chunk
    * is kept (a shorter tail is still content worth deduplicating);
    * every doc yields at least one chunk, so per-doc accounting never
    * loses empty-ish docs. Hashing at the source keeps every
    * downstream exchange at 32 hex chars per chunk instead of the
    * chunk text itself.
    */
  def chunkInstances(docs: DataFrame, idCol: String, textCol: String,
      chunkLen: Int = 10): DataFrame = {
    require(chunkLen >= 1, s"chunk length must be >= 1 token, got $chunkLen")
    val toks = Dedup.tokens(col(textCol))
    Par.spread(docs)
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          floor((size(col("toks")) + lit(chunkLen - 1)) / lit(chunkLen))
            .cast("int") - lit(1))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        md5(concat_ws(" ",
          slice(col("toks"), col("chunk_idx") * chunkLen + 1, lit(chunkLen))))
          .as("h"))
  }

  /** CONTENT-DEFINED chunking (CDC) instances — the variable-size
    * twin of [[chunkInstances]], robust to insertions/deletions where
    * fixed-width chunking is not: inserting one token near a doc's
    * head shifts EVERY fixed 10-token chunk boundary after it (zero
    * shared chunks with the original — the dedup silently misses the
    * near-copy), while CDC draws each boundary from the CONTENT of a
    * small rolling window (split before 0-based token b iff the
    * 32-bit md5 prefix of the `window` tokens ending at b-1 is
    * ≡ 0 mod `avgChunk`), so boundaries re-synchronize right after
    * the edit and everything downstream of it chunks identically —
    * the FastCDC/LBFS idea at token granularity. Expected chunk
    * length ~avgChunk tokens; every doc yields >= 1 chunk (an
    * unsplit doc is one whole-doc chunk).
    *
    * Same output shape as [[chunkInstances]] (+ `chunk_tokens`), so
    * [[chunkKeepFirst]] composes unchanged. The md5-prefix boundary
    * decision is the DuckDB-twin trick shared with
    * [[duplicateSpansSampled]], keeping the oracle closed-form.
    */
  def cdcChunkInstances(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 4, avgChunk: Int = 16,
      useXxhash: Boolean = false, maxChunk: Int = 64): DataFrame = {
    require(window >= 1, s"rolling window must be >= 1 token, got $window")
    require(avgChunk >= 2, s"avgChunk must be >= 2, got $avgChunk")
    require(maxChunk >= avgChunk,
      s"maxChunk ($maxChunk) must be >= avgChunk ($avgChunk)")
    val toks = Dedup.tokens(col(textCol))
    // Boundary fingerprint: md5 keeps the DuckDB oracle twin;
    // `useXxhash` is the production swap — the sf10 measurement
    // (BASELINE.md round 12) shows the per-position window hash is the
    // dominant term, the same trade as duplicateSpansSampled.
    def boundaryHit(b: Column): Column = {
      val win = concat_ws(" ", slice(col("toks"), b - lit(window) + 1, lit(window)))
      if (useXxhash) pmod(xxhash64(win), lit(avgChunk.toLong)) === 0
      else conv(substring(md5(win), 1, 8), 16, 10)
        .cast("long") % avgChunk === 0
    }
    val candidates = when(size(col("toks")) > window,
        filter(sequence(lit(window), size(col("toks")) - 1), b => boundaryHit(b)))
      .otherwise(array().cast("array<int>"))
    // FastCDC's max-cut: a doc whose windows never hit a boundary (an
    // all-identical-token page, adversarial boilerplate) would become
    // ONE unbounded whole-doc chunk — a single row carrying the whole
    // text through every exchange. Force a boundary every `maxChunk`
    // tokens inside any over-long gap; forced cuts are deterministic
    // offsets FROM the preceding content cut, so they re-synchronize
    // at the first real boundary after an edit just like everything
    // else.
    val bounds0 = concat(array(lit(0)), candidates, array(size(col("toks"))))
    // `bs0` MUST be a materialized column before the forced-cut pass:
    // referencing the bounds EXPRESSION inside the transform lambda
    // would re-evaluate every per-window md5 once per gap (measured
    // 1.9 -> 14 s at sf0.1 before this split). The multi-use
    // non-cheap alias also keeps CollapseProject from re-inlining it.
    val forced = flatten(transform(sequence(lit(0), size(col("bs0")) - 2), j => {
      val a = element_at(col("bs0"), j + 1)
      val b = element_at(col("bs0"), j + 2)
      when(b - a > maxChunk, sequence(a + lit(maxChunk), b - 1, lit(maxChunk)))
        .otherwise(array().cast("array<int>"))
    }))
    Par.spread(docs).select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"), bounds0.as("bs0"))
      .select(col("doc_id"), col("toks"),
        array_sort(concat(col("bs0"), forced)).as("bs"))
      .select(col("doc_id"), col("toks"), col("bs"),
        explode(sequence(lit(0), size(col("bs")) - 2)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (element_at(col("bs"), col("chunk_idx") + 2) -
          element_at(col("bs"), col("chunk_idx") + 1)).as("chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"),
          element_at(col("bs"), col("chunk_idx") + 1) + 1,
          element_at(col("bs"), col("chunk_idx") + 2) -
            element_at(col("bs"), col("chunk_idx") + 1)))).as("h"))
  }

  /** CCNet-style cross-document dedup at chunk granularity: a chunk
    * instance survives iff it is the FIRST occurrence of its content
    * corpus-wide (min (doc_id, chunk_idx) per fingerprint); every
    * later copy — boilerplate headers, mirrored documents, quoted
    * passages — is marked dropped. Appends a boolean `kept`.
    *
    * Shape at scale: one hash-partitioned aggregation on the 16-byte
    * fingerprint to find each chunk's first occurrence, then a
    * shuffle-sharing join back on the same key — no windows, no
    * per-doc state, skew bounded by the count of copies of the single
    * most-duplicated chunk (and those rows carry 24 bytes each, not
    * the text).
    */
  def chunkKeepFirst(instances: DataFrame): DataFrame = {
    val firsts = instances
      .groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("__first"))
    instances.join(firsts, Seq("h"))
      .withColumn("kept",
        col("doc_id") === col("__first.doc_id") &&
          col("chunk_idx") === col("__first.chunk_idx"))
      .drop("__first")
  }

  /** Cross-document duplicated SPANS at stride-1 window granularity —
    * the exact-substring dedup shape (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022) without
    * the suffix array: fingerprint every `n`-token sliding window,
    * keep windows whose content occurs in >= 2 DISTINCT docs, and
    * merge per-doc runs of consecutive duplicated windows into maximal
    * spans (consecutive window positions overlap by n-1 tokens, so a
    * run p1..p2 covers exactly p2 - p1 + n tokens).
    *
    * Returns one row per maximal span: (doc_id, span_start,
    * span_tokens).
    *
    * Scale shape: the window exchange carries corpus x ~len/stride
    * rows of 24 bytes (16-byte md5 + ids), never window text — this is
    * the operator the suffix-array construction exists to beat, and
    * the honest trade is stated here: at 100 TB run it with a larger
    * stride (windows every s tokens catch any duplicated span of
    * >= n + s - 1 tokens) or on a chunk_dedup-pruned corpus. The
    * island merge is a per-doc window (partitioned by doc_id) — never
    * global, so no single-task funnel; the duplicated-window frame it
    * sorts is the post-filter minority, not the corpus.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 10): DataFrame = {
    require(n >= 1, s"window length must be >= 1 token, got $n")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = Dedup.tokens(col(textCol))
    val windows = Par.spread(docs)
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("toks")) - lit(n))).as("pos"),
        col("toks"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(n)))).as("h"))
    val dupContent = windows.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"))
    windows.join(dupContent, Seq("h"), "left_semi")
      .withColumn("__new_run",
        when(col("pos") - lag(col("pos"), 1).over(w) === 1, 0).otherwise(1))
      .withColumn("__run", sum(col("__new_run")).over(w))
      .groupBy(col("doc_id"), col("__run"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + lit(n)).as("span_tokens"))
      .drop("__run")
  }

  /** The 100 TB stride knob for [[duplicateSpans]], made SOUND: a
    * positional stride (windows every s token positions) silently
    * misses cross-document duplicates whose copies sit at different
    * offsets mod s — the two docs sample DIFFERENT windows of the
    * same span and never collide. Content-defined sampling fixes the
    * alignment problem: keep a window iff a 32-bit prefix of its own
    * fingerprint is ≡ 0 (mod sampleMod), so identical content always
    * makes the identical keep decision in every document. A duplicated
    * region containing W windows survives with 1-(1-1/s)^W
    * probability (≈ 1 - e^{-W/s}; spans of >= ~3·s windows are
    * near-certain), and every surviving window is a TRUE duplicate —
    * sampling loses recall on short spans, never precision.
    *
    * Scale shape: the map stage still fingerprints every window (the
    * hash IS the sampling decision), but the shuffle into the
    * dup-content aggregate and the semi-join back carry ~1/sampleMod
    * of the windows — at sf10 the stride-1 exchange is the 12.4×
    * design term, so this is the knob a 100 TB run turns first.
    *
    * Output: kept duplicated windows interval-union-merged per doc
    * (adjacent kept windows with pos gap <= n abut/overlap, so the
    * union [first, last+n) is contiguous): (doc_id, span_start,
    * span_tokens) of COVERED duplicated tokens.
    */
  def duplicateSpansSampled(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 10, sampleMod: Int = 8, useXxhash: Boolean = false): DataFrame = {
    require(n >= 1, s"window length must be >= 1 token, got $n")
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = Dedup.tokens(col(textCol))
    // Fingerprint choice: md5 keeps the DuckDB-oracle twin (the keep
    // decision is CAST('0x' || substr(h,1,8) AS BIGINT) % s on both
    // sides); `useXxhash` swaps in xxhash64 for production runs — the
    // sf10 measurement shows the per-window fingerprint MAP stage, not
    // the sampled-down shuffle, is the single-box bottleneck, and
    // xxhash64 is the cheap non-cryptographic twin (same trade as
    // winnowFingerprint's useXxhash).
    // Spread kept after the r20 re-measure (r19 VERDICT #3: the
    // committed r19 artifacts showed +0.46 s coinciding with this
    // site, the thinnest A/B evidence of the kept set). Interleaved
    // solo A/B, 3 reps/side, all probes clean: spread-on
    // 2.001/1.908/1.633 vs spread-off 1.937/2.088/1.627 — min-of-3
    // 1.633 vs 1.627, FLAT. The r19 delta was environmental; the
    // md5-grid kernel is the same heavy shape as the unsampled twin's
    // (a measured spread win), and the exchange costs nothing here.
    val fpGrid = Par.spread(docs)
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("toks")) - lit(n))).as("pos"),
        col("toks"))
    val winText = concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(n)))
    val windows = (if (useXxhash)
        fpGrid.select(col("doc_id"), col("pos"), xxhash64(winText).as("h"))
          .filter(pmod(col("h"), lit(sampleMod.toLong)) === 0)
      else
        fpGrid.select(col("doc_id"), col("pos"), md5(winText).as("h"))
          .filter(conv(substring(col("h"), 1, 8), 16, 10).cast("long")
            % sampleMod === 0))
    val dupContent = windows.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"))
    windows.join(dupContent, Seq("h"), "left_semi")
      .withColumn("__new_run",
        when(col("pos") - lag(col("pos"), 1).over(w) <= n, 0).otherwise(1))
      .withColumn("__run", sum(col("__new_run")).over(w))
      .groupBy(col("doc_id"), col("__run"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + lit(n)).as("span_tokens"))
      .drop("__run")
  }

  /** Per-domain spec for [[exactQuotaSample]]'s pruned selection:
    * (domain, fullBelow, boundaryBucket, boundaryTake) — buckets
    * strictly below `fullBelow` are taken wholesale; exactly
    * `boundaryTake` lowest-hash rows are taken from `boundaryBucket`.
    * A plain tuple, NOT a nested case class: Janino cannot compile an
    * encoder for a private nested case class (falls back to
    * interpreted row conversion with a logged CompileException).
    */
  private type DomainCut = (String, Int, Int, Long)

  /** Exact deterministic mixture sampling: for each domain d with
    * quota q_d, select the q_d rows with the LOWEST `hashCol` values
    * (ties broken by `tieCol`) — a reproducible uniform sample with
    * exact per-domain counts, the curriculum-mixture primitive
    * ("these proportions of these sources, decided by policy, stable
    * across reruns").
    *
    * The naive plan — row_number() over (partition by domain order by
    * hash) — funnels EVERY row of a domain through one task; with a
    * handful of multi-TB domains that is the single-partition-window
    * scale killer GlobalRank exists to avoid. This runs the
    * histogram-pruned plan instead:
    *
    *  1. bucket = first byte of the hash (256 uniform buckets);
    *  2. one map-side-combined count per (domain, bucket) — at most
    *     |domains| x 256 rows, collected to the driver;
    *  3. the driver walks each domain's cumulative histogram and finds
    *     the boundary bucket where the quota lands;
    *  4. whole buckets below the boundary pass with a broadcast-joined
    *     filter (no sort anywhere); ONLY the boundary bucket — ~1/256
    *     of the domain — is ranked, partitioned by (domain, bucket).
    *
    * Because the bucket is the hash's leading byte, (bucket asc, hash
    * asc) IS hash order, so the pruned selection equals the naive
    * global rank exactly — the DuckDB oracle proves it per run.
    * Domains absent from `quotas` select nothing; a quota >= the
    * domain size returns the whole domain.
    */
  def exactQuotaSample(df: DataFrame, domainCol: String, hashCol: Column,
      tieCol: Column, quotas: Map[String, Long],
      maxDomains: Int = 10000): DataFrame = {
    val (keyed, hist) = bucketHistogram(df, domainCol, hashCol, maxDomains)
    selectByQuota(keyed, domainCol, tieCol, hist, quotas)
  }

  /** Mixture sampling by POLICY WEIGHTS instead of absolute quotas:
    * take `budgetPerMille`/1000 of the corpus, split across domains by
    * `weightsPerMille` (quota_d = budget * w_d / 1000, floored,
    * clamped to the domain's size). Weights are integer per-mille ON
    * PURPOSE — double weights make the floor at quota boundaries
    * depend on the engine's literal type (decimal vs binary float),
    * which is exactly the kind of silent policy drift a
    * reproducibility-first sampler exists to prevent. Shares one
    * histogram pass with [[exactQuotaSample]]: the domain totals that
    * size the quotas come from the same bounded driver collect that
    * prunes the selection, so no extra corpus scan or driver count.
    */
  def mixtureSample(df: DataFrame, domainCol: String, hashCol: Column,
      tieCol: Column, weightsPerMille: Map[String, Long],
      budgetPerMille: Long = 1000L, maxDomains: Int = 10000): DataFrame = {
    val (keyed, hist) = bucketHistogram(df, domainCol, hashCol, maxDomains)
    val budget = hist.map(_._3).sum * budgetPerMille / 1000L
    val quotas = weightsPerMille.map { case (d, pm) =>
      d -> math.min(hist.filter(_._1 == d).map(_._3).sum, budget * pm / 1000L)
    }
    selectByQuota(keyed, domainCol, tieCol, hist, quotas)
  }

  /** Exact integer q-th root: the greatest r with r^q <= x. Seeded
    * from the double estimate, corrected by exact BigInt comparisons,
    * so the result is bit-stable on any JVM regardless of libm — the
    * property the temperature-mixture policy derivation rests on.
    */
  private[graft] def iroot(x: BigInt, q: Int): BigInt = {
    require(q >= 1 && x >= 0, s"iroot($x, $q)")
    if (x == 0) BigInt(0)
    else {
      var r = BigInt(math.max(1L, math.pow(x.doubleValue, 1.0 / q).toLong))
      while (r.pow(q) > x) r -= 1
      while ((r + 1).pow(q) <= x) r += 1
      r
    }
  }

  /** Temperature-rebalanced mixture (default T=2, i.e. weight ~ count^(1/2)):
    * the policy weights are DERIVED from the observed per-domain
    * counts instead of hand-set — the standard multilingual /
    * data-source rebalancing that upsamples tail domains and
    * downsamples the head (alpha = 1 keeps natural proportions,
    * alpha -> 0 approaches uniform; alpha = 1/2 is the classic
    * multilingual-pretraining choice). Shares the one bounded
    * histogram pass with [[exactQuotaSample]] and the same
    * histogram-pruned selection — no extra corpus scan.
    *
    * The temperature is a RATIONAL T = tNumer/tDenom >= 1 (T=2 is
    * (2,1); T=1.5 is (3,2); T=3 is (3,1); T=1 keeps natural
    * proportions), so the weight has an exact integer closed form:
    * w_d = floor(n_d^(1/T) * 10^3)
    *     = iroot_q(n_d^p * 10^(3q))   with 1/T = p/q
    * computed with exact BigInt arithmetic ([[iroot]]).
    *
    * Reproducibility discipline, same reason the plain mixture takes
    * integer per-mille: the whole weight derivation is INTEGER
    * arithmetic so no engine's float libm can drift the policy. A SQL
    * oracle recomputes iroot as float sqrt/cbrt plus a +-2 integer
    * correction window (float roots of an exactly-representable
    * operand are within 1 of the true root, so the window is
    * generous); for T=2 this degenerates to the historical
    * floor(sqrt(n*10^6)) bit-for-bit, since floor of the correctly
    * rounded IEEE sqrt equals the integer root for operands below
    * ~2^52. Per-mille shares then come from integer division with
    * LARGEST-REMAINDER rounding (ties broken by domain name asc),
    * summing to exactly 1000.
    */
  def temperatureMixture(df: DataFrame, domainCol: String, hashCol: Column,
      tieCol: Column, budgetPerMille: Long = 1000L,
      maxDomains: Int = 10000, tNumer: Int = 2, tDenom: Int = 1): DataFrame = {
    require(tDenom >= 1 && tNumer >= tDenom,
      s"temperature must be rational T = tNumer/tDenom >= 1, got $tNumer/$tDenom")
    val (keyed, hist) = bucketHistogram(df, domainCol, hashCol, maxDomains)
    val totals: Map[String, Long] =
      hist.groupBy(_._1).map { case (d, rows) => d -> rows.map(_._3).sum }
    // 1/T = tDenom/tNumer: p = tDenom, q = tNumer
    val w: Map[String, Long] = totals.map { case (d, n) =>
      d -> iroot(BigInt(n).pow(tDenom) * BigInt(10).pow(3 * tNumer),
        tNumer).toLong
    }
    val wSum = w.values.sum
    require(wSum > 0, "temperature mixture over an empty corpus")
    val base = w.map { case (d, x) => d -> x * 1000L / wSum }
    val leftover = (1000L - base.values.sum).toInt
    val bumped = w.toSeq
      .map { case (d, x) => (d, x * 1000L % wSum) }
      .sortBy { case (d, r) => (-r, d) }
      .take(leftover).map(_._1).toSet
    val pm = base.map { case (d, b) => d -> (b + (if (bumped(d)) 1L else 0L)) }
    val budget = totals.values.sum * budgetPerMille / 1000L
    val quotas = pm.map { case (d, p) =>
      d -> math.min(totals(d), budget * p / 1000L) }
    selectByQuota(keyed, domainCol, tieCol, hist, quotas)
  }

  /** Per-domain row cap for UNBOUNDED domain cardinality ("at most
    * `cap` docs per host" — the web-crawl curation primitive): keep
    * each domain's `cap` lowest-hash rows, exactly, with NO driver
    * state — this is the executor-side sibling of [[exactQuotaSample]]
    * for the case its bounded driver histogram rejects (millions of
    * URL hosts).
    *
    * Same histogram-pruning idea, computed AS A DATAFRAME: leading-
    * byte buckets, per-(domain, bucket) counts, per-domain cumulative
    * sums via a window over <= 256 rows per domain (tiny partitions at
    * any cardinality), then a (domain, bucket) join back. Whole
    * buckets under the cap pass with no ranking; ONLY each over-cap
    * domain's boundary bucket (~1/256 of it) is ranked, partitioned by
    * (domain, bucket) — never a whole-domain window, so one mega-host
    * cannot pin a task. Equals the naive per-domain row_number rank
    * exactly (bucket asc, hash asc IS hash order; oracle-proven).
    *
    * CONTRACT: `hashCol` must be a FIXED-WIDTH lowercase hex string
    * (md5/sha-like). The leading-byte bucket agrees with lexicographic
    * hash order only under that shape — variable width or non-hex
    * characters would silently select a different set than the naive
    * rank, so the bucket column fails fast (raise_error naming this
    * contract) on any row whose first two characters are not
    * [0-9a-f]{2}.
    */
  def perDomainCap(df: DataFrame, domainCol: String, hashCol: Column,
      tieCol: Column, cap: Long): DataFrame = {
    require(cap >= 0L, s"cap must be >= 0, got $cap")
    val keyed = df
      .withColumn("__h", hashCol)
      .withColumn("__b",
        when(substring(col("__h"), 1, 2).rlike("^[0-9a-f]{2}$"),
          conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
          .otherwise(raise_error(concat(
            lit("perDomainCap requires a fixed-width lowercase-hex hash " +
              "column (md5-like); got hash value: "),
            // coalesce: concat(NULL) would swallow the whole contract
            // message exactly when the cause (a NULL hash) is least
            // obvious
            coalesce(col("__h"), lit("NULL"))))
            .cast("int")))
    val wCum = Window.partitionBy(col("__d")).orderBy(col("__cb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cuts = keyed.groupBy(col(domainCol).as("__d"), col("__b").as("__cb"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__below", coalesce(sum(col("__n")).over(wCum), lit(0L)))
      .select(col("__d"), col("__cb"),
        when(col("__below") + col("__n") <= cap, 2)
          .when(col("__below") < cap, 1)
          .otherwise(0).as("__kind"),
        (lit(cap) - col("__below")).as("__take"))
      .filter(col("__kind") > 0)
    val joined = keyed.join(cuts,
      col(domainCol) === col("__d") && col("__b") === col("__cb"))
    val whole = joined.filter(col("__kind") === 2)
    val boundary = joined.filter(col("__kind") === 1)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__d"), col("__b"))
          .orderBy(col("__h"), tieCol)))
      .filter(col("__rn") <= col("__take"))
      .drop("__rn")
    whole.unionByName(boundary)
      .drop("__h", "__b", "__d", "__cb", "__kind", "__take")
  }

  /** One corpus pass: rows keyed by (hash, leading-byte bucket) plus
    * the collected (domain, bucket, count) histogram — at most
    * |domains| x 256 rows on the driver.
    *
    * The driver fetch is BOUNDED: the histogram is sized for
    * source-level mixtures (dozens to thousands of domains), and a
    * caller passing an unbounded-cardinality column (URL hosts, user
    * ids) would otherwise OOM the driver at scale. The collect is
    * capped at `maxDomains` x 256 + 1 rows (`limit`, so executors stop
    * early too) and fails fast with the knob named, rather than
    * collecting first and dying later.
    */
  private def bucketHistogram(df: DataFrame, domainCol: String,
      hashCol: Column, maxDomains: Int): (DataFrame, Array[(String, Int, Long)]) = {
    require(maxDomains >= 1 && maxDomains <= Int.MaxValue / 256,
      s"maxDomains must be in [1, ${Int.MaxValue / 256}], got $maxDomains")
    val keyed = df
      .withColumn("__h", hashCol)
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
    val cap = maxDomains * 256
    val rows = keyed.groupBy(col(domainCol).as("__d"), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .limit(cap + 1)
      .collect()
    require(rows.length <= cap,
      s"$domainCol has too many distinct (domain, bucket) groups for a " +
        s"driver-side histogram (> $cap = maxDomains=$maxDomains x 256 " +
        "buckets). Mixture domains should be source-level labels, not an " +
        "unbounded-cardinality column; raise maxDomains only if the " +
        "driver can hold |domains| x 256 rows, or use perDomainCap, " +
        "which computes the histogram executor-side for any cardinality.")
    (keyed, rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2))))
  }

  private def selectByQuota(keyed: DataFrame, domainCol: String,
      tieCol: Column, hist: Array[(String, Int, Long)],
      quotas: Map[String, Long]): DataFrame = {
    val spark = keyed.sparkSession
    val cuts = quotas.toSeq.flatMap { case (domain, quota) =>
      val buckets = hist.filter(_._1 == domain).sortBy(_._2)
      var cum = 0L
      var cut: Option[DomainCut] = None
      buckets.foreach { case (_, b, n) =>
        if (cut.isEmpty && cum + n >= quota)
          cut = Some((domain, b, b, quota - cum): DomainCut)
        cum += n
      }
      // quota covers the whole domain: every bucket passes wholesale
      cut.orElse(buckets.lastOption.map(l =>
        (domain, l._2 + 1, -1, 0L): DomainCut)).toSeq
    }
    import spark.implicits._
    val cutDf = broadcast(cuts.toDF("__d", "__full_below", "__bb", "__btake"))
    val joined = keyed.join(cutDf, col(domainCol) === col("__d"))
    val whole = joined.filter(col("__b") < col("__full_below"))
    val boundary = joined.filter(col("__b") === col("__bb"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__d"), col("__b"))
          .orderBy(col("__h"), tieCol)))
      .filter(col("__rn") <= col("__btake"))
      .drop("__rn")
    whole.unionByName(boundary)
      .drop("__h", "__b", "__d", "__full_below", "__bb", "__btake")
  }
}
