package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst kernels for the embedding hot path. Lives under
  * org.apache.spark.sql (the standard extension-library pattern —
  * cf. public Spark connector/extension projects) because the pieces a
  * third-party expression needs — `AbstractDataType` for
  * `ImplicitCastInputTypes` and the Column<->Expression converters —
  * are `private[sql]`. Public API is re-exported from
  * `graft.functions.VectorExpressions`.
  */
/** Shared bound for kernels that serialize a literal lookup table
  * (centroids, codebooks) into the expression — and so into every task
  * binary. The bounded-collect call sites stay ~KB-sized (nlist=32,
  * m*ksub*dsub ~ 8k doubles); this cap (8 MB of doubles) documents the
  * contract so a future caller with e.g. nlist=65536 x d=1536 fails
  * with an explanation instead of shipping a 100 MB closure per task
  * (r19 VERDICT #9).
  */
object KernelLiteralBound {
  val MaxLiteralDoubles: Int = 1 << 20
  def check(kernel: String, doubles: Long): Unit =
    require(doubles <= MaxLiteralDoubles,
      s"$kernel literal table has $doubles doubles, over the " +
        s"$MaxLiteralDoubles (8 MB) task-binary bound — a table this " +
        "size must be broadcast-joined, not serialized into the expression")
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  /** Codegen: a tight primitive loop over the two ArrayData buffers —
    * same sequential summation order as interpreted eval, so results
    * are bit-identical either way.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Integer dot product over two int8-quantized vectors (array<byte>),
  * the prescreen kernel for lossless filter-and-refine over quantized
  * embeddings (Similarity.exactCosinePairs). All arithmetic is exact:
  * the accumulator is a Long (|acc| <= d * 127^2 < 2^63 for every
  * physically representable array length), so the result — and with
  * it the prescreen's "provable upper bound" contract — never
  * silently overflows at any dimension. The per-pair work is d byte
  * loads + integer multiply-adds against rows ~8x smaller than the
  * double vectors, which is the whole point: the all-pairs prescreen
  * pass is memory-bandwidth-bound.
  */
case class ByteDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.ByteType),
      ArrayType(org.apache.spark.sql.types.ByteType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "byte_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getByte(i) * y.getByte(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getByte($i) * $b.getByte($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** |a ∩ b| for two SORTED string arrays via a single merge pass — no
  * per-row hash-set construction, unlike array_intersect. The caller
  * guarantees both sides are sorted ascending (sort_array uses the
  * same UTF8String binary ordering the merge compares with) and
  * duplicate-free; with |a|,|b| known, |a ∪ b| = |a|+|b|-|a ∩ b|, so
  * one kernel serves exact Jaccard verification over candidate pairs.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType),
      ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var n = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** All `tables` sign-random-projection LSH bucket ids for one vector
  * in a single codegen'd pass: bucket_t packs `bits` sign bits, where
  * bit b of table t is sign(Σ_j w(t*bits+b, j) * v_j) and the ±1
  * weight w(k, j) is bit 13 of xxhash64(k, j) (seed 42) — EXACTLY the
  * hash family, summation order (j ascending per plane), and `> 0`
  * threshold of the historical explode + per-plane-sum formulation, so
  * bucket ids are bit-identical to that path while the plan becomes
  * MAP-ONLY: no component explode, no (id x numPlanes) aggregate, no
  * shuffle. At 100 TB this turns LSH membership from the widest
  * exchange in the ANN pipeline into scan-side scalar work.
  *
  * The ±1 weight table is materialized lazily per task (expression
  * instances are task-local after deserialization) and grown to the
  * observed dimensionality, so the per-row cost is tables*bits*dim
  * multiply-adds, not hash computations.
  */
case class SignProjection(child: Expression, bits: Int, tables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 62, "bucket id must fit a long")
  require(tables >= 1, "need at least one table")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "sign_project"

  // volatile: expression instances are normally task-local after
  // deserialization, but a reused interpreted projection may evaluate one
  // instance from several threads — build into a local and publish with a
  // single volatile write so no thread can observe a half-built table.
  @transient @volatile private var signRows: Array[Array[Byte]] = _

  /** w(k)(j) in {-1, +1}, grown to cover `dim` components. */
  private def signs(dim: Int): Array[Array[Byte]] = {
    val cached = signRows
    if (cached != null && cached.head.length >= dim) return cached
    val total = bits * tables
    val built = Array.tabulate(total) { k =>
      val hk = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(k, org.apache.spark.sql.types.IntegerType, 42L)
      Array.tabulate(dim) { j =>
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(j, org.apache.spark.sql.types.IntegerType, hk)
        if (((h >>> 13) & 1L) == 1L) 1.toByte else (-1).toByte
      }
    }
    signRows = built
    built
  }

  def project(input: ArrayData): ArrayData = {
    val dim = input.numElements()
    val s = signs(dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val w = s(t * bits + b)
        var p = 0.0
        var j = 0
        while (j < dim) {
          p += (if (w(j) > 0) input.getDouble(j) else -input.getDouble(j))
          j += 1
        }
        if (p > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    project(input.asInstanceOf[ArrayData])

  /** Codegen: one virtual call into [[project]] per row — the loop stays
    * compiled once in this class (the weight cache lives here too), and
    * the call site stays inside the whole-stage-codegen span.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signProjection", this, classOf[SignProjection].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.project($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole-document MinHash signature in one codegen'd pass: shingle the
  * token array (n-token windows, whole-document fallback below n) and
  * fold every shingle into the numPerm-long signature in place —
  * EXACTLY the [[MinHashAgg]] hash family (base = xxhash64 of the
  * shingle string, seed 42; member p = xxhash64 of the base long
  * seeded by hash(p)), so signatures are bit-identical to the
  * shingle_explode + minhash_agg formulation while the plan becomes
  * MAP-ONLY: no generator row blowup (docs x shingles rows), no
  * groupBy exchange. Duplicate shingles need no dedup — a duplicate
  * cannot change a min.
  *
  * At 100 TB this removes the near-dup pipelines' widest intermediate:
  * the exploded shingle frame is tokens-per-doc times the corpus, and
  * it previously existed only to be immediately aggregated back down.
  */
case class MinHashSignature(child: Expression, shingleLen: Int, numPerm: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(shingleLen >= 1, "shingle length must be >= 1")
  require(numPerm >= 1, "need at least one permutation")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val permSeeds: Array[Long] = Array.tabulate(numPerm)(p =>
    org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(p, org.apache.spark.sql.types.IntegerType, 42L))

  def compute(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    val sig = Array.fill(numPerm)(Long.MaxValue)
    def fold(s: org.apache.spark.unsafe.types.UTF8String): Unit = {
      val base = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(s, org.apache.spark.sql.types.StringType, 42L)
      var p = 0
      while (p < numPerm) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(base, org.apache.spark.sql.types.LongType, permSeeds(p))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
    }
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    if (len < shingleLen) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](len)
      var i = 0
      while (i < len) { parts(i) = arr.getUTF8String(i); i += 1 }
      fold(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
    } else {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](shingleLen)
      var i = 0
      while (i <= len - shingleLen) {
        var j = 0
        while (j < shingleLen) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        fold(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array in one codegen'd pass: per DISTINCT
  * token, h = xxhash64(token) (string hash, seed 42 — the same value
  * the SQL `xxhash64` column computes), each bit b votes
  * sign((h >> b) & 1); the signature sets bit b where the vote sum is
  * positive. Bit-identical to both the explode + 64-sum-column
  * aggregate and the interpreted `aggregate()` fold it replaces, with
  * no token explode and no groupBy exchange — map-only, like
  * [[MinHashSignature]].
  *
  * `md5Basis = true` swaps the per-token hash for the low 64 bits of
  * md5(token) (digest bytes 8..15, little-endian — the exact value
  * DuckDB's `md5_number_lower` returns), keeping every other rule
  * identical. That makes the signature recomputable closed-form in
  * ANSI-ish SQL, which is what lets the simhash registry entries
  * carry a real DuckDB oracle; the xxhash64 basis stays the default
  * for pure-Spark pipelines (md5 is a full cryptographic digest per
  * token — measurably slower, never better for dedup quality).
  */
case class SimHash64(child: Expression, md5Basis: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash64"

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def md5Lower64(tk: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(tk.getBytes)
    java.nio.ByteBuffer.wrap(digest, 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
  }

  def compute(arr: ArrayData): Long = {
    val len = arr.numElements()
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < len) {
      val tk = arr.getUTF8String(i)
      // skip nulls to match the replaced explode(array_distinct(...))
      // formulation, which dropped null tokens rather than hashing them
      if (tk != null && seen.add(tk)) {
        val h = if (md5Basis) md5Lower64(tk)
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(tk, org.apache.spark.sql.types.StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DISTINCT n-token shingles of a token array, sorted ascending
  * (binary UTF8 order — the same ordering `sort_array` uses), in one
  * codegen'd pass: the exact-Jaccard verify input that previously ran
  * four interpreted higher-order expressions (transform + slice +
  * array_join + array_distinct) plus a sort per candidate document.
  * Documents shorter than n tokens collapse to the single
  * whole-document shingle, matching
  * `sort_array(Dedup.shingles(tokens, n))` element for element.
  */
case class SortedShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(n >= 1, "shingle length must be >= 1")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "sorted_shingles"

  def compute(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new java.util.TreeSet[org.apache.spark.unsafe.types.UTF8String]()
    if (len < n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](len)
      var i = 0
      while (i < len) { parts(i) = arr.getUTF8String(i); i += 1 }
      out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
    } else {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var i = 0
      while (i <= len - n) {
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[AnyRef]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedShingles", this, classOf[SortedShingles].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Low 64 bits of md5(string) — digest bytes 8..15, little-endian —
  * the exact value DuckDB's `md5_number_lower` returns (the same
  * basis [[SimHash64]] uses internally with md5Basis=true), exposed
  * as a scalar so entries can build engine-portable hash-derived
  * features with BIT operations (shifts/masks are representation-
  * identical between this signed long and DuckDB's UBIGINT; modulo
  * is NOT — avoid it).
  */
case class Md5Lower64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "md5_lower64"

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def hash(tk: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(tk.getBytes)
    java.nio.ByteBuffer.wrap(digest, 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
  }

  override def nullSafeEval(input: Any): Any =
    hash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5l64", this, classOf[Md5Lower64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.hash($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder: all m subspace codes of a vector in
  * ONE compiled pass — per subspace, argmin squared-L2 over that
  * subspace's codebook, computed as |c|^2 - 2*s.c with |c|^2
  * precomputed once per expression instance. Ties break to the
  * lowest code (strict <), matching min_by((d, code)) and
  * array_position-of-min. The codebook is a Seq so case-class
  * equality/canonicalization stay structural; it serializes with the
  * expression into the task binary (m*ksub*dsub doubles — ~64 KB at
  * the entry defaults, bounded by construction).
  *
  * This replaced two slower formulations, both measured at sf10
  * (200k vectors, m=16, ksub=64): an exploded broadcast-join assign
  * (~148 s — 205M joined rows of shuffle machinery for microseconds
  * of arithmetic) and a higher-order transform over a codebook
  * literal with a native dot inside (~17 s — one interpreted
  * expression eval per CENTROID). One eval per VECTOR amortizes all
  * per-eval overhead across the m*ksub*dsub flops.
  */
case class PqEncodeCodes(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "codebook must have at least one centroid per subspace")
  require(codebook.forall(_.forall(_.length == codebook.head.head.length)),
    "all centroids must share one subspace dimension")
  KernelLiteralBound.check("pq_encode codebook",
    codebook.iterator.map(_.iterator.map(_.length.toLong).sum).sum)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  // volatile publish, same reasoning as SignProjection's weight cache
  @transient @volatile private var cents: Array[Array[Array[Double]]] = _
  @transient @volatile private var cn2: Array[Array[Double]] = _

  private def tables(): (Array[Array[Array[Double]]], Array[Array[Double]]) = {
    val c0 = cents
    if (c0 != null) return (c0, cn2)
    val c = codebook.map(_.map(_.toArray).toArray).toArray
    val n2 = c.map(_.map { cv =>
      var s = 0.0; var j = 0
      while (j < cv.length) { s += cv(j) * cv(j); j += 1 }
      s
    })
    cn2 = n2
    cents = c
    (c, n2)
  }

  def encode(input: ArrayData): ArrayData = {
    val (c, n2) = tables()
    val m = c.length
    val dsub = c(0)(0).length
    require(input.numElements() >= m * dsub,
      s"vector dim ${input.numElements()} < $m x $dsub")
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val book = c(mi)
      val norms = n2(mi)
      val base = mi * dsub
      var best = 0
      var bestD = Double.MaxValue
      var ci = 0
      while (ci < book.length) {
        val cv = book(ci)
        var dot = 0.0
        var j = 0
        while (j < dsub) { dot += cv(j) * input.getDouble(base + j); j += 1 }
        val dd = norms(ci) - 2.0 * dot
        if (dd < bestD) { bestD = dd; best = ci }
        ci += 1
      }
      codes(mi) = best
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeCodes].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid assignment against a DRIVER-SIDE centroid table
  * (nlist rows — the same bounded-collect contract as the k-means
  * pin): returns the cid of the centroid with the highest cosine
  * similarity to the input vector, ties broken to the LOWEST cid.
  *
  * This is the map-only replacement for the historical
  * `crossJoin(broadcast(centroids)) + groupBy(id).max_by` assignment
  * shape: the crossJoin materialized N x nlist rows and the groupBy
  * re-shuffled all of them per Lloyd iteration (guide §2.4 — remove
  * shuffles outright). Bit-equivalence with that shape:
  *
  *  - sim is computed EXACTLY as VectorExpressions.cosine_similarity
  *    (sequential dot, `dot / (sqrt(dot(v,v)) * sqrt(dot(c,c)))`), so
  *    every per-centroid similarity is the same double;
  *  - the argmax uses java.lang.Double.compare — Spark's own double
  *    ordering (NaN greatest, used by max_by's struct comparator) —
  *    iterating centroids in ascending-cid order and replacing only
  *    on strictly-greater, which IS max_by(cid, struct(sim, -cid));
  *  - -0.0 normalizes to 0.0 before comparing, matching UnsafeRow's
  *    write-time normalization in the grouped shape.
  */
case class NearestCentroid(child: Expression, centroids: Seq[(Long, Seq[Double])])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(centroids.nonEmpty, "centroid table must be non-empty")
  KernelLiteralBound.check("nearest_centroid centroid table",
    centroids.iterator.map(_._2.length.toLong).sum)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "nearest_centroid"

  // volatile publish, same reasoning as SignProjection's weight cache
  @transient @volatile private var cids: Array[Long] = _
  @transient @volatile private var cvs: Array[Array[Double]] = _
  @transient @volatile private var cnorms: Array[Double] = _

  private def tables(): (Array[Long], Array[Array[Double]], Array[Double]) = {
    val c0 = cids
    if (c0 != null) return (c0, cvs, cnorms)
    val sorted = centroids.sortBy(_._1).toArray
    val ids = sorted.map(_._1)
    val vs = sorted.map(_._2.toArray)
    val ns = vs.map { cv =>
      var s = 0.0; var j = 0
      while (j < cv.length) { s += cv(j) * cv(j); j += 1 }
      math.sqrt(s)
    }
    cvs = vs
    cnorms = ns
    cids = ids
    (ids, vs, ns)
  }

  def assign(input: ArrayData): Long = {
    val (ids, vs, ns) = tables()
    val d = input.numElements()
    var vv = 0.0
    var j = 0
    while (j < d) { val x = input.getDouble(j); vv += x * x; j += 1 }
    val vn = math.sqrt(vv)
    var bestCid = ids(0)
    var bestSim = Double.NaN
    var first = true
    var ci = 0
    while (ci < ids.length) {
      val cv = vs(ci)
      val n = math.min(d, cv.length)
      var dot = 0.0
      var k = 0
      while (k < n) { dot += cv(k) * input.getDouble(k); k += 1 }
      var sim = dot / (vn * ns(ci))
      if (sim == 0.0) sim = 0.0 // -0.0 -> +0.0, UnsafeRow normalization
      if (first || java.lang.Double.compare(sim, bestSim) > 0) {
        first = false; bestSim = sim; bestCid = ids(ci)
      }
      ci += 1
    }
    bestCid
  }

  override def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.assign($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column <-> Expression converters for expression-building facades. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Run a hand-built/rewritten logical plan as a DataFrame
    * (private[sql] Dataset.ofRows, bridged for specs).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
