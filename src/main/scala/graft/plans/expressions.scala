package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths Spark's built-in
  * functions can't express efficiently (SURVEY.md §7.4 stretch goals —
  * preference order per the build brief: built-ins, then a custom
  * `Expression` with codegen, before any UDF).
  *
  * These stay inside whole-stage codegen (`doGenCode` emits tight Java
  * loops over the unsafe array/string data — no boxing, no Scala closure
  * dispatch per row), which is what makes brute-force cosine over ~10^5+
  * vectors per partition and per-document hashing viable at scale.
  */
object expressions {

  /** Cosine similarity of two float vectors, one fused loop.
    * vs `aggregate(zip_with(...))` HOFs: no intermediate arrays, no
    * per-element lambda dispatch — the 64-dim dot product is ~200 fused
    * scalar ops inside whole-stage codegen. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> args, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any =
      CosineSimilarity.compute(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        val cls = CosineSimilarity.getClass.getName.stripSuffix("$") + "$"
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  $cls.MODULE$$.dimMismatch($n, $b.numElements());
           |}
           |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = (double) $a.getFloat($i);
           |  double $yv = (double) $b.getFloat($i);
           |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
           |}
           |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 :
           |  $dot / (Math.sqrt($nx) * Math.sqrt($ny));
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
  }

  object CosineSimilarity {
    /** Mismatched dimensions are a data bug — fail loudly rather than
      * silently scoring the common prefix (which would corrupt top-k
      * rankings undetectably). */
    def dimMismatch(a: Int, b: Int): Nothing =
      throw new IllegalArgumentException(
        s"graft_cosine: vector dimensions differ ($a vs $b)")

    def compute(x: ArrayData, y: ArrayData): Double = {
      val n = x.numElements()
      if (n != y.numElements()) dimMismatch(n, y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getFloat(i).toDouble
        val yv = y.getFloat(i).toDouble
        dot += xv * yv; nx += xv * xv; ny += yv * yv
        i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0
      else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
  }

  /** Document fingerprint: the minimum 64-bit polynomial rolling hash over
    * all `window`-char windows of the lowercased text (winnowing-style —
    * robust to small edits anywhere but a prefix/suffix change of the
    * minimal window). One pass, O(1) per char via the rolling update. */
  case class TextFingerprint(child: Expression, window: Int)
      extends UnaryExpression {

    require(window > 0, "window must be positive")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string arg, got ${child.dataType.sql}")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_fingerprint"

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
        .toLowerCase(java.util.Locale.ROOT)
      TextFingerprint.minRollingHash(s, window)
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val cls = TextFingerprint.getClass.getName.stripSuffix("$") + "$"
      nullSafeCodeGen(ctx, ev, s =>
        s"""${ev.value} = $cls.MODULE$$.minRollingHash(
           |  $s.toString().toLowerCase(java.util.Locale.ROOT), $window);""".stripMargin)
    }

    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  /** Distinct word n-gram shingles of a TOKEN ARRAY, one fused pass.
    *
    * Replaces the Catalyst combinator spelling
    * `array_distinct(transform(sequence(0, size-n), i =>
    * concat_ws(" ", slice(toks, i+1, n))))` (+ `when` short-doc
    * fallback), whose cost profile is pathological: a `slice` array
    * allocation per shingle, per-element lambda dispatch, and an
    * O(g²)-comparison `array_distinct` over string elements — measured
    * 2.9 s for 5,000 ~50-token docs vs 0.12 s for tokenization.
    * Here: one `UTF8String.concatWs` per window and a LinkedHashSet for
    * the dedup (same first-occurrence order `array_distinct` keeps).
    *
    * Exact semantic mirror of the old spelling, including edges: fewer
    * than `n` tokens (or a null/empty token array) yields ONE shingle —
    * all tokens joined, "" for none — so no document silently
    * disappears and the DuckDB oracles' SQL stays byte-identical. */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression {

    require(n > 0, "n must be positive")
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.sql}")
      }
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "graft_shingles"

    // null child → the same array("") the old `concat_ws` fallback
    // produced (concat_ws over a null array is ""), so eval bypasses
    // the null-skipping UnaryExpression default
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      compute(if (v == null) null else v.asInstanceOf[ArrayData])
    }
    override def nullSafeEval(v: Any): Any =
      compute(v.asInstanceOf[ArrayData])

    /** Public for codegen (bound reference object, pipeline stays
      * fused — same pattern as [[MinHashSignature.compute]]). */
    def compute(xs: ArrayData): ArrayData = {
      val m = if (xs == null) 0 else xs.numElements()
      val space = UTF8String.fromString(" ")
      if (m < n) {
        val parts = new Array[UTF8String](m)
        var j = 0
        while (j < m) { parts(j) = xs.getUTF8String(j); j += 1 }
        return new GenericArrayData(
          Array[Any](UTF8String.concatWs(space, parts: _*)))
      }
      val seen = new java.util.LinkedHashSet[UTF8String]((m - n + 1) * 2)
      var i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = xs.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(space, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("shingles", this, getClass.getName)
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            $ref.compute(${c.isNull} ? null :
              (org.apache.spark.sql.catalyst.util.ArrayData) ${c.value});""",
        isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  object TextFingerprint {
    private val B = 1000003L // polynomial base

    /** min over all windows of the rolling polynomial hash; whole-string
      * hash when the text is shorter than the window. */
    def minRollingHash(s: String, window: Int): Long = {
      val n = s.length
      if (n == 0) return 0L
      if (n <= window) {
        var h = 0L; var i = 0
        while (i < n) { h = h * B + s.charAt(i); i += 1 }
        return h
      }
      // B^(window-1) for removing the outgoing char
      var pow = 1L
      var k = 1
      while (k < window) { pow *= B; k += 1 }
      var h = 0L
      var i = 0
      while (i < window) { h = h * B + s.charAt(i); i += 1 }
      var min = h
      while (i < n) {
        h = (h - s.charAt(i - window) * pow) * B + s.charAt(i)
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  /** MinHash signature: for k seeded universal-hash permutations
    * `h_i(x) = (a_i * x + b_i) mod p`, the minimum over the input
    * shingle-hash array — one fused O(T·k) loop per document instead of k
    * `transform`+`array_min` passes (and no k intermediate arrays).
    * Codegen binds `this` as a reference object and calls [[compute]] —
    * the surrounding whole-stage pipeline stays fused. */
  case class MinHashSignature(child: Expression, k: Int, seed: Long)
      extends UnaryExpression {

    require(k > 0, "k must be positive")
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.sql}")
      }
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash"

    private lazy val (as, bs): (Array[Long], Array[Long]) = {
      val rnd = new java.util.Random(seed)
      val a = Array.fill(k)(math.abs(rnd.nextLong()) % (MinHashSignature.P - 1) + 1)
      val b = Array.fill(k)(math.abs(rnd.nextLong()) % MinHashSignature.P)
      (a, b)
    }

    override def nullSafeEval(v: Any): Any =
      compute(v.asInstanceOf[ArrayData])

    /** Public for codegen: the generated code calls this on a bound
      * reference object, keeping the surrounding whole-stage pipeline
      * fused (vs CodegenFallback, which would split it). */
    def compute(xs: ArrayData): ArrayData = {
      val n = xs.numElements()
      val sig = Array.fill(k)(Long.MaxValue)
      var t = 0
      while (t < n) {
        // map to non-negative residue once per shingle
        val x = java.lang.Math.floorMod(xs.getLong(t), MinHashSignature.P)
        var i = 0
        while (i < k) {
          val h = java.lang.Math.floorMod(as(i) * x + bs(i), MinHashSignature.P)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        t += 1
      }
      new GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhash", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  object MinHashSignature {
    /** Mersenne prime 2^61 - 1: `a*x+b` for residues < p stays within
      * signed-128 … here within unsigned 122 bits — but Long math with
      * floorMod on 2^61-1 residues can overflow; keep operands < 2^31 to
      * stay exact in 64-bit. We instead use a 31-bit prime so a*x fits in
      * 62 bits. */
    val P: Long = 2147483647L // 2^31 - 1
  }

  /** 64-bit token hash: polynomial accumulate (base 1000003, natural
    * mod-2^64 wraparound) followed by the xxHash64 finalizer avalanche.
    * Every step is a plain mod-2^64 ring operation, so the hash is
    * reproducible in ANSI SQL (the DuckDB correctness oracle mirrors it
    * with HUGEINT arithmetic) while the avalanche gives the uniform bit
    * statistics SimHash needs — a raw polynomial hash of short tokens
    * would leave the high bits near-constant and collapse the signature.
    */
  case class TokenHash64(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string arg, got ${child.dataType.sql}")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_token_hash"

    override def nullSafeEval(v: Any): Any =
      TokenHash64.hash(v.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val cls = TokenHash64.getClass.getName.stripSuffix("$") + "$"
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = $cls.MODULE$$.hash($s.toString());")
    }

    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  object TokenHash64 {
    private val B = 1000003L
    private val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
    private val P3 = 1609587929392839161L // 0x165667B19E3779F9

    def hash(s: String): Long = {
      var h = 0L
      var i = 0
      while (i < s.length) { h = h * B + s.charAt(i); i += 1 }
      h ^= (h >>> 33); h *= P2
      h ^= (h >>> 29); h *= P3
      h ^= (h >>> 32)
      h
    }
  }

  /** 64-bit SimHash over an array of token hashes: per bit position, sum
    * +1/-1 across tokens by that bit's value; the sign vector packs into
    * one long. Near-duplicate docs differ in a few bits → hamming distance
    * via `bit_count(a ^ b)` (built-in, codegen'd), candidate generation
    * via exact-match on 16-bit bands (pigeonhole: ≤3 differing bits ⇒ at
    * least one of 4 bands identical). One O(T·64) loop per document. */
  case class SimHash64(child: Expression)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.sql}")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"

    override def nullSafeEval(v: Any): Any =
      compute(v.asInstanceOf[ArrayData])

    /** Public for codegen — see [[MinHashSignature.compute]]. */
    def compute(xs: ArrayData): Long = {
      val n = xs.numElements()
      val acc = new Array[Int](64)
      var t = 0
      while (t < n) {
        val h = xs.getLong(t)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
        t += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) {
        if (acc(j) > 0) out |= (1L << j)
        j += 1
      }
      out
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simhash", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  /** Random-hyperplane LSH signature of a float vector: `nPlanes` seeded
    * gaussian hyperplanes; bit p = sign(vec · plane_p). Vectors with high
    * cosine similarity agree on most bits, so an exact-match join on the
    * signature buckets near neighbors together — the scale path for ANN
    * (no O(n²) cross join). Planes are derived deterministically from
    * (seed, plane, dim) so every executor materializes identical planes
    * without a broadcast. */
  case class HyperplaneSignature(child: Expression, nPlanes: Int, seed: Long)
      extends UnaryExpression {

    require(nPlanes > 0 && nPlanes <= 63, "nPlanes must be in [1, 63]")
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.sql}")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hyperplane_sig"

    // planes materialized lazily per executor, keyed only by constructor
    // args — identical everywhere, no broadcast needed
    @transient private lazy val planeCache =
      new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

    private def plane(p: Int, dim: Int): Array[Double] = {
      val key = Integer.valueOf(p * 100003 + dim)
      var v = planeCache.get(key)
      if (v == null) {
        val rnd = new java.util.Random(seed * 1000003L + p)
        v = Array.fill(dim)(rnd.nextGaussian())
        planeCache.put(key, v)
      }
      v
    }

    override def nullSafeEval(a: Any): Any =
      compute(a.asInstanceOf[ArrayData])

    /** Public for codegen — see [[MinHashSignature.compute]]. */
    def compute(x: ArrayData): Long = {
      val dim = x.numElements()
      var sig = 0L
      var p = 0
      while (p < nPlanes) {
        val pl = plane(p, dim)
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += x.getFloat(j) * pl(j); j += 1 }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hyperplane", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  /** All of a document's repetition statistics in ONE tokenizing pass:
    * struct(n_tokens, n_distinct, top_count, n_bigrams,
    * n_distinct_bigrams). Replaces a 4-way recomputation of the token
    * array plus an explode→groupBy→groupBy→join top-token pipeline with
    * a single per-row loop — token identity is EXACT (interned string
    * ids, bigram = packed id pair), so the result is byte-identical to
    * the SQL-oracle formulation, just without materializing any arrays
    * or shuffling any (doc, token) rows.
    *
    * Tokenization replicates `regexp_extract_all(lower(text),
    * '[a-z0-9]+')` as a character scan over the lowercased string. */
  case class RepetitionStats(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string arg, got ${child.dataType.sql}")
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("top_count", LongType, nullable = false),
      StructField("n_bigrams", LongType, nullable = false),
      StructField("n_distinct_bigrams", LongType, nullable = false)))
    override def prettyName: String = "graft_repetition_stats"

    override def nullSafeEval(v: Any): Any =
      compute(v.asInstanceOf[UTF8String])

    /** Public for codegen (bound reference object — the surrounding
      * whole-stage pipeline stays fused). */
    def compute(u: UTF8String): InternalRow = {
      // Locale.ROOT: match SQL lower() — under tr/az default locales 'I'
      // maps to dotless ı and would vanish from the [a-z0-9] token scan
      val s = u.toString.toLowerCase(java.util.Locale.ROOT)
      val ids = new java.util.HashMap[String, Integer]()
      var counts = new Array[Int](16)
      val bigrams = new java.util.HashSet[java.lang.Long]()
      var nTokens = 0L
      var nBigrams = 0L
      var prevId = -1
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          var j = i + 1
          while (j < n && {
            val d = s.charAt(j)
            (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
          }) j += 1
          val tok = s.substring(i, j)
          var id = ids.get(tok)
          if (id == null) {
            id = Integer.valueOf(ids.size)
            ids.put(tok, id)
            if (id >= counts.length)
              counts = java.util.Arrays.copyOf(counts, counts.length * 2)
          }
          counts(id) += 1
          nTokens += 1
          if (prevId >= 0) {
            nBigrams += 1
            bigrams.add((prevId.toLong << 32) | id.longValue())
          }
          prevId = id
          i = j
        } else i += 1
      }
      var top = 0L
      var k = 0
      val d = ids.size
      while (k < d) { if (counts(k) > top) top = counts(k); k += 1 }
      new GenericInternalRow(Array[Any](nTokens, d.toLong, top,
        nBigrams, bigrams.size.toLong))
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("repstats", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  // ------------------------------------------------------------ Column API

  import org.apache.spark.sql.graft.{shim => S}

  def cosine(a: Column, b: Column): Column =
    S.column(CosineSimilarity(S.expression(a), S.expression(b)))

  def fingerprint(text: Column, window: Int = 16): Column =
    S.column(TextFingerprint(S.expression(text), window))

  def minhashSignature(shingleHashes: Column, k: Int, seed: Long): Column =
    S.column(MinHashSignature(S.expression(shingleHashes), k, seed))

  def wordShingles(tokens: Column, n: Int): Column =
    S.column(WordShingles(S.expression(tokens), n))

  def simhash64(tokenHashes: Column): Column =
    S.column(SimHash64(S.expression(tokenHashes)))

  def tokenHash64(token: Column): Column =
    S.column(TokenHash64(S.expression(token)))

  def hyperplaneSignature(vec: Column, nPlanes: Int, seed: Long): Column =
    S.column(HyperplaneSignature(S.expression(vec), nPlanes, seed))

  def repetitionStats(text: Column): Column =
    S.column(RepetitionStats(S.expression(text)))
}
