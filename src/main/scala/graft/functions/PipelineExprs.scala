package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** minhash_sig(text, k, n) -> ARRAY<BIGINT> — the k-permutation MinHash
  * signature over word n-gram shingles, as one native pass per row.
  *
  * Computes exactly the HashSpec/PipelineQueries spec (poly31 char fold mod
  * 1e9+7 per shingle; sig_i = min over shingles of ((2i+1)*h + 7919i + 1)
  * mod 1e9+7; SPLIT-on-space token semantics including empty tokens; '_'
  * sentinel when the doc has fewer than n tokens) — the DuckDB oracle and
  * the SQL-fragment form stay valid cross-checks (PropertiesSpec asserts
  * equality on random inputs).
  *
  * Why native: the SQL-fragment form is a chain of interpreted
  * higher-order-function lambdas — per character it allocates a
  * single-char UTF8String, evaluates a lambda, and boxes a Long. This
  * expression does the same arithmetic in a tight primitive loop with zero
  * allocation per character, and shingle hashes are folded without
  * materializing shingle strings. ~5x on the sf0.1 dedup queries; at 100 TB
  * the same ratio applies to every executor-hour.
  */
case class MinHashSig(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 && shingleN > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("minhash_sig: k and n must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $k, $shingleN);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  private final val P = 1000000007L

  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int, n: Int): ArrayData = {
    // Same tokenization as SPLIT(text, ' '): split on every single space,
    // keeping empty tokens (Java split with -1 limit).
    val words = text.toString.split(" ", -1)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P - 1)
    if (words.length >= n) {
      var i = 0
      val last = words.length - n
      while (i <= last) {
        // poly31 of the shingle CONCAT_WS(' ', w(i..i+n-1)) folded without
        // building the shingle string: a single space (32) between tokens.
        var h = 0L
        var d = 0
        while (d < n) {
          if (d > 0) h = (h * 31L + 32L) % P
          val w = words(i + d)
          var c = 0
          while (c < w.length) {
            val cp = w.codePointAt(c)
            h = (h * 31L + cp) % P
            c += Character.charCount(cp)
          }
          d += 1
        }
        updateMins(sig, h, k)
        i += 1
      }
    } else {
      updateMins(sig, 95L % P, k) // poly31("_") = codepoint of '_'
    }
    new GenericArrayData(sig)
  }

  private def updateMins(sig: Array[Long], h: Long, k: Int): Unit = {
    var j = 0
    while (j < k) {
      val v = ((2L * j + 1L) * h + 7919L * j + 1L) % P
      if (v < sig(j)) sig(j) = v
      j += 1
    }
  }
}

/** ngram_hash_set(text, n) -> ARRAY<BIGINT> — sorted distinct poly31
  * hashes of the word n-gram shingles (same tokenization/fold spec as
  * MinHashSig, including the '_' sentinel for short docs). Set operations
  * over these hashes (Jaccard) equal set operations over the shingle
  * strings whenever both sides hash identically — and any collision
  * happens identically in the DuckDB oracle, which evaluates the same
  * integer arithmetic. One pass, no shingle strings materialized.
  */
case class NgramHashSet(child: Expression, shingleN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if shingleN > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("ngram_hash_set: n must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hash_set expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramHashSet.compute(input.asInstanceOf[UTF8String], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramHashSet.compute($c, $shingleN);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashSet =
    copy(child = newChild)
  override def prettyName: String = "ngram_hash_set"
}

object NgramHashSet {
  private final val P = 1000000007L

  def compute(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val hashes: Array[Long] =
      if (words.length >= n) {
        val out = new Array[Long](words.length - n + 1)
        var i = 0
        while (i < out.length) {
          var h = 0L
          var d = 0
          while (d < n) {
            if (d > 0) h = (h * 31L + 32L) % P
            val w = words(i + d)
            var c = 0
            while (c < w.length) {
              val cp = w.codePointAt(c)
              h = (h * 31L + cp) % P
              c += Character.charCount(cp)
            }
            d += 1
          }
          out(i) = h
          i += 1
        }
        out
      } else Array(95L) // poly31("_")
    java.util.Arrays.sort(hashes)
    // in-place dedupe of the sorted array
    var w = 0
    var r = 0
    while (r < hashes.length) {
      if (r == 0 || hashes(r) != hashes(r - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }
}

/** gram_hashes(s, n) -> ARRAY<BIGINT> — poly31 hashes of the word n-grams
  * of s IN POSITION ORDER, with repeats, one native pass: the occurrence-
  * counting sibling of [[NgramHashSet]] (same hash spec — fold codepoints,
  * space = 32 joins words, mod 1e9+7 — so the same DuckDB poly31 spelling
  * replays it), but no sort, no dedupe, and an EMPTY array (not the '_'
  * sentinel) when the text has fewer than n words. Feeds frequency-feature
  * operators (DSIR importance weights) where each gram occurrence counts.
  *
  * Why native: the SQL spelling explodes gram STRINGS and folds each one
  * char-by-char through an interpreted AGGREGATE lambda — the dominant
  * cost of the first q_pipeline_dsir bench entry (6.9s at sf0.1). This
  * computes the hashes without ever materializing a gram string. */
case class GramHashes(child: Expression, shingleN: Int, upto: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if shingleN > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("gram_hashes: n must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[UTF8String], shingleN, upto)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHashes.compute($c, $shingleN, $upto);")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
  override def prettyName: String = if (upto) "gram_hashes_upto" else "gram_hashes"
}

object GramHashes {
  private final val P = 1000000007L

  /** upto = false: hashes of the word n-grams of `text`, in position order,
    * with repeats. upto = true: the concatenation for sizes 1..n — one
    * native call instead of CONCAT(gram_hashes(s,1), gram_hashes(s,2), …),
    * which matters because a generator over a non-trivial child expression
    * re-evaluates it per OUTPUT row (the q_pipeline_dsir bench found
    * explode(CONCAT(...)) ~10x slower than explode(one_call(...))). */
  def compute(text: UTF8String, n: Int, upto: Boolean): ArrayData = {
    val words = text.toString.split(" ", -1)
    val lo = if (upto) 1 else n
    var total = 0
    var g = lo
    while (g <= n) { if (words.length >= g) total += words.length - g + 1; g += 1 }
    val out = new Array[Long](total)
    var k = 0
    g = lo
    while (g <= n) {
      var i = 0
      val m = words.length - g + 1
      while (i < m) {
        var h = 0L
        var d = 0
        while (d < g) {
          if (d > 0) h = (h * 31L + 32L) % P
          val w = words(i + d)
          var c = 0
          while (c < w.length) {
            val cp = w.codePointAt(c)
            h = (h * 31L + cp) % P
            c += Character.charCount(cp)
          }
          d += 1
        }
        out(k) = h
        k += 1
        i += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** norm_text(s) -> STRING — text normalization for dedup in one native
  * pass: lowercase, replace every char outside [a-z0-9 ] with a space,
  * squeeze space runs, trim. Bit-identical to the SQL spec
  * `TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(s), '[^a-z0-9 ]', ' '), ' +', ' '))`
  * (PropertiesSpec asserts equality on random inputs, the DuckDB oracle
  * evaluates the regex form): lowercasing uses the same UTF8String call as
  * Spark's LOWER, and per-code-point space replacement collapses the same
  * way the two-regex chain does.
  *
  * Why native: the regex chain compiles two java.util.regex patterns per
  * expression tree and walks the string three times with intermediate
  * UTF8String allocations — the last multi-second interpreted per-row loop
  * in the round-1 bench (q_dedup_exact_norm, 2.8s). This is a single
  * forward scan with one output buffer.
  */
case class NormText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"norm_text expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormText.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
  override def prettyName: String = "norm_text"
}

object NormText {
  def compute(text: UTF8String): UTF8String = {
    // Same lowercase as Spark's LOWER (UTF8String.toLowerCase), then one
    // forward scan. Non-[a-z0-9] code points become spaces exactly as the
    // per-code-point regex replacement does; squeezing makes the per-unit
    // vs per-point distinction unobservable.
    val s = text.toLowerCase.toString
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if ((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')) {
        if (pendingSpace) sb.append(' ')
        pendingSpace = false
        sb.append(cp.toChar)
      } else {
        // space (literal or replaced): pending only if something was kept
        if (sb.length > 0) pendingSpace = true
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** lsh_bucket(vec, nBits, dim) -> INT — sign-bit LSH bucket id over the
  * deterministic hyperplanes hp_j[i] = ((i*37 + j*101) mod 11) - 5, exactly
  * the HashSpec.lshBucket SQL form (left-to-right double folds; a missing
  * or NULL element makes that hyperplane's dot NULL, which contributes 0 to
  * the bucket, matching ELEMENT_AT + AGGREGATE semantics). One pass over
  * the vector per hyperplane instead of nBits interpreted lambda chains.
  */
case class LshBucket(child: Expression, nBits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et.isInstanceOf[NumericType] && nBits > 0 && nBits < 31 && dim > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects ARRAY<numeric> and positive nBits/dim, got ${other.catalogString}")
  }

  @transient private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any =
    LshBucket.compute(input.asInstanceOf[ArrayData], nBits, dim, elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("lshBucketEt", elemType)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshBucket.compute($c, $nBits, $dim, $et);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
  override def prettyName: String = "lsh_bucket"
}

object LshBucket {
  def compute(vec: ArrayData, nBits: Int, dim: Int, et: DataType): Int = {
    val n = vec.numElements()
    var bucket = 0
    var j = 0
    while (j < nBits) {
      var s = 0.0
      var isNull = false
      var i = 0
      while (!isNull && i < dim) {
        if (i >= n || vec.isNullAt(i)) isNull = true
        else {
          val coef = ((i * 37 + j * 101) % 11 - 5).toDouble
          val x = et match {
            case FloatType => vec.getFloat(i).toDouble
            case DoubleType => vec.getDouble(i)
            case IntegerType => vec.getInt(i).toDouble
            case LongType => vec.getLong(i).toDouble
            case ShortType => vec.getShort(i).toDouble
            case ByteType => vec.getByte(i).toDouble
            case other => throw new IllegalStateException(s"lsh_bucket: $other")
          }
          s += x * coef
          i += 1
        }
      }
      if (!isNull && s > 0) bucket |= 1 << j
      j += 1
    }
    bucket
  }
}

/** vec_dot(a, b) -> DOUBLE — sequential-fold dot product of two numeric
  * arrays, bit-identical to the HashSpec.dot SQL fragment (left-to-right
  * double accumulation, so the DuckDB oracle's list_reduce matches exactly).
  * NULL when either array is NULL, lengths differ, or any element is NULL —
  * the same result the ZIP_WITH/AGGREGATE form produces.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => et.isInstanceOf[NumericType]
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two ARRAY<numeric>, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")

  @transient private lazy val leftType =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightType =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftType, rightType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val at = ctx.addReferenceObj("vecDotAt", leftType)
    val bt = ctx.addReferenceObj("vecDotBt", rightType)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""Object vecDotR = graft.functions.VecDot.compute($a, $b, $at, $bt);
         |if (vecDotR == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) vecDotR).doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

object VecDot {
  def compute(a: ArrayData, b: ArrayData, at: DataType, bt: DataType): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += num(a, i, at) * num(b, i, bt)
      i += 1
    }
    s
  }

  private def num(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case other => throw new IllegalStateException(s"vec_dot: $other")
  }
}

/** cdc_chunks(text, w, div) -> ARRAY<STRING> — content-defined chunking:
  * split the document at positions where the poly31 hash (mod 1e9+7) of
  * the trailing w-codepoint window divides by `div`. Boundaries depend
  * only on local content, so an insertion early in a document shifts at
  * most one chunk instead of re-slicing everything — the property that
  * makes chunk-level dedup stable under edits (the rolling-window cut
  * rule of LBFS/rsync-style CDC; fixed-stride chunking is
  * `TextAnalysis.chunk`). Expected chunk length is `div` codepoints.
  *
  * Spec (engine-portable, DuckDB replays it exactly on the ASCII test
  * domain): a cut falls AFTER 1-based position i when w <= i < len(text)
  * and poly31(text[i-w+1..i]) % div == 0; chunks are the slices between
  * consecutive cuts (never empty — the tail always keeps >= 1 char).
  * Computed with a rolling update (subtract the outgoing char's
  * 31^(w-1) term, all mod 1e9+7) — one pass, no per-window refold.
  */
case class CdcChunks(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if window > 0 && divisor > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("cdc_chunks: w and div must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunks.compute($c, $window, $divisor);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  private final val P = 1000000007L

  def compute(text: UTF8String, w: Int, div: Int): ArrayData = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // 31^(w-1) mod P for the rolling subtraction of the outgoing codepoint
    var powW = 1L
    var e = 0
    while (e < w - 1) { powW = powW * 31L % P; e += 1 }
    val cutList = new java.util.ArrayList[Integer]()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 31L + cps(i)) % P
      if (i >= w) h = ((h - cps(i - w) * powW % P * 31L % P) % P + P) % P
      // 1-based end position i+1; a cut at the last position would leave an
      // empty tail chunk, so it is excluded
      if (i + 1 >= w && i + 1 < n && h % div == 0) cutList.add(i + 1)
      i += 1
    }
    val out = new Array[Any](cutList.size() + 1)
    var start = 0
    var k = 0
    while (k <= cutList.size()) {
      val end = if (k < cutList.size()) cutList.get(k).intValue() else n
      out(k) = UTF8String.fromString(new String(cps, start, end - start))
      start = end
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** window_hashes(text, len, stride[, base]) -> ARRAY<BIGINT> — the rolling
  * hash of every length-`len` codepoint window starting at offsets 0,
  * stride, 2*stride, ... (element i covers [i*stride, i*stride + len)).
  * The ExactSubstr window-hashing primitive: `Dedup.repeatedSubstringSpans`
  * flags windows whose hash repeats corpus-wide, so only hash EQUALITY
  * matters, never the value — which is what makes a rolling hash a valid
  * drop-in for the md5(SUBSTRING(...)) spelling it replaced (same spans
  * modulo 64-bit collisions: ~1e8 windows at sf0.1 stride 1 is a ~5e-4
  * birthday bound corpus-wide).
  *
  * COLLISION FAILURE MODE — what a 64-bit collision actually does: two
  * UNRELATED windows hashing equal make BOTH look corpus-repeated, so a
  * collision can mint a false SPAN out of nothing (a singleton minLen-char
  * span in each colliding document, silently scrubbed from training text
  * by removeSpans) — not merely widen a real span. The corpus-wide
  * birthday arithmetic grows quadratically with window count: negligible
  * at sf0.1 (~5e-4), ~2-3% odds of ONE spurious pair at 1e9 stride-1
  * windows, and routine far beyond. And a FIXED public polynomial base
  * mod 2^64 admits known adversarial collision families (Thorup's
  * observation that polynomial hashing mod a power of two is weak —
  * crafted documents can force collisions regardless of base quality).
  * Two mitigations, both via the optional 4th `base` argument (any odd
  * 64-bit literal): (1) per-run seeding — draw a random odd base each run
  * so an adversary cannot precompute collisions; (2) 128-bit keying — run
  * the pass twice with independent bases and key on the PAIR, squaring
  * the birthday bound away (~1e-20 at 1e10 windows); this is what
  * `Dedup.repeatedSubstringSpans(wide = true)` does. The DuckDB oracle
  * (md5-based) only guards fixture scale.
  *
  * Why native: the SUBSTRING+md5 plan evaluates len codepoints + one
  * digest per WINDOW — O(chars * len) work at stride 1 (the
  * guaranteed-detection ExactSubstr setting), which is what kept stride 1
  * parked at sf0.01. This is one multiply-add and one subtract per
  * CHARACTER (classic Rabin-Karp over mod-2^64 polynomial hashing, base
  * FNV-prime), O(chars) regardless of len, emitting 8-byte keys instead of
  * 32-hex-char digests — less work AND a 4x smaller shuffle.
  *
  * Memory: the result materializes ~(chars/stride) longs per ROW before
  * the consumer's posexplode streams it — same O(chars) class as the
  * SEQUENCE array the md5 spelling exploded, but 8 bytes per window at
  * stride 1. Normal web/book documents (<= tens of MB) are fine; for
  * pathological multi-100MB single documents, pre-chunk
  * (TextAnalysis.chunk / cdc_chunks) before span detection, as every
  * suffix-array ExactSubstr implementation also must.
  */
case class WindowHashes(child: Expression, len: Int, stride: Int,
                        base: Long = WindowHashes.DefaultBase)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if len > 0 && stride > 0 && (base & 1L) == 1L =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "window_hashes: len and stride must be positive and base odd")
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_hashes expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[UTF8String], len, stride, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowHashes.compute($c, $len, $stride, ${base}L);")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
  override def prettyName: String = "window_hashes"
}

object WindowHashes {
  // FNV-1a 64-bit prime: odd (invertible mod 2^64) with good avalanche as
  // a polynomial base; arithmetic is exact in the 2^64 ring (Java long
  // wraparound), so the rolling subtraction needs no modular correction.
  // Any odd base is invertible the same way — callers may substitute a
  // per-run random odd base (adversarial corpora) or a second fixed base
  // (128-bit pair keying); SecondBase is the committed companion.
  final val DefaultBase = 0x100000001b3L
  // golden-ratio odd constant (splitmix64's increment): independent
  // avalanche profile from the FNV prime, used by the two-base wide keying
  final val SecondBase = 0x9e3779b97f4a7c15L

  def compute(text: UTF8String, len: Int, stride: Int, base: Long): ArrayData = {
    val B = base
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < len)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    // B^(len-1) for the rolling removal of the outgoing codepoint
    var pow = 1L
    var e = 0
    while (e < len - 1) { pow *= B; e += 1 }
    // primitive long[] + UnsafeArrayData: no per-element boxing — at
    // stride 1 this array is one element per document character
    val out = new Array[Long]((n - len) / stride + 1)
    var h = 0L
    var i = 0
    var k = 0
    while (i < n) {
      h = h * B + cps(i)
      if (i >= len) h -= cps(i - len) * pow * B
      val start = i + 1 - len
      if (start >= 0 && start % stride == 0) {
        out(k) = h
        k += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
