package graft.operators

/** Engine-agnostic hash/similarity expression fragments (Spark SQL side).
  *
  * These are the single source of truth shared by the operator API
  * (graft.operators.*) and the verified query inventory
  * (graft.queries.PipelineQueries); the DuckDB oracles mirror the same
  * integer/double arithmetic, so any edit here must keep the spec:
  *
  *   poly31(s)  = fold chars: h = (h*31 + codepoint) mod 1e9+7
  *   minhash_i  = min over shingles of ((2i+1)*poly31(sh) + 7919i + 1) mod 1e9+7
  *   knuth32(h) = (h * 2654435761) mod 2^32
  *   dot(a,b)   = sequential double fold of elementwise products
  *
  * All fragments are built-in higher-order-function expressions (no Scala
  * UDFs), so they stay inside Catalyst and distribute trivially.
  */
object HashSpec {

  /** poly31 char-fold hash of a string expression -> BIGINT in [0, 1e9+7). */
  def poly31(arg: String): String =
    s"AGGREGATE(FILTER(SPLIT($arg, ''), c -> c <> ''), CAST(0 AS BIGINT), (a, c) -> (a * 31 + ASCII(c)) % 1000000007)"

  /** Word n-gram shingles of a token-array expression (arrays of strings). */
  def shingles(tokensArr: String, n: Int = 3): String =
    s"""CASE WHEN SIZE($tokensArr) >= $n
       |  THEN TRANSFORM(SEQUENCE(1, SIZE($tokensArr) - ${n - 1}),
       |         i -> CONCAT_WS(' ', ${(0 until n).map(d => s"ELEMENT_AT($tokensArr, i + $d)").mkString(", ")}))
       |  ELSE ARRAY('_') END""".stripMargin

  /** k minhash values over a BIGINT-array expression of shingle hashes.
    *
    * Single sequential fold producing all k minima in one pass: the naive
    * TRANSFORM(SEQUENCE(0,k-1), i -> ARRAY_MIN(TRANSFORM(hashes, ...)))
    * form re-evaluates its input expression per permutation once Catalyst
    * collapses the projections (16x the whole shingle+hash pipeline — was
    * 4x wall-clock on the dedup queries). A fold evaluates `hashArr` once
    * and does O(k) arithmetic per element. */
  def minhashSig(hashArr: String, k: Int = 16): String =
    s"""AGGREGATE($hashArr,
       |  TRANSFORM(SEQUENCE(0, ${k - 1}), i -> CAST(1000000006 AS BIGINT)),
       |  (acc, h) -> ZIP_WITH(acc, SEQUENCE(0, ${k - 1}),
       |    (a, i) -> LEAST(a, ((2 * i + 1) * h + 7919 * i + 1) % 1000000007)))""".stripMargin

  /** Sequential-fold dot product of two array<float/double> expressions.
    * This is the SPEC form (mirrored by the DuckDB oracles); hot paths use
    * dotNative, which computes the identical left-to-right double fold. */
  def dot(a: String, b: String): String =
    s"AGGREGATE(ZIP_WITH($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (s, v) -> s + v)"

  /** Native codegen'd dot product (graft.functions.VecDot) — bit-identical
    * to dot(); requires TajoFunctions.register on the session. */
  def dotNative(a: String, b: String): String = s"vec_dot($a, $b)"

  /** Native codegen'd minhash signature straight from the text column
    * (graft.functions.MinHashSig): SPLIT-on-space + n-gram shingles +
    * poly31 + k permutation minima in one pass, identical to
    * minhashSig(shingle-hash pipeline). Requires TajoFunctions.register. */
  def minhashNative(textCol: String, k: Int = 16, n: Int = 3): String =
    s"minhash_sig($textCol, $k, $n)"

  /** Signed projection onto deterministic hyperplane j (for LSH buckets):
    * hp_j[i] = ((i*37 + j*101) mod 11) - 5. */
  def hyperplaneDot(vec: String, j: Int, dim: Int = 64): String =
    s"AGGREGATE(TRANSFORM(SEQUENCE(0, ${dim - 1}), i -> CAST(ELEMENT_AT($vec, i + 1) AS DOUBLE) * (((i * 37 + $j * 101) % 11) - 5)), CAST(0 AS DOUBLE), (s, x) -> s + x)"

  /** Sign-bit LSH bucket id over `nBits` hyperplanes (SPEC form). */
  def lshBucket(vec: String, nBits: Int = 4, dim: Int = 64): String =
    (0 until nBits).map(j => s"(CASE WHEN ${hyperplaneDot(vec, j, dim)} > 0 THEN ${1 << j} ELSE 0 END)").mkString(" + ")

  /** Native codegen'd bucket id (graft.functions.LshBucket) — identical to
    * lshBucket(); requires TajoFunctions.register. */
  def lshBucketNative(vec: String, nBits: Int = 4, dim: Int = 64): String =
    s"lsh_bucket($vec, $nBits, $dim)"
}
