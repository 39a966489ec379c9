package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL builders for the library's native Catalyst expressions — the single
  * registration list shared by [[TajoFunctions.register]] (per-session temp
  * functions) and [[graft.GraftExtensions]] (spark.sql.extensions
  * injection). Sizing arguments must be INT literals: they become
  * compile-time constants of the generated code, which is what makes these
  * expressions codegen as tight constant-bound loops.
  */
object NativeExprs {

  private def intLit(fn: String)(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(s"$fn: $name must be an INT literal")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash32" -> (exprs => SimHash32(exprs.head)),
    "simhash60" -> (exprs => SimHash60(exprs.head)),
    "norm_text" -> (exprs => NormText(exprs.head)),
    "vec_dot" -> (exprs => VecDot(exprs(0), exprs(1))),
    "minhash_sig" -> { exprs =>
      val lit = intLit("minhash_sig") _
      val k = if (exprs.length > 1) lit(exprs(1), "k") else 16
      val n = if (exprs.length > 2) lit(exprs(2), "n") else 3
      MinHashSig(exprs.head, k, n)
    },
    "ngram_hash_set" -> { exprs =>
      val n = if (exprs.length > 1) intLit("ngram_hash_set")(exprs(1), "n") else 3
      NgramHashSet(exprs.head, n)
    },
    "gram_hashes" -> { exprs =>
      val n = if (exprs.length > 1) intLit("gram_hashes")(exprs(1), "n") else 1
      GramHashes(exprs.head, n)
    },
    "gram_hashes_upto" -> { exprs =>
      val n = if (exprs.length > 1) intLit("gram_hashes_upto")(exprs(1), "n") else 2
      GramHashes(exprs.head, n, upto = true)
    },
    "lsh_bucket" -> { exprs =>
      val lit = intLit("lsh_bucket") _
      val nBits = if (exprs.length > 1) lit(exprs(1), "nBits") else 4
      val dim = if (exprs.length > 2) lit(exprs(2), "dim") else 64
      LshBucket(exprs.head, nBits, dim)
    },
    "cdc_chunks" -> { exprs =>
      val lit = intLit("cdc_chunks") _
      val w = if (exprs.length > 1) lit(exprs(1), "w") else 8
      val div = if (exprs.length > 2) lit(exprs(2), "div") else 64
      CdcChunks(exprs.head, w, div)
    },
    "window_hashes" -> { exprs =>
      val lit = intLit("window_hashes") _
      val len = if (exprs.length > 1) lit(exprs(1), "len") else 50
      val stride = if (exprs.length > 2) lit(exprs(2), "stride") else 1
      // optional 4th arg: the polynomial base (odd INT/BIGINT literal) —
      // per-run seeding / two-base keying, see the WindowHashes scaladoc
      val base = if (exprs.length > 3) exprs(3) match {
        case Literal(v: Long, _) => v
        case Literal(v: Int, _) => v.toLong
        case _ => throw new IllegalArgumentException(
          "window_hashes: base must be an integral literal")
      } else WindowHashes.DefaultBase
      WindowHashes(exprs.head, len, stride, base)
    },
    // Spark's own runtime-filter sketch surfaced as a callable pair: the
    // aggregate folds xxhash64 values into a serialized BloomFilterImpl
    // (partial sketches OR-merge, so it is one narrow pass at any scale),
    // the predicate probes a foldable sketch literal. Used by
    // graft.operators.Dedup.incrementalBloom.
    "bloom_agg" -> { exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2))
    },
    "bloom_might_contain" -> { exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))
    })
}
