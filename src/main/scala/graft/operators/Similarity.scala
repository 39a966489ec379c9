package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute force is the correctness baseline (queries broadcast against the
  * corpus — one pass, no shuffle of the corpus). The scale path buckets the
  * corpus by sign-bit LSH so each probe scans corpus/2^nBits on average;
  * both return exact cosine scores for whatever candidates they consider.
  */
object Similarity {

  private def withNorm(vectors: DataFrame, idCol: String, vecCol: String) = {
    graft.functions.TajoFunctions.register(vectors.sparkSession)
    vectors.select(col(idCol), col(vecCol).as("__vec"))
      .withColumn("__nrm", expr(s"SQRT(${HashSpec.dotNative("__vec", "__vec")})"))
  }

  /** Exact top-k neighbors for each probe vector (brute force).
    * `probes` and `corpus` share the (idCol, vecCol) schema. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                     vecCol: String, k: Int = 10): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("__vec").as("vc"), col("__nrm").as("nc"))
    val q = withNorm(probes, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("__vec").as("vq"), col("__nrm").as("nq"))
    // broadcast the probes (small side) against the corpus scan
    val joined = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", expr(s"${HashSpec.dotNative("vq", "vc")} / (nq * nc)"))
    joined
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rnk")
  }

  /** LSH-bucketed ANN: probes only scan their own sign-bit bucket. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, k: Int = 10, nBits: Int = 4, dim: Int = 64): DataFrame = {
    def bucketed(df: DataFrame) = withNorm(df, idCol, vecCol)
      .withColumn("__bucket", expr(HashSpec.lshBucketNative("__vec", nBits, dim)))
    val c = bucketed(corpus)
      .select(col(idCol).as("neighbor_id"), col("__vec").as("vc"), col("__nrm").as("nc"), col("__bucket"))
    val q = bucketed(probes)
      .select(col(idCol).as("query_id"), col("__vec").as("vq"), col("__nrm").as("nq"), col("__bucket"))
    c.join(broadcast(q), Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", expr(s"${HashSpec.dotNative("vq", "vc")} / (nq * nc)"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rnk", "__bucket")
  }
}
