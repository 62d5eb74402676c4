package graft.ops

import graft.audio.Audio
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — exact, O(|Q|·|C|), fine when the
  * query side is small/broadcastable. Scale path: random-hyperplane LSH —
  * deterministic seeded hyperplanes hash vectors into 2^p sign buckets; the
  * join only compares within a bucket (multi-probe over Hamming-1 neighbor
  * buckets recovers most of the recall the bucketing loses).
  *
  * All vector math uses `zip_with`/`aggregate` higher-order functions over
  * double-cast arrays — codegen'd, no UDFs, no driver-side loops.
  */
object AnnOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, _.cast("double"))
    val bd = transform(b, _.cast("double"))
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Exact cosine top-k: every query row against every corpus row (the
    * query side is broadcast — callers keep it small), ranked per query
    * with a deterministic tiebreak. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_sim").desc, col("neighbor_id").asc)
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("_sim", cosine(col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("_sim"), 3).as("sim"))
  }

  /** Deterministic seeded random hyperplanes (SplitMix64 → uniform in
    * [-1,1]); p planes ⇒ 2^p buckets. */
  private def hyperplanes(dim: Int, p: Int, seed: Long): Seq[Array[Double]] =
    (0 until p).map { pl =>
      Array.tabulate(dim)(d => Audio.unit(seed ^ (pl * 0x9E3779B97F4A7C15L), d) * 2.0 - 1.0)
    }

  /** Sign-bucket id for each vector: bit i = sign(v · plane_i). */
  def lshBucket(vec: Column, dim: Int, p: Int = 12, seed: Long = 42L): Column = {
    val vd = transform(vec, _.cast("double"))
    val bits = hyperplanes(dim, p, seed).zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(vd, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: queries and corpus hash to sign
    * buckets; candidates = same bucket plus all probe buckets within
    * Hamming distance `probeRadius` of the query's bucket (multi-probe);
    * exact cosine re-rank within candidates. Recall/cost dial: higher `p`
    * = smaller buckets (cheaper, lower recall), higher `probeRadius` =
    * more buckets searched (higher recall). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      p: Int = 8, probeRadius: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucket = lshBucket(col(vecCol), dim, p)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"), bucket.as("_bkt"))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"), bucket.as("_qb"))
    val masks: Seq[Long] = (0L until (1L << p))
      .filter(m => java.lang.Long.bitCount(m) <= probeRadius)
    val probes =
      qBase.withColumn("_bkt", explode(array(masks.map(m => col("_qb").bitwiseXOR(lit(m))): _*)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_sim").desc, col("neighbor_id").asc)
    probes.join(c, Seq("_bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("_sim", cosine(col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("_sim"), 3).as("sim"))
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold) via
    * LSH buckets — the scalable variant of a full O(n²) sweep. */
  def embeddingNearDupPairs(vectors: DataFrame, threshold: Double, dim: Int,
      p: Int = 6, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol).as("_id"), col(vecCol).as("_v"),
      lshBucket(col(vecCol), dim, p).as("_bkt"))
    v.as("x").join(v.as("y"),
        col("x._bkt") === col("y._bkt") && col("x._id") < col("y._id"))
      .withColumn("_sim", cosine(col("x._v"), col("y._v")))
      .filter(col("_sim") >= threshold)
      .select(col("x._id").as("a"), col("y._id").as("b"), round(col("_sim"), 3).as("sim"))
  }
}
