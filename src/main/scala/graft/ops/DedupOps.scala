package graft.ops

import org.apache.spark.sql.graft.TextExpressions.simhash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around one shuffle-bounded plan:
  *
  *  - exact: hash-groupBy on content (or any column set);
  *  - MinHash + LSH: shingle → k-lane minhash → banded bucket join —
  *    candidate generation never compares all pairs (the only O(n²) step,
  *    verification, runs on the candidate set alone);
  *  - SimHash: 64-bit sign-vector fingerprint, banded by 16-bit chunks,
  *    Hamming-verified with `bit_count(a^b)`;
  *  - n-gram Jaccard: exact similarity via an inverted-index self-join on
  *    shingles (the verifier/oracle for the sketch-based paths).
  */
object DedupOps {

  /** Exact-duplicate groups by `cols`: one row per duplicated value set,
    * with the surviving (minimum) id and the multiplicity. */
  def exactDupGroups(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Exact dedup keeping the smallest id per content group (deterministic,
    * unlike dropDuplicates' arbitrary pick). */
  def dedupKeepMinId(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame = {
    val keep = df.groupBy(cols.map(col): _*).agg(min(col(idCol)).as(idCol))
    df.join(keep, cols :+ idCol, "left_semi")
  }

  /** (id, shingle) inverted index over distinct word n-gram shingles. */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("_id"),
      explode(array_distinct(TextOps.shingles(col(textCol), n))).as("_s"))

  /** Exact n-gram Jaccard pairs ≥ threshold via inverted-index self-join:
    * intersection counts from the shingle join, union from per-doc sizes.
    * Emits (a, b, inter, uni) with a < b. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val dt = shingleIndex(docs, idCol, textCol, n)
    val sz = dt.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val inter = dt.as("x").join(dt.as("y"),
        col("x._s") === col("y._s") && col("x._id") < col("y._id"))
      .groupBy(col("x._id").as("a"), col("y._id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.withColumnRenamed("_id", "a").withColumnRenamed("_n", "na"), "a")
      .join(sz.withColumnRenamed("_id", "b").withColumnRenamed("_n", "nb"), "b")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter").cast("double") / col("uni") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("uni"))
  }

  /** k-lane MinHash signatures over word n-gram shingles: ONE explode +
    * ONE groupBy computing all k minima (k independent xxhash64 lanes). */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32): DataFrame = {
    val dt = shingleIndex(docs, idCol, textCol, n)
    val lanes = (0 until k).map(i => min(xxhash64(lit(i), col("_s"))).as(s"_mh$i"))
    dt.groupBy(col("_id")).agg(lanes.head, lanes.tail: _*)
  }

  /** LSH candidate pairs: band the k-lane signature into `bands` groups of
    * k/bands rows, bucket-join on (band index, band hash). Identical-band
    * docs collide; distinct pairs only (a < b). */
  def lshCandidatePairs(signatures: DataFrame, k: Int = 32, bands: Int = 8): DataFrame = {
    val rows = k / bands
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        xxhash64((bnd * rows until (bnd + 1) * rows).map(i => col(s"_mh$i")): _*).as("h"))
    }
    val buckets = signatures
      .select(col("_id"), explode(array(bandCols: _*)).as("_b"))
      .select(col("_id"), col("_b.band").as("_band"), col("_b.h").as("_h"))
    buckets.as("x").join(buckets.as("y"),
        col("x._band") === col("y._band") && col("x._h") === col("y._h") &&
          col("x._id") < col("y._id"))
      .select(col("x._id").as("a"), col("y._id").as("b"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs, exactly verified: candidates from the
    * banded buckets, then true Jaccard computed ONLY for candidates via a
    * candidate-filtered inverted-index join. */
  def minHashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8, threshold: Double = 0.2): DataFrame = {
    val sigs = minHashSignatures(docs, idCol, textCol, n, k)
    val cands = lshCandidatePairs(sigs, k, bands)
    val dt = shingleIndex(docs, idCol, textCol, n)
    val candIds = cands.select(col("a").as("_id"))
      .union(cands.select(col("b").as("_id"))).distinct()
    val dtc = dt.join(candIds, Seq("_id"), "left_semi")
    val sz = dtc.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val inter = dtc.as("x").join(dtc.as("y"),
        col("x._s") === col("y._s") && col("x._id") < col("y._id"))
      .groupBy(col("x._id").as("a"), col("y._id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(cands, Seq("a", "b"), "left_semi") // only LSH candidates
    inter
      .join(sz.withColumnRenamed("_id", "a").withColumnRenamed("_n", "na"), "a")
      .join(sz.withColumnRenamed("_id", "b").withColumnRenamed("_n", "nb"), "b")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("uni"), col("jaccard"))
  }

  /** SimHash near-duplicates: 64-bit fingerprints, banded into four 16-bit
    * chunks (any pair within Hamming distance 3 shares ≥1 identical chunk —
    * pigeonhole), verified with bit_count(a XOR b) ≤ maxHamming. */
  def simHashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("_id"),
      simhash64(TextOps.distinctTokens(col(textCol))).as("_sig"))
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("band"), shiftright(col("_sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("h")))
    val buckets = sigs.select(col("_id"), col("_sig"), explode(array(chunks: _*)).as("_b"))
      .select(col("_id"), col("_sig"), col("_b.band").as("_band"), col("_b.h").as("_h"))
    buckets.as("x").join(buckets.as("y"),
        col("x._band") === col("y._band") && col("x._h") === col("y._h") &&
          col("x._id") < col("y._id"))
      .select(col("x._id").as("a"), col("y._id").as("b"),
        bit_count(col("x._sig").bitwiseXOR(col("y._sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
