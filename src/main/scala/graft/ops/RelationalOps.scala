package graft.ops

import graft.model.Outcome
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators distilled from the reference pipeline
  * (SURVEY.md §2) — the payload-agnostic versions of what the engine
  * specializes for audio. */
object RelationalOps {

  /** The reference's core left-outer diff join + 3-way classify (J2/J3,
    * SourceSystemDataCheckerService.java:116-146) over arbitrary key and
    * payload columns: absent in baseline ⇒ new; any payload column
    * null-safely different ⇒ changed; else unchanged. */
  def diffClassify(incoming: DataFrame, baseline: DataFrame,
      keyCols: Seq[String], payloadCols: Seq[String]): DataFrame = {
    // presence = join-existence marker, NOT payload nullness: a baseline row
    // whose payload columns are all NULL must still classify as present
    // (reference semantics: absent row vs attribute equality are distinct,
    // SourceSystemDataCheckerService.java:132 vs :141-146)
    val base = baseline.select(
      (keyCols.map(col) ++ payloadCols.map(c => col(c).as(s"_base_$c"))) :+
        lit(true).as("_present"): _*)
    val changed = payloadCols.map(c => !(col(c) <=> col(s"_base_$c"))).reduce(_ || _)
    incoming.join(base, keyCols, "left_outer")
      .withColumn("outcome",
        when(col("_present").isNull, Outcome.New)
          .when(changed, Outcome.Changed)
          .otherwise(Outcome.Unchanged))
      .drop(payloadCols.map(c => s"_base_$c") :+ "_present": _*)
  }

  /** Set-equality check per group (J4, SourceSystemDataCheckerService.java:
    * 148-154): for each key, is the set of `valueCol` under condition A the
    * same as under condition B? Detects additions AND removals. */
  def setEqualityByKey(df: DataFrame, keyCol: String, valueCol: String,
      condA: Column, condB: Column): DataFrame = {
    val setA = array_sort(collect_set(when(condA, col(valueCol))))
    val setB = array_sort(collect_set(when(condB, col(valueCol))))
    df.groupBy(col(keyCol))
      .agg(setA.as("_a"), setB.as("_b"))
      .select(col(keyCol),
        size(col("_a")).as("n_a"), size(col("_b")).as("n_b"),
        (col("_a") === col("_b")).as("sets_equal"))
  }

  /** Deterministic top-k (total order via tiebreak columns). */
  def topK(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** Latest row per key by `orderCol` desc (deterministic via tiebreaks). */
  def latestPerKey(df: DataFrame, keyCol: String, ordering: Column*): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(ordering: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}
