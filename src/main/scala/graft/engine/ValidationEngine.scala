package graft.engine

import graft.functions.KllMergeAgg.kll_merge_agg
import graft.functions.KllSketchAgg
import graft.functions.KllSketchAgg.kll_sketch_agg
import graft.functions.PcmFunctions
import graft.functions.PcmFunctions.pcm_allclose
import graft.model.Outcome
import graft.rules._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Execution config. `saltBuckets` drives the two-phase salted aggregation
  * on the hot partition key (≈80% of rows share codec=pcm_s16le — see
  * ClipSynth); `broadcastThresholdBytes` drives explicit broadcast-vs-
  * shuffle join selection by estimated side size (north rule). */
final case class EngineConfig(
    partitionCol: String = "codec",
    saltBuckets: Int = 16,
    broadcastThresholdBytes: Long = 10L << 20,
    minSnrDb: Double = 30.0,
    /** dedup+reuse: persist the deduplicated event set once instead of
      * recomputing its shuffle for every rule branch. At cluster scale this
      * becomes "write the deduped snapshot to a scratch table" — same
      * pattern, different storage tier. */
    persistEvents: Boolean = true,
    /** When true, the pcm_equality diff decodes and SNR-compares EVERY
      * matched row instead of short-circuiting byte-hash-equal pairs —
      * semantically identical (byte-equal ⇒ SNR=∞), but compute-weighted
      * like a production audio-validation profile. The default hash-first
      * path is bandwidth-bound and ~an order of magnitude cheaper. */
    fullDecodeVerify: Boolean = false)

/** verdicts(partition_values, rule_id, pass, violation_count)
  * violations(clip_id, rule_id, observed, expected)
  * — the engine's public outputs (FIXTURES.md §2). `unpersist()` releases
  * the intermediate caches once outputs are materialized. */
final case class ValidationReport(
    verdicts: DataFrame,
    violations: DataFrame,
    private val cached: Seq[DataFrame] = Nil) {
  /** Blocking: the next batch must not start while this run's cache blocks
    * still occupy executor storage memory — async removal lets a back-to-
    * back run inherit a near-full heap and pay its predecessor's GC debt. */
  def unpersist(): Unit = cached.foreach(_.unpersist(blocking = true))
}

/** The validation engine: compiles a `Seq[Rule]` over the clips table into
  * a minimal set of Spark jobs.
  *
  * Dataflow (mirrors the reference pipeline, SURVEY.md §3.1, re-expressed
  * as Catalyst plans):
  *
  *   1. input dedup (S4, RabbitMqConsumerService.java:27)  — exact
  *      duplicate events dropped BEFORE any rule sees them;
  *   2. ONE fused, salted two-phase aggregation computes every stats rule
  *      (null rate, min/max, HLL distinct, KLL drift sketch) per partition
  *      — the analog of the reference's single pass over the batch;
  *   3. uniqueness = salted two-phase count on the natural key (S5,
  *      SourceSystemDataCheckerService.java:42-45);
  *   4. referential = left-anti joins both directions (J4);
  *   5. pcm_equality = left-outer diff join vs baseline + 3-way classify
  *      (J2/J3, SourceSystemDataCheckerService.java:116-154);
  *   6. verdict/violation routing (A1) + per-partition lineage (W1).
  */
object ValidationEngine {

  private val PV = "_pv" // internal partition-values column on violations

  /** Salt derived from the natural key: rows of the same hot *partition*
    * spread over `saltBuckets` reducers in phase 1, then phase 2 merges the
    * (few) per-salt partials per partition. All phase-1 aggregates used
    * here are mergeable (sum/min/max/HLL-union/KLL-merge) by construction. */
  private def saltCol(cfg: EngineConfig): Column =
    pmod(xxhash64(col("clip_id")), lit(cfg.saltBuckets))

  private def pvCol(cfg: EngineConfig): Column =
    concat(lit(cfg.partitionCol + "="), coalesce(col(cfg.partitionCol).cast("string"), lit("null")))

  /** 128-bit full-row fingerprint (two independent xxhash64 lanes — at
    * 10^12 rows a single 64-bit lane has a non-negligible birthday
    * collision chance). */
  private def fpCols: Seq[Column] = Seq(
    xxhash64(lit(1), col("clip_id"), col("bytes"), col("sr_hz"), col("dur_ms"), col("codec"), col("transcript")).as("_fp1"),
    xxhash64(lit(2), col("clip_id"), col("bytes"), col("sr_hz"), col("dur_ms"), col("codec"), col("transcript")).as("_fp2"))

  /** Hash-only dedup: `dropDuplicates` would aggregate `first(col)` over
    * every carried column, and any STRING column forces Spark into
    * SortBasedAggregation (hash aggregation requires fixed-width mutable
    * buffers) — a full sort with per-column first() buffers. A
    * min-surrogate-id + semi-join plan is no better: the nondeterministic
    * surrogate is re-evaluated on both join sides, so a reordered upstream
    * or task retry could keep zero or two rows of a group.
    *
    * Instead: ONE hash exchange on the fingerprint longs, a spillable
    * fixed-key local sort, and a streaming first-of-run pass. Deterministic
    * by construction: the fingerprint covers every column (including ones
    * later dropped), so rows within a group are byte-identical and the
    * emitted row's content does not depend on which physical row survives
    * a retry or reorder. Constant memory, single shuffle, no join. */
  private def dedupByFingerprint(df: DataFrame): DataFrame = {
    val schema = df.schema
    val i1 = schema.fieldIndex("_fp1")
    val i2 = schema.fieldIndex("_fp2")
    df.repartition(col("_fp1"), col("_fp2"))
      .sortWithinPartitions(col("_fp1"), col("_fp2"))
      .mapPartitions { it =>
        var h1 = 0L; var h2 = 0L; var first = true
        it.filter { r =>
          val keep = first || r.getLong(i1) != h1 || r.getLong(i2) != h2
          if (keep) { h1 = r.getLong(i1); h2 = r.getLong(i2); first = false }
          keep
        }
      }(org.apache.spark.sql.Encoders.row(schema))
      .drop("_fp1", "_fp2")
  }

  /** Exact-duplicate event removal (S4). Dedup key = full payload
    * fingerprint; the fingerprint keeps the shuffle key narrow while the
    * row rides along. */
  def dedupEvents(clips: DataFrame): DataFrame =
    dedupByFingerprint(clips.select(col("*") +: fpCols: _*))

  /** Metadata-only deduplicated view: the payload participates in the
    * fingerprint but is DROPPED before the dedup shuffle, so the exchange
    * carries ~40 bytes/row instead of the multi-KB audio payload. All
    * metadata rules (stats, uniqueness, referential) run off this. */
  def dedupEventsMeta(clips: DataFrame): DataFrame =
    dedupByFingerprint(clips.select(col("*") +: fpCols: _*).drop("bytes"))

  /** The fused per-partition stats pass: one salted two-phase aggregation
    * for ALL stats rules. Returns one row per partition value with a column
    * per statistic. */
  def statsPass(events: DataFrame, rules: Seq[Rule], cfg: EngineConfig): DataFrame = {
    val p1 = scala.collection.mutable.ArrayBuffer[Column](count(lit(1)).as("n_rows"))
    val p2 = scala.collection.mutable.ArrayBuffer[Column](sum("n_rows").as("n_rows"))
    rules.foreach {
      case NullRate(c, _) =>
        p1 += sum(col(c).isNull.cast("long")).as(s"nulls_$c")
        p2 += sum(s"nulls_$c").as(s"nulls_$c")
      case MinMax(c, lo, hi) =>
        p1 += sum((col(c) < lo || col(c) > hi).cast("long")).as(s"oob_$c")
        p1 += min(col(c)).as(s"min_$c")
        p1 += max(col(c)).as(s"max_$c")
        p2 += sum(s"oob_$c").as(s"oob_$c")
        p2 += min(s"min_$c").as(s"min_$c")
        p2 += max(s"max_$c").as(s"max_$c")
      case ApproxDistinct(c, _) =>
        p1 += hll_sketch_agg(col(c)).as(s"hll_$c")
        p2 += hll_sketch_estimate(hll_union_agg(col(s"hll_$c"))).as(s"dv_$c")
      case Drift(c, _, k) =>
        p1 += kll_sketch_agg(col(c).cast("double"), k).as(s"kll_$c")
        p2 += kll_merge_agg(col(s"kll_$c"), k).as(s"kll_$c")
      case _ => // uniqueness/referential/pcm run as their own (join) jobs
    }
    events
      .groupBy(col(cfg.partitionCol), saltCol(cfg).as("_salt"))
      .agg(p1.head, p1.tail.toSeq: _*)
      .groupBy(col(cfg.partitionCol))
      .agg(p2.head, p2.tail.toSeq: _*)
      .withColumn(PV, concat(lit(cfg.partitionCol + "="),
        coalesce(col(cfg.partitionCol).cast("string"), lit("null"))))
  }

  /** Explicit broadcast-vs-shuffle selection by estimated build-side size
    * (north rule; the reference always hash-builds in heap,
    * SourceSystemDataCheckerService.java:42-45 — here the choice is real).
    *
    * The shuffle path is HINTED to a shuffled hash join: Spark's default
    * sort-merge would SORT both sides, and for payload-carrying rows
    * (multi-KB audio bytes) that sort is pure waste — measured here as the
    * spill wall once the corpus outgrows execution memory (3.2M rows at 2
    * cores: the SMJ sort of 8.6 GB of payload rows dominated the run).
    * Hash-building the bounded right side per partition touches each row
    * once; partition counts sized so build chunks fit executor memory (the
    * same sizing any 100 TB deployment already does for AQE). */
  def sizeAwareJoin(left: DataFrame, right: DataFrame, usingKeys: Seq[String],
      joinType: String, thresholdBytes: Long): DataFrame = {
    val rightSize = right.queryExecution.optimizedPlan.stats.sizeInBytes
    val r = if (rightSize <= thresholdBytes) broadcast(right) else right.hint("shuffle_hash")
    left.join(r, usingKeys, joinType)
  }

  // ------------------------------------------------------------ rule jobs

  /** Row-level violations for null-rate / min-max rules: one column-pruned
    * filter scan over events per rule, all unioned. */
  private def rowLevelViolations(events: DataFrame, rules: Seq[Rule], cfg: EngineConfig): Seq[DataFrame] =
    rules.collect {
      case r @ NullRate(c, _) =>
        events.filter(col(c).isNull)
          .select(col("clip_id"), lit(r.ruleId).as("rule_id"),
            lit("NULL").as("observed"), lit("not null").as("expected"), pvCol(cfg).as(PV))
      case r @ MinMax(c, lo, hi) =>
        events.filter(col(c) < lo || col(c) > hi)
          .select(col("clip_id"), lit(r.ruleId).as("rule_id"),
            col(c).cast("string").as("observed"), lit(s"[$lo, $hi]").as("expected"), pvCol(cfg).as(PV))
    }

  /** Salted two-phase uniqueness: phase 1 counts per (key, salt) — the salt
    * here spreads a pathologically hot key over reducers — phase 2 merges
    * per key and keeps multiplicity > 1.
    *
    * The partition attribution (min PV, deterministic) is computed in a
    * THIRD, tiny aggregation over only the duplicated keys' rows: a string
    * aggregate in the full-data phases would force SortBasedAggregation
    * (string buffers are not hash-aggregable) — a full sort of every event.
    * Phases 1-2 stay all-fixed-width (pure HashAggregate); the string
    * min runs over the handful of violating rows after a semi-join. */
  def uniquenessViolations(events: DataFrame, rule: Uniqueness, cfg: EngineConfig): DataFrame = {
    val k = rule.column
    // phase-1 salt must be ROW-random, not content-derived: a content salt
    // degenerates to one reducer when a hot key's duplicates are also
    // metadata-identical. A per-row surrogate keeps the spread unconditional,
    // and phase 1 only counts (mergeable), so salt nondeterminism is harmless.
    val dupKeys = events
      .select(col(k).as("_key"),
        pmod(xxhash64(monotonically_increasing_id()), lit(cfg.saltBuckets)).as("_salt"))
      .groupBy(col("_key"), col("_salt"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("_key"))
      .agg(sum("_c").as("_n"))
      .filter(col("_n") > 1)
    // null-safe attribution join: a duplicated NULL key is still a
    // violation group (equality join would silently drop it)
    events.select(col(k).as("_key"), pvCol(cfg).as(PV)).as("e")
      .join(dupKeys.as("d"), col("e._key") <=> col("d._key"))
      .groupBy(col("e._key").as("_key"), col("d._n").as("_n"))
      .agg(min(PV).as(PV))
      .select(col("_key").as("clip_id"), lit(rule.ruleId).as("rule_id"),
        col("_n").cast("string").as("observed"), lit("1").as("expected"), col(PV))
  }

  /** Referential presence both directions via anti-joins (J4 analog). */
  def referentialViolations(events: DataFrame, parent: DataFrame, rule: Referential,
      cfg: EngineConfig): Seq[DataFrame] = {
    val parentKeys = parent.select(col(rule.parentColumn).as(rule.childColumn)).distinct()
    val missing = sizeAwareJoin(events.select(col(rule.childColumn), pvCol(cfg).as(PV)),
        parentKeys, Seq(rule.childColumn), "left_anti", cfg.broadcastThresholdBytes)
      .select(col(rule.childColumn).as("clip_id"), lit(rule.ruleId).as("rule_id"),
        lit(s"no ${rule.parentTable} row").as("observed"), lit("present").as("expected"), col(PV))
    if (!rule.bidirectional) Seq(missing)
    else {
      val childKeys = events.select(col(rule.childColumn)).distinct()
      val orphans = sizeAwareJoin(parentKeys, childKeys, Seq(rule.childColumn),
          "left_anti", cfg.broadcastThresholdBytes)
        .select(col(rule.childColumn).as("clip_id"), lit(rule.ruleId).as("rule_id"),
          lit(s"orphan ${rule.parentTable} row").as("observed"),
          lit("clip present").as("expected"), lit(s"table=${rule.parentTable}").as(PV))
      Seq(missing, orphans)
    }
  }

  /** The core 3-way diff classify (J2/J3): left-outer join current events
    * against the baseline snapshot on the natural key; absent ⇒ new,
    * payload-different (PCM SNR < threshold OR transcript ≠) ⇒ changed,
    * else unchanged. Only new/changed become violations — exactly the
    * reference's routing.
    *
    * Scale design: the diff join ships 128-bit payload *hashes*, not the
    * multi-KB audio payloads — the wide shuffle shrinks ~50×. Hash-equal ⇒
    * byte-equal ⇒ unchanged (the reference's byte-equality fast path).
    * Only hash-mismatched rows ("suspects", typically ≪1%) pay the decode:
    * a second, suspect-filtered join re-fetches both payloads and runs the
    * SNR ≥ 30 dB allclose. AQE turns the suspect joins into broadcasts at
    * runtime when the suspect set is small. */
  def classifyAgainstBaseline(events: DataFrame, baseline: DataFrame, cfg: EngineConfig,
      cacheHook: DataFrame => DataFrame = identity): DataFrame = {
    if (cfg.fullDecodeVerify) return classifyFullDecode(events, baseline, cfg)
    def h(c: Column, lane: Int): Column = xxhash64(lit(lane), c)
    // hash projections are CACHED (narrow: ~60B/row without payload) —
    // the plan references them from several branches (suspect derivation,
    // suspect fetch semis, final join) and recomputing them re-reads and
    // re-hashes the multi-KB payload column each time.
    val cur = cacheHook(events
      .withColumn("_h1", h(col("bytes"), 3)).withColumn("_h2", h(col("bytes"), 4))
      .drop("bytes"))
    val base = cacheHook(baseline.select(col("clip_id"),
      h(col("bytes"), 3).as("_bh1"), h(col("bytes"), 4).as("_bh2"),
      col("transcript").as("_bt")))
    // `pre` — the widest shuffle in the system — is persisted (narrow:
    // hashes only, no payload) so its three consumers (suspect derivation,
    // final join, downstream routing) pay the exchange exactly ONCE.
    val pre = cacheHook(
      sizeAwareJoin(cur, base, Seq("clip_id"), "left_outer", cfg.broadcastThresholdBytes)
        .withColumn("_prelim",
          when(col("_bh1").isNull, Outcome.New)
            .when(!(col("transcript") <=> col("_bt")), Outcome.Changed)
            .when(col("_h1") === col("_bh1") && col("_h2") === col("_bh2"), Outcome.Unchanged)
            .otherwise(lit("_suspect"))))

    val suspectIds = cacheHook(
      pre.filter(col("_prelim") === "_suspect").select("clip_id").distinct())
    val curPay = events.select(col("clip_id"), col("codec"), col("bytes"),
        h(col("bytes"), 3).as("_h1"), h(col("bytes"), 4).as("_h2"))
      .join(suspectIds, Seq("clip_id"), "left_semi")
      .dropDuplicates("clip_id", "_h1", "_h2")
    val basePay = baseline.select(col("clip_id"), col("bytes").as("_bb"))
      .join(suspectIds, Seq("clip_id"), "left_semi")
    val resolved = curPay.join(basePay, Seq("clip_id"))
      .select(col("clip_id"), col("_h1"), col("_h2"),
        pcm_allclose(col("codec"), col("_bb"), col("bytes"), cfg.minSnrDb).as("_pcm_ok"))

    pre.join(resolved, Seq("clip_id", "_h1", "_h2"), "left_outer")
      .withColumn("outcome",
        when(col("_prelim") =!= "_suspect", col("_prelim"))
          .when(col("_pcm_ok"), Outcome.Unchanged)
          .otherwise(Outcome.Changed))
      .drop("_h1", "_h2", "_bh1", "_bh2", "_bt", "_prelim", "_pcm_ok")
  }

  /** PCM branch works on the RAW (un-deduped) clips: classifying an exact
    * duplicate yields an identical violation row, so dedup happens on the
    * tiny violations output (fingerprint-keyed) instead of paying a second
    * full-payload shuffle before the diff join. Net: ONE shuffle of the
    * current payload (the join) instead of two. */
  private def pcmViolations(rawClips: DataFrame, baseline: DataFrame, rule: PcmEquality,
      cfg: EngineConfig, cacheHook: DataFrame => DataFrame): DataFrame =
    classifyAgainstBaseline(rawClips.select(col("*") +: fpCols: _*), baseline,
        cfg.copy(minSnrDb = rule.minSnrDb), cacheHook)
      .filter(col("outcome") =!= Outcome.Unchanged)
      .select(col("clip_id"), lit(rule.ruleId).as("rule_id"),
        col("outcome").as("observed"), lit(Outcome.Unchanged).as("expected"), pvCol(cfg).as(PV),
        col("_fp1"), col("_fp2"))
      .dropDuplicates("_fp1", "_fp2")
      .drop("_fp1", "_fp2")

  /** Full-decode classify: the payloads ride the join and every matched row
    * runs decode + SNR (the north rule's per-row invariant evaluated
    * literally). Used when `cfg.fullDecodeVerify` — compute-weighted, so it
    * scales with cores where the hash-first path saturates memory
    * bandwidth. */
  private def classifyFullDecode(events: DataFrame, baseline: DataFrame,
      cfg: EngineConfig): DataFrame = {
    val base = baseline.select(col("clip_id"),
      col("bytes").as("_bb"), col("transcript").as("_bt"))
    sizeAwareJoin(events, base, Seq("clip_id"), "left_outer", cfg.broadcastThresholdBytes)
      .withColumn("outcome",
        when(col("_bb").isNull, Outcome.New)
          .when(!PcmFunctions.pcm_snr_db(col("codec"), col("_bb"), col("bytes"))
            .geq(cfg.minSnrDb) || !(col("transcript") <=> col("_bt")), Outcome.Changed)
          .otherwise(Outcome.Unchanged))
      .drop("_bb", "_bt")
  }

  /** Drift: KS distance between current and baseline KLL sketches per
    * partition. One violation row per drifted partition. */
  def driftViolations(curStats: DataFrame, baseStats: DataFrame, rule: Drift,
      cfg: EngineConfig): DataFrame = {
    val ks = udf((a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) 0.0 else KllSketchAgg.ksDelta(a, b))
    val c = rule.column
    curStats.select(col(PV), col(s"kll_$c").as("_cur"))
      .join(baseStats.select(col(PV), col(s"kll_$c").as("_base")), Seq(PV), "left_outer")
      .withColumn("_ks", ks(col("_cur"), col("_base")))
      .filter(col("_ks") > rule.maxKs)
      .select(col(PV).as("clip_id"), lit(rule.ruleId).as("rule_id"),
        format_string("ks=%.4f", col("_ks")).as("observed"),
        lit(s"ks<=${rule.maxKs}").as("expected"), col(PV))
  }

  // --------------------------------------------------------------- driver

  /** Compile + return the full report (lazy DataFrames; nothing runs until
    * the caller acts on them). `baselineStats` may be a persisted sketch
    * table from a previous run; if None it is computed from `baseline`. */
  def run(
      spark: SparkSession,
      clips: DataFrame,
      transcripts: DataFrame,
      baseline: DataFrame,
      rules: Seq[Rule],
      cfg: EngineConfig = EngineConfig(),
      baselineStats: Option[DataFrame] = None): ValidationReport = {
    import spark.implicits._

    val extraCaches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val cacheHook: DataFrame => DataFrame =
      if (!cfg.persistEvents) identity
      else df => { val p = df.persist(); extraCaches += p; p }

    // every branch except pcm_equality is metadata-only: cache a deduped
    // projection WITHOUT the heavy audio payload (column pruning applied to
    // the cache itself, not just the scans); the pcm branch streams the raw
    // rows through its single diff-join pass instead (see pcmViolations).
    val eventsMeta0 = dedupEventsMeta(clips)
    val eventsMeta = if (cfg.persistEvents) eventsMeta0.persist() else eventsMeta0
    if (cfg.persistEvents) eventsMeta.count() // populate cache BEFORE the fan-out:
    // the union job schedules independent branch stages concurrently, and an
    // unpopulated cache would make each of them recompute the dedup shuffle.

    val stats = statsPass(eventsMeta, rules, cfg).persist() // rows = #partitions (tiny)

    val driftRules = rules.collect { case d: Drift => d }
    val baseStats =
      if (driftRules.isEmpty) None
      else Some(baselineStats.getOrElse(statsPass(baseline, driftRules, cfg)))

    val branches: Seq[DataFrame] =
      rowLevelViolations(eventsMeta, rules, cfg) ++
      rules.collect { case u: Uniqueness => uniquenessViolations(eventsMeta, u, cfg) } ++
      rules.collect { case r: Referential => referentialViolations(eventsMeta, transcripts, r, cfg) }.flatten ++
      rules.collect { case p: PcmEquality => pcmViolations(clips, baseline, p, cfg, cacheHook) } ++
      driftRules.map(d => driftViolations(stats, baseStats.get, d, cfg))

    val emptyViolations = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("clip_id", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("rule_id", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("observed", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("expected", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(PV, org.apache.spark.sql.types.StringType))))
    // violations are the SMALL output (only failing rows): persist so the
    // three consumers (violations write, verdict counts, lineage) run the
    // expensive rule branches exactly once.
    val allViolations = branches.foldLeft(emptyViolations)(_ unionByName _).persist()

    // verdict grid: every (partition, rule) pair gets a row, pass unless
    // violations (or a stats threshold) say otherwise.
    // The orphan-direction pseudo-partition ("table=<parent>") is included
    // UNCONDITIONALLY whenever a bidirectional Referential rule ran — not
    // only when it produced violations — so the resume checkpoint records
    // that the orphan pass happened even on clean data (a lineage row with
    // violation_count = 0). Without this, a clean re-run would re-execute
    // the orphan anti-join against an empty pending set and fabricate
    // violations for every transcript.
    val pseudoPvs = rules.collect {
      case r: Referential if r.bidirectional => s"table=${r.parentTable}"
    }
    val pseudo =
      if (pseudoPvs.isEmpty) spark.emptyDataset[String].toDF(PV)
      else pseudoPvs.toDF(PV)
    val partitions = stats.select(col(PV))
      .union(allViolations.select(col(PV)))
      .union(pseudo)
      .distinct()
    val ruleIds = rules.map(_.ruleId).toDF("rule_id")
    val grid = partitions.crossJoin(ruleIds)
    val vCounts = allViolations.groupBy(col(PV), col("rule_id")).agg(count(lit(1)).as("violation_count"))

    // threshold rules judged from the stats row, not the violation count
    val statVerdicts: Seq[DataFrame] = rules.collect {
      case r @ NullRate(c, maxRate) =>
        stats.select(col(PV), lit(r.ruleId).as("rule_id"),
          (col(s"nulls_$c") <= lit(maxRate) * col("n_rows")).as("stat_pass"))
      case r @ ApproxDistinct(c, minD) =>
        stats.select(col(PV), lit(r.ruleId).as("rule_id"),
          (col(s"dv_$c") >= minD).as("stat_pass"))
    }
    val statPass = statVerdicts.reduceOption(_ unionByName _)

    var verdicts = grid
      .join(vCounts, Seq(PV, "rule_id"), "left_outer")
      .na.fill(0L, Seq("violation_count"))
    verdicts = statPass match {
      case Some(sp) => verdicts.join(sp, Seq(PV, "rule_id"), "left_outer")
      case None => verdicts.withColumn("stat_pass", lit(null).cast("boolean"))
    }
    val verdictsOut = verdicts
      .withColumn("pass", coalesce(col("stat_pass"), col("violation_count") === 0))
      .select(col(PV).as("partition_values"), col("rule_id"), col("pass"), col("violation_count"))

    ValidationReport(
      verdicts = verdictsOut,
      violations = allViolations.drop(PV),
      cached = Seq(eventsMeta, stats, allViolations) ++ extraCaches.toSeq)
  }
}
