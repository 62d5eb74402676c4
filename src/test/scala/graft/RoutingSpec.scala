package graft

import graft.ops.{MasOps, RelationalOps}
import graft.sources.JsonIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's behavioral unit tests
  * (SourceSystemDataCheckerServiceTest.java:56-294, 12 cases;
  * MasSchedulerServiceTest.java, 6 cases) recast over the Spark operators:
  * parent outcome = diffClassifyWithRelSet (payload OR media-set change),
  * child routing = nestedDiffClassify, MAS side-channel = MasOps. Routing
  * legend: "parent" = name-usage publish (new/changed specimen, media rides
  * along), "child" = digital-media publish (changed media under unchanged
  * specimen), "none" = last_checked touch only. */
class RoutingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ------------------------------------------------------------- fixtures
  // specimens: (physical_id, payload); media links: (physical_id, media_uri);
  // media payloads: (media_uri, payload)
  private def classify(
      specimens: Seq[(String, String)],
      baselineSpecimens: Seq[(String, String)],
      links: Seq[(String, String)],
      baselineLinks: Seq[(String, String)]): Map[String, String] =
    RelationalOps.diffClassifyWithRelSet(
        specimens.toDF("pid", "payload"), baselineSpecimens.toDF("pid", "payload"),
        Seq("pid"), Seq("payload"),
        links.toDF("pid", "uri"), baselineLinks.toDF("pid", "uri"), "uri")
      .select("pid", "outcome").collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def routeMedia(
      parentOutcomes: Map[String, String],
      media: Seq[(String, String, String)],        // (pid, uri, payload)
      baselineMedia: Seq[(String, String)]): Map[String, (String, String)] = { // uri -> (outcome, route)
    val parents = parentOutcomes.toSeq.toDF("pid", "outcome")
    RelationalOps.nestedDiffClassify(parents,
        media.toDF("pid", "uri", "payload"),
        baselineMedia.toDF("uri", "payload"),
        Seq("pid"), Seq("uri"), Seq("payload"))
      .select("uri", "outcome", "route").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
  }

  private val cur = "attrs-current"
  private val chg = "attrs-changed"

  // ---------------------------------------- specimen-level outcome routing

  test("new specimen: absent from state publishes to the parent channel") {
    val out = classify(Seq("p1" -> cur), Nil, Nil, Nil)
    assert(out == Map("p1" -> "new"))
  }

  test("unchanged specimen, no media: state touch only") {
    val out = classify(Seq("p1" -> cur), Seq("p1" -> cur), Nil, Nil)
    assert(out == Map("p1" -> "unchanged"))
  }

  test("unchanged specimen, unchanged media: both routes none") {
    val out = classify(Seq("p1" -> cur), Seq("p1" -> cur),
      Seq("p1" -> "m1"), Seq("p1" -> "m1"))
    assert(out == Map("p1" -> "unchanged"))
    val media = routeMedia(out, Seq(("p1", "m1", cur)), Seq("m1" -> cur))
    assert(media == Map("m1" -> ("unchanged", "none")))
  }

  test("changed specimen (payload diff), no media: parent channel") {
    val out = classify(Seq("p1" -> chg), Seq("p1" -> cur), Nil, Nil)
    assert(out == Map("p1" -> "changed"))
  }

  test("changed specimen with media: media rides the parent event") {
    val out = classify(Seq("p1" -> chg), Seq("p1" -> cur),
      Seq("p1" -> "m1"), Seq("p1" -> "m1"))
    assert(out == Map("p1" -> "changed"))
    val media = routeMedia(out, Seq(("p1", "m1", cur)), Seq("m1" -> cur))
    assert(media("m1") == ("unchanged", "parent"))
  }

  test("added media ER: equal payloads but grown media set ⇒ changed (J4)") {
    val out = classify(Seq("p1" -> cur), Seq("p1" -> cur),
      Seq("p1" -> "m1", "p1" -> "m2"), Seq("p1" -> "m1"))
    assert(out == Map("p1" -> "changed"))
  }

  test("removed media ER: equal payloads but shrunk media set ⇒ changed (J4)") {
    val out = classify(Seq("p1" -> cur), Seq("p1" -> cur),
      Seq("p1" -> "m1"), Seq("p1" -> "m1", "p1" -> "m2"))
    assert(out == Map("p1" -> "changed"))
  }

  test("unchanged specimen + changed media: media-only channel (J5)") {
    val out = classify(Seq("p1" -> cur), Seq("p1" -> cur),
      Seq("p1" -> "m1"), Seq("p1" -> "m1"))
    assert(out == Map("p1" -> "unchanged"))
    val media = routeMedia(out, Seq(("p1", "m1", chg)), Seq("m1" -> cur))
    assert(media("m1") == ("changed", "child"))
  }

  test("two new specimens: both to the parent channel") {
    val out = classify(Seq("p1" -> cur, "p2" -> cur), Nil, Nil, Nil)
    assert(out == Map("p1" -> "new", "p2" -> "new"))
  }

  test("mixed batch: one changed + one new") {
    val out = classify(Seq("p1" -> chg, "p2" -> cur), Seq("p1" -> cur), Nil, Nil)
    assert(out == Map("p1" -> "changed", "p2" -> "new"))
  }

  test("mixed batch: one unchanged + one new") {
    val out = classify(Seq("p1" -> cur, "p2" -> cur), Seq("p1" -> cur), Nil, Nil)
    assert(out == Map("p1" -> "unchanged", "p2" -> "new"))
  }

  test("duplicate media across two new specimens: one classification per media") {
    val out = classify(Seq("p1" -> cur, "p2" -> cur), Nil,
      Seq("p1" -> "m1", "p2" -> "m1"), Nil)
    assert(out == Map("p1" -> "new", "p2" -> "new"))
    val media = routeMedia(out,
      Seq(("p1", "m1", cur), ("p2", "m1", cur)).distinct.map(t => t),
      Nil)
    assert(media("m1") == ("new", "parent"))
  }

  test("all-NULL baseline payload is present (unchanged), not new") {
    val incoming = Seq(("k1", null: String), ("k2", "x")).toDF("k", "v")
    val baseline = Seq(("k1", null: String), ("k2", null: String)).toDF("k", "v")
    val out = RelationalOps.diffClassify(incoming, baseline, Seq("k"), Seq("v"))
      .select("k", "outcome").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("k1" -> "unchanged", "k2" -> "changed"))
  }

  // ------------------------------------------------------ MAS side-channel

  private def masJobs(events: DataFrame, unchangedIds: Seq[String]): Seq[(String, String)] =
    MasOps.masJobRequestsForUnchanged(events, unchangedIds.toDF("id"),
        "id", "mas_list", col("force_mas"), "DIGITAL_SPECIMEN", "app-pid", "doi:")
      .select("mas_id", "target_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  test("MAS: forced unchanged specimen with masList schedules one job per mas") {
    val events = Seq(("s1", Seq("mas-a"), true)).toDF("id", "mas_list", "force_mas")
    assert(masJobs(events, Seq("s1")) == Seq(("mas-a", "doi:s1")))
  }

  test("MAS: not forced ⇒ no jobs") {
    val events = Seq(("s1", Seq("mas-a"), false)).toDF("id", "mas_list", "force_mas")
    assert(masJobs(events, Seq("s1")).isEmpty)
  }

  test("MAS: forced but empty masList ⇒ no jobs") {
    val events = Seq(("s1", Seq.empty[String], true)).toDF("id", "mas_list", "force_mas")
    assert(masJobs(events, Seq("s1")).isEmpty)
  }

  test("MAS: null masList normalizes to empty ⇒ no jobs") {
    val events = Seq(("s1", Seq("mas-a"), true)).toDF("id", "mas_list", "force_mas")
      .withColumn("mas_list", when(lit(false), col("mas_list"))) // NULL list
    assert(masJobs(events, Seq("s1")).isEmpty)
  }

  test("MAS: target not in the unchanged set ⇒ no jobs (semi-join gate, M2)") {
    val events = Seq(("s1", Seq("mas-a"), true)).toDF("id", "mas_list", "force_mas")
    assert(masJobs(events, Seq("other")).isEmpty)
  }

  test("MAS: job row shape matches the reference constructor (M3)") {
    val events = Seq(("m1", Seq("mas-a", "mas-b"), true)).toDF("id", "mas_list", "force_mas")
    val rows = MasOps.masJobRequestsForUnchanged(events, Seq("m1").toDF("id"),
        "id", "mas_list", col("force_mas"), "DIGITAL_MEDIA", "app-pid", "doi:")
      .orderBy("mas_id").collect()
    assert(rows.map(_.toSeq).toSeq == Seq(
      Seq("mas-a", "doi:m1", false, "app-pid", "DIGITAL_MEDIA"),
      Seq("mas-b", "doi:m1", false, "app-pid", "DIGITAL_MEDIA")))
  }

  // ------------------------------------------------ wire compression (S2)

  test("gzip expressions round-trip arbitrary binary payloads") {
    import org.apache.spark.sql.graft.CodecExpressions._
    val df = Seq(("a", "hello world"), ("b", ""), ("c", "x" * 10000))
      .toDF("id", "s")
      .withColumn("raw", encode(col("s"), "UTF-8"))
    val rt = df
      .withColumn("gz", gzip_compress(col("raw")))
      .withColumn("back", decode(gzip_decompress(col("gz")), "UTF-8"))
      .select("id", "s", "back", "gz")
    rt.collect().foreach { r =>
      assert(r.getString(1) == r.getString(2), s"round-trip mismatch for ${r.getString(0)}")
    }
    // compression actually happened on the repetitive payload
    val gzLen = rt.filter(col("id") === "c")
      .select(octet_length(col("gz"))).collect()(0).getInt(0)
    assert(gzLen < 10000 / 10)
  }

  test("scoped compound-key lookup prunes state but preserves join semantics") {
    val batch = Seq((1L, "u1", "click"), (2L, "u2", "view")).toDF("eid", "user", "etype")
    val state = Seq(("u1", "click"), ("u3", "view"), ("u9", "scroll")).toDF("user", "etype")
    val missing = RelationalOps.scopedKeyLookup(batch, state,
        keyCols = Seq("user", "etype"), scopeCols = Seq("etype"), joinType = "left_anti")
      .select("eid").collect().map(_.getLong(0)).toSet
    assert(missing == Set(2L)) // (u2, view) absent; (u1, click) present
  }

  // -------------------------------------------------- JSON ingestion (S3)

  test("JSON ingest: well-formed rows parse, malformed rows become violations") {
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("n", LongType)))
    val feed = Seq(
      (1L, """{"name":"a","n":7}"""),
      (2L, """{"name":"b"}"""),          // missing field → null, NOT corrupt
      (3L, """not json at all"""),
      (4L, null: String)                  // null payload → null fields, not corrupt
    ).toDF("id", "payload")
    val parsed = JsonIngest.parseWithPolicy(feed, "payload", schema)
    val rows = parsed.orderBy("id")
      .select("id", "name", "n", JsonIngest.CorruptCol).collect()
    assert(rows(0).toSeq == Seq(1L, "a", 7L, null))
    assert(rows(1).toSeq == Seq(2L, "b", null, null))
    assert(rows(2).getString(1) == null && rows(2).getString(3) != null)
    val violations = JsonIngest.malformedViolations(parsed, "id", "events")
      .collect()
    assert(violations.map(_.getString(0)).toSeq == Seq("3"))
    assert(violations.head.getString(1) == "json_parse:events")
  }
}
