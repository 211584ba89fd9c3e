package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Candidates

/** Mega-identity-group skew shape of [[Candidates.collapseExact]] (round-3
  * VERDICT #3): the representative must come from a partial-aggregating
  * groupBy, NOT a window over the identity key — a window ships every row
  * of a 50k-copy group ("millions of rows sharing one caption" at 10^12
  * scale) to ONE window task. Checked both semantically (planted mega-group
  * collapses to one rep + |group|-1 star edges) and structurally (the
  * physical plan contains no Window node; the pre-shuffle partial min is
  * present).
  */
class CollapseSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("planted 50k-copy mega-group: one rep, linear star edges, no Window in plan") {
    val hot = (0 until 50000).map(i => (f"hot_$i%06d", 42L, 0L, 17, "g"))
    val cold = Seq(("cold_1", 7L, 0L, 9, "g"), ("cold_2", 8L, 0L, 9, "g"))
    val fps = (hot ++ cold)
      .toDF("image_id", "simhash", "simhash_lo", "span", "group")
      .repartition(8)
    val (reps, star) = Candidates.collapseExact(fps,
      Seq("simhash", "simhash_lo", "span", "group"))

    val repPlan = reps.queryExecution.executedPlan.toString
    assert(!repPlan.contains("Window"),
      "collapse must not use a window over the identity key (single-task hot spot)")
    assert(repPlan.contains("partial_min") || repPlan.contains("partial min") ||
      repPlan.toLowerCase.contains("hashaggregate"),
      s"expected a partial-aggregating groupBy in:\n$repPlan")

    val repIds = reps.select("image_id").as[String].collect().sorted
    assert(repIds === Array("cold_1", "cold_2", "hot_000000"),
      "min image_id per identity group is the representative")
    val edges = star.as[(String, String)].collect()
    assert(edges.length === 49999, "star edges are linear in group size")
    assert(edges.forall(_._1 == "hot_000000"))
    assert(edges.map(_._2).distinct.length === 49999)
  }

  test("null key values collapse like any identity group (no silent row drop)") {
    // round-4 ADVICE: a plain equi-join-back drops NULL-keyed rows — every
    // null-group duplicate would silently vanish from candidate generation
    val fps = Seq(
      ("n1", 42L, 0L, 17, null.asInstanceOf[String]),
      ("n2", 42L, 0L, 17, null.asInstanceOf[String]),
      ("n3", 42L, 0L, 17, "g"),
      ("n4", 99L, 0L, 5, null.asInstanceOf[String]))
      .toDF("image_id", "simhash", "simhash_lo", "span", "group")
    val (reps, star) = Candidates.collapseExact(fps,
      Seq("simhash", "simhash_lo", "span", "group"))
    assert(reps.count() + star.count() === 4,
      "every input row survives the collapse (reps + star members)")
    assert(reps.select("image_id").as[String].collect().sorted ===
      Array("n1", "n3", "n4"))
    assert(star.as[(String, String)].collect().toSet === Set(("n1", "n2")),
      "the two null-group twins pair through their representative")
  }

  test("collapse on an array key (grams) stays window-free") {
    val fps = Seq(
      ("a", Array(1L, 2L, 3L)), ("b", Array(1L, 2L, 3L)), ("c", Array(9L)))
      .toDF("image_id", "grams")
    val (reps, star) = Candidates.collapseExact(fps, Seq("grams"))
    assert(!reps.queryExecution.executedPlan.toString.contains("Window"))
    assert(reps.select("image_id").as[String].collect().sorted === Array("a", "c"))
    assert(star.as[(String, String)].collect().toSet === Set(("a", "b")))
  }
}
