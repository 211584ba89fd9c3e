package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.DedupPipeline
import graft.queries.Queries

/** Value-level oracles for the two queries that previously had only a
  * rows-only signal (round-2 VERDICT "what's missing" #2):
  *
  *  - `audit_stage_metrics`: the committed (stage, rows_out) ledger rows
  *    must equal an INDEPENDENT recomputation — the same pipeline run
  *    without an Audit, counting each stage's output directly;
  *  - `dedup_tier_hist`: the tier histogram must equal a groupBy
  *    recomputation from the (already value-parity-checked) tiered labels.
  */
class AuditMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("audit_stage_metrics ledger equals per-stage recomputed output counts") {
    val got = Queries.queries("audit_stage_metrics")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // independent recomputation: same corpus, no audit — count each stage
    // output directly
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("image_id"),
        col("text").as("caption"), lit(0L).as("phash"))
    val res = DedupPipeline.run(docs, Queries.docCfg)
    val want = Map(
      "fingerprints" -> res.fingerprints.count(),
      "edges" -> res.edges.count(),
      "clusters" -> res.clusters.count(),
      "cluster_stats" -> res.stats.count())

    assert(got === want)
    assert(got("fingerprints") > 0, "bounded slice must fingerprint rows")
  }

  test("dedup_tier_hist equals a groupBy recomputation of the tiered labels") {
    val labels = Queries.queries("dedup_clusters_tiered")(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2))) // (tier, cluster_id)
    val want = labels.groupBy(identity).map { case ((tier, cid), ms) =>
      (tier, cid) -> ms.length.toLong
    } // (tier, cluster_id) -> size
      .groupBy { case ((tier, _), size) => (tier, size) }
      .map { case ((tier, size), cs) => (tier, size) -> cs.size.toLong }

    val got = Queries.queries("dedup_tier_hist")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want)
    assert(got.keys.map(_._1).toSet === Set("high", "normal"))
  }
}
