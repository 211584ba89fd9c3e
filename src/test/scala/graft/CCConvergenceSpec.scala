package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Clustering

/** Convergence semantics of the in-batch probe (Clustering.scala): a batch's
  * final propagate-probe declares convergence iff no label moved — sound
  * because propagate-stability implies fully-uniform component labels (see
  * the proof in the scaladoc). These tests pin the endpoint label = MIN
  * member id on shapes that stress the probe:
  *  - a deep path graph (diameter >> one batch's compression reach, so
  *    multiple batches must run and the probe must NOT fire early);
  *  - a star + disjoint families (converges in one batch — the probe saves
  *    the old confirmation batch);
  *  - empty edges (zero-batch exit).
  */
class CCConvergenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ids(n: Int): Seq[String] = (0 until n).map(i => f"v$i%04d")

  private def runCC(vertexIds: Seq[String], edgePairs: Seq[(String, String)]) = {
    import spark.implicits._
    val verts = vertexIds.toDF("image_id")
    val edges = edgePairs.toDF("a", "b")
    Clustering.connectedComponents(verts, edges)
  }

  test("deep 300-vertex path: multiple batches, labels = global min") {
    val vs = ids(300)
    val path = vs.sliding(2).map(s => (s(0), s(1))).toSeq
    val cc = runCC(vs, path)
    assert(cc.converged, "path graph must converge before maxIter")
    val labels = cc.labels.collect().map(r => r.getString(0) -> r.getString(1))
    assert(labels.length === 300)
    assert(labels.forall(_._2 == "v0000"),
      s"non-min labels: ${labels.filter(_._2 != "v0000").take(5).toSeq}")
    assert(cc.iterations > 3, "a 300-path cannot converge in a single batch")
  }

  test("star + disjoint pairs: one batch + in-batch probe confirms") {
    val vs = ids(40)
    val star = (1 until 20).map(i => (vs(0), vs(i)))
    val pairs = (20 until 40 by 2).map(i => (vs(i), vs(i + 1)))
    val cc = runCC(vs, star ++ pairs)
    assert(cc.converged)
    // one batch = 2 rounds + probe
    assert(cc.iterations === 3,
      s"star/pair graph should converge in one batch, took ${cc.iterations} rounds")
    val byLabel = cc.labels.collect().map(r => r.getString(0) -> r.getString(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLabel(vs(0)) === (0 until 20).map(vs).toSet)
    (20 until 40 by 2).foreach { i =>
      assert(byLabel(vs(i)) === Set(vs(i), vs(i + 1)))
    }
  }

  test("no edges: zero batches, every vertex labels itself") {
    val vs = ids(10)
    val cc = runCC(vs, Seq.empty)
    assert(cc.converged)
    assert(cc.iterations === 0)
    val labels = cc.labels.collect().map(r => r.getString(0) -> r.getString(1))
    assert(labels.forall { case (v, l) => v == l })
  }

  test("two components sharing no vertices keep distinct min labels") {
    val vs = ids(8)
    val cc = runCC(vs, Seq((vs(0), vs(3)), (vs(3), vs(1)), (vs(5), vs(7)), (vs(6), vs(7))))
    assert(cc.converged)
    val m = cc.labels.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Seq(0, 1, 3).forall(i => m(vs(i)) == vs(0)))
    assert(Seq(5, 6, 7).forall(i => m(vs(i)) == vs(5)))
    assert(m(vs(2)) == vs(2) && m(vs(4)) == vs(4))
  }
}
