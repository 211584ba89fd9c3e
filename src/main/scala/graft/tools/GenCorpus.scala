package graft.tools

import org.apache.spark.sql.SparkSession

import graft.fixtures.SyntheticImages

/** Materialize the content-addressed synthetic bench corpus (the same one
  * graft.Bench generates) so probes can run without a full bench pass.
  * Usage: runMain graft.tools.GenCorpus [families]
  */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val families = args.headOption.map(_.toLong).getOrElse(120000L)
    val dir = s"/root/repo/target/bench-corpus-$families"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-gen-corpus")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SyntheticImages.materialize(spark, dir, families)
    println(s"[gencorpus] $dir images=" +
      spark.read.parquet(s"$dir/images").count())
    spark.stop()
  }
}
