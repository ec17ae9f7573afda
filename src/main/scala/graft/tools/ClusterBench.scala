package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Empirical scale check for `Dedup.duplicateClusters` on synthetic pair
  * graphs far beyond what the sf corpora produce (their verified pair sets
  * are tiny). Two shapes:
  *
  *  - CLIQUES: `groups` clone groups of `size` members, emitted as star
  *    pairs (min-id to each other member) — the shape exact/near-dup
  *    verification actually produces. Expect 2-3 rounds regardless of
  *    group count.
  *  - CHAIN: one path of `chainLen` vertices, each similar only to its
  *    neighbors — the adversarial diameter case the pointer-halving
  *    exists for. Expect O(log chainLen) rounds, not O(chainLen).
  *
  * Usage: `sbt "runMain graft.tools.ClusterBench [groups] [size] [chainLen]"`.
  */
object ClusterBench {
  def main(args: Array[String]): Unit = {
    val groups = args.headOption.map(_.toInt).getOrElse(100000)
    val size = args.lift(1).map(_.toInt).getOrElse(10)
    val chainLen = args.lift(2).map(_.toInt).getOrElse(10000)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String, pairs: org.apache.spark.sql.DataFrame, expectClusters: Long): Unit = {
      val t0 = System.nanoTime()
      val (out, rounds) = Dedup.duplicateClustersWithRounds(pairs)
      val n = out.select(countDistinct("cluster_id")).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-8s pairs=${pairs.count()}%9d rounds=$rounds%2d clusters=$n%8d  $sec%6.2f s" +
        (if (n == expectClusters) "" else s"  !! expected $expectClusters"))
    }

    // star pairs: group g spans ids [g*size, (g+1)*size); min id pairs with the rest
    val cliques = spark
      .range(groups.toLong * size)
      .filter(col("id") % size =!= 0)
      .select((col("id") - (col("id") % size)).as("a_id"), col("id").as("b_id"))
    timed("CLIQUES", cliques, groups.toLong)

    val chain = spark
      .range(chainLen.toLong - 1)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    timed("CHAIN", chain, 1L)

    spark.stop()
  }
}
