package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Empirical scale spot-check for this session's operators: replicate the
  * sf0.1 inputs `REP`× and measure whether wall-clock tracks each
  * operator's claimed shape.
  *
  *   - fuzzy match: customer REP× with names REGENERATED from the scaled
  *     key (`Customer#%09d` — the fixture's own pattern, so typo-adjacency
  *     density stays realistic instead of every replica colliding);
  *     deletion-join candidates must stay linear.
  *   - triangle census + k-core: lineitem REP× with order/part keys offset
  *     per replica — REP disjoint copies of the co-order graph (corpus
  *     growth without densification); both should scale ~linearly.
  *   - association rules, skip-grams, BPE pairs, substring search, drift
  *     timeline: the corresponding table REP× with ids offset.
  *
  * Usage: `sbt "runMain graft.tools.GraphTextScaleBench [rep]"` (default 10).
  */
object GraphTextScaleBench {
  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = spark.range(rep).select(col("id").as("r"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s   (rows/val: $n)")
    }

    val cust1 = Tables.customer(spark, dir)
    val cust = cust1
      .crossJoin(broadcast(reps))
      .select(
        (col("c_custkey") * rep + col("r")).as("c_custkey"),
        format_string("Customer#%09d", col("c_custkey") * rep + col("r")).as("c_name"),
        col("c_nationkey"))
      .localCheckpoint()
    println(s"customer: ${cust.count()} rows (rep=$rep)")

    val li1 = Tables.lineitem(spark, dir)
    val li = li1
      .crossJoin(broadcast(reps))
      .select(
        (col("l_orderkey") * rep + col("r")).as("l_orderkey"),
        (col("l_partkey") * rep + col("r")).as("l_partkey"))
      .localCheckpoint()
    println(s"lineitem: ${li.count()} rows")

    val docs1 = Tables.documents(spark, dir)
    val docs = docs1
      .crossJoin(broadcast(reps))
      .select(
        (col("doc_id") * rep + col("r")).as("doc_id"),
        col("text"),
        col("source"),
        col("n_chars"))
      .localCheckpoint()
    println(s"documents: ${docs.count()} rows")

    import graft.operators.{Analytics, EntityResolution, TextIndex}

    // 1x warmups (codegen + scan)
    EntityResolution.fuzzyPairs(cust1, "c_custkey", "c_name", "c_nationkey", 1).count()
    Analytics.triangleStats(Analytics.coOrderEdges(li1)).count()

    time(s"fuzzy 1x") {
      EntityResolution.fuzzyPairs(cust1, "c_custkey", "c_name", "c_nationkey", 1).count()
    }
    time(s"fuzzy ${rep}x") {
      EntityResolution.fuzzyPairs(cust, "c_custkey", "c_name", "c_nationkey", 1).count()
    }
    time(s"triangles 1x") {
      Analytics.triangleStats(Analytics.coOrderEdges(li1)).collect().head.getLong(2)
    }
    time(s"triangles ${rep}x") {
      Analytics.triangleStats(Analytics.coOrderEdges(li)).collect().head.getLong(2)
    }
    time(s"kcore-40 1x") {
      Analytics.kCore(Analytics.coOrderEdges(li1), 40).filter(col("core")).count()
    }
    time(s"kcore-40 ${rep}x") {
      Analytics.kCore(Analytics.coOrderEdges(li), 40).filter(col("core")).count()
    }
    time(s"assoc rules 1x") {
      Analytics.associationRules(li1, 2L, 50).count()
    }
    time(s"assoc rules ${rep}x") {
      Analytics.associationRules(li, 2L, 50).count()
    }
    time(s"skipgram 1x") {
      TextIndex.skipgramPairs(docs1, 2, 30).count()
    }
    time(s"skipgram ${rep}x") {
      TextIndex.skipgramPairs(docs, 2, 30).count()
    }
    time(s"bpe pairs ${rep}x") {
      TextIndex.bpeMergeCandidates(docs, 30).count()
    }
    time(s"substring ${rep}x") {
      TextIndex.substringSearch(docs, "vector table").count()
    }

    // BFS over disjoint graph copies: the reached set and the per-round
    // join grow with the corpus, rounds stay fixed — expect ~linear.
    def seedsOf(e: DataFrame) =
      e.select(col("a").as("node")).union(e.select(col("b").as("node")))
        .distinct()
        .filter(col("node") % 97 === 0)
    time(s"bfs-3 1x") {
      val e = Analytics.coOrderEdges(li1)
      Analytics.bfsDistances(e, seedsOf(e), 3).count()
    }
    time(s"bfs-3 ${rep}x") {
      val e = Analytics.coOrderEdges(li)
      Analytics.bfsDistances(e, seedsOf(e), 3).count()
    }

    // Neighbor Jaccard on the order-part bipartite table: candidate space
    // is Σ f² over the hub-capped item frequencies — disjoint copies keep
    // per-item f constant, so pairs (and wall-clock) should scale ~linearly.
    def membershipOf(l: DataFrame) =
      l.select(col("l_orderkey").as("node"), col("l_partkey").as("item")).distinct()
    time(s"neighbor-jaccard 1x") {
      Analytics.neighborJaccard(membershipOf(li1), 25, 20).count()
    }
    time(s"neighbor-jaccard ${rep}x") {
      Analytics.neighborJaccard(membershipOf(li), 25, 20).count()
    }

    // Boilerplate chunks: two map-side-combined hash aggregates — linear.
    import graft.operators.Dedup
    time(s"boilerplate 1x") {
      Dedup.boilerplateChunkStats(docs1, 12, 3).count()
    }
    time(s"boilerplate ${rep}x") {
      Dedup.boilerplateChunkStats(docs, 12, 3).count()
    }
    spark.stop()
  }
}
