package graft.examples

import graft.Materialize._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of q132 (token co-occurrence lift) on a documents
  * fixture — which of the three candidate costs dominates: (a) the
  * nested-transform pair GENERATION, (b) the (a,b) shuffle/aggregate on
  * string pair keys, or (c) the lift join + top-k. Run on the Zipf
  * fixtures (tools/gen_zipf_docs.py) where q132 measured 170 s at a mere
  * 25k docs — the standard sf fixtures' 31-word vocab makes every stage
  * look cheap.
  *
  * Usage: runMain graft.examples.ProfileQ132 <docsDir>
  */
object ProfileQ132 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.registerAll(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q132prof] $label%-34s ${(System.nanoTime - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        sort_array(array_distinct(graft.functions.TextFunctions.tokens(col("text"))))
          .as("tk"))
      .materialize()
    val nDocs = docs.count()
    val nTok = docs.select(sum(size(col("tk")))).head.getLong(0)
    println(s"[q132prof] docs=$nDocs distinctTokenInstances=$nTok")

    val pairsExpr =
      """flatten(transform(tk, (x, i) ->
        |  transform(slice(tk, i + 2, size(tk)), y -> struct(x AS a, y AS b))))"""
        .stripMargin

    // (a) pure generation: explode + count, no shuffle of the pairs
    val nPairs = time("a. pair generation (count only)") {
      docs.select(explode(expr(pairsExpr)).as("p")).count()
    }
    println(s"[q132prof] pairs=$nPairs")

    // (b) generation + string-key hash aggregate
    if (sys.env.contains("Q132_PROFILE_LEGACY")) time("b. + groupBy(a,b) string keys") {
      docs.select(explode(expr(pairsExpr)).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
        .where(col("c_ab") >= 5).count()
    }

    // (b2) the new path's internals: pruned hash-key pair stream
    val ex = docs.select(col("doc_id").as("doc"), explode(col("tk")).as("w"))
    val keep = ex.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 5).withColumn("h", xxhash64(col("w")))
      .materialize()
    println(s"[q132prof] keptVocab=${keep.count()}")
    val arrs = ex.join(broadcast(keep.select(col("w"), col("h"))), Seq("w"))
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(col("h"))).as("hk"))
      .materialize()
    val prunedPairsExpr =
      """flatten(transform(hk, (x, i) ->
        |  transform(slice(hk, i + 2, size(hk)), y -> struct(x AS a, y AS b))))"""
        .stripMargin
    val nPruned = time("b2. pruned long-pair generation") {
      arrs.select(explode(expr(prunedPairsExpr)).as("p")).count()
    }
    println(s"[q132prof] prunedPairs=$nPruned")
    time("b3. + groupBy(x,y) long keys") {
      arrs.select(explode(expr(prunedPairsExpr)).as("p"))
        .select(col("p.a").as("x"), col("p.b").as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_ab"))
        .where(col("c_ab") >= 5).count()
    }

    // (c) the full query as shipped — twice: cold (plan + table
    // registration) and warm (the bench-loop regime)
    time("c. full q132 (cold)") {
      graft.SparkEntry.queries("q132_cooccurrence_lift")(spark, dir).collect()
    }
    time("c2. full q132 (warm)") {
      graft.SparkEntry.queries("q132_cooccurrence_lift")(spark, dir).collect()
    }
    spark.stop()
  }
}
