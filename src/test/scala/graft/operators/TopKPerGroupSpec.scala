package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {

  test("two-phase top-k equals the window form exactly") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .repartition(8) // force multi-partition phase 1
    val got = TopKPerGroup.topK(li, Seq("l_returnflag"), "l_extendedprice",
        Seq("l_orderkey", "l_linenumber"), k = 5)
      .select("l_returnflag", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_returnflag", "rn")
      .collect().map(_.toSeq).toSeq

    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val want = li.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select("l_returnflag", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_returnflag", "rn")
      .collect().map(_.toSeq).toSeq

    assert(got == want)
  }

  test("null order/tie values match the window form; duplicate rows keep the sort total") {
    import spark.implicits._
    // nulls in the order column (window desc = nulls LAST) and in a tie
    // column (asc = nulls FIRST) must not NPE phase 1; >32 fully-equal
    // rows exercise the sortWith compaction, where a non-strict
    // comparator makes TimSort throw its contract violation
    val rows = Seq.tabulate(100)(i => ("g", Option(7.0), Option(1L))) ++
      Seq(("g", None: Option[Double], Option(2L)),
        ("g", Option(9.0), None: Option[Long]),
        ("g", Option(9.0), Option(0L)),
        ("h", None: Option[Double], None: Option[Long]))
    val df = rows.toDF("g", "v", "t").repartition(4)
    val got = TopKPerGroup.topK(df, Seq("g"), "v", Seq("t"), k = 3)
      .select("g", "rn", "v", "t").orderBy("g", "rn")
      .collect().map(_.toSeq).toSeq
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v").desc, col("t").asc)
    val want = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("g", "rn", "v", "t").orderBy("g", "rn")
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"got=$got want=$want")
  }

  test("k larger than group size returns whole groups ranked") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 3.0, 3L))
      .toDF("g", "s", "id")
    val got = TopKPerGroup.topK(df, Seq("g"), "s", Seq("id"), k = 10)
      .orderBy("g", "rn").collect().map(r => (r.getString(0), r.getInt(3)))
    assert(got.toSeq == Seq(("a", 1), ("a", 2), ("b", 1)))
  }
}
