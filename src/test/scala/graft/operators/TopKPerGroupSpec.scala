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

  test("k larger than group size returns whole groups ranked") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 3.0, 3L))
      .toDF("g", "s", "id")
    val got = TopKPerGroup.topK(df, Seq("g"), "s", Seq("id"), k = 10)
      .orderBy("g", "rn").collect().map(r => (r.getString(0), r.getInt(3)))
    assert(got.toSeq == Seq(("a", 1), ("a", 2), ("b", 1)))
  }
}
