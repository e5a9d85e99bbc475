package graft

import org.apache.spark.sql.SparkSession
import graft.functions.{MinHashArray, PolyHash, SimHashBits, TimeBucket}

/** SQL-function registration for graft's custom Catalyst expressions. */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "time_bucket", exprs => TimeBucket(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_array",
      exprs => MinHashArray(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction(
      "simhash_bits", exprs => SimHashBits(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_cosine",
      exprs => graft.functions.CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "lsh_bucket",
      exprs => graft.functions.HyperplaneBucket(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => graft.functions.ShingleHashes(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].longValue()),
      "built-in")
    graft.plans.TimePartitionPruning.install(spark)
  }
}
