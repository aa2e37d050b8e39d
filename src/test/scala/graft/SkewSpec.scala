package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    // heavily skewed: 10k rows of key 1, a few others
    val big = ((1 to 10000).map(i => (1L, s"v$i")) ++
      Seq((2L, "a"), (3L, "b"), (4L, "c"))).toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (5L, "five")).toDF("k", "name")

    val plain = big.join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8)

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("the hot key is spread across salt sub-keys") {
    import spark.implicits._
    val big = (1 to 5000).map(i => (1L, i)).toDF("k", "i")
    val distinctSalts = big
      .withColumn("__salt", pmod(hash(col("k"), col("i")), lit(8)))
      .select("__salt").distinct().count()
    assert(distinctSalts == 8, "hash salt must use all sub-keys")
  }
}
