package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins [[graft.functions.HyperplaneBands]] — the width-parameterized
  * LSH signature behind t102 — to three laws:
  *
  *  1. FAMILY containment: `hyperplane_bands(e, 4, 16)` is bit-identical
  *     to `hyperplane_buckets64(e)` on the fixture — one plane family,
  *     widths for each corpus scale (t101/t18's relationship, repeated
  *     for the embedding side).
  *  2. COMPOSED parity at the t102 width: band k bit i of the (8, 24)
  *     config equals the `float_dot(embedding, plane((k−1)·24+i+1)) > 0`
  *     sign — the exact spelling t102's DuckDB oracle evaluates.
  *  3. Adversarial inputs: zero vectors (all bits clear), NaN elements
  *     (every dot NaN → every bit set, matching SQL's NaN-high `> 0`),
  *     short/long vectors, and integer element types.
  */
class HyperplaneBandsSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkSuite.spark
    graft.functions.GraftFunctions.register(s); s }

  private def planeCol(j: Int): Column = typedlit((1 to 64).map { d =>
    val m = (j.toLong * 1103515245L + d.toLong * 12345L) % 32768L
    m.toDouble / 32768.0 - 0.5
  })

  test("(4,16) config is bit-identical to hyperplane_buckets64") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val bad = emb.select(
        expr("hyperplane_bands(embedding, 4, 16)").as("wide"),
        expr("hyperplane_buckets64(embedding)").as("fixed"))
      .filter(col("wide") =!= col("fixed")).count()
    assert(bad == 0, s"$bad vectors disagree between (4,16) and buckets64")
  }

  test("(8,24) config equals the composed float_dot sign form") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def signCol(j: Int): Column =
      when(call_function("float_dot", col("embedding"), planeCol(j)) > 0, 1)
        .otherwise(0)
    def bucketOf(k: Int): Column = (0 until 24)
      .map(i => signCol((k - 1) * 24 + i + 1) * lit(1 << i))
      .reduce(_ + _)
    val both = emb.select(
      expr("hyperplane_bands(embedding, 8, 24)").as("nat"),
      array((1 to 8).map(k => bucketOf(k).cast("int")): _*).as("composed"))
    val bad = both.filter(col("nat") =!= col("composed")).count()
    assert(bad == 0, s"$bad vectors disagree between native and composed")
    val distinct = both.select(explode(col("nat"))).distinct().count()
    assert(distinct > 50, s"only $distinct distinct bucket values")
  }

  test("adversarial inputs: zero, NaN, short, empty, integer elements") {
    import spark.implicits._
    val zero = Seq(Seq.fill(64)(0.0f)).toDF("embedding")
      .select(expr("hyperplane_bands(embedding, 8, 24)")).head.getSeq[Int](0)
    assert(zero == Seq.fill(8)(0), "all-zero vector must clear every bit")
    val nan = Seq(Seq.fill(64)(Float.NaN)).toDF("embedding")
      .select(expr("hyperplane_bands(embedding, 8, 24)")).head.getSeq[Int](0)
    assert(nan == Seq.fill(8)((1 << 24) - 1),
      "NaN dots must SET every bit (SQL NaN-high > 0 semantics)")
    // short + empty vectors evaluate (dims beyond length contribute 0)
    val short = Seq(Seq(1.5f, -2.5f), Seq.empty[Float]).toDF("embedding")
      .select(expr("hyperplane_bands(embedding, 2, 8)")).collect()
    assert(short.forall(_.getSeq[Int](0).length == 2))
    assert(short(1).getSeq[Int](0) == Seq(0, 0), "empty vector: zero dots")
    // integer element arrays widen per element (the FloatDot accessor law)
    val ints = Seq(Seq(3, -7, 2)).toDF("embedding")
      .select(expr("hyperplane_bands(embedding, 4, 16)").as("a"),
        expr("hyperplane_buckets64(transform(embedding, x -> cast(x as double)))")
          .as("b"))
      .head
    assert(ints.getSeq[Int](0) == ints.getSeq[Int](1))
  }

  test("literal-argument validation rejects bad widths") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    intercept[Exception] {
      emb.select(expr("hyperplane_bands(embedding, 8, 31)")).head
    }
    intercept[Exception] {
      emb.select(expr("hyperplane_bands(embedding, 0, 16)")).head
    }
  }
}
