package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("as-of semantics: latest ≤, ties match, no-match is null, keys isolate") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, ts(10)), // after r1 and r2 → matches r2 (latest ≤)
      (2L, 100L, ts(5)),  // equal to r2's time → tie matches r2
      (3L, 100L, ts(1)),  // before all right rows → null
      (4L, 200L, ts(30))  // other key: matches only key-200 rows
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, 100L, ts(2)),  // r1
      (20L, 100L, ts(5)),  // r2
      (30L, 200L, ts(20)), // r3
      (40L, 300L, ts(0))   // unrelated key
    ).toDF("rid", "k", "rt")

    val out = AsOf.join(left, right, Seq("k"), "t", "rt", Seq("rid"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))

    assert(out.toList == List(
      (1L, Some(20L)),
      (2L, Some(20L)),
      (3L, None),
      (4L, Some(30L))))
  }

  test("randomized: matches a brute-force per-row reference (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val leftRows = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, ts(rnd.nextInt(60))))
    val rightRows = (1 to 200).map(i =>
      (1000L + i, rnd.nextInt(10).toLong, ts(rnd.nextInt(60))))
    // dedupe right per (key, time): keep max rid (ambiguous ties otherwise)
    val rightDedup = rightRows.groupBy(r => (r._2, r._3))
      .map { case ((k, t), rs) => (rs.map(_._1).max, k, t) }.toSeq
    val left = leftRows.toDF("id", "k", "t")
    val right = rightDedup.toDF("rid", "k", "rt")

    val got = AsOf.join(left, right, Seq("k"), "t", "rt", Seq("rid"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap

    // brute force: latest right with rt <= t for the same key
    leftRows.foreach { case (id, k, t) =>
      val expect = rightDedup
        .filter(r => r._2 == k && !r._3.after(t))
        .sortBy(r => (r._3.getTime, r._1))
        .lastOption.map(_._1)
      assert(got(id) == expect, s"left id=$id k=$k t=$t")
    }
  }

  test("null payload on the matched row carries as null, never an older row") {
    import spark.implicits._
    val left = Seq((1L, 100L, ts(10))).toDF("id", "k", "t")
    val right = Seq(
      (100L, ts(2), Some(7L), Option.empty[Long]),  // x=7,  y=null
      (100L, ts(5), Option.empty[Long], Some(9L))   // x=null, y=9 (latest)
    ).toDF("k", "rt", "x", "y")
    val r = AsOf.join(left, right, Seq("k"), "t", "rt", Seq("x", "y"))
      .collect()(0)
    // both carries come from the LATEST row (t=5): x is null there — the
    // older row's x=7 must NOT leak in (no per-column tearing)
    assert(r.isNullAt(r.fieldIndex("asof_x")))
    assert(r.getLong(r.fieldIndex("asof_y")) == 9L)
  }
}
