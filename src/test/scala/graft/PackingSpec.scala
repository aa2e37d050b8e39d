package graft

import org.scalatest.funsuite.AnyFunSuite

/** t56's packing invariants on the fixture corpus — the oracle gate
  * proves value-equality with DuckDB, this spec proves the GEOMETRY the
  * numbers must encode: sequences tile gap-free to exactly L tokens,
  * every document's spans cover its full token estimate contiguously,
  * and boundary-crossing docs resume at offset 0 of the next sequence. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"
  private val L = 512L

  test("t56: spans tile sequences exactly and cover every document") {
    val rows = SparkEntry.queries("t56_sequence_pack")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(rows.nonEmpty)
    // no empty spans ever
    assert(rows.forall(_._4 >= 1))
    // every sequence but the last is filled to exactly L, gap-free:
    // spans sorted by offset chain off+len -> next off, starting at 0
    val lastSeq = rows.map(_._2).max
    rows.groupBy(_._2).foreach { case (seq, spans) =>
      val sorted = spans.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"seq $seq does not start at offset 0")
      sorted.sliding(2).foreach {
        case Seq((_, _, o1, l1), (_, _, o2, _)) =>
          assert(o1 + l1 == o2, s"gap or overlap inside seq $seq")
        case _ =>
      }
      val filled = sorted.map(_._4).sum
      if (seq < lastSeq) assert(filled == L, s"seq $seq holds $filled != $L")
      else assert(filled <= L)
    }
    // per doc: spans are consecutive sequences, the total equals t09's
    // token estimate, and every continuation resumes at offset 0
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "(n_chars + 3) div 4 AS tok")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._2)
      assert(sorted.map(_._4).sum == toks(doc), s"doc $doc coverage")
      assert(sorted.map(_._2) == (sorted.head._2 to sorted.last._2),
        s"doc $doc skips a sequence")
      sorted.tail.foreach { case (_, _, off, _) =>
        assert(off == 0L, s"doc $doc continuation not at offset 0")
      }
    }
    // zero-token docs occupy no span
    val packed = rows.map(_._1).toSet
    toks.foreach { case (doc, tok) =>
      assert(packed.contains(doc) == (tok >= 1), s"doc $doc presence")
    }
  }
}
