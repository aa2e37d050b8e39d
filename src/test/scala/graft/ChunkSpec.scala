package graft

import org.scalatest.funsuite.AnyFunSuite

/** Boundary math for t50/t51's chunk geometry (window 200, stride 150) on
  * crafted document lengths at the exact window/stride edges — lengths the
  * driver fixture does not necessarily contain. Pins the defined scheme:
  * chunks k = 0..⌊max(len−51, 0)/150⌋ (the last window is emitted only
  * when it reaches past the previous one), start = 150k+1,
  * len = min(200, doclen − start + 1); an empty document yields ONE empty
  * chunk (the GREATEST(…, 0) guard both engines share). */
class ChunkSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Deterministic text of length n with no repeating 200-char window
    * (position-dependent characters), so chunk digests collide only when
    * the underlying text truly matches. */
  private def text(n: Int, salt: Int): String =
    (0 until n).map(i => ('a' + (i * 31 + salt * 7 + i / 26) % 26).toChar)
      .mkString

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("chunkspec").toString
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t50: chunk starts/lengths at exact window and stride boundaries") {
    val lens = Seq(0, 1, 150, 151, 200, 201, 350, 351, 450, 451, 500, 501)
    val dir = writeDocs(lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, "s", text(n, i))
    })
    val got = SparkEntry.queries("t50_doc_chunks")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val want = lens.zipWithIndex.flatMap { case (n, i) =>
      val ks = 0 to math.max(n - 51, 0) / 150
      ks.map { k =>
        val start = 150L * k + 1
        (i.toLong, k.toLong, start, math.min(200L, n - start + 1))
      }
    }
    assert(got == want)
    // the empty document's single chunk has length 0, not a missing row
    assert(got.count(_._1 == 0L) == 1 && got.find(_._1 == 0L).get._4 == 0L)
    // no chunk is a strict sub-span of its predecessor: every non-first
    // chunk extends past the previous window's end (len > overlap)
    assert(got.filter(_._2 > 0).forall(_._4 > 50))
    // coverage: the last chunk of every doc reaches the final character
    lens.zipWithIndex.filter(_._1 > 0).foreach { case (n, i) =>
      val last = got.filter(_._1 == i.toLong).maxBy(_._2)
      assert(last._3 + last._4 - 1 == n)
    }
  }

  test("t51: cross-document boilerplate flags and distinct-chunk counts") {
    // source "dup": two identical 400-char docs (every chunk shared) plus
    // one unique doc; source "u": a single unique doc.
    val dir = writeDocs(Seq(
      (0L, "dup", text(400, 1)),
      (1L, "dup", text(400, 1)),
      (2L, "dup", text(400, 2)),
      (3L, "u", text(400, 3))))
    val got = SparkEntry.queries("t51_chunk_dedup")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    // 400 chars -> 3 chunks per doc (k = 0,1,2). Docs 0/1 share all three
    // chunk digests with each other -> both boilerplate; doc 2 shares
    // none. Distinct store content for "dup" = 3 (docs 0/1) + 3 (doc 2).
    assert(got == Seq(
      ("dup", 3L, 9L, 6L, 2L),
      ("u", 1L, 3L, 3L, 0L)))
  }
}
