package graft

import org.scalatest.funsuite.AnyFunSuite

/** t54's redaction-planning semantics on crafted corpora — the driver
  * fixture only exercises keep/drop (its contaminated docs are wholesale
  * near-duplicates of eval docs), so the interval-merge arithmetic is
  * pinned here: island coalescing for overlapping AND adjacent dirty
  * ranges, piece counting with boundary islands, the clean-fraction and
  * fragmentation drop rules, and the sub-13-word edge.
  *
  * Eval membership is doc_id % 50 == 0 (same convention as t19/t43), so
  * doc 0 and doc 50 are the eval corpus and everything else is train.
  */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def w(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")
  private def filler(doc: Int, n: Int): Seq[String] =
    (0 until n).map(i => s"f${doc}x$i")

  private val E = w("E", 30) // eval doc 0's words
  private val G = w("G", 13) // eval doc 50's words

  private def writeDocs(rows: Seq[(Long, Seq[String])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("decontam").toString
    import spark.implicits._
    rows.map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t54: island merge, piece counting, and verdict branches") {
    val docs = Seq(
      0L -> E,
      50L -> G,
      // one interior collision in a 100-word doc: island [41,53],
      // pieces 2, clean 0.87 → redact
      1L -> (filler(1, 40) ++ E.take(13) ++ filler(10, 47)),
      // 15 eval words opening a 20-word doc: hits p=1..3 merge into
      // [1,15]; boundary island (first_s=1) → pieces 1; clean 0.25 → drop
      2L -> (E.take(15) ++ filler(2, 5)),
      // clean doc → keep
      3L -> filler(3, 30),
      // three widely-spaced interior islands in a 400-word doc:
      // clean 0.9025 passes the fraction rule but pieces 4 > 3 →
      // drop on FRAGMENTATION alone
      4L -> (filler(4, 60) ++ E.take(13) ++ filler(40, 60) ++ E.take(13)
        ++ filler(41, 60) ++ E.take(13) ++ filler(42, 181)),
      // ADJACENT (not overlapping) dirty ranges: E-gram at p=41,
      // G-gram at p=54 = prev_end+1 — the crossing 13-grams mix E/G
      // words and match nothing, so exactly two hits whose ranges
      // touch gap-free and must coalesce into ONE island [41,66];
      // clean 114/140 ≥ 0.8, pieces 2 → redact
      5L -> (filler(5, 40) ++ E.take(13) ++ G ++ filler(50, 74)),
      // shorter than 13 words: zero 13-grams, trivially keep
      6L -> filler(6, 5),
      // island flush at position 1 in a 100-word doc: pieces stays 1
      7L -> (E.take(13) ++ filler(7, 87)))
    val dir = writeDocs(docs)
    val got = SparkEntry.queries("t54_decontaminate_13gram")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getString(6)))
      .toSeq
    val want = Seq(
      (1L, 88L, 1L, 13L, 2L, 0.87, "redact"),
      (2L, 8L, 3L, 15L, 1L, 0.25, "drop"),
      (3L, 18L, 0L, 0L, 1L, 1.0, "keep"),
      (4L, 388L, 3L, 39L, 4L, 361.0 / 400.0, "drop"),
      (5L, 128L, 2L, 26L, 2L, 114.0 / 140.0, "redact"),
      (6L, 0L, 0L, 0L, 1L, 1.0, "keep"),
      (7L, 88L, 1L, 13L, 1L, 0.87, "redact"))
    assert(got == want)
  }

  test("t63: manifest verdict precedence — dup beats contaminated " +
      "beats low_quality beats split") {
    val spark = SparkSuite.spark
    // 'the' is a stopword: stop-ratio 0.5 → quality ≈ 0.75 for long docs
    val good = (0 until 50).flatMap(i => Seq("the", s"w$i")).mkString(" ")
    val contamText = (E.take(15) ++ filler(2, 5)).mkString(" ")
    val docs = Seq(
      0L -> E.mkString(" "),      // eval corpus (doc_id % 50 == 0)
      1L -> good, 3L -> good,     // exact dups: 3 → dup of 1
      2L -> contamText,           // 13/18 eval shingles → contaminated
      7L -> contamText,           // dup of 2: 'dup' MUST beat 'contaminated'
      4L -> "zzz9",               // 1 word, no stopwords → low quality
      6L -> ("the " * 99 + "end")) // clean, high quality → a split verdict
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    import spark.implicits._
    docs.map { case (id, text) => (id, text, text.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("t63_curation_manifest")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(4)))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 6L, 7L), "eval doc excluded")
    assert(rows(3L) == ((1L, "dup")))
    assert(rows(7L) == ((2L, "dup")), "dup must take precedence over contaminated")
    assert(rows(2L)._2 == "contaminated")
    assert(rows(4L)._2 == "low_quality")
    assert(rows(1L)._1 == 1L && Set("train", "validation", "test")(rows(1L)._2))
    assert(Set("train", "validation", "test")(rows(6L)._2))
  }

  // r18 verdict "What's wrong" #2: the benchmark-bounded-eval premise
  // behind the t19/t54/t63 broadcast hints must be ENFORCED at the hint
  // site, not stated in comments — an unwitting caller shipping a
  // corpus-proportional eval side must get a diagnostic naming the
  // t43/t100 escalation, never a silent driver-OOM-sized broadcast.
  test("boundedEvalBroadcast: oversized eval side fails toward t43/t100") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val oversized = (0L until 11L).toDF("g")
    val ex = intercept[IllegalStateException] {
      graft.queries.DataSelection
        .boundedEvalBroadcast(oversized, "spec_site", maxRows = 10)
    }
    assert(ex.getMessage.contains("spec_site"))
    assert(ex.getMessage.contains("benchmark-bounded-eval"),
      "the diagnostic must name the violated premise")
    assert(ex.getMessage.contains("t43_bloom_decontaminate") &&
      ex.getMessage.contains("t100_semantic_decontaminate_ivf"),
      "the diagnostic must name both escalation routes")
  }

  test("boundedEvalBroadcast: in-bound eval side broadcasts with values intact") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val eval = (0L until 10L).map(i => i * 2).toDF("g")
    val guarded = graft.queries.DataSelection
      .boundedEvalBroadcast(eval, "spec_site", maxRows = 10)
    val probe = (0L until 20L).toDF("g")
    val joined = probe.join(guarded, Seq("g"))
    assert(joined.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
      "the guard must still hand the frame to the broadcast hint")
    assert(joined.collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 20L by 2).toSeq)
    guarded.unpersist()
  }
}
