package graft.tools

import org.apache.spark.sql.functions._

/** Dev lab (r19): measure the CHANCE-COLLISION rate of banded
  * hyperplane-LSH plane families against the independence model
  * E[same-band pairs] = bands·C(n,2)/2^bits — the quantity the
  * ~2·log₂N width schedule (t102) assumes the width knob controls.
  *
  * Motivated by the r18 ADVICE caveat: the then-shipped LCG family
  * (`((j·1103515245 + d·12345) mod 32768)/32768 − 0.5`) is
  * lattice-correlated — plane j+1 is plane j plus a constant shift
  * mod 1 per element — and the spec pinned only sign parity, not the
  * collision rate. This lab measured the caveat to be a CEILING, not
  * a footnote (table below, reproduced on both the sf0.1 fixture
  * embeddings and 20k deterministic 64-dim uniforms):
  *
  *   family  config   fixture ratio   synthetic ratio
  *   lcg     (4,16)        75x              77x
  *   lcg     (8,24)      4445x            4643x
  *   lcg     (8,30)    116291x          114979x
  *   md5     (4,16)       1.9x             1.9x
  *   md5     (8,24)       4.2x             4.5x
  *   md5     (8,30)    0 pairs    10.1x (15 pairs)
  *
  * (ratio = measured same-band collision pairs / independence model;
  * md5's residual — 2–5× at 16/24 bits, ~10× on a 15-pair count at 30
  * bits — is the finite-dimension Jensen factor E[(1−θ/π)^bits] >
  * 2^−bits at 64 dims, which grows with bits, not family correlation.)
  * The LCG numbers mean effective band entropy caps at ~12 bits no
  * matter the configured width — widening 24→30 bits bought 2.4×
  * instead of 2⁶× — so r19 moved [[graft.functions.HyperplaneBands]]
  * to the md5-mixed family (`(md5int32("hp|j|d") mod 32768)/32768 −
  * 0.5`) and HyperplaneBandsSpec now pins the collision law itself.
  * [[graft.functions.HyperplaneBuckets64]] (t12's oracle-pinned
  * published-default fixture twin) keeps the LCG family; its fixed
  * 4×16 config is graded by its own documented birthday integral,
  * not by the width schedule.
  *
  * Usage: runMain graft.tools.PlaneFamilyLab
  */
object PlaneFamilyLab {
  private def md5int32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((md(0) & 0xFFL) << 24) | ((md(1) & 0xFFL) << 16) |
      ((md(2) & 0xFFL) << 8) | (md(3) & 0xFFL)
  }

  private def planes(family: String, count: Int): Array[Array[Double]] =
    Array.tabulate(count, 64) { (j0, d0) =>
      family match {
        case "lcg" =>
          val m = ((j0 + 1).toLong * 1103515245L + (d0 + 1).toLong * 12345L) % 32768L
          m.toDouble / 32768.0 - 0.5
        case "md5" =>
          (md5int32(s"hp|${j0 + 1}|${d0 + 1}") % 32768L).toDouble / 32768.0 - 0.5
      }
    }

  /** Same-band collision pairs summed over bands, driver-side (a lab,
    * not engine code — n ≤ 20k vectors fit trivially). */
  private def collisions(vecs: Array[Array[Double]], family: String,
      bands: Int, bits: Int): (Long, Double) = {
    val p = planes(family, bands * bits)
    val n = vecs.length
    var tot = 0L
    for (k <- 0 until bands) {
      val counts = new java.util.HashMap[Int, Long]()
      var v = 0
      while (v < n) {
        var key = 0
        var i = 0
        while (i < bits) {
          val pj = p(k * bits + i)
          var acc = 0.0
          var d = 0
          while (d < 64) { acc += vecs(v)(d) * pj(d); d += 1 }
          if (acc > 0) key |= 1 << i
          i += 1
        }
        counts.merge(key, 1L, _ + _)
        v += 1
      }
      counts.values.forEach(c => tot += c * (c - 1) / 2)
    }
    (tot, bands.toDouble * n * (n - 1) / 2.0 / math.pow(2.0, bits))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("planefamilylab")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fixture = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val synthetic = spark.range(20000).select(expr(
      "transform(sequence(1, 64), d -> CAST(pmod(hash(id, d), 100001) / 100000.0 - 0.5 AS DOUBLE))"))
      .collect().map(_.getSeq[Double](0).toArray)

    for ((name, vecs) <- Seq("fixture-sf0.1" -> fixture, "synthetic-20k" -> synthetic);
         family <- Seq("lcg", "md5");
         (bands, bits) <- Seq((4, 16), (8, 24), (8, 30))) {
      val (got, model) = collisions(vecs, family, bands, bits)
      println(f"$name%-14s $family%-4s ($bands%d,$bits%2d): pairs $got%9d  " +
        f"model $model%12.1f  ratio ${got / math.max(model, 1e-9)}%10.1f")
    }
    spark.stop()
  }
}
