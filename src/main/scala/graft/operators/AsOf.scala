package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for every left row, the right row with the greatest
  * right-time ≤ left-time within the same key (DuckDB exposes this as
  * `ASOF JOIN`; Spark has no native operator — SURVEY §2.4).
  *
  * Implemented as a single-pass window over the UNION of both sides
  * rather than a range join: tag rows, sort by (key, time, side), and
  * carry the last right row forward with `last(..., ignoreNulls)`. One
  * shuffle on the key, O(n log n) per partition, no candidate-pair
  * explosion — a range join materializes |left| × |right-in-window|
  * pairs, which at 100 TB is the difference between a job that finishes
  * and one that doesn't. Ties (equal timestamps) match the right row,
  * mirroring ASOF's `>=` semantics.
  */
object AsOf {

  /** Left-join `left` to the as-of-latest row of `right`.
    *
    * @param keys     equi-join key columns present on both sides
    * @param leftTime event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param carry    right-side columns to carry onto matched left rows
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val carryNulls = carry.foldLeft(l)((df, c) =>
      df.withColumn(s"__carry_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
    val rCarry = carry.foldLeft(r)((df, c) => df.withColumn(s"__carry_$c", col(c)))
      .select((keys ++ Seq("__t", "__side") ++ carry.map(c => s"__carry_$c"))
        .map(col): _*)
    val lAll = carryNulls.select(
      (leftCols ++ Seq("__t", "__side") ++ carry.map(c => s"__carry_$c")).map(col): _*)
    // right rows sort before left rows at equal time → ties match (>=)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = lAll.unionByName(rCarry.select(lAll.columns.map(c =>
      if (rCarry.columns.contains(c)) col(c) else lit(null).as(c)): _*))
    val carried = carry.foldLeft(unioned)((df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__carry_$c"), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        carry.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }
}
