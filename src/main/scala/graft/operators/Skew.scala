package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §5).
  *
  * AQE's skew-join split handles most hot keys at runtime; salting is
  * the plan-level fallback for pathologically hot keys (the classic
  * MapReduce "hot reducer" problem — reference behavior:
  * TotalOrderPartitioner + custom partitioners were Hadoop's answer).
  *
  * `saltedJoin` spreads each left-side key over `numSalts` synthetic
  * sub-keys and replicates the right side once per salt, so a key
  * that previously hammered one reducer now lands on `numSalts`
  * tasks. Replication cost is right-rows × numSalts — use for
  * fact-to-dimension-ish joins where the right side is the smaller
  * relation but too big (or too skewed) to broadcast.
  */
object Skew {

  /** Equi-join `left.joinOn === right.joinOn` with left-side salting.
    * Result is identical to the plain inner join (verified in
    * SkewSpec); only the shuffle layout differs. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, numSalts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(leftKey, monotonically_increasing_id()), lit(numSalts)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedLeft
      .join(saltedRight,
        leftKey === rightKey && saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }

  /** Salted fact⋈dim join as a first-class oracle-checked query: the
    * revenue-by-nation report run through [[saltedJoin]] (8 salts).
    * The aggregation result is identical to the plain join — that IS
    * the check; only the shuffle layout differs (each l_suppkey's
    * rows land on 8 tasks instead of 1). */
  def saltedJoinReport(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_extendedprice"))
    val sup = Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    saltedJoin(li, sup, col("l_suppkey"), col("s_suppkey"), numSalts = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
  }
}
