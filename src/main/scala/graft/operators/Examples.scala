package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Hadoop 2.10.0 examples suite (SURVEY §2.2) — the reference's
  * own "test queries" — re-expressed as declarative Spark plans.
  *
  * Reference: `hadoop-mapreduce-examples/src/main/java/org/apache/
  * hadoop/examples/{WordCount,WordMean,WordMedian,
  * WordStandardDeviation,Grep,Sort,Join,SecondarySort,
  * MultiFileWordCount,QuasiMonteCarlo,DBCountPageView}.java` and
  * `terasort/{TeraGen,TeraSort,TeraValidate}.java`.
  *
  * Scale notes: wordcount-family queries explode tokens inside a
  * single codegen stage and shuffle only (token → partial count)
  * pairs; the token-count shuffle is the same volume MapReduce's
  * combiner output would be, but with Tungsten hash aggregation.
  */
object Examples {

  /** #20/#26 WordCount / MultiFileWordCount. */
  def wordcount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** #21 WordMean + WordMedian + WordStandardDeviation in one pass. */
  def wordStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .select(length(col("word")).as("wlen"))
      .agg(
        count(lit(1)).as("n_words"),
        round(avg(col("wlen")), 4).as("mean_len"),
        round(median(col("wlen")), 4).as("median_len"),
        round(stddev_pop(col("wlen")), 4).as("stddev_len"))

  /** #22 Grep: regex extract-all → count per match → sort desc. */
  def grepCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(regexp_extract_all(col("text"), lit("(spark|hash|join|scan)[a-z]*"), lit(0))).as("match_str"))
      .groupBy(col("match_str"))
      .agg(count(lit(1)).as("n"))

  /** #28 TeraSort: synthetic wide keys, range-partitioned global sort,
    * plus TeraValidate's (count, min, max) summary. */
  def terasortValidate(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, Tables.lineitem(s, dir), "l_orderkey")
      .select(md5(concat(col("l_orderkey"), lit("-"), col("l_linenumber"))).as("tera_key"))
      .agg(
        count(lit(1)).as("n_keys"),
        min(col("tera_key")).as("first_key"),
        max(col("tera_key")).as("last_key"),
        count_distinct(col("tera_key")).as("n_distinct"))

  /** #29 RandomWriter/RandomTextWriter: deterministic distributed
    * synthetic data generator (`spark.range` + hash-derived payload —
    * no driver-side data, scales linearly with executor count). */
  def randomWriter(s: SparkSession, dir: String): DataFrame =
    s.range(0, 10000)
      .select(
        col("id"),
        md5(col("id").cast("string")).as("payload"),
        (col("id") * 2654435761L % 1000).as("bucket"))

  /** #30 QuasiMonteCarlo (Pi): deterministic low-discrepancy points
    * via multiplicative hashing — exact integer arithmetic so the
    * oracle reproduces it bit-for-bit. */
  def piEstimate(s: SparkSession, dir: String): DataFrame =
    s.range(0, 100000)
      .select(
        ((col("id") * 2654435761L) % 4294967296L).cast("double").divide(4294967296.0).as("x"),
        ((col("id") * 2246822519L) % 4294967296L).cast("double").divide(4294967296.0).as("y"))
      .select(when(col("x") * col("x") + col("y") * col("y") < 1.0, 1).otherwise(0).as("inside"))
      .agg(
        count(lit(1)).as("n_points"),
        round(avg(col("inside")) * 4.0, 6).as("pi_estimate"))

  /** #30b BaileyBorweinPlouffe: hex digits of π by direct digit
    * extraction — the reference's `BaileyBorweinPlouffe.java` /
    * `pi/DistBbp.java` example, whose map tasks each sum a slice of
    * the BBP series for a digit offset.
    *
    * Spark-native shape: (position × series-term) rows fan out of one
    * `explode(sequence(...))`, every term is exact int64 arithmetic
    * (square-and-multiply modpow via `aggregate` over the exponent's
    * bits — all codegen, no UDF), and one hash aggregation per digit
    * position sums the fixed-point contributions. At a deep single
    * position this is exactly DistBbp: millions of independent term
    * rows, one combine.
    *
    * Determinism across partitionings: contributions are FIXED-POINT
    * int64 (floor(r·2^52/m) via a 26-bit split — exact, no doubles
    * anywhere), so the sum is associative/commutative exactly and the
    * extracted digits are bit-identical under any partition count.
    * Error budget: ≤1 ulp (2^-52) per term × ~160 terms ≪ the 2^-32
    * margin below the 8 extracted digits.
    *
    * Output: 18 rows, 8 hex digits each — positions 1..137 step 8,
    * i.e. the first 144 hex digits of π, the well-known constants the
    * spec pins. The DuckDB oracle reproduces the identical integer
    * algorithm (list_reduce modpow), so this IS oracle-checked. */
  def bbpDigits(s: SparkSession, dir: String): DataFrame =
    s.range(0, 18)
      .select((col("id") * 8 + 1).as("d"))
      .select(col("d"), explode(expr("sequence(0L, d + 12L)")).as("k"))
      .select(col("d"), col("k"),
        explode(typedLit(Seq((1, 4L), (4, -2L), (5, -1L), (6, -1L)))).as("jw"))
      .select(col("d"), col("k"),
        col("jw._1").cast("long").as("j"), col("jw._2").as("w"))
      .withColumn("m", col("k") * 8 + col("j"))
      .withColumn("e", col("d") - 1 - col("k"))
      .withColumn("r", expr(
        """CASE WHEN e >= 0 THEN
             aggregate(sequence(0, 7),
               named_struct('r', CAST(1 AS BIGINT), 'b', CAST(16 % m AS BIGINT)),
               (a, i) -> named_struct(
                 'r', IF(((e >> i) & 1) = 1, a.r * a.b % m, a.r),
                 'b', a.b * a.b % m),
               a -> a.r)
           ELSE CAST(0 AS BIGINT) END"""))
      .withColumn("q", expr(
        """CASE WHEN e >= 0 THEN
             (r * 67108864 DIV m) * 67108864 + ((r * 67108864 % m) * 67108864) DIV m
           ELSE shiftright(4503599627370496 DIV m, CAST(4 * (k - d + 1) AS INT)) END"""))
      .groupBy(col("d"))
      .agg(expr(
        """lpad(hex(shiftright(
             ((sum(w * q) % 4503599627370496) + 4503599627370496) % 4503599627370496,
             20)), 8, '0')""").as("digits"))

  /** #31 DBCountPageView: pageview-style count per (type, hour). */
  def eventsPageviews(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_views"),
        count_distinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("sum_value"))
}
