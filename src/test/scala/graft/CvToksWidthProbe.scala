package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-18 measurement probe for the eval_cv ledger (verdict r17
  * directive #4): what does the `lang` column actually COST in the
  * memoized cvtoks cache? The directive suggested pruning cvtoks to
  * (doc_id, fold, term, cnt), but `lang` feeds the finest count GRID's
  * aggregation key directly (grid = toks.groupBy(fold, lang, term)) —
  * pruning it forces a doc_id-keyed corpus-scale join to recover it
  * (docs are entity-keyed: the broadcast ban applies), i.e. one more
  * full exchange to save one column. This probe puts a number on the
  * column: both variants built at the given SF, persisted,
  * materialized, and their InMemoryRelation sizes printed. Run:
  * `sbt 'Test/runMain graft.CvToksWidthProbe /root/testdata/sf0.1'`. */
object CvToksWidthProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-cvtoks-width-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val fold = pmod(conv(substring(md5(concat(lit("cv|"),
      col("doc_id").cast("string"))), 1, 4), 16, 10).cast("int"), lit(5))
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), fold.as("fold"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
    def measure(tag: String, withLang: Boolean): Unit = {
      val keys =
        if (withLang) Seq(col("doc_id"), col("fold"), col("lang"), col("term"))
        else Seq(col("doc_id"), col("fold"), col("term"))
      val df = base
        .select((Seq(col("doc_id"), col("fold")) ++
          (if (withLang) Seq(col("lang")) else Nil) :+
          explode(col("t")).as("term")): _*)
        .groupBy(keys: _*)
        .agg(count(lit(1)).as("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val rows = df.count()
      val info = spark.sparkContext.getRDDStorageInfo
        .filter(_.name != null).maxBy(_.memSize)
      println(f"$tag%-14s rows=$rows%8d  memSize=${info.memSize}%10d bytes  " +
        f"(${info.memSize.toDouble / rows}%.2f B/row)")
      df.unpersist(blocking = true)
    }
    measure("with-lang", withLang = true)
    measure("without-lang", withLang = false)
    spark.stop()
  }
}
