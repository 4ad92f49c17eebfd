package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pre-compute data-quality validation — the counterpart of the
  * reference's `validate_data_quality` (reference:
  * src/readers/hive_reader.py:137-166): row-count and per-column
  * null-rate checks run BEFORE tag computation so a half-loaded
  * upstream table aborts the batch instead of silently untagging
  * everyone.
  *
  * One aggregation pass over the input computes everything — at any
  * scale this is a single scan with a partial-agg-friendly plan, never
  * one action per column (the reference loops `df.filter(...).count()`
  * per field).
  */
object DataQuality {

  final case class Report(table: String, nRows: Long,
                          nullRates: Map[String, Double], failures: Seq[String]) {
    def passed: Boolean = failures.isEmpty
  }

  /** Validate `df`: total rows ≥ `minRows`, and each of `checkCols` has
    * a null rate ≤ `maxNullRate`. */
  def validate(df: DataFrame, table: String, checkCols: Seq[String],
               minRows: Long, maxNullRate: Double): Report = {
    val cols = checkCols.filter(df.columns.contains)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.map(c => sum(col(c).isNull.cast("long")).as(s"n_null_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n_rows")
    val rates = cols.map { c =>
      c -> (if (n == 0) 0.0 else row.getAs[Long](s"n_null_$c").toDouble / n)
    }.toMap
    val failures =
      (if (n < minRows) Seq(s"row count $n < required $minRows") else Nil) ++
      checkCols.filterNot(df.columns.contains).map(c => s"missing column: $c") ++
      rates.collect { case (c, r) if r > maxNullRate =>
        f"null rate of $c is $r%.3f > $maxNullRate%.3f"
      }
    Report(table, n, rates, failures.toSeq)
  }

  /** The reports as a DataFrame — `(table, column, n_rows, null_rate,
    * passed)` — for persisting alongside run statistics. */
  def reportFrame(spark: SparkSession, reports: Seq[Report]): DataFrame = {
    val schema = StructType(Seq(
      StructField("table", StringType),
      StructField("column", StringType),
      StructField("n_rows", LongType),
      StructField("null_rate", DoubleType),
      StructField("passed", BooleanType)))
    val rows = reports.flatMap { r =>
      if (r.nullRates.isEmpty) Seq(Row(r.table, null, r.nRows, null, r.passed))
      else r.nullRates.toSeq.sortBy(_._1).map { case (c, rate) =>
        Row(r.table, c, r.nRows, rate, r.passed)
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
