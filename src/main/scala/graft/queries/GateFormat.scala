package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Canonical serialization for the driver's correctness gate.
  *
  * The gate compares query output and DuckDB oracle row-by-row after a
  * pandas sort — which cannot sort array-typed cells. Both engines
  * print a list as identical compact JSON (`[1,2,3]`), so serializing
  * every array column with `to_json` turns the comparison scalar
  * without changing semantics. The oracle side mirrors this with
  * DuckDB's `CAST(to_json(col) AS VARCHAR)`.
  */
object GateFormat {

  /** Replace every array-typed column with its compact-JSON string,
    * preserving column names and order. */
  def jsonArrays(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType => to_json(col(f.name)).as(f.name)
        case _            => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Registry adapter: run `f`, then JSON-serialize its array columns. */
  def js(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (spark, dir) => jsonArrays(f(spark, dir))

  /** Oracle adapter: wrap `sql` so `colName` comes back as the same
    * compact JSON string Spark's `to_json` emits. */
  def j(sql: String, colName: String = "tag_ids"): String =
    s"SELECT * REPLACE (CAST(to_json($colName) AS VARCHAR) AS $colName) FROM (\n$sql\n)"
}
