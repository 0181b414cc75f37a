package graft.sinks

import java.sql.Connection

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Per-row "insert iff the key is absent" SQL, parameterized once and
  * executed in JDBC batches. */
trait InsertIgnoreDialect extends Serializable {
  def insertIgnoreSql(table: String, columns: Seq[String], keys: Seq[String],
      schema: StructType): String
}

/** The reference's actual sink statement — batched
  * `INSERT … ON CONFLICT (keys) DO NOTHING`
  * (trading-etl-python/src/processing/consumer.py:195-205, where
  * psycopg2's `execute_values` plays the role of the JDBC batch). */
object PostgresInsertIgnoreDialect extends InsertIgnoreDialect {
  override def insertIgnoreSql(table: String, columns: Seq[String],
      keys: Seq[String], schema: StructType): String = {
    val cols = columns.map(c => s""""$c"""").mkString(", ")
    val params = columns.map(_ => "?").mkString(", ")
    val conflict = keys.map(k => s""""$k"""").mkString(", ")
    s"INSERT INTO $table ($cols) VALUES ($params) ON CONFLICT ($conflict) DO NOTHING"
  }
}

/** ANSI MERGE fallback for engines without ON CONFLICT (Derby, H2, …):
  * `MERGE INTO t USING (VALUES …) ON keys WHEN NOT MATCHED THEN INSERT`.
  * Engines like Derby require typed parameters inside VALUES, so each `?`
  * is wrapped in a CAST derived from the DataFrame schema. Identifiers are
  * left unquoted (engines that upcase unquoted DDL keep matching). */
object AnsiMergeInsertIgnoreDialect extends InsertIgnoreDialect {
  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case StringType => "VARCHAR(1024)"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other =>
      throw new IllegalArgumentException(s"unsupported sink column type $other")
  }

  override def insertIgnoreSql(table: String, columns: Seq[String],
      keys: Seq[String], schema: StructType): String = {
    val casts = columns
      .map(c => s"CAST(? AS ${sqlType(schema(c).dataType)})").mkString(", ")
    val vcols = columns.mkString(", ")
    val on = keys.map(k => s"t.$k = v.$k").mkString(" AND ")
    val ins = columns.map(c => s"v.$c").mkString(", ")
    s"MERGE INTO $table t USING (VALUES ($casts)) AS v($vcols) " +
      s"ON $on WHEN NOT MATCHED THEN INSERT ($vcols) VALUES ($ins)"
  }
}

/** First-write-wins JDBC sink: `foreachPartition` + one connection + one
  * PreparedStatement per partition, rows added to JDBC batches of
  * `batchSize`, one transaction per partition with rollback-on-failure —
  * the Spark shape of the reference consumer's
  * `execute_values(cur, "INSERT … ON CONFLICT DO NOTHING", records)` +
  * `db_conn.commit()` / `db_conn.rollback()`
  * (trading-etl-python/src/processing/consumer.py:188-210).
  *
  * Scale notes: each partition writes independently (N executors → N
  * connections — size the pool accordingly); at-least-once upstream
  * replays are absorbed by the conflict clause exactly like the parquet
  * [[IdempotentSink]]; there is no driver-side collect.
  */
object JdbcInsertIgnoreSink {

  private def jdbcTypeOf(dt: DataType): Int = dt match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.REAL
    case StringType => java.sql.Types.VARCHAR
    case BooleanType => java.sql.Types.BOOLEAN
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case _: DecimalType => java.sql.Types.DECIMAL
    case _ => java.sql.Types.OTHER
  }

  /** @param connect serializable connection factory, invoked once per
    *                partition on the executor (capture only strings/configs,
    *                never a Connection). */
  def write(df: DataFrame, connect: () => Connection, table: String,
      keys: Seq[String],
      dialect: InsertIgnoreDialect = PostgresInsertIgnoreDialect,
      batchSize: Int = 500): Unit = {
    val schema = df.schema
    val columns = schema.fieldNames.toSeq
    val sql = dialect.insertIgnoreSql(table, columns, keys, schema)
    val jdbcTypes = schema.fields.map(f => jdbcTypeOf(f.dataType))
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = connect()
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          try {
            var n = 0
            rows.foreach { row =>
              var i = 0
              while (i < columns.length) {
                val v = row.get(i)
                if (v == null) ps.setNull(i + 1, jdbcTypes(i))
                else ps.setObject(i + 1, v)
                i += 1
              }
              ps.addBatch()
              n += 1
              if (n % batchSize == 0) ps.executeBatch()
            }
            if (n % batchSize != 0) ps.executeBatch()
            conn.commit()
          } finally ps.close()
        } catch {
          case e: Throwable =>
            try conn.rollback()
            catch { case r: Throwable => e.addSuppressed(r) }
            throw e
        } finally conn.close()
      }
    }
  }
}
