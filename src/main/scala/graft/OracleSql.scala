package graft

/** DuckDB oracle SQL building blocks shared across queries.
  *
  * Parity rules with the Spark side (see Verify/driver contract):
  *  - `events.ts` is ns in parquet; Spark reads it truncated to µs, so the
  *    oracle always goes through `CAST(ts AS TIMESTAMP)` (also truncating).
  *  - DuckDB `sum(BIGINT)` widens to HUGEINT → always cast back to BIGINT.
  *  - Every derived DOUBLE is rounded to 4 dp on BOTH sides so unrelated
  *    floating summation orders can't flip the driver's hash compare.
  *  - Column aliases match the Spark output exactly (driver sorts columns
  *    by name before hashing).
  */
object OracleSql {

  /** Tick stream stand-in — mirrors [[graft.sources.Tables.ticks]]. */
  val ticksCte: String =
    """ticks AS (
      |  SELECT CAST(user_id AS VARCHAR) AS symbol,
      |         CAST(ts AS TIMESTAMP) AS time,
      |         value AS price,
      |         CAST(event_id % 97 + 1 AS BIGINT) AS volume
      |  FROM events
      |)""".stripMargin

  /** Hourly OHLCV bars — mirrors [[graft.sources.Tables.bars]]. */
  val barsCte: String =
    """bars AS (
      |  SELECT symbol, date_trunc('hour', time) AS time,
      |         arg_min(price, time) AS open,
      |         max(price) AS high,
      |         min(price) AS low,
      |         arg_max(price, time) AS close,
      |         CAST(sum(volume) AS BIGINT) AS volume
      |  FROM ticks GROUP BY 1, 2
      |)""".stripMargin

  /** Bars with per-symbol row index (recursion driver). */
  val bCte: String =
    """b AS (
      |  SELECT symbol, time, open, high, low, close, volume,
      |         CAST(row_number() OVER (PARTITION BY symbol ORDER BY time) AS BIGINT) AS rn
      |  FROM bars
      |)""".stripMargin

  def withTicksBars(body: String): String =
    s"WITH $ticksCte, $barsCte\n$body"

  def withTicksBarsB(body: String, recursive: Boolean = false): String = {
    val kw = if (recursive) "WITH RECURSIVE" else "WITH"
    s"$kw $ticksCte, $barsCte, $bCte\n$body"
  }
}
