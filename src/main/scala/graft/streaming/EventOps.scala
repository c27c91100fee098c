package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/**
 * Event-stream operators: tumbling-window rollups and gap-based
 * sessionization, in both batch form (deterministic, oracle-checked)
 * and Structured Streaming form (watermarked, availableNow-testable).
 *
 * Timestamps: events.ts is nanosecond parquet, read as BIGINT nanos
 * (`ts_ns`, see Tables.events). All batch bucketing is integer math on
 * epoch seconds — bit-exact across engines.
 */
object EventOps {

  val SessionGapSeconds = 1800L

  /** Hourly rollup per event_type: (hour_epoch, event_type, n, sum_v). */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withColumn("hour_epoch", expr("ts_ns div 3600000000000") * 3600L)
      .groupBy(col("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .orderBy(col("hour_epoch"), col("event_type"))

  /** Gap-based sessionization (gap > 30 min splits): per (user, session)
    * event count and duration in seconds. Shuffles once on user_id;
    * within-partition window sort only. */
  def sessionize(events: DataFrame): DataFrame = {
    val sec = expr("ts_ns div 1000000000")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    events
      .withColumn("sec", sec)
      .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
      .withColumn("boundary",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") > SessionGapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("boundary")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("sec")) - min(col("sec"))).as("dur_s"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Parquet schema for the streaming source (ts as raw nanos long). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /**
   * Structured Streaming hourly rollup: file source over the events
   * parquet, watermarked tumbling window, availableNow trigger draining
   * to a memory sink. Returns the completed result as a DataFrame.
   * At scale this is `readStream` on an arriving-file directory with a
   * real trigger; the plan (watermark -> window agg, `update` state in
   * the state store) is identical.
   */
  def runHourlyStream(spark: SparkSession, dir: String, queryName: String = "graft_hourly"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file stream sources need a directory basePath; select the events
    // file out of the fixture dir with a glob filter
    val stream = spark.readStream
      .schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_ns", col("ts"))
      .withColumn("event_ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(
        (unix_timestamp(col("window.start"))).as("hour_epoch"),
        col("event_type"), col("n"), col("sum_v"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
