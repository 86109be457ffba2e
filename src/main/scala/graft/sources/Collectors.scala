package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import scala.jdk.CollectionConverters._

/** Result collectors — the engine→client result surface (reference
  * `src/execution/operator/helper/physical_materialized_collector.cpp`,
  * `physical_batch_collector.cpp`, and the streaming result interface
  * `query_result.hpp`). The engine's sinks are normally distributed
  * (parquet/noop writers); these are the thin driver-side surfaces for a
  * client that wants rows back:
  *
  *  - `materialized` — the whole result set on the driver (reference
  *    MaterializedQueryResult). Only for results KNOWN small (top-k,
  *    aggregates); a 100 TB engine must never call this on a data path —
  *    and nothing in graft does (the anti-pattern sweep checks).
  *  - `streaming` — partition-at-a-time pull (reference
  *    StreamQueryResult): driver memory is bounded by one partition,
  *    upstream stages still execute distributed.
  *  - `batched` — fixed-size record batches over the streaming surface,
  *    the DataChunk-shaped interface (reference BatchCollector): what a
  *    client protocol (Arrow flight-style) would page through.
  */
object Collectors {

  /** Full materialization on the driver — small results only. */
  def materialized(df: DataFrame): Array[Row] = df.collect()

  /** Partition-at-a-time streaming pull; driver holds ≤1 partition. */
  def streaming(df: DataFrame): Iterator[Row] = df.toLocalIterator().asScala

  /** Fixed-size batches over the streaming pull (DataChunk analog). */
  def batched(df: DataFrame, batchSize: Int): Iterator[Seq[Row]] = {
    require(batchSize > 0, "batchSize must be positive")
    streaming(df).grouped(batchSize)
  }
}
