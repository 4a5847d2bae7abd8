package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Count windows (SURVEY.md §2.7 W4/W5) — Flink's
  * count_window(size[, slide]) has no Spark built-in; implemented as
  * keyed state over `flatMapGroupsWithState`.
  *
  * State is bounded: a tumbling window keeps at most `size-1` buffered
  * elements per key; a sliding window keeps a ring of the last
  * `size-1`. Pass `idleTimeoutMs > 0` to clear abandoned keys so state
  * cannot grow with the key space at 100 TB (risk #3 in SURVEY §7.4).
  * The timeout is opt-in because a processing-time timeout makes the
  * engine schedule batches continuously even with no data (needed to
  * fire expirations) — right for long-running production streams with
  * a real trigger interval, wrong for run-to-completion jobs.
  */
object CountWindows {

  case class CountWindowState[V](buffer: List[V], seen: Long)

  /** Tumbling count window: for each key, emit `agg` over every
    * consecutive batch of `size` elements (W4,
    * utils/flink_window_utils.py:229-258). Works identically over
    * bounded Datasets and Structured Streams.
    *
    * @param agg combiner from the full window buffer to the output
    * @param idleTimeoutMs clear per-key state after this idle period
    */
  def tumbling[K: Encoder, V: Encoder, O: Encoder](
      ds: Dataset[V], key: V => K, size: Int,
      agg: (K, Seq[V]) => O,
      idleTimeoutMs: Long = 0L): Dataset[O] = {
    implicit val stateEnc: Encoder[CountWindowState[V]] =
      Encoders.kryo[CountWindowState[V]]
    val timeoutConf = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    ds.groupByKey(key)
      .flatMapGroupsWithState[CountWindowState[V], O](
        OutputMode.Append, timeoutConf) {
        (k: K, values: Iterator[V], state: GroupState[CountWindowState[V]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var buf = state.getOption.map(_.buffer).getOrElse(Nil)
            var seen = state.getOption.map(_.seen).getOrElse(0L)
            val out = scala.collection.mutable.ListBuffer.empty[O]
            values.foreach { v =>
              buf = buf :+ v
              seen += 1
              if (buf.length >= size) {
                out += agg(k, buf)
                buf = Nil
              }
            }
            state.update(CountWindowState(buf, seen))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
      }
  }

  /** Sliding count window: emit `agg` over the last (up to) `size`
    * elements every `slide` elements (W5, :260-292; keyed only — the
    * reference raises on windowAll, we match by requiring a key).
    *
    * Flink parity: `count_window(size, slide)` is CountTrigger(slide)
    * + CountEvictor(size), which fires on every `slide`-th element
    * from the FIRST element — the early firings see a partial buffer
    * (fewer than `size` elements) until `size` have arrived.
    */
  def sliding[K: Encoder, V: Encoder, O: Encoder](
      ds: Dataset[V], key: V => K, size: Int, slide: Int,
      agg: (K, Seq[V]) => O,
      idleTimeoutMs: Long = 0L): Dataset[O] = {
    require(slide > 0 && size > 0, "size and slide must be positive")
    implicit val stateEnc: Encoder[CountWindowState[V]] =
      Encoders.kryo[CountWindowState[V]]
    val timeoutConf = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    ds.groupByKey(key)
      .flatMapGroupsWithState[CountWindowState[V], O](
        OutputMode.Append, timeoutConf) {
        (k: K, values: Iterator[V], state: GroupState[CountWindowState[V]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var buf = state.getOption.map(_.buffer).getOrElse(Nil)
            var seen = state.getOption.map(_.seen).getOrElse(0L)
            val out = scala.collection.mutable.ListBuffer.empty[O]
            values.foreach { v =>
              buf = (buf :+ v).takeRight(size)
              seen += 1
              // CountTrigger(slide): fire on every slide-th element from
              // the start; early windows are partial (CountEvictor keeps
              // at most `size`)
              if (seen % slide == 0) {
                out += agg(k, buf)
              }
            }
            state.update(CountWindowState(buf, seen))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
      }
  }
}
