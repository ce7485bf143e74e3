package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for the ordered-series LISTAGG (SURVEY §4's
  * refinement (a)): unlike `array_sort(collect_list(struct(...)))` —
  * which ships every element to the reducer before sorting — an
  * Aggregator participates in partial aggregation: per-partition buffers
  * merge pairwise, so the shuffle carries one combined buffer per
  * (partition, key) instead of one row per element. Same result,
  * map-side combined. The buffer is kryo-encoded (it never crosses the
  * SQL surface).
  */
object OrderedSeriesAgg {

  /** (sortKey1, sortKey2, value) → comma-joined values ordered by
    * (sortKey1, sortKey2) — deterministic when the key pair is unique. */
  val stringSeries: Aggregator[(Long, Long, String), List[(Long, Long, String)], String] =
    new Aggregator[(Long, Long, String), List[(Long, Long, String)], String] {
      override def zero: List[(Long, Long, String)] = Nil
      override def reduce(b: List[(Long, Long, String)], a: (Long, Long, String)): List[(Long, Long, String)] = a :: b
      override def merge(x: List[(Long, Long, String)], y: List[(Long, Long, String)]): List[(Long, Long, String)] = x ::: y
      override def finish(r: List[(Long, Long, String)]): String =
        r.sortBy(e => (e._1, e._2)).map(_._3).mkString(",")
      override def bufferEncoder: Encoder[List[(Long, Long, String)]] =
        Encoders.kryo[List[(Long, Long, String)]]
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }
}
