package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface — the Dataset-native custom aggregate
  * (complementing the engine's `TypedImperativeAggregate`s, which live at
  * the Catalyst-expression level: TopKAggregate, HllDistinct, BloomAgg,
  * CmsAgg, HistQuantile). An `Aggregator` gets Encoder-managed buffers
  * (Tungsten rows end-to-end, no object serialization boundary), works
  * through `udaf(...)` in the Column API and `spark.udf.register` in SQL,
  * and merges partials map-side like any built-in aggregate.
  */
object Aggregators {

  /** Weighted arithmetic mean: Σ(v·w) / Σ(w). Buffer is the pair of
    * partial sums — associative/commutative merge, so map-side combine
    * applies and the shuffle carries two doubles per group. */
  object WeightedMean
      extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double),
                        a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Double, Double),
                       y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
