package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Column-API entries for Spark's native Bloom-filter expressions — the
  * codegen'd kernels behind the runtime-filter feature (SQL
  * `bloom_filter_agg` / `might_contain`), which Scala's public API does
  * not expose. Both sides hash through `xxhash64`, so build and probe
  * agree; the probe is a few bit tests inside whole-stage codegen, where
  * the Scala-closure UDF it replaces forced a codegen break per row.
  */
object Bloom {

  /** Aggregate a LongType column (hash values — pass `xxhash64(col)`) into
    * a serialized Bloom filter sized for `expectedItems` at `fpp`.
    */
  def aggregate(hashed: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, s"expectedItems must be > 0: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(hashed),
      Literal(expectedItems),
      Literal(BloomFilter.optimalNumOfBits(expectedItems, fpp)))
      .toAggregateExpression())
  }

  /** Probe a serialized filter (as built by [[aggregate]]) with a LongType
    * hash column. The filter bytes ride as a fold-able literal — Catalyst
    * ships them once per executor with the plan, and the probe stays
    * inside whole-stage codegen. A null `filter` (empty build side) yields
    * null, which `where` treats as false — every row filtered, the correct
    * semantics for an empty reference set.
    */
  def mightContain(filter: Array[Byte], hashed: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      Bridge.expression(hashed)))
}
