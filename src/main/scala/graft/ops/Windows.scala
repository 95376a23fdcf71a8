package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Window-key helpers. */
object Windows {

  /** A constant partition key for windows over BOUNDED grids (day tables,
    * count histograms, top-K lists): evaluates to 0 for every row — one
    * partition, same semantics as an unkeyed window — but is explicit
    * intent where an unkeyed `Window.orderBy` is indistinguishable from an
    * accidental global window (and trips WindowExec's serialization
    * warning on every run).
    *
    * Why not `lit(0)`: the key must be NON-FOLDABLE — Catalyst's
    * EliminateWindowPartitions strips foldable partition expressions (and
    * SimplifyConditionals collapses an all-branches-equal CASE WHEN),
    * which would silently restore the unkeyed form. `pmod(xxhash64(c), 1)`
    * references the input column, so it survives the optimizer, is never
    * null (hash functions fold null inputs into the seed), and is 0 for
    * every row — a single partition. One hash per row is noise on the
    * bounded grids this is for. PlanSpec pins that the declared queries
    * using this helper never plan an empty partitionSpec, so an optimizer
    * upgrade that learns to fold it fails CI instead of silently
    * reintroducing unkeyed windows.
    */
  def constKey(c: Column): Column = pmod(xxhash64(c), lit(1L))
}
