package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Schema sentinel for driver corpus regenerations — the outage class
  * behind rounds 5/6 (`events.ts` re-encoded) generalized to EVERY
  * column: if a regeneration changes any table's column set or types,
  * THIS spec fails first, naming the exact drift, instead of dozens of
  * oracle hash mismatches pointing nowhere. `events.ts` is special-cased
  * to the set of encodings `Tables.normalizeTs` absorbs (pinned in
  * depth by TsEncodingSpec); everything else is pinned exactly.
  */
class CorpusSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string", "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "<ts>", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))

  /** The ts encodings Tables.normalizeTs / EventStream.readEvents absorb. */
  private val tsEncodings = Set("bigint", "timestamp_ntz", "timestamp")

  test("every corpus table reads with the pinned column names and types") {
    val drift = Seq.newBuilder[String]
    expected.foreach { case (table, cols) =>
      val got = Tables.load(spark, TestSpark.sfDir, table)
        .schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
      if (got.map(_._1) != cols.map(_._1))
        drift += s"$table: columns ${got.map(_._1).mkString(",")} != pinned ${cols.map(_._1).mkString(",")}"
      else cols.zip(got).foreach { case ((name, want), (_, have)) =>
        val ok = if (want == "<ts>") tsEncodings.contains(have) else want == have
        if (!ok) drift += s"$table.$name: stored $have, pinned $want — " +
          "corpus regeneration drift; update the reader normalization " +
          "(Tables / EventStream) and the oracle SQL together, then re-pin here"
      }
    }
    assert(drift.result().isEmpty, drift.result().mkString("\n"))
  }

  test("timestamp columns normalize: loadEvents yields TimestampType whatever is stored") {
    assert(Tables.loadEvents(spark, TestSpark.sfDir).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }
}
