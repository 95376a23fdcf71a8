package graft.ops

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class CoerceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lenient coercion: castable, uncastable, null, and missing columns") {
    val df = Seq(
      ("1", "October", "42", "12.5"),
      ("2", null, "oops", null),
      ("3", "November", null, "not-a-number")
    ).toDF("id", "month", "value", "temperature")

    val spec = Seq(
      Coerce.FieldSpec("id", "string", ""),
      Coerce.FieldSpec("month", "string", ""),
      Coerce.FieldSpec("value", "int", 0),
      Coerce.FieldSpec("temperature", "double", 0.0),
      Coerce.FieldSpec("city", "string", "") // absent from input
    )
    val out = Coerce.lenient(df, spec).orderBy("id").collect()
    assert(out(0) === Row("1", "October", 42, 12.5, ""))
    assert(out(1) === Row("2", "", 0, 0.0, ""))     // null month → '', uncastable value → 0
    assert(out(2) === Row("3", "November", 0, 0.0, "")) // null value → 0, uncastable temp → 0.0
  }

  test("sensorReadingSpec covers the reference's full field inventory") {
    val names = Coerce.sensorReadingSpec.map(_.name)
    assert(names === Seq("id", "month", "month_num", "value", "temperature", "humidity",
      "ts", "city", "date", "date_timestamp_ns", "date_timestamp_converted"))
  }
}
