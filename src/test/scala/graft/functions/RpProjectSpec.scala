package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class RpProjectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("signMatrix is deterministic ±1") {
    val a = RpProject.signMatrix(2, 5)
    val b = RpProject.signMatrix(2, 5)
    assert(a.toSeq === b.toSeq)
    assert(a.forall(s => s == 1.0 || s == -1.0))
    // both signs actually occur over a modest matrix
    val big = RpProject.signMatrix(4, 16)
    assert(big.exists(_ > 0) && big.exists(_ < 0))
  }

  test("native projection equals the scalar spec (in-order sum, divide by sqrt k)") {
    val k = 4; val d = 3
    val signs = RpProject.signMatrix(k, d)
    val vec = Seq(1.5f, -2.25f, 0.75f)
    val out = Seq((1L, vec)).toDF("id", "v")
      .select(RpProject.rpProject($"v", signs, k)).as[Seq[Double]].head()
    val exp = (0 until k).map { j =>
      var s = 0.0
      for (i <- 0 until d) s += vec(i).toDouble * signs(j * d + i)
      s / math.sqrt(k.toDouble)
    }
    assert(out === exp)
  }

  test("short input is zero-padded; double input accepted") {
    val k = 2; val d = 4
    val signs = RpProject.signMatrix(k, d)
    val short = Seq((1L, Seq(2.0, -1.0))).toDF("id", "v") // len 2 < d=4
      .select(RpProject.rpProject($"v", signs, k)).as[Seq[Double]].head()
    val exp = (0 until k).map { j =>
      (2.0 * signs(j * d) + -1.0 * signs(j * d + 1)) / math.sqrt(2.0)
    }
    assert(short === exp)
  }
}
