package graft

import org.scalatest.funsuite.AnyFunSuite

class DbscanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x_dbscan recovers exactly the planted density structure") {
    import org.apache.spark.sql.functions._
    val nBase = sources.Tables.load(spark, TestSpark.sfDir, "embeddings").count()
    val nGroups = (0L until nBase).count(_ % 4 == 0)
    val nSat = (0L until nBase).count(_ % 20 == 0)
    val rows = SparkEntry.queries("x_dbscan")(spark, TestSpark.sfDir).collect()
    assert(rows.length == nBase + 3 * nGroups + nSat)
    val byRole = rows.groupBy(_.getAs[String]("role")).view.mapValues(_.length).toMap
    // each planted 4-blob is all core; satellites are all border; rest noise
    assert(byRole("core") === 4 * nGroups)
    assert(byRole("border") === nSat.toInt)
    assert(byRole.getOrElse("noise", 0) === (nBase - nGroups).toInt)
    // one cluster per planted group, labeled by the base id
    val clusters = rows.flatMap(r => Option(r.getAs[java.lang.Long]("cluster_id"))).distinct
    assert(clusters.length === nGroups)
    assert(clusters.forall(c => c % 4 == 0 && c < nBase))
    // every border (satellite, id = base + SatellitePlantOffset) attaches
    // to its own blob — the offset is the SHARED constant the query plants
    // with, so the spec cannot drift from the query again
    rows.filter(_.getAs[String]("role") == "border").foreach { r =>
      assert(r.getAs[Long]("cluster_id") ===
        r.getAs[Long]("id") - ext.Dbscan.SatellitePlantOffset)
    }
  }
}
