package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting

/** Salted two-phase aggregate equals the direct aggregate. */
class SaltingSpec extends SparkSpec {

  test("saltedCountSum matches plain groupBy on skewed data") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val salted = Salting.saltedCountSum(li, Seq("l_returnflag"), "l_quantity")
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    val direct = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    assert(salted === direct)
  }
}
