package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Round-16 scratch: print Spark's xxhash64 for string tokens and the
  * (string, int) two-arg chain, to pin the exact semantics the q184
  * generated oracle must replay in DuckDB SQL.
  */
object XxhProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("xxhprobe", 2)
    import spark.implicits._
    val toks = Seq("the", "a", "vector", "zzz_absent", "table", "customer")
    val df = toks.toDF("tok")
      .withColumn("h1", xxhash64(col("tok")))
      .withColumn("h2_d0", xxhash64(col("tok"), lit(0)))
      .withColumn("h2_d3", xxhash64(col("tok"), lit(3)))
      .withColumn("b_d0", pmod(xxhash64(col("tok"), lit(0)), lit(2048L)))
    df.collect().foreach(r => println(
      s"XXH ${r.getString(0)} ${r.getLong(1)} ${r.getLong(2)} ${r.getLong(3)} ${r.getLong(4)}"))
    // the q21 chain shapes: int-seeded string hash (arg order h, s) and
    // the array<long> element fold
    val probes = spark.range(1).select(
      xxhash64(lit(3), lit("the")).as("a"),
      xxhash64(array(lit(111L), lit(-222L))).as("b"),
      xxhash64(array(lit(7L))).as("c"),
      xxhash64(lit(0), lit("vector scan here")).as("d")).head()
    println(s"XXHCHAIN ${probes.getLong(0)} ${probes.getLong(1)} " +
      s"${probes.getLong(2)} ${probes.getLong(3)}")
    spark.stop()
  }
}
