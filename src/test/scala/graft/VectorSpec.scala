package graft

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._

/** The codegen'd LSH bucketer vs its declarative HOF reference: the two
  * must agree bit-for-bit, or every bucket id in the ANN/dedup paths
  * silently shifts (rows-only driver checks would not catch it). */
class VectorSpec extends SparkSpec {
  import spark.implicits._

  test("codegen lshBucket is bit-identical to the HOF derivation") {
    val rng = new scala.util.Random(7)
    val vecs = Seq.fill(200)(Array.fill(16)(rng.nextGaussian()).toSeq) ++
      Seq(Seq(0.0, -0.0, 0.0), Seq(1e-300, -1e-300), Seq(5.5))
    val df = vecs.map(Tuple1(_)).toDF("e")
    Seq((4, 42L), (6, 42L), (6, 43L), (8, 99L)).foreach { case (bits, seed) =>
      val got = df.select(
        VF.lshBucket($"e", bits, seed).as("fast"),
        VF.lshBucketHof($"e", bits, seed).as("ref")).as[(Long, Long)].collect()
      got.foreach { case (f, r) =>
        assert(f == r, s"bucket mismatch at bits=$bits seed=$seed: $f vs $r")
      }
      // sanity: buckets spread (not all rows in one bucket)
      assert(got.map(_._1).distinct.length > 1, s"degenerate bucketing bits=$bits")
    }
  }
}
