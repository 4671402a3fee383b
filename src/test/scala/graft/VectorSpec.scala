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

  test("lshBucket equals the sign-pack of lshProjections (directed-probe invariant)") {
    // Similarity's directed multi-probe derives bucket0 by sign-packing
    // the projections instead of re-hashing the vector — the two
    // expressions MUST agree bit-for-bit or probes land in wrong buckets
    val rng = new scala.util.Random(7)
    val vecs = Seq.fill(200)(Array.fill(16)(rng.nextGaussian()).toSeq) ++
      Seq(Seq(0.0, -0.0, 0.0), Seq(1e-300, -1e-300), Seq(5.5))
    val df = vecs.map(Tuple1(_)).toDF("e")
    Seq((4, 42L), (6, 42L), (8, 99L)).foreach { case (bits, seed) =>
      val signPack = (0 until bits).map(b =>
        when(element_at(VF.lshProjections($"e", bits, seed), b + 1) >= 0,
          lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
      val got = df.select(VF.lshBucket($"e", bits, seed).as("bucket"),
        signPack.as("packed")).as[(Long, Long)].collect()
      got.foreach { case (b, p) =>
        assert(b == p, s"sign-pack mismatch at bits=$bits seed=$seed: $b vs $p")
      }
    }
  }
}
