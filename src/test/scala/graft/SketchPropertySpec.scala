package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Property-based guards for the sketch invariants the pruning
  * operators stake correctness on (RuntimeFilter: Bloom has no false
  * negatives; HeavyHitters: CMS estimates upper-bound true counts) —
  * including under MERGE, which is exactly what Spark's partial
  * aggregation does with per-partition sketches. */
object SketchPropertySpec extends Properties("Sketches") {

  private val genKeys = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))

  property("bloom: no false negatives") = Prop.forAll(genKeys) { xs =>
    val bf = BloomFilter.create(math.max(xs.size, 1).toLong, 0.03)
    xs.foreach(bf.putLong)
    xs.forall(bf.mightContainLong)
  }

  property("bloom: partition-merge preserves membership of the union") =
    Prop.forAll(genKeys, genKeys) { (as, bs) =>
      val n = math.max(as.size + bs.size, 1).toLong
      val fa = BloomFilter.create(n, 0.03)
      val fb = BloomFilter.create(n, 0.03)
      as.foreach(fa.putLong)
      bs.foreach(fb.putLong)
      fa.mergeInPlace(fb)
      (as ++ bs).forall(fa.mightContainLong)
    }

  property("cms: estimate upper-bounds every true count") =
    Prop.forAll(genKeys) { xs =>
      val cms = CountMinSketch.create(0.01, 0.99, 42)
      xs.foreach(cms.addLong(_))
      xs.groupBy(identity).forall { case (k, g) =>
        cms.estimateCount(k) >= g.size.toLong
      }
    }

  property("cms: partition-merge estimates == single-pass estimates") =
    Prop.forAll(genKeys, genKeys) { (as, bs) =>
      val one = CountMinSketch.create(0.01, 0.99, 42)
      (as ++ bs).foreach(one.addLong(_))
      val pa = CountMinSketch.create(0.01, 0.99, 42)
      val pb = CountMinSketch.create(0.01, 0.99, 42)
      as.foreach(pa.addLong(_))
      bs.foreach(pb.addLong(_))
      pa.mergeInPlace(pb)
      (as ++ bs).distinct.forall(k =>
        pa.estimateCount(k) == one.estimateCount(k))
    }
}
