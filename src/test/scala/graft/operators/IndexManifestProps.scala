package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-math laws behind [[TextIndex.indexDigest]]'s XOR-of-row-hashes
  * content digest — the properties the persisted-index manifest contract
  * relies on (TextIndexSpec exercises the same laws through the real
  * Spark agg; these pin the algebra itself on random inputs, including
  * the one known blind spot and why the manifest's counts close it).
  */
object IndexManifestProps extends Properties("IndexManifest") {

  private def xorFold(xs: Seq[Long]): Long = xs.foldLeft(0L)(_ ^ _)

  private val rowsGen: Gen[List[Long]] =
    Gen.chooseNum(0, 64).flatMap(n => Gen.listOfN(n, Gen.long))

  property("order-free: any permutation of the same row hashes digests " +
      "identically (re-bucketing/compaction never invalidates a manifest)") =
    forAll(rowsGen, Gen.long) { (xs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      xorFold(xs) == xorFold(shuffled)
    }

  property("shard-homomorphic: digest(a ++ b) = digest(a) XOR digest(b) " +
      "— per-shard manifests fold into a corpus manifest with no rescan") =
    forAll(rowsGen, rowsGen) { (a, b) =>
      xorFold(a ++ b) == (xorFold(a) ^ xorFold(b))
    }

  property("the XOR blind spot is real AND closed by the counts: a row " +
      "duplicated an EVEN number of times cancels out of the digest, but " +
      "the manifest pairs the digest with nPostings, which any " +
      "duplication changes — (count, digest) together catch it") =
    forAll(rowsGen, Gen.long) { (xs, dup) =>
      val doubled = xs ++ Seq(dup, dup)
      // digest alone is blind to the duplicated pair...
      xorFold(doubled) == xorFold(xs) &&
        // ...the row count is not
        doubled.size != xs.size
    }

  property("single-element sensitivity: flipping any one row hash flips " +
      "the digest (a changed tf/term/doc_id cannot digest-collide with " +
      "the original row set)") =
    forAll(rowsGen, Gen.long) { (xs, x) =>
      val flipped = x ^ 0x9e3779b97f4a7c15L // any nonzero delta
      xorFold(flipped +: xs) != xorFold(x +: xs)
    }
}
