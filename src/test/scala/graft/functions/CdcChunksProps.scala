package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.graft.CdcChunks
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Structural laws of content-defined chunking on arbitrary token
  * streams — the invariants every consumer (chunk dedup, reassembly)
  * silently assumes: exact tiling, determinism, and prefix stability of
  * boundaries before an edit point.
  */
object CdcChunksProps extends Properties("CdcChunks") {

  private val tokGen: Gen[List[String]] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.alphaNumStr.map(s => if (s.isEmpty) "x" else s.take(5)),
        Gen.oneOf("the", "alpha", "beta", "gamma", "delta"))))

  private def chunksOf(toks: Seq[String], k: Int,
      maskBits: Int): Seq[(Int, Int, String)] = {
    val expr = CdcChunks(
      BoundReference(0, ArrayType(StringType), nullable = true), k, maskBits)
    val inConv = CatalystTypeConverters
      .createToCatalystConverter(ArrayType(StringType))
    val outConv = CatalystTypeConverters
      .createToScalaConverter(expr.dataType)
    outConv(expr.eval(InternalRow(inConv(toks))))
      .asInstanceOf[Seq[org.apache.spark.sql.Row]]
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
  }

  property("chunks tile the document exactly: contiguous 1-based starts, " +
      "lengths sum to n, concatenation reproduces the text") =
    forAll(tokGen, Gen.chooseNum(1, 4), Gen.chooseNum(1, 6)) {
      (toks, k, bits) =>
        val cs = chunksOf(toks, k, bits)
        cs.nonEmpty &&
          cs.head._1 == 1 &&
          cs.sliding(2).forall {
            case Seq(a, b) => b._1 == a._1 + a._2
            case _ => true
          } &&
          cs.map(_._2).sum == toks.length &&
          cs.map(_._3).mkString(" ") == toks.mkString(" ")
    }

  property("chunking is a pure function of the tokens (deterministic)") =
    forAll(tokGen) { toks =>
      chunksOf(toks, 3, 3) == chunksOf(toks, 3, 3)
    }

  property("boundaries before an edit point are stable: chunks that end " +
      "more than k tokens before an appended suffix are unchanged") =
    forAll(tokGen, Gen.nonEmptyListOf(Gen.oneOf("zz1", "zz2", "zz3"))) {
      (toks, suffix) =>
        val k = 3
        val before = chunksOf(toks, k, 3)
        val after = chunksOf(toks ++ suffix, k, 3)
        // every chunk of `before` that is followed by at least one more
        // full chunk AND ends at least k tokens before the append point
        // must appear identically in `after` (its boundary grams are
        // untouched by the suffix)
        val stableLimit = toks.length - k
        val stable = before.dropRight(1).takeWhile(c => c._1 + c._2 - 1 <= stableLimit)
        after.startsWith(stable)
    }
}
