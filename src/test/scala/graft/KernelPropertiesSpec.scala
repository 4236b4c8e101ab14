package graft

import graft.functions.TextHashes
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks for the hash kernels behind the codegen'd
  * expressions — pure functions, so ScalaCheck can hammer them without
  * a SparkSession.
  */
object KernelPropertiesSpec extends Properties("graft.kernels") {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("fnv1a64 deterministic, byte-sensitive") = Prop.forAll(text) { s =>
    val u = UTF8String.fromString(s)
    TextHashes.fnv1a64(u) == TextHashes.fnv1a64(UTF8String.fromString(s)) &&
      TextHashes.fnv1a64(u) != TextHashes.fnv1a64(UTF8String.fromString(s + "x"))
  }

  property("simhash64: identical→0, one-word edit moves few bits") = Prop.forAll(text) { s =>
    val a = TextHashes.simhash64(UTF8String.fromString(s))
    val stable = a == TextHashes.simhash64(UTF8String.fromString(s))
    val words = s.split(" ")
    val local = if (words.length < 20) true else {
      val edited = (words.take(words.length - 1) :+ "zzzedit").mkString(" ")
      val b = TextHashes.simhash64(UTF8String.fromString(edited))
      java.lang.Long.bitCount(a ^ b) <= 32
    }
    stable && local
  }

  // adversarial text: multi-space runs, leading/trailing spaces,
  // empties, non-ASCII — everything String.split(" ") treats specially
  private val messyText: Gen[String] = {
    val token = Gen.oneOf(word, Gen.const(""), Gen.const("héllo"), Gen.const("näïve"))
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))
      .flatMap(s => Gen.oneOf(s, " " + s, s + " ", s.replace(" ", "  ")))
  }

  property("shingleFps == array_sort(transform(shingles, fnv1a64)) on adversarial text") =
    Prop.forAll(messyText, Gen.chooseNum(1, 4)) { (s, k) =>
      val u = UTF8String.fromString(s)
      // composed form, computed kernel-by-kernel exactly as the old
      // Catalyst expression chain did
      val sh = TextHashes.shingles(u, k)
      val composed = (0 until sh.numElements())
        .map(i => TextHashes.fnv1a64(sh.getUTF8String(i))).sorted
      val fused = TextHashes.shingleFps(u, k)
      val got = (0 until fused.numElements()).map(fused.getLong)
      got == composed
    }

  property("shinglesPos(s, 1) == per-word fnv1a64 of split(rtrim) on adversarial text") =
    Prop.forAll(messyText) { s =>
      val u = UTF8String.fromString(s)
      val ws = s.replaceAll(" +$", "").split(" ", -1)
      val composed = ws.toIndexedSeq.map(w => TextHashes.fnv1a64(UTF8String.fromString(w)))
      val fused = TextHashes.shinglesPos(u, 1)
      val got = (0 until fused.numElements()).map(fused.getLong)
      got == composed
    }

  property("gramFps == composed split(rtrim)/fnv1a64 uni+bi stream on adversarial text") =
    Prop.forAll(messyText) { s =>
      val u = UTF8String.fromString(s)
      // composed form: exactly Dsir's old split(rtrim(text), " ") →
      // explode unigrams ∪ explode bigram concat(w1, ' ', w2) chain
      val ws = s.replaceAll(" +$", "").split(" ", -1)
      val uni = ws.toIndexedSeq.map(w => TextHashes.fnv1a64(UTF8String.fromString(w)))
      val bi = if (ws.length < 2) Seq.empty[Long]
        else ws.toIndexedSeq.sliding(2)
          .map(p => TextHashes.fnv1a64(UTF8String.fromString(p(0) + " " + p(1)))).toSeq
      val fused = TextHashes.gramFps(u)
      val got = (0 until fused.numElements()).map(fused.getLong)
      got == (uni ++ bi)
    }

  property("matchedTermFps == explode/isin composed filter on adversarial text") =
    Prop.forAll(messyText, Gen.listOfN(3, word)) { (s, terms) =>
      val u = UTF8String.fromString(s)
      val distinctTerms = terms.distinct
      val fps = distinctTerms
        .map(t => TextHashes.fnv1a64(UTF8String.fromString(t))).toArray.sorted
      val ws = s.replaceAll(" +$", "").split(" ", -1)
      val composed = ws.toIndexedSeq.filter(distinctTerms.contains)
        .map(w => TextHashes.fnv1a64(UTF8String.fromString(w)))
      val fused = TextHashes.matchedTermFps(u, fps)
      val got = (0 until fused.numElements()).map(fused.getLong)
      got == composed
    }

  property("minhashSigFp(shingleFps) == minhashSig(shingles) on adversarial text") =
    Prop.forAll(messyText, Gen.chooseNum(1, 4)) { (s, k) =>
      val u = UTF8String.fromString(s)
      val viaStrings = TextHashes.minhashSig(TextHashes.shingles(u, k), 16)
      val viaFps = TextHashes.minhashSigFp(TextHashes.shingleFps(u, k), 16)
      (0 until 16).forall(i => viaStrings.getLong(i) == viaFps.getLong(i))
    }

  property("shingles: distinct and exactly the k-gram sequence") =
    Prop.forAll(text, Gen.chooseNum(1, 4)) { (s, k) =>
      val arr = TextHashes.shingles(UTF8String.fromString(s), k)
      val out = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      val words = s.split(" ")
      val expected =
        if (words.length <= k) Seq(words.mkString(" "))
        else words.sliding(k).map(_.mkString(" ")).toSeq.distinct
      out.distinct == out && out == expected
    }

  property("minhashSig: invariant under shingle-set permutation") =
    Prop.forAll(Gen.nonEmptyListOf(word).map(_.distinct), Gen.chooseNum(1, 32)) { (ws, num) =>
      def sig(xs: Seq[String]): Seq[Long] = {
        val a = TextHashes.minhashSig(
          new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any]), num)
        (0 until a.numElements()).map(a.getLong)
      }
      ws.isEmpty || sig(ws) == sig(scala.util.Random.shuffle(ws))
    }

  property("winnowMinMax: min <= max") = Prop.forAll(text) { s =>
    val a = TextHashes.winnowMinMax(UTF8String.fromString(s), 3)
    a.getLong(0) <= a.getLong(1)
  }

  private val vec = Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_.toFloat / 10f))

  property("vecDot/vecNorm: Cauchy-Schwarz") = Prop.forAll(vec, vec) { (x, y) =>
    val ax = new GenericArrayData(x.toArray[Any])
    val ay = new GenericArrayData(y.toArray[Any])
    math.abs(TextHashes.vecDot(ax, ay)) <=
      TextHashes.vecNorm(ax) * TextHashes.vecNorm(ay) + 1e-6
  }

  property("hyperplaneSig: deterministic, bounded by bit width") =
    Prop.forAll(vec, Gen.chooseNum(1, 16)) { (x, bits) =>
      val ax = new GenericArrayData(x.toArray[Any])
      val s1 = TextHashes.hyperplaneSig(ax, bits)
      s1 == TextHashes.hyperplaneSig(ax, bits) && s1 >= 0 && s1 < (1L << bits)
    }

  // include some multi-byte (BMP) chars: positions are UTF-16 offsets
  private val charText = Gen.chooseNum(0, 80).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('的', 'é', 'ß')))
      .map(_.mkString))

  property("charWindows: rolling hash equals the direct polynomial per offset") =
    Prop.forAll(charText, Gen.chooseNum(1, 12)) { (s, l) =>
      def direct(sub: String): Long = {
        var h = 0L
        sub.foreach(c => h = h * 0x100000001b3L + c)
        h
      }
      val arr = TextHashes.charWindows(UTF8String.fromString(s), l)
      val n = math.max(0, s.length - l + 1)
      arr.numElements() == n &&
        (0 until n).forall(i => arr.getLong(i) == direct(s.substring(i, i + l)))
    }

  property("stripSpans: equals brute-force covered-char filter") =
    Prop.forAll(charText, Gen.chooseNum(1, 10),
      Gen.listOf(Gen.chooseNum(0, 80))) { (s, l, rawPos) =>
      val pos = rawPos.filter(p => p >= 0 && p <= s.length - l).distinct.sorted
      val arr = new GenericArrayData(pos.toArray[Any])
      val got = TextHashes.stripSpans(UTF8String.fromString(s), arr, l).toString
      val covered = pos.flatMap(p => p until math.min(p + l, s.length)).toSet
      val expected = s.zipWithIndex.collect { case (c, i) if !covered(i) => c }.mkString
      got == expected
    }

  property("prefixByFreqDyn: relational hist ≡ driver arrays, any hist order") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(-100L, 100L)),
      Gen.chooseNum(0.1, 0.9)) { (fps0, t) =>
      val fps = fps0.distinct
      val hist = fps.filter(_ % 3 == 0).map(g => (g, math.abs(g) % 7 + 2L))
      val keys = hist.map(_._1).sorted.toArray
      val vals = hist.sortBy(_._1).map(_._2).toArray
      val fpsAd = new GenericArrayData(fps.toArray[Any])
      val expect = TextHashes.prefixByFreq(fpsAd, keys, vals, t).toLongArray.toSeq
      // both hist orders (sorted and reversed) through fresh memos
      Seq(hist, hist.reverse).forall { h =>
        val histAd = new GenericArrayData(h.map { case (g, c) =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](g, c))
        }.toArray[Any])
        TextHashes.prefixByFreqDyn(fpsAd, histAd, t,
          new graft.functions.FpHistCache).toLongArray.toSeq == expect
      }
    }

  property("charEntropy: 0 for constant strings, ln(k) for uniform, order-free") =
    Prop.forAll(text, Gen.chooseNum(1, 20)) { (s, k) =>
      val e = (t: String) => TextHashes.charEntropy(UTF8String.fromString(t))
      val constant = math.abs(e("a" * k)) < 1e-12
      val distinct = s.toSet.take(k).mkString
      val uniform = distinct.isEmpty ||
        math.abs(e(distinct) - math.log(distinct.length.toDouble)) < 1e-9
      // entropy is a function of the multiset: any permutation agrees
      val permuted = math.abs(e(s) - e(s.reverse)) < 1e-9
      constant && uniform && permuted
    }
}
