package org.apache.spark.sql.graftglue

import graft.functions.TextHashes
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions. They live in this glue package because
  * `ExpectsInputTypes`/`AbstractDataType` are `private[sql]`; the
  * compute kernels stay in graft.functions.TextHashes (plain public
  * Scala, shared by interpreted eval and generated code).
  */

/** Codegen'd FNV-1a 64-bit fingerprint of a string column. */
case class Fnv1a64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a64"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.fnv1a64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.fnv1a64($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

/** Codegen'd 64-bit SimHash of a string column (token-level). */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Codegen'd MinHash signature: array<string> shingles → array<long>
  * of `numHashes` universal-hash minima (see TextHashes.minhashSig —
  * the interpreted nested-lambda formulation is ~1000x slower).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.minhashSig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Codegen'd MinHash signature over PRECOMPUTED shingle fingerprints
  * (ShingleFps output) — bit-identical to MinHashSig over the string
  * shingles, with no string materialization.
  */
case class MinHashSigFp(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_fp"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.minhashSigFp(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.minhashSigFp($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigFp =
    copy(child = newChild)
}

/** Codegen'd random-hyperplane sign signature of a float vector.
  * `planeOffset` selects a disjoint plane family per LSH table.
  */
case class HyperplaneSig(child: Expression, bits: Int, planeOffset: Int = 0)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.hyperplaneSig(input.asInstanceOf[ArrayData], bits, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.hyperplaneSig($c, $bits, $planeOffset)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** Codegen'd float-vector dot product (double accumulation). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.vecDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextHashes$$.MODULE$$.vecDot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Codegen'd float-vector L2 norm. */
case class VecNorm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.vecNorm(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.vecNorm($c)")

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Codegen'd dense rotation y = R·x over a float vector (row-major R
  * as a codegen reference object) — the OPQ rotation kernel.
  */
case class MatVecF(child: Expression, mat: Array[Double], d: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "mat_vec_f"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.matVecF(input.asInstanceOf[ArrayData], mat, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("rotMat", mat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.matVecF($c, $matRef, $d)")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecF =
    copy(child = newChild)
}

/** Codegen'd code-point Shannon entropy (nats) of a string. */
/** Codegen'd feature-hashing (hashing-trick) bag-of-words embedding:
  * word → bucket (fnv1a64 >>> 1) % dim, sign from the low hash bit —
  * integer-valued float vector, fully deterministic.
  */
case class HashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hash_embed"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.hashEmbed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.hashEmbed($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

case class CharEntropy(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.charEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** Codegen'd SQ8 scalar-quantization encode: array<float> → binary
  * (one uint8 code per dimension). The per-dim grid (mins, scales)
  * rides as codegen reference objects.
  */
case class Sq8Encode(child: Expression, mins: Array[Double], scales: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.sq8Encode(input.asInstanceOf[ArrayData], mins, scales)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sq8Mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("sq8Scales", scales, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.sq8Encode($c, $minsRef, $scalesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

/** Codegen'd L2 norm of an SQ8 reconstruction: binary codes → double. */
case class Sq8ReconNorm(child: Expression, mins: Array[Double], scales: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_recon_norm"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.sq8ReconNorm(input.asInstanceOf[Array[Byte]], mins, scales)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sq8Mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("sq8Scales", scales, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.sq8ReconNorm($c, $minsRef, $scalesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8ReconNorm =
    copy(child = newChild)
}

/** Codegen'd SQ8 asymmetric distance: full-precision query ⋅ SQ8
  * reconstruction, without materializing the reconstruction.
  */
case class Sq8Adc(left: Expression, right: Expression,
    mins: Array[Double], scales: Array[Double])
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.sq8Adc(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]], mins, scales)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sq8Mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("sq8Scales", scales, "double[]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashes$$.MODULE$$.sq8Adc($a, $b, $minsRef, $scalesRef)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Sq8Adc =
    copy(left = l, right = r)
}

/** Codegen'd distinct word-k-gram shingle set: string → array<string>. */
case class Shingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.shingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Codegen'd FUSED distinct word-k-shingle fingerprints: bit-identical
  * to array_sort(transform(shingles(s,k), fnv1a64)) with no per-shingle
  * allocation — the hot kernel of the n-gram dedup family.
  */
case class ShingleFps(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_fps"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.shingleFps(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.shingleFps($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleFps =
    copy(child = newChild)
}

/** Codegen'd POSITIONAL word-k-gram fingerprints (not deduplicated;
  * index = window start position) — the span-removal kernel.
  */
case class ShinglesPos(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingles_pos"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.shinglesPos(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.shinglesPos($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesPos =
    copy(child = newChild)
}

/** Codegen'd fused DSIR gram stream: fnv1a64 of every unigram and
  * adjacent bigram in one text scan, not deduplicated — replaces the
  * composed split/arrays_zip/concat two-explode form.
  */
case class GramFps(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_fps"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.gramFps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.gramFps($c)")

  override protected def withNewChildInternal(newChild: Expression): GramFps =
    copy(child = newChild)
}

/** Codegen'd positional char-L-window rolling hashes (Rabin-Karp);
  * `base` selects the polynomial base (two bases → an independent
  * 128-bit verification pair).
  */
case class CharWindows(child: Expression, l: Int, base: Long = 0x100000001b3L)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_windows"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.charWindows(input.asInstanceOf[UTF8String], l, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.charWindows($c, $l, ${base}L)")

  override protected def withNewChildInternal(newChild: Expression): CharWindows =
    copy(child = newChild)
}

/** Codegen'd matched-postings scan: fnv1a64 fps of only the words in
  * the sorted `terms` fingerprint set (binary-searched; array rides
  * as a codegen reference object) — emits O(matches) longs instead of
  * exploding every corpus word as a string through an isin filter.
  */
case class MatchedTermFps(child: Expression, terms: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "matched_term_fps"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.matchedTermFps(input.asInstanceOf[UTF8String], terms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("termFps", terms, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.matchedTermFps($c, $termsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MatchedTermFps =
    copy(child = newChild)
}

/** Codegen'd frequency-ordered prefix for AllPairs prefix filtering:
  * per-doc shingle fps → the `n - ceil(threshold*n) + 1` rarest by
  * (count, fp), counts binary-searched from a task-local sorted
  * histogram (arrays ride in as codegen reference objects — O(log K)
  * per fp, vs the linear scan of element_at on a literal map, which
  * measured 3.6x slower whole-query at 5 k docs).
  */
case class FreqOrderedPrefix(child: Expression, keys: Array[Long],
    vals: Array[Long], threshold: Double)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "freq_ordered_prefix"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.prefixByFreq(input.asInstanceOf[ArrayData], keys, vals, threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("fpKeys", keys, "long[]")
    val valsRef = ctx.addReferenceObj("fpVals", vals, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.prefixByFreq($c, $keysRef, $valsRef, $threshold)")
  }

  override protected def withNewChildInternal(newChild: Expression): FreqOrderedPrefix =
    copy(child = newChild)
}

/** [[FreqOrderedPrefix]] with the document-frequency histogram
  * supplied RELATIONALLY — an array<struct<fp,cnt>> child, in practice
  * an uncorrelated scalar subquery over the frequency aggregate —
  * instead of driver-side reference arrays: the form reachable from
  * pure /fetch SQL text, where no driver histogram exists. The
  * histogram converts to key-sorted primitive arrays ONCE per task
  * through an identity-keyed memo (both interpreted eval and codegen
  * of a scalar subquery hand back the same ArrayData instance on every
  * row); a genuinely per-row array child would still be correct, just
  * re-converted each row.
  */
case class FreqOrderedPrefixDyn(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "freq_ordered_prefix"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(StructType(fs), _))
          if fs.length == 2 && fs.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "freq_ordered_prefix expects (array<bigint>, array<struct<bigint,bigint>>), " +
            s"got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  @transient private lazy val cache = new graft.functions.FpHistCache

  override protected def nullSafeEval(fps: Any, hist: Any): Any =
    TextHashes.prefixByFreqDyn(fps.asInstanceOf[ArrayData],
      hist.asInstanceOf[ArrayData], threshold, cache)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cacheRef = ctx.addReferenceObj("fpHistCache", cache,
      "graft.functions.FpHistCache")
    defineCodeGen(ctx, ev, (f, h) =>
      s"graft.functions.TextHashes$$.MODULE$$.prefixByFreqDyn($f, $h, $threshold, $cacheRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqOrderedPrefixDyn =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd FULL frequency order — [[FreqOrderedPrefix]] without the
  * prefix cut, for the index side of a POSITIONAL prefix filter
  * (PPJoin, Xiao et al. 2008): the filter needs each element's index
  * in the same global (count, fp) order on both join sides.
  */
case class FreqOrderAll(child: Expression, keys: Array[Long], vals: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "freq_order_all"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.orderByFreq(input.asInstanceOf[ArrayData], keys, vals)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("fpKeys", keys, "long[]")
    val valsRef = ctx.addReferenceObj("fpVals", vals, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.orderByFreq($c, $keysRef, $valsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): FreqOrderAll =
    copy(child = newChild)
}

/** Codegen'd Jaccard of two sorted long-fingerprint sets (linear
  * merge, no intersection/union materialization — measured the
  * dominant cost of candidate verification on clone-heavy corpora).
  */
case class JaccardSortedFp(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaccard_sorted_fp"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.jaccardSortedFp(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashes$$.MODULE$$.jaccardSortedFp($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSortedFp =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd span removal: drop chars covered by L-windows at the
  * given ASCENDING start offsets (single-pass interval merge).
  */
case class StripSpans(left: Expression, right: Expression, l: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_spans"

  override protected def nullSafeEval(text: Any, positions: Any): Any =
    TextHashes.stripSpans(text.asInstanceOf[UTF8String], positions.asInstanceOf[ArrayData], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.TextHashes$$.MODULE$$.stripSpans($t, $p, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StripSpans =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd winnowed fingerprint: [min, max] of word-n-gram hashes. */
case class WinnowMinMax(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_minmax"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.winnowMinMax(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.winnowMinMax($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMinMax =
    copy(child = newChild)
}

/** Codegen'd initial BPE symbols of a word: code-point chars + `</w>`. */
case class BpeInitSyms(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_init_syms"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.bpeInitSyms(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes$$.MODULE$$.bpeInitSyms($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeInitSyms =
    copy(child = newChild)
}

/** Codegen'd application of a learned BPE merge table (in rank order)
  * to a symbol-array column. The merges ride as codegen reference
  * objects — broadcast-free constants of the generated class.
  */
case class BpeApply(child: Expression, lefts: Array[UTF8String],
    rights: Array[UTF8String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.bpeApply(input.asInstanceOf[ArrayData], lefts, rights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLefts", lefts,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val rRef = ctx.addReferenceObj("bpeRights", rights,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.bpeApply($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

/** Codegen'd per-document BPE token count under a learned merge table. */
case class BpeTokenCount(child: Expression, lefts: Array[UTF8String],
    rights: Array[UTF8String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "bpe_token_count"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.bpeTokenCount(input.asInstanceOf[UTF8String], lefts, rights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLefts", lefts,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val rRef = ctx.addReferenceObj("bpeRights", rights,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.bpeTokenCount($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Codegen'd per-document BPE token-id encoding: the merge table, the
  * symbol-id vocabulary, and the EOS separator ride as codegen
  * reference objects — one int per token, no per-row lookups outside
  * the generated loop.
  */
case class BpeEncodeIds(child: Expression, lefts: Array[UTF8String],
    rights: Array[UTF8String], ids: java.util.HashMap[String, Integer],
    eosId: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.bpeEncodeIds(input.asInstanceOf[UTF8String], lefts, rights, ids, eosId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLefts", lefts,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val rRef = ctx.addReferenceObj("bpeRights", rights,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val mRef = ctx.addReferenceObj("bpeIds", ids, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.bpeEncodeIds($c, $lRef, $rRef, $mRef, $eosId)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

/** Codegen'd bloom-filter bit positions of a 64-bit fingerprint. */
case class BloomPositions(child: Expression, numHashes: Int, m: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_positions"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.bloomPositions(input.asInstanceOf[Long], numHashes, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.bloomPositions($c, $numHashes, $m)")

  override protected def withNewChildInternal(newChild: Expression): BloomPositions =
    copy(child = newChild)
}

/** Codegen'd bloom probe: how many of the input fingerprints have all
  * k bits set in the packed-word filter (a codegen reference object).
  */
case class BloomCountHits(child: Expression, words: Array[Long],
    numHashes: Int, m: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "bloom_count_hits"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.bloomCountHits(input.asInstanceOf[ArrayData], words, numHashes, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.bloomCountHits($c, $wRef, $numHashes, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomCountHits =
    copy(child = newChild)
}

/** Codegen'd intersection count of two sorted fingerprint sets. */
case class CommonSortedFp(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "common_sorted_fp"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.commonSortedFp(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashes$$.MODULE$$.commonSortedFp($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonSortedFp =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd fused DSIR scorer: text → struct(n_grams, dsir_weight)
  * against a constant-size scaled-long LUT (one scan, no gram
  * explode/join/regroup — see TextHashes.gramLutSum for the
  * bit-identity argument vs the decimal-sum plan it replaces).
  */
case class GramLutSum(child: Expression, lut: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("dsir_weight", DoubleType, nullable = false)))
  override def prettyName: String = "gram_lut_sum"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.gramLutSum(input.asInstanceOf[UTF8String], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("dsirLut", lut, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.gramLutSum($c, $lutRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramLutSum =
    copy(child = newChild)
}

/** Codegen'd scaled-long margin: sum of weight entries at the given
  * bucket indices (weights as a codegen reference object).
  */
case class SumBucketWeights(child: Expression, w: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_bucket_weights"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.sumBucketWeights(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("lrWeights", w, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes$$.MODULE$$.sumBucketWeights($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): SumBucketWeights =
    copy(child = newChild)
}
