package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftglue.{BloomCountHits, BloomPositions, BpeApply, BpeEncodeIds, BpeInitSyms, BpeTokenCount, Bridge, CharEntropy, CharWindows, CommonSortedFp, Fnv1a64, FreqOrderAll, FreqOrderedPrefix, FreqOrderedPrefixDyn, GramFps, GramLutSum, HashEmbed, HyperplaneSig, JaccardSortedFp, MatVecF, MatchedTermFps, MinHashSig, MinHashSigFp, ShingleFps, Shingles, ShinglesPos, SimHash64, Sq8Adc, Sq8Encode, Sq8ReconNorm, StripSpans, SumBucketWeights, VecDot, VecNorm, WinnowMinMax}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels shared by eval and generated code. Called from
  * whole-stage-codegen'd Java, so keep them allocation-light.
  */
object TextHashes {

  /** 64-bit FNV-1a over raw bytes — a fast, stable document
    * fingerprint primitive.
    */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64(s: UTF8String): Long = fnv1a64(s.getBytes)

  /** splitmix64 — cheap, high-quality 64-bit mixer used to derive the
    * per-function seeds of the minhash family and hyperplane signs.
    */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature kernel: one base hash per shingle, then `num`
    * universal-hash variants (a_i*h + b_i) minimized across shingles.
    * O(shingles + shingles*num) multiply-adds — no string building per
    * hash function (the naive nested-lambda formulation is interpreted
    * per element by Spark's HigherOrderFunction and ~1000x slower).
    */
  def minhashSig(arr: org.apache.spark.sql.catalyst.util.ArrayData, num: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val base = new Array[Long](n)
    var i = 0
    while (i < n) { base(i) = fnv1a64(arr.getUTF8String(i)); i += 1 }
    val out = new Array[Long](num)
    var f = 0
    while (f < num) {
      val a = splitmix64(2L * f + 1) | 1L
      val b = splitmix64(2L * f + 2)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = a * base(j) + b
        if (v < m) m = v
        j += 1
      }
      out(f) = m
      f += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** MinHash signature over PRECOMPUTED shingle fingerprints (the
    * [[shingleFps]] output): bit-identical to [[minhashSig]] over the
    * string shingles — the base hash there IS fnv1a64 of each shingle,
    * and min() is order- and duplicate-insensitive — without ever
    * materializing the shingle strings the string form hashes.
    */
  def minhashSigFp(fps: org.apache.spark.sql.catalyst.util.ArrayData, num: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = fps.numElements()
    val out = new Array[Long](num)
    var f = 0
    while (f < num) {
      val a = splitmix64(2L * f + 1) | 1L
      val b = splitmix64(2L * f + 2)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = a * fps.getLong(j) + b
        if (v < m) m = v
        j += 1
      }
      out(f) = m
      f += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Random-hyperplane sign signature over a float vector: bit i is
    * the sign of Σ_j v(j)·plane(i,j) with plane(i,j) = ±1 from
    * splitmix64 parity. Deterministic, no stored planes.
    */
  def hyperplaneSig(arr: org.apache.spark.sql.catalyst.util.ArrayData, bits: Int,
      planeOffset: Int = 0): Long = {
    val n = arr.numElements()
    var sig = 0L
    var i = 0
    while (i < bits) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        val sign = if ((splitmix64((planeOffset + i) * 1315423911L + j) & 1L) == 0L) 1.0 else -1.0
        acc += arr.getFloat(j) * sign
        j += 1
      }
      sig = (sig << 1) | (if (acc >= 0) 1L else 0L)
      i += 1
    }
    sig
  }

  /** Dot product of two float vectors, accumulated in double. */
  def vecDot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  /** L2 norm of a float vector (double accumulation). */
  def vecNorm(a: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  /** SQ8 scalar quantization: float vector → one uint8 code per
    * dimension against per-dim (min, scale=(max−min)/255) grids.
    * code = floor((v−min)/scale + 0.5) clamped to [0,255]; a
    * degenerate dimension (scale ≤ 0) codes as 0. 4× smaller than
    * float32 through the scan, 8× smaller than the raw double form.
    */
  def sq8Encode(a: org.apache.spark.sql.catalyst.util.ArrayData,
      mins: Array[Double], scales: Array[Double]): Array[Byte] = {
    val d = mins.length
    val out = new Array[Byte](d)
    var j = 0
    while (j < d) {
      val v = a.getFloat(j).toDouble
      val c =
        if (scales(j) <= 0.0) 0
        else {
          val u = math.floor((v - mins(j)) / scales(j) + 0.5)
          if (u < 0.0) 0 else if (u > 255.0) 255 else u.toInt
        }
      out(j) = c.toByte
      j += 1
    }
    out
  }

  /** L2 norm of the SQ8 reconstruction v̂[j] = min[j] + code[j]·scale[j]
    * — the denominator of the norm-corrected ADC cosine (the cosine of
    * the vector ADC actually measures; see Pq normCorrect).
    */
  def sq8ReconNorm(codes: Array[Byte], mins: Array[Double],
      scales: Array[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < codes.length) {
      val v = mins(j) + (codes(j) & 0xFF).toDouble * scales(j)
      acc += v * v
      j += 1
    }
    math.sqrt(acc)
  }

  /** Asymmetric distance computation against SQ8 codes:
    * Σ_j q[j]·(min[j] + code[j]·scale[j]) — the query stays full
    * precision, the corpus side never leaves its 1-byte codes.
    */
  def sq8Adc(q: org.apache.spark.sql.catalyst.util.ArrayData,
      codes: Array[Byte], mins: Array[Double], scales: Array[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < codes.length) {
      acc += q.getFloat(j).toDouble * (mins(j) + (codes(j) & 0xFF).toDouble * scales(j))
      j += 1
    }
    acc
  }

  /** Dense matrix-vector product y = R·x with row-major R (d×d) over a
    * float vector, each y[k] accumulated in double in index order then
    * rounded to float32 — the orthogonal-rotation kernel of OPQ
    * (rotation rides as a codegen reference object; per-row work is
    * d², no shuffle).
    */
  def matVecF(x: org.apache.spark.sql.catalyst.util.ArrayData,
      mat: Array[Double], d: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new Array[Float](d)
    var k = 0
    while (k < d) {
      var acc = 0.0
      val base = k * d
      var i = 0
      while (i < d) {
        acc += mat(base + i) * x.getFloat(i).toDouble
        i += 1
      }
      out(k) = acc.toFloat
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Feature-hashing bag-of-words embedding: each space-separated word
    * lands in bucket (fnv1a64 >>> 1) % dim with ±1 sign from the low
    * hash bit. Integer-valued counts as floats — all downstream
    * dot/norm arithmetic is exact-integer in double, so cosines are
    * bit-identical to the pure-Python mirror.
    */
  def hashEmbed(s: UTF8String, dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = s.toString.split(" ")
    val acc = new Array[Float](dim)
    var i = 0
    while (i < words.length) {
      val h = fnv1a64(UTF8String.fromString(words(i)))
      val b = ((h >>> 1) % dim).toInt
      acc(b) += (if ((h & 1L) == 0L) 1f else -1f)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(acc)
  }

  /** Shannon entropy (nats) of a string's code-point distribution:
    * ln(N) − (1/N)·Σ c·ln(c) — the machine-generated/binary-junk
    * detector of a text-quality battery (natural language sits ~2.5–4
    * nats; base64 blobs and repeated filler fall far outside). One
    * pass, one small histogram, no allocation beyond it. The c·ln(c)
    * terms sum in FIRST-APPEARANCE order of each code point — a pure
    * function of the string, mirrored by make_expected.
    */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.LinkedHashMap[Integer, java.lang.Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, java.lang.Long.valueOf(if (prev == null) 1L else prev.longValue() + 1L))
      n += 1
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue().toDouble
      acc += c * math.log(c)
    }
    math.log(n.toDouble) - acc / n.toDouble
  }

  /** Distinct word-k-gram shingle set of a string — the single-pass
    * kernel behind the Shingles expression (the transform/slice/
    * concat_ws SQL formulation is interpreted per element).
    */
  def shingles(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = s.toString.split(" ")
    val out = new java.util.LinkedHashSet[String]()
    if (words.length <= k) {
      out.add(words.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= words.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Fused distinct word-k-shingle FINGERPRINTS: bit-identical to
    * `array_sort(transform(shingles(s, k), fnv1a64))` — same
    * tokenization (String.split(" ")), same string-level dedup (a true
    * fnv collision between two DISTINCT shingles keeps both fps, like
    * the composed form), same byte stream into fnv (word bytes joined
    * by a single 0x20), ascending sort — but with NO per-shingle
    * allocation: no StringBuilder, no shingle String/UTF8String, no
    * LinkedHashSet boxing, no interpreted `transform` lambda, no
    * separate array_sort pass. One byte[] per WORD is the only
    * per-token allocation (k× fewer objects than the composed form);
    * the dedup is an open-addressed long table with exact byte compare
    * on fp equality. This is the hot inner kernel of the n-gram dedup
    * family — the composed form's allocation rate made
    * sql_shingle_jaccard's 10× wall swing 20-102 s with GC.
    */
  def shingleFps(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = s.toString.split(" ")
    val wb = new Array[Array[Byte]](words.length)
    var wi = 0
    while (wi < words.length) { wb(wi) = words(wi).getBytes("UTF-8"); wi += 1 }

    def hashWindow(start: Int, len: Int): Long = {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < len) {
        if (j > 0) { h ^= 0x20L; h *= 0x100000001b3L }
        val b = wb(start + j)
        var p = 0
        while (p < b.length) {
          h ^= (b(p) & 0xff).toLong
          h *= 0x100000001b3L
          p += 1
        }
        j += 1
      }
      h
    }
    def sameWindow(a: Int, b: Int, len: Int): Boolean = {
      var j = 0
      while (j < len) {
        if (!java.util.Arrays.equals(wb(a + j), wb(b + j))) return false
        j += 1
      }
      true
    }

    val nWin = if (words.length <= k) 1 else words.length - k + 1
    val winLen = if (words.length <= k) words.length else k
    // open-addressed (fp -> first window index) table; a same-fp slot
    // with DIFFERENT bytes probes on (keeping both, like the composed
    // form's string-distinct-then-hash order)
    var cap = 4
    while (cap < nWin * 2) cap <<= 1
    val mask = cap - 1
    val slotFp = new Array[Long](cap)
    val slotWin = new Array[Int](cap)
    java.util.Arrays.fill(slotWin, -1)
    val out = new Array[Long](nWin)
    var nOut = 0
    var i = 0
    while (i < nWin) {
      val fp = hashWindow(i, winLen)
      var idx = (fp.toInt ^ (fp >>> 32).toInt) & mask
      var dup = false
      var placed = false
      while (!placed && !dup) {
        if (slotWin(idx) < 0) {
          slotFp(idx) = fp
          slotWin(idx) = i
          placed = true
        } else if (slotFp(idx) == fp && sameWindow(slotWin(idx), i, winLen)) {
          dup = true
        } else {
          idx = (idx + 1) & mask
        }
      }
      if (!dup) { out(nOut) = fp; nOut += 1 }
      i += 1
    }
    val res = java.util.Arrays.copyOf(out, nOut)
    java.util.Arrays.sort(res)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(res)
  }

  /** POSITIONAL word-k-gram fingerprints: fnv1a64 of the window
    * starting at each word index, in order, NOT deduplicated — the
    * kernel behind span-removal, where a window's identity is
    * (position, hash). Docs with ≤ k words yield the single whole-text
    * window at position 0 (same short-doc rule as [[shingles]]).
    */
  def shinglesPos(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = s.toString.split(" ")
    val out =
      if (words.length <= k) Array(fnv1a64(UTF8String.fromString(words.mkString(" "))))
      else {
        val n = words.length - k + 1
        val arr = new Array[Long](n)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < n) {
          sb.setLength(0)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j))
            j += 1
          }
          arr(i) = fnv1a64(sb.toString.getBytes("UTF-8"))
          i += 1
        }
        arr
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Fused DSIR gram stream: fnv1a64 fingerprints of every unigram
    * and every adjacent bigram ("w1 w2"), NOT deduplicated — one text
    * scan replaces the composed form's two explode passes and its
    * per-bigram arrays_zip struct + concat string allocations.
    * Tokenization mirrors `split(rtrim(text), " ")`: Java's split
    * drops trailing empty fields (≡ rtrim), keeps leading/interior
    * empties, and the empty/all-space doc yields the single empty
    * word the SQL form sees. Bigram bytes are word₁ ⧺ 0x20 ⧺ word₂ —
    * identical to fnv1a64(concat(w1, ' ', w2)). Equivalence with the
    * composed form is ScalaCheck-pinned (KernelPropertiesSpec).
    */
  def gramFps(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words0 = s.toString.split(" ")
    val words = if (words0.length == 0) Array("") else words0
    val n = words.length
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { wb(i) = words(i).getBytes("UTF-8"); i += 1 }
    @inline def mix(h0: Long, b: Array[Byte]): Long = {
      var h = h0
      var p = 0
      while (p < b.length) {
        h ^= (b(p) & 0xff).toLong
        h *= 0x100000001b3L
        p += 1
      }
      h
    }
    val basis = 0xcbf29ce484222325L
    val out = new Array[Long](if (n >= 2) 2 * n - 1 else n)
    i = 0
    while (i < n) { out(i) = mix(basis, wb(i)); i += 1 }
    i = 0
    while (i < n - 1) {
      var h = mix(basis, wb(i))
      h ^= 0x20L
      h *= 0x100000001b3L
      out(n + i) = mix(h, wb(i + 1))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Matched-postings scan kernel: fnv1a64 fingerprints of ONLY the
    * words present in the sorted `terms` fingerprint set, in
    * positional order, not deduplicated. The composed form —
    * `explode(split(rtrim(text), " "))` then `isin(termSet)` —
    * materializes a UTF8String per corpus word and string-compares
    * each against every term BEFORE the filter drops ~all of them;
    * this emits O(matches) longs from one scan (binary search per
    * word, no per-word string beyond the split). Matching is by
    * fingerprint: exact up to an fnv1a64 collision between a corpus
    * word and a query term (the n-gram dedup family's 2⁻⁶⁴
    * convention); callers require() the term set itself collision-
    * free. Tokenization mirrors split(rtrim(text), " ") like
    * [[gramFps]].
    */
  def matchedTermFps(s: UTF8String, terms: Array[Long]):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = s.toString.split(" ")
    var out = new Array[Long](8)
    var n = 0
    var i = 0
    while (i < words.length) {
      val fp = fnv1a64(words(i).getBytes("UTF-8"))
      if (java.util.Arrays.binarySearch(terms, fp) >= 0) {
        if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
        out(n) = fp
        n += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, n))
  }

  /** POSITIONAL char-`L`-window fingerprints: a rolling Rabin-Karp
    * polynomial hash (base 0x100000001b3, mod 2^64 via Long wraparound)
    * of the window starting at every char offset — O(len) total, the
    * char-granularity counterpart of [[shinglesPos]] behind
    * ExactSubstr-style span removal. Docs shorter than `L` yield an
    * EMPTY array (nothing of span length exists — mirrors the
    * oracle's empty `range`). Positions are UTF-16 offsets, which
    * equal code-point offsets for BMP text (the corpus).
    */
  def charWindows(s: UTF8String, L: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    charWindows(s, L, 0x100000001b3L)

  /** As above with a caller-chosen odd base — a SECOND independent
    * base gives the 128-bit (h1, h2) verification pair of
    * Dedup.removeDuplicatedCharSpans.
    */
  def charWindows(s: UTF8String, L: Int, B: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val n = str.length - L + 1
    if (n <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    // B^(L-1) mod 2^64, for the rolling subtract
    var bTop = 1L
    var e = 0
    while (e < L - 1) { bTop *= B; e += 1 }
    val out = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < L) { h = h * B + str.charAt(i); i += 1 }
    out(0) = h
    i = 1
    while (i < n) {
      h = (h - str.charAt(i - 1) * bTop) * B + str.charAt(i + L - 1)
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Remove every char covered by an `L`-window starting at any of
    * `positions` (ASCENDING array of window starts): single-pass
    * interval merge + copy of the uncovered stretches. The rebuild
    * kernel behind char-granularity span removal — O(len), no
    * per-covered-char explosion.
    *
    * Offsets are UTF-16 units; when a span edge would split a
    * surrogate pair, the edge snaps OUTWARD to the code-point boundary
    * (one extra char removed) so the rebuilt string never contains a
    * lone surrogate. No-op on BMP-only text (the test corpora).
    */
  def stripSpans(s: UTF8String, positions: org.apache.spark.sql.catalyst.util.ArrayData,
      L: Int): UTF8String = {
    val np = positions.numElements()
    if (np == 0) return s
    val str = s.toString
    def splitsPair(off: Int): Boolean =
      off > 0 && off < str.length &&
        Character.isLowSurrogate(str.charAt(off)) &&
        Character.isHighSurrogate(str.charAt(off - 1))
    val sb = new java.lang.StringBuilder(str.length)
    var copied = 0 // everything before this offset is emitted or skipped
    var i = 0
    while (i < np) {
      val p0 = positions.getInt(i)
      val p = if (splitsPair(p0)) p0 - 1 else p0
      if (p > copied) sb.append(str, copied, p)
      val e0 = math.min(p0 + L, str.length)
      val end = if (splitsPair(e0)) e0 + 1 else e0
      if (end > copied) copied = end
      i += 1
    }
    if (copied < str.length) sb.append(str, copied, str.length)
    UTF8String.fromString(sb.toString)
  }

  /** Winnowed fingerprint kernel: [min, max] of fnv1a64 over the
    * word-`n`-grams of `s` (single pass, no shingle materialization).
    */
  def winnowMinMax(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = s.toString.split(" ")
    var mn = Long.MaxValue
    var mx = Long.MinValue
    if (words.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        val h = fnv1a64(sb.toString.getBytes("UTF-8"))
        if (h < mn) mn = h
        if (h > mx) mx = h
        i += 1
      }
    } else {
      val h = fnv1a64(s)
      mn = h; mx = h
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(mn, mx))
  }

  /** Frequency-ordered prefix kernel for AllPairs prefix filtering:
    * given a doc's shingle fingerprints and a (sorted-key, count)
    * heavy-hitter histogram, sort the fps by (count, fp) — unseen fps
    * count 0 — and return the first `n - ceil(threshold*n) + 1`
    * (the prefix whose emptiness would certify Jaccard < threshold).
    * All array-local: one binary search per fp, one local sort, no
    * shuffle. Matches the SQL `array_sort(struct(cnt, h))` + `slice`
    * ordering exactly (struct compare = field-by-field; ceil on the
    * same IEEE double product).
    */
  def prefixByFreq(fps: org.apache.spark.sql.catalyst.util.ArrayData,
      keys: Array[Long], vals: Array[Long], threshold: Double):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = fps.numElements()
    val take = math.min(n.toLong,
      math.max(0L, n - math.ceil(threshold * n).toLong + 1L)).toInt
    if (take <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      freqSorted(fps, keys, vals).take(take))
  }

  /** [[prefixByFreq]] with the histogram arriving RELATIONALLY as an
    * array<struct<fp,cnt>> value (in practice a scalar subquery over
    * the document-frequency aggregate) — the pure-SQL-reachable form.
    * `cache` memoizes the primitive-array conversion by instance
    * identity: a scalar subquery evaluates to the SAME ArrayData on
    * every row, so the histogram converts and sorts once per task.
    */
  def prefixByFreqDyn(fps: org.apache.spark.sql.catalyst.util.ArrayData,
      hist: org.apache.spark.sql.catalyst.util.ArrayData,
      threshold: Double, cache: FpHistCache):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val (k, v) = cache.arrays(hist)
    prefixByFreq(fps, k, v, threshold)
  }

  /** The FULL (count, fp)-ordered fingerprint array — [[prefixByFreq]]
    * without the prefix cut. Both sides of a positional prefix filter
    * (PPJoin) must expose each element's index in the SAME global
    * order; this is that order, for the index side.
    */
  def orderByFreq(fps: org.apache.spark.sql.catalyst.util.ArrayData,
      keys: Array[Long], vals: Array[Long]):
      org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      freqSorted(fps, keys, vals))

  /** The ONE (count, fp) global order both PPJoin sides share — the
    * positional filter's exactness depends on prefix and index using
    * the SAME comparator, so this helper is the single source of
    * truth for it. One binary search per fp, one local sort.
    */
  private def freqSorted(fps: org.apache.spark.sql.catalyst.util.ArrayData,
      keys: Array[Long], vals: Array[Long]): Array[Long] = {
    val n = fps.numElements()
    val pairs = new Array[(Long, Long)](n)
    var i = 0
    while (i < n) {
      val h = fps.getLong(i)
      val j = java.util.Arrays.binarySearch(keys, h)
      val cnt = if (j >= 0) vals(j) else 0L
      pairs(i) = (cnt, h)
      i += 1
    }
    java.util.Arrays.sort(pairs.asInstanceOf[Array[AnyRef]],
      implicitly[Ordering[(Long, Long)]].asInstanceOf[java.util.Comparator[AnyRef]])
    val out = new Array[Long](n)
    i = 0
    while (i < n) { out(i) = pairs(i)._2; i += 1 }
    out
  }

  /** Jaccard of two SORTED long-fingerprint sets by linear merge —
    * no intersection/union arrays are materialized (array_intersect +
    * array_union allocate both per pair just to take their sizes).
    * Elements are assumed distinct within each input (shingle sets
    * are per-doc distinct), so |union| = na + nb - |common|.
    */
  def jaccardSortedFp(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var common = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { common += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    common.toDouble / (na + nb - common)
  }

  /** Initial BPE symbol sequence of a word: one symbol per CODE POINT
    * (surrogate pairs stay together, matching Python's per-character
    * iteration in the oracle mirror) plus the `</w>` end-of-word
    * marker that lets merges distinguish word-final from word-internal
    * contexts — the classic Sennrich et al. 2016 setup.
    */
  def bpeInitSyms(w: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = w.toString
    val out = new java.util.ArrayList[AnyRef](str.length + 1)
    var i = 0
    while (i < str.length) {
      val n = Character.charCount(str.codePointAt(i))
      out.add(UTF8String.fromString(str.substring(i, i + n)))
      i += n
    }
    out.add(UTF8String.fromString("</w>"))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)))
  }

  /** Apply learned BPE merges IN RANK ORDER to a symbol sequence: for
    * each merge one greedy left-to-right pass replaces every
    * non-overlapping adjacent (left, right) with their concatenation.
    * Deterministic and incremental-equivalent (re-applying the full
    * chain from the initial symbols equals extending a previously
    * merged sequence), which is what lets the trainer recompute symbol
    * columns purely from the persisted word relation each round.
    */
  def bpeApply(syms: org.apache.spark.sql.catalyst.util.ArrayData,
      lefts: Array[UTF8String], rights: Array[UTF8String]):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    var cur = new Array[UTF8String](syms.numElements())
    var i = 0
    while (i < cur.length) { cur(i) = syms.getUTF8String(i); i += 1 }
    var m = 0
    while (m < lefts.length) {
      val l = lefts(m)
      val r = rights(m)
      val n = cur.length
      val next = new Array[UTF8String](n)
      var src = 0
      var dst = 0
      while (src < n) {
        if (src + 1 < n && cur(src).equals(l) && cur(src + 1).equals(r)) {
          next(dst) = UTF8String.concat(l, r)
          src += 2
        } else {
          next(dst) = cur(src)
          src += 1
        }
        dst += 1
      }
      cur = if (dst == n) next else java.util.Arrays.copyOf(next, dst)
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      cur.asInstanceOf[Array[AnyRef]])
  }

  /** Token count of a whole document under a learned BPE merge table:
    * Σ over space-separated words of |bpeApply(bpeInitSyms(word))| —
    * the per-doc "how many tokens will this cost" pass of a training
    * pipeline, one kernel call per doc.
    */
  def bpeTokenCount(s: UTF8String, lefts: Array[UTF8String],
      rights: Array[UTF8String]): Int = {
    val words = s.toString.split(" ")
    var total = 0
    var wi = 0
    while (wi < words.length) {
      total += bpeApply(bpeInitSyms(UTF8String.fromString(words(wi))),
        lefts, rights).numElements()
      wi += 1
    }
    total
  }

  /** Token-id encoding of a whole document under a learned BPE merge
    * table and a symbol-id vocabulary: per space-separated word,
    * bpeApply(bpeInitSyms(word)) mapped through `ids`, then one
    * `eosId` document separator appended. Unknown symbols (impossible
    * when the vocabulary was built from the same corpus; possible when
    * encoding NEW text with a frozen tokenizer) encode as -1 rather
    * than failing, mirroring fast-tokenizer UNK behavior.
    */
  def bpeEncodeIds(s: UTF8String, lefts: Array[UTF8String],
      rights: Array[UTF8String], ids: java.util.HashMap[String, Integer],
      eosId: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = s.toString.split(" ")
    val b = new scala.collection.mutable.ArrayBuilder.ofInt
    var wi = 0
    while (wi < words.length) {
      val syms = bpeApply(bpeInitSyms(UTF8String.fromString(words(wi))), lefts, rights)
      val n = syms.numElements()
      var i = 0
      while (i < n) {
        val v = ids.get(syms.getUTF8String(i).toString)
        b += (if (v == null) -1 else v.intValue())
        i += 1
      }
      wi += 1
    }
    b += eosId
    new org.apache.spark.sql.catalyst.util.GenericArrayData(b.result())
  }

  /** Bloom-filter bit positions of one gram fingerprint: k positions
    * by double hashing (h + i·splitmix64(h)|1) masked to the
    * power-of-two filter size — the standard Kirsch-Mitzenmacher
    * construction, deterministic for the oracle mirror.
    */
  def bloomPositions(h: Long, numHashes: Int, m: Int):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val h2 = splitmix64(h) | 1L
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      out(i) = (h + i * h2) & (m - 1)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Count how many of a doc's gram fingerprints fully hit the bloom
    * filter (all k bits set). `words` is the filter as packed 64-bit
    * words, length m/64 — a codegen reference object, so probing is a
    * pure in-loop bit test with zero per-row allocation.
    */
  def bloomCountHits(fps: org.apache.spark.sql.catalyst.util.ArrayData,
      words: Array[Long], numHashes: Int, m: Int): Int = {
    val n = fps.numElements()
    var hits = 0
    var j = 0
    while (j < n) {
      val h = fps.getLong(j)
      val h2 = splitmix64(h) | 1L
      var ok = true
      var i = 0
      while (ok && i < numHashes) {
        val pos = (h + i * h2) & (m - 1)
        if (((words((pos >>> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 0L) ok = false
        i += 1
      }
      if (ok) hits += 1
      j += 1
    }
    hits
  }

  /** Intersection size of two SORTED distinct long-fingerprint sets
    * (linear merge) — the asymmetric-similarity counterpart of
    * [[jaccardSortedFp]]: containment C(A→B) = common/|A| divides by
    * ONE side, so the caller needs the raw count.
    */
  def commonSortedFp(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var common = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { common += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    common
  }

  /** Sum of 1e12-scaled weight-vector entries over a doc's feature
    * bucket indices — the margin kernel of the logistic quality
    * classifier. Pure LONG arithmetic: weights are decimal(·,12)
    * values scaled to longs, so the sum is EXACT and
    * order-independent (|w|≤2e12 scaled × ≤10^3 buckets per doc stays
    * far under 2^63). The caller divides by 1e12 once.
    */
  def sumBucketWeights(buckets: org.apache.spark.sql.catalyst.util.ArrayData,
      w: Array[Long]): Long = {
    val n = buckets.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { acc += w(buckets.getLong(i).toInt); i += 1 }
    acc
  }

  /** Fused DSIR scoring kernel: one text scan computes the doc's gram
    * count and its importance weight against a CONSTANT-size hashed
    * LM — `lut(b)` is the per-bucket log-ratio term, decimal(·,12)
    * quantized and scaled to a long, for bucket b = pmod(fp,
    * lut.length). Replaces the explode → broadcast-join → per-doc
    * hash-aggregate scoring pass with pure in-scan arithmetic; the
    * long sum is EXACT and reproduces the former decimal-sum path
    * bit-for-bit (each term is the same BigDecimal.valueOf(double)
    * .setScale(12, HALF_UP) value the decimal cast produced; exact
    * decimal addition is order-independent). The accumulator is a
    * 128-bit two-long pair (wrapped low word + signed overflow carry),
    * so a book-length doc (~10⁵-10⁶ grams) at extreme log-ratios keeps
    * the decimal sum's unlimited headroom instead of aborting the job
    * the way a bare addExact would; the no-carry fast path is the same
    * single long sum as before, bit-identical. The final weight repeats
    * the old plan's epilogue exactly: decimal→double (correctly rounded
    * by BigDecimal.doubleValue) then round(·, 4) HALF_UP.
    */
  def gramLutSum(s: UTF8String, lut: Array[Long]): org.apache.spark.sql.catalyst.InternalRow = {
    val fps = gramFps(s)
    val n = fps.numElements()
    val m = lut.length.toLong
    var acc = 0L
    var carry = 0L // sum = carry·2⁶⁴ + acc (two's-complement low word)
    var i = 0
    while (i < n) {
      val fp = fps.getLong(i)
      val t = lut((((fp % m) + m) % m).toInt)
      val r = acc + t
      // signed-overflow test (Math.addExact's condition): on wrap, the
      // true sum moved ±2⁶⁴ relative to the wrapped low word
      if (((acc ^ r) & (t ^ r)) < 0L) carry += (if (t > 0L) 1L else -1L)
      acc = r
      i += 1
    }
    val unscaled =
      if (carry == 0L) java.math.BigDecimal.valueOf(acc, 12)
      else new java.math.BigDecimal(
        java.math.BigInteger.valueOf(carry).shiftLeft(64)
          .add(java.math.BigInteger.valueOf(acc)), 12)
    val w = unscaled.doubleValue()
    val w4 = java.math.BigDecimal.valueOf(w)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, w4))
  }

  /** 64-bit SimHash over whitespace-separated tokens: each token's
    * fnv1a64 votes ±1 on every bit; the sign of each bit-sum is the
    * fingerprint bit. Near-identical texts land within a small
    * hamming distance.
    */
  def simhash64(s: UTF8String): Long = {
    val votes = new Array[Int](64)
    val str = s.toString
    var start = 0
    var i = 0
    val n = str.length
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (i > start) {
          val h = fnv1a64(str.substring(start, i).getBytes("UTF-8"))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Per-expression-instance histogram conversion memo for the dynamic
  * freq_ordered_prefix: turns an array<struct<fp,cnt>> ArrayData into
  * key-sorted primitive long arrays (the binary-search contract holds
  * regardless of the SQL author's ordering) exactly once per task —
  * the memo key is the ArrayData INSTANCE, which a scalar subquery
  * reuses across every row it feeds. Tasks deserialize their own copy
  * (the transient slot starts empty per task); the single-reference
  * volatile write keeps a racing re-conversion benign.
  *
  * freq_ordered_prefix is registered as a GENERAL SQL function, so the
  * histogram argument is not guaranteed to be a scalar subquery: a
  * producer that reuses one ArrayData instance with MUTATED contents
  * across rows (unsafe-row buffer reuse) would alias the stale memo.
  * The hit check therefore also verifies cheap content witnesses —
  * element count plus the first/last struct's (fp, cnt) — which any
  * in-place mutation of a sorted histogram disturbs; a witness miss
  * just falls through to a fresh conversion (correct, merely uncached).
  */
final class FpHistCache extends Serializable {
  @transient @volatile
  private var memo: (AnyRef, Array[Long], Array[Long], Long, Long) = _

  private def witness(hist: org.apache.spark.sql.catalyst.util.ArrayData): (Long, Long) = {
    val n = hist.numElements()
    if (n == 0) (0L, 0L)
    else {
      val f = hist.getStruct(0, 2)
      val l = hist.getStruct(n - 1, 2)
      (f.getLong(0) * 31 + f.getLong(1), l.getLong(0) * 31 + l.getLong(1))
    }
  }

  def arrays(hist: org.apache.spark.sql.catalyst.util.ArrayData): (Array[Long], Array[Long]) = {
    val m = memo
    if (m != null && (m._1 eq hist) && m._2.length == hist.numElements() && {
      val w = witness(hist); w._1 == m._4 && w._2 == m._5
    }) (m._2, m._3)
    else {
      val n = hist.numElements()
      val ks = new Array[Long](n)
      val vs = new Array[Long](n)
      var i = 0
      while (i < n) {
        val s = hist.getStruct(i, 2)
        ks(i) = s.getLong(0)
        vs(i) = s.getLong(1)
        i += 1
      }
      val order = Array.range(0, n).sortBy(ks)
      val sk = order.map(ks)
      val sv = order.map(vs)
      val w = witness(hist)
      memo = (hist, sk, sv, w._1, w._2)
      (sk, sv)
    }
  }
}

/** Column API + per-session SQL registration for the graft functions
  * (expressions themselves live in org.apache.spark.sql.graftglue).
  */
object GraftFunctions {
  def fnv1a64(c: Column): Column = Bridge.column(Fnv1a64(Bridge.expression(c)))
  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))
  def minhashSig(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), numHashes))
  def minhashSigFp(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashSigFp(Bridge.expression(c), numHashes))
  def hyperplaneSig(c: Column, bits: Int, planeOffset: Int = 0): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(c), bits, planeOffset))
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
  def vecNorm(c: Column): Column = Bridge.column(VecNorm(Bridge.expression(c)))

  /** One-pass fixed-point vector moments (n, Σ⌊x·fp⌋, upper-triangle
    * Σ⌊xᵢxⱼ·fp⌋) — the scalable replacement for posexplode-then-sum
    * moment plans; exact and order-free like them.
    */
  def vecMomentsFp(vec: Column, fp: Double, dim: Int, outer: Boolean): Column =
    Bridge.column(org.apache.spark.sql.graftglue.VecMomentsFp(
      Bridge.expression(vec), fp, dim, outer).toAggregateExpression())
  def winnowMinMax(c: Column, n: Int): Column =
    Bridge.column(WinnowMinMax(Bridge.expression(c), n))
  def shingles(c: Column, k: Int): Column =
    Bridge.column(Shingles(Bridge.expression(c), k))
  def shinglesPos(c: Column, k: Int): Column =
    Bridge.column(ShinglesPos(Bridge.expression(c), k))
  def shingleFps(c: Column, k: Int): Column =
    Bridge.column(ShingleFps(Bridge.expression(c), k))
  def gramFps(c: Column): Column =
    Bridge.column(GramFps(Bridge.expression(c)))
  def matchedTermFps(c: Column, terms: Array[Long]): Column =
    Bridge.column(MatchedTermFps(Bridge.expression(c), terms))
  def charWindows(c: Column, l: Int): Column =
    Bridge.column(CharWindows(Bridge.expression(c), l))
  def charWindows(c: Column, l: Int, base: Long): Column =
    Bridge.column(CharWindows(Bridge.expression(c), l, base))
  def stripSpans(text: Column, positions: Column, l: Int): Column =
    Bridge.column(StripSpans(Bridge.expression(text), Bridge.expression(positions), l))
  def freqPrefix(fps: Column, keys: Array[Long], vals: Array[Long],
      threshold: Double): Column =
    Bridge.column(FreqOrderedPrefix(Bridge.expression(fps), keys, vals, threshold))
  def freqOrder(fps: Column, keys: Array[Long], vals: Array[Long]): Column =
    Bridge.column(FreqOrderAll(Bridge.expression(fps), keys, vals))
  def jaccardSortedFp(a: Column, b: Column): Column =
    Bridge.column(JaccardSortedFp(Bridge.expression(a), Bridge.expression(b)))
  def charEntropy(c: Column): Column = Bridge.column(CharEntropy(Bridge.expression(c)))
  def hashEmbed(c: Column, dim: Int): Column =
    Bridge.column(HashEmbed(Bridge.expression(c), dim))
  def matVecF(c: Column, mat: Array[Double], d: Int): Column =
    Bridge.column(MatVecF(Bridge.expression(c), mat, d))
  def sq8Encode(c: Column, mins: Array[Double], scales: Array[Double]): Column =
    Bridge.column(Sq8Encode(Bridge.expression(c), mins, scales))
  def sq8ReconNorm(c: Column, mins: Array[Double], scales: Array[Double]): Column =
    Bridge.column(Sq8ReconNorm(Bridge.expression(c), mins, scales))
  def sq8Adc(q: Column, codes: Column, mins: Array[Double], scales: Array[Double]): Column =
    Bridge.column(Sq8Adc(Bridge.expression(q), Bridge.expression(codes), mins, scales))
  def commonSortedFp(a: Column, b: Column): Column =
    Bridge.column(CommonSortedFp(Bridge.expression(a), Bridge.expression(b)))

  private def utf8(merges: Seq[(String, String)]): (Array[UTF8String], Array[UTF8String]) =
    (merges.map(m => UTF8String.fromString(m._1)).toArray,
      merges.map(m => UTF8String.fromString(m._2)).toArray)

  def bloomPositions(c: Column, numHashes: Int, m: Int): Column =
    Bridge.column(BloomPositions(Bridge.expression(c), numHashes, m))
  def gramLutSum(c: Column, lut: Array[Long]): Column =
    Bridge.column(GramLutSum(Bridge.expression(c), lut))
  def sumBucketWeights(c: Column, w: Array[Long]): Column =
    Bridge.column(SumBucketWeights(Bridge.expression(c), w))
  def bloomCountHits(c: Column, words: Array[Long], numHashes: Int, m: Int): Column =
    Bridge.column(BloomCountHits(Bridge.expression(c), words, numHashes, m))

  def bpeInitSyms(c: Column): Column =
    Bridge.column(BpeInitSyms(Bridge.expression(c)))
  def bpeApply(c: Column, merges: Seq[(String, String)]): Column = {
    val (l, r) = utf8(merges)
    Bridge.column(BpeApply(Bridge.expression(c), l, r))
  }
  def bpeTokenCount(c: Column, merges: Seq[(String, String)]): Column = {
    val (l, r) = utf8(merges)
    Bridge.column(BpeTokenCount(Bridge.expression(c), l, r))
  }
  def bpeEncodeIds(c: Column, merges: Seq[(String, String)],
      ids: java.util.HashMap[String, Integer], eosId: Int): Column = {
    val (l, r) = utf8(merges)
    Bridge.column(BpeEncodeIds(Bridge.expression(c), l, r, ids, eosId))
  }

  /** Approximate heavy hitters (SpaceSaving sketch aggregate). */
  def spaceSavingTopK(c: Column, k: Int, capacity: Int): Column =
    Bridge.column(org.apache.spark.sql.graftglue.SpaceSavingTopK(
      Bridge.expression(c), k, capacity).toAggregateExpression())

  /** Exact bounded-heap top-k aggregate: array<struct<score,id>> of
    * the k largest, (score desc, id asc) — no per-key sort.
    */
  def topKAgg(score: Column, id: Column, k: Int): Column =
    Bridge.column(org.apache.spark.sql.graftglue.TopKAgg(
      Bridge.expression(score), Bridge.expression(id), k).toAggregateExpression())

  /** The SQL-exposed kernel surface: (name, usage, builder) for every
    * graft function a /fetch user can call from SQL text. One table
    * drives BOTH registration paths — [[register]] (runtime, temp
    * functions) and [[graft.GraftExtensions]] (config-only,
    * spark.sql.extensions) — so the two surfaces can't drift.
    *
    * Literal parameters (k, dim, num…) are validated here at analysis
    * time: non-literal or out-of-range values raise AnalysisException
    * with the standard error classes, never an execution-time
    * ArithmeticException.
    */
  lazy val sqlBuilders: Seq[(String, String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    def arity(name: String, n: Int)(es: Seq[Expression]): Unit =
      if (es.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          Map("functionName" -> name, "expectedNum" -> n.toString,
            "actualNum" -> es.length.toString, "docroot" -> "https://spark.apache.org/docs/latest"))
    def fracLit(fn: String, param: String)(e: Expression): Double = e match {
      // SQL `0.5` parses as a DECIMAL literal; accept the numeric
      // literal forms a threshold argument realistically takes
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case Literal(v: Double, _) => v
      case Literal(v: Float, _) => v.toDouble
      case Literal(v: Int, _) => v.toDouble
      case Literal(v: Long, _) => v.toDouble
      case _ =>
        throw new org.apache.spark.sql.AnalysisException(
          "NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> fn, "paramName" -> param,
            "paramType" -> "numeric literal"))
    }
    def intLit(fn: String, param: String, min: Int)(e: Expression): Int = e match {
      case Literal(v: Int, _) if v >= min => v
      case Literal(v, _) =>
        throw new org.apache.spark.sql.AnalysisException(
          "INVALID_PARAMETER_VALUE.INTEGER",
          Map("parameter" -> param, "functionName" -> fn,
            "invalidValue" -> s"$v ($param must be >= $min)"))
      case _ =>
        throw new org.apache.spark.sql.AnalysisException(
          "NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> fn, "paramName" -> param,
            "paramType" -> s"INT literal >= $min"))
    }
    Seq(
      ("fnv1a64", "fnv1a64(str) - 64-bit FNV-1a fingerprint of a string",
        es => { arity("fnv1a64", 1)(es); Fnv1a64(es.head) }),
      ("simhash64", "simhash64(str) - 64-bit token-level SimHash of a string",
        es => { arity("simhash64", 1)(es); SimHash64(es.head) }),
      ("char_entropy", "char_entropy(str) - code-point Shannon entropy (nats)",
        es => { arity("char_entropy", 1)(es); CharEntropy(es.head) }),
      ("hash_embed", "hash_embed(str, dim) - feature-hashing bag-of-words float vector",
        es => { arity("hash_embed", 2)(es)
          HashEmbed(es.head, intLit("hash_embed", "dim", 1)(es(1))) }),
      ("shingles", "shingles(str, k) - distinct word-k-shingles of a string",
        es => { arity("shingles", 2)(es)
          Shingles(es.head, intLit("shingles", "k", 1)(es(1))) }),
      ("shingle_fps",
        "shingle_fps(str, k) - sorted distinct word-k-shingle fnv1a64 fingerprints (fused, allocation-free)",
        es => { arity("shingle_fps", 2)(es)
          ShingleFps(es.head, intLit("shingle_fps", "k", 1)(es(1))) }),
      ("gram_fps",
        "gram_fps(str) - fnv1a64 fingerprints of every unigram and adjacent bigram (fused, not deduplicated)",
        es => { arity("gram_fps", 1)(es); GramFps(es.head) }),
      ("minhash_sig", "minhash_sig(arr, num) - num-hash MinHash signature of a string array",
        es => { arity("minhash_sig", 2)(es)
          MinHashSig(es.head, intLit("minhash_sig", "num", 1)(es(1))) }),
      ("char_windows", "char_windows(str, l) - positional char-L-window rolling hashes",
        es => { arity("char_windows", 2)(es)
          CharWindows(es.head, intLit("char_windows", "l", 1)(es(1))) }),
      ("vec_dot", "vec_dot(a, b) - dot product of two float vectors (double accumulation)",
        es => { arity("vec_dot", 2)(es); VecDot(es.head, es(1)) }),
      ("vec_norm", "vec_norm(a) - L2 norm of a float vector (double accumulation)",
        es => { arity("vec_norm", 1)(es); VecNorm(es.head) }),
      ("jaccard_sorted_fp",
        "jaccard_sorted_fp(a, b) - Jaccard of two sorted long-fingerprint sets",
        es => { arity("jaccard_sorted_fp", 2)(es); JaccardSortedFp(es.head, es(1)) }),
      ("freq_ordered_prefix",
        "freq_ordered_prefix(fps, hist, threshold) - the n - ceil(threshold*n) + 1 rarest fps by (count, fp); counts from the array<struct<fp,cnt>> histogram (typically a scalar subquery), unseen fps count 0",
        es => { arity("freq_ordered_prefix", 3)(es)
          FreqOrderedPrefixDyn(es.head, es(1),
            fracLit("freq_ordered_prefix", "threshold")(es(2))) }),
      ("common_sorted_fp",
        "common_sorted_fp(a, b) - intersection size of two sorted long-fingerprint sets",
        es => { arity("common_sorted_fp", 2)(es); CommonSortedFp(es.head, es(1)) }),
      ("topk_agg",
        "topk_agg(score, id, k) - AGGREGATE: bounded-heap top-k array<struct<score,id>>, (score desc, id asc)",
        es => { arity("topk_agg", 3)(es)
          org.apache.spark.sql.graftglue.TopKAgg(es.head, es(1),
            intLit("topk_agg", "k", 1)(es(2))) }),
      ("spacesaving_topk",
        "spacesaving_topk(item, k, capacity) - AGGREGATE: SpaceSaving heavy hitters array<struct<item,cnt>>",
        es => { arity("spacesaving_topk", 3)(es)
          val k = intLit("spacesaving_topk", "k", 1)(es(1))
          org.apache.spark.sql.graftglue.SpaceSavingTopK(es.head, k,
            intLit("spacesaving_topk", "capacity", k)(es(2))) }),
      ("vec_moments_fp",
        "vec_moments_fp(vec, fp_bits, dim, outer) - AGGREGATE: one-pass 2^fp_bits fixed-point vector moments struct(n, s1, s2-upper-triangle)",
        es => { arity("vec_moments_fp", 4)(es)
          val fpBits = intLit("vec_moments_fp", "fp_bits", 1)(es(1))
          // 1L << n masks n to 6 bits in JVM semantics: fp_bits >= 63
          // would silently wrap to a negative/wrong scale — reject it
          // at analysis instead
          if (fpBits > 62)
            throw new org.apache.spark.sql.AnalysisException(
              "INVALID_PARAMETER_VALUE.INTEGER",
              Map("parameter" -> "fp_bits", "functionName" -> "vec_moments_fp",
                "invalidValue" -> s"$fpBits (fp_bits must be <= 62)"))
          org.apache.spark.sql.graftglue.VecMomentsFp(es.head,
            (1L << fpBits).toDouble,
            intLit("vec_moments_fp", "dim", 1)(es(2)),
            intLit("vec_moments_fp", "outer", 0)(es(3)) != 0) }),
    )
  }

  /** Make the full kernel surface usable from SQL text at runtime
    * (temp functions on this session; the config-only equivalent is
    * spark.sql.extensions=graft.GraftExtensions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (name, _, b) =>
      Bridge.registerFunction(spark, name, b)
    }
}
