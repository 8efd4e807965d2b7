package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.UnaryStringExpression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis kernels for the LLM-data-pipeline operators (builder
  * brief: dedup fingerprints, language ID, document hashing). All
  * deterministic, dependency-free, and called from codegen'd
  * expressions — the hot path stays inside whole-stage codegen.
  *
  * Algorithms are textbook/public: FNV-1a 64-bit hashing, SimHash
  * (Charikar 2002), winnowing fingerprints (Schleimer/Wilkerson/Aiken
  * SIGMOD 2003), stopword-profile language guessing.
  */
object TextOps {

  def fnv1a64(s: CharSequence): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  // Locale.ROOT: locale-independent lowercase, matching Spark's
  // lower() and the DuckDB oracle (a tr_TR default locale would
  // otherwise map I→ı and diverge per-executor)
  private def tokenize(s: String): Array[String] =
    s.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  /** 64-bit SimHash over whitespace tokens: per-bit vote of each
    * token's FNV-1a hash; near-duplicate docs land within a small
    * hamming distance. */
  def simhash64(s: UTF8String): Long = {
    val toks = tokenize(s.toString)
    val acc = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = fnv1a64(toks(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      t += 1
    }
    var res = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) res |= (1L << b)
      b += 1
    }
    res
  }

  /** Winnowing fingerprints: rolling FNV-1a over char k-grams, minimum
    * per sliding window of `w` hashes (rightmost min on ties —
    * standard winnowing), distinct + sorted for set semantics. Short
    * docs (< k chars) fingerprint to the whole-text hash. */
  def fingerprints(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    if (str.length < k)
      return new GenericArrayData(Array(fnv1a64(str)))
    val n = str.length - k + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) { hashes(i) = fnv1a64(str.subSequence(i, i + k)); i += 1 }
    val picks = scala.collection.mutable.SortedSet.empty[Long]
    val win = math.min(w, n)
    var start = 0
    while (start <= n - win) {
      var minIdx = start
      var j = start + 1
      while (j < start + win) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j
        j += 1
      }
      picks += hashes(minIdx)
      start += 1
    }
    new GenericArrayData(picks.toArray)
  }

  // Stopword profiles: ~15 highest-frequency function words per
  // language. Tiny on purpose — this is a heuristic classifier for
  // pipeline routing, not a linguistics model.
  private val profiles: Array[(String, Set[String])] = Array(
    "en" -> Set("the", "a", "and", "of", "to", "in", "is", "it", "you",
      "that", "for", "on", "are", "with", "as"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ich", "du",
      "mit", "für", "auf", "ein", "eine", "zu", "den"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "je", "tu",
      "pour", "dans", "que", "ne", "pas", "sur"),
    "es" -> Set("el", "los", "las", "y", "es", "en", "no", "por", "con",
      "para", "se", "del", "su", "al", "como"))

  /** Word w-shingles in one pass (lowercase, whitespace split, w-grams
    * space-joined; fewer than w tokens → empty). The higher-order-
    * function formulation re-evaluated the token split per lambda call
    * (O(tokens²) string work — 20s of the round-2 bench); this kernel
    * is O(chars). */
  def wordShingles(s: UTF8String, w: Int): GenericArrayData = {
    val toks = tokenize(s.toString)
    if (toks.length < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - w + 1)
    var i = 0
    while (i <= toks.length - w) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  // Affine minhash family g_j(h) = A(j)*h + B(j) over the murmur base
  // hash (wraparound int arithmetic — standard hashing-trick family).
  // Constants from splitmix32 so they are deterministic and odd.
  private val MaxMinhashFns = 512
  private val mhA, mhB = new Array[Int](MaxMinhashFns)
  locally {
    var x = 0x9E3779B9
    def next(): Int = {
      x += 0x9E3779B9
      var z = x
      z = (z ^ (z >>> 16)) * 0x85EBCA6B
      z = (z ^ (z >>> 13)) * 0xC2B2AE35
      z ^ (z >>> 16)
    }
    var i = 0
    while (i < MaxMinhashFns) {
      mhA(i) = next() | 1 // odd multiplier → bijective mod 2^32
      mhB(i) = next()
      i += 1
    }
  }

  /** MinHash signature in ONE pass: murmur-hash each shingle once,
    * then k affine derivations — O(shingles × k) int ops instead of k
    * full string-hash passes (the 64-transform builtin formulation was
    * the round's bench bottleneck: 30s → ~1s at sf0.1). Empty input →
    * null (callers filter empty shingle sets). */
  def minhashSig(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int): GenericArrayData = {
    require(numHashes <= MaxMinhashFns, s"numHashes must be <= $MaxMinhashFns")
    val n = arr.numElements()
    if (n == 0) return null
    val sig = new Array[Int](numHashes)
    java.util.Arrays.fill(sig, Int.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getUTF8String(i).hashCode // murmur3 over the bytes
      var j = 0
      while (j < numHashes) {
        val g = mhA(j) * h + mhB(j)
        if (g < sig(j)) sig(j) = g
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Heuristic language ID: CJK char ratio → "zh"; otherwise the
    * stopword profile with the highest hit ratio (first profile wins
    * ties); "und" when nothing matches. */
  def langId(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.isEmpty) return UTF8String.fromString("und")
    var cjk = 0
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if ((c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF)) cjk += 1
      i += 1
    }
    if (cjk.toDouble / str.length > 0.2) return UTF8String.fromString("zh")
    val toks = tokenize(str)
    if (toks.isEmpty) return UTF8String.fromString("und")
    var best = "und"
    var bestHits = 0
    var p = 0
    while (p < profiles.length) {
      val (lang, words) = profiles(p)
      var hits = 0
      var t = 0
      while (t < toks.length) { if (words.contains(toks(t))) hits += 1; t += 1 }
      if (hits > bestHits) { best = lang; bestHits = hits }
      p += 1
    }
    UTF8String.fromString(best)
  }

  /** Canonical NFC normalization (é as one codepoint, not e +
    * combining accent) — run FIRST in cleaning pipelines so
    * hash-based dedup sees one byte form per grapheme. */
  def nfcNormalize(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** Accent stripping: NFD-decompose, drop non-spacing marks,
    * recompose to NFC ("café" → "cafe") — matches the utf8proc
    * convention DuckDB's strip_accents exposes. Iterates CODE POINTS,
    * not UTF-16 units, so supplementary-plane combining marks strip
    * too (surrogate halves never classify as Mn). */
  def stripAccents(s: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC))
  }

  /** Char-bigram LM scoring kernel (see [[CharBigramLmScore]]): walk
    * the text's CODEPOINT bigrams IN POSITION ORDER, summing ln-probs
    * sequentially (order fixed → engine-reproducible double).
    * Codepoints — not UTF-16 units — so the units agree with the
    * Spark-side `substring` fit, and with DuckDB `substr`, on astral
    * text too. Degenerate input (< 2 codepoints → no bigrams) returns
    * `(0, unseenLnp)` — the worst score, which is what a quality
    * filter should assign a sub-2-char document — never NaN or a
    * negative count. */
  def charBigramLmScore(s: UTF8String,
      model: java.util.HashMap[String, java.lang.Double], unseenLnp: Double)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val t = s.toString
    var acc = 0.0
    var n = 0L
    var prev = 0 // UTF-16 index of the previous codepoint's start
    var i = Character.charCount(if (t.isEmpty) 'x' else t.codePointAt(0))
    while (i < t.length) {
      val next = i + Character.charCount(t.codePointAt(i))
      val p = model.get(t.substring(prev, next))
      acc += (if (p == null) unseenLnp else p.doubleValue())
      n += 1
      prev = i
      i = next
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      if (n == 0L) Array[Any](0L, unseenLnp)
      else Array[Any](n, acc / n.toDouble))
  }

  /** Word n-gram LM scoring kernel with STUPID BACKOFF (Brants et al.,
    * "Large Language Models in Machine Translation", EMNLP 2007 — the
    * web-scale backoff that skips discounting): walk the document's
    * whitespace tokens IN POSITION ORDER; token i scores
    *   - trigram  c(w₋₂w₋₁w)/c(w₋₂w₋₁)            when the trigram survived pruning,
    *   - else     α · c(w₋₁w)/c(w₋₁)              when the bigram survived,
    *   - else     α·α · c(w)/N                    (unigram; α·α COMPUTED, not 0.16 —
    *                                               the IEEE product is not the nearest
    *                                               double to 0.16),
    * with the shorter chains at positions 1–2, and `unseenLnp` when
    * even the unigram is absent (streaming text; the batch
    * fit-on-what-you-score path always finds it). Each term is ONE
    * double division (exact longs), one optional multiply by α, one
    * ln — mirrored operation-for-operation by the DuckDB twin; the
    * fold order is the position order, so the double sum is
    * partitioning-independent. Returns (n_tokens, mean_lnS); empty
    * docs → (0, unseenLnp), never NaN. */
  def wordLmScore(s: UTF8String,
      uni: java.util.HashMap[String, java.lang.Long],
      bi: java.util.HashMap[String, java.lang.Long],
      tri: java.util.HashMap[String, java.lang.Long],
      total: Long, alpha: Double, unseenLnp: Double)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokenize(s.toString)
    val a2 = alpha * alpha
    var acc = 0.0
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      val cu = uni.get(w)
      val lnS: Double =
        if (i == 0) {
          if (cu == null) unseenLnp
          else math.log(cu.longValue().toDouble / total.toDouble)
        } else {
          val w1 = toks(i - 1)
          val cb = bi.get(w1 + " " + w)
          val ct = if (i >= 2) tri.get(toks(i - 2) + " " + w1 + " " + w)
            else null
          if (ct != null) {
            val ctx = bi.get(toks(i - 2) + " " + w1)
            // pruning invariant (minCountBi <= minCountTri) guarantees
            // the context bigram survived whenever the trigram did
            math.log(ct.longValue().toDouble / ctx.longValue().toDouble)
          } else if (cb != null) {
            val r = cb.longValue().toDouble / uni.get(w1).longValue().toDouble
            if (i >= 2) math.log(alpha * r) else math.log(r)
          } else if (cu != null) {
            val r = cu.longValue().toDouble / total.toDouble
            if (i >= 2) math.log(a2 * r) else math.log(alpha * r)
          } else unseenLnp
        }
      acc += lnS
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      if (toks.length == 0) Array[Any](0L, unseenLnp)
      else Array[Any](toks.length.toLong, acc / toks.length.toDouble))
  }

  /** Greedy lowest-rank-first BPE segmentation of one document against
    * a trained merge-rank table (the GPT-2 `bpe()` application order):
    * whitespace-tokenize (lowercased, like [[tokenize]]), split each
    * word into CODEPOINT symbols, then repeatedly merge every
    * occurrence of the lowest-ranked adjacent pair present — the same
    * all-occurrences order the trainer used, so in-vocabulary words
    * reproduce their training segmentation. `ranks` keys are
    * space-joined pairs ("l o") → merge priority (0 = learned first). */
  def bpeSegment(s: UTF8String,
      ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val words = tokenize(s.toString)
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var w = 0
    while (w < words.length) {
      var parts: Array[String] = {
        val cps = words(w).codePoints().toArray
        cps.map(cp => new String(Character.toChars(cp)))
      }
      var done = parts.length < 2
      while (!done) {
        var bestIdx = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < parts.length - 1) {
          val r = ranks.get(parts(i) + " " + parts(i + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestIdx = i
          }
          i += 1
        }
        if (bestIdx < 0) done = true
        else {
          val a = parts(bestIdx)
          val b = parts(bestIdx + 1)
          val merged = scala.collection.mutable.ArrayBuffer[String]()
          var j = 0
          while (j < parts.length) {
            if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
              merged += a + b; j += 2
            } else { merged += parts(j); j += 1 }
          }
          parts = merged.toArray
          done = parts.length < 2
        }
      }
      var p = 0
      while (p < parts.length) {
        out += UTF8String.fromString(parts(p)); p += 1
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** simhash64(text): bigint — SimHash document signature. */
/** char_bigram_lm(text): struct<n_bigrams, mean_lnp> — ordered
  * sequential fold of per-bigram ln-probabilities against an embedded
  * model map (reference object, like the centroid matrices): the
  * accumulation order is the text's position order, so the double
  * result is partitioning-independent. Codepoint units (matches the
  * Spark/DuckDB `substring` fit on astral text). Bigrams absent from
  * the model contribute `unseenLnp` (streaming batches meet unseen
  * bigrams; the batch fit-on-what-you-score path never does); texts
  * with no bigrams score `(0, unseenLnp)`, never NaN. */
case class CharBigramLmScore(child: Expression,
    model: java.util.HashMap[String, java.lang.Double], unseenLnp: Double)
    extends UnaryStringExpression {
  require(!model.isEmpty, "bigram model must be non-empty")
  // doGenCode interpolates unseenLnp as a Java literal; -Infinity/NaN
  // would emit uncompilable source (silent interpreted fallback at
  // best) — and a non-finite floor is a model-fit bug anyway
  require(java.lang.Double.isFinite(unseenLnp),
    s"unseenLnp must be finite, got $unseenLnp")
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("mean_lnp", DoubleType, nullable = false)))
  override def nullSafeEval(s: Any): Any =
    TextOps.charBigramLmScore(s.asInstanceOf[UTF8String], model, unseenLnp)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("model", model, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextOps.charBigramLmScore($s, $ref, $unseenLnp)")
  }
  override def prettyName: String = "char_bigram_lm"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** word_lm(text): struct<n_tokens, mean_lnp> — ordered sequential fold
  * of per-token stupid-backoff ln-scores against embedded pruned count
  * maps (reference objects, like the char-bigram model): accumulation
  * order is the token position order, so the double result is
  * partitioning-independent. See [[TextOps.wordLmScore]]. */
case class WordLmScore(child: Expression,
    uni: java.util.HashMap[String, java.lang.Long],
    bi: java.util.HashMap[String, java.lang.Long],
    tri: java.util.HashMap[String, java.lang.Long],
    total: Long, alpha: Double, unseenLnp: Double)
    extends UnaryStringExpression {
  require(!uni.isEmpty, "unigram table must be non-empty")
  require(total > 0L, "total token count must be positive")
  require(alpha > 0.0 && alpha < 1.0, "backoff alpha in (0,1)")
  // both doubles are interpolated as Java literals in doGenCode
  require(java.lang.Double.isFinite(unseenLnp),
    s"unseenLnp must be finite, got $unseenLnp")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("mean_lnp", DoubleType, nullable = false)))
  override def nullSafeEval(s: Any): Any =
    TextOps.wordLmScore(s.asInstanceOf[UTF8String], uni, bi, tri, total,
      alpha, unseenLnp)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val uniRef = ctx.addReferenceObj("uni", uni, "java.util.HashMap")
    val biRef = ctx.addReferenceObj("bi", bi, "java.util.HashMap")
    val triRef = ctx.addReferenceObj("tri", tri, "java.util.HashMap")
    defineCodeGen(ctx, ev, s => s"graft.functions.TextOps.wordLmScore(" +
      s"$s, $uniRef, $biRef, $triRef, ${total}L, $alpha, $unseenLnp)")
  }
  override def prettyName: String = "word_lm"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class SimHash64(child: Expression) extends UnaryStringExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    TextOps.simhash64(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextOps.simhash64($s)")
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** fingerprints(text): array<bigint> — winnowing fingerprint set
  * (k-gram size and window are compile-time parameters). */
case class Fingerprints(child: Expression, k: Int = 9, window: Int = 4)
    extends UnaryStringExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextOps.fingerprints(s.asInstanceOf[UTF8String], k, window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextOps.fingerprints($s, $k, $window)")
  override def prettyName: String = "fingerprints"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** word_shingles(text): array<string> — one-pass w-gram shingling. */
case class WordShingles(child: Expression, width: Int)
    extends UnaryStringExpression {
  require(width >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextOps.wordShingles(s.asInstanceOf[UTF8String], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextOps.wordShingles($s, $width)")
  override def prettyName: String = "word_shingles"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** minhash_sig(shingles): array<int> — one-pass MinHash signature over
  * a string array (k is a compile-time parameter). Null on null or
  * empty input. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.graftglue.UnaryStringArrayExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // empty input → null signature even when the child is non-nullable;
  // without this override codegen would assign to an undeclared isNull
  // and the optimizer would fold IsNotNull(sig) to true
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    TextOps.minhashSig(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.TextOps.minhashSig($a, $numHashes);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
    code
  }
  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** nfc_normalize(text): string — canonical Unicode NFC form. */
case class NfcNormalize(child: Expression) extends UnaryStringExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextOps.nfcNormalize(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextOps.nfcNormalize($s)")
  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** strip_accents(text): string — drop combining marks, recompose. */
case class StripAccents(child: Expression) extends UnaryStringExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextOps.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextOps.stripAccents($s)")
  override def prettyName: String = "strip_accents"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** lang_id(text): string — heuristic language guess (en/de/fr/es/zh/und). */
case class LangId(child: Expression) extends UnaryStringExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextOps.langId(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextOps.langId($s)")
  override def prettyName: String = "lang_id"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** bpe_segment(text): array<string> — subword segmentation against a
  * TRAINED merge table (see
  * [[graft.operators.TextAnalysis.trainBpeMerges]]); the rank table
  * rides along as a reference object like the LM model and centroid
  * matrices, so the per-row walk stays inside whole-stage codegen. */
case class BpeSegment(child: Expression,
    ranks: java.util.HashMap[String, Integer])
    extends UnaryStringExpression {
  require(!ranks.isEmpty, "merge-rank table must be non-empty")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextOps.bpeSegment(s.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextOps.bpeSegment($s, $ref)")
  }
  override def prettyName: String = "bpe_segment"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
