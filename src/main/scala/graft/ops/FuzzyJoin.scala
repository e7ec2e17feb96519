package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (SURVEY.md §2.6 extension): all pairs of
  * rows whose strings are within Levenshtein distance `maxDist` — the
  * fuzzy-key join behind entity resolution, typo-tolerant dedup, and
  * crawl-URL/title reconciliation.
  *
  * Never all-pairs: candidates come from LOSSLESS q-gram prefix-filter
  * blocking (the Ed-Join scheme, Xiao et al., VLDB 2008):
  *
  *  - One edit operation disturbs at most `q` of a string's positional
  *    q-grams, so strings within distance k share all but ≤ q·k grams —
  *    by the pigeonhole principle, ANY (q·k+1)-subset of one string's
  *    gram set intersects the other's gram set. Fixing one global total
  *    order over grams and taking each string's FIRST q·k+1 grams in that
  *    order ("the signature") therefore guarantees two matching strings
  *    share ≥ 1 signature gram. Ordering by ascending document frequency
  *    makes signatures prefer RARE grams, which is what keeps blocks
  *    small — but correctness needs only a fixed order, not a good one.
  *  - The theorem needs the pair's required overlap to be ≥ 1, which
  *    fails when BOTH strings own ≤ q·k grams (k edits can then destroy
  *    every gram — e.g. "abcdefgh" at q=3, k=2). All such strings
  *    (len ≤ q·k + q − 1) therefore additionally enter a short-string
  *    pool, banded by ⌊len/(k+1)⌋ with each string emitting its own and
  *    the previous band — bands differ by ≤ 1 whenever lengths differ by
  *    ≤ k, so no short-short pair escapes; short-long pairs have a
  *    long side with > q·k grams, which restores the theorem (the short
  *    side keeps ALL its grams as signature, longer than its required
  *    prefix).
  *  - Candidates then pass the length filter (|len₁−len₂| ≤ k) and exact
  *    `levenshtein(s₁, s₂, k)` verification (the threshold form stops
  *    early once a row of the DP matrix exceeds k).
  *
  * Execution shape (the 100 TB rationale): gram document frequencies are
  * a partial-aggregable `groupBy(gram).count` joined back to the gram
  * table (an AQE equi-join — the vocabulary is corpus-sized web text, so
  * NO driver-side collect); per-string ranking is a window bounded by the
  * string's own gram count; candidate generation is an equi-join on the
  * signature token. Rare-gram signatures keep token blocks small by
  * construction; the one deliberately shared block is the short-string
  * pool, which is bounded by the distinct-short-string universe
  * (alphabet^(q·k+q−1)) — run exact dedup first if your corpus holds
  * millions of COPIES of the same short string, since those pairs are
  * quadratic in the OUTPUT, not an artifact of the blocking.
  */
object FuzzyJoin {

  /** All pairs `(id_1, id_2, dist)` with `id_1 < id_2` and
    * `levenshtein(str_1, str_2) = dist ≤ maxDist`. Null strings drop.
    * `q` is the gram width (default 3); any `q ≥ 2` is correct — larger
    * q means rarer grams but longer signatures (q·maxDist+1). */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                       maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0, s"maxDist must be ≥ 0, got $maxDist")
    require(q >= 2, s"q must be ≥ 2, got $q")
    val sigLen = q * maxDist + 1
    // id keeps its input type (only < / = / join-key use — see
    // jaccardJoin's note on the silent-drop hazard of a long cast)
    val strs = df.select(col(idCol).as("__id"),
        col(strCol).as("__s"))
      .filter(col("__s").isNotNull && col("__id").isNotNull)
      .withColumn("__len", length(col("__s")))
    // distinct positional-content q-grams per string (set semantics — the
    // prefix theorem is stated over gram sets)
    val grams = strs.filter(col("__len") >= q)
      .select(col("__id"), explode(array_distinct(
        expr(s"transform(sequence(1, __len - ${q - 1}), i -> substring(__s, i, $q))")))
        .as("__g"))
    val dfCounts = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    val ranked = grams.join(dfCounts, "__g")
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__df"), col("__g"))))
      .filter(col("__rk") <= sigLen)
      .select(col("__id"), col("__g").as("__tok"))
    // short-string pool: every string with ≤ q·maxDist grams (incl. all
    // gramless ones) — the regime where the prefix theorem gives no
    // guarantee between two pool members
    val shortMax = q * maxDist + q - 1
    val band = floor(col("__len") / (maxDist + 1)).cast("long")
    val shorts = strs.filter(col("__len") <= shortMax)
      .select(col("__id"), explode(array(
        concat(lit("#s:"), band),
        concat(lit("#s:"), band - 1))).as("__tok"))
    // tokens carry their string: the candidate join then verifies INLINE
    // in the join stage, so raw candidate pairs (quadratic in the block
    // size on low-vocabulary corpora) never cross an exchange — only
    // verified true pairs reach the final distinct. The alternative
    // (distinct the id pairs, then join strings back twice) shuffles the
    // full candidate set three times; a duplicate candidate here costs
    // one extra bounded-DP verification instead, the far cheaper side at
    // every scale. `levenshtein(s1, s2, k)` early-exits at k+1.
    val tokens = ranked.unionByName(shorts)
      .join(strs, "__id")
      .select(col("__tok"), col("__id"), col("__s"), col("__len"))
    val a = tokens.toDF("__tok", "__id1", "__s1", "__l1")
    val b = tokens.toDF("__tok", "__id2", "__s2", "__l2")
    a.join(b, Seq("__tok"))
      .filter(col("__id1") < col("__id2") &&
        abs(col("__l1") - col("__l2")) <= maxDist)
      .withColumn("dist", expr(s"levenshtein(__s1, __s2, $maxDist)"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("__id1").as("id_1"), col("__id2").as("id_2"), col("dist"))
      .distinct()
  }

  /** EXACT token-set Jaccard similarity join (AllPairs/PPJoin family,
    * Bayardo et al., WWW 2007): all pairs `(id_1, id_2, j)` with
    * `id_1 < id_2` and Jaccard(tokens₁, tokens₂) = j ≥ `threshold` —
    * the lossless counterpart of MinHash near-dup (no probabilistic
    * recall shed; use this when missing a true pair is not acceptable,
    * MinHash when the corpus is too hot for exact verification).
    *
    * Never all-pairs. For J(x,y) ≥ t the overlap i satisfies
    * i ≥ t·(|x|+|y|)/(1+t) ≥ t·max(|x|,|y|) (since t ≤ 1), so with one
    * fixed global token order, the (s − ⌈t·s⌉ + 1)-prefix of EACH set
    * must contribute at least one shared token (prefix-filter lemma) —
    * candidates are an equi-join on prefix tokens only. Ordering tokens
    * by ascending document frequency makes prefixes prefer RARE tokens
    * (small blocks); correctness needs only a fixed order. Candidates
    * then pass the size filter (⌈t·s₁⌉ ≤ s₂ when s₁ ≤ s₂) and exact
    * `array_intersect` verification INLINE in the join stage — raw
    * candidates never cross an exchange (the editDistanceJoin argument).
    *
    * Tokens are lowercased whitespace words, set semantics
    * (`foldCase = false` keeps raw case-sensitive tokens — the
    * [[graft.expressions.Kernels.minhashSig]] convention, used by
    * [[graft.ops.Dedup.lshRecallAudit]] so ground truth and the audited
    * LSH path measure the SAME similarity). Docs with zero tokens drop
    * (Jaccard over an empty set is undefined here — run
    * [[graft.ops.Dedup.distinctKeys]]-style exact dedup for those).
    *
    * Scale: DF counts are partial-aggregable and AQE-joined (web vocab
    * is corpus-sized — no driver collect); the per-doc rank window is
    * bounded by the doc's own token count; verification is per-pair
    * intersection on two already-present arrays. */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
                  threshold: Double, foldCase: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val src = if (foldCase) lower(col(textCol)) else col(textCol)
    // id keeps its input type (only < / = / join-key use): a long cast
    // would null non-numeric ids and silently drop their rows
    val sets = df.select(col(idCol).as("__id"),
        filter(array_distinct(split(src, "\\s+")),
          t => length(t) > 0).as("__tok"))
      .filter(col("__id").isNotNull && size(col("__tok")) > 0)
      .withColumn("__sz", size(col("__tok")))
    val toks = sets.select(col("__id"), col("__sz"),
      explode(col("__tok")).as("__t"))
    val dfCounts = toks.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    // prefix length s − ⌈t·s⌉ + 1 in ascending-DF order
    val prefix = toks.join(dfCounts, "__t")
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__df"), col("__t"))))
      .filter(col("__rk") <= col("__sz") - ceil(lit(threshold) * col("__sz")) + 1)
      .select(col("__id"), col("__t"))
    val carrying = prefix.join(sets, "__id")
    val a = carrying.toDF("__id1", "__t", "__tok1", "__s1")
    val b = carrying.toDF("__id2", "__t", "__tok2", "__s2")
    a.join(b, Seq("__t"))
      .filter(col("__id1") < col("__id2") &&
        // size filter: t·max ≤ i ≤ min ⇒ ⌈t·smax⌉ ≤ smin
        ceil(lit(threshold) * greatest(col("__s1"), col("__s2"))) <=
          least(col("__s1"), col("__s2")))
      .withColumn("__i", size(array_intersect(col("__tok1"), col("__tok2"))))
      .withColumn("j", col("__i").cast("double") /
        (col("__s1") + col("__s2") - col("__i")))
      .filter(col("j") >= threshold)
      .select(col("__id1").as("id_1"), col("__id2").as("id_2"), col("j"))
      .distinct()
  }
}
