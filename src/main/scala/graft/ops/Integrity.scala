package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-level integrity checks (SURVEY.md §2.6 extension) — the
  * cross-row / cross-table complement of the row-level validator
  * catalogue: foreign-key orphans, duplicate-key violations, and a
  * one-row integrity summary. These are the checks a curation pipeline
  * runs over its OWN outputs (does every chunk still reference a
  * surviving document? did dedup leave the id column unique?).
  *
  * Execution shape: [[fkOrphans]] is one left-anti equi-join on the key
  * (the parent side is key-distinct-projected first, so the join builds
  * on unique keys; AQE broadcasts dimension-sized parents). [[dupKeys]]
  * is one partial-aggregable `groupBy(key).count` HAVING > 1 — the
  * violating-key list, delta-sized output. Both read each input once.
  */
object Integrity {

  /** Child rows whose key has NO match in `parent` — FK violations,
    * full child rows preserved for quarantine. `parentKeys` names the
    * parent's key columns when they differ from the child's (positional
    * correspondence; defaults to `keys`). SQL semantics: a child row
    * with any NULL key component never matches and therefore IS an
    * orphan (pass `ignoreNullKeys = true` to exempt nullable FKs, the
    * SQL-standard MATCH SIMPLE reading). */
  def fkOrphans(child: DataFrame, parent: DataFrame, keys: Seq[String],
                parentKeys: Seq[String] = Seq.empty,
                ignoreNullKeys: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "fkOrphans needs at least one key column")
    val pk = if (parentKeys.isEmpty) keys else parentKeys
    require(pk.size == keys.size, "parentKeys must pair up with keys")
    val parentSide = parent.select(pk.zip(keys).map { case (p, c) =>
      col(p).as(c) }: _*).dropDuplicates()
    val orphans = child.join(parentSide, keys, "left_anti")
    if (ignoreNullKeys) orphans.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    else orphans
  }

  /** Keys appearing more than once: `(keys..., n)` with n ≥ 2 — the
    * uniqueness-violation report (empty means the constraint holds).
    * Null keys group together per SQL GROUP BY. */
  def dupKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "dupKeys needs at least one key column")
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
  }

  /** One-row table summary against a parent: row count, distinct keys,
    * null-key rows, orphan rows, duplicate-key groups — the integrity
    * dashboard line. Two joins + two aggregates, all partial-aggregable
    * or delta-sized. */
  def summary(child: DataFrame, parent: DataFrame, keys: Seq[String],
              parentKeys: Seq[String] = Seq.empty): DataFrame = {
    val keyNull = keys.map(col(_).isNull).reduce(_ || _)
    // COUNT(DISTINCT k1, k2, ...) — standard SQL semantics (rows with any
    // null key component excluded), NOT count_distinct(struct(...)),
    // which would count the null key as its own distinct value
    val base = child.agg(
      count(lit(1)).as("n_rows"),
      count_distinct(keys.map(col).head, keys.map(col).tail: _*).as("n_distinct_keys"),
      sum(when(keyNull, 1L).otherwise(0L)).as("n_null_keys"))
    val orphans = fkOrphans(child, parent, keys, parentKeys, ignoreNullKeys = true)
      .agg(count(lit(1)).as("n_orphans"))
    val dups = dupKeys(df = child, keys = keys).agg(count(lit(1)).as("n_dup_keys"))
    base.crossJoin(orphans).crossJoin(dups)
  }

  /** Join-skew diagnosis: the `topN` heaviest keys with their row count
    * and corpus share (1e-6 floor-rounded) — the report you run BEFORE a
    * big join to decide between plain, salted ([[Layout.saltedJoin]]), or
    * AQE-skew-trusted execution, and the evidence row a pipeline logs when
    * a stage straggles. Null keys count as a key (they hash to one reducer
    * too — the most common skew culprit).
    *
    * Scale: ONE partial-aggregable count exchange keyed by the key
    * columns, then a GLOBAL top-N — Spark plans `orderBy.limit` as
    * `TakeOrderedAndProject`, each map task keeping only its local top-N
    * (no window, no second full shuffle); the total-row count rides as a
    * broadcast single-row aggregate off the same counted frame. */
  def skewReport(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
    val total = broadcast(counts.agg(sum(col("cnt")).as("__total")))
    counts.crossJoin(total)
      .withColumn("share",
        floor(col("cnt") / col("__total") * 1e6) / 1e6)
      .drop("__total")
      .orderBy(col("cnt").desc +: keys.map(k => col(k).asc_nulls_first): _*)
      .limit(topN)
  }

  /** Expected Benford first-digit frequencies `log10(1 + 1/d)`, pinned to
    * the 1e-6 grid ONCE here — both the Spark plan and any SQL mirror take
    * these as literals, so no engine's `log10` is ever in the data path. */
  val benfordExpected: Map[Int, Double] = (1 to 9).map(d =>
    d -> math.floor(math.log10(1 + 1.0 / d) * 1e6 + 0.5) / 1e6).toMap

  /** Benford's-law conformity check over a numeric column — the classic
    * fabricated-or-truncated-data screen for naturally-occurring amounts
    * (transaction totals, populations, file sizes; Benford 1938, Nigrini's
    * audit formulation). Reports, per first significant digit 1–9:
    * observed count, observed frequency, the expected Benford frequency,
    * and the whole-column MAD (mean absolute deviation of the nine
    * frequency gaps — Nigrini's conformity statistic; ≲0.006 is "close
    * conformity" for large n, ≳0.015 is nonconformity).
    *
    * First-digit extraction is EXACT and engine-portable: the value is
    * grid-scaled to an integer (`floor(|x|·1e6 + 0.5)`, so inputs must be
    * < ~9.2e12 in magnitude — amounts, not astronomy) and the digit is the
    * first character of that integer's decimal rendering — BIGINT
    * formatting is identical everywhere, where double formatting and
    * `log10`-based digit math are not (`log10(1000) = 2.9999…` class
    * bugs). Zero and null values are excluded (Benford is defined on
    * nonzero magnitudes); digits with no observations report n = 0.
    *
    * Scale: one map-side digit projection + a 9-group partial aggregate;
    * the frequency/MAD windows run over the 9-row result. */
  def benfordCheck(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scaled = floor(abs(col(valueCol).cast("double")) * 1e6 + lit(0.5))
      .cast("long")
    val counts = df
      .filter(col(valueCol).isNotNull && scaled > 0)
      .select(substring(scaled.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val all = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val expected = (1 to 9).foldLeft(when(lit(false), 0.0)) {
      (acc, d) => acc.when(col("digit") === d, lit(benfordExpected(d)))
    }
    val w9 = Window.partitionBy(lit(1))
    all.join(counts, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("expected", expected)
      .withColumn("__total", sum(col("n")).over(w9))
      .withColumn("freq", when(col("__total") === 0, 0.0)
        .otherwise(floor(col("n") / col("__total") * 1e6 + lit(0.5)) / 1e6))
      .withColumn("mad",
        floor(avg(abs(col("freq") - col("expected"))).over(w9) * 1e6 + lit(0.5)) / 1e6)
      .select(col("digit"), col("n"), col("freq"), col("expected"), col("mad"))
  }

  /** Functional-dependency violation checker — LHS values that map to
    * MORE THAN ONE distinct RHS ("one order key, two order dates" is a
    * merge bug; "one canonical URL, two domains" is a parser bug).
    * Emits one row per violating LHS group: the LHS columns,
    * `n_distinct_rhs`, and `n_rows`. Null RHS counts as a value of its
    * own (a key mapping to both X and NULL IS two versions); null LHS
    * rows drop (no key to check).
    *
    * Scale shape: one partial-aggregable exchange on (LHS ++ RHS) to
    * collapse duplicates, then one on LHS — both map-side combined;
    * output is violation-sized. */
  def fdViolations(df: DataFrame, lhs: Seq[String],
                   rhs: Seq[String]): DataFrame = {
    require(lhs.nonEmpty && rhs.nonEmpty, "lhs and rhs must be non-empty")
    val pairs = df
      .filter(lhs.map(col(_).isNotNull).reduce(_ && _))
      .groupBy((lhs ++ rhs).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    pairs.groupBy(lhs.map(col): _*)
      .agg(count(lit(1)).as("n_distinct_rhs"), sum(col("__n")).as("n_rows"))
      .filter(col("n_distinct_rhs") > 1)
  }

  /** Missingness-pattern miner — which COMBINATIONS of nulls occur, and
    * how often ("text is only ever null together with n_chars" vs
    * "lang drops independently" are different bugs). One row per
    * realized pattern: a '1'/'0' presence mask over `cols` (in the
    * given order), its row count, and the share on the 1e-6 grid.
    * At most 2^|cols| rows exist; realized patterns are usually far
    * fewer — ONE partial-aggregable exchange over a map-only mask. */
  def nullPatterns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 20, s"1..20 columns, got ${cols.size}")
    val mask = concat(cols.map(c =>
      when(col(c).isNull, lit("0")).otherwise(lit("1"))): _*)
    val counts = df.select(mask.as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("n"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("__tot"))))
      .select(col("pattern"), col("n"),
        (floor(col("n").cast("double") / col("__tot") * 1e6) / 1e6).as("share"))
  }

  /** Chi-square independence audit between two categorical columns —
    * "is `lang` independent of `source`?" (a skewed association is how
    * a sampling bug or a scraper outage shows up in corpus audits).
    * One row: `(n, r_a, r_b, dof, chi2, cramers_v)` with
    * `chi2 = Σ (observed − expected)² / expected` over the contingency
    * cells and Cramér's V `sqrt(chi2 / (n·min(r_a−1, r_b−1)))` as the
    * 0–1 effect size. Per-cell terms floor-round on the 1e-9 grid and
    * sum as DECIMAL (addition-order-free, second-engine-replayable);
    * the headline columns round on the 1e-6 grid. Null categories drop.
    *
    * Scale shape: ONE partial-aggregable contingency exchange (cells
    * bounded by |A|×|B| — categorical audits, not id columns); margins
    * are two aggregates OVER THE CELL TABLE (never the corpus) joined
    * back broadcast, so the corpus is read exactly once. */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val ma = cells.groupBy("__a").agg(sum("__o").as("__ra"))
    val mb = cells.groupBy("__b").agg(sum("__o").as("__rb"))
    val tot = cells.agg(sum(col("__o")).as("__n"),
      countDistinct(col("__a")).as("__ka"), countDistinct(col("__b")).as("__kb"))
    val e = col("__ra").cast("double") * col("__rb") / col("__n")
    val term = (col("__o") - e) * (col("__o") - e) / e
    val terms = cells
      .join(broadcast(ma), "__a").join(broadcast(mb), "__b")
      .crossJoin(broadcast(tot))
      .select(col("__n"), col("__ka"), col("__kb"),
        (floor(term * 1e9 + 0.5) / 1e9).cast("decimal(28,9)").as("__t"))
    terms.groupBy(col("__n"), col("__ka"), col("__kb"))
      .agg(sum(col("__t")).as("__chi2"))
      .select(col("__n").as("n"),
        col("__ka").as("r_a"), col("__kb").as("r_b"),
        ((col("__ka") - 1) * (col("__kb") - 1)).as("dof"),
        (floor(col("__chi2").cast("double") * 1e6 + 0.5) / 1e6).as("chi2"),
        when(col("__ka") > 1 && col("__kb") > 1,
          floor(sqrt(col("__chi2").cast("double") /
            (col("__n") * least(col("__ka") - 1, col("__kb") - 1))) * 1e6 + 0.5)
            / 1e6).as("cramers_v"))
  }
}
