package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/range join operators (SURVEY.md §2.6 extension). Spark has no
  * built-in as-of or interval join; the naive encodings — a non-equi theta
  * join (BroadcastNestedLoop / cartesian) or a per-row correlated subquery —
  * are O(N×M) and die at scale. Both operators here re-shape the problem so
  * the planner sees only equi-keys:
  *
  *  - [[asofJoin]]: union the two sides and carry the latest right payload
  *    forward with a per-key running window — ONE shuffle on the key, no
  *    join operator at all, no candidate blowup regardless of time skew.
  *  - [[rangeJoin]]: quantize values into fixed-width bins; a range emits
  *    one row per covered bin, a point joins its single bin — the match is
  *    a hash equi-join on `bin` plus a residual bound check, never a
  *    nested loop over the full point set.
  */
object Joins {

  /** As-of join: for every left row, attach the payload of the single right
    * row with the same key whose time is nearest at-or-before it
    * (`direction = "backward"`, the default), at-or-after it
    * (`"forward"`), or closest on either side with backward winning ties
    * (`"nearest"` — pandas `merge_asof` parity; costs a second
    * per-partition sort over the same key exchange, never a second
    * shuffle). The classic "most recent quote for each trade" /
    * "latest profile snapshot for each event" operator.
    *
    * Execution shape (the 100 TB rationale): both sides are tagged and
    * UNIONED, then a single window per key — ordered by time, right rows
    * sorting before left rows at equal timestamps so an exactly-coincident
    * right row matches — carries the last non-null right payload onto each
    * left row (`last(_, ignoreNulls)` over rows unbounded-preceding →
    * current). One exchange on `keyCols`, map-sized state, no join: a hot
    * key costs one sorted partition, never a candidate cross product.
    * (A sort-merge as-of would need a custom physical operator; the union
    * window gets the identical result from stock operators and stays
    * whole-stage-codegen'd.)
    *
    * Output: every left column, plus each right column except the keys and
    * `rightTimeCol` (names must not collide with left's), plus the matched
    * right timestamp under `matchedTimeCol` when requested. Unmatched left
    * rows keep null payloads (`joinType = "left"`) or drop (`"inner"`).
    * Null handling follows SQL equi-join semantics: right rows with a null
    * time OR a null key cannot anchor a match and are dropped; left rows
    * with a null time or a null key never match (NULL = NULL is not a
    * match, exactly as in `ASOF JOIN ... ON l.k = r.k` — the window
    * encoding would otherwise quietly group null keys together).
    *
    * `tolerance` (optional, in the time column's own difference algebra —
    * e.g. an INTERVAL for timestamps) bounds how stale a match may be:
    * backward requires `t_left - t_right <= tolerance`, forward
    * `t_right - t_left <= tolerance`; beyond it the row is treated as
    * unmatched. Ties inside a key at the SAME right timestamp are broken
    * by the later-sorting right row; pre-aggregate the right side to
    * unique (key, time) when that matters.
    *
    * `timeBuckets` is the HOT-KEY escape hatch. The default (1) sorts each
    * key in one window partition — at 100 TB a key holding a large share
    * of the corpus ("one symbol is half the trades") then becomes one
    * giant sorted, possibly spilling partition. With `timeBuckets = B`,
    * rows additionally partition by a data-derived TIME bucket (sampled
    * boundaries over the unioned timestamps, embedded as literals — the
    * same mechanism as [[Sampling.packSequences]]), so a hot key's rows
    * spread across ≤ B parallel window partitions; a per-(key, bucket)
    * aggregate then computes each bucket's boundary payload and a
    * #buckets-row window per key carries it into the next bucket
    * (two-level carry — the prefix-sum trick applied to
    * `last(_, ignoreNulls)`). Costs: one narrow boundary-sketch pass,
    * one extra aggregate, and a broadcast of the (key, bucket) carry
    * frame — so use it in the FEW-HOT-KEYS regime it exists for (#keys ×
    * B must stay broadcast-sized; thousands of keys × 32 buckets is
    * fine, hundreds of millions of keys is not, and with that many keys
    * no key is hot enough to need it).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               direction: String = "backward",
               tolerance: Option[Column] = None,
               joinType: String = "left",
               matchedTimeCol: Option[String] = None,
               timeBuckets: Int = 1): DataFrame = {
    require(timeBuckets >= 1, s"timeBuckets must be >= 1, got $timeBuckets")
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    require(direction == "backward" || direction == "forward" || direction == "nearest",
      s"direction must be backward|forward|nearest, got $direction")
    require(joinType == "left" || joinType == "inner",
      s"joinType must be left|inner, got $joinType")
    val payloadCols = right.columns.filterNot(c =>
      keyCols.contains(c) || c == rightTimeCol).toSeq
    val collisions = payloadCols.toSet intersect left.columns.toSet
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: $collisions — rename before joining")
    matchedTimeCol.foreach(m => require(
      !left.columns.contains(m) && !payloadCols.contains(m),
      s"matchedTimeCol '$m' collides with an output column"))

    // payload struct carries the right time too — the tolerance gate and
    // matchedTimeCol read it back out after the window
    val pStruct = struct((col(rightTimeCol).as("__rt") +: payloadCols.map(col)): _*)
    val pType = right.select(pStruct).schema.head.dataType
    val l2 = left.select(
      struct(left.columns.map(col): _*).as("__l") +: keyCols.map(col) :+
        col(leftTimeCol).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(pType).as("__p"): _*)
    val keysNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val r2 = right.filter(col(rightTimeCol).isNotNull && keysNotNull).select(
      lit(null).cast(l2.schema.head.dataType).as("__l") +: keyCols.map(col) :+
        col(rightTimeCol).as("__t") :+ lit(0).as("__side") :+
        pStruct.as("__p"): _*)

    // backward: ascending time; forward: descending — either way the right
    // row at an equal timestamp sorts FIRST (side 0 < 1) so "at-or-before"
    // / "at-or-after" is inclusive, and `last` sees it by the left row.
    // "nearest" evaluates BOTH windows over the one key exchange (two
    // per-partition sorts, no second shuffle) and keeps the closer match,
    // backward winning ties — pandas merge_asof(direction='nearest').
    val unioned0 = r2.unionByName(l2)
    // hot-key mode: add a data-derived time bucket to the window partition
    // (rows with equal __t always share a bucket, so the within-bucket
    // carry is exact over its time range) and precompute each (key,
    // bucket)'s carry-in: the last right payload of any EARLIER bucket
    // (backward) / the first right payload of any LATER bucket (forward),
    // from a per-key #buckets-row window over the bucket summaries.
    val (unioned, part) =
      if (timeBuckets <= 1) {
        (unioned0, Window.partitionBy(keyCols.map(col): _*))
      } else {
        val bounds = Sampling.packBoundaries(unioned0, "__t", timeBuckets)
        val bucketed = unioned0.withColumn("__b",
          when(col("__t").isNull, lit(0))
            .otherwise(Sampling.bucketExpr(col("__t"), bounds)))
        val gCols = keyCols.map(col) :+ col("__b")
        // FILTER keeps every (key, bucket) group alive (left-only buckets
        // included — they NEED a carry-in) while summarizing right rows only
        val summaries = bucketed.groupBy(gCols: _*).agg(
          expr("max_by(__p, struct(__t, __side)) FILTER (WHERE __side = 0)")
            .as("__bLast"),
          expr("min_by(__p, struct(__t, __side)) FILTER (WHERE __side = 0)")
            .as("__bFirst"))
        val wKey = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__b"))
        val carry = summaries
          .withColumn("__cinB", last(col("__bLast"), ignoreNulls = true)
            .over(wKey.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("__cinF", first(col("__bFirst"), ignoreNulls = true)
            .over(wKey.rowsBetween(1, Window.unboundedFollowing)))
          .select(keyCols.map(col) :+ col("__b") :+ col("__cinB") :+ col("__cinF"): _*)
        (bucketed.join(broadcast(carry), keyCols :+ "__b", "left"),
          Window.partitionBy(gCols: _*))
      }
    val wBack = part.orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = part.orderBy(col("__t").desc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def withCarry(c: Column, cin: String): Column =
      if (timeBuckets <= 1) c else coalesce(c, col(cin))
    val carried = (direction match {
      case "backward" =>
        unioned.withColumn("__m",
          withCarry(last(col("__p"), ignoreNulls = true).over(wBack), "__cinB"))
      case "forward" =>
        unioned.withColumn("__m",
          withCarry(last(col("__p"), ignoreNulls = true).over(wFwd), "__cinF"))
      case _ =>
        unioned
          .withColumn("__mb",
            withCarry(last(col("__p"), ignoreNulls = true).over(wBack), "__cinB"))
          .withColumn("__mf",
            withCarry(last(col("__p"), ignoreNulls = true).over(wFwd), "__cinF"))
    }).filter(col("__side") === 1)

    def gate(m: Column, staleness: Column): Column = tolerance match {
      // null-time left rows carry no match by construction (they sort
      // before any right row backward / the gate below nulls them forward)
      case Some(tol) => when(col("__t").isNotNull && staleness <= tol, m)
      case None      => when(col("__t").isNotNull, m)
    }
    val matched = direction match {
      case "backward" =>
        carried.withColumn("__m", gate(col("__m"), col("__t") - col("__m.__rt")))
      case "forward" =>
        carried.withColumn("__m", gate(col("__m"), col("__m.__rt") - col("__t")))
      case _ =>
        val mb = gate(col("__mb"), col("__t") - col("__mb.__rt"))
        val mf = gate(col("__mf"), col("__mf.__rt") - col("__t"))
        // closer side wins; equal distance (or only one present) → backward
        carried.withColumn("__m",
          when(mb.isNull, mf)
            .when(mf.isNull, mb)
            .when(col("__mf.__rt") - col("__t") < col("__t") - col("__mb.__rt"), mf)
            .otherwise(mb))
          .drop("__mb", "__mf")
    }
    val filtered =
      if (joinType == "inner") matched.filter(col("__m").isNotNull) else matched
    val outCols = left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
      payloadCols.map(c => col("__m").getField(c).as(c)) ++
      matchedTimeCol.map(m => col("__m").getField("__rt").as(m))
    filtered.select(outCols: _*)
  }

  /** Range (interval) join: every point row against every range row whose
    * `[lo, hi)` interval contains it (bound inclusivity configurable).
    * Overlapping ranges each match; a point in no range drops (inner).
    *
    * Execution shape: points land in bin `floor(p / binWidth)`; a range
    * emits one row per bin it overlaps. Matching is then a hash EQUI-join
    * on `bin` — broadcastable when the range side is dimension-sized
    * (`broadcastRanges`, default) — with the exact bound check as a
    * residual filter. Candidate volume is |points| × (ranges overlapping
    * each point's bin), not |points| × |ranges|: the equi-key is what lets
    * 100 TB of points stream map-side against the bins instead of nested-
    * looping. Pick `binWidth` near the TYPICAL range width — a range
    * spanning k bins emits k rows (cheap on the small side), while a too-
    * wide bin packs many ranges per bucket and the residual does the work.
    *
    * Null points / null bounds never match (SQL comparison semantics drop
    * them in the residual; nulls are filtered before binning to avoid a
    * null-bin clique).
    *
    * `maxBinsPerRange` guards the explode: one sentinel-wide range (a
    * `hi = 1e12` outlier against a width-1000 bin) would otherwise build
    * a billion-element sequence and OOM the task. A range spanning more
    * bins RAISES with a clear message — the caller either widens
    * `binWidth` or cleans the outlier; silently clamping or dropping it
    * would corrupt the join result.
    */
  def rangeJoin(points: DataFrame, ranges: DataFrame, pointCol: String,
                loCol: String, hiCol: String, binWidth: Double,
                loInclusive: Boolean = true, hiInclusive: Boolean = false,
                broadcastRanges: Boolean = true,
                maxBinsPerRange: Int = 100000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerRange > 0, s"maxBinsPerRange must be positive, got $maxBinsPerRange")
    val collisions = points.columns.toSet intersect ranges.columns.toSet
    require(collisions.isEmpty,
      s"point/range column names collide: $collisions — rename before joining")
    val p = points.filter(col(pointCol).isNotNull)
      .withColumn("__bin", floor(col(pointCol) / binWidth))
    // hi's own bin is always included: when hi is exclusive and sits
    // exactly on a bin boundary the extra bin yields no residual survivors
    // — correctness never depends on floating-point edge subtraction.
    val loBin = floor(col(loCol) / binWidth)
    val hiBin = floor(col(hiCol) / binWidth)
    val capMsg = concat(
      lit(s"rangeJoin: a range spans more than $maxBinsPerRange bins at binWidth " +
        s"$binWidth (lo="), col(loCol).cast("string"), lit(", hi="),
      col(hiCol).cast("string"),
      lit(") — widen binWidth, raise maxBinsPerRange, or clean the outlier"))
    val binsOrRaise = when(hiBin - loBin < maxBinsPerRange, sequence(loBin, hiBin))
      .otherwise(raise_error(capMsg).cast("array<bigint>"))
    val r0 = ranges.filter(col(loCol).isNotNull && col(hiCol).isNotNull)
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(binsOrRaise))
    val r = if (broadcastRanges) broadcast(r0) else r0
    val loOk = if (loInclusive) col(pointCol) >= col(loCol) else col(pointCol) > col(loCol)
    val hiOk = if (hiInclusive) col(pointCol) <= col(hiCol) else col(pointCol) < col(hiCol)
    p.join(r, Seq("__bin")).filter(loOk && hiOk).drop("__bin")
  }

  /** [[rangeJoin]] over timestamp columns: bins are `binWidth` seconds wide
    * (epoch-microsecond quantization of the same bin-overlap shape). */
  def timeRangeJoin(points: DataFrame, ranges: DataFrame, tsCol: String,
                    loCol: String, hiCol: String, binWidthSeconds: Long,
                    broadcastRanges: Boolean = true): DataFrame = {
    require(binWidthSeconds > 0, s"binWidthSeconds must be positive, got $binWidthSeconds")
    val p2 = points.withColumn("__pus", unix_micros(col(tsCol)))
    val r2 = ranges.withColumn("__lous", unix_micros(col(loCol)))
      .withColumn("__hius", unix_micros(col(hiCol)))
    rangeJoin(p2, r2, "__pus", "__lous", "__hius",
      binWidthSeconds.toDouble * 1000000L, loInclusive = true,
      hiInclusive = false, broadcastRanges = broadcastRanges)
      .drop("__pus", "__lous", "__hius")
  }

  /** Interval × interval OVERLAP join — the two-sided generalization of
    * [[rangeJoin]] (point-in-interval): pairs every left interval
    * `[lLo, lHi)` with every right interval `[rLo, rHi)` that overlaps it
    * (`lLo < rHi ∧ rLo < lHi`, the half-open convention — touching
    * endpoints do NOT overlap). The shape behind embargo-window × session
    * alignment, promo-period attribution, and any two event-span tables.
    *
    * Execution: both sides explode to the `binWidth`-wide bins they
    * cover and equi-join on the bin — but a pair overlapping k shared
    * bins must emit ONCE, and a `distinct` dedup would be a second
    * full-width exchange. Instead each joined row keeps only the
    * CANONICAL bin — the one containing `greatest(lLo, rLo)`, the
    * overlap's left edge, which both sides necessarily cover — so every
    * true pair survives in exactly one bin and duplicates never
    * materialize at all. Degenerate (empty) intervals `lo ≥ hi` drop,
    * matching the strict-overlap predicate.
    *
    * Scale: the exchange is on the bin key — fan-out per interval is its
    * span/binWidth (capped like [[rangeJoin]]), so pick `binWidth` near
    * the TYPICAL interval length: long intervals pay their span, short
    * ones land in 1–2 bins. Bin hotspots (rush-hour pileups) are
    * AQE-skew-split equi-join work, never a cartesian. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   lLoCol: String, lHiCol: String,
                   rLoCol: String, rHiCol: String, binWidth: Double,
                   maxBinsPerRange: Int = 100000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val collisions = left.columns.toSet intersect right.columns.toSet
    require(collisions.isEmpty,
      s"left/right column names collide: $collisions — rename before joining")
    def binned(df: DataFrame, loC: String, hiC: String): DataFrame = {
      val loBin = floor(col(loC) / binWidth)
      // hi is EXCLUSIVE: an interval ending exactly on a boundary does not
      // occupy that bin — but a zero-residue hi needs its own bin when the
      // interval is shorter than one bin; including hi's bin is always
      // safe (the overlap predicate discards the non-pairs) and keeps
      // correctness off floating-point edge subtraction (rangeJoin note).
      val hiBin = floor(col(hiC) / binWidth)
      val capMsg = concat(
        lit(s"intervalJoin: an interval spans more than $maxBinsPerRange bins " +
          s"at binWidth $binWidth (lo="), col(loC).cast("string"),
        lit(", hi="), col(hiC).cast("string"),
        lit(") — widen binWidth, raise maxBinsPerRange, or clean the outlier"))
      val bins = when(hiBin - loBin < maxBinsPerRange, sequence(loBin, hiBin))
        .otherwise(raise_error(capMsg).cast("array<bigint>"))
      df.filter(col(loC).isNotNull && col(hiC).isNotNull && col(loC) < col(hiC))
        .withColumn("__bin", explode(bins))
    }
    val l = binned(left, lLoCol, lHiCol)
    val r = binned(right, rLoCol, rHiCol)
    l.join(r, Seq("__bin"))
      .filter(col(lLoCol) < col(rHiCol) && col(rLoCol) < col(lHiCol))
      // canonical-bin dedup: keep the pair only in the bin holding the
      // overlap's left edge — exactly one surviving row per true pair
      .filter(col("__bin") === floor(greatest(col(lLoCol), col(rLoCol)) / binWidth))
      .drop("__bin")
  }
}
