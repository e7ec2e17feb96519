package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (BASELINE.json mandate, SURVEY.md §2.6).
  *
  * Scale design: the query set is assumed small (broadcast); candidates
  * stream map-side against it, so brute-force top-k is a broadcast
  * nested-loop + per-query windowed rank — no full shuffle of the corpus.
  * The scale path (`lshTopK`) prunes candidates by random-hyperplane LSH
  * bucket equi-join before ranking, turning O(Q×N) into O(Q×N/2^bits) per
  * bucket probe.
  */
object Similarity {

  /** Dot product of two array<numeric> columns — native single-pass kernel
    * (HOF `aggregate`/`zip_with` lambdas evaluate interpreted per element;
    * the kernel runs as one JIT'd loop inside codegen). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.native.dotD(a.cast("array<double>"), b.cast("array<double>"))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.expressions.native.cosineD(a.cast("array<double>"), b.cast("array<double>"))

  /** Brute-force cosine top-k: broadcast the (small) query set, rank with a
    * per-query window. Deterministic tiebreak on candidate id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // cast to double ONCE per row before the join — inside the join the
    // cast would re-run per pair
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).cast("array<double>").as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("cand_id"), col("sim"), col("rk"))
  }

  /** Symmetric per-vector int8 quantization of an embedding column — the
    * memory lever for vector search at scale: a 100 TB embedding store
    * shrinks ~4× (float32 → int8 + one scale double per vector), which is
    * the difference between an index that fits executor memory and one
    * that spills. Returns `struct(scale: double, q: array<int>)` with
    * `scale = maxAbs / 127`, `q_i = clamp(floor(x_i·127/maxAbs + 0.5))` —
    * all IEEE-exact arithmetic (native single-pass kernels), so the codes
    * are bit-identical on any engine. Dot products on dequantized vectors
    * approximate the originals with relative error ~1/254 per dimension;
    * the standard recipe is: prune candidates on quantized vectors,
    * re-rank the short list on the originals. */
  def quantizeInt8(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val m = graft.expressions.native.maxAbsD(v)
    struct((m / 127.0).as("scale"),
      graft.expressions.native.quantizeI8D(v, m).as("q"))
  }

  /** Dequantize a [[quantizeInt8]] struct back to `array<double>`
    * (`q_i · scale`) — for re-ranking or error analysis. */
  def dequantize(qstruct: Column): Column =
    transform(qstruct.getField("q"),
      q => q.cast("double") * qstruct.getField("scale"))

  /** Top-k cosine search over QUANTIZED vectors — the memory-lean prune
    * stage of a two-phase search (prune on int8 codes, re-rank the short
    * list on the originals). Scoring trick: per-vector scales CANCEL in
    * cosine, so `cos_q = dotI(qa,qb) / (√dotI(qa,qa)·√dotI(qb,qb))` needs
    * only EXACT integer dot products plus IEEE sqrt/divide — the ranking
    * is bit-deterministic on any engine, unlike float-sum scoring.
    * Same broadcast-queries + windowed-rank shape as [[bruteForceTopK]];
    * the corpus side streams its (dim+1)-int codes, ~4× lighter than the
    * float vectors. Zero vectors (maxAbs 0) score 0 against everything;
    * a dimension-mismatched pair scores NULL (dotI surfaces the data
    * error) and sorts after every real score rather than masquerading as
    * orthogonal. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    import graft.expressions.native
    def qz(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id), quantizeInt8(col(vecCol)).getField("q").as(v))
        .withColumn(v + "_n", native.dotI(col(v), col(v)))
    val q = qz(queries, "q_id", "qv")
    val c = qz(corpus, "cand_id", "cv")
    val denom = sqrt(col("qv_n").cast("double")) * sqrt(col("cv_n").cast("double"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("q_id"))
      .withColumn("sim", when(denom === 0.0, 0.0)
        .otherwise(native.dotI(col("qv"), col("cv")).cast("double") / denom))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("cand_id"), col("sim"), col("rk"))
  }

  /** Random-hyperplane LSH signature: sign bits of `bits` fixed pseudo-random
    * hyperplanes (derived via splitmix64 — deterministic, no stored model,
    * identical on every executor). Native one-pass kernel. */
  def lshBucket(vec: Column, bits: Int = 8): Column =
    graft.expressions.native.lshBucketD(vec.cast("array<double>"), bits)

  /** LSH-bucketed approximate top-k: candidates joined to queries on equal
    * bucket (equi-join → hash join, broadcastable), then ranked. Recall is
    * traded for pruning; multi-probe = union over `probes` bit-flips. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("c_vec"),
      lshBucket(col(vecCol), bits).as("bucket"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec"),
      lshBucket(col(vecCol), bits).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("cand_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("cand_id"), col("sim"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket equi-join (never
    * all-pairs), exact cosine on bucket-collided candidates, threshold.
    * The near-dup flavor of `lshTopK`, for dedup rather than search. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        simThreshold: Double, bits: Int = 8): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"),
      lshBucket(col(vecCol), bits).as("bucket"))
    val a = v.select(col("id").as("id_a"), col("vec").as("vec_a"), col("bucket"))
    val b = v.select(col("id").as("id_b"), col("vec").as("vec_b"), col("bucket"))
    // single-bucket equi-join: each surviving pair appears exactly once, so
    // no pair-dedup exchange is needed
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.expressions.native.cosineD(col("vec_a"), col("vec_b")).as("sim"))
      .filter(col("sim") >= simThreshold)
  }

  /** IVF-style coarse quantization: assign each vector to the nearest of
    * `centroids` (a small broadcast table of (centroid_id, vec)); probing a
    * query = equi-join on centroid_id. Centroid fitting is out of scope
    * (any clustering works); this is the serving-path operator. */
  def ivfAssign(df: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String): DataFrame = {
    val c = centroids.select(col("centroid_id"),
      col("centroid_vec").cast("array<double>").as("centroid_vec"))
    val scored = df.crossJoin(broadcast(c))
      .withColumn("sim", cosine(col(vecCol), col("centroid_vec")))
    // argmax via max_by, not a windowed rank: partial aggregation collapses
    // the k candidate rows per vector MAP-SIDE, so the exchange carries N
    // rows instead of N×k. Tie-break: highest sim, then lowest centroid_id.
    val payload = struct(
      df.columns.toIndexedSeq.map(col) :+ col("centroid_id") :+ col("sim"): _*)
    val ord = struct(col("sim"), (-col("centroid_id")).as("tb"))
    scored.groupBy(col(idCol).as("_gid"))
      .agg(max_by(payload, ord).as("best"))
      .select("best.*")
  }

  /** Deterministic centroid seeding for IVF without an ML fit: the k
    * vectors with the lowest id-hash — a pseudo-random but reproducible
    * k-sample. Executes as TakeOrderedAndProject (partial top-k per
    * partition, only k rows reach the driver-side merge — no global sort
    * shuffle), so it scales to any corpus size. Real deployments would
    * k-means-refine these seeds; IVF only needs a roughly even partition
    * of the space. */
  def seedCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    // the centroid id is hashed and re-joined as a long downstream; a
    // silent cast would null non-numeric ids — fail fast instead
    require({
        import org.apache.spark.sql.types._
        Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(df.schema(idCol).dataType)
      },
      s"seedCentroids needs an integral id column, got " +
        s"${df.schema(idCol).dataType.simpleString} for '$idCol'")
    df.select(col(idCol).cast("long").as("centroid_id"),
        col(vecCol).cast("array<double>").as("centroid_vec"))
      // id as the secondary key: a (rare) xxhash64 collision under
      // limit(k) would otherwise make the k-seed selection depend on
      // physical row order
      .orderBy(xxhash64(col("centroid_id")), col("centroid_id"))
      .limit(k)
  }

  /** Lloyd-iteration refinement of IVF centroids, expressed as DataFrame
    * aggregations (2 shuffles per iteration — assignment exchange +
    * per-(centroid, dim) mean): posexplode the assigned vectors, average
    * each dimension, re-assemble with an order-preserving
    * `array_sort(collect_list(struct(pos, m)))`. Empty cells keep their
    * previous centroid (standard Lloyd fallback). Distributed-sum ordering
    * makes means bitwise nondeterministic across runs — callers needing
    * reproducible centroids persist them (as any real IVF index build
    * does). */
  def kmeansRefine(df: DataFrame, centroids0: DataFrame, idCol: String,
                   vecCol: String, iters: Int = 3): DataFrame = {
    var cents = centroids0.select(col("centroid_id"),
      col("centroid_vec").cast("array<double>").as("centroid_vec"))
    // SPHERICAL k-means: assignment is by cosine (scale-invariant), so the
    // update must average UNIT vectors — the mean direction is the
    // cosine-objective maximizer; a raw mean would weight by magnitude and
    // lose Lloyd's monotone-improvement guarantee. Zero vectors drop out
    // of the update (null after division) rather than poisoning it as NaN.
    val unit = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("__uv"))
      .withColumn("__nrm",
        sqrt(graft.expressions.native.dotD(col("__uv"), col("__uv"))))
      .withColumn("__uv",
        when(col("__nrm") > 0, transform(col("__uv"), x => x / col("__nrm"))))
      .drop("__nrm")
      // each iteration is its own job — persist so the corpus scan +
      // normalization runs once, not once per iteration
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try for (_ <- 1 to iters) {
      val assigned = ivfAssign(unit, cents, idCol, "__uv")
      val means = assigned
        .select(col("centroid_id"), posexplode(col("__uv")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos").agg(avg("x").as("m"))
        .groupBy("centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid_vec"))
      // empty cells vanish from `means`; keep their old centroid
      val next = cents.select(col("centroid_id"), col("centroid_vec").as("old_vec"))
        .join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("centroid_vec"), col("old_vec")).as("centroid_vec"))
      // Materialize the k×dim centroid table on the driver each iteration
      // (the standard model-state pattern — Spark ML's KMeans does the
      // same): `cents` is referenced twice per iteration, so leaving it
      // lazy embeds two copies of the previous iteration's plan — ~2^iters
      // plan growth and full corpus re-assignment per reference. k rows of
      // doubles is exactly the table we broadcast anyway.
      cents = next.sparkSession.createDataFrame(
        next.collectAsList(), next.schema)
    } finally unit.unpersist()
    cents
  }

  /** End-to-end IVF approximate top-k: corpus pre-assigned to its nearest
    * centroid (one-time, amortized across queries); each query probes its
    * `nprobe` nearest centroids and ranks ONLY the vectors in those cells —
    * an equi-join on centroid_id, never a full corpus scan per query.
    *
    * 100 TB shape: the assigned corpus is written bucketed by centroid_id,
    * so a probe is a partition-pruned read of nprobe/k of the data; the
    * centroid table (k × dim doubles) broadcasts everywhere. Recall is
    * tunable via nprobe (nprobe = k degenerates to exact brute force). */
  def ivfTopK(assignedCorpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    val c = centroids.select(col("centroid_id"),
      col("centroid_vec").cast("array<double>").as("centroid_vec"))
    // each query → its nprobe nearest centroid ids (small × small cross)
    val probes = queries
      .select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
      .crossJoin(broadcast(c))
      .withColumn("c_sim", cosine(col("q_vec"), col("centroid_vec")))
      .withColumn("c_rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("c_sim").desc, col("centroid_id"))))
      .filter(col("c_rk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("centroid_id"))
    val cand = assignedCorpus.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("c_vec"), col("centroid_id"))
    val scored = cand.join(broadcast(probes), "centroid_id")
      .filter(col("cand_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("cand_id"), col("sim"), col("rk"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication" —
    * public method): partition the embedding space by nearest centroid,
    * find cosine-above-threshold pairs WITHIN each cell only, resolve
    * transitive groups to their min-id representative. Returns the full
    * `(idCol, rep)` mapping (singletons map to themselves) — filter
    * `rep === id` for the survivor set, exactly like the token-level
    * `q_dedup_clusters` mapping.
    *
    * The cell partition is the scale mechanism AND the semantics: like
    * the paper (which dedups within k-means clusters only), cross-cell
    * near-dups are accepted misses — that approximation is what turns an
    * O(N²) all-pairs cosine into Σ O(|cell|²) with cells sized by the
    * centroid count. At 100 TB: centroids broadcast ([[ivfAssign]]'s
    * map-side argmax), the pair join is a centroid_id equi-join (AQE
    * skew-splits fat cells; more centroids = finer cells = less work),
    * and component resolution reuses [[Clusters.connectedComponents]]'
    * pair-sized star contraction. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, simThreshold: Double): DataFrame = {
    val assigned = ivfAssign(df, centroids, idCol, vecCol)
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"),
        col("centroid_id"))
    val a = assigned.select(col("centroid_id"), col(idCol).as("id_a"),
      col("__v").as("vec_a"))
    val b = assigned.select(col("centroid_id"), col(idCol).as("id_b"),
      col("__v").as("vec_b"))
    val pairs = a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.expressions.native.cosineD(col("vec_a"), col("vec_b"))
        >= simThreshold)
      .select(col("id_a"), col("id_b"))
    val cc = Clusters.connectedComponents(pairs)
    df.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("rep"), col(idCol)).as("rep"))
  }

  /** Corpus×corpus k-NN JOIN — for EVERY left row, its `k` nearest right
    * rows by cosine. This is the shape [[ivfTopK]] cannot serve: there the
    * query side broadcasts (fine for a query batch), here BOTH sides are
    * corpus-scale (link every document to its neighbors — retrieval
    * augmentation, graph building, SemDeDup-style analysis across sets).
    *
    * Mechanism: the right side pre-assigns to its nearest centroid
    * ([[ivfAssign]], map-side argmax). The left side picks its `nprobe`
    * nearest CELLS entirely map-side — the centroid table (model state,
    * k×dim) inlines as one array-of-structs literal, per-row cell ranking
    * is an `array_sort` + `slice` over that literal, NO exchange and no
    * per-row window. Candidates then meet in ONE centroid_id equi-join
    * (the only corpus-scale shuffle; AQE skew-splits fat cells) and each
    * left row keeps its top-k via WindowGroupLimit. Recall follows the
    * IVF story: `nprobe` = number of cells probed; nprobe = #centroids
    * degenerates to exact brute force (spec-pinned). Self-matches on a
    * shared id space are excluded.
    *
    * Output: `(left_id, right_id, sim, rk)`. */
  def knnJoin(left: DataFrame, right: DataFrame, centroids: DataFrame,
              leftIdCol: String, rightIdCol: String, vecCol: String,
              k: Int, nprobe: Int = 2): DataFrame = {
    require(k > 0 && nprobe > 0, s"k and nprobe must be positive: $k, $nprobe")
    val centRows = centroids
      .select(col("centroid_id").cast("long"),
        col("centroid_vec").cast("array<double>"))
      .collect()
    val centLit = array(centRows.toIndexedSeq.map { r =>
      struct(lit(r.getLong(0)).as("cid"),
        array(r.getSeq[Double](1).map(lit(_)): _*).as("cvec"))
    }: _*)
    val probed = left
      .select(col(leftIdCol).as("left_id"),
        col(vecCol).cast("array<double>").as("__lv"))
      .withColumn("__cells", slice(array_sort(transform(centLit, c =>
        // ascending sort ⇒ encode preference as (-sim, cid): best first
        struct((-graft.expressions.native.cosineD(col("__lv"), c.getField("cvec")))
          .as("ns"), c.getField("cid").as("cid")))), 1, nprobe))
      .select(col("left_id"), col("__lv"),
        explode(col("__cells").getField("cid")).as("centroid_id"))
    val cand = ivfAssign(right.select(col(rightIdCol).as("right_id"),
        col(vecCol).cast("array<double>").as("__rv")), centroids,
        "right_id", "__rv")
      .select(col("right_id"), col("__rv"), col("centroid_id"))
    val w = Window.partitionBy("left_id")
      .orderBy(col("sim").desc, col("right_id"))
    probed.join(cand, Seq("centroid_id"))
      .filter(col("left_id") =!= col("right_id"))
      .withColumn("sim",
        graft.expressions.native.cosineD(col("__lv"), col("__rv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("left_id"), col("right_id"), col("sim"),
        col("rk").cast("integer").as("rk"))
  }

  /** Deterministic data-independent PQ codebook (flat layout
    * `cb[((j·k)+i)·subDim + d]`, values on the exact 1/8 grid) — the
    * harness/oracle codebook: a SQL engine regenerates it from the same
    * closed form, so encode + ADC are cross-engine mirrorable end to end.
    * Real deployments train with [[trainPqCodebook]] instead. */
  def pqSyntheticCodebook(m: Int, k: Int, subDim: Int): Array[Double] =
    Array.tabulate(m * k * subDim) { idx =>
      val j = idx / (k * subDim)
      val r = idx % (k * subDim)
      val i = r / subDim
      val d = r % subDim
      ((i * 31 + d * 7 + j * 13) % 17 - 8) / 8.0
    }

  /** Product-quantization encode (Jégou et al. TPAMI 2011 — public
    * method): adds `codesCol` (`array<int>`, length m, each in [0, k)) —
    * the m·log₂k-bit compressed form of the embedding. MAP-ONLY: the
    * codebook (m·k·subDim doubles — model state, ~8 KB at 8×16×8) rides
    * as one array literal inside the codegen'd [[native.pqEncode]]
    * kernel, exactly the [[Classifier]] hashed-weight-table shape. At
    * 100 TB this is the storage/scan win: 64-dim float vectors (256 B)
    * become 8 bytes of codes, and the ADC scan reads ONLY the codes
    * column. Distances use the floor'd-integer-grid form, so codes are
    * bit-stable across partitionings and engines. */
  def pqEncode(df: DataFrame, vecCol: String, codebook: Array[Double],
               m: Int, k: Int, codesCol: String = "pq_codes"): DataFrame = {
    require(codebook.length % (m * k) == 0,
      s"codebook length ${codebook.length} not divisible by m*k = ${m * k}")
    df.withColumn(codesCol, graft.expressions.native.pqEncode(
      col(vecCol).cast("array<double>"), lit(codebook), m, k))
  }

  /** PQ asymmetric-distance top-k (ADC): each query precomputes its m·k
    * lookup table ONCE (codegen kernel, map-only over the query side),
    * then every candidate is scored by m integer table lookups over its
    * codes — no per-pair float math at scan time. The query side
    * (id + LUT) broadcasts; the corpus side streams through map-only
    * scoring + a WindowGroupLimit top-k. Approximate by construction
    * (distance to the RECONSTRUCTED candidate): recall is a codebook-
    * quality story, exactness of the ranking arithmetic is integer.
    * Output: `(q_id, cand_id, dist9, rk)` — `dist9` the 1e-9-grid
    * integer distance, ascending = nearest. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, codebook: Array[Double], m: Int, k: Int,
             topK: Int): DataFrame = {
    val enc = pqEncode(corpus, vecCol, codebook, m, k)
      .select(col(idCol).as("cand_id"), col("pq_codes"))
    val q = queries.select(col(idCol).as("q_id"),
      graft.expressions.native.pqLut(
        col(vecCol).cast("array<double>"), lit(codebook), m, k).as("__lut"))
    val w = Window.partitionBy("q_id").orderBy(col("dist9"), col("cand_id"))
    enc.join(broadcast(q), col("cand_id") =!= col("q_id"))
      .withColumn("dist9",
        graft.expressions.native.pqAdc(col("pq_codes"), col("__lut"), k))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("q_id"), col("cand_id"), col("dist9"),
        col("rk").cast("integer").as("rk"))
  }

  /** Train a PQ codebook: per-subspace Lloyd iterations (k-means under
    * plain L2, the paper's objective). Assignment is the SAME codegen
    * [[native.pqEncode]] kernel the serving path uses (one map-only pass,
    * no subvector explode before the aggregate); the update is a
    * partial-aggregable per-(subspace, code, dim) mean whose exchange
    * carries m·k·subDim rows regardless of corpus size. Means grid-snap
    * to 1e-6 per iteration (the [[kmeansRefine]]/`fitLogistic` quantum
    * pattern) so the fit is bit-reproducible across partitionings. The
    * codebook is driver model-state (m·k·subDim doubles), seeded from
    * [[pqSyntheticCodebook]]; empty cells keep their previous centroid. */
  def trainPqCodebook(df: DataFrame, vecCol: String, m: Int, k: Int,
                      subDim: Int, iters: Int = 3): Array[Double] = {
    var cb = pqSyntheticCodebook(m, k, subDim)
    val vecs = df.select(col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull && size(col("__v")) === m * subDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try for (_ <- 1 to iters) {
      val means = vecs
        .withColumn("__codes",
          graft.expressions.native.pqEncode(col("__v"), lit(cb), m, k))
        .select(posexplode(col("__v")).as(Seq("pos", "x")), col("__codes"))
        .withColumn("j", (col("pos") / subDim).cast("int"))
        .withColumn("d", col("pos") % subDim)
        .withColumn("i", element_at(col("__codes"), col("j") + 1))
        .groupBy("j", "i", "d").agg(avg(col("x")).as("mean"))
        .select(col("j"), col("i"), col("d"),
          (floor(col("mean") * 1e6 + lit(0.5)) / 1e6).as("mean"))
        .collect()
      val next = cb.clone()
      means.foreach { r =>
        val (j, i, d) = (r.getInt(0), r.getInt(1), r.getInt(2))
        next((j * k + i) * subDim + d) = r.getDouble(3)
      }
      cb = next
    } finally vecs.unpersist()
    cb
  }

  /** Mean-pooled embedding per group (chunk → document pooling, cluster
    * centroids, per-domain embedding profiles): element-wise mean of an
    * `array`-typed vector column. Built on the partial-aggregable
    * `array_sum` aggregate (`expressions.ArraySumAgg`) — each map task
    * reduces its rows to one dim-length partial, so the exchange carries
    * #groups × dim doubles, never rows; contrast a `collect_list`-based
    * pooling, which ships every vector to its group's reducer. Output:
    * group columns + `meanCol` (`array<double>`) + `nCol` (pooled rows).
    * Groups whose vectors are all null pool to a null mean with n = 0.
    * Float inputs are upcast exactly; dimension mismatches throw. */
  def meanPool(df: DataFrame, groupCols: Seq[String], embCol: String,
               meanCol: String = "mean", nCol: String = "n"): DataFrame = {
    val summed = df.groupBy(groupCols.map(col): _*)
      .agg(graft.expressions.native.arraySum(
        col(embCol).cast("array<double>")).as("__as"))
    summed.select(groupCols.map(col) ++ Seq(
      transform(col("__as.sum"), x => x / col("__as.n").cast("double")).as(meanCol),
      coalesce(col("__as.n"), lit(0L)).as(nCol)): _*)
  }

  /** Maximal-Marginal-Relevance rerank: greedily diversify a per-query
    * candidate list so the top-k is relevant AND non-redundant — the
    * standard post-retrieval step before stuffing a RAG context window
    * (five near-identical passages waste four slots). Selection i
    * maximizes `λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s)` (ties by
    * doc id asc); selection 1 is pure relevance.
    *
    * `candidates` carries `(qidCol, docCol, relCol)` — the output of a
    * prior retrieval stage, BOUNDED per query (top-N, N ≲ 100s); vectors
    * come from an equi-join against `embeddings` (candidates without a
    * vector drop). MMR scores are floor-rounded at 1e-9 before each
    * argmax; cosines run over UNIT-normalized vectors in strict
    * array-order double accumulation, so a second engine summing the
    * same 64 products left-to-right lands on the identical bits (the
    * `q_ann_cosine` mirror discipline).
    *
    * Execution shape: one equi-join, then ONE `groupBy(qid)` collecting
    * the ≤N candidate structs, then the k greedy steps UNROLLED as pure
    * Column expressions (higher-order `filter`/`transform`/`aggregate`
    * over the in-row array — no UDF, no driver loop, no per-step
    * shuffle). Per-query state is N structs × dim doubles; a million
    * queries parallelize freely; k and N are the only cost knobs.
    *
    * Output: `(qidCol, docCol, mmr_score, rk)` — `rk` 1-based, ≤ k. */
  def mmrRerank(candidates: DataFrame, qidCol: String, docCol: String,
                relCol: String, embeddings: DataFrame, vecIdCol: String,
                vecCol: String, k: Int = 5, lambda: Double = 0.7): DataFrame = {
    require(k >= 1, s"k must be ≥ 1, got $k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    // the greedy-selection state carries doc ids through array<bigint>
    // accumulators and breaks score ties by LOWEST id via 0−id — both
    // require an integral id; a string/UUID id would fail deep inside the
    // aggregate with an opaque AnalysisException (r13 advice), so fail
    // fast here instead (hash or zipWithIndex non-numeric ids first)
    require({
        import org.apache.spark.sql.types._
        Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(candidates.schema(docCol).dataType)
      },
      s"mmrRerank needs an integral doc id column, got " +
        s"${candidates.schema(docCol).dataType.simpleString} for '$docCol'")
    val unit = embeddings.select(col(vecIdCol).as(docCol), {
      val v = col(vecCol).cast("array<double>")
      val norm = sqrt(aggregate(zip_with(v, v, (x, y) => x * y), lit(0.0), _ + _))
      transform(v, x => x / norm).as("__uv")
    })
    val pool = candidates
      .select(col(qidCol), col(docCol), col(relCol).cast("double").as("__rel"))
      .join(unit, Seq(docCol))
      .groupBy(col(qidCol))
      .agg(sort_array(collect_list(
        struct(col(docCol).as("id"), col("__rel").as("rel"), col("__uv").as("uv"))))
        .as("__cands"))
    def r9(c: Column): Column = floor(c * 1e9 + lit(0.5)) / 1e9
    def cos(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)
    // the k greedy steps run at RUNTIME as one `aggregate` over
    // sequence(1, k) whose accumulator is the selection state — writing
    // them as k chained Columns (or k projections, which CollapseProject
    // merges right back) re-inlines step i−1's whole tree at every step-i
    // use site: the plan grows exponentially in k and a 5-step rerank
    // already OOMed on its own 32 MB task binary. Here the step body
    // appears ONCE in the plan regardless of k.
    val init = struct(
      array().cast("array<bigint>").as("ids"),
      array().cast("array<array<double>>").as("vecs"),
      array().cast("array<struct<id:bigint,mmr:double>>").as("picks"))
    def stepFn(st: Column): Column = {
      val remaining = filter(col("__cands"), c =>
        not(array_contains(st.getField("ids"), c.getField("id"))))
      val scored = transform(remaining, c => struct(
        r9(when(size(st.getField("vecs")) === 0, c.getField("rel") * lambda)
          .otherwise(c.getField("rel") * lambda - lit(1.0 - lambda) *
            aggregate(st.getField("vecs"), lit(-1.0), (m, s) =>
              greatest(m, cos(c.getField("uv"), s))))).as("mmr"),
        (lit(0L) - c.getField("id")).as("negid"),
        c.getField("id").as("id"),
        c.getField("uv").as("uv")))
      // null best ⇒ pool exhausted (pool smaller than k) ⇒ keep state
      val best = array_max(scored)
      when(best.isNull, st).otherwise(struct(
        concat(st.getField("ids"), array(best.getField("id"))).as("ids"),
        concat(st.getField("vecs"), array(best.getField("uv"))).as("vecs"),
        concat(st.getField("picks"), array(struct(
          best.getField("id").as("id"),
          best.getField("mmr").as("mmr")))).as("picks")))
    }
    val picks = aggregate(sequence(lit(1), lit(k)), init, (st, _) => stepFn(st))
      .getField("picks")
    pool.select(col(qidCol), posexplode(picks).as(Seq("__p", "__pick")))
      .select(col(qidCol), col("__pick.id").as(docCol),
        col("__pick.mmr").as("mmr_score"),
        (col("__p") + 1).cast("integer").as("rk"))
  }

  /** Recall@k of an approximate retrieval result against the exact one —
    * the ANN QUALITY GATE: IVF/PQ/LSH answers are useless at unknown
    * recall, and a 100 TB deployment tunes nprobe/bits against exactly
    * this curve (measured on a query sample; the exact side is the
    * expensive brute-force pass you run once per tuning sweep, not per
    * query). Both inputs are per-query top-k tables sharing `(qidCol,
    * docCol)`. Per query: `n_exact`, `n_hit = |approx ∩ exact|`, and
    * `recall = n_hit / n_exact` (exact divisions — safe to hash).
    * Queries present in `exact` but absent from `approx` score 0 (the
    * honest miss); queries only in `approx` are dropped (nothing to
    * measure against).
    *
    * Execution shape: one equi-join on (qid, doc) between two
    * (queries×k)-sized frames + a partial-aggregable count — everything
    * is result-sized, the corpus never appears. */
  def recallAtK(approx: DataFrame, exact: DataFrame, qidCol: String,
                docCol: String): DataFrame = {
    val ap = approx.select(col(qidCol), col(docCol)).distinct()
      .withColumn("__hit", lit(1L))
    exact.select(col(qidCol), col(docCol))
      .join(ap, Seq(qidCol, docCol), "left")
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_exact").cast("double"))
  }

  /** Covariance matrix of the first `dims` embedding coordinates — the
    * statistics pass behind PCA whitening, anisotropy diagnosis ("is the
    * embedding space collapsing"), and [[pcaComponents]]. Emits one row
    * per `i ≤ j` pair: `(i, j, n, cov)` (population covariance, i.e.
    * divide by n).
    *
    * Numeric discipline = [[Sketches.correlationMatrix]]: coordinates are
    * snapped to the 1e-6 grid in double (exactly reproducible arithmetic
    * on any engine), summed as DECIMAL so partial-agg order cannot move
    * the moments, and the closed form `Σxy/n − (Σx/n)(Σy/n)` runs in
    * double over the exact sums, floor-rounded at 1e-9. Rows with a null
    * or short vector drop (listwise: every pair sees the same rows —
    * required for the matrix to be positive semidefinite).
    *
    * Scale: dims(dims+1)/2 branch-free decimal aggregates riding ONE
    * exchange as a single aggregate row — the corpus is read once,
    * nothing downstream scales with it. `dims` is capped at 32 here
    * (528 pairs ≈ the practical single-row-aggregate ceiling); whiten
    * wider spaces on a pooled/truncated view first. */
  def embeddingCovariance(df: DataFrame, vecCol: String, dims: Int): DataFrame = {
    require(dims >= 2 && dims <= 32, s"dims must be in [2, 32], got $dims")
    val ok = df.filter(col(vecCol).isNotNull && size(col(vecCol)) >= dims)
    def coord(i: Int): Column =
      (floor(element_at(col(vecCol), i + 1).cast("double") * 1e6 + lit(0.5)) / 1e6)
        .cast("decimal(18,6)")
    val pairs = for { i <- 0 until dims; j <- i until dims } yield (i, j)
    val aggs = Seq(count(lit(1)).as("n")) ++
      (0 until dims).map(i => sum(coord(i)).as(s"s_$i")) ++
      pairs.map { case (i, j) => sum(coord(i) * coord(j)).as(s"sp_${i}_$j") }
    val outs = pairs.map { case (i, j) =>
      val n = col("n").cast("double")
      val needed = Seq(s"s_$i", s"s_$j", s"sp_${i}_$j")
      val allPresent = needed.map(col(_).isNotNull).reduce(_ && _)
      val c = col(s"sp_${i}_$j").cast("double") / n -
        (col(s"s_$i").cast("double") / n) * (col(s"s_$j").cast("double") / n)
      struct(lit(i).as("i"), lit(j).as("j"), col("n").as("n"),
        when(col("n") >= 1 && allPresent,
          floor(c * 1e9 + lit(0.5)) / 1e9).as("cov"))
    }
    ok.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(outs: _*)).as("p"))
      .select("p.*")
  }

  /** Top-`k` principal components of [[embeddingCovariance]] output via
    * the cyclic Jacobi eigensolver — deterministic (fixed sweep order, no
    * randomized init), exact to double precision in a few sweeps on the
    * small matrices this is for. The covariance matrix is MODEL-sized
    * (dims ≤ 32 → ≤ 528 numbers), so solving on the driver is the same
    * bounded-collect class as k-means centroids or PQ codebooks — the
    * corpus never moves.
    *
    * Returns `(eigenvalue, component)` pairs sorted by eigenvalue desc,
    * each component a unit vector with a sign convention (largest-|coord|
    * entry positive) so results are reproducible run to run. */
  def pcaComponents(cov: DataFrame, k: Int): Seq[(Double, Array[Double])] = {
    val cells = cov.select(col("i"), col("j"), col("cov")).collect()
    // degenerate-input guards (r13 advice): an empty covariance frame
    // would throw an opaque `.max on empty` UnsupportedOperationException,
    // and a partial frame (filtered cells) would silently zero-fill the
    // missing covariances — require the complete upper triangle
    // embeddingCovariance emits
    require(cells.nonEmpty,
      "pcaComponents needs a non-empty covariance frame (did the input " +
        "have fewer rows than `dims`, or was the frame filtered to empty?)")
    val d = cells.map(_.getInt(0)).max + 1
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    val seen = cells.map(r => (r.getInt(0), r.getInt(1))).toSet
    val missing = for { i <- 0 until d; j <- i until d
                        if !seen((i, j)) } yield (i, j)
    require(missing.isEmpty,
      s"pcaComponents needs the complete upper triangle for dims=$d; " +
        s"missing cells: ${missing.take(8).mkString(", ")}" +
        (if (missing.size > 8) s" (+${missing.size - 8} more)" else ""))
    val a = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), if (r.isNullAt(2)) 0.0 else r.getDouble(2))
      a(i)(j) = c; a(j)(i) = c
    }
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // cyclic Jacobi: fixed (p,q) sweep order → deterministic rotations
    for (_ <- 0 until 12; p <- 0 until d; q <- p + 1 until d
         if math.abs(a(p)(q)) > 1e-14) {
      val theta = 0.5 * math.atan2(2.0 * a(p)(q), a(q)(q) - a(p)(p))
      val (c, s) = (math.cos(theta), math.sin(theta))
      for (i <- 0 until d) {
        val (aip, aiq) = (a(i)(p), a(i)(q))
        a(i)(p) = c * aip - s * aiq; a(i)(q) = s * aip + c * aiq
      }
      for (i <- 0 until d) {
        val (api, aqi) = (a(p)(i), a(q)(i))
        a(p)(i) = c * api - s * aqi; a(q)(i) = s * api + c * aqi
      }
      for (i <- 0 until d) {
        val (vip, viq) = (v(i)(p), v(i)(q))
        v(i)(p) = c * vip - s * viq; v(i)(q) = s * vip + c * viq
      }
    }
    val eig = (0 until d).map(i => (a(i)(i), (0 until d).map(v(_)(i)).toArray))
      .sortBy(-_._1).take(k)
    eig.map { case (lam, vec) =>
      val m = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      (lam, if (vec(m) < 0) vec.map(-_) else vec)
    }
  }

  /** Project embeddings onto precomputed principal `components` (a
    * [[pcaComponents]] result or any fixed orthonormal basis): adds
    * `outCol` = `array<double>` of `components.size` scores, centered on
    * `means` (the per-coordinate averages, also model-sized literals).
    * The basis ships as a LITERAL array column — pure map-side codegen'd
    * arithmetic, no join, no UDF; a billion-row projection is one scan. */
  def pcaProject(df: DataFrame, vecCol: String, means: Array[Double],
                 components: Seq[Array[Double]], outCol: String = "pca"): DataFrame = {
    require(components.nonEmpty, "need at least one component")
    val d = means.length
    require(components.forall(_.length == d), "component/means dims differ")
    val comps = components.map(cv =>
      array(cv.zipWithIndex.map { case (w, i) =>
        (element_at(col(vecCol), i + 1).cast("double") - lit(means(i))) * lit(w)
      }: _*))
    df.withColumn(outCol, array(comps.map(terms =>
      aggregate(terms, lit(0.0), (acc, x) => acc + x)): _*))
  }
}
