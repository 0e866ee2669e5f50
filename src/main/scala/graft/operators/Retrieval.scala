package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** BM25 term retrieval over a distributed inverted index — the lexical
  * complement of the embedding ANN family (sim1-sim9): training-data
  * pipelines rank documents against reference queries for quality
  * scoring, dedup triage, and retrieval-augmented evals, and at corpus
  * scale that is an inverted-index problem, not a scan problem.
  *
  * Index layout (BucketedJoin tables — the same index-never-moves
  * discipline as the minhash/LSH/IVF indexes):
  *  - `<table>`        postings `(term, doc_id, tf, dl)` BUCKETED by
  *    term — document length is DENORMALIZED into the posting row
  *    (+8 bytes) so scoring needs no per-doc join at all;
  *  - `<table>_terms`  `(term, df)` delta rows bucketed by term —
  *    document frequency is kept as APPENDABLE increments and summed
  *    per term at query time (a zero-exchange aggregate over the
  *    term-bucketed layout), so growing the corpus never rewrites the
  *    dictionary;
  *  - `<table>_stats`  `(n_docs, dl_sum)` delta rows — the corpus-level
  *    BM25 inputs, folded to (N, avgdl) with a one-row aggregate.
  *
  * Query shape: query terms (a tiny frame) shuffle TO the term-bucketed
  * postings/dictionary and join co-located; scoring emits 24-byte
  * `(qid, doc_id, partial)` rows; the per-(qid, doc) sum and top-k run
  * through the same O(k)-state native aggregate as the ANN rankers.
  * Nothing index-sided ever shuffles.
  *
  * Scores are INTEGER micro-units: each term's BM25 contribution is
  * rounded to 1e-6 and summed as a long (`score_micro`). Long addition
  * is associative, so the total is independent of Spark's partial-agg
  * order AND bit-identical to any other engine's sum of the same
  * rounded partials — which is what makes the result oracle-checkable
  * (a double sum would differ in the last ULP by summation order
  * alone). Tokenization is lowercased whitespace splitting
  * ([[TextOps.tokens]] semantics); empty documents index nothing and
  * do not count toward N or avgdl.
  *
  * BM25 (Robertson-Sparck Jones; the Lucene-variant idf, always
  * positive):
  *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
  *   w(t,d) = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   score  = Σ_t idf·w   with k1 = 1.2, b = 0.75.
  * Query terms are DISTINCT (qtf = 1 — the standard short-query form).
  */
object Retrieval {

  private lazy val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Lowercased [[TextOps.tokens]] — ONE shared tokenizer definition, so
    * the oracle constraint on t1/a1 (whitespace splitting) and on
    * t16/t17 (this analyzer) can never drift apart silently.
    */
  private def toks(text: org.apache.spark.sql.Column) =
    TextOps.tokens(lower(text))

  /** Per-batch index rows: postings (term, doc_id, tf, dl), dictionary
    * deltas (term, df), one stats delta row (n_docs, dl_sum).
    */
  private def indexRows(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val t = docs.select(col(idCol).as("doc_id"),
        explode(toks(col(textCol))).as("term"))
    val tf = t.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // dl via a window over the tf rows would re-shuffle; a second
    // aggregate on the same exchange is cheaper and AQE-reusable
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val postings = tf.join(dl, Seq("doc_id"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    val dfDelta = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val statsDelta = dl.agg(count(lit(1)).as("n_docs"),
      coalesce(sum("dl"), lit(0L)).as("dl_sum"))
    (postings, dfDelta, statsDelta)
  }

  /** Per-batch positional rows `(term, doc_id, positions)` — sorted
    * 0-based token offsets stored DELTA-ENCODED (first element
    * absolute, rest gaps — [[GraftFunctions.DeltaEncode]]), the payload
    * of the OPTIONAL `<table>_pos` table behind [[bm25PhraseQuery]].
    * Raw offsets are near-unique ints that defeat parquet dictionary
    * encoding; their gaps are small and repetitive, cutting the
    * positional build's dominant write volume (the measured +40%
    * positions tax at 10⁷ docs, BASELINE.md round-12 addendum). The
    * phrase query decodes with [[GraftFunctions.DeltaDecode]] — results
    * are bit-identical to the absolute-offset format. Kept separate
    * from the scoring postings so bag-of-words indexes never pay for
    * phrases they don't serve.
    */
  private def posRows(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol).as("doc_id"), posexplode(toks(col(textCol))))
      .groupBy(col("col"), col("doc_id"))
      .agg(GraftFunctions.deltaEnc(sort_array(collect_list(col("pos"))))
        .as("positions"))
      .select(col("col").as("term"), col("doc_id"), col("positions"))

  /** Build the persisted index. One tokenize scan; the postings land
    * bucketed by term so every later query joins co-located. A build is
    * a fresh index: any tombstone set left by a PRIOR index under the
    * same name is cleared AFTER the new tables have landed — otherwise
    * stale tombstones would silently delete ids from the new corpus at
    * query time. Clearing last (not first) means a build that FAILS
    * midway — a malformed corpus frame, a write error — cannot
    * un-delete documents on the still-standing old index: the old
    * tables and their tombstones survive an aborted build together.
    * (A failed build can leave partially rewritten index tables, as any
    * non-transactional multi-table overwrite can — re-run the build;
    * the deletion state is never the casualty.)
    *
    * `positions = true` additionally writes the `<table>_pos` positional
    * table (term-bucketed like the postings), enabling
    * [[bm25PhraseQuery]]; [[bm25Append]] and [[bm25FoldTombstones]]
    * maintain it automatically once present.
    *
    * `blockMax = true` builds the BLOCK-MAX layout (Ding & Suel,
    * "Faster top-k document retrieval using block-max indexes", WSDM
    * 2011 — the doc-aligned block form, adapted set-at-a-time): doc ids
    * must be integral; every posting gains `blk = doc_id div
    * blockWidth`, the files sort `(term, blk, doc_id)` within buckets,
    * and two side tables land —
    *  - `<table>_blkmax` `(term, blk, max_tf, min_dl)` delta rows
    *    (term-bucketed, append-folded like `_terms`): per-block score
    *    UPPER BOUNDS, because BM25's per-doc weight is monotone ↑ in tf
    *    and ↓ in dl, so w(max_tf, min_dl) ≥ w(tf, dl) for every posting
    *    in the block under ANY (N, avgdl, df) constants — the bounds
    *    survive appends (new deltas) and tombstones (deletes only
    *    shrink true scores) without rewrite;
    *  - `<table>_blkmeta` one `(block_w)` row — the layout marker and
    *    the query-side doc→blk derivation.
    * The layout is COST-ONLY: every query entry point returns
    * bit-identical results on either layout. What it buys
    * ([[bm25QueryMaxScore]] pass 2): the verified candidate set pushes
    * into the head terms' postings SCAN as per-value `doc_id IN` (or
    * `blk IN` past the per-value cap) — page-skippable against the
    * sorted files — instead of only gating post-scan via semi-join, and
    * `_blkmax` refines candidates per block before anything scans.
    */
  def bm25Build(docs: DataFrame, idCol: String, textCol: String,
                table: String, buckets: Int = 8,
                positions: Boolean = false,
                blockMax: Boolean = false,
                blockWidth: Long = 4096L): Unit = {
    val spark = docs.sparkSession
    GraftFunctions.ensureRegistered(spark)
    require(blockWidth >= 1, s"blockWidth must be >= 1, got $blockWidth")
    val (postings, dfDelta, statsDelta) = indexRows(docs, idCol, textCol)
    if (blockMax) {
      val idType = postings.schema("doc_id").dataType
      require(idType == org.apache.spark.sql.types.LongType ||
          idType == org.apache.spark.sql.types.IntegerType,
        s"bm25Build(blockMax = true) needs integral doc ids, got $idType")
      // the marker drops FIRST and rewrites LAST: any crash inside the
      // rebuild leaves an index with NO layout marker (queries serve
      // exactly, push disengaged) — never a marker whose block width
      // disagrees with the stored blk values (a wrong-width pushed
      // filter would skip postings it must not)
      if (tableExists(spark, s"${table}_blkmeta"))
        BucketedJoin.dropWithLocation(spark, s"${table}_blkmeta")
      val withBlk = postings.withColumn("blk",
        expr(s"CAST(doc_id AS BIGINT) div $blockWidth"))
      BucketedJoin.writeBucketed(withBlk, table, "term", buckets,
        sortCols = Seq("blk", "doc_id"), options = blockMaxWriteOptions)
      BucketedJoin.writeBucketed(
        withBlk.groupBy("term", "blk")
          .agg(max("tf").as("max_tf"), min("dl").as("min_dl")),
        s"${table}_blkmax", "term", buckets)
      import spark.implicits._
      BucketedJoin.writeBucketed(Seq(blockWidth).toDF("block_w"),
        s"${table}_blkmeta", "block_w", 1)
    } else {
      // a rebuild WITHOUT blockMax drops the prior layout's side tables
      // FIRST: a crash between the drop and the postings overwrite
      // leaves a blk-sorted table without its marker (queries simply
      // don't engage the push — exact), never a marker claiming a
      // layout the new files don't have
      for (s <- Seq("_blkmeta", "_blkmax"); t = s"$table$s";
           if tableExists(spark, t))
        BucketedJoin.dropWithLocation(spark, t)
      BucketedJoin.writeBucketed(postings, table, "term", buckets)
    }
    BucketedJoin.writeBucketed(dfDelta, s"${table}_terms", "term", buckets)
    BucketedJoin.writeBucketed(statsDelta, s"${table}_stats", "n_docs", 1)
    if (positions)
      // round 21 (guide §6 "partitioning and sort order on write"):
      // positional lists sort (term, doc_id) within buckets at the
      // block-max fine-page geometry, so a candidate doc push from
      // [[posGatedProbe]]'s fused candidate plane can PAGE-SKIP the
      // head terms' position lists the way the t49 layout skips
      // postings (pages inside a long term run carry tight doc_id
      // min/max ranges). Layout is COST-ONLY: results are
      // bit-identical on either layout; appends preserve the sort spec
      // from the catalog ([[BucketedJoin.appendBucketed]]).
      BucketedJoin.writeBucketed(posRows(docs, idCol, textCol),
        s"${table}_pos", "term", buckets,
        sortCols = Seq("doc_id"), options = blockMaxWriteOptions)
    else if (tableExists(spark, s"${table}_pos"))
      // a rebuild WITHOUT positions must not leave the prior index's
      // positional table answering for the new corpus
      BucketedJoin.dropWithLocation(spark, s"${table}_pos")
    Tombstones.clear(spark, table)
  }

  private def tableExists(spark: SparkSession, t: String): Boolean =
    spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(t))

  /** Parquet page geometry for the block-max postings files: the PAGE
    * is the unit parquet's column-index can skip, so fine pages ARE
    * the skippable blocks. At the default ~20k-row pages a 1e7-doc
    * head term is only ~15 pages per bucket — a few-hundred-doc
    * candidate push covers most of them and skips nothing; at 2048
    * rows per page the same term is ~150 pages per bucket and a sparse
    * candidate set skips the overwhelming majority. Page-header and
    * column-index overhead is a few bytes per page — noise against a
    * serving-optimized layout. Appends use the same geometry;
    * a tombstone-fold compaction rewrites at the session default
    * (coarser pages — a cost regression only, healed by rebuilding).
    */
  private val blockMaxWriteOptions =
    Map("parquet.page.row.count.limit" -> "2048")

  /** The block-max layout marker: the block width when `<table>_blkmeta`
    * exists (one-row control read), None for the plain layout. */
  private[operators] def blockMeta(spark: SparkSession,
                                   table: String): Option[Long] =
    if (!tableExists(spark, s"${table}_blkmeta")) None
    else Some(spark.table(s"${table}_blkmeta").head().getLong(0))

  /** [[blockMeta]] for a shard family, batched: ONE job reads every
    * present `_blkmeta` row (the per-call control-read discipline of
    * [[shardControlRows]] — S separate head() reads would pay S job
    * launches per query batch). Zero jobs when no shard has the
    * layout. */
  private def blockMetas(spark: SparkSession,
                         tables: Seq[String]): Seq[Option[Long]] = {
    val have = tables.map(t => tableExists(spark, s"${t}_blkmeta"))
    if (!have.exists(identity)) return tables.map(_ => None)
    val rows = tables.zipWithIndex.collect { case (t, i) if have(i) =>
      spark.table(s"${t}_blkmeta")
        .select(lit(i).as("i"), col("block_w")) }
      .reduce(_.unionByName(_)).collect()
    val m = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    tables.indices.map(m.get(_))
  }

  /** Driver-side doc→block derivation — MUST match the build-side
    * `doc_id div blockWidth` (Spark's integral `div` truncates toward
    * zero, as Scala's `/` does). */
  private def blkOf(docId: Any, w: Long): Long = docId match {
    case l: java.lang.Long => l.longValue() / w
    case i: java.lang.Integer => i.longValue() / w
    case other => sys.error(s"blockMax index with non-integral doc id " +
      s"$other — the build requires integral ids")
  }

  /** Materialize a bounded one-column id plan as (local frame, values),
    * collecting PRIMITIVES for the common id types instead of generic
    * Row objects (a 4M-candidate collect at the maxCandBroadcast dial
    * is a 32 MB long array, not hundreds of MB of boxed Rows). */
  private def materializeIds(spark: SparkSession,
                             plan: DataFrame): (DataFrame, Seq[Any]) = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val f = plan.schema.head
    val vals: Seq[Any] = f.dataType match {
      case LongType => plan.as[Long].collect().toIndexedSeq
      case IntegerType => plan.as[Int].collect().toIndexedSeq
      case StringType => plan.as[String].collect().toIndexedSeq
      case _ => plan.collect().toIndexedSeq.map(_.get(0))
    }
    (idFrame(spark, vals, f), vals)
  }

  /** A local one-column frame from already-collected id values. */
  private def idFrame(spark: SparkSession, vals: Seq[Any],
                      f: org.apache.spark.sql.types.StructField): DataFrame = {
    val rows = vals.map(v => org.apache.spark.sql.Row(v))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(f)))
  }

  /** Absorb a batch of NEW documents at O(batch) cost: postings and
    * dictionary deltas re-bucket into the standing layout
    * ([[BucketedJoin.appendBucketed]]), the stats delta appends one
    * row. Nothing existing is rewritten — df and (N, avgdl) fold at
    * query time. Id contract: append-only, doc ids immutable
    * (re-submitting an indexed id double-counts it, exactly the
    * [[Similarity.lshIndexAppend]] contract — run the dedup admission
    * check first in refresh flows).
    *
    * `repair = true` completes a CRASHED absorb of this same batch
    * (recovery path only, the refresh-loop replay contract): postings
    * append only the (term, doc_id) rows not already landed, and the
    * derived dictionary/stats tables are then REBUILT from the
    * postings ([[rebuildDerived]]) — a crashed run can leave a posting
    * row landed with its df delta missing or vice versa, and deltas
    * are not row-level repairable (the same term legitimately carries
    * one delta per epoch), so recomputing the derived state from the
    * one authoritative table is the only exact completion. O(index),
    * paid only on the crash-recovery epoch.
    */
  def bm25Append(spark: SparkSession, table: String, docs: DataFrame,
                 idCol: String, textCol: String,
                 repair: Boolean = false): Unit = {
    val (postings0, dfDelta, statsDelta) = indexRows(docs, idCol, textCol)
    // block-max twin: appended postings carry their blk, and the
    // `_blkmax` delta lands BEFORE the postings — a crash between the
    // two leaves bounds covering postings that never landed (slack,
    // never a wrong prune); the reverse order could leave postings in
    // blocks the refinement believes empty
    val blkW = blockMeta(spark, table)
    val postings = blkW.map(w => postings0.withColumn("blk",
      expr(s"CAST(doc_id AS BIGINT) div $w"))).getOrElse(postings0)
    def blkDelta(p: DataFrame): DataFrame = p.groupBy("term", "blk")
      .agg(max("tf").as("max_tf"), min("dl").as("min_dl"))
    if (repair && tableExists(spark, table)) {
      val missing = postings.join(
        spark.table(table).select("term", "doc_id"),
        Seq("term", "doc_id"), "left_anti")
      if (blkW.isDefined)
        // deltas are not row-level repairable (same argument as the
        // dictionary below) — recompute the bounds from the one
        // authoritative table; exact, O(index), crash-recovery only
        BucketedJoin.rewriteBucketed(spark, s"${table}_blkmax", "term") {
          _ => blkDelta(spark.table(table).unionByName(missing))
        }
      BucketedJoin.appendBucketed(missing, table, "term")
      rebuildDerived(spark, table)
    } else {
      if (blkW.isDefined)
        BucketedJoin.appendBucketed(blkDelta(postings),
          s"${table}_blkmax", "term")
      BucketedJoin.appendBucketed(postings, table, "term",
        options = if (blkW.isDefined) blockMaxWriteOptions else Map.empty)
      BucketedJoin.appendBucketed(dfDelta, s"${table}_terms", "term")
      BucketedJoin.appendBucketed(statsDelta, s"${table}_stats", "n_docs")
    }
    // positional twin rides the same absorb (row-level anti-join under
    // repair — positions are per-(term, doc) facts, not deltas, so
    // partial landings repair like postings, no derived rebuild needed)
    if (tableExists(spark, s"${table}_pos")) {
      val pr = posRows(docs, idCol, textCol)
      val rows = if (repair)
        pr.join(spark.table(s"${table}_pos").select("term", "doc_id"),
          Seq("term", "doc_id"), "left_anti")
      else pr
      // fine pages on the append files too (the sort spec itself is
      // preserved from the catalog by appendBucketed)
      BucketedJoin.appendBucketed(rows, s"${table}_pos", "term",
        options = blockMaxWriteOptions)
    }
  }

  /** Rebuild the derived dictionary/stats tables from the postings —
    * df = posting rows per term, stats = distinct (doc, dl) — exactly
    * what the accumulated deltas sum to. Tombstoned rows (if any) stay
    * INCLUDED, matching the delta tables' convention: the query-time
    * correction subtracts `postings ∩ tombstones` from either form
    * consistently. Crash-safe per table; idempotent.
    */
  private def rebuildDerived(spark: SparkSession, table: String): Unit = {
    BucketedJoin.rewriteBucketed(spark, s"${table}_terms", "term") { _ =>
      spark.table(table).groupBy("term").agg(count(lit(1)).as("df"))
    }
    BucketedJoin.rewriteBucketed(spark, s"${table}_stats", "n_docs") { _ =>
      spark.table(table).select("doc_id", "dl").distinct()
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum("dl"), lit(0L)).as("dl_sum"))
    }
  }

  /** Delete documents from the index: records their ids in the
    * [[Tombstones]] set — nothing else is written, which is the whole
    * crash story (see the query-side note on [[bm25Query]]: df/N/avgdl
    * corrections derive from `postings ∩ tombstones` at query time, so
    * any kill leaves queries consistent). Ids not in the index are
    * inert. Returns the number of newly tombstoned ids.
    */
  def bm25Delete(spark: SparkSession, table: String, ids: DataFrame,
                 idCol: String): Long =
    Tombstones.add(spark, table, ids, idCol)

  /** Physically fold the tombstones: the dictionary and stats tables
    * are RECOMPUTED from the retained postings (df = posting rows per
    * term; stats = distinct (doc, dl) — identical to what the deltas
    * sum to, minus the deleted docs), then the postings rewrite drops
    * the tombstoned rows, then the set clears. The recompute-then-
    * filter order is what makes a kill at any point re-runnable: every
    * derived table is a pure function of (postings, tombstones), and
    * re-running after the postings rewrite sees an empty intersection.
    * O(index) like any compaction — run on the compaction cadence.
    *
    * Crash window: between the first derived-table rewrite and the
    * postings rewrite, the derived tables already EXCLUDE the deleted
    * docs while [[bm25Query]]'s query-time correction would subtract
    * `postings ∩ tombstones` a second time (double-subtracted
    * df/N/avgdl → wrong scores). A `<table>_foldlock` marker brackets
    * the fold; [[bm25Query]] heals an abandoned lock by completing the
    * idempotent fold before serving — the [[BucketedJoin
    * .recoverCompacted]] heal-on-first-read discipline, lifted to the
    * multi-table fold.
    */
  def bm25FoldTombstones(spark: SparkSession, table: String): Unit =
    foldTombstonesImpl(spark, table, failAt = -1)

  /** Crash injected by [[foldTombstonesImpl]]'s test seam. */
  private[graft] final class InjectedFoldCrash(val at: Int)
    extends RuntimeException(s"injected fold crash after boundary $at")

  /** [[bm25FoldTombstones]] with a crash-injection seam: `failAt` ≥ 0
    * throws [[InjectedFoldCrash]] immediately AFTER the numbered
    * rewrite boundary — 0 lock write, 1 `_terms` rewrite, 2 `_stats`
    * rewrite, 3 postings rewrite, 4 `_pos` rewrite, 5 tombstone clear
    * (before lock release). The chaos spec drives every boundary in a
    * loop and asserts [[bm25Query]] heals to bit-identical scores;
    * production calls pass -1 (no injection).
    */
  private[graft] def foldTombstonesImpl(spark: SparkSession, table: String,
                                        failAt: Int): Unit = {
    def boundary(i: Int): Unit =
      if (failAt == i) throw new InjectedFoldCrash(i)
    val lock = s"${table}_foldlock"
    def lockExists = spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(lock))
    Tombstones.idSet(spark, table) match {
      case None =>
        // a fold that died between clearing the set and releasing the
        // lock already rewrote everything — just release
        if (lockExists) BucketedJoin.dropWithLocation(spark, lock)
      case Some(_) =>
        if (!lockExists)
          BucketedJoin.writeBucketed(
            spark.range(1).toDF("locked"), lock, "locked", 1)
        boundary(0)
        def retained() = Tombstones.filterOut(spark, table,
          spark.table(table), "doc_id")
        BucketedJoin.rewriteBucketed(spark, s"${table}_terms", "term") { _ =>
          retained().groupBy("term").agg(count(lit(1)).as("df"))
        }
        boundary(1)
        BucketedJoin.rewriteBucketed(spark, s"${table}_stats", "n_docs") { _ =>
          retained().select("doc_id", "dl").distinct()
            .agg(count(lit(1)).as("n_docs"),
              coalesce(sum("dl"), lit(0L)).as("dl_sum"))
        }
        boundary(2)
        BucketedJoin.rewriteBucketed(spark, table, "term") { df =>
          Tombstones.filterOut(spark, table, df, "doc_id")
        }
        boundary(3)
        if (tableExists(spark, s"${table}_pos"))
          BucketedJoin.rewriteBucketed(spark, s"${table}_pos", "term") { df =>
            Tombstones.filterOut(spark, table, df, "doc_id")
          }
        boundary(4)
        Tombstones.clear(spark, table)
        boundary(5)
        BucketedJoin.dropWithLocation(spark, lock)
    }
  }

  /** BM25 top-k over the persisted index. Output: (qid, doc_id,
    * score_micro, rnk) — micro-unit integer scores (see the object doc),
    * ranked (score desc, doc_id asc), ranks 1-based.
    *
    * Plan: the tokenized query terms shuffle TO the term buckets; the
    * dictionary fold (sum of df deltas) and both index joins are
    * zero-exchange over the index scans; partial scores move as
    * 24-byte rows into the same bounded top-k aggregate the ANN path
    * uses. The one driver-side action is the one-row stats fold.
    */
  /** `maxDfFrac` (default 1.0 = exact scoring over every query term):
    * query terms whose df exceeds `maxDfFrac · N` are PRUNED before the
    * postings join — static stop-term pruning, the classic lexical-
    * serving scale dial (the dynamic form is WAND). A term with df ≈ N
    * forces an O(N) scoring pass and contributes near-zero idf to the
    * final ranking. MEASURED (DevRetrieval, BASELINE.md round-12
    * serving curve + pushdown supersession): on a log-uniform
    * 131k-word corpus (stop-word head, df ≈ N), exact serving costs
    * 205 ms/q at 10⁶ docs and 3,394 ms/q at 10⁷ — bound by the head
    * terms' posting mass — while df≤1% pruning serves at 36 and
    * 109 ms/q, because with the dial engaged the query-term scan
    * pushdown narrows the index read to the surviving terms' row
    * groups and the cost tracks those posting lists, not the corpus.
    * No OOM at 10⁷ under a 4.6 GiB heap; treat the dial as the
    * latency/cost control, with memory exhaustion the expected failure
    * mode only at 10⁸+ df≈N posting lists. Results for a query whose
    * terms are ALL under the cap are bit-identical to exact.
    */
  def bm25Query(spark: SparkSession, table: String, queries: DataFrame,
                qidCol: String, textCol: String, k: Int,
                k1: Double = 1.2, b: Double = 0.75,
                maxDfFrac: Double = 1.0): DataFrame = {
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    GraftFunctions.ensureRegistered(spark)
    healFold(spark, table)
    val qt = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    // ---- FUSED control read (round 20, guide §2.4/§5): the pushable
    // term list and the corrected (N, Σdl) stats ride in ONE bounded
    // driver job — the pre-fusion form paid two (the pushableTerms
    // collect, then bm25Partials' stats read), each a fixed-latency
    // Spark job on the serving path. Same values, same fallbacks: an
    // over-cap term list still yields qterms = None (unpruned scans),
    // and an empty term list leaves the stats to the scoring path's
    // own read (degenerate batch, empty result either way).
    val (qterms, preStats) = ctrlTermsStats(spark, table, qt)
    bm25QueryPre(spark, table, qt, k, k1, b, maxDfFrac, qterms, preStats)
  }

  /** [[bm25Query]] after the control reads are in hand — the entry the
    * MaxScore fallbacks route through so an exact-routed batch never
    * re-pays the term-list and stats jobs its caller already ran
    * (round-20 control-plane fusion). Semantics identical to
    * [[bm25Query]] with the same (qt, qterms, stats) facts. */
  private def bm25QueryPre(spark: SparkSession, table: String,
                           qt: DataFrame, k: Int, k1: Double, b: Double,
                           maxDfFrac: Double, qterms: Option[Seq[String]],
                           preStats: Option[(Long, Long)]): DataFrame =
    Similarity.rankTopK(
        bm25Scored(spark, table, qt, k1, b, maxDfFrac, qterms,
          preStats = preStats), k)
      .select(col("qid"), col("nid").as("doc_id"),
        col("cos").cast("long").as("score_micro"),
        col("rank").as("rnk"))

  /** ONE bounded control job for the bag-of-words entry points: the
    * distinct query terms (capped like [[pushableTerms]]) crossJoined
    * with the one-row corrected stats frame, so both control facts
    * arrive in a single driver action. Empty term set → stats stay
    * unread (None), preserving the pre-fusion degenerate-path
    * behavior. */
  private def ctrlTermsStats(spark: SparkSession, table: String,
                             qt: DataFrame, maxPushTerms: Int = 1 << 12)
      : (Option[Seq[String]], Option[(Long, Long)]) = {
    val rows = qt.select("term").distinct().limit(maxPushTerms + 1)
      .crossJoin(correctedStatsFrame(spark, table))
      .collect()
    if (rows.isEmpty) (Some(Nil), None)
    else {
      val terms = rows.map(_.getString(0)).toSeq
      val stats = Some((rows.head.getLong(1), rows.head.getLong(2)))
      (if (terms.size > maxPushTerms) None else Some(terms), stats)
    }
  }

  /** The sharded form of [[ctrlTermsStats]]: pushed terms + the global
    * corrected stats fold in ONE bounded driver job, returning the
    * (N, avgdl, capped dict) triple [[shardedScored]] consumes. A
    * degenerate batch (no query terms) returns preFold = None and the
    * caller's [[foldShardStats]] fallback preserves the pre-fusion
    * behavior (including its empty-shards require). */
  private def ctrlTermsStatsSharded(spark: SparkSession,
                                    tables: Seq[String], qt: DataFrame,
                                    maxDfFrac: Double,
                                    maxPushTerms: Int = 1 << 12)
      : (Option[Seq[String]], Option[(Long, Double, DataFrame)]) = {
    GraftFunctions.unionGuard(spark)
    val statsF = tables.map(correctedStatsFrame(spark, _))
      .reduce(_.unionByName(_))
      .agg(coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(sum("s"), lit(0L)).as("s"))
    val rows = qt.select("term").distinct().limit(maxPushTerms + 1)
      .crossJoin(statsF).collect()
    if (rows.isEmpty) (Some(Nil), None)
    else {
      val terms = rows.map(_.getString(0)).toSeq
      val qterms =
        if (terms.size > maxPushTerms) None else Some(terms)
      val nDocs = rows.head.getLong(1)
      require(nDocs > 0, s"sharded query: every shard of $tables is empty")
      val avgdl = rows.head.getLong(2).toDouble / nDocs.toDouble
      val dict1 = foldShardDict(spark, tables, qterms)
      val dict = if (maxDfFrac < 1.0)
        dict1.filter(col("df") <= lit((maxDfFrac * nDocs).toLong))
      else dict1
      (qterms, Some((nDocs, avgdl, dict)))
    }
  }

  /** The MaxScore dial bundle — the four cost dials of
    * [[bm25QueryMaxScore]]/[[bm25ShardedQueryMaxScore]] as one value,
    * for callers that ROUTE through the pruned entry points rather
    * than call them directly (e.g. [[graft.operators.Fusion]]'s
    * `lexMaxScore` leg selector). Defaults are the entry points'
    * defaults; every dial is cost-only — any setting is exact.
    */
  // The four MaxScore cost-dial defaults, defined ONCE — referenced by
  // [[MaxScoreDials]] and both pruned entry points so a future change to
  // one cannot silently diverge from the others (Fusion's
  // `lexMaxScore = Some(MaxScoreDials())` is documented to mean "the
  // entry points' defaults").
  val DefaultEssentialDfFrac: Double = 0.01
  val DefaultMaxCandBroadcast: Long = 4L << 20
  val DefaultGateMinHeadMass: Long = 1L << 16
  val DefaultGateCandFrac: Double = 0.25

  case class MaxScoreDials(essentialDfFrac: Double = DefaultEssentialDfFrac,
                           maxCandBroadcast: Long = DefaultMaxCandBroadcast,
                           gateMinHeadMass: Long = DefaultGateMinHeadMass,
                           gateCandFrac: Double = DefaultGateCandFrac)

  /** [[bm25Query]] with EXACT MaxScore-style dynamic pruning (Turtle &
    * Flood, "Query evaluation: strategies and optimizations", IP&M
    * 1995 — the set-at-a-time batch form): results are bit-identical to
    * [[bm25Query]] at the same dials, but a query mixing RARE and HEAD
    * terms no longer pushes the head terms' full posting lists through
    * the partial-score shuffle and aggregate — the round-17-adjudicated
    * dominant cost of the scoring leg (BASELINE.md: the pushed scan →
    * partials → top-k machinery is 58% of bench_phrase and all of
    * bench_bm25).
    *
    * How the pruning stays exact. Per query, terms split into ESSENTIAL
    * (df ≤ `essentialDfFrac`·N, always at least the rarest term) and
    * NON-ESSENTIAL (the head). Every term's per-doc contribution is
    * bounded above by ub(t) = ⌈idf(t)·(k1+1)·10⁶⌉ micro-units (w < k1+1
    * for every tf, dl). Pass 1 scores the essential terms alone — rare
    * lists, cheap by construction — and one bounded control read takes
    * each query's k-th best essential-only sum L. If Σ_{t∈head} ub(t) <
    * L strictly, then at least k documents carrying an essential term
    * have FULL score ≥ L (full ≥ essential-only per doc), while any
    * document with NO essential term scores ≤ Σ ub < L — so the true
    * top-k live entirely inside pass 1's candidate docs, regardless of
    * tie-breaking. Pass 2 then scores ALL terms with the postings
    * doc-gated to those candidates (the phrase path's `docFilter`
    * semi-join, broadcast under `maxCandBroadcast`): the head terms'
    * partial mass shrinks from their df to the candidate count. Queries
    * that FAIL the check (all-head batches, fewer than k candidates, a
    * head mass too large to bound) fall back to the exact ungated plan
    * IN THE SAME JOB — per-query, not per-batch — and a batch with
    * nothing to prune short-circuits to [[bm25Query]] verbatim.
    *
    * Control plane: one bounded (qid, term, df) collect against the
    * tombstone-CORRECTED dictionary (corrections raise idf, so the
    * bound must use the corrected df — the same value scoring uses),
    * then ONE pass-1 execution. When the pass-1 output is provably
    * control-plane sized (Σ_engaged candBound ≤ `maxCandBroadcast`),
    * its (qid, nid, cos) rows collect ONCE and the k-th-best
    * threshold, the tightened candidate set, and the block-UB
    * refinement all derive locally — the round-20 fusion of what were
    * three separate pass-1 re-executions (BASELINE.md round-19: at the
    * 1e7 decade the engaged path was bound by per-batch driver control
    * latency, a third of it recomputation of this same aggregate).
    * Past that bound, a distributed top-k takes the k-th score and
    * pass 2 gates via shuffle semi-joins. Both control reads sit under
    * the [[maxControlRows]] cap, overflow → [[bm25Query]] fallback.
    * The collected dictionary slice is re-injected as a literal frame,
    * so neither pass re-plans the dictionary fold.
    *
    * Dials: `essentialDfFrac` positions the essential/head split — it
    * is a COST dial only (any split is exact; too low starves pass 1 of
    * candidates and forces fallbacks, too high makes pass 1 itself
    * expensive). The default 0.01 matches the measured df≤1% serving
    * knee (round-12 curve). `maxDfFrac` keeps [[bm25Query]]'s stop-term
    * contract: over-cap terms are DROPPED before anything else, so the
    * result equals bm25Query's at the same dial.
    *
    * COST GATE (all driver-side, from the already-collected control
    * rows — exactness never depends on it): a query only ENGAGES the
    * two-pass machinery when its head posting mass is worth
    * eliminating (Σ_{head} df ≥ `gateMinHeadMass`) AND the candidate
    * set genuinely shrinks it (Σ_{essential} df ≤
    * `gateCandFrac`·Σ_{head} df — when the rarest term's list is
    * nearly the corpus, gating pays semi-join cost to prune nothing).
    * Ungated queries run the exact single-pass leg. MEASURED
    * (DevMaxScore, 1e6-doc zipf, medians of 3): tail+head mixed
    * batches serve at 229 vs 2599 ms/q exact (11.3×, the head term's
    * 948k-row posting list gated to the tail candidates), while
    * without the gate natural first-3-token batches paid 1.32× for
    * pass-1 work their geometry couldn't repay and all-head batches
    * 1.06× for candidates ≈ corpus — both of which the gate routes to
    * the exact leg.
    */
  def bm25QueryMaxScore(spark: SparkSession, table: String,
                        queries: DataFrame, qidCol: String,
                        textCol: String, k: Int,
                        k1: Double = 1.2, b: Double = 0.75,
                        maxDfFrac: Double = 1.0,
                        essentialDfFrac: Double = DefaultEssentialDfFrac,
                        maxCandBroadcast: Long = DefaultMaxCandBroadcast,
                        gateMinHeadMass: Long = DefaultGateMinHeadMass,
                        gateCandFrac: Double = DefaultGateCandFrac): DataFrame = {
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    require(essentialDfFrac > 0.0 && essentialDfFrac <= 1.0,
      s"essentialDfFrac must be in (0, 1], got $essentialDfFrac")
    require(k >= 1, s"k must be positive, got $k")
    require(gateMinHeadMass >= 0,
      s"gateMinHeadMass must be non-negative, got $gateMinHeadMass")
    require(gateCandFrac > 0.0,
      s"gateCandFrac must be positive, got $gateCandFrac")
    GraftFunctions.ensureRegistered(spark)
    healFold(spark, table)
    val qt = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    val qterms = pushableTerms(spark, qt)
    // (round 21, the exact-cliff fix) an over-push-cap term list no
    // longer routes straight to the unpruned exact plan: the control
    // read below runs against the unpruned dictionary fold (the
    // term-bucketed `_terms` aggregate — vocabulary-bounded, one job)
    // and the batch chunks per qid below, each chunk re-deriving its
    // own pushed term list from the rows in hand.
    // ---- FUSED control read #1 (round 20, guide §2.4/§5): the
    // per-(qid, term) CORRECTED df rows AND the one-row corrected
    // stats in ONE bounded driver job (the stats frame crossJoins the
    // limited control frame — pre-fusion this was a separate action).
    // The fallback leg reuses qt/qterms/stats too, so an exact-routed
    // batch no longer re-pays the control jobs inside bm25Query.
    val qdf = qt.join(correctedDict(spark, table, qterms), Seq("term"))
      .select(col("qid"), col("term"), col("df"))
    // capped rows consume the control budget when the dial is on (round
    // 21, the sharded-form ADVICE fix applied here symmetrically): the
    // in-plan filter reads N from the same one-row stats frame — still
    // one driver job, and a batch whose CAPPED rows fit no longer
    // routes to the exact plan because its pruned head overflowed.
    val softCap = maxControlRows * msOverflowFactor
    val ctrlRows = (if (maxDfFrac < 1.0)
        qdf.crossJoin(correctedStatsFrame(spark, table))
          .filter(col("df") <= (lit(maxDfFrac) * col("n")).cast("long"))
          .limit(softCap + 1)
      else qdf.limit(softCap + 1)
        .crossJoin(correctedStatsFrame(spark, table)))
      .collect()
    val preStats = ctrlRows.headOption.map(r =>
      (r.getLong(3), r.getLong(4)))
    def exact() = bm25QueryPre(spark, table, qt, k, k1, b, maxDfFrac,
      qterms, preStats)
    if (ctrlRows.length > softCap) return exact()
    if (ctrlRows.isEmpty) return exact() // no indexed term anywhere
    val qdfRows = ctrlRows.map(r =>
      org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2)))
    val (nDocs, dlSum) = preStats.get
    require(nDocs > 0, s"bm25QueryMaxScore: index $table is empty")
    val avgdl = dlSum.toDouble / nDocs.toDouble
    // the stop-term dial, applied exactly where bm25Query applies it
    val capDf = if (maxDfFrac < 1.0) (maxDfFrac * nDocs).toLong
      else Long.MaxValue
    val rows = qdfRows.filter(_.getLong(2) <= capDf).toSeq
    // block-max layout facts, LAZY — forced only when pass 2 actually
    // engages with a materialized candidate set (an exact-routed batch,
    // plain or blockMax, pays zero control reads for the layout); the
    // fetch is the bounded (term, blk) → (max_tf, min_dl) slice the
    // refinement consumes
    lazy val bw = blockMeta(spark, table)
    def rank(chunkRows: Seq[org.apache.spark.sql.Row],
             chunkExact: () => DataFrame): DataFrame =
      maxScoreRank(spark, chunkRows, qdf.schema, k, k1, nDocs,
        essentialDfFrac, maxCandBroadcast, gateMinHeadMass, gateCandFrac,
        partials = (qtF, dictF, terms, docFilter, bcast, docVals) =>
          partialsWith(spark, table, qtF, k1, b, nDocs, avgdl, dictF,
            terms, docFilter, bcast, docVals,
            if (docVals.isDefined) bw else None),
        exact = chunkExact,
        b = b, avgdl = avgdl,
        blkInfoFn = () =>
          bw.map(w => (w, blkBoundsFetch(spark, Seq(table), _, _))))
    if (rows.length <= maxControlRows) rank(rows, () => exact())
    else {
      // ---- CHUNKED over-cap serving (round 21, the exact-cliff fix):
      // the batch packs into ≤ maxControlRows-row chunks per qid; each
      // chunk runs the verbatim two-pass machinery with its own pushed
      // term list and a chunk-local exact fallback (the chunk's
      // (qid, term) pairs re-injected as a literal frame — unindexed
      // terms contribute nothing either way, so the chunk plan's rows
      // equal the one-shot plan's for those qids).
      val (chunks, exactRows) = chunkRowsByQid(rows, maxControlRows)
      def chunkExact(rs: Seq[org.apache.spark.sql.Row]): DataFrame = {
        val qtLit = spark.createDataFrame(java.util.Arrays.asList(
          rs.map(r => org.apache.spark.sql.Row(r.get(0), r.get(1)))
            .distinct: _*),
          org.apache.spark.sql.types.StructType(qdf.schema.take(2)))
        bm25QueryPre(spark, table, qtLit, k, k1, b, maxDfFrac,
          Some(rs.map(_.getString(1)).distinct), preStats)
      }
      if (chunks.isEmpty) chunkExact(exactRows)
      else {
        val engaged = unionChunked(chunks,
          c => rank(c, () => chunkExact(c)))
        if (exactRows.isEmpty) engaged
        else engaged.unionByName(chunkExact(exactRows))
      }
    }
  }

  /** The bounded `(term, blk) → (max_tf, min_dl)` control slice behind
    * the block-UB refinement ([[maxScoreRank]]): the `_blkmax` deltas
    * of `tables`, pruned to the head terms and candidate blocks, folded
    * max/min — across shards the fold is still a valid upper bound (a
    * doc lives in ONE shard, and max-over-shards ≥ its own shard's
    * max). None when the slice exceeds [[maxControlRows]] (the
    * refinement then keeps every candidate — cost, never correctness).
    */
  private def blkBoundsFetch(spark: SparkSession, tables: Seq[String],
                             terms: Seq[String], blks: Seq[Long])
      : Option[Map[(String, Long), (Long, Long)]] = {
    if (terms.isEmpty || blks.isEmpty)
      return Some(Map.empty)
    val slice = tables.map(t =>
        pruneToTerms(spark.table(s"${t}_blkmax"), Some(terms)))
      .reduce(_.unionByName(_))
      .filter(col("blk").isin(blks: _*))
      .groupBy("term", "blk")
      .agg(max("max_tf").as("max_tf"), min("min_dl").as("min_dl"))
    val rows = slice.limit(maxControlRows + 1).collect()
    if (rows.length > maxControlRows) None
    else Some(rows.iterator.map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3))).toMap)
  }

  /** The shared two-pass MaxScore core behind [[bm25QueryMaxScore]] and
    * [[bm25ShardedQueryMaxScore]] — everything after the control rows
    * are in hand: per-query essential/head split, the cost gate, pass
    * 1, the threshold verification, pass 2 with the candidate doc-gate,
    * the exact leg for everyone else, final top-k. `rows` are the
    * collected (qid, term, df) control rows AFTER the stop-term dial;
    * `partials(qt, dict, qterms, docFilter, broadcastDocs)` is the
    * caller's scoring-leg builder (single table or shard union —
    * doc-disjoint shards make the per-(qid, doc) sums identical either
    * way, the t32 argument). `exact` is the caller's untouched
    * single-pass plan, returned whenever nothing engages or verifies.
    */
  /** One query's MaxScore plan facts, computed from the bounded
    * (qid, term, df) control rows: the essential term set (df ≤
    * essCap, always at least the rarest term), the head terms' summed
    * score upper bound in micro-units (`neSum` — what pass 1's k-th
    * best must beat), the candidate-count bound (Σ essential df), and
    * the head posting mass (Σ head df — what pass 2's doc gate
    * eliminates). */
  private final case class MsPlan(ess: Set[String], neSum: Long,
                                  candBound: Long, headMass: Long)

  private def maxScorePlans(rows: Seq[org.apache.spark.sql.Row],
                            nDocs: Long, k1: Double,
                            essentialDfFrac: Double): Map[Any, MsPlan] = {
    val essCap = math.max(1L, (essentialDfFrac * nDocs).toLong)
    def ubMicro(df: Long): Long = math.ceil(
      math.log((nDocs.toDouble - df + 0.5) / (df + 0.5) + 1.0)
        * (k1 + 1.0) * 1000000.0).toLong
    rows.groupBy(_.get(0)).map { case (qid, rs) =>
      val sorted = rs.sortBy(r => (r.getLong(2), r.getString(1)))
      val rarest = sorted.head.getString(1)
      val ess = sorted.iterator.filter(_.getLong(2) <= essCap)
        .map(_.getString(1)).toSet + rarest
      val neSum = sorted.iterator.filter(r => !ess(r.getString(1)))
        .map(r => ubMicro(r.getLong(2))).sum
      val candBound = sorted.iterator.filter(r => ess(r.getString(1)))
        .map(_.getLong(2)).sum
      val headMass = sorted.iterator.filter(r => !ess(r.getString(1)))
        .map(_.getLong(2)).sum
      (qid, MsPlan(ess, neSum, candBound, headMass))
    }
  }

  /** The COST GATE (entry-point scaladocs): a query engages the
    * two-pass plan only when its head mass is material and its
    * candidate set shrinks it; no query engaging → the single-pass
    * plan IS the right plan. */
  private def msEngages(p: MsPlan, gateMinHeadMass: Long,
                        gateCandFrac: Double): Boolean =
    p.neSum > 0L && p.headMass >= gateMinHeadMass &&
      p.candBound.toDouble <= gateCandFrac * p.headMass.toDouble

  private def maxScoreRank(spark: SparkSession,
      rows: Seq[org.apache.spark.sql.Row],
      qdfSchema: org.apache.spark.sql.types.StructType,
      k: Int, k1: Double, nDocs: Long,
      essentialDfFrac: Double, maxCandBroadcast: Long,
      gateMinHeadMass: Long, gateCandFrac: Double,
      partials: (DataFrame, DataFrame, Option[Seq[String]],
        Option[DataFrame], Boolean, Option[Seq[Any]]) => DataFrame,
      exact: () => DataFrame,
      b: Double = 0.75, avgdl: Double = 0.0,
      blkInfoFn: () => Option[(Long, (Seq[String], Seq[Long]) =>
        Option[Map[(String, Long), (Long, Long)]])] = () => None)
      : DataFrame = {
    if (rows.isEmpty) return exact() // every term over the dial
    val plans = maxScorePlans(rows, nDocs, k1, essentialDfFrac)
    def engages(p: MsPlan): Boolean =
      msEngages(p, gateMinHeadMass, gateCandFrac)
    if (!plans.valuesIterator.exists(engages)) return exact()
    // literal re-injection of the collected control rows: a LOCAL
    // relation (bounded by maxControlRows; Catalyst sees its size, so
    // the tiny query/dict sides broadcast into the postings joins)
    // from which both passes draw their query pairs and dictionary
    // slices without re-planning the dictionary fold
    def litFrame(rs: Seq[org.apache.spark.sql.Row]): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rs: _*), qdfSchema)
    def dictOf(rs: Seq[org.apache.spark.sql.Row]): DataFrame =
      litFrame(rs.groupBy(_.getString(1)).map(_._2.head).toSeq)
        .select("term", "df")
    // ---- pass 1: exact essential-only sums for the queries that
    // engage (pruned-scan pushdown narrowed to essential terms)
    val pruneQids = plans.filter(p => engages(p._2)).keySet
    val essRows = rows.filter(r =>
      pruneQids(r.get(0)) && plans(r.get(0)).ess(r.getString(1)))
    val essTerms = essRows.map(_.getString(1)).distinct
    val p1F = partials(litFrame(essRows).select("qid", "term"),
        dictOf(essRows), Some(essTerms), None, false, None)
      .groupBy("qid", "nid")
      .agg(sum("partial").cast("double").as("cos"))
    // ---- FUSED CONTROL PLANE (round 20): the engaged path's dominant
    // serving cost at the 1e7 decade is per-batch DRIVER CONTROL
    // LATENCY, not scan mass (BASELINE.md round-19 adjudication) — and
    // pass 1 was re-planned and re-EXECUTED up to three times per
    // batch: the k-th-score collect, the candidate materialization,
    // and the block-UB refinement's re-collect. Every one of those
    // facts is a function of the same (qid, nid, cos) set, so when
    // that set is PROVABLY control-plane sized (Σ_engaged candBound ≤
    // maxCandBroadcast — the dial under which the candidate ids were
    // going to be collected and broadcast anyway, so the triples cost
    // at most 3× the bytes the old path already pulled), collect pass
    // 1 ONCE and derive the threshold, the tightened candidate set,
    // and the refinement rows locally. One Spark job replaces three.
    // Batches past the bound keep the lazy plan-side flow below (they
    // route toward shuffle semi-joins, where per-consumer re-execution
    // is the price of staying distributed).
    val p1Bound = pruneQids.iterator.map(q => plans(q).candBound).sum
    val p1Local: Option[Array[org.apache.spark.sql.Row]] =
      if (p1Bound <= maxCandBroadcast) Some(p1F.collect()) else None
    // each query's k-th best pass-1 sum: local top-k over the fused
    // collect, or the bounded control read #2 of the lazy flow (the
    // k-th VALUE is order-insensitive under ties, so both forms read
    // the same L)
    val l1: Map[Any, Long] = p1Local match {
      case Some(rs) => rs.groupBy(_.get(0)).flatMap { case (q, qr) =>
        val top = qr.map(_.getDouble(2)).sorted(Ordering[Double].reverse)
        if (top.length >= k) Some(q -> top(k - 1).toLong) else None
      }
      case None => Similarity.rankTopK(p1F, k)
        .filter(col("rank") === k).select("qid", "cos")
        .collect().map(r => r.get(0) -> r.getDouble(1).toLong).toMap
    }
    val safeQids: Set[Any] = pruneQids.filter(q =>
      l1.get(q).exists(_ > plans(q).neSum)).toSet
    if (safeQids.isEmpty) return exact() // no query verified — one pass
    // ---- pass 2: safe queries score ALL their terms doc-gated to the
    // pass-1 candidates; everyone else runs the exact ungated plan in
    // the same job
    val safeRows = rows.filter(r => safeQids(r.get(0)))
    val otherRows = rows.filterNot(r => safeQids(r.get(0)))
    val safeTerms = safeRows.map(_.getString(1)).distinct
    // pass-2 candidate TIGHTENING (round 19): the per-doc MaxScore
    // test. A verified query's final k-th best score is >= its pass-1
    // threshold L (at least k docs already reach L on essential terms
    // alone), and a candidate's full score is bounded by essSum +
    // neSum — so a pass-1 doc with essSum < L − neSum sits STRICTLY
    // below the final k-th best and cannot place under any tie-break.
    // The k docs that set L survive by construction (essSum >= L >=
    // L − neSum), so every verified query keeps >= k candidates.
    // Everything downstream — the semi-join, the doc/blk scan push,
    // the block-UB refinement — operates on this smaller, still-exact
    // set; before round 19 EVERY pass-1 doc (bounded only by Σ
    // essential df) flowed into pass 2.
    def thresh(q: Any): Long = l1(q) - plans(q).neSum
    // BLOCK-UB REFINEMENT (blkInfo, block-max layout only), shared by
    // both candidate flows below: with the per-(query, candidate)
    // essential sums in hand, each candidate's bound sharpens from
    // essSum + Σ_head ub(t) to essSum + Σ_head bub(t, blk(d)) — the
    // block the doc actually lives in, whose (max_tf, min_dl) caps
    // the head contribution below the global ub. Drop d when even
    // that bound misses EVERY safe query's bar; exact by the same
    // monotonicity argument as the layout doc on [[bm25Build]]. The
    // one remaining control job here is the bounded `_blkmax` slice
    // fetch — the (qid, nid, cos) rows themselves arrive from the
    // caller (free on the fused path; one bounded collect on the lazy
    // one).
    def refineByBlocks(essRows2Opt: => Option[Array[org.apache.spark.sql.Row]],
                       nCand: Int): Option[Seq[Any]] =
      blkInfoFn().flatMap { case (bw, fetch) =>
        require(avgdl > 0.0, "maxScoreRank: blkInfoFn needs the " +
          "caller's avgdl (the refinement bound uses scoring's constants)")
        if (nCand > maxControlRows) None
        else essRows2Opt.flatMap { essRows2 =>
          val headDf: Map[Any, Seq[(String, Long)]] =
            rows.filter(r => safeQids(r.get(0)) &&
                !plans(r.get(0)).ess(r.getString(1)))
              .groupBy(_.get(0))
              .map { case (q, rs) =>
                q -> rs.map(r => (r.getString(1), r.getLong(2))) }
          val headTerms = headDf.valuesIterator.flatMap(_.map(_._1))
            .toSeq.distinct
          val blks = essRows2.map(r => blkOf(r.get(1), bw)).distinct.toSeq
          fetch(headTerms, blks).map { bounds =>
            def ubMicro(df: Long, maxTf: Long, minDl: Long): Long = {
              val idf = math.log((nDocs.toDouble - df + 0.5)
                / (df + 0.5) + 1.0)
              val w = maxTf * (k1 + 1.0) /
                (maxTf + k1 * (1.0 - b + b * minDl / avgdl))
              math.ceil(idf * w * 1000000.0).toLong
            }
            essRows2.iterator.filter { r =>
              val (q, d, ess) = (r.get(0), r.get(1), r.getDouble(2).toLong)
              val blk = blkOf(d, bw)
              val headBound = headDf.getOrElse(q, Nil).iterator.map {
                case (t, df) => bounds.get((t, blk))
                  .map { case (mt, md) => ubMicro(df, mt, md) }
                  .getOrElse(0L) // no block row — no posting, 0
              }.sum
              ess + headBound >= l1(q) // keep unless strictly below
            }.map(_.get(1)).toSeq.distinct
          }
        }
      }
    val candBound = safeQids.iterator.map(q => plans(q).candBound).sum
    val bcastCand = p1Local.isDefined || candBound <= maxCandBroadcast
    // On the broadcast path, MATERIALIZE the candidate set once (it is
    // ≤ candBound ≤ maxCandBroadcast rows of one long by construction)
    // instead of handing the plan to the partials callback: a sharded
    // caller embeds the docFilter into EVERY shard leg, so the
    // plan-side form carries S copies of the S-leg pass-1 union —
    // an S² plan/execution blowup, invisible at the S=2 gates and
    // measured as a multi-minute single-core planning hang at S=32
    // (BASELINE.md round-18, DevShardGrowth `ms`). The literal keeps
    // pass 2's legs O(S) total. Over-cap batches keep the lazy plan
    // (they route to shuffle semi-joins, where the join input is
    // computed once per leg by necessity).
    val (candDocs, candVals) = p1Local match {
      case Some(rs) =>
        // fused flow — zero additional pass-1 work: the round-19
        // per-doc tightening (cos ≥ L − neSum, the same bar the lazy
        // flow's thresh-join applies) and the refinement both run on
        // the already-collected rows
        val candRows = rs.filter(r => safeQids(r.get(0)) &&
          r.getDouble(2) >= thresh(r.get(0)).toDouble)
        val vals0: Seq[Any] = candRows.map(_.get(1)).toSeq.distinct
        val docF = org.apache.spark.sql.types.StructField("doc_id",
          p1F.schema("nid").dataType, p1F.schema("nid").nullable)
        refineByBlocks(Some(candRows), vals0.size) match {
          case Some(kept) if kept.size < vals0.size =>
            (idFrame(spark, kept, docF), Some(kept))
          case _ => (idFrame(spark, vals0, docF), Some(vals0))
        }
      case None =>
        val threshRows = safeQids.iterator.map { q =>
          org.apache.spark.sql.Row(q, java.lang.Long.valueOf(thresh(q)))
        }.toSeq
        val threshF = spark.createDataFrame(
          java.util.Arrays.asList(threshRows: _*),
          org.apache.spark.sql.types.StructType(Seq(qdfSchema.head,
            org.apache.spark.sql.types.StructField("thresh",
              org.apache.spark.sql.types.LongType, nullable = false))))
        // the inner join against the tiny thresh frame both restricts
        // to the safe qids (the old left_semi) and attaches each
        // query's bar
        def candEss() = p1F.join(threshF, Seq("qid"))
          .filter(col("cos") >= col("thresh").cast("double"))
        val candDocsPlan = candEss().select(col("nid").as("doc_id"))
          .distinct()
        if (!bcastCand) (candDocsPlan, None) else {
          // ids first, primitives ([[materializeIds]]); the refinement
          // only RE-reads pass 1 when the tightened set is small
          // enough that the extra control job is noise — and the
          // collect itself is hard-bounded (the rows scale as
          // Σ_q candidates(q), which safeQids × a large batch can push
          // past what the per-doc gate alone implies)
          val (f0, vals0) = materializeIds(spark, candDocsPlan)
          val refined: Option[Seq[Any]] = refineByBlocks({
            val cap = maxControlRows * 8
            val essRows2 = candEss().select("qid", "nid", "cos")
              .limit(cap + 1).collect()
            if (essRows2.length > cap) None else Some(essRows2)
          }, vals0.size)
          refined match {
            case Some(kept) if kept.size < vals0.size =>
              (idFrame(spark, kept, candDocsPlan.schema.head), Some(kept))
            case _ => (f0, Some(vals0))
          }
        }
    }
    val scoredSafe = partials(litFrame(safeRows).select("qid", "term"),
      dictOf(safeRows), Some(safeTerms), Some(candDocs), bcastCand,
      candVals)
    val scored = if (otherRows.isEmpty) scoredSafe else {
      val otherTerms = otherRows.map(_.getString(1)).distinct
      scoredSafe.unionByName(partials(
        litFrame(otherRows).select("qid", "term"), dictOf(otherRows),
        Some(otherTerms), None, false, None))
    }
    Similarity.rankTopK(
        scored.groupBy("qid", "nid")
          .agg(sum("partial").cast("double").as("cos")), k)
      .select(col("qid"), col("nid").as("doc_id"),
        col("cos").cast("long").as("score_micro"),
        col("rank").as("rnk"))
  }

  /** [[bm25ShardedQuery]] with the MaxScore two-pass pruning of
    * [[bm25QueryMaxScore]] — the sharded serving layer's head-term
    * dial. The control plane stays the t32 shape: ONE global stats+df
    * fold across the shard dictionaries ([[foldShardStats]]), one
    * bounded control collect from the folded (therefore
    * tombstone-corrected, dial-filtered) dictionary; both passes union
    * per-shard [[partialsWith]] legs scored against the injected
    * GLOBAL constants, so every per-(query, doc) sum is the
    * whole-index value and the exactness argument of the single-index
    * form carries over verbatim (doc-disjoint shards never split a
    * document's sum). The candidate doc-gate applies per shard leg —
    * each shard's head postings semi-join down to the candidates that
    * live in THAT shard, which is exactly where the saved aggregate
    * mass was. Same dials, same per-query fallback, same
    * bit-identical-to-[[bm25ShardedQuery]] contract (gated at t45).
    */
  def bm25ShardedQueryMaxScore(spark: SparkSession, tables: Seq[String],
                               queries: DataFrame, qidCol: String,
                               textCol: String, k: Int,
                               k1: Double = 1.2, b: Double = 0.75,
                               maxDfFrac: Double = 1.0,
                               essentialDfFrac: Double = DefaultEssentialDfFrac,
                               maxCandBroadcast: Long = DefaultMaxCandBroadcast,
                               gateMinHeadMass: Long = DefaultGateMinHeadMass,
                               gateCandFrac: Double = DefaultGateCandFrac): DataFrame = {
    require(tables.nonEmpty,
      "bm25ShardedQueryMaxScore needs at least one shard")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    require(essentialDfFrac > 0.0 && essentialDfFrac <= 1.0,
      s"essentialDfFrac must be in (0, 1], got $essentialDfFrac")
    require(k >= 1, s"k must be positive, got $k")
    GraftFunctions.ensureRegistered(spark)
    tables.foreach(healFold(spark, _))
    val qt = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    val qterms = pushableTerms(spark, qt)
    def exactPre(preFold: Option[(Long, Double, DataFrame)]) =
      bm25ShardedQueryPre(spark, tables, qt, k, k1, b, maxDfFrac,
        qterms, preFold)
    // (round 21, the exact-cliff fix) over-push-cap term lists proceed
    // to the control read (unpruned dict fold, vocabulary-bounded) and
    // chunk per qid below instead of routing straight to exact.
    // the t32 global fold: (N, avgdl) across shard stats, per-term df
    // across shard dictionaries — FUSED (round 20): the one-row stats
    // frame crossJoins the bounded qdf control frame so both control
    // facts arrive in ONE driver job (pre-fusion: a separate stats
    // action). The stop-term dial applies locally post-collect — the
    // single-index pattern, row-identical to the dict-side filter.
    val (statsF, dict) = foldShardStatsFrame(spark, tables, qterms)
    val qdf = qt.join(dict, Seq("term"))
      .select(col("qid"), col("term"), col("df"))
    // The maxControlRows limit applies to the CAPPED rows when the
    // stop-term dial is on (round 21, ADVICE): the dial's pruned head
    // terms must not consume the control budget and silently route a
    // servable batch to the exact plan — the in-plan filter reads N
    // from the same one-row stats frame, so it is still ONE driver job
    // and row-identical to the pre-fusion capped-dict join.
    val softCapS = maxControlRows * msOverflowFactor
    val ctrlRows = (if (maxDfFrac < 1.0)
        qdf.crossJoin(statsF)
          .filter(col("df") <= (lit(maxDfFrac) * col("n")).cast("long"))
          .limit(softCapS + 1)
      else qdf.limit(softCapS + 1).crossJoin(statsF))
      .collect()
    if (ctrlRows.isEmpty) return exactPre(None)
    val nDocs = ctrlRows.head.getLong(3)
    require(nDocs > 0, s"sharded query: every shard of $tables is empty")
    val avgdl = ctrlRows.head.getLong(4).toDouble / nDocs.toDouble
    val capDfS = if (maxDfFrac < 1.0) (maxDfFrac * nDocs).toLong
      else Long.MaxValue
    val cappedDict = if (maxDfFrac < 1.0)
      dict.filter(col("df") <= lit(capDfS)) else dict
    // fallback legs reuse the fold (capped dict where the dial is on) —
    // including the OVER-CAP route (round 21, ADVICE): the global
    // (N, Σdl) already sits in ctrlRows.head, so the exact fallback
    // must not re-pay the foldShardStats driver job the fused read ran.
    def exact() = exactPre(Some((nDocs, avgdl, cappedDict)))
    if (ctrlRows.length > softCapS) return exact()
    val qdfRows = ctrlRows.iterator
      .map(r => org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2)))
      .filter(_.getLong(2) <= capDfS).toArray
    // the head-mass knee is PER SHARD LEG: each leg prunes only its own
    // 1/S share of a head term's postings while paying its own
    // two-pass overhead, so the GLOBAL engagement threshold scales
    // with S. Measured (DevShardGrowth `ms`, 1e6 × S=32 mixed batch):
    // with the unscaled gate the global mass engages but per-leg head
    // lists are ~1/32 of the single-index knee — pruning read 1.26×
    // the exact leg and 1.79× the grouped one; the scaled gate routes
    // that batch to the exact plan. At production shard sizes (per-leg
    // head mass over the knee) the gate engages exactly as before.
    // per-shard block-max facts (one batched control job, zero on
    // plain layouts, LAZY — forced only when pass 2 engages); the UB
    // refinement needs ONE family-wide block width — mixed or absent
    // widths disable it (the per-leg scan push still engages wherever
    // a shard carries the layout)
    lazy val bws = blockMetas(spark, tables)
    def uniW = if (bws.forall(_.isDefined) && bws.flatten.distinct.size == 1)
      bws.head else None
    def rank(chunkRows: Seq[org.apache.spark.sql.Row],
             chunkExact: () => DataFrame): DataFrame =
      maxScoreRank(spark, chunkRows, qdf.schema, k, k1, nDocs,
        essentialDfFrac, maxCandBroadcast,
        gateMinHeadMass * tables.size, gateCandFrac,
        partials = (qtF, dictF, terms, docFilter, bcast, docVals) =>
          tables.zipWithIndex.map { case (t, i) =>
            partialsWith(spark, t, qtF, k1, b, nDocs,
              avgdl, dictF, terms, docFilter, bcast, docVals,
              if (docVals.isDefined) bws(i) else None) }
            .reduce(_.unionByName(_)),
        exact = chunkExact,
        b = b, avgdl = avgdl,
        blkInfoFn = () =>
          uniW.map(w => (w, blkBoundsFetch(spark, tables, _, _))))
    if (qdfRows.length <= maxControlRows) rank(qdfRows.toSeq, () => exact())
    else {
      // CHUNKED over-cap serving — the single-index form's round-21
      // exact-cliff fix applied to the sharded entry: per-qid chunks,
      // each with a chunk-local exact fallback reusing the fused fold.
      val (chunks, exactRows) = chunkRowsByQid(qdfRows.toSeq, maxControlRows)
      def chunkExact(rs: Seq[org.apache.spark.sql.Row]): DataFrame = {
        val qtLit = spark.createDataFrame(java.util.Arrays.asList(
          rs.map(r => org.apache.spark.sql.Row(r.get(0), r.get(1)))
            .distinct: _*),
          org.apache.spark.sql.types.StructType(qdf.schema.take(2)))
        bm25ShardedQueryPre(spark, tables, qtLit, k, k1, b, maxDfFrac,
          Some(rs.map(_.getString(1)).distinct),
          Some((nDocs, avgdl, cappedDict)))
      }
      if (chunks.isEmpty) chunkExact(exactRows)
      else {
        val engaged = unionChunked(chunks,
          c => rank(c, () => chunkExact(c)))
        if (exactRows.isEmpty) engaged
        else engaged.unionByName(chunkExact(exactRows))
      }
    }
  }

  /** [[bm25ShardedQueryMaxScore]] × [[bm25ShardedQueryGrouped]] — the
    * round-18 composition the 100 TB serving story needs at high S:
    * plan-parallel grouped legs (the S ≥ 32 planning-cost fix, round
    * 17's superlinear-in-S measurement) AND MaxScore head-term pruning
    * (the per-leg scoring-cost fix) on the SAME query batch. Until
    * this entry the two dials were mutually exclusive
    * (Fusion loudly rejected the pair).
    *
    * Mechanism: the control plane is [[bm25ShardedQueryMaxScore]]'s
    * verbatim (ONE global stats+df fold, one bounded control collect,
    * per-query plans and the cost gate computed from GLOBAL df) —
    * then each of the two passes runs as a plan-parallel grouped
    * stage ([[groupedTopKRows]]): every shard group plans its own
    * essential-sum (pass 1) and candidate-gated full-sum (pass 2)
    * legs in its own driver thread and collects an exact group-local
    * top-k. Exactness composes from the two standing arguments:
    *  - doc-disjoint shards never split a (query, doc) sum, so a
    *    group's per-doc sums are the whole-index values and a group
    *    top-k preserves every global winner (the
    *    [[bm25ShardedQueryGrouped]] merge argument) — applied to
    *    pass 1, the merged per-query k-th best IS the global k-th
    *    best essential-only score, the only fact the MaxScore
    *    threshold verification reads;
    *  - the pass-2 candidate gate is per-group the intersection of
    *    the global candidate set with the group's docs (again
    *    disjointness), so gating each group's head postings by its
    *    OWN pass-1 candidates equals the single-plan form's global
    *    gate.
    * Per-query fallback, dial semantics, and the bit-identical-to-
    * [[bm25ShardedQuery]] contract all carry over (gated at t48).
    * EAGER like the grouped entries (bounded collects: queries·k rows
    * per group per pass).
    */
  def bm25ShardedQueryMaxScoreGrouped(spark: SparkSession,
                                      tables: Seq[String],
                                      queries: DataFrame, qidCol: String,
                                      textCol: String, k: Int,
                                      k1: Double = 1.2, b: Double = 0.75,
                                      maxDfFrac: Double = 1.0,
                                      essentialDfFrac: Double =
                                        DefaultEssentialDfFrac,
                                      maxCandBroadcast: Long =
                                        DefaultMaxCandBroadcast,
                                      gateMinHeadMass: Long =
                                        DefaultGateMinHeadMass,
                                      gateCandFrac: Double =
                                        DefaultGateCandFrac,
                                      parallelism: Int = 8): DataFrame = {
    require(tables.nonEmpty,
      "bm25ShardedQueryMaxScoreGrouped needs at least one shard")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    require(essentialDfFrac > 0.0 && essentialDfFrac <= 1.0,
      s"essentialDfFrac must be in (0, 1], got $essentialDfFrac")
    require(k >= 1, s"k must be positive, got $k")
    GraftFunctions.ensureRegistered(spark)
    tables.foreach(healFold(spark, _))
    def exactG() = bm25ShardedQueryGrouped(spark, tables, queries,
      qidCol, textCol, k, k1, b, maxDfFrac, parallelism)
    val qt = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    val qterms = pushableTerms(spark, qt)
    if (qterms.isEmpty) return exactG()
    // FUSED control read (round 20): stats frame crossJoined onto the
    // bounded qdf collect — one driver job for both control facts,
    // the bm25ShardedQueryMaxScore pattern (dial cap applied locally)
    val (statsF, dict) = foldShardStatsFrame(spark, tables, qterms)
    val qdf = qt.join(dict, Seq("term"))
      .select(col("qid"), col("term"), col("df"))
    // capped rows consume the control budget when the dial is on — the
    // bm25ShardedQueryMaxScore fix (round 21, ADVICE), same one job
    val ctrlRows = (if (maxDfFrac < 1.0)
        qdf.crossJoin(statsF)
          .filter(col("df") <= (lit(maxDfFrac) * col("n")).cast("long"))
          .limit(maxControlRows + 1)
      else qdf.limit(maxControlRows + 1).crossJoin(statsF))
      .collect()
    if (ctrlRows.length > maxControlRows || ctrlRows.isEmpty)
      return exactG()
    val nDocs = ctrlRows.head.getLong(3)
    require(nDocs > 0, s"sharded query: every shard of $tables is empty")
    val avgdl = ctrlRows.head.getLong(4).toDouble / nDocs.toDouble
    val capDfS = if (maxDfFrac < 1.0) (maxDfFrac * nDocs).toLong
      else Long.MaxValue
    val qdfRows = ctrlRows.iterator
      .map(r => org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2)))
      .filter(_.getLong(2) <= capDfS).toArray
    // per-leg head-mass knee, as in [[bm25ShardedQueryMaxScore]];
    // per-shard block-max widths feed each leg's scan push (lazy —
    // exact-routed batches never read them)
    lazy val bws = blockMetas(spark, tables)
    maxScoreRankGrouped(spark, qdfRows.toSeq, qdf.schema, k, k1, nDocs,
      essentialDfFrac, maxCandBroadcast,
      gateMinHeadMass * tables.size, gateCandFrac,
      shardGroups(tables.size, parallelism),
      partialsFor = (i, qtF, dictF, terms, docFilter, bcast, docVals) =>
        partialsWith(spark, tables(i), qtF, k1, b, nDocs, avgdl, dictF,
          terms, docFilter, bcast, docVals,
          if (docVals.isDefined) bws(i) else None),
      exact = () => exactG())
  }

  /** The grouped two-pass core behind
    * [[bm25ShardedQueryMaxScoreGrouped]] — [[maxScoreRank]]'s exact
    * flow with each pass run as a [[groupedTopKRows]] stage (plan
    * parallelism) instead of one S-leg union plan. `partialsFor`
    * builds ONE shard's partials frame; grouping composes the legs
    * per driver thread. See the entry point's scaladoc for the
    * exactness argument.
    */
  private def maxScoreRankGrouped(spark: SparkSession,
      rows: Seq[org.apache.spark.sql.Row],
      qdfSchema: org.apache.spark.sql.types.StructType,
      k: Int, k1: Double, nDocs: Long,
      essentialDfFrac: Double, maxCandBroadcast: Long,
      gateMinHeadMass: Long, gateCandFrac: Double,
      groups: Seq[Seq[Int]],
      partialsFor: (Int, DataFrame, DataFrame, Option[Seq[String]],
        Option[DataFrame], Boolean, Option[Seq[Any]]) => DataFrame,
      exact: () => DataFrame): DataFrame = {
    if (rows.isEmpty) return exact()
    val plans = maxScorePlans(rows, nDocs, k1, essentialDfFrac)
    def engages(p: MsPlan): Boolean =
      msEngages(p, gateMinHeadMass, gateCandFrac)
    if (!plans.valuesIterator.exists(engages)) return exact()
    def litFrame(rs: Seq[org.apache.spark.sql.Row]): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rs: _*), qdfSchema)
    def dictOf(rs: Seq[org.apache.spark.sql.Row]): DataFrame =
      litFrame(rs.groupBy(_.getString(1)).map(_._2.head).toSeq)
        .select("term", "df")
    val pruneQids = plans.filter(p => engages(p._2)).keySet
    val essRows = rows.filter(r =>
      pruneQids(r.get(0)) && plans(r.get(0)).ess(r.getString(1)))
    val essTerms = essRows.map(_.getString(1)).distinct
    def p1group(g: Seq[Int]): DataFrame =
      g.map(i => partialsFor(i, litFrame(essRows).select("qid", "term"),
          dictOf(essRows), Some(essTerms), None, false, None))
        .reduce(_.unionByName(_))
        .groupBy("qid", "nid")
        .agg(sum("partial").cast("double").as("cos"))
    // ---- FUSED CONTROL PLANE, grouped form (round 20 — see
    // [[maxScoreRank]]): when the pass-1 output is provably
    // control-plane sized, each group collects its FULL bounded
    // (qid, nid, cos) rows ONCE — the merged rows give the global
    // k-th best (by doc-disjointness, same value the per-group top-k
    // merge read), and each group's pass-2 candidate set derives
    // locally from its own rows instead of re-planning and
    // re-executing the group's pass-1 union inside p2group. One
    // pass-1 execution per group instead of two.
    val p1Bound = pruneQids.iterator.map(q => plans(q).candBound).sum
    val p1ByGroup: Option[(org.apache.spark.sql.types.StructType,
        Map[Seq[Int], Array[org.apache.spark.sql.Row]])] =
      if (p1Bound <= maxCandBroadcast)
        Some(groupedCollectRows(groups)(g =>
          p1group(g).select(col("qid"), col("nid"), col("cos"))))
      else None
    // ---- pass 1 (grouped): each group's exact local top-k of the
    // essential-only sums; the merged per-query k-th best is the
    // GLOBAL k-th best (each global top-k member survives its own
    // group's top-k), the only fact the threshold verification reads
    val p1rows: Seq[org.apache.spark.sql.Row] = p1ByGroup match {
      case Some((_, m)) => m.valuesIterator.flatten.toSeq
      case None => groupedTopKRows(k, groups)(p1group)._2
    }
    val l1: Map[Any, Long] = p1rows.groupBy(_.get(0)).flatMap {
      case (q, rs) =>
        val top = rs.map(_.getDouble(2)).sorted(Ordering[Double].reverse)
        if (top.length >= k) Some(q -> top(k - 1).toLong) else None
    }
    val safeQids: Set[Any] = pruneQids.filter(q =>
      l1.get(q).exists(_ > plans(q).neSum)).toSet
    if (safeQids.isEmpty) return exact()
    val safeRows = rows.filter(r => safeQids(r.get(0)))
    val otherRows = rows.filterNot(r => safeQids(r.get(0)))
    val safeTerms = safeRows.map(_.getString(1)).distinct
    val candBound = safeQids.iterator.map(q => plans(q).candBound).sum
    // the round-19 per-doc tightening, grouped form (see
    // [[maxScoreRank]]): L is the GLOBAL k-th best (merged above), so
    // the same essSum >= L − neSum bar applies within each group —
    // a group doc below it is below the global bar a fortiori
    val threshRows = safeQids.iterator.map { q =>
      org.apache.spark.sql.Row(q,
        java.lang.Long.valueOf(l1(q) - plans(q).neSum))
    }.toSeq
    val threshF = spark.createDataFrame(
      java.util.Arrays.asList(threshRows: _*),
      org.apache.spark.sql.types.StructType(Seq(qdfSchema.head,
        org.apache.spark.sql.types.StructField("thresh",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // ---- pass 2 (grouped): a group's head postings gate to its OWN
    // pass-1 candidates — by doc-disjointness exactly the global
    // candidate set restricted to the group's docs; unverified
    // queries run their exact ungated legs in the same group job
    val bcastCand = p1ByGroup.isDefined || candBound <= maxCandBroadcast
    def p2group(g: Seq[Int]): DataFrame = {
      // materialized per group on the broadcast path — the same S²
      // plan-blowup guard as [[maxScoreRank]]'s pass 2 (each group leg
      // would otherwise embed the group's whole pass-1 union). On the
      // fused path the group's candidates derive locally from its
      // already-collected pass-1 rows (zero additional pass-1 work);
      // otherwise ids collect as primitives. Either way the literal
      // feeds the per-leg scan push.
      val (candDocsG, candValsG) = p1ByGroup match {
        case Some((schema1, m)) =>
          val candRows = m(g).filter(r => safeQids(r.get(0)) &&
            r.getDouble(2) >= (l1(r.get(0)) - plans(r.get(0)).neSum)
              .toDouble)
          val vals: Seq[Any] = candRows.map(_.get(1)).toSeq.distinct
          val docF = org.apache.spark.sql.types.StructField("doc_id",
            schema1("nid").dataType, schema1("nid").nullable)
          (idFrame(spark, vals, docF), Some(vals))
        case None =>
          val candDocsGPlan = p1group(g)
            .join(threshF, Seq("qid"))
            .filter(col("cos") >= col("thresh").cast("double"))
            .select(col("nid").as("doc_id")).distinct()
          if (bcastCand) {
            val (f0, vals0) = materializeIds(spark, candDocsGPlan)
            (f0, Some(vals0))
          } else (candDocsGPlan, None)
      }
      val scoredSafe = g.map(i => partialsFor(i,
          litFrame(safeRows).select("qid", "term"), dictOf(safeRows),
          Some(safeTerms), Some(candDocsG), bcastCand, candValsG))
        .reduce(_.unionByName(_))
      val scored = if (otherRows.isEmpty) scoredSafe else {
        val otherTerms = otherRows.map(_.getString(1)).distinct
        scoredSafe.unionByName(g.map(i => partialsFor(i,
            litFrame(otherRows).select("qid", "term"), dictOf(otherRows),
            Some(otherTerms), None, false, None))
          .reduce(_.unionByName(_)))
      }
      scored.groupBy("qid", "nid")
        .agg(sum("partial").cast("double").as("cos"))
    }
    val (schema2, p2rows) = groupedTopKRows(k, groups)(p2group)
    val merged = spark.createDataFrame(
      java.util.Arrays.asList(p2rows: _*), schema2)
    Similarity.rankTopK(merged, k)
      .select(col("qid"), col("nid").as("doc_id"),
        col("cos").cast("long").as("score_micro"),
        col("rank").as("rnk"))
  }

  /** Multi-shard BM25 serving — the layout for a corpus whose index
    * cannot live in one table (measured: BASELINE.md round-15 — at 10⁸
    * docs the postings+positional index extrapolates to ~73 GB against
    * this box's 38 GB free; a 1000-executor cluster holds the same
    * index as per-executor-group shards). `tables` are independent
    * [[bm25Build]] indexes over a DOC-DISJOINT partition of the corpus
    * (a doc id must live in exactly one shard — the sharding contract).
    *
    * Results are EXACTLY the single whole-corpus index's (oracle-gated
    * at t32): corpus-level constants fold ACROSS shards — N and Σdl
    * from the shard stats rows (tombstone-corrected per shard), df as
    * the sum of the shard dictionaries' per-term counts — then every
    * shard scores its own postings against the GLOBAL constants and
    * the per-(query, doc) partials union (a doc's postings live in one
    * shard, so the union never splits a document's sum). The merge is
    * the same bounded top-k aggregate every serving path here uses —
    * per-shard candidate lists, k·|queries| rows, never corpus mass.
    * Scale shape: the stats fold reads S tiny tables, the dict fold S
    * dictionary slices pruned to the query terms, and each shard's
    * postings scan is the single-index plan verbatim (pushed-term
    * pruning included) — cost ≡ Σ shard serving costs, wall-clock ≡
    * max on a cluster where shards are separate executor groups.
    */
  def bm25ShardedQuery(spark: SparkSession, tables: Seq[String],
                       queries: DataFrame, qidCol: String, textCol: String,
                       k: Int, k1: Double = 1.2, b: Double = 0.75,
                       maxDfFrac: Double = 1.0): DataFrame = {
    require(tables.nonEmpty, "bm25ShardedQuery needs at least one shard")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    GraftFunctions.ensureRegistered(spark)
    tables.foreach(healFold(spark, _))
    val qt = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    // FUSED control read (round 20): pushed terms + the global stats
    // fold in ONE driver job; the dict fold stays plan-side
    val (qterms, preFold) = ctrlTermsStatsSharded(spark, tables, qt,
      maxDfFrac)
    val scored = shardedScored(spark, tables, qt, k1, b, maxDfFrac, qterms,
      docFilters = tables.map(_ => None), bcasts = tables.map(_ => false),
      preFold = preFold)
    Similarity.rankTopK(scored, k)
      .select(col("qid"), col("nid").as("doc_id"),
        col("cos").cast("long").as("score_micro"),
        col("rank").as("rnk"))
  }

  /** [[bm25ShardedQuery]] after the control reads are in hand — the
    * sharded-MaxScore fallback route (round-20 control-plane fusion):
    * an exact-routed batch reuses the caller's qt / pushed terms /
    * (N, avgdl, dict) fold instead of re-paying their driver jobs. */
  private def bm25ShardedQueryPre(spark: SparkSession,
                                  tables: Seq[String], qt: DataFrame,
                                  k: Int, k1: Double, b: Double,
                                  maxDfFrac: Double,
                                  qterms: Option[Seq[String]],
                                  preFold: Option[(Long, Double, DataFrame)])
      : DataFrame = {
    val scored = shardedScored(spark, tables, qt, k1, b, maxDfFrac, qterms,
      docFilters = tables.map(_ => None), bcasts = tables.map(_ => false),
      preFold = preFold)
    Similarity.rankTopK(scored, k)
      .select(col("qid"), col("nid").as("doc_id"),
        col("cos").cast("long").as("score_micro"),
        col("rank").as("rnk"))
  }

  /** [[bm25PhraseQuery]] over doc-disjoint shards — per-shard phrase
    * alignment (the match is doc-local, so a shard sees every
    * occurrence of its own docs), global-stats scoring, bounded top-k
    * merge. Same exactness contract as [[bm25ShardedQuery]]. The
    * truncation dial stays off (exact matching): per-shard df-based
    * sampling would diverge from the whole-index dial's semantics.
    */
  def bm25ShardedPhraseQuery(spark: SparkSession, tables: Seq[String],
                             queries: DataFrame, qidCol: String,
                             textCol: String, k: Int,
                             k1: Double = 1.2, b: Double = 0.75,
                             maxCandBroadcast: Long = 4L << 20,
                             gateMinPosMass: Long = 1L << 22): DataFrame = {
    require(tables.nonEmpty, "bm25ShardedPhraseQuery needs at least one shard")
    // batched control plane: every shard's bounded control rows in ONE
    // job (shardControlRows); each leg then runs collect-free
    val qt0 = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    val ctl = shardControlRows(spark, tables, qt0)
    val legs = tables.zipWithIndex.map { case (t, i) =>
      val (qoff, aligned, candFilter, bcast, qterms, _) = phraseAligned(spark,
        t, queries, qidCol, textCol, 1.0, maxCandBroadcast, gateMinPosMass,
        preQdfRows = Some(ctl(i)))
      (qoff, aligned.select(col("qid"), col("doc_id").as("nid")).distinct(),
        candFilter, bcast, qterms)
    }
    shardedPosRank(spark, tables, legs.head._1.select("qid", "term").distinct(),
      legs.map(l => (l._2, l._3, l._4)), legs.head._5, k, k1, b)
  }

  /** [[bm25ProximityQuery]] over doc-disjoint shards — per-shard window
    * covers (doc-local predicate), global-stats scoring, bounded top-k
    * merge (oracle-gated at t33). Same contracts as
    * [[bm25ShardedPhraseQuery]].
    *
    * `maxPosMass` is by default the FAMILY budget — each shard's gated
    * position mass is budgeted at `max(1, maxPosMass / S)`, so an
    * S-shard deployment carries the same total mass bound as the single
    * index it replaced (the single-index semantics a caller who never
    * thinks about shard counts expects; on a cluster where shards are
    * executor groups the honest per-box bound is the divided one too).
    * `perShardBudget = true` restores the legacy semantics: every shard
    * budgets `maxPosMass` independently — S× the family total, for
    * deployments sizing the budget per shard box. Either way the
    * truncation auto-route can engage on one shard while the others
    * stay exact (each routing shard names itself in its warn); the t33
    * "sharded ≡ whole" contract holds only while NO shard routes.
    */
  def bm25ShardedProximityQuery(spark: SparkSession, tables: Seq[String],
                                queries: DataFrame, qidCol: String,
                                textCol: String, k: Int, window: Int,
                                k1: Double = 1.2, b: Double = 0.75,
                                maxCandBroadcast: Long = 4L << 20,
                                gateMinPosMass: Long = 1L << 22,
                                maxPosMass: Long = 1L << 31,
                                perShardBudget: Boolean = false): DataFrame = {
    require(tables.nonEmpty,
      "bm25ShardedProximityQuery needs at least one shard")
    require(window >= 1 && window <= 256,
      s"window must be in [1, 256], got $window")
    val shardPosMass =
      if (perShardBudget || maxPosMass == Long.MaxValue) maxPosMass
      else math.max(1L, maxPosMass / tables.size)
    val qt0 = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    val qlenD = qt0.groupBy("qid").agg(count(lit(1)).as("qlen"))
    // batched control plane: one job for every shard's control rows,
    // one for every shard's stats (the NEAR budget's dial facts)
    val ctl = shardControlRows(spark, tables, qt0)
    val stats = shardStatRows(spark, tables)
    val legs = tables.zipWithIndex.map { case (t, i) =>
      val (anchorsInput, candFilter, bcast, qterms, _) = posGatedProbe(spark,
        t, qt0, s"bm25ShardedProximityQuery(shard=$t)", 1.0,
        maxCandBroadcast, gateMinPosMass, window = window,
        maxPosMass = shardPosMass, preQdfRows = Some(ctl(i)),
        preStats = Some(stats(i)))
      (proximityMatched(anchorsInput, qlenD, window), candFilter, bcast,
        qterms)
    }
    shardedPosRank(spark, tables, qt0,
      legs.map(l => (l._1, l._2, l._3)), legs.head._4, k, k1, b)
  }

  /** [[bm25ShardedQuery]] with the S shard legs PLANNED AND EXECUTED in
    * parallel driver-thread groups — the answer to the measured per-leg
    * Catalyst planning residual (BASELINE.md round-16 plan addendum:
    * ~0.24-0.35 s of PURE PLANNING per shard leg, because an S-table
    * union is ONE Catalyst plan built serially on the driver — at
    * O(100) shards that is ~25-35 s per query batch no matter how many
    * executors the scans parallelize over; the reference's JobConf-is-
    * the-plan never paid a per-query planning tax, SURVEY §3.1).
    *
    * Mechanics: the corpus constants (N, Σdl → avgdl, per-term df) fold
    * ONCE across ALL shards ([[foldShardStats]] — one Spark job), then
    * the shards partition into ⌈S/parallelism⌉-leg GROUPS, each of
    * which becomes its OWN plan: scored against the injected GLOBAL
    * constants (so every per-(query, doc) score is the single-index
    * value), ranked to the exact group-local top-k, and COLLECTED
    * (k·|queries| rows — bounded) in its own driver thread. Planning
    * and execution of the groups overlap across threads; the final
    * merge re-ranks the bounded union under the identical
    * (score desc, doc_id asc) total order — the
    * [[Similarity.mergeShardTopK]] exactness argument applied to
    * doc-disjoint GROUPS instead of shards. Results are EXACTLY
    * [[bm25ShardedQuery]]'s, row for row (spec-pinned).
    *
    * EAGER, by design: this entry executes at call time and returns the
    * merged top-k as a LOCAL frame (k·|queries|·⌈S/parallelism⌉ rows
    * pass through the driver — with the default k this is control-plane
    * mass). The lazy S-leg entry remains the right form when composing
    * into a larger plan or when a single plan per batch amortizes fine;
    * this one is for interactive/small-batch serving at high S, where
    * serial planning dominates.
    */
  def bm25ShardedQueryGrouped(spark: SparkSession, tables: Seq[String],
                              queries: DataFrame, qidCol: String,
                              textCol: String, k: Int,
                              k1: Double = 1.2, b: Double = 0.75,
                              maxDfFrac: Double = 1.0,
                              parallelism: Int = 8): DataFrame = {
    require(tables.nonEmpty, "bm25ShardedQueryGrouped needs at least one shard")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    GraftFunctions.ensureRegistered(spark)
    tables.foreach(healFold(spark, _))
    val qt = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    // FUSED control read (round 20): pushed terms + global stats fold
    // in ONE driver job (foldShardStats fallback on degenerate
    // batches); the dict fold stays plan-side
    val (qterms, preFold) = ctrlTermsStatsSharded(spark, tables, qt,
      maxDfFrac)
    val (nDocs, avgdl, dict) = preFold.getOrElse(
      foldShardStats(spark, tables, qterms, maxDfFrac))
    groupedRankMerge(spark, tables.size, parallelism, k) { g =>
      g.map(i => partialsWith(spark, tables(i), qt, k1, b, nDocs, avgdl,
          dict, qterms, docFilter = None, broadcastDocs = false))
        .reduce(_.unionByName(_))
        .groupBy("qid", "nid")
        .agg(sum("partial").cast("double").as("cos"))
    }
  }

  /** [[bm25ShardedPhraseQuery]] in the plan-parallel grouped form (see
    * [[bm25ShardedQueryGrouped]] — the positional legs carry the
    * heaviest per-leg planning, ~0.35 s each, so grouping pays off
    * most here). Control collects stay batched up front (ONE job for
    * all shards' control rows); each group's phrase alignment +
    * global-stats scoring plans in its own thread. EAGER; results
    * exactly [[bm25ShardedPhraseQuery]]'s.
    */
  def bm25ShardedPhraseQueryGrouped(spark: SparkSession,
                                    tables: Seq[String],
                                    queries: DataFrame, qidCol: String,
                                    textCol: String, k: Int,
                                    k1: Double = 1.2, b: Double = 0.75,
                                    maxCandBroadcast: Long = 4L << 20,
                                    gateMinPosMass: Long = 1L << 22,
                                    parallelism: Int = 8): DataFrame = {
    require(tables.nonEmpty,
      "bm25ShardedPhraseQueryGrouped needs at least one shard")
    val qt0 = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    val ctl = shardControlRows(spark, tables, qt0)
    val qterms = pushableTerms(spark, qt0)
    val (nDocs, avgdl, dict) = foldShardStats(spark, tables, qterms, 1.0)
    groupedRankMerge(spark, tables.size, parallelism, k) { g =>
      val legs = g.map { i =>
        val (_, aligned, candFilter, bcast, _, _) = phraseAligned(spark,
          tables(i), queries, qidCol, textCol, 1.0, maxCandBroadcast,
          gateMinPosMass, preQdfRows = Some(ctl(i)))
        (aligned.select(col("qid"), col("doc_id").as("nid")).distinct(),
          candFilter, bcast)
      }
      groupScored(spark, g.map(tables), qt0, k1, b, nDocs, avgdl, dict,
        qterms, legs)
    }
  }

  /** [[bm25ShardedProximityQuery]] in the plan-parallel grouped form
    * (see [[bm25ShardedQueryGrouped]]). Same divided `maxPosMass`
    * family-budget semantics as the lazy entry. EAGER; results exactly
    * [[bm25ShardedProximityQuery]]'s.
    */
  def bm25ShardedProximityQueryGrouped(spark: SparkSession,
                                       tables: Seq[String],
                                       queries: DataFrame, qidCol: String,
                                       textCol: String, k: Int,
                                       window: Int,
                                       k1: Double = 1.2, b: Double = 0.75,
                                       maxCandBroadcast: Long = 4L << 20,
                                       gateMinPosMass: Long = 1L << 22,
                                       maxPosMass: Long = 1L << 31,
                                       perShardBudget: Boolean = false,
                                       parallelism: Int = 8): DataFrame = {
    require(tables.nonEmpty,
      "bm25ShardedProximityQueryGrouped needs at least one shard")
    require(window >= 1 && window <= 256,
      s"window must be in [1, 256], got $window")
    val shardPosMass =
      if (perShardBudget || maxPosMass == Long.MaxValue) maxPosMass
      else math.max(1L, maxPosMass / tables.size)
    val qt0 = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    val qlenD = qt0.groupBy("qid").agg(count(lit(1)).as("qlen"))
    val ctl = shardControlRows(spark, tables, qt0)
    val stats = shardStatRows(spark, tables)
    val qterms = pushableTerms(spark, qt0)
    val (nDocs, avgdl, dict) = foldShardStats(spark, tables, qterms, 1.0)
    groupedRankMerge(spark, tables.size, parallelism, k) { g =>
      val legs = g.map { i =>
        val (anchorsInput, candFilter, bcast, _, _) = posGatedProbe(spark,
          tables(i), qt0,
          s"bm25ShardedProximityQueryGrouped(shard=${tables(i)})", 1.0,
          maxCandBroadcast, gateMinPosMass, window = window,
          maxPosMass = shardPosMass, preQdfRows = Some(ctl(i)),
          preStats = Some(stats(i)))
        (proximityMatched(anchorsInput, qlenD, window), candFilter, bcast)
      }
      groupScored(spark, g.map(tables), qt0, k1, b, nDocs, avgdl, dict,
        qterms, legs)
    }
  }

  /** One group's scored frame for the grouped positional entries:
    * global-stats partials per group shard gated by that shard's
    * candidate filter, union, per-(qid, doc) sum, keep only matched
    * docs — [[shardedPosRank]]'s body restricted to a group. */
  private def groupScored(spark: SparkSession, groupTables: Seq[String],
                          qt: DataFrame, k1: Double, b: Double,
                          nDocs: Long, avgdl: Double, dict: DataFrame,
                          qterms: Option[Seq[String]],
                          legs: Seq[(DataFrame, Option[DataFrame], Boolean)])
      : DataFrame = {
    val matchedU = legs.map(_._1).reduce(_.unionByName(_))
    groupTables.indices.map(j => partialsWith(spark, groupTables(j), qt,
        k1, b, nDocs, avgdl, dict, qterms, legs(j)._2, legs(j)._3))
      .reduce(_.unionByName(_))
      .groupBy("qid", "nid")
      .agg(sum("partial").cast("double").as("cos"))
      .join(matchedU, Seq("qid", "nid"), "left_semi")
  }

  /** The grouped entries' shared tail: plan + rank + collect each shard
    * group's exact local top-k in its own driver thread, then re-rank
    * the bounded union. Thread-safety notes: concurrent actions on one
    * SparkSession are supported; the only session mutation on these
    * paths is [[raiseInFilterThreshold]], which is monotone by contract
    * (concurrent raisers compose). Group-level exactness is the
    * [[Similarity.mergeShardTopK]] argument: groups partition the
    * doc-disjoint shards, every score is computed against the SAME
    * injected global constants, and the comparator is identical — so
    * each global winner survives its group's top-k and the merge keeps
    * it. */
  private def groupedRankMerge(spark: SparkSession, nShards: Int,
                               parallelism: Int, k: Int)
                              (scored: Seq[Int] => DataFrame): DataFrame = {
    val groups = shardGroups(nShards, parallelism)
    val (schema, rows) = groupedTopKRows(k, groups)(scored)
    val merged = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    Similarity.rankTopK(merged, k)
      .select(col("qid"), col("nid").as("doc_id"),
        col("cos").cast("long").as("score_micro"),
        col("rank").as("rnk"))
  }

  /** Shard indices chunked into ⌈S/parallelism⌉-sized plan groups. */
  private def shardGroups(nShards: Int, parallelism: Int): Seq[Seq[Int]] = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val par = math.max(1, math.min(parallelism, nShards))
    (0 until nShards)
      .grouped(math.ceil(nShards.toDouble / par).toInt).map(_.toSeq).toSeq
  }

  /** Test-only plan probe: the grouped entries are EAGER (per-thread
    * plan + collect), so their per-group physical plans never appear in
    * the returned DataFrame — a mechanism assertion (PlanShapeSpec)
    * cannot see them post-hoc. When non-null, every grouped stage
    * deposits (group-indices, executedPlan string) here before its
    * collect. Never set outside tests; null costs one atomic read per
    * group. */
  private[graft] val groupPlanProbe = new java.util.concurrent.atomic
    .AtomicReference[java.util.concurrent.ConcurrentLinkedQueue[
      (Seq[Int], String)]](null)

  /** One plan-parallel grouped STAGE: plan + rank + collect each shard
    * group's exact local top-k in its own driver thread, return the
    * bounded (qid, nid, cos) row union. The two-stage
    * [[maxScoreRankGrouped]] runs this once per pass; the single-stage
    * entries wrap it in [[groupedRankMerge]]. */
  private def groupedTopKRows(k: Int, groups: Seq[Seq[Int]])
                             (scored: Seq[Int] => DataFrame)
      : (org.apache.spark.sql.types.StructType,
         Seq[org.apache.spark.sql.Row]) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(groups.size)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val proto = new java.util.concurrent.atomic.AtomicReference[
        org.apache.spark.sql.types.StructType]()
      val futs = groups.map { g =>
        scala.concurrent.Future {
          val df = Similarity.rankTopK(scored(g), k)
            .select(col("qid"), col("nid"), col("cos"))
          proto.compareAndSet(null, df.schema)
          val probe = groupPlanProbe.get()
          if (probe != null)
            probe.add((g, df.queryExecution.executedPlan.toString))
          df.collect()
        }
      }
      val rows = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf).flatten
      (proto.get, rows)
    } finally pool.shutdown()
  }

  /** One plan-parallel grouped COLLECT stage: each group's frame plans
    * and collects IN FULL in its own driver thread (no top-k — the
    * fused MaxScore control plane wants every bounded pass-1 row, from
    * which the threshold, candidates, and refinement all derive
    * locally). Callers gate on a proven row bound before invoking;
    * returns the common schema plus the per-group row arrays. */
  private def groupedCollectRows(groups: Seq[Seq[Int]])
                                (frame: Seq[Int] => DataFrame)
      : (org.apache.spark.sql.types.StructType,
         Map[Seq[Int], Array[org.apache.spark.sql.Row]]) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(groups.size)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val proto = new java.util.concurrent.atomic.AtomicReference[
        org.apache.spark.sql.types.StructType]()
      val futs = groups.map { g =>
        scala.concurrent.Future {
          val df = frame(g)
          proto.compareAndSet(null, df.schema)
          val probe = groupPlanProbe.get()
          if (probe != null)
            probe.add((g, df.queryExecution.executedPlan.toString))
          g -> df.collect()
        }
      }
      val rows = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf).toMap
      (proto.get, rows)
    } finally pool.shutdown()
  }

  /** Shared tail of the sharded positional entry points: global-stats
    * partials per shard gated by that shard's candidate filter, union,
    * per-(qid, doc) sum, keep only matched docs, rank top-k. */
  private def shardedPosRank(spark: SparkSession, tables: Seq[String],
                             qt: DataFrame,
                             legs: Seq[(DataFrame, Option[DataFrame], Boolean)],
                             qterms: Option[Seq[String]], k: Int,
                             k1: Double, b: Double): DataFrame = {
    val matchedU = legs.map(_._1).reduce(_.unionByName(_))
    val scored = shardedScored(spark, tables, qt, k1, b, 1.0, qterms,
        docFilters = legs.map(_._2), bcasts = legs.map(_._3))
      .join(matchedU, Seq("qid", "nid"), "left_semi")
    Similarity.rankTopK(scored, k)
      .select(col("qid"), col("nid").as("doc_id"),
        col("cos").cast("long").as("score_micro"),
        col("rank").as("rnk"))
  }

  /** Global-stats scoring across shards (see [[bm25ShardedQuery]]):
    * fold (N, Σdl) and the query terms' df across the shard tables,
    * then union each shard's [[partialsWith]] partials computed against
    * the folded constants and sum per (qid, doc). */
  private def shardedScored(spark: SparkSession, tables: Seq[String],
                            qt: DataFrame, k1: Double, b: Double,
                            maxDfFrac: Double, qterms: Option[Seq[String]],
                            docFilters: Seq[Option[DataFrame]],
                            bcasts: Seq[Boolean],
                            preFold: Option[(Long, Double, DataFrame)] =
                              None): DataFrame = {
    // `preFold`: a caller that already folded (N, avgdl, capped dict)
    // in its own fused control job passes the triple here — the
    // MaxScore fallback path's dedup (round 20); values identical to
    // the fold below by construction
    val (nDocs, avgdl, dict) = preFold.getOrElse(
      foldShardStats(spark, tables, qterms, maxDfFrac))
    tables.indices.map { i =>
      partialsWith(spark, tables(i), qt, k1, b, nDocs, avgdl, dict,
        qterms, docFilters(i), bcasts(i))
    }.reduce(_.unionByName(_))
      .groupBy("qid", "nid")
      .agg(sum("partial").cast("double").as("cos"))
  }

  /** The sharded entry points' shared global-stats control plane: fold
    * (N, Σdl → avgdl) across the shard stats rows and the query terms'
    * tombstone-corrected df across the shard dictionaries (term-pruned
    * — tiny frames), with the `maxDfFrac` stop-term dial applied to
    * the FOLDED df (global semantics, matching the single index). The
    * exactness-critical fold lives HERE only — scoring
    * ([[shardedScored]]) and snippet argmax
    * ([[attachBestTermSnippetsSharded]]) must never disagree on it.
    * Also re-asserts [[GraftFunctions.unionGuard]]: every fold below
    * unions co-bucketed tables.
    */
  private def foldShardStats(spark: SparkSession, tables: Seq[String],
                             qterms: Option[Seq[String]],
                             maxDfFrac: Double): (Long, Double, DataFrame) = {
    GraftFunctions.unionGuard(spark)
    // ONE driver action for every shard's corpus constants: each
    // shard's one-row stats aggregate (and, where a shard has
    // tombstones, its one-row deletion-correction aggregate, sign −1)
    // unions into a single job. The per-shard [[correctedStats]] form
    // paid 1-2 SERIALIZED driver actions per shard — measured
    // (DevShardGrowth `plan` mode) at ~0.25 s of job latency per
    // shard, 9 s of driver time at S = 32 before any posting moved;
    // an O(100)-shard deployment's control plane must be O(1) jobs.
    val statRows = tables.zipWithIndex.map { case (t, i) =>
      val base = spark.table(s"${t}_stats")
        .agg(coalesce(sum("n_docs"), lit(0L)).as("n"),
          coalesce(sum("dl_sum"), lit(0L)).as("s"))
        .select(lit(1L).as("_sign"), col("n"), col("s"))
      deletedRows(spark, t) match {
        case Some(del) =>
          base.unionByName(del.select("doc_id", "dl").distinct()
            .agg(count(lit(1)).as("n"),
              coalesce(sum("dl"), lit(0L)).as("s"))
            .select(lit(-1L).as("_sign"), col("n"), col("s")))
        case None => base
      }
    }.reduce(_.unionByName(_))
      .select((col("_sign") * col("n")).as("n"),
        (col("_sign") * col("s")).as("s"))
      .agg(coalesce(sum("n"), lit(0L)), coalesce(sum("s"), lit(0L)))
      .head()
    val nDocs = statRows.getLong(0)
    require(nDocs > 0, s"sharded query: every shard of $tables is empty")
    val avgdl = statRows.getLong(1).toDouble / nDocs.toDouble
    val dict1 = foldShardDict(spark, tables, qterms)
    val dict = if (maxDfFrac < 1.0)
      dict1.filter(col("df") <= lit((maxDfFrac * nDocs).toLong))
    else dict1
    (nDocs, avgdl, dict)
  }

  /** The shard dictionaries' term-pruned, tombstone-corrected global
    * df fold as a FRAME (no driver action) — shared by
    * [[foldShardStats]] and the fused sharded-MaxScore control plane.
    */
  private def foldShardDict(spark: SparkSession, tables: Seq[String],
                            qterms: Option[Seq[String]]): DataFrame =
    tables.map(correctedDict(spark, _, qterms))
      .reduce(_.unionByName(_))
      .groupBy("term").agg(sum("df").as("df")).filter(col("df") > 0)

  /** [[foldShardStats]] with the stats as a ONE-ROW FRAME instead of a
    * driver action (round-20 control-plane fusion): the sharded
    * MaxScore entries crossJoin it onto the bounded qdf control frame
    * they collect anyway, saving one fixed-latency Spark job per
    * batch. The returned dict is UNCAPPED — callers apply the
    * `maxDfFrac` cap locally post-collect (the single-index pattern),
    * which is row-identical. */
  private def foldShardStatsFrame(spark: SparkSession,
                                  tables: Seq[String],
                                  qterms: Option[Seq[String]])
      : (DataFrame, DataFrame) = {
    GraftFunctions.unionGuard(spark)
    val statsF = tables.map(correctedStatsFrame(spark, _))
      .reduce(_.unionByName(_))
      .agg(coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(sum("s"), lit(0L)).as("s"))
    (statsF, foldShardDict(spark, tables, qterms))
  }

  /** Heal a crashed tombstone fold before serving (see
    * [[bm25FoldTombstones]]'s crash-window note): an abandoned foldlock
    * means the derived tables may already exclude deleted docs —
    * combining them with the query-time correction would
    * double-subtract. Completing the idempotent fold restores the
    * consistent (and faster) state.
    */
  private def healFold(spark: SparkSession, table: String): Unit =
    if (tableExists(spark, s"${table}_foldlock"))
      bm25FoldTombstones(spark, table)

  /** The query batch's distinct terms as literals for scan pruning, or
    * None past `maxPushTerms` (adversarially huge batches fall back to
    * the full-scan plan). The index tables are bucketed AND sorted by
    * term, so the pushed filter ([[prunedByValues]]: per-value IN up to
    * [[maxInPushValues]] = 256 values, the same `isin` with only its
    * min/max range pushed + post-scan InSet above — the measured
    * stack-safety split) lets parquet skip every row group whose term
    * range misses the batch — serving cost then tracks the query terms'
    * posting lists instead of the index scan. The collect is a bounded
    * control value (≤ maxPushTerms + 1 rows), the mf1 point-lookup
    * discipline.
    *
    * SESSION-WIDE SIDE EFFECT, by design: [[prunedByValues]] raises
    * `spark.sql.parquet.pushdown.inFilterThreshold` to
    * [[maxInPushValues]] and the raise is NOT restored. The term
    * list is pushed into a plan the CALLER executes later (lazily), so
    * a save-and-restore would revert the conf before the scan ever
    * plans — the raise must outlive the call. It is monotone (only
    * ever raises, never lowers, so repeated/concurrent callers
    * compose), affects plan SHAPE only, and is capped at the measured
    * stack-safe depth (256 — 4× margin under the 1024-value in-vivo
    * failure) — never raise it further: deeper per-value IN lists
    * overflow the executor stack inside parquet-mr (DevPushProbe; the
    * round-15 LM incident).
    */
  private[operators] def pushableTerms(spark: SparkSession, qt: DataFrame,
                                       maxPushTerms: Int = 1 << 12)
      : Option[Seq[String]] = {
    val terms = qt.select("term").distinct().limit(maxPushTerms + 1)
      .collect().map(_.getString(0)).toSeq
    if (terms.size > maxPushTerms) None else Some(terms)
  }

  /** Monotone raise of the parquet IN-pushdown threshold (see the
    * session-wide-side-effect note on [[pushableTerms]]). */
  private[operators] def raiseInFilterThreshold(spark: SparkSession,
                                                target: Int): Unit = {
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    if (spark.conf.getOption(key).map(_.toInt).getOrElse(10) < target)
      spark.conf.set(key, target.toString)
  }

  /** MEASURED parquet per-value IN depth limit (DevPushProbe + in-vivo,
    * this Spark/parquet build): a pushed `In` becomes a recursively-
    * nested OR tree in parquet-mr whose evaluation overflows the
    * executor stack. The synthetic probe passes 1024 values and dies at
    * 2048 — but 1024 ALSO died in vivo (DevLm round 15: the same
    * predicate under deeper whole-stage-codegen shuffle-task stacks),
    * so the cliff is stack-geometry-sensitive and the cap carries 4×
    * margin under the in-vivo failure. Term lists above it split into
    * [[prunedByValues]]' chunked scans. (Found round 15: the LM batch
    * pushdown hit the wall at ~3k terms; the BM25 family's 4096-value
    * collect cap had sat above the cliff since round 12 without a
    * measured batch ever crossing a few hundred.)
    */
  private[operators] val maxInPushValues = 256

  /** Bounded control-read cap shared by [[posGatedProbe]]'s per-call
    * collect and [[shardControlRows]]'s batched form: a positional
    * control plane reads at most this many (qid, term, df) rows per
    * index; batches past it fall back to frame-only plans. The
    * `graft.maxControlRows` system property exists for TESTS and dev
    * probes only (forcing the overflow routes at toy batch sizes); the
    * production default is the measured 2^13. */
  private def maxControlRows: Int = sys.props.get("graft.maxControlRows")
    .map(_.toInt).getOrElse(1 << 13)

  /** How far past [[maxControlRows]] the MaxScore entries still serve
    * ENGAGED by chunking the batch per qid (round 21, VERDICT r20 ask
    * #2 — the exact-fallback cliff): an over-cap batch's control rows
    * collect up to factor × maxControlRows (≤ 64k tiny (qid, term, df)
    * rows, a few MB of driver memory — control-plane sized), then the
    * qids greedily pack into ≤ maxControlRows-row chunks and each
    * chunk runs the verbatim two-pass machinery. Per-query results are
    * independent of batching (each query's ranking reads only its own
    * terms and the index), so the chunked union is bit-identical to
    * the one-shot plan — only the cost model changes: measured at 1e6
    * (DevMsJobs overcap arm), the pre-round-21 routing paid the ~22×
    * exact cliff the moment control rows crossed 2^13. */
  private val msOverflowFactor = 8

  /** Greedy per-qid packing of collected control rows into chunks of
    * ≤ `cap` rows, first-appearance qid order (queries never split).
    * Returns (chunks, exact-routed rows) — a single qid whose own row
    * count exceeds `cap` routes to the exact leg, the same contract
    * its un-chunked overflow had. */
  private def chunkRowsByQid(rows: Seq[org.apache.spark.sql.Row], cap: Int)
      : (Seq[Seq[org.apache.spark.sql.Row]],
         Seq[org.apache.spark.sql.Row]) = {
    val order = new java.util.LinkedHashMap[Any,
      scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]]()
    rows.foreach { r =>
      var b = order.get(r.get(0))
      if (b == null) {
        b = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
        order.put(r.get(0), b)
      }
      b += r
    }
    val chunks =
      scala.collection.mutable.ArrayBuffer[Seq[org.apache.spark.sql.Row]]()
    val cur =
      scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val exactRows =
      scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    order.values.forEach { qrs =>
      if (qrs.length > cap) exactRows ++= qrs
      else {
        if (cur.length + qrs.length > cap) {
          chunks += cur.toSeq; cur.clear()
        }
        cur ++= qrs
      }
    }
    if (cur.nonEmpty) chunks += cur.toSeq
    (chunks.toSeq, exactRows.toSeq)
  }

  /** Run one DataFrame-building body per chunk in a bounded thread
    * pool (guide §2.6 — each chunk's control plane does its own eager
    * bounded collects; overlapping them back-fills the executor tail)
    * and union the results. Chunk order is deterministic; per-query
    * rows are chunk-independent, so the union equals the one-shot
    * plan's rows. */
  private def unionChunked(chunks: Seq[Seq[org.apache.spark.sql.Row]],
                           serve: Seq[org.apache.spark.sql.Row] => DataFrame)
      : DataFrame = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(4, chunks.size))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val futs = chunks.map(c => scala.concurrent.Future(serve(c)))
      scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futs),
          scala.concurrent.duration.Duration.Inf)
        .reduce(_.unionByName(_))
    } finally pool.shutdown()
  }

  /** Exact value-pruned scan at ANY list size — the stack-safe form of
    * the per-value parquet pushdown, two regimes:
    *  - ≤ [[maxInPushValues]] values: one scan with a pushed per-value
    *    IN — page-level skip on exact values (the sorted-by-term layout
    *    makes pages term-contiguous), the round-12 measured serving
    *    win. Query-shaped term lists live here.
    *  - above: one scan with the SAME `isin` but the pushdown threshold
    *    left below the list size, so parquet receives only the min/max
    *    range and the exact membership evaluates post-scan as an InSet
    *    hash probe. No per-value predicate tree ever forms (the
    *    stack-overflow cliff), the scan keeps its bucket partitioning
    *    (downstream folds stay zero-exchange), and the aggregate runs
    *    on the pruned, batch-proportional rows — the scan itself is the
    *    only index-sized cost. Two alternatives were MEASURED WORSE on
    *    zipf vocabularies (BASELINE.md round-15): a pushed range-OR +
    *    InSet (scattered terms make the ranges cover the whole
    *    vocabulary — nothing skips, every row pays the OR chain) and a
    *    union of ≤cap-value chunk scans (page skip is nil once terms
    *    outnumber pages, and per-scan setup × chunks dominates).
    */
  private[operators] def prunedByValues(df: DataFrame, colName: String,
                                        values: Seq[String]): DataFrame = {
    if (values.isEmpty) df.filter(lit(false))
    else {
      // raise to EXACTLY the cap: Spark pushes per-value when
      // values.length <= threshold, so maxInPushValues keeps the
      // per-value regime aligned with the documented 256 bound (a
      // +1 here would let a later 257-value list build the per-value
      // tree — one over the stated cap)
      if (values.size <= maxInPushValues)
        raiseInFilterThreshold(df.sparkSession, maxInPushValues)
      df.filter(col(colName).isin(values: _*))
    }
  }

  private def pruneToTerms(df: DataFrame,
                           terms: Option[Seq[String]]): DataFrame =
    terms.map(ts => prunedByValues(df, "term", ts)).getOrElse(df)

  /** Bounded ranked-frame literal re-injection (round 21, guide
    * §1.2/§2.4): a top-k frame is ≤ k·|queries| rows by construction,
    * yet as a LAZY plan every consumer (the output spine, the
    * ranked-docs broadcast gating a span pass) re-executes the entire
    * ranking subtree — the t28 plan carried the full t21 ranking
    * TWICE. Collect it once (hard-bounded; an over-cap frame keeps the
    * lazy plan) and every consumer reads a local relation instead.
    * Row-identical: the ranking output is deterministic, and under the
    * cap the limit collects the complete row set. */
  private def literalizeBounded(spark: SparkSession, df: DataFrame)
      : (DataFrame, Option[Array[org.apache.spark.sql.Row]]) = {
    val cap = maxControlRows * msOverflowFactor
    val rows = df.limit(cap + 1).collect()
    if (rows.length > cap) (df, None)
    else (spark.createDataFrame(java.util.Arrays.asList(rows.toSeq: _*),
      df.schema), Some(rows))
  }

  /** Candidate-doc pushdown for the (term, doc_id)-sorted positional
    * layout (round 21, guide §6): given the MATERIALIZED candidate ids,
    * narrow the positional scan so parquet's column index can skip
    * pages that contain no candidate — the t49 page-skip idea applied
    * to position lists. Three regimes, all COST-ONLY (the caller's
    * candidate semi-join downstream enforces exact membership, so any
    * SUPERSET filter here is correct):
    *  - ≤ [[maxInPushValues]] ids: a pushed per-value `doc_id IN`
    *    (exact, page-skippable);
    *  - above, integral ids: the sorted ids gap-merge (gap ≤ the
    *    block-max width 4096) into closed ranges; when the merged
    *    ranges are few (≤ 128 — half the measured pushed-predicate
    *    depth cap) AND genuinely selective (covered width ≤ half the
    *    CORPUS doc count `corpusN` — the [[partialsWith]] blk-push
    *    sparsity gate's analog; a near-corpus cover would fail every
    *    page's stats check while taxing every row), push the
    *    OR-of-ranges. The clustered-candidate case this exists for is
    *    a query batch over a recent APPEND (fresh-docs RAG): its
    *    candidates sit in one contiguous id run at the corpus tail,
    *    one pushed range skips every base page. Scattered candidate
    *    sets fail the gates and skip the push — the round-15 lesson
    *    that an unselective range-OR is pure overhead. `corpusN ≤ 0`
    *    = unknown corpus size: per-value only;
    *  - otherwise: unchanged scan (semi-join gating only).
    */
  private def prunedByDocs(df: DataFrame, vals: Seq[Any],
                           corpusN: Long): DataFrame = {
    if (vals.isEmpty) return df.filter(lit(false))
    if (vals.size <= maxInPushValues) {
      raiseInFilterThreshold(df.sparkSession, maxInPushValues)
      return df.filter(col("doc_id").isin(vals: _*))
    }
    val longs = vals.flatMap {
      case l: java.lang.Long => Some(l.longValue())
      case i: java.lang.Integer => Some(i.longValue())
      case _ => None
    }
    if (longs.size != vals.size) return df // non-integral ids: no push
    val sorted = longs.sorted
    val maxRanges = 128
    val gap = 4096L
    val ranges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var lo = sorted.head; var hi = sorted.head
    var i = 1
    while (i < sorted.length) {
      val v = sorted(i)
      if (v - hi <= gap) hi = v
      else {
        ranges += ((lo, hi)); lo = v; hi = v
        // one more (final) range is still coming — bail as soon as the
        // budget cannot hold it: a PARTIAL range cover would silently
        // DROP candidates, so the push is all-ranges-or-nothing
        if (ranges.length >= maxRanges) return df
      }
      i += 1
    }
    ranges += ((lo, hi))
    if (corpusN <= 0) return df
    val width = ranges.iterator.map(r => r._2 - r._1 + 1).sum
    if (width * 2 <= corpusN)
      df.filter(ranges.iterator.map { case (l, h) =>
        col("doc_id") >= lit(l) && col("doc_id") <= lit(h)
      }.reduce(_ || _))
    else df
  }

  /** Spark's string ordering (UTF8String: unsigned UTF-8 byte
    * lexicographic) replicated driver-side, so locally-derived
    * tie-breaks match what an `orderBy(col(...))` plan picks — Scala's
    * String ordering compares UTF-16 code units, which diverges for
    * supplementary-plane characters (round 21, ADVICE). */
  private val utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(ab.length, bb.length)
      var i = 0
      while (i < n) {
        val c = (ab(i) & 0xff) - (bb(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      ab.length - bb.length
    }
  }

  /** (df, term) ordering for local rarest-term derivation — the term
    * tie-break is [[utf8Ordering]] to match the uncollected fallback's
    * `orderBy(col("df"), col("term"))`. */
  private val dfTermOrdering: Ordering[(Long, String)] =
    Ordering.Tuple2(Ordering.Long, utf8Ordering)

  /** The shared scoring pipeline behind [[bm25Query]] and
    * [[bm25PhraseQuery]]: `qt` is the distinct (qid, term) frame;
    * returns (qid, nid, cos) where cos is the double view of the exact
    * micro-unit long sum (see the object doc).
    *
    * `qterms` is the caller's ONE [[pushableTerms]] result (both public
    * entry points collect it exactly once and thread it everywhere —
    * the positional scan, the dictionary scan, and this scoring pass
    * all narrow to the same pushed term list). `docFilter` restricts
    * the scored postings to a document set BEFORE the aggregate — the
    * phrase path passes its rarest-term candidate docs so the partial-
    * score shuffle is bounded by the candidate set, not by the head
    * terms' full posting lists; `broadcastDocs` picks the broadcast
    * form when the caller knows the set is small. Scores for the docs
    * that survive the filter are bit-identical to the unfiltered run
    * (the aggregate is per-(qid, doc); dropping other docs' groups
    * changes nothing).
    */
  private def bm25Scored(spark: SparkSession, table: String, qt: DataFrame,
                         k1: Double, b: Double, maxDfFrac: Double,
                         qterms: Option[Seq[String]],
                         docFilter: Option[DataFrame] = None,
                         broadcastDocs: Boolean = false,
                         preStats: Option[(Long, Long)] = None): DataFrame =
    bm25Partials(spark, table, qt, k1, b, maxDfFrac, qterms, docFilter,
        broadcastDocs, preStats)
      .groupBy("qid", "nid")
      .agg(sum("partial").cast("double").as("cos"))

  /** The pre-aggregation form of [[bm25Scored]]: one row per (qid, nid,
    * term) carrying that term's micro-rounded BM25 contribution — the
    * frame [[bm25Scored]] sums and [[bm25Snippets]] reads per-term to
    * pick each hit's best-scoring term.
    */
  private def bm25Partials(spark: SparkSession, table: String, qt: DataFrame,
                           k1: Double, b: Double, maxDfFrac: Double,
                           qterms: Option[Seq[String]],
                           docFilter: Option[DataFrame] = None,
                           broadcastDocs: Boolean = false,
                           preStats: Option[(Long, Long)] = None): DataFrame = {
    // `preStats`: callers that already read the corrected (N, Σdl) in
    // their own fused control job pass it here, eliminating this
    // path's separate one-row driver action (round-20 control-plane
    // fusion; the values are the SAME corrected pair either way)
    val (nDocs, dlSum) = preStats.getOrElse(correctedStats(spark, table))
    require(nDocs > 0, s"bm25Query: index $table is empty")
    // exact long sum over exact long sum — both engines divide the
    // same two numbers, so avgdl is bit-identical cross-engine
    val avgdl = dlSum.toDouble / nDocs.toDouble
    val dict1 = correctedDict(spark, table, qterms)
    // stop-term pruning (see param doc): a dict-side filter, so the
    // pruned terms never reach the postings join at all
    val dict = if (maxDfFrac < 1.0)
      dict1.filter(col("df") <= lit((maxDfFrac * nDocs).toLong))
    else dict1
    partialsWith(spark, table, qt, k1, b, nDocs, avgdl, dict, qterms,
      docFilter, broadcastDocs)
  }

  /** Deletion support shared by the stats/dict derivations: when a
    * tombstone set exists, df/N/avgdl are corrected at QUERY time from
    * `postings ∩ tombstones` (one extra broadcast semi-join scan of the
    * term-bucketed postings; the df correction aggregate is
    * term-bucketed too, so the dictionary join stays exchange-free) and
    * the scoring join reads the anti-joined postings. Deriving
    * everything from the id set alone is what makes bm25Delete
    * crash-correct: there are no stored negative deltas to land or
    * lose — bm25FoldTombstones restores the zero-extra-scan fast path.
    */
  private def deletedRows(spark: SparkSession,
                          table: String): Option[DataFrame] =
    Tombstones.idSet(spark, table).map(ts =>
      spark.table(table).join(broadcast(ts),
        col("doc_id") === col("id")).drop("id"))

  /** The index's tombstone-corrected corpus stats (N docs, Σ dl) as a
    * ONE-ROW FRAME — the control-plane fusion unit (round 20, guide
    * §2.4/§5: every separate bounded driver read is a full Spark job of
    * ~0.3-0.5 s fixed latency at the 1e7 decade, the measured dominant
    * serving cost). Callers `crossJoin` this frame onto whatever
    * bounded control frame they were collecting anyway, so the stats
    * ride along in the SAME job. The tombstone correction folds in as
    * a sign-tagged union (the [[foldShardStats]] discipline) instead
    * of a second driver action.
    */
  private def correctedStatsFrame(spark: SparkSession,
                                  table: String): DataFrame = {
    val base = spark.table(s"${table}_stats")
      .agg(coalesce(sum("n_docs"), lit(0L)).as("n"),
        coalesce(sum("dl_sum"), lit(0L)).as("s"))
      .select(lit(1L).as("_sign"), col("n"), col("s"))
    val signed = deletedRows(spark, table) match {
      case Some(del) => base.unionByName(
        del.select("doc_id", "dl").distinct()
          .agg(count(lit(1)).as("n"),
            coalesce(sum("dl"), lit(0L)).as("s"))
          .select(lit(-1L).as("_sign"), col("n"), col("s")))
      case None => base
    }
    signed.select((col("_sign") * col("n")).as("n"),
        (col("_sign") * col("s")).as("s"))
      .agg(coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(sum("s"), lit(0L)).as("s"))
  }

  /** The index's tombstone-corrected corpus stats: (N docs, Σ dl) —
    * ONE one-row driver read (the pre-round-20 form paid a second
    * action for the tombstone-correction aggregate). */
  private def correctedStats(spark: SparkSession,
                             table: String): (Long, Long) = {
    val r = correctedStatsFrame(spark, table).head()
    (r.getLong(0), r.getLong(1))
  }

  /** The index's tombstone-corrected document frequencies, narrowed to
    * the pushed query terms (the `deleted` correction frame stays
    * UNFILTERED on the stats side because N/avgdl are corpus-level
    * facts; per-term df sums are term-local, so pruning the dictionary
    * scan is exact). */
  private def correctedDict(spark: SparkSession, table: String,
                            qterms: Option[Seq[String]]): DataFrame = {
    val dict0 = pruneToTerms(spark.table(s"${table}_terms"), qterms)
      .groupBy("term").agg(sum("df").as("df"))
    deletedRows(spark, table) match {
      case Some(del) =>
        val dcorr = del.groupBy("term").agg(count(lit(1)).as("ddf"))
        dict0.join(dcorr, Seq("term"), "left")
          .select(col("term"),
            (col("df") - coalesce(col("ddf"), lit(0L))).as("df"))
          .filter(col("df") > 0)
      case None => dict0
    }
  }

  /** The scoring tail with the corpus constants INJECTED — what lets
    * [[bm25ShardedQuery]]'s shards score against GLOBAL (N, avgdl, df)
    * while each shard scans only its own postings. Single-index callers
    * pass their own table's stats ([[bm25Partials]]).
    *
    * `docVals` + `blockW` engage the BLOCK-MAX SCAN SKIP (layout doc on
    * [[bm25Build]]): when the caller has the candidate ids driver-side
    * (`docVals` MUST be exactly `docFilter`'s id set) and the table
    * carries the blk-sorted layout, the candidate set reaches the
    * postings SCAN as a pushed predicate —
    *  - ≤ [[maxInPushValues]] ids: per-value `doc_id IN`, which
    *    REPLACES the semi-join outright (same set, page-skippable
    *    against the doc-sorted files);
    *  - else, candidate BLOCKS ≤ the cap: per-value `blk IN` (a strict
    *    superset of the candidates — coarser pages skip) UNDER the
    *    unchanged semi-join, which keeps exactness;
    *  - else: today's semi-join alone.
    * Every branch returns bit-identical rows; the dial is pure scan
    * cost. */
  private def partialsWith(spark: SparkSession, table: String,
                           qt: DataFrame, k1: Double, b: Double,
                           nDocs: Long, avgdl: Double, dict: DataFrame,
                           qterms: Option[Seq[String]],
                           docFilter: Option[DataFrame],
                           broadcastDocs: Boolean,
                           docVals: Option[Seq[Any]] = None,
                           blockW: Option[Long] = None): DataFrame = {
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val dlD = col("dl").cast("double")
    val idf = log((lit(nDocs.toDouble) - dfD + lit(0.5))
      / (dfD + lit(0.5)) + lit(1.0))
    val w = tfD * lit(k1 + 1.0) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * dlD / lit(avgdl)))
    val postings0 = Tombstones.filterOut(spark, table,
      pruneToTerms(spark.table(table), qterms), "doc_id")
    val postings = docFilter match {
      case Some(docIds) =>
        def semi(base: DataFrame) = {
          val f = if (broadcastDocs) broadcast(docIds) else docIds
          base.join(f, Seq("doc_id"), "left_semi")
        }
        (docVals, blockW) match {
          case (Some(vals), Some(_)) if vals.isEmpty =>
            postings0.filter(lit(false)) // constant-folds away
          case (Some(vals), Some(_)) if vals.size <= maxInPushValues =>
            raiseInFilterThreshold(spark, maxInPushValues)
            postings0.filter(col("doc_id").isin(vals: _*))
          case (Some(vals), Some(bw)) =>
            val blks = vals.map(blkOf(_, bw)).distinct
            // push the coarser blk IN only when it can actually SKIP:
            // candidate blocks covering most of the corpus's ~nDocs/bw
            // blocks fail every page's stats check without excluding
            // anything — pure predicate overhead (measured at 1e6,
            // round 19: 29 queries' candidates covered all 244 blocks)
            val totalBlks = math.max(1L, nDocs / math.max(1L, bw))
            if (blks.size <= maxInPushValues &&
                blks.size * 2 <= totalBlks) {
              raiseInFilterThreshold(spark, maxInPushValues)
              semi(postings0.filter(col("blk").isin(blks: _*)))
            } else semi(postings0)
          case _ => semi(postings0)
        }
      case None => postings0
    }
    // exact for any realistic score (score·1e6 ≪ 2^53), so ranking on
    // the double view of the long loses nothing
    qt.join(dict, Seq("term"))
      .join(postings, Seq("term"))
      .select(col("qid"), col("doc_id").as("nid"), col("term"),
        round(idf * w * lit(1000000.0)).cast("long").as("partial"))
  }

  /** Exact-phrase BM25 top-k over a POSITIONAL index ([[bm25Build]]
    * with `positions = true`): a document matches iff the query's
    * tokens occur CONSECUTIVELY, in order (the classic positional-
    * postings intersection), and matching docs rank by the standard
    * [[bm25Query]] score of the phrase's DISTINCT terms — same integer
    * micro-unit contract, same output schema (qid, doc_id, score_micro,
    * rnk). Queries with no tokens or no matching document emit nothing.
    *
    * Plan: the phrase's (offset, term) pairs shuffle TO the
    * term-bucketed `<table>_pos` lists; each posting explodes to
    * candidate START positions (pos − offset) and a doc matches when
    * one start collects ALL the phrase's offsets. ONE bounded control
    * collect (the per-(qid, term) df frame) drives the whole control
    * plane: the pushed-term scan pruning, the rarest term per phrase,
    * and a COST GATE choosing between two exact plans. When the gate
    * engages, a RAREST-TERM candidate pass runs before anything
    * explodes (the classic phrase-intersection ordering, done
    * set-at-a-time): every match must contain each phrase term, so the
    * docs on the lowest-df term's posting list are a complete
    * candidate set, and every other term's position rows are DOC-GATED
    * down to that set — first a doc-level semi-join against the
    * distinct candidate ids (broadcast while the candidate bound
    * Σ_q min_t df(t) stays under `maxCandBroadcast`, shuffle semi-join
    * past it), then the per-qid (qid, doc) semi-join. The (qid,
    * doc_id, start) intersection shuffle is then bounded by the RAREST
    * term's postings even when the phrase carries df≈N head terms:
    * their position lists are cut to candidate docs BEFORE the explode
    * and the aggregate, which is what retires the round-12 superlinear
    * worst case (head-term position mass used to flow through both).
    * When the gate does NOT engage (small direct posting mass AND a
    * rarest term that barely prunes — the measured regime where the
    * semi-join overhead exceeds its saving), the intersection runs
    * directly on the pruned position scans, bit-identical results. A
    * phrase containing an unindexed term prunes to zero candidates
    * outright. Scoring reuses the [[bm25Query]] machinery with the
    * same candidate-doc gate on its postings (`docFilter`), then a
    * semi-join to the exactly-matched docs. Tombstoned docs leave
    * results immediately (the positional scan anti-joins the set like
    * every other consult). Stop-term DROPPING is deliberately not
    * offered — removing a phrase term changes which documents MATCH —
    * so results are bit-identical to the unpruned plan in every
    * regime; an all-head phrase still pays its rarest term's df, the
    * floor any positional intersection has.
    */
  /** `maxDfFrac` (default 1.0 = exact matching for every phrase): the
    * phrase analog of [[bm25Query]]'s stop-term dial, with a DIFFERENT
    * contract because phrase terms cannot be dropped. A phrase whose
    * rarest term's df is ≤ `maxDfFrac · N` is always EXACT — its
    * candidate set (the rarest term's postings) is complete, and the
    * dial changes nothing. A phrase whose EVERY term exceeds the cap
    * (an all-stop-word phrase — the measured worst case, where the
    * candidate set IS the corpus) gets TRUNCATED MATCHING: its
    * candidates are restricted to a deterministic uniform hash-sample
    * of ≈ `maxDfFrac · N` docs from the rarest term's postings, and
    * matches outside the sample are missed — ranked results are a
    * top-k over that sampled candidate set (scores of returned docs
    * are still exact). The truncation is deterministic (xxhash64 of
    * doc_id against a df-scaled threshold), so repeated queries return
    * the same subset; it exists for the same reason the bag-of-words
    * dial does — an all-head phrase otherwise forces an O(df≈N)
    * intersection per query, the one cost no exact positional
    * intersection can avoid. Pick the dial per workload: exact
    * (default) for correctness gates and offline audits, a 1e-2-ish
    * cap for interactive serving where an all-stop-word phrase should
    * degrade gracefully instead of scanning the corpus.
    */
  /** `gateMinPosMass`: the direct-vs-gated cost switch (see the COST
    * GATE comment in the body) — the total query-term posting mass
    * above which the rarest-term doc-gating engages. Both plans are
    * exact; gating wins at every measured material scale (443 vs 693
    * ms/q at 10⁶, 5.2 vs 7.9 s/q at 10⁷), so the default 2²² only
    * spares genuinely tiny batches the extra semi-join stages.
    */
  def bm25PhraseQuery(spark: SparkSession, table: String,
                      queries: DataFrame, qidCol: String, textCol: String,
                      k: Int, k1: Double = 1.2, b: Double = 0.75,
                      maxDfFrac: Double = 1.0,
                      maxCandBroadcast: Long = 4L << 20,
                      gateMinPosMass: Long = 1L << 22): DataFrame = {
    val (qoff, aligned, candFilter, bcast, qterms, scoreStats) =
      phraseAligned(spark,
        table, queries, qidCol, textCol, maxDfFrac, maxCandBroadcast,
        gateMinPosMass)
    val matched = aligned.select(col("qid"), col("doc_id").as("nid"))
      .distinct()
    posScoreRank(spark, table, qoff, matched, candFilter, bcast, qterms,
      k, k1, b, scoreStats)
  }

  /** The phrase match set WITH its start offsets: (qid, doc_id, start,
    * qlen) — one row per aligned phrase occurrence. Shared by
    * [[bm25PhraseQuery]] (which only needs membership) and
    * [[bm25PhraseSnippets]] (which slices around min(start)).
    */
  private def phraseAligned(spark: SparkSession, table: String,
                            queries: DataFrame, qidCol: String,
                            textCol: String, maxDfFrac: Double,
                            maxCandBroadcast: Long, gateMinPosMass: Long,
                            preQdfRows: Option[Array[org.apache.spark.sql.Row]] = None)
      : (DataFrame, DataFrame, Option[DataFrame], Boolean,
         Option[Seq[String]], Option[(Long, Long)]) = {
    val qoff = queries
      .select(col(qidCol).as("qid"), posexplode(toks(col(textCol))))
      .select(col("qid"), col("pos").as("off"), col("col").as("term"))
    val qlen = qoff.groupBy("qid").agg(count(lit(1)).as("qlen"))
    val (startsInput, candFilter, bcast, qterms, scoreStats) =
      posGatedProbe(spark,
        table, qoff, "bm25PhraseQuery", maxDfFrac, maxCandBroadcast,
        gateMinPosMass, preQdfRows = preQdfRows)
    val starts = startsInput
      .select(col("qid"), col("doc_id"), col("off"),
        explode(GraftFunctions.deltaDec(col("positions"))).as("p"))
      .select(col("qid"), col("doc_id"),
        (col("p") - col("off")).as("start"), col("off"))
      .groupBy("qid", "doc_id", "start")
      .agg(count_distinct(col("off")).as("nhit"))
    val aligned = starts.join(broadcast(qlen), Seq("qid"))
      .filter(col("nhit") === col("qlen"))
      .select(col("qid"), col("doc_id"), col("start"), col("qlen"))
    (qoff, aligned, candFilter, bcast, qterms, scoreStats)
  }

  /** [[bm25PhraseQuery]] + passage extraction: the top-k ranked matches
    * carrying each document's FIRST aligned occurrence (`start`, the
    * 0-based token offset) and a token-window `snippet` — `context`
    * tokens before the match through `context` tokens after it — sliced
    * from `docs` (`docIdCol`, `docTextCol`: the corpus text, which the
    * index does not store). The serving feature a RAG pipeline reads:
    * ranked passages, not just doc ids.
    *
    * Plan shape: ranking is [[bm25PhraseQuery]] verbatim; the snippet
    * join touches `docs` AFTER top-k, so the text join is k·|queries|
    * rows against the corpus — a semi-join-sized probe, never a corpus
    * product. Output: (qid, doc_id, score_micro, rnk, start, snippet),
    * deterministic (start = min over occurrences; tokens re-joined
    * single-spaced by the shared tokenizer).
    */
  def bm25PhraseSnippets(spark: SparkSession, table: String,
                         queries: DataFrame, qidCol: String, textCol: String,
                         docs: DataFrame, docIdCol: String, docTextCol: String,
                         k: Int, context: Int = 3,
                         k1: Double = 1.2, b: Double = 0.75,
                         maxDfFrac: Double = 1.0,
                         maxCandBroadcast: Long = 4L << 20,
                         gateMinPosMass: Long = 1L << 22): DataFrame = {
    require(context >= 0, s"context must be non-negative, got $context")
    val (qoff, aligned, candFilter, bcast, qterms, scoreStats) =
      phraseAligned(spark,
        table, queries, qidCol, textCol, maxDfFrac, maxCandBroadcast,
        gateMinPosMass)
    val matched = aligned.select(col("qid"), col("doc_id").as("nid"))
      .distinct()
    val ranked = posScoreRank(spark, table, qoff, matched, candFilter,
      bcast, qterms, k, k1, b, scoreStats)
    val firstStart = aligned.groupBy("qid", "doc_id")
      .agg(min("start").as("start"), first("qlen").as("qlen"))
    val corpusToks = docs.select(col(docIdCol).as("doc_id"),
      toks(col(docTextCol)).as("_ws"))
    val from = greatest(col("start") - context, lit(0))
    ranked
      .join(firstStart, Seq("qid", "doc_id"))
      .join(corpusToks, Seq("doc_id"))
      .select(col("qid"), col("doc_id"), col("score_micro"), col("rnk"),
        col("start").cast("long").as("start"),
        concat_ws(" ", slice(col("_ws"), (from + 1).cast("int"),
          (col("start") - from + col("qlen") + lit(context)).cast("int")))
          .as("snippet"))
  }

  /** All-distinct-terms-within-a-window (NEAR/w) BM25 top-k over the
    * positional index ([[bm25Build]] with `positions = true`): a
    * document matches iff EVERY distinct query term occurs at least
    * once inside some window of `window` CONSECUTIVE token slots —
    * equivalently, some occurrence assignment has span
    * max(pos) − min(pos) < window — order-free, the classic NEAR
    * operator. Matching docs rank by the [[bm25Query]] score of the
    * query's distinct terms: same integer micro-unit contract and
    * output schema as [[bm25PhraseQuery]] (qid, doc_id, score_micro,
    * rnk). Phrase is the ordered, gap-free special case (offsets must
    * align at one start); NEAR relaxes both order and adjacency.
    *
    * Plan: shares [[bm25PhraseQuery]]'s ENTIRE control plane via
    * [[posGatedProbe]] — one bounded control collect, pushed-term scan
    * pruning, rarest-term candidate doc-gating (broadcast/shuffle
    * semi-joins), the `maxDfFrac` truncation dial (same contract:
    * phrases whose rarest term is under the cap stay exact; all-head
    * queries get deterministic hash-sampled candidates), and the
    * `gateMinPosMass` cost gate. Only the positional match differs:
    * the gated probe rows group per (qid, doc) and the window cover is
    * evaluated set-at-a-time on the stored position arrays
    * ([[proximityMatched]] — no per-anchor row explosion, per-group
    * state bounded by the doc's own lists); duplicate query terms
    * collapse (proximity is a distinct-term predicate, unlike phrase
    * where each offset must align).
    */
  /** `maxPosMass`: the graceful-degradation budget for all-head
    * batches — a conservative upper bound (per-query candidate bound
    * min_t df(t), times avgdl: a doc's query-term positions cannot
    * exceed its length) on the gated POSITION MASS the window-cover
    * match must shuffle and scan, computed UP FRONT from the same
    * collected df frame the candidate gate uses. The bound is
    * window-INDEPENDENT because the grouped-array match is: each cover
    * check scans the candidate doc's position lists once regardless of
    * window width. When the batch's summed bound exceeds the budget,
    * the batch AUTO-ROUTES to the truncation dial at the largest
    * per-query candidate cap that fits — a LOUD warn names the batch,
    * the bound, and the effective cap. Queries whose rarest term is
    * under the effective cap remain EXACT (the maxDfFrac contract);
    * over-cap queries serve from deterministic hash-sampled
    * candidates. Calibration is MEASURED (BASELINE.md round-14): the
    * default 2³¹ keeps a 20-query all-head batch exact at 10⁶
    * (bound ≈ 3·10⁸, 378 ms/q) and routes it at 10⁷ (bound ≈
    * 2.2·10⁹, where forced-exact costs 2.8 s/q and the routed dial
    * 1.2 s/q). History: the round-13 slot-anchor plan materialized
    * window × this bound as literal rows and OOMed an 8 GiB heap at
    * 10⁷; the grouped match retired the heap wall, so the budget
    * governs cost, not survival — set Long.MaxValue to force exact
    * matching at any expense.
    */
  def bm25ProximityQuery(spark: SparkSession, table: String,
                         queries: DataFrame, qidCol: String,
                         textCol: String, k: Int, window: Int,
                         k1: Double = 1.2, b: Double = 0.75,
                         maxDfFrac: Double = 1.0,
                         maxCandBroadcast: Long = 4L << 20,
                         gateMinPosMass: Long = 1L << 22,
                         maxPosMass: Long = 1L << 31): DataFrame = {
    require(window >= 1 && window <= 256,
      s"window must be in [1, 256], got $window")
    require(maxPosMass > 0,
      s"maxPosMass must be positive, got $maxPosMass")
    val qt0 = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    val qlenD = qt0.groupBy("qid").agg(count(lit(1)).as("qlen"))
    val (anchorsInput, candFilter, bcast, qterms, scoreStats) =
      posGatedProbe(spark,
        table, qt0, "bm25ProximityQuery", maxDfFrac, maxCandBroadcast,
        gateMinPosMass, window = window, maxPosMass = maxPosMass)
    val matched = proximityMatched(anchorsInput, qlenD, window)
    posScoreRank(spark, table, qt0, matched, candFilter, bcast, qterms,
      k, k1, b, scoreStats)
  }

  /** The NEAR match predicate, evaluated set-at-a-time on the STORED
    * position arrays: the gated probe rows (one per (qid, doc, term),
    * each carrying the term's delta-encoded position list) group per
    * (qid, doc) — a document qualifies when it carries ALL distinct
    * query terms AND some query-term occurrence `p` anchors a window
    * `[p, p + window − 1]` containing at least one occurrence of every
    * term (a cover window exists iff one anchored at its leftmost
    * occurrence does). Evaluating the cover as array predicates over
    * the grouped lists — instead of exploding every position into its
    * `window` anchor slots and aggregating (qid, doc, anchor) rows —
    * moves exactly the gated scan rows through the one shuffle and
    * holds per-group state bounded by the document's own position
    * lists: the window factor never materializes as rows, which is
    * both the serving-cost win (bench_near) and what retired the
    * anchor-mass OOM wall the round-13 slot-anchor plan hit at 10⁷
    * (BASELINE.md round-13 NEAR section). Per-group cover cost is
    * O(occurrences² · terms) in the worst case — bounded by document
    * length, the per-doc work every positional operator here already
    * accepts.
    */
  private def proximityMatched(anchorsInput: DataFrame, qlenD: DataFrame,
                               window: Int): DataFrame =
    anchorsInput
      .select(col("qid"), col("doc_id"),
        GraftFunctions.deltaDec(col("positions")).as("ps"))
      .groupBy("qid", "doc_id")
      .agg(collect_list(col("ps")).as("arrs"), count(lit(1)).as("nterm"))
      .join(broadcast(qlenD), Seq("qid"))
      .filter(col("nterm") === col("qlen"))
      .filter(exists(flatten(col("arrs")), p =>
        forall(col("arrs"), a =>
          exists(a, x => x >= p && x <= p + lit(window - 1)))))
      .select(col("qid"), col("doc_id").as("nid"))

  /** [[bm25ProximityQuery]] + passage extraction — the NEAR member of
    * the snippet family ([[bm25PhraseSnippets]] covers phrase matches,
    * [[bm25Snippets]] plain bag-of-words hits): each top-k match
    * carries the LEFTMOST COVER's start (the smallest query-term
    * occurrence position `p` such that the window `[p, p + window − 1]`
    * contains every distinct query term — a cover window exists iff one
    * anchored at its leftmost occurrence does, the same equivalence the
    * match predicate rests on) and a token-window `snippet` spanning
    * `context` tokens before the window through `context` after it,
    * sliced from `docs` (`docIdCol`/`docTextCol`: the corpus text,
    * which the index does not store).
    *
    * Plan shape: ranking is [[bm25ProximityQuery]] verbatim (same
    * control plane, same dials, same anchor budget); the cover-start
    * derivation touches ONLY the ranked docs — the positional scan is
    * semi-joined down to the k·|queries| result rows (broadcast)
    * BEFORE any occurrence explodes, so the span pass costs positions
    * of the query terms in the top-k docs, never corpus mass, and the
    * text join runs strictly after top-k. Output: (qid, doc_id,
    * score_micro, rnk, start, snippet), deterministic (min cover
    * start; tokens re-joined single-spaced by the shared tokenizer).
    */
  def bm25ProximitySnippets(spark: SparkSession, table: String,
                            queries: DataFrame, qidCol: String,
                            textCol: String, docs: DataFrame,
                            docIdCol: String, docTextCol: String,
                            k: Int, window: Int, context: Int = 3,
                            k1: Double = 1.2, b: Double = 0.75,
                            maxDfFrac: Double = 1.0,
                            maxCandBroadcast: Long = 4L << 20,
                            gateMinPosMass: Long = 1L << 22,
                            maxPosMass: Long = 1L << 31): DataFrame = {
    require(window >= 1 && window <= 256,
      s"window must be in [1, 256], got $window")
    require(context >= 0, s"context must be non-negative, got $context")
    require(maxPosMass > 0,
      s"maxPosMass must be positive, got $maxPosMass")
    val qt0 = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    val qlenD = qt0.groupBy("qid").agg(count(lit(1)).as("qlen"))
    val (anchorsInput, candFilter, bcast, qterms, scoreStats) =
      posGatedProbe(spark,
        table, qt0, "bm25ProximitySnippets", maxDfFrac, maxCandBroadcast,
        gateMinPosMass, window = window, maxPosMass = maxPosMass)
    val matched = proximityMatched(anchorsInput, qlenD, window)
    // round 21 (VERDICT r20 ask #4): the ranked frame is ≤ k·|queries|
    // rows, but as a lazy plan the FULL t21 ranking subtree executed
    // twice — once on the output spine and once inside the
    // broadcast(rankedDocs) build gating the cover pass (the measured
    // 96-Exchange t28 plan). Literal re-injection shares ONE scored
    // frame across both consumers, and the collected ids push into the
    // cover pass's positional scan ([[prunedByDocs]] — page-skip on
    // the (term, doc_id)-sorted round-21 layout).
    val (ranked, rankedRows) = literalizeBounded(spark,
      posScoreRank(spark, table, qt0, matched, candFilter,
        bcast, qterms, k, k1, b, scoreStats))
    // leftmost cover, derived occurrence-anchored over ONLY the ranked
    // docs: every ranked doc has one (see the scaladoc equivalence), so
    // the inner joins below drop nothing
    val rankedDocs = ranked.select("qid", "doc_id").distinct()
    val posSpan = rankedRows.fold(
        Tombstones.filterOut(spark, table,
          pruneToTerms(spark.table(s"${table}_pos"), qterms), "doc_id")) {
      rs =>
        Tombstones.filterOut(spark, table,
          prunedByDocs(
            pruneToTerms(spark.table(s"${table}_pos"), qterms),
            rs.map(_.get(1)).toSeq.distinct,
            scoreStats.map(_._1).getOrElse(0L)), "doc_id")
    }
    val occ = qt0
      .join(posSpan, Seq("term"))
      .join(broadcast(rankedDocs), Seq("qid", "doc_id"), "left_semi")
      .select(col("qid"), col("doc_id"), col("term"),
        explode(GraftFunctions.deltaDec(col("positions"))).as("p"))
    val covers = occ.select(col("qid"), col("doc_id"), col("p").as("ap"))
      .distinct()
      .join(occ, Seq("qid", "doc_id"))
      .filter(col("p") >= col("ap") &&
        col("p") <= col("ap") + lit(window - 1))
      .groupBy("qid", "doc_id", "ap")
      .agg(count_distinct(col("term")).as("nhit"))
    val firstStart = covers.join(broadcast(qlenD), Seq("qid"))
      .filter(col("nhit") === col("qlen"))
      .groupBy("qid", "doc_id").agg(min("ap").as("start"))
    val corpusToks = docs.select(col(docIdCol).as("doc_id"),
      toks(col(docTextCol)).as("_ws"))
    val from = greatest(col("start") - context, lit(0))
    ranked
      .join(firstStart, Seq("qid", "doc_id"))
      .join(corpusToks, Seq("doc_id"))
      .select(col("qid"), col("doc_id"), col("score_micro"), col("rnk"),
        col("start").cast("long").as("start"),
        concat_ws(" ", slice(col("_ws"), (from + 1).cast("int"),
          (col("start") - from + lit(window + context)).cast("int")))
          .as("snippet"))
  }

  /** [[bm25Query]] + passage extraction for plain bag-of-words hits —
    * the snippet family's third member: each top-k document carries the
    * FIRST OCCURRENCE of its BEST-SCORING query term (the term with
    * the largest micro-rounded BM25 contribution for that (query, doc)
    * pair; ties break on term ascending) and a ±`context`-token window
    * around that occurrence, sliced from `docs`. Needs the positional
    * table (`bm25Build` with `positions = true`) for the occurrence
    * offsets.
    *
    * Plan shape: ranking is the [[bm25Query]] pipeline with the one
    * bounded control collect shared across scoring AND the span pass
    * (the pushed-term discipline); per-term partials are recomputed
    * only for the top-k docs (a broadcast semi-join narrows the
    * postings probe to k·|queries| documents), the argmax runs on that
    * tiny frame, and the first occurrence reads the head of the
    * delta-encoded position list (the first element is stored
    * absolute — no decode). The text join runs strictly after top-k.
    * Output: (qid, doc_id, score_micro, rnk, start, snippet).
    */
  def bm25Snippets(spark: SparkSession, table: String, queries: DataFrame,
                   qidCol: String, textCol: String, docs: DataFrame,
                   docIdCol: String, docTextCol: String, k: Int,
                   context: Int = 3, k1: Double = 1.2, b: Double = 0.75,
                   maxDfFrac: Double = 1.0): DataFrame = {
    require(context >= 0, s"context must be non-negative, got $context")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    GraftFunctions.ensureRegistered(spark)
    healFold(spark, table)
    require(tableExists(spark, s"${table}_pos"),
      s"bm25Snippets: $table has no positional table — " +
        "build the index with positions = true")
    val qt = queries
      .select(col(qidCol).as("qid"), explode(toks(col(textCol))).as("term"))
      .distinct()
    // FUSED control read (round 20): one job for the pushed terms +
    // corrected stats, shared by BOTH scoring passes (ranking and the
    // snippet argmax) — pre-fusion this entry paid three driver
    // actions (pushableTerms + two bm25Partials stats reads)
    val (qterms, preStats) = ctrlTermsStats(spark, table, qt)
    val ranked = Similarity.rankTopK(
        bm25Scored(spark, table, qt, k1, b, maxDfFrac, qterms,
          preStats = preStats), k)
      .select(col("qid"), col("nid").as("doc_id"),
        col("cos").cast("long").as("score_micro"),
        col("rank").as("rnk"))
    attachBestTermSnippets(spark, table, qt, ranked, docs, docIdCol,
      docTextCol, context, k1, b, maxDfFrac, qterms, preStats)
  }

  /** The best-term passage pass behind [[bm25Snippets]] — and, via
    * [[Fusion.hybridSnippets]], behind fused hybrid results: given an
    * ALREADY-RANKED frame carrying (qid, doc_id, …payload columns…),
    * attach `(start, snippet)` — the first occurrence of that (query,
    * doc)'s best-scoring query term and the ±`context`-token window
    * around it. LEFT-join semantics: a ranked document containing NO
    * query term (possible for a vector-leg hybrid hit) keeps its row
    * with null start/snippet — no lexical passage exists, and dropping
    * the hit would silently unrank it.
    *
    * Plan shape (the [[bm25Snippets]] discipline): per-term partials
    * recompute only for the broadcast-semi-joined ranked docs, the
    * argmax runs on that tiny frame, the first occurrence reads the
    * delta-encoded position list's head (stored absolute — no decode),
    * and the corpus text join runs strictly after ranking, k·|queries|
    * rows against `docs`.
    */
  private[operators] def attachBestTermSnippets(
      spark: SparkSession, table: String, qt: DataFrame, ranked: DataFrame,
      docs: DataFrame, docIdCol: String, docTextCol: String,
      context: Int, k1: Double, b: Double, maxDfFrac: Double,
      qterms: Option[Seq[String]],
      preStats: Option[(Long, Long)] = None): DataFrame = {
    require(tableExists(spark, s"${table}_pos"),
      s"snippet extraction: $table has no positional table — " +
        "build the index with positions = true")
    // round 21 (VERDICT r20 ask #4): one scored frame, many consumers —
    // the ranked plan fed the output spine AND the rankedDocs broadcast
    // gating the partials recompute, re-executing the whole ranking per
    // consumer. Literal re-injection shares it, and the collected ids
    // push into the span pass's positional scan (page-skip on the
    // (term, doc_id)-sorted layout).
    val (rankedL, rankedRows) = literalizeBounded(spark, ranked)
    val rankedDocs = rankedL.select("doc_id").distinct()
    val partials = bm25Partials(spark, table, qt, k1, b, maxDfFrac, qterms,
      docFilter = Some(rankedDocs), broadcastDocs = true,
      preStats = preStats)
    val docIdx = ranked.schema.fieldIndex("doc_id")
    val pos = Tombstones.filterOut(spark, table,
      rankedRows.fold(pruneToTerms(spark.table(s"${table}_pos"), qterms))(
        rs => prunedByDocs(
          pruneToTerms(spark.table(s"${table}_pos"), qterms),
          rs.map(_.get(docIdx)).toSeq.distinct,
          preStats.map(_._1).getOrElse(0L))), "doc_id")
    snippetsFromPartials(partials, pos, rankedL, docs, docIdCol,
      docTextCol, context)
  }

  /** [[attachBestTermSnippets]] over doc-disjoint shards — the snippet
    * leg of the sharded serving family. The argmax term per (qid, doc)
    * must match the whole-index choice EXACTLY for the sharded-snippet
    * gates to answer the single-index oracles, so the partials come
    * from [[partialsWith]] against the GLOBAL (N, avgdl, df) fold (the
    * [[bm25ShardedQuery]] discipline), never per-shard stats; the
    * positional lookups union per shard (a doc's positions live in
    * exactly its own shard). Costs stay ranked-doc-bounded per shard:
    * every shard's partials pass is doc-gated by the SAME broadcast
    * ranked set before any aggregate.
    */
  private[operators] def attachBestTermSnippetsSharded(
      spark: SparkSession, tables: Seq[String], qt: DataFrame,
      ranked: DataFrame, docs: DataFrame, docIdCol: String,
      docTextCol: String, context: Int, k1: Double, b: Double,
      maxDfFrac: Double, qterms: Option[Seq[String]]): DataFrame = {
    tables.foreach(t => require(tableExists(spark, s"${t}_pos"),
      s"snippet extraction: $t has no positional table — " +
        "build the index with positions = true"))
    // same literal-sharing as the single-index form (round 21) — here
    // the lazy ranked plan was re-executed per SHARD leg (S partials
    // legs each embedding the rankedDocs broadcast), so the literal
    // keeps the span pass O(S) total instead of O(S × ranking)
    val (rankedL, rankedRows) = literalizeBounded(spark, ranked)
    val rankedDocs = rankedL.select("doc_id").distinct()
    val (nDocs, avgdl, dict) = foldShardStats(spark, tables, qterms,
      maxDfFrac)
    val partials = tables.map(partialsWith(spark, _, qt, k1, b, nDocs,
        avgdl, dict, qterms, Some(rankedDocs), true))
      .reduce(_.unionByName(_))
    val docIdx = ranked.schema.fieldIndex("doc_id")
    val pos = tables.map(t => Tombstones.filterOut(spark, t,
        rankedRows.fold(pruneToTerms(spark.table(s"${t}_pos"), qterms))(
          rs => prunedByDocs(
            pruneToTerms(spark.table(s"${t}_pos"), qterms),
            rs.map(_.get(docIdx)).toSeq.distinct, nDocs)), "doc_id"))
      .reduce(_.unionByName(_))
    snippetsFromPartials(partials, pos, rankedL, docs, docIdCol,
      docTextCol, context)
  }

  /** Shared snippet tail: argmax term per (qid, ranked doc) from the
    * (qid, nid, term, partial) frame, first-occurrence start from the
    * positional rows, ±context token window sliced from the corpus
    * text — rows without a lexical occurrence keep null start/snippet
    * through the LEFT joins. */
  private def snippetsFromPartials(partials: DataFrame, pos: DataFrame,
                                   ranked: DataFrame, docs: DataFrame,
                                   docIdCol: String, docTextCol: String,
                                   context: Int): DataFrame = {
    val best = partials
      .join(ranked.select(col("qid"), col("doc_id").as("nid")),
        Seq("qid", "nid"), "left_semi")
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid", "nid")
          .orderBy(col("partial").desc, col("term"))))
      .filter(col("_rn") === 1)
      .select(col("qid"), col("nid").as("doc_id"), col("term"))
    val firstStart = best
      .join(pos, Seq("term", "doc_id"))
      // delta-encoded positions store the first (minimum) offset
      // absolute at index 1 — the first occurrence without a decode
      .select(col("qid"), col("doc_id"),
        element_at(col("positions"), 1).cast("long").as("start"))
    val corpusToks = docs.select(col(docIdCol).as("doc_id"),
      toks(col(docTextCol)).as("_ws"))
    val from = greatest(col("start") - context, lit(0))
    val payload = ranked.columns.map(col)
    ranked
      .join(firstStart, Seq("qid", "doc_id"), "left")
      .join(corpusToks, Seq("doc_id"), "left")
      .select(payload :+ col("start") :+
        when(col("start").isNotNull && col("_ws").isNotNull,
          concat_ws(" ", slice(col("_ws"), (from + 1).cast("int"),
            (col("start") - from + lit(1 + context)).cast("int"))))
          .as("snippet"): _*)
  }

  /** Shared tail of the positional entry points: BM25-score the
    * query's distinct terms with the candidate doc-gate threaded into
    * the postings scan, keep exactly the matched docs, rank top-k. */
  private def posScoreRank(spark: SparkSession, table: String,
                           probe: DataFrame, matched: DataFrame,
                           candFilter: Option[DataFrame], bcast: Boolean,
                           qterms: Option[Seq[String]], k: Int,
                           k1: Double, b: Double,
                           preStats: Option[(Long, Long)] = None)
      : DataFrame = {
    val qt = probe.select("qid", "term").distinct()
    // Round-18 note (measured, then REVERTED): gating the scoring
    // stage's postings to the collected MATCHED set — the MaxScore
    // lesson applied to positional ranking — was built, hash-gated
    // green (t20/t21 unchanged), and then A/B'd at median-of-3 on the
    // bench kernels: phrase +21%, NEAR +53% SLOWER gated (BASELINE.md
    // round-18 "match-gated scoring" section). The ranking stage is
    // SCAN-bound: the term-bucketed postings are read per query term
    // regardless of any doc gate, the aggregate is already
    // candidate-gated, and the extra control job costs more than the
    // aggregate mass it removes. The lever that WOULD cut this cost is
    // a different index layout (impact-ordered/quantized posting
    // blocks), not a tighter doc gate on this one.
    val scored = bm25Scored(spark, table, qt, k1, b, maxDfFrac = 1.0,
        qterms, docFilter = candFilter, broadcastDocs = bcast,
        preStats = preStats)
      .join(matched, Seq("qid", "nid"), "left_semi")
    Similarity.rankTopK(scored, k)
      .select(col("qid"), col("nid").as("doc_id"),
        col("cos").cast("long").as("score_micro"),
        col("rank").as("rnk"))
  }

  /** Every shard's bounded positional-control rows in ONE Spark job —
    * the [[foldShardStats]] batching discipline applied to
    * [[posGatedProbe]]'s collect: S per-shard-LIMITED (qid, term, df)
    * legs union with a shard tag and collect once, instead of one
    * serialized driver collect per shard (measured at ~0.25 s of job
    * latency per shard — linear driver time an O(100)-shard
    * deployment's control plane cannot afford). The `limit` lives
    * INSIDE each union leg, so every shard's row set — and its
    * collected/overflow decision — is byte-identical to the per-call
    * form.
    *
    * Driver residency: the batched collect holds S·(maxControlRows+1)
    * rows AT ONCE where the serialized form held one shard's at a time
    * — at S = 100 that is ~820k tiny (qid, term, df) rows, ~25-50 MB,
    * control-plane sized for any driver that can run 100-leg plans at
    * all (the per-leg Catalyst state dwarfs it). The bound is a
    * worst-case: a shard contributes maxControlRows+1 rows only when
    * its (qid, term) frame overflows, and overflow also disables its
    * pushdown — real batches sit far under the cap. If a deployment
    * ever needs S ≫ 100 with full caps, chunk this collect into
    * ⌈S/100⌉ jobs; until measured, one job is the right default. */
  private def shardControlRows(spark: SparkSession, tables: Seq[String],
                               qt: DataFrame)
      : Seq[Array[org.apache.spark.sql.Row]] = {
    GraftFunctions.unionGuard(spark)
    val rows = tables.zipWithIndex.map { case (t, i) =>
      qt.join(spark.table(s"${t}_terms")
          .groupBy("term").agg(sum("df").as("df")), Seq("term"), "left")
        .select(col("qid"), col("term"),
          coalesce(col("df"), lit(0L)).as("df"))
        .limit(maxControlRows + 1)
        .select(lit(i).as("_sh"), col("qid"), col("term"), col("df"))
    }.reduce(_.unionByName(_)).collect()
    val bySh = rows.groupBy(_.getInt(0))
    tables.indices.map(i =>
      bySh.getOrElse(i, Array.empty[org.apache.spark.sql.Row])
        .map(r => org.apache.spark.sql.Row(r.get(1), r.get(2), r.get(3))))
  }

  /** Every shard's (n_docs, avgdl-ceiling) stats in ONE job — the
    * dial facts [[posGatedProbe]]'s NEAR budget reads per shard,
    * batched like [[shardControlRows]]. Tombstone-CORRECTED (round 21,
    * the dial-fact unification): each shard's deletion-correction
    * aggregate rides the same union sign-tagged (the
    * [[correctedStatsFrame]] discipline), so truncation caps are
    * path-independent — the single-index path's fused read has been
    * corrected since round 20, and a raw sharded read would route the
    * same tombstone-bearing batch differently. Corrected values only
    * tighten cost dials; exactness never depends on them. */
  private def shardStatRows(spark: SparkSession, tables: Seq[String])
      : Seq[(Long, Long)] = {
    GraftFunctions.unionGuard(spark)
    val rows = tables.zipWithIndex.map { case (t, i) =>
      val base = spark.table(s"${t}_stats")
        .agg(coalesce(sum("n_docs"), lit(0L)).as("n"),
          coalesce(sum("dl_sum"), lit(0L)).as("s"))
        .select(lit(i).as("_sh"), lit(1L).as("_sign"), col("n"), col("s"))
      deletedRows(spark, t) match {
        case Some(del) => base.unionByName(
          del.select("doc_id", "dl").distinct()
            .agg(count(lit(1)).as("n"),
              coalesce(sum("dl"), lit(0L)).as("s"))
            .select(lit(i).as("_sh"), lit(-1L).as("_sign"),
              col("n"), col("s")))
        case None => base
      }
    }.reduce(_.unionByName(_))
      .groupBy("_sh")
      .agg(coalesce(sum(col("_sign") * col("n")), lit(0L)).as("n"),
        coalesce(sum(col("_sign") * col("s")), lit(0L)).as("s"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    tables.indices.map { i =>
      val (n, s) = rows.getOrElse(i, (0L, 0L))
      (n, math.max(1L, if (n > 0) (s + n - 1) / n else 1L))
    }
  }

  /** The shared positional control plane behind [[bm25PhraseQuery]]
    * and [[bm25ProximityQuery]] (the plan notes live on the phrase
    * scaladoc): takes the per-(qid, …, term) probe frame, returns the
    * probe joined to the (tombstone-filtered, term-pruned, candidate-
    * doc-gated) positional scan, plus the candidate doc filter /
    * broadcast decision / pushed-term list the caller threads into
    * scoring. */
  private def posGatedProbe(spark: SparkSession, table: String,
                            probe: DataFrame, caller: String,
                            maxDfFrac: Double, maxCandBroadcast: Long,
                            gateMinPosMass: Long, window: Int = 0,
                            maxPosMass: Long = Long.MaxValue,
                            preQdfRows: Option[Array[org.apache.spark.sql.Row]] = None,
                            preStats: Option[(Long, Long)] = None)
      : (DataFrame, Option[DataFrame], Boolean, Option[Seq[String]],
         Option[(Long, Long)]) = {
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    GraftFunctions.ensureRegistered(spark)
    healFold(spark, table)
    require(tableExists(spark, s"${table}_pos"),
      s"$caller: $table has no positional table — " +
        "build the index with positions = true")
    val qt = probe.select("qid", "term").distinct()
    // ---- ONE bounded control read: the per-(qid, term) df frame.
    // Everything the control plane needs — the pushdown term list, the
    // rarest term per phrase, the candidate-set bound Σ_q min_t df(t),
    // the total posting mass Σ df, and the broadcast decision — derives
    // from this single collect (≤ maxControlRows rows, the mf1
    // point-lookup discipline). The dictionary aggregate it reads is
    // term-bucketed and tiny relative to any posting scan. Batches past
    // the cap fall back to frame-only plans (no collect, no pushdown).
    // `preQdfRows`/`preStats`: the SHARDED entry points collect every
    // shard's control rows / stats row in ONE batched job
    // ([[shardControlRows]]/[[shardStatRows]] — per-shard limits
    // preserved inside the union, so the semantics per shard are
    // byte-identical to collecting here) and pass each shard its
    // slice; the per-call collect below is the single-index path.
    val qdf = qt
      .join(spark.table(s"${table}_terms")
        .groupBy("term").agg(sum("df").as("df")), Seq("term"), "left")
      .select(col("qid"), col("term"), coalesce(col("df"), lit(0L)).as("df"))
    // round-20 control-plane fusion: on the single-index path the
    // CORRECTED one-row stats frame crossJoins the bounded collect, so
    // the scoring stage downstream ([[posScoreRank]] → bm25Scored)
    // reuses them instead of paying its own driver action; the sharded
    // (preQdfRows) path keeps its batched form and scoring fold.
    val (qdfRows, scoreStats): (Array[org.apache.spark.sql.Row],
        Option[(Long, Long)]) = preQdfRows match {
      case Some(rs) => (rs, None)
      case None =>
        val cr = qdf.limit(maxControlRows + 1)
          .crossJoin(correctedStatsFrame(spark, table)).collect()
        (cr.map(r => org.apache.spark.sql.Row(r.get(0), r.get(1),
          r.get(2))),
         cr.headOption.map(r => (r.getLong(3), r.getLong(4))))
    }
    val collected = qdfRows.length <= maxControlRows
    val maxPushTerms = 1 << 12
    val qterms: Option[Seq[String]] = if (collected) {
      val ts = qdfRows.map(_.getString(1)).toSeq.distinct
      // no threshold raise here: [[prunedByValues]] pushes the list
      // stack-safely (per-value only up to [[maxInPushValues]] = 256)
      if (ts.size <= maxPushTerms) Some(ts) else None
    } else None
    // truncation cap in documents (Long.MaxValue = exact; stats are
    // read only when a dial needs corpus facts — the maxDfFrac cap and
    // the NEAR anchor budget both do). Dial facts are tombstone-
    // CORRECTED on EVERY path (round 21 unification): the fused fast
    // path has carried corrected stats since round 20, the sharded
    // preStats are corrected in [[shardStatRows]], and the lazy
    // fallback below reads [[correctedStats]] — so truncation routing
    // is path-independent on tombstone-bearing indexes. Cost-only
    // dials; corrected values are if anything tighter.
    lazy val (nDocsStat, avgdlCeil) = preStats
      .orElse(scoreStats.map { case (n, s) =>
        (n, math.max(1L, if (n > 0) (s + n - 1) / n else 1L)) })
      .getOrElse {
        val (n, s) = correctedStats(spark, table)
        (n, math.max(1L, if (n > 0) (s + n - 1) / n else 1L))
      }
    val capDocs0: Long = if (maxDfFrac < 1.0)
      math.max(1L, (maxDfFrac * nDocsStat).toLong)
    else Long.MaxValue
    val perQid = qdfRows.groupBy(_.get(0))
    val (candBound0, nQ): (Long, Long) =
      if (collected)
        (perQid.valuesIterator.map(rs =>
          math.min(rs.iterator.map(_.getLong(2)).min, capDocs0)).sum,
         perQid.size.toLong)
      else {
        val r = qdf.groupBy("qid").agg(min("df").as("mdf"))
          .agg(coalesce(sum(least(col("mdf"), lit(capDocs0))), lit(0L)),
            count(lit(1)))
          .head()
        (r.getLong(0), r.getLong(1))
      }
    // ---- NEAR position-mass budget (window > 0: the window-cover
    // match shuffles and scans the gated position lists — see the
    // maxPosMass scaladoc on bm25ProximityQuery). avgdl bounds one
    // candidate doc's query-term positions (they cannot exceed its
    // length) and the grouped match's cost is window-independent, so
    // the batch fits iff candBound · avgdl ≤ maxPosMass. Over-budget
    // batches AUTO-ROUTE to the truncation dial at the largest
    // per-query cap that fits — loudly, and queries whose rarest term
    // is under the cap stay exact.
    val (capDocs, candBound) =
      if (window > 0 && maxPosMass != Long.MaxValue && nQ > 0) {
        val perDocPos = math.max(1L, avgdlCeil)
        val budgetDocs = maxPosMass / perDocPos
        if (candBound0 > budgetDocs) {
          val capEff = math.min(capDocs0, math.max(1L, budgetDocs / nQ))
          val cb = if (collected)
            perQid.valuesIterator.map(rs =>
              math.min(rs.iterator.map(_.getLong(2)).min, capEff)).sum
          else math.min(candBound0, nQ * capEff)
          logger.warn(s"$caller: position-mass bound ($candBound0 " +
            s"candidate docs x $perDocPos positions/doc) exceeds " +
            s"maxPosMass=$maxPosMass; auto-routing the $nQ-query batch " +
            s"to truncated matching at $capEff candidate docs/query " +
            "(queries whose rarest term is under the cap stay exact; " +
            "raise maxPosMass to force exact matching)")
          (capEff, cb)
        } else (capDocs0, candBound0)
      } else (capDocs0, candBound0)
    val totalBound: Long =
      if (collected) qdfRows.iterator.map(_.getLong(2)).sum
      else Long.MaxValue
    // ---- COST GATE on the rarest-term doc-gating. The gating plan
    // (doc-level + per-qid semi-joins bounding the intersection by the
    // rarest term's postings) and the direct plan (intersect every
    // term's position lists) are EXACT — this is a cost decision only.
    // Gate when: the truncation dial is engaged (truncation is defined
    // on the candidate set); the batch overflowed the control collect
    // (conservative at unknown scale); or the direct intersection's
    // posting mass passes `gateMinPosMass`. MEASURED (DevRetrieval
    // warm legs, both plans forced, all-head 3-token phrases): at 10⁶
    // docs (mass ≈ 3·10⁷) gated serves 443 vs direct 693 ms/q; at 10⁷
    // (mass ≈ 3·10⁸) gated 5.2 vs direct 7.9 s/q — gating wins
    // wherever the position mass is material, and the default 2²² only
    // routes genuinely tiny workloads (e.g. a 6·10³-doc index, mass
    // ≈ 10⁵, where the extra semi-join stages are the dominant cost)
    // around the candidate machinery.
    val useGate = capDocs != Long.MaxValue || !collected ||
      totalBound > gateMinPosMass
    val pos = Tombstones.filterOut(spark, table,
      pruneToTerms(spark.table(s"${table}_pos"), qterms), "doc_id")
    val bcast = candBound <= maxCandBroadcast
    val (startsInput, candFilter) =
      if (useGate) {
        // rarest-term candidates: df from the folded dictionary (raw df
        // is fine — candidates only need to be a SUPERSET of matches,
        // and the tombstone filter on `pos` keeps deleted docs out).
        // When the control rows are in hand, the rarest row per query
        // is DERIVED LOCALLY and re-injected as a literal frame
        // (round 20) — the plan-side form re-read the dictionary
        // aggregate and paid a window sort inside the candidate
        // subplan for rows the driver already holds; same rows by the
        // same (df, term) order.
        val rarest = if (collected)
          spark.createDataFrame(java.util.Arrays.asList(
            perQid.valuesIterator.map(rs =>
              rs.minBy(r => (r.getLong(2), r.getString(1)))(dfTermOrdering))
              .toSeq: _*),
            org.apache.spark.sql.types.StructType(qdf.schema))
        else qdf.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy("qid").orderBy(col("df"), col("term"))))
          .filter(col("rn") === 1).select("qid", "term", "df")
        // collected rarest terms prune the candidate-generation scan to
        // ONLY the rarest terms' row groups — without this the subplan
        // reads every query term's position list, head terms included,
        // just to derive the candidates it exists to bound
        val rarestTerms: Option[Seq[String]] =
          if (collected) Some(perQid.valuesIterator.map(rs =>
            rs.minBy(r => (r.getLong(2), r.getString(1)))(dfTermOrdering)
              .getString(1))
            .toSeq.distinct)
          else None
        val posRarest = Tombstones.filterOut(spark, table,
          pruneToTerms(spark.table(s"${table}_pos"),
            rarestTerms.orElse(qterms)), "doc_id")
        val cand0 = rarest.join(posRarest, Seq("term"))
          .select(col("qid"), col("doc_id"), col("df"))
        // truncated matching for over-cap phrases (see the maxDfFrac
        // doc): a deterministic per-doc hash sample at rate capDocs/df —
        // map-only, no shuffle; under-cap phrases pass untouched
        val sampleDen = 1L << 20
        val cand = (if (capDocs == Long.MaxValue) cand0
          else cand0.filter(col("df") <= lit(capDocs) ||
            pmod(xxhash64(col("doc_id")), lit(sampleDen)).cast("double") <
              lit((sampleDen * capDocs).toDouble) / col("df").cast("double")))
          .select("qid", "doc_id")
        if (bcast && collected &&
            candBound <= maxControlRows.toLong * msOverflowFactor) {
          // ---- FUSED CANDIDATE PLANE (round 21, guide §1.2/§2.4/§5 —
          // the MaxScore pass-1 fusion applied to the positional
          // family): under the CONTROL-PLANE bound (≤ 64k rows — a
          // literal relation is re-serialized into every consumer's
          // plan, so unlike a distributed broadcast it must stay
          // Catalyst-sized; the first unbounded cut of this change
          // OOMed the 1e6 natural batch, whose all-head queries carry
          // ~1e6-row candidate sets) the (qid, doc_id) candidate rows
          // were going to be pulled to the driver anyway, TWICE, as
          // broadcast builds (the doc-level and the per-qid
          // semi-join), and a THIRD time for the scoring stage's
          // docFilter — each a separate execution of the rarest-term
          // subplan. Materialize them ONCE and re-inject as literal
          // frames: every consumer broadcasts a local relation instead
          // of re-running the scan, and the distinct ids PUSH into the
          // (term, doc_id)-sorted positional scan ([[prunedByDocs]] —
          // per-value or gap-merged ranges, page-skip on the round-21
          // layout). Batches past the bound keep the lazy broadcast
          // flow below, unchanged from round 20. Row-identical: the
          // sample filter is a deterministic xxhash test, so collected
          // rows == plan rows.
          val candRows = cand.collect()
          val docF = org.apache.spark.sql.types.StructField("doc_id",
            cand.schema("doc_id").dataType, cand.schema("doc_id").nullable)
          val candVals: Seq[Any] = candRows.map(_.get(1)).toSeq.distinct
          val candDocsF = idFrame(spark, candVals, docF)
          val candF = spark.createDataFrame(
            java.util.Arrays.asList(candRows.toSeq: _*),
            org.apache.spark.sql.types.StructType(cand.schema))
          val posCand = prunedByDocs(pos, candVals, nDocsStat)
            .join(broadcast(candDocsF), Seq("doc_id"), "left_semi")
          (probe.join(posCand, Seq("term"))
            .join(broadcast(candF), Seq("qid", "doc_id"), "left_semi"),
            Some(candDocsF))
        } else {
          val candDocs = cand.select("doc_id").distinct()
          val posCand = pos.join(if (bcast) broadcast(candDocs) else candDocs,
            Seq("doc_id"), "left_semi")
          (probe.join(posCand, Seq("term"))
            .join(if (bcast) broadcast(cand) else cand,
              Seq("qid", "doc_id"), "left_semi"),
            Some(candDocs))
        }
      } else (probe.join(pos, Seq("term")), None)
    (startsInput, candFilter, bcast, qterms, scoreStats)
  }

  /** Grow one BM25 shard into two: rehash the parent's index rows into
    * doc-disjoint children under the hierarchical router
    * ([[Sharding.staysInFirstChild]] — splitting shard `shardIndex` of
    * an `nShards`-family puts each doc at index `shardIndex` or
    * `shardIndex + nShards` of the doubled family), recompute each
    * child's derived dictionary/stats from its own postings, and retire
    * the parent. Cost is O(parent shard): the OTHER shards of the
    * family never move — the operational migration story for a
    * deployment whose per-shard index outgrew its box (splitting all S
    * shards yields exactly the canonical 2S family
    * [[graft.streaming.RefreshLoop.shardOf]] routes to). Serving the
    * family with the parent replaced by the two children is EXACTLY
    * the pre-split ranking ([[bm25ShardedQuery]] folds global stats
    * regardless of which shard holds which doc — gated at t40); any
    * parent built from a doc-disjoint slice splits correctly, router-
    * routed or not.
    *
    * Tombstones fold FIRST ([[bm25FoldTombstones]]), so the children
    * are born tombstone-free and their derived tables are pure
    * recomputations of their postings.
    *
    * Crash contract (the rename-aside discipline, adapted to a
    * build-then-retire shape): both children build COMPLETELY from the
    * live parent (idempotent overwrites — a crash mid-build leaves the
    * parent serving and the re-run rebuilds), then a
    * `<parent>_splitdone` marker lands, and only then does the parent
    * retire. A re-run after ANY kill first consults the marker: present
    * ⇒ the children are complete and only the retire resumes (the
    * parent may be half-dropped — rebuilding from it would corrupt the
    * children, which is exactly what the marker exists to prevent);
    * absent ⇒ rebuild from the intact parent. Serve the PARENT family
    * until splitShard returns; after a crash, re-run it before serving
    * either family.
    */
  def splitShard(spark: SparkSession, parent: String,
                 child0: String, child1: String,
                 shardIndex: Int = 0, nShards: Int = 1): Unit =
    splitShardImpl(spark, parent, child0, child1, shardIndex, nShards,
      failAt = -1)

  /** Crash injected by the split test seam ([[splitShardImpl]] and the
    * LangModel/Similarity/ProductQuant twins). */
  private[graft] final class InjectedSplitCrash(val at: Int)
    extends RuntimeException(s"injected split crash after boundary $at")

  /** [[splitShard]] with a crash seam: `failAt` ≥ 0 throws
    * [[InjectedSplitCrash]] AFTER boundary 0 (tombstone fold), 1
    * (child0 built), 2 (child1 built), 3 (marker landed), 4 (parent
    * retired, before the marker clears). The chaos spec drives every
    * boundary and asserts a re-run converges to the identical split.
    */
  private[graft] def splitShardImpl(spark: SparkSession, parent: String,
                                    child0: String, child1: String,
                                    shardIndex: Int, nShards: Int,
                                    failAt: Int): Unit = {
    def boundary(i: Int): Unit =
      if (failAt == i) throw new InjectedSplitCrash(i)
    require(nShards >= 1 && shardIndex >= 0 && shardIndex < nShards,
      s"splitShard: shardIndex $shardIndex out of range for $nShards shards")
    GraftFunctions.ensureRegistered(spark)
    val marker = s"${parent}_splitdone"
    if (!tableExists(spark, marker)) {
      require(tableExists(spark, parent),
        s"splitShard: $parent does not exist (and no _splitdone marker " +
          "— nothing to resume)")
      healFold(spark, parent)
      bm25FoldTombstones(spark, parent)
      boundary(0)
      val buckets = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(parent))
        .bucketSpec.map(_.numBuckets).getOrElse(8)
      val first = Sharding.staysInFirstChild(col("doc_id"), shardIndex,
        nShards)
      def build(child: String, pred: org.apache.spark.sql.Column): Unit = {
        BucketedJoin.writeBucketed(spark.table(parent).filter(pred),
          child, "term", buckets)
        // derived tables recompute from the WRITTEN child postings —
        // one consistent source, the rebuildDerived exprs verbatim
        val cp = spark.table(child)
        BucketedJoin.writeBucketed(
          cp.groupBy("term").agg(count(lit(1)).as("df")),
          s"${child}_terms", "term", buckets)
        BucketedJoin.writeBucketed(
          cp.select("doc_id", "dl").distinct()
            .agg(count(lit(1)).as("n_docs"),
              coalesce(sum("dl"), lit(0L)).as("dl_sum")),
          s"${child}_stats", "n_docs", 1)
        if (tableExists(spark, s"${parent}_pos"))
          BucketedJoin.writeBucketed(
            spark.table(s"${parent}_pos").filter(pred),
            s"${child}_pos", "term", buckets)
        Tombstones.clear(spark, child)
      }
      build(child0, first)
      boundary(1)
      build(child1, !first)
      boundary(2)
      BucketedJoin.writeBucketed(spark.range(1).toDF("done"), marker,
        "done", 1)
      boundary(3)
    }
    for (s <- Seq("", "_terms", "_stats", "_pos"); t = parent + s
         if tableExists(spark, t))
      BucketedJoin.dropWithLocation(spark, t)
    // retire the parent's tombstone set too (the Dedup/Similarity split
    // discipline): a tombstone added between the pre-build fold and this
    // retire would otherwise linger under the dead table name
    Tombstones.clear(spark, parent)
    boundary(4)
    BucketedJoin.dropWithLocation(spark, marker)
  }

  /** The inverse of [[splitShard]] — fold two doc-disjoint BM25 shards
    * into one (the SHRINK path: after takedowns leave a family's
    * shards underfull, merging halves the per-query leg count and the
    * open-file surface). Both parents' tombstones fold first, then the
    * merged postings/positional tables are the row UNIONS rebucketed
    * and the derived tables recompute from the merged postings —
    * doc-disjointness makes the union exact, and sharded serving over
    * the family with the parents replaced by the merged table is the
    * identical ranking (global stats are placement-blind; the t40
    * argument run backwards). Positions merge iff BOTH parents carry
    * them (a mixed pair is rejected loudly — a silently positional-less
    * merge would break phrase serving). Same build → marker → retire
    * crash protocol as [[splitShard]] (marker on `merged`; a re-run
    * resumes, never rebuilds from half-dropped parents).
    */
  def mergeShards(spark: SparkSession, parent0: String, parent1: String,
                  merged: String): Unit =
    mergeShardsImpl(spark, parent0, parent1, merged, failAt = -1)

  /** [[mergeShards]] with the [[InjectedSplitCrash]] seam — boundaries
    * 0 (tombstone folds), 1 (merged tables built), 2 (marker), 3
    * (parents retired, before the marker clears). */
  private[graft] def mergeShardsImpl(spark: SparkSession, parent0: String,
                                     parent1: String, merged: String,
                                     failAt: Int): Unit = {
    def boundary(i: Int): Unit =
      if (failAt == i) throw new InjectedSplitCrash(i)
    GraftFunctions.ensureRegistered(spark)
    GraftFunctions.unionGuard(spark)
    val marker = s"${merged}_mergedone"
    if (!tableExists(spark, marker)) {
      require(tableExists(spark, parent0) && tableExists(spark, parent1),
        s"mergeShards: both $parent0 and $parent1 must exist " +
          "(no _mergedone marker — nothing to resume)")
      val pos0 = tableExists(spark, s"${parent0}_pos")
      val pos1 = tableExists(spark, s"${parent1}_pos")
      require(pos0 == pos1,
        s"mergeShards: $parent0 and $parent1 disagree on positional " +
          "tables — merging would silently drop phrase serving for one " +
          "side's docs; rebuild the positional side or split the other")
      Seq(parent0, parent1).foreach { p =>
        healFold(spark, p); bm25FoldTombstones(spark, p)
      }
      boundary(0)
      val buckets = BucketedJoin.mergedBucketCount(spark, parent0, parent1)
      BucketedJoin.writeBucketed(
        spark.table(parent0).unionByName(spark.table(parent1)),
        merged, "term", buckets)
      val mp = spark.table(merged)
      BucketedJoin.writeBucketed(
        mp.groupBy("term").agg(count(lit(1)).as("df")),
        s"${merged}_terms", "term", buckets)
      BucketedJoin.writeBucketed(
        mp.select("doc_id", "dl").distinct()
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum("dl"), lit(0L)).as("dl_sum")),
        s"${merged}_stats", "n_docs", 1)
      if (pos0)
        BucketedJoin.writeBucketed(
          spark.table(s"${parent0}_pos")
            .unionByName(spark.table(s"${parent1}_pos")),
          s"${merged}_pos", "term", buckets)
      Tombstones.clear(spark, merged)
      boundary(1)
      BucketedJoin.writeBucketed(spark.range(1).toDF("done"), marker,
        "done", 1)
      boundary(2)
    }
    for (p <- Seq(parent0, parent1); s <- Seq("", "_terms", "_stats", "_pos");
         t = p + s if tableExists(spark, t))
      BucketedJoin.dropWithLocation(spark, t)
    // clear the retired parents' tombstone sets (see splitShardImpl)
    Seq(parent0, parent1).foreach(Tombstones.clear(spark, _))
    boundary(3)
    BucketedJoin.dropWithLocation(spark, marker)
  }
}
