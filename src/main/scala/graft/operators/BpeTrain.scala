package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE vocabulary TRAINING — the learning half of the
  * subword stack ([[graft.plans.BpeTokenize]] applies a vocab; this
  * derives one from the corpus, closing the production loop: learn →
  * write merges file → [[graft.plans.BpeVocabs.registerMerges]] →
  * `bpe_tokenize_vocab`, round-tripped in BpeTrainSpec).
  *
  * Classic BPE (Sennrich et al. 2016) restated Spark-first:
  *
  *  1. Train on the WORD-FREQUENCY table, not the token stream — the
  *     corpus-sized `groupBy(word)` happens ONCE; every merge iteration
  *     then works on distinct words (≈10⁵–10⁸ rows at 100 TB, orders of
  *     magnitude below the corpus) weighted by their counts.
  *  2. Each iteration is ONE pair-count aggregation (`word_ngrams(syms,
  *     2)` explode → sum(cnt), a vocabulary-sized shuffle) + ONE bounded
  *     `limit(1).collect()` (the argmax pair — a single row, the same
  *     driver discipline as IVF centroid training) + a map-only merge
  *     application. The word table is re-persisted and the previous
  *     iteration unpersisted each round (the PageRank/CC lineage rule),
  *     so per-iteration cost stays flat in the merge index.
  *  3. Merge application is the greedy LEFT-TO-RIGHT single pass of the
  *     reference implementation, expressed as an in-row `aggregate` fold
  *     (no shuffle): scanning symbols, `[…, a] + b → […, ab]` unless the
  *     trailing `a` was itself just produced by this merge — which gives
  *     runs of an identical symbol the standard ⌊run/2⌋ pairing
  *     (`aaaa → aa aa`, `aaa → aa a`). The argmax tie-break is (count
  *     DESC, then the space-joined pair ASC) — total, so the merge
  *     sequence is deterministic and engine-reproducible (q126 re-derives
  *     it in DuckDB with the island-parity formulation of the same
  *     left-to-right pass).
  *
  * At a production 32k merges the per-merge driver loop
  * ([[learnMerges]]) issues 32k small jobs — job-dispatch-bound, not
  * data-bound (~0.25 s/job floor measured in this sandbox → ~2 h for a
  * 32k train regardless of cluster size). [[learnMergesBatched]] is the
  * scale path: batched top-M merge selection with PROOF-CARRIED conflict
  * detection — each round's single snapshot aggregation also computes,
  * per candidate pair, an upper bound on the count of any pair its merge
  * could CREATE (from the 3-gram table), and the driver accepts the
  * maximal ranked prefix of candidates that sequential training would
  * provably have picked unchanged (see the acceptance invariants on
  * [[learnMergesBatched]]). Exactness is never traded: the batched
  * sequence is merge-for-merge identical to [[learnMerges]] (spec-pinned
  * on adversarial fixtures and random corpora), it just reaches it in
  * ~jobs/batch instead of ~jobs/merge.
  */
object BpeTrain {

  /** One learned merge: `piece = a + b`, `pairCount` the weighted
    * adjacency count that won the iteration. */
  final case class Merge(rank: Int, a: String, b: String, pairCount: Long) {
    def piece: String = a + b
  }

  /** Lowercased whitespace word-frequency table: `(w, cnt)`. */
  def wordTable(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(graft.functions.TextOps.tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right application of one merge to a symbol array —
    * in-row fold, no shuffle. Exposed for spec-level equivalence checks. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      // `last == a` can never be confused with this merge's own output:
      // the output is a+b and b is non-empty, so a freshly-merged symbol
      // never re-matches as the pair's left side (runs of an identical
      // symbol therefore pair up floor(run/2) times, the reference
      // behavior)
      when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
      .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` merges from the corpus. Returns them in rank
    * order; stops early if no adjacent pair remains.
    *
    * `truncateEvery`: the per-iteration persist serves the DATA, but the
    * logical plan still nests one fold layer per merge — at a production
    * 32k merges the ANALYZER cost of iteration k is O(k) and the total
    * O(k²) (the exact failure mode Graph/connectedComponents hit).
    * Every `truncateEvery` iterations the word table is lazily
    * `localCheckpoint`ed, cutting the plan back to a leaf — the
    * Graph.checkpointEvery discipline, on by default here because
    * training is inherently many-round. */
  def learnMerges(docs: DataFrame, text: Column, numMerges: Int,
      truncateEvery: Int = 16,
      onIteration: (Int, Double) => Unit = (_, _) => ()): Seq[Merge] = {
    require(numMerges >= 1, s"need numMerges >= 1, got $numMerges")
    require(truncateEvery >= 1, s"need truncateEvery >= 1, got $truncateEvery")
    val spark = docs.sparkSession
    var words = wordTable(docs, text)
      .select(col("w"), col("cnt"),
        // seed segmentation: one symbol per character
        expr("regexp_extract_all(w, '(.)', 1)").as("syms"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val iterT0 = System.nanoTime()
      val top = words
        .select(explode(graft.plans.GraftFunctions.wordNGrams(col("syms"), 2)).as("pair"),
          col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        // symbols never contain spaces (they concatenate word chars), so
        // the 2-gram splits back unambiguously
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        out += Merge(rank, a, b, top(0).getLong(1))
        val prev = words
        val next = prev.select(col("w"), col("cnt"),
            applyMerge(col("syms"), a, b).as("syms"))
        // checkpoint iterations skip the Dataset-level persist:
        // localCheckpoint already caches at the RDD level, and stacking
        // the CacheManager on top just materializes the same rows twice
        words =
          if (rank % truncateEvery == 0) next.localCheckpoint(false)
          else next.persist(StorageLevel.MEMORY_AND_DISK)
        words.count() // materialize before dropping the parent
        prev.unpersist(blocking = false)
        onIteration(rank, (System.nanoTime() - iterT0) / 1e9)
        rank += 1
      }
    }
    words.unpersist(blocking = false)
    out.result()
  }

  /** The learned pieces in merge order — the exact content of a merges
    * file ([[graft.plans.BpeVocabLarge.loadMerges]] format: one piece
    * per line). */
  def pieces(merges: Seq[Merge]): Seq[String] = merges.map(_.piece)

  /** One ranked candidate from a batch round's snapshot: the pair, its
    * exact weighted count, and `createdBound` — the max snapshot 3-gram
    * count over 3-grams having this pair as prefix or suffix, which
    * upper-bounds the count of ANY pair key this merge can create. */
  private final case class Candidate(a: String, b: String, c: Long,
      createdBound: Long)

  /** Batched-selection BPE training — IDENTICAL merge sequence to
    * [[learnMerges]], ~`batch` times fewer Spark jobs.
    *
    * Per round, ONE snapshot aggregation job produces the top-`collectK`
    * pairs by the argmax order (count DESC, space-joined pair ASC), each
    * carrying its creation bound (above). The driver then accepts the
    * maximal PREFIX of that ranked list that sequential training is
    * guaranteed to pick unchanged. Acceptance invariants — for candidate
    * `p = (a,b)` after already accepting `A = q_1..q_j` this round:
    *
    *  1. NON-INTERACTION: for every accepted `q = (c,d)`, `d != a` and
    *     `b != c`. Occurrences of two distinct pairs can only overlap by
    *     sharing exactly one symbol, i.e. patterns `c d=a b` or
    *     `a b=c d`; absent both, applying `q` leaves every occurrence of
    *     `p` intact, so `p`'s snapshot count is still EXACT at its turn.
    *     (Full application of `q` also leaves zero residual occurrences
    *     of `q` itself — greedy left-to-right re-pairs any residue with
    *     the merged symbol, never as `(c,d)` — so an accepted pair can
    *     never win a second time.)
    *  2. CREATION MARGIN: `p.c > max(bound(q) for q in A)`. Applying `q`
    *     creates only pair keys involving the new symbol `cd`; each
    *     occurrence of such a key maps injectively to a snapshot 3-gram
    *     with `(c,d)` as prefix or suffix (even when the neighbor is
    *     itself another accepted merge's output — its underlying right/
    *     left component symbol stands in), so its count is <= bound(q).
    *     Strict `>` because a created key could otherwise tie and win
    *     the ASC tie-break.
    *  3. NO ALPHABET COLLISION: for every accepted `q`, the created
    *     STRING `c+d` must not equal an existing symbol (segmentations
    *     are arrays of strings, so equal strings are the same key and a
    *     collision could ADD count to a surviving snapshot pair,
    *     re-ordering later selections). The driver tracks the alphabet
    *     exactly: seed distinct characters (one bounded job at start) +
    *     every piece accepted so far. A colliding candidate is itself
    *     still exact (its own count is snapshot-true) — it is accepted
    *     and the round closes behind it.
    *
    * The round's first candidate is the snapshot argmax — sequentially
    * correct by definition — so every round accepts >= 1 merge and the
    * worst case degenerates to [[learnMerges]] plus one cheap bound
    * aggregation, while Zipfian corpora (count gaps >> 3-gram counts)
    * accept near-full batches. Accepted merges are applied IN RANK ORDER
    * as chained [[applyMerge]] folds inside one map-only projection —
    * definitionally the sequential application — then the word table is
    * re-materialized once per ROUND (not per merge) under the same
    * persist/localCheckpoint lineage discipline as [[learnMerges]].
    *
    * `batch` also caps the folds chained in one projection (codegen
    * depth); `collectK` caps the driver collect at a few KB.
    * `onRound(rankOfLast, accepted, secs)` fires once per round.
    *
    * `resumeFrom` is the production fault-tolerance path for a long
    * train: pass the rank-contiguous merge prefix from a checkpointed
    * merges file and training replays it as chained map-only folds
    * (lineage-truncated), then CONTINUES selecting from merge
    * `|prefix|+1` — the continuation is provably the unresumed sequence
    * (selection depends only on the current word table, which replay
    * reproduces; spec-pinned, including a prefix crossing a
    * `truncateEvery` boundary). `numMerges` stays the TOTAL, and the
    * returned sequence includes the prefix. */
  def learnMergesBatched(docs: DataFrame, text: Column, numMerges: Int,
      batch: Int = 16, truncateEvery: Int = 16,
      onRound: (Int, Int, Double) => Unit = (_, _, _) => (),
      resumeFrom: Seq[Merge] = Nil): Seq[Merge] = {
    require(numMerges >= 1, s"need numMerges >= 1, got $numMerges")
    require(batch >= 1, s"need batch >= 1, got $batch")
    require(truncateEvery >= 1, s"need truncateEvery >= 1, got $truncateEvery")
    require(resumeFrom.size < numMerges,
      s"resumeFrom already has ${resumeFrom.size} merges, numMerges=$numMerges")
    require(resumeFrom.map(_.rank) == (1 to resumeFrom.size),
      s"resumeFrom must be a rank-contiguous prefix, got ranks ${resumeFrom.map(_.rank)}")
    // RESUME path (production fault tolerance for a 32k-merge train):
    // replay the checkpointed prefix as chained map-only folds — in rank
    // order, so the segmentation is definitionally the one training left
    // off at — truncating lineage every `truncateEvery` folds, then
    // continue selecting from merge |prefix|+1. The continuation is
    // EXACTLY the unresumed sequence (spec-pinned): selection depends
    // only on the current word table, which replay reproduces.
    var words = {
      var w = wordTable(docs, text)
        .select(col("w"), col("cnt"),
          expr("regexp_extract_all(w, '(.)', 1)").as("syms"))
      resumeFrom.grouped(truncateEvery).foreach { g =>
        val folded = g.foldLeft(col("syms")) { (acc, m) => applyMerge(acc, m.a, m.b) }
        w = w.select(col("w"), col("cnt"), folded.as("syms")).localCheckpoint(false)
      }
      // a replayed table is already localCheckpoint-cached; stacking the
      // CacheManager on top would materialize the same rows twice
      if (resumeFrom.isEmpty) w.persist(StorageLevel.MEMORY_AND_DISK) else w
    }
    // exact current alphabet = seed characters ∪ accepted pieces; the
    // seed collect is bounded by the corpus charset (invariant 3)
    val alphabet = scala.collection.mutable.Set[String]()
    // seeding from the (possibly replayed) table's distinct symbols is
    // exactly right for invariant 3: the collision hazard is about keys
    // over CURRENT table symbols — a fully-merged-away symbol has no
    // pairs left to contaminate
    words.select(explode(col("syms")).as("s")).distinct().collect()
      .foreach(r => alphabet += r.getString(0))
    val out = Seq.newBuilder[Merge]
    out ++= resumeFrom // numMerges is the TOTAL; the result includes the prefix
    var rank = resumeFrom.size + 1
    var exhausted = false
    var sinceTruncate = 0
    while (rank <= numMerges && !exhausted) {
      val t0 = System.nanoTime()
      val collectK = math.max(batch * 2, 8)
      val pairs = words
        .select(explode(graft.plans.GraftFunctions.wordNGrams(col("syms"), 2)).as("g"),
          col("cnt"))
        .groupBy("g").agg(sum("cnt").as("c"))
      val tri = words
        .select(explode(graft.plans.GraftFunctions.wordNGrams(col("syms"), 3)).as("g"),
          col("cnt"))
        .groupBy("g").agg(sum("cnt").as("c3"))
        // each 3-gram bounds creations of its prefix pair and its suffix
        // pair (symbols never contain spaces, so the splits are exact)
        .select(explode(array(
            expr("concat_ws(' ', slice(split(g, ' '), 1, 2))"),
            expr("concat_ws(' ', slice(split(g, ' '), 2, 2))"))).as("g"),
          col("c3"))
        .groupBy("g").agg(max("c3").as("created_bound"))
      val top = pairs.join(tri, Seq("g"), "left")
        .orderBy(col("c").desc, col("g"))
        .limit(collectK).collect()
      if (top.isEmpty) { exhausted = true }
      else {
        val cands = top.toSeq.map { r =>
          val Array(a, b) = r.getString(0).split(" ", 2)
          Candidate(a, b, r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2))
        }
        // maximal provably-sequential prefix (invariants 1-3 above)
        val accepted = Seq.newBuilder[Candidate]
        var acceptedList = List.empty[Candidate]
        var maxBound = Long.MinValue
        var open = true
        val room = math.min(batch, numMerges - rank + 1)
        for (p <- cands if open && acceptedList.size < room) {
          val interacts = acceptedList.exists(q => q.b == p.a || p.b == q.a)
          val margin = acceptedList.isEmpty || p.c > maxBound
          if (interacts || !margin) open = false
          else {
            accepted += p
            acceptedList = p :: acceptedList
            maxBound = math.max(maxBound, p.createdBound)
            if (alphabet.contains(p.a + p.b)) open = false // invariant 3
            alphabet += p.a + p.b
          }
        }
        val batchMerges = accepted.result()
        batchMerges.foreach { p =>
          out += Merge(rank, p.a, p.b, p.c)
          rank += 1
        }
        val prev = words
        val folded = batchMerges.foldLeft(col("syms")) { (acc, p) =>
          applyMerge(acc, p.a, p.b)
        }
        val next = prev.select(col("w"), col("cnt"), folded.as("syms"))
        sinceTruncate += batchMerges.size
        words =
          if (sinceTruncate >= truncateEvery) { sinceTruncate = 0; next.localCheckpoint(false) }
          else next.persist(StorageLevel.MEMORY_AND_DISK)
        words.count()
        prev.unpersist(blocking = false)
        onRound(rank - 1, batchMerges.size, (System.nanoTime() - t0) / 1e9)
      }
    }
    words.unpersist(blocking = false)
    out.result()
  }
}
