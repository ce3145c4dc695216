package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Subset-selection spec parsing — the engine's version of the reference's
  * `--field/--scan/--spw/--ant/--corr` index lists and `--chan` slices
  * (`shade_ms/ms_info.py :: NamedList.get_subset`, chanslice in
  * `main.py` [U]).
  *
  * Grammar:
  *  - value lists: `"0,2,7"` → membership;
  *  - inclusive ranges inside lists: `"0,2:5"` → {0} ∪ [2, 5] (the
  *    NamedList range form);
  *  - python-style channel slices: `"start:stop[:step]"` with EXCLUSIVE
  *    stop and optional stride (the `--chan` form), applied to an
  *    already-exploded position column.
  *
  * Both produce plain `Column` predicates, so Catalyst pushes them into
  * the parquet scan like any other filter.
  */
object Subset {

  /** List+range spec (`"0,2:5,9"`) → predicate over an id column. The
    * index-only instance of [[namedMembership]] (ONE grammar, shared —
    * two copies had already drifted on error behavior by r17): a
    * non-index token fails loudly here instead of resolving. */
  def membership(spec: String, c: Column): Column =
    namedMembership(spec, c, name => throw new IllegalArgumentException(
      s"bad subset part: '$name' (not an index or lo:hi range; name " +
        "resolution needs the named-selector form with a dimension)"))

  /** Baseline-pair spec (`"0-1,2-3"`) → predicate over an antenna-pair
    * column pair — the reference's `--baseline` selector (`shade_ms/
    * ms_info.py [U]` resolves `p-q` names against the antenna table; here
    * the pair is matched SYMMETRICALLY, `(a1,a2) ∈ {(p,q),(q,p)}`, since
    * a baseline is an unordered pair however the rows happen to order
    * their endpoints). Each part must be `p-q`; a bare `p` means "every
    * baseline involving antenna p" (either endpoint), the reference's
    * single-antenna shorthand. Plain boolean column arithmetic —
    * Catalyst pushes the disjunction to the scan like any filter. */
  def baselines(spec: String, a1: Column, a2: Column): Column =
    spec.split(',').map(_.trim).filter(_.nonEmpty).map { part =>
      part.split('-') match {
        case Array(p, q) =>
          val (pl, ql) = (p.trim.toLong, q.trim.toLong)
          (a1 === pl && a2 === ql) || (a1 === ql && a2 === pl)
        case Array(p) =>
          val pl = p.trim.toLong
          a1 === pl || a2 === pl
        case _ => throw new IllegalArgumentException(s"bad baseline part: '$part'")
      }
    }.reduceLeft(_ || _)

  /** NamedList-style spec (`"ALGERIA,2:5,CANADA"`) → predicate over an id
    * column, resolving NAME tokens through `resolve` — the reference's
    * `--field/--scan/--spw/--corr` options accept names wherever they
    * accept indices (`shade_ms/ms_info.py :: NamedList` resolves each
    * name against the matching MS subtable [U]). A token is a NAME iff
    * it is not parseable as an index or `lo:hi` index range; ranges over
    * names are not a thing in the reference either. Resolution happens
    * at parse time (driver side) so the emitted predicate is plain
    * membership arithmetic — Catalyst pushes it to the scan exactly like
    * [[membership]]. */
  def namedMembership(spec: String, c: Column, resolve: String => Long): Column = {
    def numeric(s: String): Boolean = s.nonEmpty && s.forall(_.isDigit)
    val parts = spec.split(',').map(_.trim).filter(_.nonEmpty)
    require(parts.nonEmpty, s"empty subset spec: '$spec'")
    parts.map { part =>
      // split with -1 so a trailing-empty range ("2:") is a loud error,
      // not a silent single-index parse
      part.split(":", -1).map(_.trim) match {
        case Array(single) if numeric(single) => c === single.toLong
        case Array(lo, hi) if numeric(lo) && numeric(hi) =>
          c.between(lo.toLong, hi.toLong)
        case Array(name) if name.nonEmpty =>
          c === resolve(name)
        case _ => throw new IllegalArgumentException(
          s"bad subset part: '$part' (want an index, lo:hi range, or name)")
      }
    }.reduceLeft(_ || _)
  }

  /** Name → id resolver over a dimension table — the `NamedList` analog
    * ([U, `ms_info.py`]: the reference reads the FIELD/ANTENNA/…
    * subtable once and indexes names). The dimension is collected
    * driver-side, which is exactly what the reference does and is
    * bounded by construction: subtables/dimensions are catalog-sized,
    * not data-sized. Matching is case-insensitive (MS names are
    * conventionally upper-case; user input shouldn't have to be);
    * ambiguous or unknown names fail loudly with the candidates. */
  def nameResolver(
      dim: org.apache.spark.sql.DataFrame,
      idCol: String, nameCol: String): String => Long = {
    val byName: Map[String, Seq[Long]] = dim
      .select(col(idCol).cast("long").as("id"),
        upper(trim(col(nameCol))).as("name"))
      .collect()
      .map(r => r.getString(1) -> r.getLong(0)).toSeq
      .groupBy(_._1).map { case (n, ids) => n -> ids.map(_._2).distinct }
    name => byName.get(name.trim.toUpperCase) match {
      case Some(Seq(id)) => id
      case Some(ids) => throw new IllegalArgumentException(
        s"name '$name' is ambiguous in the dimension: ids ${ids.mkString(",")}")
      case None => throw new IllegalArgumentException(
        s"unknown name '$name' (known: ${byName.keys.toSeq.sorted.take(20).mkString(", ")}" +
          (if (byName.size > 20) ", …)" else ")"))
    }
  }

  /** Python-slice channel spec (`"start:stop[:step]"`, stop exclusive) →
    * predicate over a 0-based position column (e.g. posexplode's `pos`). */
  def chanSlice(spec: String, pos: Column): Column = {
    val parts = spec.split(":", -1)
    require(parts.length >= 2 && parts.length <= 3, s"bad chan slice: '$spec'")
    val start = if (parts(0).isEmpty) 0L else parts(0).trim.toLong
    val stop = if (parts(1).isEmpty) Long.MaxValue else parts(1).trim.toLong
    val step = if (parts.length < 3 || parts(2).isEmpty) 1L else parts(2).trim.toLong
    require(step > 0, s"chan slice step must be positive: '$spec'")
    val base = pos >= start && pos < stop
    if (step == 1L) base else base && (pos - start) % step === 0
  }
}
