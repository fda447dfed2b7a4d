package graft.pipeline

/** The meta-trailer discipline shared by every persisted index family
  * (exact-dedup, near-dup MinHash, containment, IVF/IVF-PQ): an `appends=N`
  * trailer line records incremental history that no seed-corpus fingerprint
  * can account for, so N > 0 turns a corpus-change "stale → rebuild" into a
  * refusal (rebuilding would silently discard admitted history; the
  * reference's analogue is the refusal to reopen a filestore whose version
  * header it can't account for, zenodb.go table open path).
  *
  * One implementation for all families so the corruption semantics can't
  * drift: an UNPARSEABLE counter reads as Long.MaxValue, never 0. The
  * tripwire's failure modes are asymmetric — a spurious refusal costs an
  * explicit directory delete, a missed one silently discards admitted
  * history — so corruption must always land on the refusing side, in every
  * family, identically.
  */
private[graft] object IndexMeta {

  /** Count of incremental appends recorded in a meta file's trailer lines;
    * 0 when absent. Scanned over ALL lines so even a mangled meta still
    * trips the refusal as long as the marker survives.
    */
  def parseAppends(lines: java.util.List[String]): Long =
    (0 until lines.size()).map(lines.get(_).trim)
      .collectFirst { case s if s.startsWith("appends=") =>
        scala.util.Try(s.stripPrefix("appends=").toLong)
          .getOrElse(Long.MaxValue) }
      .getOrElse(0L)

  /** Saturating counter bump: a corrupt counter reads as Long.MaxValue and
    * must stay there — wrapping would re-arm the silent-rebuild path.
    */
  def saturatedBump(appends: Long): Long =
    if (appends >= Long.MaxValue - 1) Long.MaxValue else appends + 1L
}
