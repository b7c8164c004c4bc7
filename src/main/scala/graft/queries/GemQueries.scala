package graft.queries

/** SURVEY.md §2 operator inventory, exercised as oracle-checked queries
  * over the driver's TPC-H-ish tables. Each query cites the §2 row(s)
  * it covers and the reference site whose semantics it re-expresses.
  */
object GemQueries {

  /** The full catalog the driver consumes — the eight section objects
    * of the former monolith (split round 14, VERDICT r13 task 5),
    * concatenated in the original order so query numbering and the
    * driver's iteration order are unchanged.
    */
  val defs: Seq[QueryDef] =
    QueriesCore.defs ++ QueriesMore.defs ++ QueriesExtra.defs ++
      QueriesExtra2a.defs ++ QueriesExtra2b.defs ++ QueriesExtra3.defs ++
      QueriesExtra4.defs ++ QueriesExtra5.defs ++ QueriesExtra6.defs ++
      QueriesExtra7.defs ++ QueriesExtra8.defs ++ QueriesExtra9.defs ++
      QueriesExtra10.defs
}
