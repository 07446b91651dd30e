package graft.queries

/** Aggregation-layer queries (SURVEY.md §7.3 step 6) — filled in next. */
object AggQueries { def all: Seq[Q] = Seq.empty }
