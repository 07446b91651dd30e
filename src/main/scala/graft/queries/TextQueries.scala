package graft.queries

/** Text-analysis / training-data queries — filled in next. */
object TextQueries { def all: Seq[Q] = Seq.empty }
