package graft.queries

/** Similarity / dedup-at-scale queries — filled in next. */
object SimQueries { def all: Seq[Q] = Seq.empty }
