package graft.queries

import graft.QueryDef

object Similarity {
  def defs: Seq[QueryDef] = Seq.empty
}
