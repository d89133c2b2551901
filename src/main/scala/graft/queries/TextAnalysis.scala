package graft.queries

import graft.QueryDef

object TextAnalysis {
  def defs: Seq[QueryDef] = Seq.empty
}
