package graft.queries

import graft.QueryDef

object Multimodal {
  def defs: Seq[QueryDef] = Seq.empty
}
