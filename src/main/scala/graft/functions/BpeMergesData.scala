package graft.functions

/** The repo-trained BPE merge table (GPT-2 interchange format: one
  * `A B` pair per line, rank = position), embedded as data so every
  * runtime surface (bare `java -cp target/classes`, executors, tests)
  * sees the same table with no resource-classpath dependency.
  * Regenerate with [[graft.tools.TrainBpe]] (48 merges over the
  * synthetic corpus's normalized words).
  */
object BpeMergesData {
  val lines: Seq[String] = Seq(
    "e r",
    "o r",
    "i n",
    "o w",
    "s t",
    "l u",
    "p a",
    "pa r",
    "m er",
    "a t",
    "s c",
    "sc a",
    "sca n",
    "o lu",
    "olu m",
    "olum n",
    "c olumn",
    "w in",
    "win d",
    "wind ow",
    "or d",
    "ord er",
    "s or",
    "sor t",
    "u p",
    "par t",
    "g g",
    "a gg",
    "v a",
    "va lu",
    "valu e",
    "l in",
    "lin e",
    "k e",
    "ke y",
    "o in",
    "j oin",
    "mer g",
    "merg e",
    "u er",
    "uer y",
    "r o",
    "ro up",
    "q uery",
    "g roup",
    "v e",
    "ve c",
    "vec t")
}
