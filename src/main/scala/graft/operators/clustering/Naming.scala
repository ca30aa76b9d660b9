package graft.operators.clustering

/** O-57: pluggable node naming with the reference's
  * validate→retry(≤5)→fallback loop (clustering/utils.py:76-130).
  *
  * The reference asks an LLM for N sub-category names per parent, retries
  * up to 5 times when the response is non-unique or fails validation
  * (1–4 words each, clustering/utils.py:36-57), and falls back to the
  * deterministic `{parent}_Subgroup_{i}` scheme. The engine keeps that
  * exact control flow but makes the proposal source pluggable — the
  * default [[DeterministicNamer]] proposes the fallback scheme directly,
  * so builds are reproducible and oracle-friendly; a production namer
  * would wrap an LLM endpoint and inherit retry/fallback for free.
  *
  * Naming is driver-side by design: it runs once per tree NODE (≤ a few
  * hundred after rebalance — the reference's own two-level design), not
  * per data row, so it never touches the distributed path.
  */
object Naming {

  /** Per-child naming context (utils.py:106-110: representative titles +
    * emotional shift vs the parent).
    */
  final case class NamingGroup(titles: Seq[String], shift: String)

  /** A naming strategy: propose exactly `groups.size` names for the
    * children of `parentName`. May throw or return garbage — the caller
    * validates and retries (utils.py:113-127).
    */
  trait Namer {
    def propose(parentName: String, groups: Seq[NamingGroup], attempt: Int): Seq[String]
  }

  /** The reference's fallback scheme as the default proposal —
    * deterministic, always valid, so attempt 1 accepts.
    */
  object DeterministicNamer extends Namer {
    override def propose(parentName: String, groups: Seq[NamingGroup],
        attempt: Int): Seq[String] =
      fallback(parentName, groups.size)
  }

  /** Content-derived naming (VERDICT r8 #8): each child is named by the
    * top TF-IDF terms of its member titles, with document frequency
    * taken over the SIBLING set — the same contrastive signal the
    * reference's LLM prompt carries by showing all children together
    * (utils.py:106-110), but deterministic and replayable. Scoring is
    * tf × (idf + ε): idf = ln((1+n)/(1+df)) makes a group's distinctive
    * terms dominate, and the ε·tf term still orders purely-shared
    * vocabularies by within-group frequency instead of collapsing every
    * score to zero. Ties break on the term, so proposals are stable
    * across runs. `attempt` widens the name by one term per retry (≤4
    * words, the validator's cap) — sibling groups whose top term
    * collides get distinguished by their next terms where possible;
    * sites with identical or empty vocabularies exhaust all attempts
    * and take the standard fallback, exactly like an LLM namer that
    * keeps proposing duplicates.
    */
  object TfIdfNamer extends Namer {
    private val Stop = Set("the", "a", "an", "of", "and", "or", "in",
      "on", "at", "to", "for", "with", "from", "by", "its", "his", "her")

    private def tokens(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").toSeq
        .filter(w => w.length >= 3 && !Stop(w))

    override def propose(parentName: String, groups: Seq[NamingGroup],
        attempt: Int): Seq[String] = {
      val n = groups.size
      val groupToks = groups.map(g => g.titles.flatMap(tokens))
      val df = groupToks.flatMap(_.distinct).groupBy(identity)
        .map { case (w, o) => w -> o.size }
      val width = math.min(attempt + 1, 4)
      groupToks.map { toks =>
        val tf = toks.groupBy(identity).map { case (w, c) => w -> c.size }
        tf.toSeq
          .map { case (w, c) =>
            (w, c * (math.log((1.0 + n) / (1.0 + df(w))) + 1e-3)) }
          .sortBy { case (w, score) => (-score, w) }
          .take(width)
          .map { case (w, _) => w.capitalize }
          .mkString(" ")
      }
    }
  }

  /** validate_names (utils.py:36-57): non-empty, 1–4 whitespace words. */
  private[clustering] def validName(name: String): Boolean = {
    val words = name.trim.split("\\s+").filter(_.nonEmpty)
    words.nonEmpty && words.length <= 4
  }

  private[clustering] def fallback(parentName: String, n: Int): Seq[String] =
    (1 to n).map(i => s"${parentName.replace(' ', '_')}_Subgroup_$i")

  /** The retry loop (utils.py:113-130): accept a proposal only if it has
    * the right arity, is duplicate-free, and every name validates; after
    * `maxAttempts` failures (including thrown exceptions) fall back.
    * Accepted names are normalized `strip().replace(' ', '_')` exactly as
    * the reference does (utils.py:122).
    */
  def nameChildren(parentName: String, groups: Seq[NamingGroup],
      namer: Namer = DeterministicNamer, maxAttempts: Int = 5): Seq[String] = {
    var attempt = 0
    while (attempt < maxAttempts) {
      try {
        val names = namer.propose(parentName, groups, attempt)
        // uniqueness is checked on the NORMALIZED forms: "Dark Comedy"
        // and "Dark_Comedy" would otherwise pass raw-distinctness and
        // collide into identical sibling names after normalization (the
        // reference checks set(raw) — utils.py:118 — a latent collision
        // this deliberately tightens)
        val normalized = names.map(_.trim.replace(' ', '_'))
        if (names.size == groups.size &&
            normalized.distinct.size == groups.size &&
            names.forall(validName))
          return normalized
      } catch { case scala.util.control.NonFatal(_) => () }
      attempt += 1
    }
    fallback(parentName, groups.size)
  }
}
