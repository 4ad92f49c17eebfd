package graft.functions

import graft.SparkSpec
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Corpus-slice profile ingestion (r8): `deriveLangProfiles` turns any
  * `(lang, text)` parquet into the ProfileSet the trigram scorer
  * consumes, with the SAME derivation as the built-in table. Pins:
  * held-out accuracy ≥ the built-in passages, a new language becomes a
  * candidate with zero code change, the clamp invariant survives
  * derivation, and priority order is deterministic (en first). */
class LangProfilesSpec extends SparkSpec {
  import spark.implicits._

  // corpus slices written for this library — fresh prose per language,
  // DISTINCT from both the built-in passages and the held-out set; two
  // rows per language so derivation aggregates across rows
  private val slices = Seq(
    ("en", "the harbor was quiet in the early light and the fishermen checked their nets before the boats went out"),
    ("en", "she opened the window to let the cold air in and watched the birds gather on the wire across the street"),
    ("en", "after the storm the roads were covered with branches and the neighbors worked together to clear them"),
    ("de", "der hafen lag still im ersten licht und die fischer prüften ihre netze bevor die boote hinausfuhren"),
    ("de", "sie öffnete das fenster um die kalte luft hereinzulassen und sah den vögeln auf dem draht gegenüber zu"),
    ("de", "nach dem sturm lagen äste auf den straßen und die nachbarn räumten sie gemeinsam weg"),
    ("fr", "le port était calme dans la première lumière et les pêcheurs vérifiaient leurs filets avant le départ des bateaux"),
    ("fr", "elle ouvrit la fenêtre pour laisser entrer l air froid et regarda les oiseaux se poser sur le fil de la rue"),
    ("fr", "après la tempête les routes étaient couvertes de branches et les voisins les ont dégagées ensemble"),
    ("es", "el puerto estaba tranquilo con la primera luz y los pescadores revisaban sus redes antes de salir los barcos"),
    ("es", "ella abrió la ventana para dejar entrar el aire frío y miró a los pájaros posarse en el cable de la calle"),
    ("es", "después de la tormenta las calles estaban cubiertas de ramas y los vecinos las despejaron juntos"),
    ("it", "il porto era tranquillo nella prima luce e i pescatori controllavano le reti prima che le barche uscissero"),
    ("it", "lei aprì la finestra per far entrare l aria fredda e guardò gli uccelli posarsi sul filo della strada"),
    ("it", "dopo la tempesta le strade erano coperte di rami e i vicini le hanno sgomberate insieme"))

  private lazy val derived =
    TextQueries.deriveLangProfiles(slices.toDF("lang", "text"))

  // held-out mixed corpus: new combinations, none shared with slices
  private val held = Seq(
    (1L, "en", "tomorrow the children will walk to the market because the weather is good"),
    (2L, "en", "the workers finished late and walked home through the rain with their coats closed"),
    (3L, "de", "morgen gehen die kinder zum markt weil das wetter gut ist"),
    (4L, "de", "nichts ist wichtiger als eine warme mahlzeit nach einem langen arbeitstag"),
    (5L, "fr", "demain les enfants iront au marché parce que le temps est beau"),
    (6L, "fr", "rien n est plus important qu un repas chaud après une longue journée"),
    (7L, "es", "mañana los niños irán al mercado porque el tiempo es bueno"),
    (8L, "es", "nada es más importante que una comida caliente después de un largo día"))

  private def predictions(p: LangProfiles.ProfileSet): Map[Long, String] =
    TextQueries.langIdNgram(held.toDF("doc_id", "lang", "text"), p)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap

  test("parquet-derived profiles classify a held-out mixed corpus >= the built-in table") {
    val truth = held.map { case (id, l, _) => id -> l }.toMap
    val derivedAcc = predictions(derived).count { case (d, l) => truth(d) == l }
    val builtinAcc = predictions(LangProfiles.builtin).count { case (d, l) => truth(d) == l }
    info(s"held-out accuracy: derived $derivedAcc/8 vs builtin $builtinAcc/8")
    assert(derivedAcc >= builtinAcc,
      s"a real corpus slice must not classify worse than the stand-in passages")
    assert(derivedAcc >= 7, s"derived profiles must handle the held-out set: $derivedAcc/8")
  }

  test("a new language rides along free: italian text classifies as it") {
    val it = TextQueries.langIdNgram(
      Seq((10L, "it", "i bambini andranno al mercato domani perché il tempo è bello"))
        .toDF("doc_id", "lang", "text"), derived)
      .head().getString(2)
    assert(it == "it", s"italian held-out doc must classify as it, got $it")
    // and the builtin set has no such candidate — the slice ADDED it
    assert(!LangProfiles.builtin.languages.exists(_._1 == "it"))
    assert(derived.languages.exists(_._1 == "it"))
  }

  test("derivation invariants: clamp above miss, en-first priority, determinism") {
    assert(derived.rows.forall(_._3 > LangProfiles.MissMilli),
      "every kept weight must outscore a miss — the argmax prune depends on it")
    assert(derived.languages.head == ("en", 0), "en keeps the evidence-free default slot")
    assert(derived.languages.map(_._1) == Seq("en", "de", "es", "fr", "it"),
      "remaining languages order alphabetically, whatever the slice row order")
    assert(derived.rows.groupBy(_._1).forall(_._2.size <= LangProfiles.TopK))
    val again = TextQueries.deriveLangProfiles(
      slices.reverse.toDF("lang", "text").repartition(7))
    assert(again == derived, "derivation must not depend on slice row order or layout")
  }
}
