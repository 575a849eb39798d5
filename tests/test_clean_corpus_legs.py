"""clean_corpus per-leg evidence (VERDICT r2 #4): planted fixture docs prove
that EACH leg of the quality AND language AND near-dup conjunction filters
independently — a green driver row over an empty result proves nothing."""

from pyspark.sql import functions as F

from uk_ner_presidio_demo_spark.operators.dedup import clean_corpus

# Ukrainian sentence that passes every quality gate (>=5 tokens, >=30
# chars, avg token length in [2, 12]) and is Cyrillic-dominant.
_GOOD = (
    "Це достатньо довгий український документ із нормальними словами "
    "та розділовими знаками, який проходить усі фільтри якості."
)
# Near-duplicate of _GOOD: one appended token changes a single word-3-gram
# (Jaccard 15/16 ≈ 0.94 >= 0.8 threshold), so the higher doc_id loses to
# doc 1.  (A mid-text word swap would break 3 shingles and fall to ~0.67.)
_NEARDUP = _GOOD + " додатково"
# Fails ONLY quality: too short (<30 chars, <5 tokens).
_SHORT = "коротко зовсім"
# Fails ONLY language: Latin-dominant, quality-passing.
_LATIN = (
    "This is a long enough English document with ordinary words and "
    "punctuation marks that passes every quality filter easily."
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, _GOOD),      # survives everything
            (2, _NEARDUP),   # killed by the dedup leg only
            (3, _SHORT),     # killed by the quality leg only
            (4, _LATIN),     # killed by the language leg only
            (5, _GOOD + " Додаткове незалежне речення наприкінці тексту."),
        ],
        "doc_id long, text string",
    )


def test_each_leg_filters_independently(spark):
    docs = _docs(spark)
    kept = {r.doc_id for r in clean_corpus(docs, lang="uk").collect()}
    assert kept == {1, 5}

    from uk_ner_presidio_demo_spark.operators.textstats import (
        lang_id, quality_score,
    )

    # quality leg alone: only the short doc fails
    q = {r.doc_id for r in quality_score(docs).filter("keep").collect()}
    assert q == {1, 2, 4, 5}
    # language leg alone: only the Latin doc fails (for lang='uk')
    lang = {
        r.doc_id
        for r in lang_id(docs).filter(F.col("lang_guess") == "uk").collect()
    }
    assert lang == {1, 2, 3, 5}
    # dedup leg alone: the near-dup with the higher id loses
    from uk_ner_presidio_demo_spark.operators.dedup import dedup_apply

    kept_dedup = {r.doc_id for r in dedup_apply(docs).collect()}
    assert kept_dedup == {1, 3, 4, 5}


def test_lang_parameter_flips_the_language_leg(spark):
    """clean_corpus(lang='lat') keeps the Latin doc and drops the Ukrainian
    ones — the driver's documents table is Latin word-salad, so its board
    query passes 'lat' (a 0-row conjunction is vacuous evidence)."""
    kept = {
        r.doc_id for r in clean_corpus(_docs(spark), lang="lat").collect()
    }
    assert kept == {4}


def test_driver_sf_clean_corpus_is_nonvacuous(spark, sf01):
    """The board row itself: at the driver's sf the query must keep rows."""
    import __spark_entry__ as em

    n = em.queries()["doc_clean_corpus"](spark, sf01).count()
    assert n > 0


def test_repetition_leg_is_optional_fourth_filter(spark):
    """with_repetition=True adds the Gopher legs: a spammy repeated doc
    that passes quality+language+dedup is killed only by repetition."""
    spam = (6, "дуже якісне речення повторюється знову. " * 12)
    docs = _docs(spark).union(
        spark.createDataFrame([spam], "doc_id long, text string")
    )
    base = {r.doc_id for r in clean_corpus(docs, lang="uk").collect()}
    strict = {
        r.doc_id
        for r in clean_corpus(docs, lang="uk", with_repetition=True).collect()
    }
    assert 6 in base            # passes the original three legs
    assert strict == base - {6}  # repetition leg kills only the spam
