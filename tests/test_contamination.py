"""Cross-corpus contamination check: planted exact and near duplicates
across a train/test split must be flagged at the right level, clean docs
must survive decontamination untouched."""

from uk_ner_presidio_demo_spark.operators.contamination import (
    contamination_report, decontaminate, exact_contamination,
    near_contamination,
)

_SHARED = (
    "Це досить довгий спільний документ з багатьма однаковими словами "
    "які формують стабільні шингли для блокування"
)


def _corpora(spark):
    train = spark.createDataFrame(
        [
            (10, _SHARED),                      # exact leak of test doc 1
            (11, "The   Quick brown\tfox"),     # ws/case variant of test 2
            (12, _SHARED + " додаток"),         # near-dup of test doc 1
            (13, "цілком незалежний навчальний документ про інші речі"),
            (14, "ще один чистий документ без перетину з тестом"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [
            (1, _SHARED),
            (2, "the quick BROWN fox"),
            (3, "тестовий приклад якого немає в навчальному наборі"),
        ],
        "doc_id long, text string",
    )
    return train, test


def test_exact_contamination_catches_normalized_dups(spark):
    train, test = _corpora(spark)
    got = {(r.test_doc_id, r.train_doc_id)
           for r in exact_contamination(train, test).collect()}
    assert got == {(1, 10), (2, 11)}  # ws/case-normalized equality


def test_near_contamination_catches_appended_variant(spark):
    train, test = _corpora(spark)
    got = {(r.test_doc_id, r.train_doc_id)
           for r in near_contamination(train, test).collect()}
    assert (1, 12) in got      # one appended token: high Jaccard
    assert (1, 10) in got      # the exact dup is also a near dup
    ids = {t for t, _ in got}
    assert 3 not in ids        # the clean test doc matches nothing


def test_decontaminate_removes_exactly_the_flagged_train_docs(spark):
    train, test = _corpora(spark)
    report = contamination_report(train, test).toPandas()
    flagged = set(report["train_doc_id"])
    assert flagged == {10, 11, 12}
    kept = {r.doc_id for r in decontaminate(train, test).collect()}
    assert kept == {13, 14}
    # exact rows carry score 1.0; near rows a verified jaccard < = 1
    assert (report[report["kind"] == "exact"]["score"] == 1.0).all()
    assert (report[report["kind"] == "near"]["score"] >= 0.8).all()


def test_no_cartesian_and_no_collect(spark):
    import inspect

    from uk_ner_presidio_demo_spark.operators import contamination

    src = inspect.getsource(contamination)
    assert ".collect()" not in src
    train, test = _corpora(spark)
    plan = decontaminate(train, test) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
