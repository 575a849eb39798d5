"""Stream-static contamination gating: exact leaks dropped at ingest
across micro-batches; near-level band collisions surfaced as alerts."""

import pandas as pd

from uk_ner_presidio_demo_spark.streaming.corpus_stream import (
    streaming_contamination_alerts, streaming_decontaminate,
)
from uk_ner_presidio_demo_spark.streaming.detect_stream import (
    run_available_now,
)

_LEAK = "Це речення з еталонного тестового набору яке не можна тренувати"
_NEAR_BASE = (
    "Довгий унікальний документ про синій океан і високі гори зі "
    "словами що повторюються у тестовому наборі майже дослівно "
    "і ще багато додаткових слів для стабільного мінхешу "
    "перший другий третій четвертий пятий шостий сьомий восьмий"
)


def _stream(spark, tmp_path, rows):
    src = tmp_path / "docs"
    src.mkdir()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "batch"])
    for b in sorted(pdf["batch"].unique()):
        pdf[pdf["batch"] == b][["doc_id", "text"]].astype(
            {"text": "string"}
        ).to_parquet(src / f"part-{b}.parquet", index=False)
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )


def _eval_docs(spark):
    return spark.createDataFrame(
        [(9001, _LEAK), (9002, _NEAR_BASE)], "doc_id long, text string"
    )


def test_exact_gate_drops_leaks_in_every_batch(spark, tmp_path):
    rows = [
        (0, "чистий документ номер нуль", 0),
        (1, _LEAK.upper(), 0),                # case-mangled leak, batch 0
        (2, "чистий документ номер два", 1),
        (3, "  " + _LEAK + "  ", 1),          # ws-mangled leak, batch 1
        (4, "чистий документ номер чотири", 2),
    ]
    got = run_available_now(
        streaming_decontaminate(_stream(spark, tmp_path, rows),
                                _eval_docs(spark)),
        "stream_decon", str(tmp_path / "ck"), "append",
    ).toPandas()
    assert set(got["doc_id"]) == {0, 2, 4}
    assert list(got.columns) == ["doc_id", "text"]  # schema-preserving


def test_scrub_composes_with_ingest_gate(spark, tmp_path):
    """PII scrubbing at ingest: scrub_documents is a stateless
    mapInPandas, so it runs directly on the gated stream — leaks are
    dropped AND surviving docs arrive scrubbed, across micro-batches."""
    rows = [
        (0, "пишіть на ceo@example.ua щодо зустрічі", 0),
        (1, _LEAK, 0),                        # exact leak: must drop
        (2, "документ без персональних даних", 1),
    ]
    from uk_ner_presidio_demo_spark.operators.scrub import scrub_documents

    gated = streaming_decontaminate(
        _stream(spark, tmp_path, rows), _eval_docs(spark)
    )
    got = run_available_now(
        scrub_documents(gated), "stream_scrub",
        str(tmp_path / "ck"), "append",
    ).toPandas().set_index("doc_id")
    assert set(got.index) == {0, 2}           # leak never reached scrub
    assert "[EMAIL_ADDRESS]" in got.loc[0, "scrubbed_text"]
    assert "ceo@example.ua" not in got.loc[0, "scrubbed_text"]
    assert got.loc[2, "n_pii"] == 0


def test_alerts_surface_near_candidates(spark, tmp_path):
    near = _NEAR_BASE + " додаток"            # near-dup of eval 9002
    rows = [
        (0, "цілком інший зміст без перетину з тестами", 0),
        (1, near, 1),
    ]
    got = run_available_now(
        streaming_contamination_alerts(_stream(spark, tmp_path, rows),
                                       _eval_docs(spark)),
        "stream_alerts", str(tmp_path / "ck2"), "append",
    ).toPandas()
    pairs = set(map(tuple, got[["doc_id", "eval_doc_id"]]
                    .drop_duplicates().itertuples(index=False)))
    assert (1, 9002) in pairs
    assert all(d != 0 for d, _ in pairs)  # the unrelated doc never alerts


def test_streaming_scrub_matches_batch(spark, sf001, tmp_path):
    """streaming_scrub over micro-batched document files must equal the
    batch scrub_documents output row-for-row (stateless kernel lift)."""
    import pandas as pd

    from uk_ner_presidio_demo_spark.operators.scrub import scrub_documents
    from uk_ner_presidio_demo_spark.streaming.corpus_stream import (
        streaming_scrub,
    )
    from uk_ner_presidio_demo_spark.streaming.detect_stream import (
        run_available_now,
    )

    docs = pd.read_parquet(f"{sf001}/documents.parquet")[
        ["doc_id", "text"]
    ].copy()
    # the driver corpus is PII-free Latin word-salad; plant detectable
    # mentions in a slice so the parity check is non-vacuous
    mask = docs["doc_id"] % 7 == 0
    docs.loc[mask, "text"] = docs.loc[mask, "text"] + (
        " Контакт: ivan.petrenko@example.com, телефон +380501234567."
    )
    src = tmp_path / "docs"
    src.mkdir()
    for k in range(3):
        docs[docs["doc_id"] % 3 == k].to_parquet(
            src / f"part-{k}.parquet", index=False
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = run_available_now(
        streaming_scrub(stream), "stream_scrub",
        str(tmp_path / "ck"), "append",
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    want = scrub_documents(
        spark.createDataFrame(docs)
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got["n_pii"] > 0).any()  # non-vacuous
