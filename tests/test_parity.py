"""Reference-oracle parity gates (SURVEY.md §5.2 items 1-2):

  - mentions: Spark fused detector output == plain-Python oracle, exactly
  - anonymized: per-turn rewrite equality under stable (conv_id, turn_idx)
    ordering, and the pass-through text column is byte-identical (the
    BASELINE input_hint per-row invariant)
  - P/R computed via full-outer join (J-5) must be 1.0 >= 0.95
"""

import pandas as pd
import pytest

from uk_ner_presidio_demo_spark.operators.detect import (
    anonymized_turns, detect_turns, mentions_from_turns,
)
from uk_ner_presidio_demo_spark.oracle.reference_oracle import ensure_golden
from uk_ner_presidio_demo_spark.sources.tables import read_transcripts


@pytest.fixture(scope="module")
def golden_dir(sf001):
    return ensure_golden(sf001)


@pytest.fixture(scope="module")
def detected(spark, sf001):
    det = detect_turns(read_transcripts(spark, sf001)).cache()
    yield det
    det.unpersist()


def test_mentions_exact_parity(detected, golden_dir):
    m = (
        mentions_from_turns(detected)
        .toPandas()
        .astype({"turn_idx": "int64"})
        .sort_values(["conv_id", "turn_idx", "mention_idx"])
        .reset_index(drop=True)
    )
    g = (
        pd.read_parquet(golden_dir / "golden_mentions.parquet")
        .sort_values(["conv_id", "turn_idx", "mention_idx"])
        .reset_index(drop=True)
    )
    assert m[list(g.columns)].equals(g)


def test_mentions_precision_recall(detected, golden_dir):
    m = mentions_from_turns(detected).toPandas().astype({"turn_idx": "int64"})
    g = pd.read_parquet(golden_dir / "golden_mentions.parquet")
    keys = ["conv_id", "turn_idx", "entity_type", "start", "end"]
    joined = m[keys].merge(g[keys], how="outer", indicator=True)
    tp = (joined["_merge"] == "both").sum()
    precision = tp / max(1, len(m))
    recall = tp / max(1, len(g))
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0  # deterministic design target


def test_anonymized_per_turn_equality(detected, golden_dir):
    a = (
        anonymized_turns(detected)
        .toPandas()
        .astype({"turn_idx": "int64"})
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    g = (
        pd.read_parquet(golden_dir / "golden_anonymized.parquet")
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert a[list(g.columns)].equals(g)


def test_input_text_passthrough_byte_identical(spark, sf001):
    """The engine never mangles `text`: reading + validity-filtering keeps
    the column byte-identical to the synthesized input."""
    from uk_ner_presidio_demo_spark.data.synth import SF_CONVS, synth_transcripts
    from uk_ner_presidio_demo_spark.sources.tables import valid_text_predicate

    tr = read_transcripts(spark, sf001).filter(valid_text_predicate())
    got = (
        tr.select("conv_id", "turn_idx", "text")
        .toPandas()
        .astype({"turn_idx": "int64"})
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    src = synth_transcripts(SF_CONVS["sf0.001"])
    src = src[src["text"].map(
        lambda t: bool(t) and bool(t.strip()) and len(t) <= 100_000
    )]
    src = (
        src[["conv_id", "turn_idx", "text"]]
        .astype({"turn_idx": "int64"})
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(src)


def test_norm_surface_expr_matches_python(spark):
    """F-7: the Catalyst normalization twin agrees with the Python kernel."""
    from uk_ner_presidio_demo_spark.semantics.gazetteer import GAZETTEER
    from uk_ner_presidio_demo_spark.semantics.normalize import (
        norm_surface, norm_surface_expr,
    )

    surfaces = sorted(GAZETTEER) + [
        "  ПіБ: Іван-Петро О'Коннор ", "a_b-c", "ТОВ «Приват»", "x", "",
        "вул. Хрещатик, 22", "UA21322313", "i.petrenko@example.com",
    ]
    df = spark.createDataFrame([(s,) for s in surfaces], ["s"])
    got = df.select(norm_surface_expr("s").alias("n")).toPandas()["n"].tolist()
    want = [norm_surface(s) for s in surfaces]
    assert got == want
