"""Structured Streaming extension tests: the stateless detection kernel
lifted into a real streaming execution (availableNow over the transcripts
parquet directory, memory sink), compared against the batch result."""

import pytest

from uk_ner_presidio_demo_spark.data.synth import ensure_transcripts
from uk_ner_presidio_demo_spark.streaming.detect_stream import (
    detect_mentions_stream, read_transcripts_stream, run_available_now,
    windowed_entity_counts,
)


@pytest.fixture(scope="module")
def stream_results(spark, sf001, tmp_path_factory):
    path = str(ensure_transcripts(sf001))
    ck = tmp_path_factory.mktemp("stream_ck")
    stream = read_transcripts_stream(spark, path, max_files_per_trigger=1)
    mentions = detect_mentions_stream(stream)
    got = run_available_now(
        mentions, "stream_mentions", str(ck / "m"), "append"
    ).toPandas()
    return got


def test_stream_matches_batch_detection(spark, sf001, stream_results):
    from uk_ner_presidio_demo_spark.operators.detect import (
        detect_turns, mentions_from_turns,
    )
    from uk_ner_presidio_demo_spark.sources.tables import read_transcripts

    batch = (
        mentions_from_turns(detect_turns(read_transcripts(spark, sf001)))
        .groupBy("entity_type")
        .count()
        .toPandas()
        .set_index("entity_type")["count"]
        .to_dict()
    )
    stream_counts = (
        stream_results.groupby("entity_type")["norm_surface"].count().to_dict()
    )
    assert stream_counts == batch


def test_windowed_counts_with_watermark(spark, sf001, tmp_path_factory):
    path = str(ensure_transcripts(sf001))
    ck = tmp_path_factory.mktemp("stream_ck2")
    stream = read_transcripts_stream(spark, path)
    counts = windowed_entity_counts(detect_mentions_stream(stream))
    got = run_available_now(
        counts, "stream_win_counts", str(ck / "w"), "append"
    ).toPandas()
    # synth ts are hourly per conv: windows must be non-empty and count>0
    assert len(got) > 0
    assert (got["n_mentions"] > 0).all()
    assert got["win_start"].notna().all()
