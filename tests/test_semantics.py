"""Unit tests for the frozen semantics kernels (SURVEY.md §5.2 items 3-4),
mirroring the reference's pipeline-semantics tests
(/root/reference/test/test_analyzer.py) without any Presidio dependency."""

import pytest

from uk_ner_presidio_demo_spark.semantics.anonymize import splice
from uk_ner_presidio_demo_spark.semantics.detect import detect_mentions
from uk_ner_presidio_demo_spark.semantics.minhash import (
    band_keys, jaccard, minhash_signature,
)
from uk_ner_presidio_demo_spark.semantics.normalize import norm_surface
from uk_ner_presidio_demo_spark.semantics.registry import (
    MAX_TEXT_LENGTH, is_valid_text, priority_of,
)
from uk_ner_presidio_demo_spark.semantics.resolution import (
    resolve_conflicts, sanitize_spans,
)


class TestValidation:
    # mirrors test_analyzer.py:37-62
    def test_empty_rejected(self):
        assert not is_valid_text("")
        assert not is_valid_text(None)

    def test_whitespace_rejected(self):
        assert not is_valid_text("   \n\t  ")
        assert not is_valid_text("\x0b\x0c")

    def test_max_length_boundary(self):
        assert is_valid_text("A" * MAX_TEXT_LENGTH)
        assert not is_valid_text("A" * (MAX_TEXT_LENGTH + 1))


class TestSanitize:
    # mirrors core/analyzer.py:220-267 semantics
    def test_clamp_and_drop(self):
        spans = [("PERS", -5, 4, 0.9), ("ORG", 2, 999, 0.8), ("LOC", 7, 3, 0.7)]
        out = sanitize_spans(10, spans)
        assert out == [("PERS", 0, 4, 0.9), ("ORG", 2, 10, 0.8)]


class TestConflictResolution:
    # mirrors test_analyzer.py:147-164 (higher score wins under "score")
    def test_score_strategy_higher_score_wins(self):
        spans = [("PERS", 0, 10, 0.9), ("EMAIL_ADDRESS", 5, 15, 0.95)]
        out = resolve_conflicts(spans, "score")
        assert out == [("EMAIL_ADDRESS", 5, 15, 0.95)]

    def test_priority_strategy_priority_beats_score(self):
        # IBAN (prio 1) beats PERS (prio 3) despite lower score
        spans = [("PERS", 0, 10, 0.99), ("IBAN_CODE", 5, 15, 0.6)]
        assert resolve_conflicts(spans, "priority") == [("IBAN_CODE", 5, 15, 0.6)]
        # under "score" the PERS wins instead
        assert resolve_conflicts(spans, "score") == [("PERS", 0, 10, 0.99)]

    def test_adjacent_spans_both_kept(self):
        spans = [("PERS", 0, 5, 0.9), ("ORG", 5, 10, 0.8)]
        assert resolve_conflicts(spans, "score") == spans

    def test_result_sorted_by_start(self):
        spans = [("ORG", 20, 25, 0.7), ("PERS", 0, 5, 0.9), ("LOC", 10, 15, 0.8)]
        out = resolve_conflicts(spans, "priority")
        assert [s[1] for s in out] == [0, 10, 20]

    def test_unknown_strategy_raises(self):
        with pytest.raises(ValueError):
            resolve_conflicts([("PERS", 0, 1, 1.0)], "wat")

    def test_score_tie_breaks_by_start_then_end(self):
        spans = [("A", 5, 9, 0.5), ("B", 3, 8, 0.5)]
        # (-score, start, end): B sorts first, A overlaps -> dropped
        assert resolve_conflicts(spans, "score") == [("B", 3, 8, 0.5)]

    def test_priority_default_is_100(self):
        assert priority_of("DATE_TIME") == 100
        assert priority_of("CREDIT_CARD") == 1


class TestAnonymize:
    # mirrors test_analyzer.py:88-102,128-143
    def test_no_entities_identity(self):
        assert splice("Звичайний текст без PII", []) == "Звичайний текст без PII"

    def test_replace_format_and_remainder(self):
        text = "Hi Ivan Petrov here"
        out = splice(text, [("PERS", 3, 14)])
        assert out == "Hi [PERS] here"
        assert "Ivan Petrov" not in out

    def test_right_to_left_offsets(self):
        text = "a@b.cc and c@d.ee"
        out = splice(text, [("EMAIL_ADDRESS", 0, 6), ("EMAIL_ADDRESS", 11, 17)])
        assert out == "[EMAIL_ADDRESS] and [EMAIL_ADDRESS]"

    def test_span_at_bounds(self):
        assert splice("abc", [("X", 0, 3)]) == "[X]"


class TestDetection:
    def test_anchor_sentence(self):
        text = ("Іван Петренко (ivan.petrenko@example.com) працює в компанії "
                "ТОВ 'Приват' на посаді директора. Його телефон: +380501234567")
        ms, err = detect_mentions(text)
        types = [m.entity_type for m in ms]
        assert err == 0
        assert types == ["PERS", "EMAIL_ADDRESS", "ORG", "JOB", "PHONE_NUMBER"]
        # surfaces come from text[start:end] (O-8)
        assert ms[0].surface == "Іван Петренко"

    def test_iban_context_boost(self):
        ms, _ = detect_mentions("Рахунок для оплати: UA213223130000026007233566001")
        iban = [m for m in ms if m.entity_type == "IBAN_CODE"]
        assert len(iban) == 1 and iban[0].score == 1.0  # 0.9 + 0.35 capped

    def test_iban_no_context_base_score(self):
        ms, _ = detect_mentions("xyz UA213223130000026007233566001")
        iban = [m for m in ms if m.entity_type == "IBAN_CODE"]
        assert len(iban) == 1 and iban[0].score == 0.9

    def test_no_pii(self):
        ms, _ = detect_mentions("Дякую, все зрозуміло.")
        assert ms == []

    def test_mention_idx_is_start_rank(self):
        ms, _ = detect_mentions("Київ та Львів")
        assert [(m.mention_idx, m.surface) for m in ms] == [(1, "Київ"), (2, "Львів")]


class TestNormalize:
    def test_examples(self):
        assert norm_surface("ТОВ 'Приват'") == "тов приват"
        assert norm_surface("  Іван   Петренко ") == "іван петренко"
        assert norm_surface("І. Петренко") == "і петренко"


class TestMinhash:
    def test_deterministic(self):
        assert minhash_signature("іван петренко") == minhash_signature("іван петренко")
        assert len(minhash_signature("abc")) == 32
        assert len(band_keys(minhash_signature("abc"))) == 8

    def test_similar_share_bands(self):
        a = band_keys(minhash_signature("іван петренко"))
        b = band_keys(minhash_signature("іван петрено"))  # one char dropped
        assert set(a) & set(b), "near-dup surfaces should collide in >=1 band"

    def test_jaccard(self):
        assert jaccard("abc", "abc") == 1.0
        assert jaccard("abcdef", "uvwxyz") == 0.0


class TestIpnRecognizer:
    def test_checksum(self):
        from uk_ner_presidio_demo_spark.semantics.patterns import (
            ipn_checksum_ok,
        )

        # hand-computed РНОКПП: digits 173020078, control =
        # ((1*-1 + 7*5 + 3*7 + 0*9 + 2*4 + 0*6 + 0*10 + 7*5 + 8*7) % 11) % 10
        assert ipn_checksum_ok("1730200780")
        assert not ipn_checksum_ok("1730200781")

    def test_valid_ipn_detected_with_context_boost(self):
        from uk_ner_presidio_demo_spark.semantics.detect import detect_mentions

        ms, err = detect_mentions("Мій ІПН 1730200780, дякую.")
        hits = [m for m in ms if m.entity_type == "UA_IPN"]
        assert err == 0 and len(hits) == 1
        assert hits[0].surface == "1730200780"
        assert hits[0].score == 0.85  # 0.5 base + 0.35 context boost

    def test_invalid_checksum_rejected(self):
        from uk_ner_presidio_demo_spark.semantics.detect import detect_mentions

        ms, _ = detect_mentions("Мій ІПН 1730200781, дякую.")
        assert not [m for m in ms if m.entity_type == "UA_IPN"]

    def test_phone_not_misread_as_ipn(self):
        """0XXXXXXXXX phones are 10 digits too; PHONE_NUMBER (same priority,
        higher score than un-boosted IPN) must win resolution."""
        from uk_ner_presidio_demo_spark.semantics.detect import detect_mentions

        # a 0-leading 10-digit string that happens to pass the checksum
        from uk_ner_presidio_demo_spark.semantics.patterns import (
            ipn_checksum_ok,
        )

        num = None
        for tail in range(10**4):
            cand = f"050123{tail:04d}"
            if ipn_checksum_ok(cand):
                num = cand
                break
        assert num is not None
        ms, _ = detect_mentions(f"Телефон {num} вказано.")
        types = {m.entity_type for m in ms}
        assert "PHONE_NUMBER" in types and "UA_IPN" not in types
