"""Property-based tests (hypothesis) over the frozen semantic kernels —
invariants that must hold for ANY input, beyond the example corpus (the
reference has no property testing; SURVEY.md §5.1)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from uk_ner_presidio_demo_spark.semantics.anonymize import splice
from uk_ner_presidio_demo_spark.semantics.detect import detect_mentions
from uk_ner_presidio_demo_spark.semantics.minhash import (
    band_keys, jaccard, minhash_signature,
)
from uk_ner_presidio_demo_spark.semantics.normalize import norm_surface
from uk_ner_presidio_demo_spark.semantics.resolution import (
    resolve_conflicts, sanitize_spans,
)

# span strategy: arbitrary (possibly invalid/overlapping) raw spans
_span = st.tuples(
    st.sampled_from(["PERS", "ORG", "EMAIL_ADDRESS", "CREDIT_CARD", "X"]),
    st.integers(-5, 60),
    st.integers(-5, 60),
    st.floats(0.0, 1.0, allow_nan=False),
)
_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=80,
)


class TestResolutionProperties:
    @given(st.lists(_span, max_size=12), st.integers(0, 60),
           st.sampled_from(["score", "priority"]))
    @settings(max_examples=200, deadline=None)
    def test_no_overlaps_and_sorted(self, spans, text_len, strategy):
        out = resolve_conflicts(sanitize_spans(text_len, spans), strategy)
        # sorted by start
        assert [s[1] for s in out] == sorted(s[1] for s in out)
        # pairwise non-overlapping
        for i in range(len(out) - 1):
            assert out[i][2] <= out[i + 1][1]
        # every output span is one of the sanitized inputs
        sane = sanitize_spans(text_len, spans)
        assert all(s in sane for s in out)
        # all spans within bounds
        assert all(0 <= s[1] < s[2] <= text_len for s in out)

    @given(st.lists(_span, max_size=12), st.integers(0, 60))
    @settings(max_examples=100, deadline=None)
    def test_deterministic(self, spans, text_len):
        a = resolve_conflicts(sanitize_spans(text_len, spans), "score")
        b = resolve_conflicts(sanitize_spans(text_len, spans), "score")
        assert a == b


class TestSpliceProperties:
    @given(_text)
    @settings(max_examples=100, deadline=None)
    def test_empty_spans_identity(self, text):
        assert splice(text, []) == text

    @given(_text)
    @settings(max_examples=150, deadline=None)
    def test_detect_then_splice_accounting(self, text):
        """For ANY text: splice over the detected spans preserves every
        non-span character in order and replaces each span with [TYPE]."""
        mentions, _ = detect_mentions(text)
        out = splice(text, [(m.entity_type, m.start, m.end) for m in mentions])
        expected = []
        pos = 0
        for m in mentions:
            expected.append(text[pos:m.start])
            expected.append(f"[{m.entity_type}]")
            pos = m.end
        expected.append(text[pos:])
        assert out == "".join(expected)


class TestNormalizeProperties:
    @given(_text)
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, s):
        assert norm_surface(norm_surface(s)) == norm_surface(s)

    @given(_text)
    @settings(max_examples=200, deadline=None)
    def test_no_outer_space_no_double_space(self, s):
        n = norm_surface(s)
        assert n == n.strip()
        assert "  " not in n


class TestMinhashProperties:
    @given(st.text(min_size=0, max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_signature_shape_and_determinism(self, s):
        sig = minhash_signature(s)
        assert len(sig) == 32
        assert sig == minhash_signature(s)
        assert len(band_keys(sig)) == 8

    @given(st.text(min_size=3, max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_identical_strings_jaccard_one(self, s):
        assert jaccard(s, s) == 1.0
        # identical signatures collide in every band
        a = band_keys(minhash_signature(s))
        b = band_keys(minhash_signature(s))
        assert a == b
