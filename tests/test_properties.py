"""Property-based tests (hypothesis) over the pure deterministic core —
the invariants the reference pins in tests/test_data.py (tokenization,
offsets, span round-trips, dictionary semantics), generalized to arbitrary
inputs."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kgner.linkops import build_alias_index, match_aliases
from kgner.spanops import (
    bioes_to_bio,
    decode_spans,
    iob1_to_iob2,
    iob_to_iobes,
    spans_to_bio,
)
from kgner.textops import (
    extract_text,
    splice_anchors,
    split_sentences_with_offsets,
    strip_anchors,
    tokenize,
)

word = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
labels = st.sampled_from(["PER", "LOC", "GRP", "CORP", "PROD", "CW"])


@st.composite
def nonoverlapping_spans(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    spans = []
    pos = 0
    while pos < n:
        if draw(st.booleans()):
            length = draw(st.integers(min_value=1, max_value=min(4, n - pos)))
            spans.append((pos, pos + length, draw(labels)))
            pos += length
        else:
            pos += 1
    return n, spans


@given(nonoverlapping_spans())
@settings(max_examples=200)
def test_span_bio_round_trip(case):
    n, spans = case
    assert decode_spans(spans_to_bio(n, spans)) == spans


@given(nonoverlapping_spans())
@settings(max_examples=200)
def test_iobes_round_trip(case):
    n, spans = case
    bio = spans_to_bio(n, spans)
    assert bioes_to_bio(iob_to_iobes(bio)) == bio
    # IOBES decodes to the same spans
    assert decode_spans(iob_to_iobes(bio)) == spans


@given(st.lists(st.sampled_from(["O", "I-PER", "I-LOC", "B-PER", "B-LOC"]), max_size=30))
@settings(max_examples=200)
def test_iob1_to_iob2_is_valid_iob2(tags):
    out = iob1_to_iob2(tags)
    for i, tag in enumerate(out):
        if tag.startswith("I-"):
            assert i > 0 and out[i - 1] in (f"B-{tag[2:]}", f"I-{tag[2:]}")


@given(st.lists(word, min_size=1, max_size=40))
@settings(max_examples=100)
def test_tokenize_join_round_trip(words):
    assert tokenize(" ".join(words)) == words


@given(st.lists(st.lists(word, min_size=1, max_size=10), min_size=1, max_size=8))
@settings(max_examples=100)
def test_sentence_offsets_point_at_sentences(sent_words):
    text = "\n".join(" ".join(ws) + "." for ws in sent_words)
    out = split_sentences_with_offsets(text, "en")
    assert len(out) == len(sent_words)
    for off, sent in out:
        assert text[off : off + len(sent)] == sent


@given(st.lists(word, min_size=1, max_size=30))
@settings(max_examples=100)
def test_extract_text_plain_text_fixpoint(words):
    text = " ".join(words)
    assert extract_text(text.encode()) == text


@given(st.lists(word, min_size=2, max_size=20), st.data())
@settings(max_examples=100)
def test_splice_strip_anchor_round_trip(words, data):
    text = " ".join(words)
    # anchor over a random token
    i = data.draw(st.integers(min_value=0, max_value=len(words) - 1))
    start = len(" ".join(words[:i])) + (1 if i else 0)
    end = start + len(words[i])
    anchors = [{"start": start, "end": end, "mention": words[i], "target_title": "T"}]
    plain, back = strip_anchors(splice_anchors(text, anchors))
    assert plain == text
    assert [(a["start"], a["end"]) for a in back] == [(start, end)]


@given(st.lists(word, min_size=1, max_size=30), st.sets(word, min_size=1, max_size=5))
@settings(max_examples=150)
def test_match_aliases_nonoverlapping_and_in_bounds(tokens, alias_set):
    idx, ml = build_alias_index([(a, a.upper()) for a in sorted(alias_set)])
    matches = match_aliases(tokens, idx, ml)
    prev_end = 0
    for s, e, canon in matches:
        assert 0 <= s < e <= len(tokens)
        assert s >= prev_end  # ordered, non-overlapping
        prev_end = e
        assert " ".join(t.lower() for t in tokens[s:e]) in idx
