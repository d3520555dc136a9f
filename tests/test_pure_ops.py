"""Unit tests for the pure deterministic core (textops/spanops/linkops/bm25)."""

import numpy as np

from kgner.bm25 import bm25_rank, idf, term_score
from kgner.fixtures import build_fixtures
from kgner.linkops import build_alias_index, connected_components, match_aliases
from kgner.oracle.pipeline import build_canonical_map, oracle_ensemble, oracle_triples
from kgner.spanops import (
    bioes_to_bio,
    decode_spans,
    iob1_to_iob2,
    iob_to_iobes,
    majority_vote,
    spans_to_bio,
    viterbi_decode,
)
from kgner.textops import (
    extract_text,
    normalize_zh_spaces,
    split_sentences,
    split_sentences_with_offsets,
    stable_hash64,
    subtoken_len,
    tokenize,
)


def test_extract_text_basic():
    html = b"<html><head><script>x<1</script></head><body><p>Hello &amp; hi.</p><p>Bye.</p></body></html>"
    assert extract_text(html) == "Hello & hi.\nBye."


def test_extract_text_deterministic():
    html = "<div>a  b\t c</div><div>d</div>".encode()
    assert extract_text(html) == extract_text(html) == "a b c\nd"


def test_split_sentences_latin():
    assert split_sentences("One two. Three four! Five?") == [
        "One two.",
        "Three four!",
        "Five?",
    ]


def test_split_sentences_zh():
    assert split_sentences("你好。再见！好", "zh") == ["你好。", "再见！", "好"]


def test_split_offsets_order():
    text = "A b. C d.\nE f."
    out = split_sentences_with_offsets(text)
    assert [s for _, s in out] == ["A b.", "C d.", "E f."]
    assert out[0][0] < out[1][0] < out[2][0]


def test_tokenize_and_subtokens():
    assert tokenize("a  bb   ccc") == ["a", "bb", "ccc"]
    assert subtoken_len("ab12-cd") == 4  # ab / 12 / - / cd


def test_normalize_zh():
    assert normalize_zh_spaces("中 国 abc 人") == "中国 abc 人"


def test_tag_conversions():
    assert iob1_to_iob2(["I-PER", "I-PER", "O", "I-LOC"]) == [
        "B-PER",
        "I-PER",
        "O",
        "B-LOC",
    ]
    assert iob_to_iobes(["B-PER", "I-PER", "O", "B-LOC"]) == [
        "B-PER",
        "E-PER",
        "O",
        "S-LOC",
    ]
    assert bioes_to_bio(["S-LOC", "B-PER", "E-PER"]) == ["B-LOC", "B-PER", "I-PER"]


def test_decode_spans_bio_bioes():
    assert decode_spans(["B-PER", "I-PER", "O", "B-LOC"]) == [
        (0, 2, "PER"),
        (3, 4, "LOC"),
    ]
    assert decode_spans(["S-LOC", "O", "B-PER", "E-PER"]) == [
        (0, 1, "LOC"),
        (2, 4, "PER"),
    ]
    # stray I- starts a span (IOB1 tolerance)
    assert decode_spans(["O", "I-PER", "I-PER"]) == [(1, 3, "PER")]
    # round trip
    spans = [(1, 3, "PER"), (4, 5, "LOC")]
    assert decode_spans(spans_to_bio(6, spans)) == spans


def test_majority_vote_threshold_and_overlap():
    votes = {(0, 2, "PER"): 4, (0, 3, "PER"): 1, (3, 4, "LOC"): 3, (2, 4, "GRP"): 2}
    got = majority_vote(votes, n_models=5)
    assert got == [(0, 2, "PER"), (3, 4, "LOC")]


def test_viterbi_prefers_transitions():
    # 2 tags; emissions tie at every step; transitions forbid 0->1
    em = np.zeros((3, 2))
    tr = np.full((4, 4), 0.0)
    tr[0, 1] = -100.0  # 0 -> 1 forbidden
    tr[2, 0] = 1.0  # START prefers 0
    path = viterbi_decode(em, tr)
    assert path == [0, 0, 0]


def test_bm25_math_and_rank():
    # 3 docs, term 'a' in d0(tf2,len4) d1(tf1,len8); 'b' in d2 only
    postings = {"a": {0: 2, 1: 1}, "b": {2: 1}}
    doc_lens = {0: 4, 1: 8, 2: 4}
    top = bm25_rank(["a"], postings, doc_lens, k=2)
    assert [d for d, _ in top] == [0, 1]
    assert top[0][1] > top[1][1] > 0
    s = term_score(2, 4, 16 / 3, 2, 3)
    assert abs(s - idf(2, 3) * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 4 / (16 / 3)))) < 1e-9


def test_bm25_title_boost():
    """Multiplicative title-field BM25 boost (generate_data.py:52-55): the
    boosted doc wins the tie, and the added score is exactly
    2.0 x term_score over the title field's own statistics."""
    postings = {"a": {0: 1, 1: 1}}
    doc_lens = {0: 4, 1: 4}
    titles = {0: ["other", "words"], 1: ["zq", "page"]}
    top = bm25_rank(
        ["a"], postings, doc_lens, k=2, title_tokens=titles, boost_terms=["zq"]
    )
    assert top[0][0] == 1  # boost flips the tie
    base = dict(bm25_rank(["a"], postings, doc_lens, k=2))
    want = base[1] + 2.0 * term_score(1, 2, 2.0, 1, 2)
    assert abs(top[0][1] - want) < 1e-9


def test_connected_components_chain_and_cycle():
    comp = connected_components([("a", "b"), ("b", "c"), ("x", "y"), ("y", "x")])
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"


def test_alias_matching_longest_first():
    idx, ml = build_alias_index([("new york", "NY"), ("new", "N"), ("york", "Y")])
    assert ml == 2
    assert match_aliases(["in", "New", "York", "today"], idx, ml) == [(1, 3, "NY")]


def test_fixtures_deterministic_and_extractable():
    fx1 = build_fixtures(n_entities=20, n_pages=30, giant_pages=0)
    fx2 = build_fixtures(n_entities=20, n_pages=30, giant_pages=0)
    assert fx1.pages == fx2.pages
    assert fx1.gold_triples == fx2.gold_triples
    for page in fx1.pages[:10]:
        assert extract_text(page["html"]) == page["text"]


def test_oracle_triples_match_gold():
    fx = build_fixtures(n_entities=30, n_pages=60, giant_pages=0)
    got = oracle_triples(fx)
    gold = {(t["subj"], t["pred"], t["obj"]) for t in fx.gold_triples}
    tp = len(got & gold)
    precision = tp / len(got)
    recall = tp / len(gold)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)


def test_oracle_ensemble_recovers_gold():
    fx = build_fixtures(n_entities=20, n_pages=40, giant_pages=0, n_models=5)
    ens = oracle_ensemble(fx)
    gold: dict[tuple[str, int], set] = {}
    for m in fx.gold_mentions:
        gold.setdefault((m["url"], m["sent_id"]), set()).add(
            (m["start"], m["end"], m["label"])
        )
    tp = fp = fn = 0
    for key, gspans in gold.items():
        pspans = set(ens.get(key, []))
        tp += len(gspans & pspans)
        fp += len(pspans - gspans)
        fn += len(gspans - pspans)
    assert tp / (tp + fn) >= 0.99, (tp, fn)
    assert tp / (tp + fp) >= 0.99, (tp, fp)


def test_stable_hash64_stable():
    assert stable_hash64("abc") == stable_hash64("abc")
    assert stable_hash64("abc") != stable_hash64("abd")
