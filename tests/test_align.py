"""M-1/M-2 core: subtoken↔token alignment + stride-window reconstruction
(flair/embeddings.py:3347-3408, :3202-3229, :3293-3296, :3316-3338)."""

import numpy as np
import pytest

from kgner.operators.align import (
    embed_tokens_windowed,
    pool_tokens,
    reconstruct_windows,
    stride_windows,
    subtokenize,
)


def test_subtokenize_lengths_invariant():
    pieces, lengths = subtokenize(["ab12", "x", "!?", "", "a-b"])
    assert pieces == ["ab", "12", "x", "!", "?", "a", "-", "b"]
    assert lengths == [2, 1, 2, 0, 3]
    assert sum(lengths) == len(pieces)


def test_subtokenize_max_pieces_cap():
    # maximum_subtoken_length truncation (flair/embeddings.py:3184-3196)
    pieces, lengths = subtokenize(["a.b.c.d", "x"], max_pieces=3)
    assert pieces == ["a", ".", "b", "x"]
    assert lengths == [3, 1]


@pytest.mark.parametrize("n,L,S", [(5, 8, 4), (8, 8, 4), (9, 8, 4),
                                   (100, 8, 4), (23, 7, 3), (57, 10, 5),
                                   (16, 6, 5), (301, 512, 256)])
def test_stride_windows_shape_and_tiling(n, L, S):
    ws = stride_windows(n, L, S)
    assert ws[0][0] == 0 and ws[-1][1] == n
    for i, (s, e) in enumerate(ws[:-1]):
        assert e - s == L
        assert ws[i + 1][0] == s + L - S  # advance
    last = ws[-1]
    assert 0 < last[1] - last[0] <= L
    if len(ws) > 1:
        assert last[1] - last[0] > S  # tail longer than the overlap
    # seam reconstruction tiles exactly: feed window-position columns through
    parts = [np.arange(s, e, dtype=float).reshape(-1, 1) for s, e in ws]
    rec = reconstruct_windows(parts, ws, S)
    assert rec.shape == (n, 1)
    np.testing.assert_array_equal(rec[:, 0], np.arange(n, dtype=float))


def test_reconstruct_seam_keeps_context():
    # every kept row from a non-first window sits >= ceil(S/2) into it
    n, L, S = 30, 8, 4
    ws = stride_windows(n, L, S)
    keep_from = S - S // 2
    # kept global ranges per window
    prev_hi = None
    for i, (s, e) in enumerate(ws):
        lo = s if i == 0 else s + keep_from
        if prev_hi is not None:
            assert lo == prev_hi
        prev_hi = (ws[i + 1][0] + keep_from) if i + 1 < len(ws) else e


def test_pool_tokens_ops():
    lengths = [2, 0, 1]
    sub = np.array([[1.0, 0.0], [3.0, 2.0], [5.0, 5.0]])
    first = pool_tokens(sub, lengths, "first")
    np.testing.assert_array_equal(first, [[1, 0], [0, 0], [5, 5]])
    last = pool_tokens(sub, lengths, "last")
    np.testing.assert_array_equal(last, [[3, 2], [0, 0], [5, 5]])
    mean = pool_tokens(sub, lengths, "mean")
    np.testing.assert_array_equal(mean, [[2, 1], [0, 0], [5, 5]])
    with pytest.raises(ValueError):
        pool_tokens(sub, [1, 1], "first")  # pieces not fully covered


def test_windowed_equals_whole_for_text_deterministic_model():
    """With an embed_fn that depends only on each subtoken's text, windowed
    reconstruction must be exactly the whole-sequence embedding — any seam
    off-by-one would place a different subtoken's vector at some position."""
    from kgner.operators.inference import hash_embedding

    rng = np.random.RandomState(11)
    vocab = ["alpha", "beta-2", "x!", "gamma", "12.5", "delta", "'quote'"]
    tokens = [vocab[i] for i in rng.randint(0, len(vocab), size=120)]
    whole = embed_tokens_windowed(tokens, hash_embedding, max_len=10**9)
    for L, S in [(8, 4), (16, 8), (7, 3), (9, None)]:
        win = embed_tokens_windowed(tokens, hash_embedding, max_len=L, stride=S)
        np.testing.assert_array_equal(win, whole)


def test_windowed_alignment_multi_piece_first_pooling():
    """Hand-checked: first-subtoken pooling picks each token's FIRST piece
    even across a window seam."""
    def embed(pieces):
        # embedding = (index of piece text in a fixed vocabulary, 1)
        vocab = {"aa": 0.0, "-": 1.0, "bb": 2.0, "cc": 3.0, "!": 4.0}
        return np.array([[vocab[p], 1.0] for p in pieces])

    tokens = ["aa-bb", "cc", "cc!", "aa", "bb", "cc", "aa-bb"]  # 12 pieces
    out = embed_tokens_windowed(tokens, embed, max_len=4, stride=2)
    np.testing.assert_array_equal(out[:, 0], [0, 3, 3, 0, 2, 3, 0])


def test_tag_with_crf_windowed_matches_whole(spark):
    """The full inference operator: windowed embedding path decodes the same
    tags as the unwindowed path on sentences far beyond the window size."""
    from kgner.operators.inference import tag_with_crf

    gaz = {"spark", "flink", "kafka"}
    tagset = ["O", "B-ENT", "I-ENT"]
    dim = 3

    def embed(pieces):
        out = np.zeros((len(pieces), dim))
        prev = False
        for i, t in enumerate(pieces):
            g = t in gaz
            out[i, 1 if (g and not prev) else (2 if g else 0)] = 5.0
            prev = g
        return out

    w = np.eye(dim)
    trans = np.zeros((dim + 2, dim + 2))
    trans[0, 2] = -10.0
    trans[dim, 2] = -10.0

    words = ["the", "spark", "flink", "job", "ran", "kafka", "on", "yarn"]
    toks = [words[i % len(words)] for i in range(95)]
    sents = spark.createDataFrame(
        [("u1", 0, toks, len(toks))],
        "url string, sent_id int, tokens array<string>, subtoken_len int",
    )
    plain = tag_with_crf(sents, w, trans, tagset, embed_fn=embed).collect()[0].tags
    windowed = tag_with_crf(
        sents, w, trans, tagset, embed_fn=embed, max_window=16
    ).collect()[0].tags
    assert windowed == plain
    assert "B-ENT" in plain


def test_chunk_by_subtokens_stride_matches_stride_windows(spark):
    """The JVM overlapping chunker must produce exactly the windows the numpy
    stride_windows computes (whose seam-cut reconstruction consumes them)."""
    toks = [f"t{i}" for i in range(23)]
    df = spark.createDataFrame([(1, toks)], "id long, tokens array<string>")

    from kgner.operators.chunking import chunk_by_subtokens

    for budget, stride in [(8, 4), (8, 0), (7, 3), (23, 0), (30, 10)]:
        got = {
            r.chunk_id: list(r.chunk_tokens)
            for r in chunk_by_subtokens(df, budget, stride=stride).collect()
        }
        want = stride_windows(len(toks), budget, stride)
        assert len(got) == len(want), (budget, stride)
        for cid, (s, e) in enumerate(want):
            assert got[cid] == toks[s:e], (budget, stride, cid)


def test_stride_windows_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=400),
        L=st.integers(min_value=2, max_value=64),
        S=st.integers(min_value=0, max_value=63),
    )
    def check(n, L, S):
        if not S < L:
            return
        if n == 0:
            return
        ws = stride_windows(n, L, S)
        assert ws[0][0] == 0 and ws[-1][1] == n
        parts = [np.arange(s, e, dtype=float).reshape(-1, 1) for s, e in ws]
        rec = reconstruct_windows(parts, ws, S)
        np.testing.assert_array_equal(rec[:, 0], np.arange(n, dtype=float))

    check()
