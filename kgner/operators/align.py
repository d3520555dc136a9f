"""Subtoken↔token alignment + overlapping stride-window embedding
reconstruction (SURVEY.md §2 M-1/M-2 core).

The reference embeds sentences with a transformer whose input is SUBTOKENS,
in overlapping windows when the sentence exceeds the model's max length, and
maps the resulting subtoken vectors back onto whitespace tokens:

- subtoken counting per token: reconstruct_tokens_from_subtokens
  (/root/reference/flair/embeddings.py:3347-3408) — walk the subtoken stream
  and record how many pieces each token produced; tokens the tokenizer
  omitted get 0 pieces and later a zero vector (:3303-3306).
- per-token piece cap: maximum_subtoken_length truncation
  (/root/reference/flair/embeddings.py:3184-3196) — a token longer than the
  cap keeps only its first `cap` pieces.
- stride windows: encode_plus(max_length, stride, return_overflowing_tokens)
  (/root/reference/flair/embeddings.py:3202-3229) — windows of `max_len`
  subtokens advancing by `max_len - stride`; the reference default is
  stride = max_len // 2 (:2962-2969).
- window reconstruction: drop stride//2 subtokens on each side of a seam and
  concatenate (/root/reference/flair/embeddings.py:3293-3296) so every
  subtoken keeps >= stride//2 context inside the window it came from.
- pooling: 'first' | 'last' | 'mean' subtoken vector(s) per token
  (/root/reference/flair/embeddings.py:3316-3338).

Everything here is a pure function (numpy in, numpy out) — the model itself
stays a pluggable `embed_fn(subtokens) -> (len, dim)`; these functions are
the part of transformer inference the ENGINE must own even when the model is
external. They run inside the mapInPandas inference stage
(kgner.operators.inference), never on the driver.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from kgner.textops import bpe_ish_tokens


def subtokenize(
    tokens: list[str], max_pieces: int | None = None
) -> tuple[list[str], list[int]]:
    """tokens -> (flat subtoken list, per-token piece counts).

    The deterministic subtokenizer is the engine's BPE-ish regex (the same
    one behind the P-14 subtoken_len proxy), applied per token — so
    sum(lengths) == len(pieces) by construction, the invariant the
    reference's reconstruct_tokens_from_subtokens walk re-derives
    (flair/embeddings.py:3347-3408). A token with no pieces (empty string)
    records length 0, the reference's omitted-token case (:3303-3306).
    """
    pieces: list[str] = []
    lengths: list[int] = []
    for tok in tokens:
        p = bpe_ish_tokens(tok)
        if max_pieces is not None and len(p) > max_pieces:
            # keep the first `cap` pieces (flair/embeddings.py:3184-3196)
            p = p[:max_pieces]
        pieces.extend(p)
        lengths.append(len(p))
    return pieces, lengths


def stride_windows(n: int, max_len: int, stride: int) -> list[tuple[int, int]]:
    """Window [start, end) offsets over an n-subtoken sequence.

    encode_plus semantics (flair/embeddings.py:3202-3229): first window is
    [0, max_len); each next begins `stride` subtokens before the previous
    end (advance = max_len - stride) until the tail fits. Every window but
    the last has length max_len; the last has length in (stride, max_len]
    (the loop only overflows while more than max_len remain).
    """
    if not 0 <= stride < max_len:
        raise ValueError(f"need 0 <= stride < max_len, got {stride}, {max_len}")
    if n <= max_len:
        return [(0, n)]
    windows = []
    start = 0
    while True:
        end = min(start + max_len, n)
        windows.append((start, end))
        if end >= n:
            return windows
        start = start + max_len - stride


def reconstruct_windows(
    parts: list[np.ndarray], windows: list[tuple[int, int]], stride: int
) -> np.ndarray:
    """Stitch per-window embeddings back into one (n, dim) sequence.

    Seam rule (flair/embeddings.py:3293-3296): at each seam drop the last
    stride//2 rows of the earlier window and the first rows of the later
    window up to the cut point, so each kept row carries >= stride//2 rows
    of in-window left/right context. For odd strides the cut sits at
    ceil(stride/2) from the seam start so the pieces tile exactly (the
    reference's default stride — max_len//2 with max_len even — is even,
    where this equals the reference's stride//2 cut).
    """
    if len(parts) != len(windows):
        raise ValueError("parts/windows length mismatch")
    if len(parts) == 1:
        (s, e), p = windows[0], parts[0]
        if p.shape[0] != e - s:
            raise ValueError("window embedding length mismatch")
        return p
    keep_from = stride - stride // 2  # = ceil(stride/2)
    out: list[np.ndarray] = []
    for i, ((s, e), p) in enumerate(zip(windows, parts)):
        if p.shape[0] != e - s:
            raise ValueError("window embedding length mismatch")
        lo = 0 if i == 0 else keep_from  # drop seam-left rows
        hi = p.shape[0]
        if i + 1 < len(windows):
            nxt_start = windows[i + 1][0]
            # this window ends (kept) exactly where the next begins (kept)
            hi = (nxt_start + keep_from) - s
        out.append(p[lo:hi])
    return np.concatenate(out, axis=0)


def pool_tokens(
    sub_embs: np.ndarray, lengths: list[int], pooling: str = "first"
) -> np.ndarray:
    """(n_subtokens, dim) -> (n_tokens, dim) by per-token pooling
    (flair/embeddings.py:3316-3338). Zero-piece tokens get zero vectors
    (:3303-3306)."""
    dim = sub_embs.shape[1]
    out = np.zeros((len(lengths), dim), dtype=sub_embs.dtype)
    pos = 0
    for i, ln in enumerate(lengths):
        if ln == 0:
            continue
        seg = sub_embs[pos : pos + ln]
        if pooling == "first":
            out[i] = seg[0]
        elif pooling == "last":
            out[i] = seg[-1]
        elif pooling == "mean":
            out[i] = seg.mean(axis=0)
        else:
            raise ValueError(f"unknown pooling {pooling!r}")
        pos += ln
    if pos != sub_embs.shape[0]:
        raise ValueError("subtoken embeddings do not cover all pieces")
    return out


def embed_tokens_windowed(
    tokens: list[str],
    embed_fn: Callable[[list[str]], np.ndarray],
    max_len: int = 512,
    stride: int | None = None,
    pooling: str = "first",
    max_pieces: int | None = None,
) -> np.ndarray:
    """tokens -> (n_tokens, dim): the full M-1/M-2 composition.

    subtokenize -> stride windows -> embed_fn per window (the pluggable
    model; sees only that window's subtoken strings, exactly the tensor a
    transformer would) -> seam-cut reconstruction -> per-token pooling.
    stride defaults to max_len // 2, the reference's allow_long_sentences
    default (flair/embeddings.py:2962-2965).
    """
    if stride is None:
        stride = max_len // 2
    pieces, lengths = subtokenize(tokens, max_pieces=max_pieces)
    if not pieces:
        probe = embed_fn(["x"])  # only to learn dim; tokens may all be empty
        return np.zeros((len(lengths), probe.shape[1]), dtype=probe.dtype)
    windows = stride_windows(len(pieces), max_len, stride)
    parts = [np.asarray(embed_fn(pieces[s:e])) for s, e in windows]
    sub_embs = reconstruct_windows(parts, windows, stride)
    return pool_tokens(sub_embs, lengths, pooling=pooling)
