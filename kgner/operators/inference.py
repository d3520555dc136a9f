"""Model-inference operator: emission projection + CRF Viterbi decoding as a
vectorized mapInPandas stage (SURVEY.md §2 M-4/M-5/M-7).

The reference runs XLM-R + linear + CRF on GPU
(/root/reference/flair/models/sequence_tagger_model.py:844-1327). This
container has no torch, so the EMBEDDING step is a pluggable callable; the
default is a deterministic hash-based embedding (real Spark plumbing, fake
features — the same stub policy as multimodal decode). The linear emission
and Viterbi decode are real numpy, identical math to the reference decode.

Length-sorted batching (flair/custom_data_loader.py:84-149) maps to
`repartitionByRange(subtoken_len) + sortWithinPartitions` before the UDF,
and the UDF re-chunks by cumulative token budget so a batch of long
sentences can't blow memory. All three decode operators (1-best, posterior
ensemble, n-best) share that scaffold via `_batched_inference` — one place
for batching semantics, one decode closure per operator.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgner.spanops import viterbi_decode

PRED_SCHEMA = "url string, sent_id int, tags array<string>"
NBEST_SCHEMA = "url string, sent_id int, rank int, tags array<string>, score double"


def hash_embedding(tokens: list[str], dim: int = 32) -> np.ndarray:
    """Deterministic per-token pseudo-embedding (md5-seeded)."""
    import hashlib

    out = np.zeros((len(tokens), dim), dtype=np.float64)
    for i, t in enumerate(tokens):
        h = hashlib.md5(t.lower().encode()).digest()
        arr = np.frombuffer((h * ((dim * 4) // 16 + 1))[: dim * 4], dtype=np.uint32)
        out[i] = (arr % 997) / 997.0
    return out


# per-process cache for file-loaded embedding tables, keyed by path — lives
# OUTSIDE the embedder object so a driver-side call never puts the table
# into the pickled task closure (only the path string ships)
_NPZ_TABLE_CACHE: dict[str, tuple[np.ndarray, dict[str, int]]] = {}


class _NpzEmbedder:
    """Picklable embed_fn backed by a frozen .npz weight file. Serializes as
    just the PATH; each process (driver or executor python worker) loads the
    table once into _NPZ_TABLE_CACHE on first call."""

    def __init__(self, path: str):
        self.path = path

    def __call__(self, pieces: list[str]) -> np.ndarray:
        entry = _NPZ_TABLE_CACHE.get(self.path)
        if entry is None:
            with np.load(self.path, allow_pickle=False) as z:
                table = np.vstack([z["vectors"], z["oov"][None, :]]).astype(
                    np.float64
                )
                lookup = {t: i for i, t in enumerate(z["vocab"].tolist())}
            entry = _NPZ_TABLE_CACHE[self.path] = (table, lookup)
        table, lookup = entry
        oov = len(table) - 1
        idx = np.fromiter(
            (lookup.get(p, oov) for p in pieces), dtype=np.int64, count=len(pieces)
        )
        return table[idx]


def load_npz_embedder(path: str) -> Callable[[list[str]], np.ndarray]:
    """Load a FROZEN embedding table and return an ``embed_fn`` with the
    exact call shape a real model runtime has behind this seam:
    ``embed_fn(pieces: list[str]) -> (len(pieces), dim) float array``.

    The reference loads an AutoModel and runs a forward pass over subtoken
    ids (flair/embeddings.py:2906-3091); an ONNX/torch export swapped in
    here would tokenize to ids and call ``session.run`` — the engine-side
    plumbing (subtokenize -> stride windows -> seam-cut reconstruction ->
    pooling -> projection -> Viterbi, kgner.operators.align/inference) is
    identical either way. This loader is the recorded-fixture instance of
    that swap: the ``.npz`` holds ``vocab`` (subtoken strings), ``vectors``
    ((V, dim) rows) and ``oov`` (the out-of-vocabulary row), and the
    "forward pass" is a vectorized row gather.

    The returned embedder pickles as ONLY the path (a per-process cache
    holds the table), so calling it on the driver first — e.g. a sanity
    check — cannot bloat task closures with the full weight matrix. Each
    executor worker reads the file once. At cluster scale ship the file
    with ``spark.sparkContext.addFile(path)`` / ``spark-submit --files``
    and pass ``SparkFiles.get(name)`` — the same distribution story as any
    model artifact (SURVEY §2 S-10).
    """
    return _NpzEmbedder(path)


def _batched_inference(
    sentences: DataFrame,
    decode_rows: Callable[[list], pd.DataFrame],
    schema: str,
    token_budget: int,
    length_sorted: bool,
) -> DataFrame:
    """Shared inference scaffold: length-sorted partitioning + in-UDF
    token-budget re-chunking (M-2/W-6), one decode closure per operator.
    decode_rows: [(url, sent_id, tokens)] -> pd.DataFrame matching schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, int, list[str]]] = []
            acc = 0
            for url, sid, toks in zip(pdf["url"], pdf["sent_id"], pdf["tokens"]):
                toks = list(toks) if toks is not None else []
                rows.append((url, int(sid), toks))
                acc += len(toks)
                if acc >= token_budget:  # token-budget re-chunk
                    yield decode_rows(rows)
                    rows, acc = [], 0
            if rows:
                yield decode_rows(rows)

    src = sentences.select("url", "sent_id", "tokens", "subtoken_len")
    if length_sorted:
        # pad-efficiency analogue of length-sorted batching: cluster similar
        # lengths into the same partitions, sorted within each
        src = src.repartitionByRange(F.col("subtoken_len")).sortWithinPartitions(
            "subtoken_len"
        )
    return src.mapInPandas(run, schema)


def _tags_frame(rows: list, tags_out: list) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "url": pd.Series([r[0] for r in rows], dtype="object"),
            "sent_id": pd.Series([r[1] for r in rows], dtype="int32"),
            "tags": pd.Series(tags_out, dtype="object"),
        }
    )


def tag_with_crf(
    sentences: DataFrame,
    weights: np.ndarray,
    transitions: np.ndarray,
    tagset: list[str],
    embed_fn: Callable[[list[str]], np.ndarray] = hash_embedding,
    token_budget: int = 8192,
    length_sorted: bool = True,
    max_window: int | None = None,
    stride: int | None = None,
    pooling: str = "first",
) -> DataFrame:
    """sentences(url, sent_id, tokens, subtoken_len) -> (url, sent_id, tags).

    weights: (dim, K) emission projection; transitions: (K+2, K+2) CRF.
    Both are closure-captured -> Spark broadcasts them with the task (small).

    max_window: when set, run the reference's long-sentence inference path
    (M-1/M-2): subtokenize each sentence, embed in overlapping windows of
    `max_window` subtokens with `stride` overlap (default max_window//2,
    flair/embeddings.py:2962-2969), seam-cut reconstruct, pool per token
    (`pooling`), THEN project + Viterbi over the full token sequence. In
    this mode embed_fn receives SUBTOKEN strings per window — the tensor a
    real transformer sees. When None (default), embed_fn embeds the raw
    token list directly (the token-level fast path).
    """

    def decode_rows(rows: list) -> pd.DataFrame:
        from kgner.operators.align import embed_tokens_windowed

        tags_out = []
        for _, _, toks in rows:
            if not toks:
                tags_out.append([])
                continue
            if max_window is not None:
                embedded = embed_tokens_windowed(
                    list(toks),
                    embed_fn,
                    max_len=max_window,
                    stride=stride,
                    pooling=pooling,
                )
            else:
                embedded = embed_fn(list(toks))
            em = embedded @ weights  # (T, K)
            path = viterbi_decode(em, transitions)
            tags_out.append([tagset[i] for i in path])
        return _tags_frame(rows, tags_out)

    return _batched_inference(
        sentences, decode_rows, PRED_SCHEMA, token_budget, length_sorted
    )


def tag_with_posterior_ensemble(
    sentences: DataFrame,
    models: list[tuple[np.ndarray, np.ndarray]],
    tagset: list[str],
    embed_fn: Callable[[list[str]], np.ndarray] = hash_embedding,
    token_budget: int = 8192,
    length_sorted: bool = True,
) -> DataFrame:
    """Posterior-vote ensemble inference (A-1 posterior variant): each model
    (weights, transitions) projects its own emissions, forward_backward
    yields per-token marginals, the ensemble averages them and decodes by
    argmax (kgner.spanops.posterior_vote_decode; reference's `posterior`
    distillation/multiview combination). Same (url, sent_id, tags) contract
    and batching shape as tag_with_crf."""
    from kgner.spanops import posterior_vote_decode

    def decode_rows(rows: list) -> pd.DataFrame:
        tags_out = []
        for _, _, toks in rows:
            if not toks:
                tags_out.append([])
                continue
            emb = embed_fn(list(toks))
            path = posterior_vote_decode(
                [emb @ w for w, _ in models], [t for _, t in models]
            )
            tags_out.append([tagset[i] for i in path])
        return _tags_frame(rows, tags_out)

    return _batched_inference(
        sentences, decode_rows, PRED_SCHEMA, token_budget, length_sorted
    )


def tag_nbest_with_crf(
    sentences: DataFrame,
    weights: np.ndarray,
    transitions: np.ndarray,
    tagset: list[str],
    nbest: int = 2,
    embed_fn: Callable[[list[str]], np.ndarray] = hash_embedding,
    token_budget: int = 8192,
    length_sorted: bool = True,
) -> DataFrame:
    """n-best CRF inference: (url, sent_id, rank, tags, score) with rank 1 =
    the Viterbi path — one output row per kept path
    (kgner.spanops.viterbi_nbest; reference _viterbi_decode_nbest,
    flair/models/sequence_tagger_model.py:1660-1778). Feeds n-best
    re-ranking / ensemble variants; same batching shape as tag_with_crf.

    Row-count contract: a sentence yields min(nbest, #distinct paths) rows;
    an EMPTY sentence has exactly one path (the empty one), so it yields a
    single rank-1 row with tags=[] and score 0 — consumers joining rank 1
    against rank 2..n must expect the tail ranks to be absent for such rows.
    """
    from kgner.spanops import viterbi_nbest

    def decode_rows(rows: list) -> pd.DataFrame:
        out: list[tuple[str, int, int, list[str], float]] = []
        for url, sid, toks in rows:
            if not toks:
                out.append((url, sid, 1, [], 0.0))
                continue
            em = embed_fn(list(toks)) @ weights
            for r, (path, score) in enumerate(
                viterbi_nbest(em, transitions, nbest), start=1
            ):
                out.append((url, sid, r, [tagset[i] for i in path], score))
        return pd.DataFrame(
            {
                "url": pd.Series([o[0] for o in out], dtype="object"),
                "sent_id": pd.Series([o[1] for o in out], dtype="int32"),
                "rank": pd.Series([o[2] for o in out], dtype="int32"),
                "tags": pd.Series([o[3] for o in out], dtype="object"),
                "score": pd.Series([o[4] for o in out], dtype="float64"),
            }
        )

    return _batched_inference(
        sentences, decode_rows, NBEST_SCHEMA, token_budget, length_sorted
    )


def make_gazetteer_model(
    tagset: list[str], alias_tokens: dict[str, str], dim: int = 32
) -> tuple[np.ndarray, np.ndarray]:
    """Build (weights, transitions) for a toy-but-real CRF whose emissions
    favor B-<label> on tokens present in alias_tokens (token -> label) —
    used by tests to prove the plumbing decodes what the emissions say."""
    rng = np.random.RandomState(7)
    K = len(tagset)
    weights = rng.randn(dim, K) * 0.01
    transitions = np.zeros((K + 2, K + 2))
    # discourage I- without preceding B- of same type
    for j, tag in enumerate(tagset):
        if tag.startswith("I-"):
            lbl = tag[2:]
            for i, prev in enumerate(tagset):
                ok = prev in (f"B-{lbl}", f"I-{lbl}")
                transitions[i, j] = 0.0 if ok else -8.0
            transitions[K, j] = -8.0  # START -> I- forbidden
    return weights, transitions
