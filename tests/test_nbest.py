"""n-best Viterbi + posterior-vote ensemble decode
(flair/models/sequence_tagger_model.py:1660-1778; posterior distillation)."""

import itertools

import numpy as np

from kgner.spanops import (
    forward_backward,
    posterior_vote_decode,
    viterbi_decode,
    viterbi_nbest,
)


def _brute_force(emissions, transitions, nbest):
    T, K = emissions.shape
    START, STOP = K, K + 1
    scored = []
    for path in itertools.product(range(K), repeat=T):
        s = transitions[START, path[0]] + emissions[0, path[0]]
        for t in range(1, T):
            s += transitions[path[t - 1], path[t]] + emissions[t, path[t]]
        s += transitions[path[-1], STOP]
        scored.append((list(path), float(s)))
    scored.sort(key=lambda ps: -ps[1])
    return scored[:nbest]


def test_nbest_hand_computed_2best():
    # zero transitions: path score = sum of emissions, enumerable by hand
    em = np.array([[5.0, 1.0], [4.0, 0.5]])
    trans = np.zeros((4, 4))
    got = viterbi_nbest(em, trans, nbest=2)
    assert [p for p, _ in got] == [[0, 0], [0, 1]]
    assert [s for _, s in got] == [9.0, 5.5]


def test_nbest_matches_brute_force():
    rng = np.random.RandomState(5)
    for trial in range(5):
        T, K, n = 5, 3, 4
        em = rng.randn(T, K) * 3
        trans = rng.randn(K + 2, K + 2)
        got = viterbi_nbest(em, trans, nbest=n)
        want = _brute_force(em, trans, n)
        assert [p for p, _ in got] == [p for p, _ in want], trial
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-12
        )


def test_nbest_top1_equals_viterbi():
    rng = np.random.RandomState(9)
    em = rng.randn(12, 5)
    trans = rng.randn(7, 7)
    nb = viterbi_nbest(em, trans, nbest=3)
    assert nb[0][0] == viterbi_decode(em, trans)
    assert nb[0][1] >= nb[1][1] >= nb[2][1]
    assert nb[0][0] != nb[1][0] != nb[2][0]


def test_nbest_single_token_fewer_paths():
    em = np.array([[2.0, 1.0]])
    trans = np.zeros((4, 4))
    got = viterbi_nbest(em, trans, nbest=5)  # only K=2 paths exist
    assert [p for p, _ in got] == [[0], [1]]
    assert [s for _, s in got] == [2.0, 1.0]


def test_posterior_vote_matches_single_model_marginals():
    rng = np.random.RandomState(3)
    em = rng.randn(8, 3) * 2
    trans = rng.randn(5, 5)
    single = np.argmax(forward_backward(em, trans), axis=1).tolist()
    assert posterior_vote_decode([em], [trans]) == single
    # two identical models change nothing
    assert posterior_vote_decode([em, em], [trans, trans]) == single


def test_posterior_vote_breaks_disagreement_by_confidence():
    # model A weakly prefers tag 0, model B strongly prefers tag 1
    trans = np.zeros((4, 4))
    em_a = np.array([[0.2, 0.0]])
    em_b = np.array([[0.0, 3.0]])
    assert posterior_vote_decode([em_a, em_b], [trans, trans]) == [1]


def test_posterior_ensemble_operator(spark):
    """Spark operator: two engineered models whose averaged marginals decode
    the gazetteer tags."""
    from kgner.operators.inference import tag_with_posterior_ensemble

    gaz = {"spark", "kafka"}
    tagset = ["O", "B-ENT", "I-ENT"]
    dim = 3

    def embed(tokens):
        out = np.zeros((len(tokens), dim))
        prev = False
        for i, t in enumerate(tokens):
            g = t in gaz
            out[i, 1 if (g and not prev) else (2 if g else 0)] = 5.0
            prev = g
        return out

    trans = np.zeros((dim + 2, dim + 2))
    trans[0, 2] = -10.0
    trans[dim, 2] = -10.0
    models = [(np.eye(dim), trans), (2.0 * np.eye(dim), trans)]
    sents = spark.createDataFrame(
        [("u", 0, ["run", "spark", "kafka", "now"], 4)],
        "url string, sent_id int, tokens array<string>, subtoken_len int",
    )
    tags = tag_with_posterior_ensemble(sents, models, tagset, embed_fn=embed)
    assert tags.collect()[0].tags == ["O", "B-ENT", "I-ENT", "O"]


def test_tag_nbest_operator(spark):
    """Spark n-best operator: rank 1 equals the Viterbi tags, scores are
    non-increasing, paths distinct."""
    from kgner.operators.inference import tag_nbest_with_crf, tag_with_crf

    rng = np.random.RandomState(13)
    tagset = ["O", "B-X", "I-X"]
    dim = 32  # hash_embedding's default width
    w = rng.randn(dim, 3)
    trans = rng.randn(5, 5)
    sents = spark.createDataFrame(
        [("u", 0, ["alpha", "beta", "gamma", "delta"], 4)],
        "url string, sent_id int, tokens array<string>, subtoken_len int",
    )
    nb = {r.rank: r for r in tag_nbest_with_crf(sents, w, trans, tagset, nbest=3).collect()}
    best = tag_with_crf(sents, w, trans, tagset).collect()[0].tags
    assert nb[1].tags == best
    assert nb[1].score >= nb[2].score >= nb[3].score
    assert len({tuple(nb[r].tags) for r in nb}) == 3
