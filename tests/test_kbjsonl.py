"""KB JSONL source round-trip (S-4) and -DOCSTART- filter (P-16)."""


def test_kb_jsonl_round_trip(spark, tmp_path):
    from kgner.operators.kbbuild import kb_sentences
    from kgner.sources.kbjsonl import read_kb_jsonl, write_kb_jsonl
    from kgner.fixtures import build_fixtures, to_spark

    fx = build_fixtures(n_entities=8, n_pages=5, giant_pages=0)
    t = to_spark(spark, fx)
    kbs = kb_sentences(t["kb_pages"])
    path = str(tmp_path / "kb_jsonl")
    write_kb_jsonl(kbs, path)
    back = read_kb_jsonl(spark, path)
    want = {
        (r["title"], r["p_id"], r["s_id"], r["sentence"])
        for r in kbs.collect()
    }
    got = {
        (r["title"], r["p_id"], r["s_id"], r["sentence"])
        for r in back.collect()
    }
    assert got == want and len(got) > 0


def test_kb_jsonl_drops_malformed(spark, tmp_path):
    from kgner.sources.kbjsonl import read_kb_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"title":"A","p_id":0,"s_id":0,"sentence":"ok","paragraph":"ok","url":"u"}\n'
        "this is not json\n"
    )
    rows = read_kb_jsonl(spark, str(p)).collect()
    assert [r["title"] for r in rows if r["title"]] == ["A"]


def test_conll_docstart_filter(spark, tmp_path):
    from kgner.sources.conll import read_conll

    p = tmp_path / "d.conll"
    p.write_text("-DOCSTART- X X O\n\nreal NN X O\ntoken NN X O\n")
    df = read_conll(spark, str(p), {0: "tokens", 3: "ner"}, drop_docstart=True)
    rows = df.collect()
    assert len(rows) == 1
    assert list(rows[0]["tokens"]) == ["real", "token"]
