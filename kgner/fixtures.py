"""Deterministic synthetic fixtures (FIXTURES.md schemas, seed=42).

Generates the KG-pipeline input tables — `pages` (the BASELINE.json
input_hint shape), `kb_pages`, `redirects` — plus ground-truth
`gold_mentions` / `gold_triples` known BY CONSTRUCTION (mentions are planted
at recorded token offsets), and `model_predictions` (N noisy simulated
taggers for the ensemble test, mirroring the 0.5*N vote threshold of
/root/reference/ensemble_prediction.py:399-416,505).

Everything derives from random.Random(seed) — no wall clock, no dict-order
dependence, byte-stable across runs.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

from kgner.spanops import iob_to_iobes, spans_to_bio

LABELS = ["PER", "LOC", "GRP", "CORP", "PROD", "CW"]
LANGS = ["en", "en", "en", "es", "zh", "fa", "hi"]  # en-weighted
DISTRACTORS = (
    "the quick brown river stone light cloud market story music silver road "
    "garden winter bridge letter window forest number animal circle "
    "island memory shadow dream temple valley harbor signal"
).split()
# real CJK distractor tokens for zh pages (exercise the CJK sentence rule
# and non-latin byte-identity end-to-end; still whitespace-tokenized)
DISTRACTORS_ZH = (
    "河流 石头 光线 云朵 市场 故事 音乐 银色 道路 花园 冬天 桥梁 信件 窗户 "
    "森林 数字 动物 圆圈 岛屿 记忆 影子 梦想 寺庙 山谷 港口 信号"
).split()
ZH_TERM = "。"  # 。


def _surface(i: int, label: str, rng: random.Random) -> list[str]:
    base = f"zq{label.lower()}{i:04d}"
    if rng.random() < 0.4:
        return [base, rng.choice(["group", "corp", "city", "band", "press"])]
    return [base]


@dataclass
class Fixtures:
    pages: list[dict] = field(default_factory=list)
    kb_pages: list[dict] = field(default_factory=list)
    redirects: list[dict] = field(default_factory=list)
    gold_mentions: list[dict] = field(default_factory=list)
    gold_triples: list[dict] = field(default_factory=list)
    model_predictions: list[dict] = field(default_factory=list)
    entities: dict[str, dict] = field(default_factory=dict)  # canon -> info
    alias_map: dict[str, str] = field(default_factory=dict)  # alias_norm -> canon


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def build_fixtures(
    n_entities: int = 120,
    n_pages: int = 400,
    n_models: int = 5,
    giant_pages: int = 2,
    seed: int = 42,
) -> Fixtures:
    rng = random.Random(seed)
    fx = Fixtures()

    # --- entity universe + aliases + redirects -----------------------------
    canon_titles: list[str] = []
    for i in range(n_entities):
        label = LABELS[i % len(LABELS)]
        surf = _surface(i, label, rng)
        canon = " ".join(surf)
        canon_titles.append(canon)
        aliases = [canon]
        if rng.random() < 0.7:
            a1 = f"zqa{i:04d}"
            aliases.append(a1)
            fx.redirects.append({"alias_title": a1, "canonical_title": canon})
        if rng.random() < 0.3:  # 2-hop chain: a2 -> a1-or-canon
            a2 = f"zqb{i:04d}"
            hop = aliases[1] if len(aliases) > 1 else canon
            aliases.append(a2)
            fx.redirects.append({"alias_title": a2, "canonical_title": hop})
        fx.entities[canon] = {"label": label, "aliases": aliases, "idx": i}
        for a in aliases:
            fx.alias_map[a.lower()] = canon
    # small redirect cycle (canonicalization edge case): two aliases of e0
    fx.redirects.append({"alias_title": "zqcycA", "canonical_title": "zqcycB"})
    fx.redirects.append({"alias_title": "zqcycB", "canonical_title": "zqcycA"})
    fx.redirects.append({"alias_title": "zqcycB", "canonical_title": canon_titles[0]})
    fx.alias_map["zqcyca"] = canon_titles[0]
    fx.alias_map["zqcycb"] = canon_titles[0]

    # --- kb_pages: paragraphs with anchors ---------------------------------
    for canon in canon_titles:
        n_paras = rng.randint(1, 6)
        paragraphs = []
        for _ in range(n_paras):
            words = [rng.choice(DISTRACTORS) for _ in range(rng.randint(8, 20))]
            anchors = []
            for _ in range(rng.randint(1, 5)):
                target = rng.choice(canon_titles)
                info = fx.entities[target]
                mention = rng.choice(info["aliases"])
                pos = rng.randint(0, len(words))
                words = words[:pos] + mention.split() + words[pos:]
                anchors.append({"mention": mention, "target_title": target})
            text = " ".join(words)
            resolved = []
            for a in anchors:
                start = text.find(a["mention"])
                if start >= 0:
                    resolved.append(
                        {
                            "start": start,
                            "end": start + len(a["mention"]),
                            "mention": a["mention"],
                            "target_title": a["target_title"],
                        }
                    )
            paragraphs.append({"text": text, "anchors": resolved})
        if n_paras > 2 and rng.random() < 0.3:  # duplicate paragraph (dedup test)
            paragraphs.append(dict(paragraphs[0]))
        if rng.random() < 0.1:  # out-of-range anchor (clamp test)
            paragraphs[0] = {
                "text": paragraphs[0]["text"],
                "anchors": paragraphs[0]["anchors"]
                + [
                    {
                        "start": len(paragraphs[0]["text"]) + 50,
                        "end": len(paragraphs[0]["text"]) + 60,
                        "mention": "zqoob",
                        "target_title": canon_titles[0],
                    }
                ],
            }
        fx.kb_pages.append(
            {"title": canon, "paragraphs": paragraphs, "lang": "en"}
        )
        # links_to gold triples from anchors
        seen = set()
        for p in paragraphs:
            for a in p["anchors"]:
                tgt = fx.alias_map.get(a["target_title"].lower(), a["target_title"])
                if a["mention"] == "zqoob":
                    continue
                key = (canon, tgt)
                if key not in seen:
                    seen.add(key)
                    fx.gold_triples.append(
                        {
                            "subj": canon,
                            "pred": "links_to",
                            "obj": tgt,
                            "url": f"https://kb.example.org/wiki/{canon.replace(' ', '_')}",
                        }
                    )

    # --- web pages with planted mentions ------------------------------------
    domains = [f"d{i:02d}.example.com" for i in range(20)]
    hot = "hot.example.com"
    base_ts = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    for p in range(n_pages + giant_pages):
        is_giant = p >= n_pages
        domain = hot if (not is_giant and rng.random() < 0.30) else rng.choice(domains)
        url = f"https://{domain}/p/{p:06d}"
        lang = rng.choice(LANGS)
        warc_ts = base_ts + dt.timedelta(
            days=rng.randint(0, 29), seconds=rng.randint(0, 86399)
        )
        n_sents = rng.randint(600, 900) if is_giant else rng.randint(1, 40)
        para_sents: list[list[str]] = [[]]
        page_entities_by_sent: list[set[str]] = []
        sent_id = 0
        vocab = DISTRACTORS_ZH if lang == "zh" else DISTRACTORS
        for _ in range(n_sents):
            toks = [rng.choice(vocab) for _ in range(rng.randint(5, 14))]
            ents_here: set[str] = set()
            n_ments = 0
            if rng.random() < 0.6:
                n_ments = 1 + (rng.random() < 0.25)
            for _ in range(n_ments):
                canon = rng.choice(canon_titles)
                info = fx.entities[canon]
                mention = rng.choice(info["aliases"])
                mtoks = mention.split()
                pos = rng.randint(0, max(0, len(toks) - len(mtoks) - 1))
                toks = toks[:pos] + mtoks + toks[pos:]
                ents_here.add(canon)
            # recompute gold offsets by scanning (mentions may collide/overlap;
            # the scan below is the ground truth, greedy longest-first)
            sent_text_toks = list(toks)
            term = ZH_TERM if lang == "zh" else "."
            sent_text_toks[-1] = sent_text_toks[-1] + term
            sent = " ".join(sent_text_toks)
            low = [t.lower() for t in sent_text_toks]
            i = 0
            found: list[tuple[int, int, str, str]] = []
            while i < len(low):
                hit = None
                for ln in (2, 1):
                    if i + ln <= len(low):
                        key = " ".join(low[i : i + ln])
                        if key in fx.alias_map:
                            hit = (i, i + ln, key, fx.alias_map[key])
                            break
                if hit:
                    found.append(hit)
                    i = hit[1]
                else:
                    i += 1
            ents_here = set()
            for s, e, key, canon in found:
                info = fx.entities[canon]
                fx.gold_mentions.append(
                    {
                        "url": url,
                        "sent_id": sent_id,
                        "start": s,
                        "end": e,
                        "text": " ".join(sent_text_toks[s:e]),
                        "label": info["label"],
                        "entity_id": canon,
                    }
                )
                ents_here.add(canon)
            page_entities_by_sent.append(ents_here)
            para_sents[-1].append(sent)
            sent_id += 1
            if rng.random() < 0.2:
                para_sents.append([])
        paragraphs = [" ".join(ss) for ss in para_sents if ss]
        text = "\n".join(paragraphs)
        html = (
            "<html><head><title>pg</title><script>var x=1;</script></head><body>"
            + "".join(f"<p>{_escape(pp)}</p>" for pp in paragraphs)
            + "</body></html>"
        ).encode("utf-8")
        fx.pages.append(
            {"url": url, "warc_ts": warc_ts, "html": html, "text": text, "lang": lang}
        )
        # gold triples: url mentions entity; entity co_occurs_with entity
        page_ents = sorted({e for s in page_entities_by_sent for e in s})
        for e in page_ents:
            fx.gold_triples.append(
                {"subj": url, "pred": "mentions", "obj": e, "url": url}
            )
        co = set()
        for ents in page_entities_by_sent:
            es = sorted(ents)
            for i in range(len(es)):
                for j in range(i + 1, len(es)):
                    co.add((es[i], es[j]))
        for a, b in sorted(co):
            fx.gold_triples.append(
                {"subj": a, "pred": "co_occurs_with", "obj": b, "url": url}
            )

    # --- dedicated script-coverage pages (zh / ja / mixed-script) -----------
    # The byte-identity invariant must hold beyond latin text: a zh page with
    # REAL fullwidth terminators (the kb/parse_text.py:17-32 zh rule), a ja
    # page (hiragana + katakana + kanji), and a mixed-script page where CJK
    # runs ride inside latin sentences. Appended AFTER the random pages with
    # fixed content so the existing rng draws (and thus every other fixture
    # value) are unchanged.
    script_pages = [
        ("zh", ["河流的故事很长。山谷与港口之间有一座桥梁！",
                "寺庙的影子落在花园里。梦想照亮了道路？信号灯亮了。"]),
        ("ja", ["カタカナとひらがなが混ざった文です。森はとても静かだ！",
                "メモリーの信号が光る。夢のなかで橋を渡った？"]),
        ("en", ["The market near 寺庙 was quiet today. Nobody sang.",
                "A letter about トウキョウ arrived, and the bridge held."]),
    ]
    for i, (lang, paragraphs) in enumerate(script_pages):
        url = f"https://cjk.example.org/p/{i}"
        html = (
            "<html><head><title>pg</title><script>var x=1;</script></head><body>"
            + "".join(f"<p>{_escape(pp)}</p>" for pp in paragraphs)
            + "</body></html>"
        ).encode("utf-8")
        fx.pages.append(
            {
                "url": url,
                "warc_ts": base_ts + dt.timedelta(days=30, seconds=i),
                "html": html,
                "text": "\n".join(paragraphs),
                "lang": lang,
            }
        )

    # --- simulated model predictions (BIOES), noise per model ---------------
    by_sent: dict[tuple[str, int], list[dict]] = {}
    for m in fx.gold_mentions:
        by_sent.setdefault((m["url"], m["sent_id"]), []).append(m)
    sent_lens: dict[tuple[str, int], int] = {}
    for pg in fx.pages:
        for sid, sent in enumerate(
            s for para in pg["text"].split("\n") for s in _iter_sents(para, pg["lang"])
        ):
            sent_lens[(pg["url"], sid)] = len(sent.split())
    pred_rng = random.Random(seed + 1)
    keys = sorted(by_sent.keys())
    for url, sid in keys:
        n = sent_lens.get((url, sid), 0)
        if n == 0:
            continue
        gold_spans = [(m["start"], m["end"], m["label"]) for m in by_sent[(url, sid)]]
        # corrupt at most floor((N-1)/2) models per sentence so the 0.5*N vote
        # threshold (ensemble_prediction.py:505) PROVABLY recovers gold
        n_noisy = pred_rng.randint(0, (n_models - 1) // 2)
        noisy = set(pred_rng.sample(range(n_models), n_noisy))
        for model_id in range(n_models):
            spans = list(gold_spans)
            if model_id in noisy and spans:
                if pred_rng.random() < 0.5:  # drop one span
                    spans = spans[1:]
                else:  # shift a boundary
                    s, e, lbl = spans[0]
                    spans[0] = (s, min(e + 1, n), lbl)
            tags = iob_to_iobes(spans_to_bio(n, spans))
            fx.model_predictions.append(
                {"model_id": model_id, "url": url, "sent_id": sid, "tags": tags}
            )
    return fx


def _iter_sents(paragraph: str, lang: str):
    from kgner.textops import split_sentences

    return split_sentences(paragraph, lang)


# --- Spark materialization ---------------------------------------------------

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
KB_PAGES_SCHEMA = (
    "title string, paragraphs array<struct<text:string, "
    "anchors:array<struct<start:int,end:int,mention:string,target_title:string>>>>, "
    "lang string"
)
REDIRECTS_SCHEMA = "alias_title string, canonical_title string"
GOLD_MENTIONS_SCHEMA = (
    "url string, sent_id int, start int, end int, text string, "
    "label string, entity_id string"
)
GOLD_TRIPLES_SCHEMA = "subj string, pred string, obj string, url string"
PREDICTIONS_SCHEMA = "model_id int, url string, sent_id int, tags array<string>"


def to_spark(spark, fx: Fixtures):
    """Materialize fixture tables as DataFrames with explicit schemas."""
    return {
        "pages": spark.createDataFrame(fx.pages, PAGES_SCHEMA),
        "kb_pages": spark.createDataFrame(fx.kb_pages, KB_PAGES_SCHEMA),
        "redirects": spark.createDataFrame(fx.redirects, REDIRECTS_SCHEMA),
        "gold_mentions": spark.createDataFrame(fx.gold_mentions, GOLD_MENTIONS_SCHEMA),
        "gold_triples": spark.createDataFrame(fx.gold_triples, GOLD_TRIPLES_SCHEMA),
        "model_predictions": spark.createDataFrame(
            fx.model_predictions, PREDICTIONS_SCHEMA
        ),
    }
