"""Semantic unit tests for the curation pack — each operator is checked
against an independent Python recomputation (a third implementation beside
the Spark plan and the DuckDB oracle), so a shared misunderstanding in the
twin SQL cannot silently pass parity."""

from __future__ import annotations

import hashlib
import re

from caraspark import curation as C
from caraspark.tables import load


def test_pii_redaction_matches_python_re(spark, sf_smoke):
    rows = {r.doc_id: r for r in C.text_pii(spark, sf_smoke).collect()}
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    }
    for did in list(docs)[:25]:
        t = (
            docs[did][:40]
            + f" contact u{did}@ex{did % 7}.com ip "
            + f"10.{did % 256}.{did % 16}.{did % 100}"
            + ("" if did % 3 == 0 else f" call +1-555-{did % 10000:04d}")
        )
        red = re.sub(C._RE_EMAIL, "<EMAIL>", t)
        red = re.sub(C._RE_IPV4, "<IP>", red)
        red = re.sub(C._RE_PHONE, "<PHONE>", red)
        r = rows[did]
        assert r.n_email == len(re.findall(C._RE_EMAIL, t))
        assert r.n_ip == len(re.findall(C._RE_IPV4, t))
        assert r.n_phone == (0 if did % 3 == 0 else 1)
        assert r.redacted_md5 == hashlib.md5(red.encode()).hexdigest(), did


def test_dedup_url_collapses_scheme_and_query_variants(spark, sf_smoke):
    rows = C.dedup_url(spark, sf_smoke).collect()
    assert all(not r.canon_url.startswith(("http", "www.")) for r in rows)
    assert all("?" not in r.canon_url for r in rows)
    assert all(not r.canon_url.endswith("/") for r in rows)
    # variants must actually collide: with doc_id % 50 pages per source the
    # corpus has far more urls than canonical forms
    assert any(r.n_urls > 1 for r in rows)
    total = sum(r.n_urls for r in rows)
    n_docs = load(spark, sf_smoke, "documents").count()
    assert total == n_docs


def test_gopher_flags_split_the_corpus(spark, sf_smoke):
    rows = C.text_gopher(spark, sf_smoke).collect()
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)  # rules must not be vacuous
    for r in rows[:50]:
        assert r.keep == (r.ok_len and r.ok_wordlen and r.ok_stop and r.ok_diverse)


def test_stratified_sample_is_deterministic_and_near_rate(spark, sf_smoke):
    a = sorted(r.doc_id for r in C.sample_stratified(spark, sf_smoke).collect())
    b = sorted(r.doc_id for r in C.sample_stratified(spark, sf_smoke).collect())
    assert a == b  # pure function of the row, not of the run
    docs = load(spark, sf_smoke, "documents").groupBy("lang").count().collect()
    kept = {
        r.lang: r["count"]
        for r in C.sample_stratified(spark, sf_smoke)
        .groupBy("lang")
        .count()
        .collect()
    }
    for row in docs:
        rate = C._STRAT_RATES.get(row.lang, 0.2)
        frac = kept.get(row.lang, 0) / row["count"]
        assert abs(frac - rate) < 0.35  # small strata → wide but bounded band


def test_decontaminate_never_flags_benchmark_docs(spark, sf_smoke):
    rows = C.decontaminate(spark, sf_smoke).collect()
    assert rows, "synthetic vocabulary should produce 3-gram collisions"
    assert all(r.doc_id % 97 != 0 for r in rows)
    assert all(r.n_hits >= 1 for r in rows)


def test_mix_weights_respect_budget_and_cap(spark, sf_smoke):
    rows = C.mix_weights(spark, sf_smoke).collect()
    assert all(0.0 < r.weight <= 1.0 for r in rows)
    total = sum(r.n_tokens for r in rows)
    spent = sum(r.weight * r.n_tokens for r in rows)
    # uncapped domains spend exactly the sqrt-share of the budget; caps can
    # only reduce spend below the budget
    assert spent <= C._MIX_BUDGET * total + 1e-6


def test_ngram_topk_rank_contract(spark, sf_smoke):
    rows = C.ngram_topk(spark, sf_smoke).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= C._TOPK
        for a, b in zip(rs, rs[1:]):
            assert a.n > b.n or (a.n == b.n and a.gram < b.gram)


def test_text_repetition_matches_python(spark, sf_smoke):
    rows = {r.doc_id: r for r in C.text_repetition(spark, sf_smoke).collect()}
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    }
    for did in list(docs)[:20]:
        w = docs[did].lower().split(" ")
        top = max(w.count(x) for x in set(w))
        bi = [f"{a} {b}" for a, b in zip(w, w[1:])]
        r = rows[did]
        assert abs(r.top_word_frac - top / len(w)) < 1e-12
        assert abs(r.dup_bigram_frac - (1.0 - len(set(bi)) / len(bi))) < 1e-12


def test_filter_blocklist_drops_every_third_source(spark, sf_smoke):
    rows = C.filter_blocklist(spark, sf_smoke).collect()
    assert rows
    assert all(int(r.source[3:]) % 3 != 0 for r in rows)


def test_pagerank_mass_and_floor(spark, sf_smoke):
    rows = C.graph_pagerank(spark, sf_smoke).collect()
    n = len(rows)
    base = int(0.15 * C._PR_SCALE)
    assert all(r.rank_scaled >= base for r in rows)
    # floor divisions and dangling nodes only LOSE mass: total rank is
    # bounded by the stationary total n * SCALE
    assert sum(r.rank_scaled for r in rows) <= n * C._PR_SCALE
    # the derived graph is irregular, so ranks must actually differentiate
    assert len({r.rank_scaled for r in rows}) > 1


def test_pagerank_partitioning_invariant(spark, sf_smoke):
    a = sorted(map(tuple, C.graph_pagerank(spark, sf_smoke).collect()))
    import caraspark.curation as cu
    from caraspark import tables as T

    orig = T.load

    def load16(s, sf, name):
        return orig(s, sf, name).repartition(16)

    cu.load = load16
    try:
        b = sorted(map(tuple, C.graph_pagerank(spark, sf_smoke).collect()))
    finally:
        cu.load = orig
    assert a == b


def test_hits_matches_python_recompute(spark, sf_smoke):
    rows = {r.node: r for r in C.graph_hits(spark, sf_smoke).collect()}
    docs = load(spark, sf_smoke, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    nodes = {d.source for d in docs}
    edges = {
        (d.source, f"src{(d.doc_id + d.n_chars) % 20}")
        for d in docs
        if d.source != f"src{(d.doc_id + d.n_chars) % 20}"
        and f"src{(d.doc_id + d.n_chars) % 20}" in nodes
    }
    S = C._HITS_SCALE
    h = {n: S for n in nodes}
    a = {}
    for _ in range(C._HITS_ITERS):
        ar = {n: sum(h[u] for (u, v) in edges if v == n) for n in nodes}
        m = max(max(ar.values()), 1)
        a = {n: ar[n] * S // m for n in nodes}
        hr = {n: sum(a[v] for (u, v) in edges if u == n) for n in nodes}
        m = max(max(hr.values()), 1)
        h = {n: hr[n] * S // m for n in nodes}
    for n in nodes:
        assert rows[n].hub_scaled == h[n], n
        assert rows[n].auth_scaled == a[n], n
    # L-inf normalization pins the best hub and best authority at SCALE
    assert max(r.hub_scaled for r in rows.values()) == S
    assert max(r.auth_scaled for r in rows.values()) == S
    # the derived graph is irregular: scores must differentiate
    assert len({r.auth_scaled for r in rows.values()}) > 1


def test_content_drift_matches_python(spark, sf_smoke):
    rows = {r.url: r for r in C.content_drift(spark, sf_smoke).collect()}
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents").collect()
    }
    w = C._DRIFT_SHINGLE
    classes = set()
    for did, t in docs.items():
        if len(t) < w:
            continue
        v2 = t if did % 5 == 4 else t.replace("table", "desk9")
        s1 = {t[i : i + w] for i in range(len(t) - w + 1)}
        s2 = {v2[i : i + w] for i in range(len(v2) - w + 1)}
        inter, union = len(s1 & s2), len(s1 | s2)
        r = rows[f"https://synth.example/doc/{did}"]
        assert (r.n_inter, r.n_union) == (inter, union), did
        assert abs(r.jaccard - round(inter / union, 6)) < 1e-12
        want_cls = (
            "unchanged"
            if inter == union
            else "minor" if 2 * inter >= union else "major"
        )
        assert r.drift_class == want_cls, did
        classes.add(want_cls)
    assert classes == {"unchanged", "minor", "major"}


def test_content_drift_plan_is_exchange_free(spark, sf_smoke):
    """The whole drift computation is one Project row scope — no
    Exchange, no Window, no Python anywhere in the plan."""
    df = C.content_drift(spark, sf_smoke)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    assert "EvalPython" not in p, p
    assert "Window" not in p, p


def test_content_drift_prefiltered_matches_python(spark, sf_smoke):
    """The production digest-prefiltered lane: only digest-differing
    consecutive fetch pairs appear, and their Jaccard matches a Python
    reference over the same simulated version payloads."""
    rows = {
        (r.url, r.crawl): r
        for r in C.content_drift_prefiltered(spark, sf_smoke).collect()
    }
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents").collect()
    }
    w = C._DRIFT_SHINGLE
    want_keys = set()
    for did, t in docs.items():
        if len(t) < w:
            continue
        period = did % 5 + 1
        url = f"https://synth.example/doc/{did}"

        def payload(crawl):
            v = 0 if period == 5 else crawl // period
            return t if v == 0 else t.replace("table", f"desk{v}")

        for crawl in range(1, 6):
            prev, cur = payload(crawl - 1), payload(crawl)
            if prev == cur:
                continue
            want_keys.add((url, crawl))
            s1 = {prev[i : i + w] for i in range(len(prev) - w + 1)}
            s2 = {cur[i : i + w] for i in range(len(cur) - w + 1)}
            inter, union = len(s1 & s2), len(s1 | s2)
            r = rows[(url, crawl)]
            assert (r.n_inter, r.n_union) == (inter, union), (did, crawl)
            assert abs(r.jaccard - round(inter / union, 6)) < 1e-12
    assert set(rows) == want_keys
    # the prefilter genuinely bites: changed pairs are a strict minority
    # of the 5 consecutive pairs per url (period-5 urls never change,
    # 'table'-free urls digest-dedupe across version bumps)
    n_docs = sum(1 for t in docs.values() if len(t) >= w)
    assert 0 < len(rows) < 5 * n_docs


def test_content_drift_prefiltered_plan_shape(spark, sf_smoke):
    """One url-hash Exchange (the lag window), digest Filter BELOW the
    shingle Project, no Python: the expensive array construction is only
    ever evaluated for digest-differing pairs."""
    df = C.content_drift_prefiltered(spark, sf_smoke)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Window" in p, p
    assert "EvalPython" not in p, p
    # the Filter on the lagged digest must sit between the Window and the
    # shingle projection: shingle exprs (array_distinct/transform) appear
    # only ABOVE the digest-inequality filter in the plan text
    filt = p.index("NOT (digest")
    assert "array_distinct" not in p[filt:], p


def test_text_entropy_matches_python(spark, sf_smoke):
    import math

    rows = {r.doc_id: r for r in C.text_entropy(spark, sf_smoke).collect()}
    docs = {
        r.doc_id: r.text.lower()
        for r in load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    }
    for did in list(docs)[:20]:
        t = docs[did]
        n = len(t)
        ent = sum(
            (t.count(c) / n) * math.log2(n / t.count(c)) for c in sorted(set(t))
        )
        r = rows[did]
        assert r.n_distinct == len(set(t))
        assert abs(r.entropy - ent) < 1e-9
        assert 0.0 < r.entropy < math.log2(r.n_distinct) + 1e-9


def test_doc_chunks_tiling(spark, sf_smoke):
    """Chunk windows must tile each doc: stride-spaced starts, full-size
    interior chunks, correct short tail, text == the token slice."""
    rows = C.doc_chunks(spark, sf_smoke).collect()
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents").collect()
    }
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for did, chunks in by_doc.items():
        toks = docs[did].strip().split()
        chunks.sort(key=lambda r: r.chunk_start)
        assert [c.chunk_start for c in chunks] == list(
            range(0, len(toks), C._CHUNK_STRIDE)
        )
        for c in chunks:
            want = toks[c.chunk_start : c.chunk_start + C._CHUNK_SIZE]
            assert c.chunk_text == " ".join(want)
            assert c.chunk_tokens == len(want)


def test_pack_sequences_capacity(spark, sf_smoke):
    """Within every (lang, shard) stream: seq ids are non-decreasing in
    doc_id order, a sequence only closes once it reached the target, and
    every doc lands in the bin its preceding cumsum dictates."""
    rows = sorted(
        C.pack_sequences(spark, sf_smoke).collect(),
        key=lambda r: (r.lang, r.shard, r.doc_id),
    )
    streams: dict = {}
    for r in rows:
        streams.setdefault((r.lang, r.shard), []).append(r)
    for stream in streams.values():
        cum = 0
        prev_seq = 0
        for r in stream:
            assert r.seq_id == cum // C._PACK_TARGET
            assert r.seq_id >= prev_seq
            prev_seq = r.seq_id
            cum += r.n_tokens


def test_pack_sequences_single_bounded_exchange(spark, sf_smoke):
    """The packing plan must shuffle ONCE, on (lang, shard) — the sharded
    window is the skew story."""
    plan = C.pack_sequences(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "lang" in plan and "shard" in plan


def test_url_features_matches_python_urlparse(spark, sf_smoke):
    from urllib.parse import parse_qsl, urlsplit

    rows = {r.doc_id: r for r in C.url_features(spark, sf_smoke).collect()}
    srcs = {
        r.doc_id: r.source
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", "source")
        .collect()
    }
    for did in list(srcs)[:40]:
        url = (
            ("http://" if did % 3 == 0 else "https://")
            + ("www." if did % 2 == 0 else "")
            + srcs[did]
            + (".org" if did % 4 == 0 else ".com")
            + "/a/b" + "/c" * (did % 3)
            + f"/page{did % 50}"
            + (f"?utm_source=feed&ref={did % 9}" if did % 5 == 0 else "")
        )
        sp = urlsplit(url)
        r = rows[did]
        assert r.scheme == sp.scheme, did
        assert r.host == sp.netloc.removeprefix("www."), did
        assert r.tld == sp.netloc.rsplit(".", 1)[1], did
        assert r.path_depth == len([s for s in sp.path.split("/") if s]), did
        assert r.n_params == len(parse_qsl(sp.query)), did


def test_c4_filter_matches_python(spark, sf_smoke):
    rows = {r.doc_id: r for r in C.text_c4_filter(spark, sf_smoke).collect()}
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for did in list(docs)[:40]:
        t = (
            docs[did]
            + (" lorem ipsum dolor" if did % 11 == 0 else "")
            + (" function() { return 1; }" if did % 13 == 0 else "")
            + (" enable javascript to view" if did % 7 == 0 else "")
            + ". Sentence here" * (did % 5)
            + ("." if did % 2 == 0 else "")
        )
        r = rows[did]
        n_sent = sum(t.count(c) for c in ".!?")
        assert r.n_sentences == n_sent, did
        assert r.ok_braces == ("{" not in t), did
        assert r.ok_lorem == ("lorem ipsum" not in t), did
        assert r.ok_js == (re.search(r"\bjavascript\b", t) is None), did
        assert r.ok_sentences == (n_sent >= 3), did
        assert r.ok_terminal == t.endswith((".", "!", "?")), did
        assert r.keep == (
            r.ok_braces and r.ok_lorem and r.ok_js
            and r.ok_sentences and r.ok_terminal
        ), did
    # the planted triggers must exercise both polarities of every rule
    for col in ("ok_braces", "ok_lorem", "ok_js", "ok_sentences",
                "ok_terminal", "keep"):
        vals = {getattr(r, col) for r in rows.values()}
        assert vals == {True, False}, col


def test_text_rarity_matches_python(spark, sf_smoke):
    from collections import Counter

    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .collect()
        if r.text
    }
    vocab = Counter(w for t in docs.values() for w in t.split(" "))
    total = sum(vocab.values())
    rows = {r.doc_id: r for r in C.text_rarity(spark, sf_smoke).collect()}
    assert set(rows) == set(docs)
    for did, t in list(docs.items())[:40]:
        ws = t.split(" ")
        n_rare = sum(1 for w in ws if vocab[w] * C._RARITY_DEN < total)
        r = rows[did]
        assert r.n_tokens == len(ws), did
        assert r.n_rare == n_rare, did
        assert abs(r.rare_frac - n_rare / len(ws)) < 1e-12, did
    # the threshold must split the corpus (otherwise the signal is vacuous)
    fracs = {r.n_rare > 0 for r in rows.values()}
    assert fracs == {True, False}


def test_crawl_robots_matches_python_longest_match(spark, sf_smoke):
    rows = {r.doc_id: r for r in C.crawl_robots(spark, sf_smoke).collect()}
    docs = {
        r.doc_id: r.source
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", "source")
        .collect()
    }
    assert set(rows) == set(docs)
    for did, src in docs.items():
        n = int(src.removeprefix("src"))
        path = "/a/b" + "/c" * (did % 3) + f"/page{did % 50}"
        rules = [("/", n % 5 == 0), ("/a", n % 3 == 0),
                 ("/a/b/c", n % 2 == 0)]
        matches = [(p, dis) for p, dis in rules if path.startswith(p)]
        # longest prefix wins; allow beats disallow on equal length
        best = max(matches, key=lambda r: (len(r[0]), not r[1]))
        r = rows[did]
        assert r.path == path, did
        assert r.matched_prefix == best[0], did
        assert r.allowed == (not best[1]), did
    # both verdicts occur, and at least one doc is decided by the deep rule
    assert {r.allowed for r in rows.values()} == {True, False}
    assert any(r.matched_prefix == "/a/b/c" for r in rows.values())


def test_crawl_sitemap_roundtrips_every_document(spark, sf_smoke):
    docs = {
        (r.doc_id, r.source)
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", "source")
        .collect()
    }
    rows = C.crawl_sitemap(spark, sf_smoke).collect()
    # one frontier row per document, loc reconstructs the doc identity
    assert len(rows) == len(docs)
    seen = set()
    for r in rows:
        assert r.loc.startswith(f"https://{r.source}.example/p"), r
        did = int(r.loc.rsplit("p", 1)[1])
        assert (did, r.source) in docs, r
        assert r.lastmod_day == did % 28 + 1, r
        assert r.priority_decile == did % 10, r
        seen.add((did, r.source))
    assert seen == docs


def test_dedup_paragraph_both_polarities(spark, sf_smoke):
    """Paragraph 0 (shared header per doc_id%5 class) must always be a
    duplicate; paragraphs 1-3 carry the doc id and must never be."""
    rows = C.dedup_paragraph(spark, sf_smoke).collect()
    assert rows, "corpus too short for planted paragraphs"
    by_class: dict[int, set[str]] = {}
    for r in rows:
        if r.para_idx == 0:
            assert r.dup and r.n_docs > 1, r
            by_class.setdefault(r.doc_id % 5, set()).add(r.para_md5)
        else:
            assert not r.dup and r.n_docs == 1, r
    # one digest per residue class — the header really is shared
    assert all(len(v) == 1 for v in by_class.values()), by_class
    # and distinct classes have distinct headers
    digests = [next(iter(v)) for v in by_class.values()]
    assert len(set(digests)) == len(digests)


def test_dedup_paragraph_matches_python(spark, sf_smoke):
    rows = C.dedup_paragraph(spark, sf_smoke).collect()
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
        if len(r.text) >= 30 * C._PARA_PER_DOC
    }
    expect: dict[tuple[int, int], str] = {}
    counts: dict[str, set[int]] = {}
    for did, text in docs.items():
        for i in range(C._PARA_PER_DOC):
            para = (
                f"shared header {did % C._PARA_SHARED_MOD}"
                if i == 0
                else text[30 * i : 30 * i + 30] + f" p{did}"
            )
            h = hashlib.md5(para.encode()).hexdigest()
            expect[(did, i)] = h
            counts.setdefault(h, set()).add(did)
    assert len(rows) == len(expect)
    for r in rows:
        assert expect[(r.doc_id, r.para_idx)] == r.para_md5, r
        assert r.n_docs == len(counts[r.para_md5]), r


def test_sample_per_host_cap_and_order(spark, sf_smoke):
    rows = C.sample_per_host(spark, sf_smoke).collect()
    docs = [
        (r.doc_id, r.source)
        for r in load(spark, sf_smoke, "documents").select("doc_id", "source").collect()
    ]
    by_host: dict[str, list[int]] = {}
    for did, src in docs:
        by_host.setdefault(src, []).append(did)
    kept: dict[str, list] = {}
    for r in rows:
        kept.setdefault(r.source, []).append(r)
    for src, dids in by_host.items():
        order = sorted(dids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        want = order[: C._HOST_CAP]
        got = sorted(kept.get(src, []), key=lambda r: r.rk)
        assert [r.doc_id for r in got] == want, src
        assert [r.rk for r in got] == list(range(1, len(want) + 1)), src


def test_search_bm25_matches_python(spark, sf_smoke):
    rows = {(r.doc_id, r.term): r for r in C.search_bm25(spark, sf_smoke).collect()}
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
        if len(r.text) > 0
    }
    n = len(docs)
    a = sum(len(t) for t in docs.values())
    for term in C._BM25_TERMS:
        df = sum(1 for t in docs.values() if term in t)
        for did, toks in docs.items():
            tf, dl = toks.count(term), len(toks)
            if tf == 0:
                assert (did, term) not in rows
                continue
            r = rows[(did, term)]
            assert (r.tf, r.dl, r.df) == (tf, dl, df), r
            score = round(
                44 * a * tf * (2 * n - 2 * df + 1)
                / ((20 * a * tf + 6 * a + 18 * dl * n) * (2 * df + 1)),
                6,
            )
            assert abs(r.score - score) < 1e-9, (r, score)


def test_search_bm25_monotone_in_tf(spark, sf_smoke):
    """Within one term at fixed dl, more occurrences never score lower —
    the saturation form is increasing in tf."""
    rows = C.search_bm25(spark, sf_smoke).collect()
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r.term, []).append(r)
    checked = 0
    for rs in by_term.values():
        by_dl: dict[int, list] = {}
        for r in rs:
            by_dl.setdefault(r.dl, []).append(r)
        for group in by_dl.values():
            group.sort(key=lambda r: r.tf)
            for lo, hi in zip(group, group[1:]):
                if hi.tf > lo.tf:
                    assert hi.score >= lo.score, (lo, hi)
                    checked += 1
    assert checked > 0


def test_text_script_matches_python(spark, sf_smoke):
    import unicodedata  # noqa: F401 — regex module unavailable; count directly

    rows = {r.doc_id: r for r in C.text_script(spark, sf_smoke).collect()}
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    }
    assert set(rows) == set(docs)
    for did in list(docs)[:40]:
        t = docs[did][:60] + "ж" * (did % 5) + "中" * (did % 3) + "λ" * (did % 2)
        n_lat = sum(1 for ch in t if ("a" <= ch <= "z") or ("A" <= ch <= "Z"))
        n_cyr = t.count("ж")
        n_han = t.count("中")
        n_grk = t.count("λ")
        r = rows[did]
        assert (r.n_latin, r.n_cyrillic, r.n_han, r.n_greek) == (
            n_lat, n_cyr, n_han, n_grk), did
        mx = max(n_lat, n_cyr, n_han, n_grk)
        want = ("cyrillic" if n_cyr == mx else
                "greek" if n_grk == mx else
                "han" if n_han == mx else "latin")
        assert r.main_script == want, did
        tot = max(n_lat + n_cyr + n_han + n_grk, 1)
        assert abs(r.nonlatin_frac - round((n_cyr + n_han + n_grk) / tot, 6)) < 1e-9


def _winnow_py(s: str, k: int = 5, w: int = 4):
    """Textbook winnowing (Schleimer et al. Fig. 5 semantics, rightmost
    min on ties) — the third implementation beside Spark and DuckDB."""
    n = min(len(s) - k + 1, 4095)
    hs = [
        int(hashlib.md5(s[i:i + k].encode()).hexdigest()[:12], 16)
        for i in range(n)
    ]
    sel = set()
    for p in range(0, n - w + 1):
        window = hs[p:p + w]
        m = min(window)
        idx = p + max(i for i in range(w) if window[i] == m)
        sel.add((idx + 1, hs[idx]))  # 1-based positions, as in the qkey
    return n, sel


def test_fingerprint_winnow_matches_python(spark, sf_smoke):
    rows = {r.doc_id: r for r in C.fingerprint_winnow(spark, sf_smoke).collect()}
    docs = load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    checked = 0
    for d in docs:
        s = re.sub(r"[^a-z0-9]", "", d.text.lower())
        if len(s) < C._WINNOW_K + C._WINNOW_W - 1:
            assert d.doc_id not in rows
            continue
        n, sel = _winnow_py(s, C._WINNOW_K, C._WINNOW_W)
        r = rows[d.doc_id]
        assert r.n_grams == n, d.doc_id
        assert r.n_selected == len(sel), d.doc_id
        joined = ",".join(
            f"{pos}:{h}" for pos, h in sorted(sel)
        )
        assert r.fp_sig == hashlib.md5(joined.encode()).hexdigest(), d.doc_id
        # 5e-7: Spark rounds HALF_UP, Python rounds half-even (matters on
        # exact ties like 49/128) — the DuckDB oracle pins the exact value
        assert abs(r.sel_density - len(sel) / n) <= 6e-7
        checked += 1
    assert checked >= 40  # nearly every smoke doc exercises the operator


def test_fingerprint_winnow_density_bounds(spark, sf_smoke):
    # every w-window selects >=1 print and a print can't repeat within a
    # window, so density lives in [1/w, 1]; expectation is 2/(w+1)
    for r in C.fingerprint_winnow(spark, sf_smoke).collect():
        assert 1.0 / C._WINNOW_W <= r.sel_density <= 1.0


def test_winnow_xxh_same_plan_no_md5_per_gram(spark, sf_smoke):
    """hash_fn='xxh' (the production lane) must keep the qkey's plan-shape
    contract — single scan, window-only exchange, no join — while one
    xxhash64 per gram replaces the md5 digest + hex slice + conv() base
    parse (the only md5 left is the once-per-doc fp_sig aggregate)."""
    import contextlib
    import io

    df = C.winnow_fingerprints(load(spark, sf_smoke, "documents"), hash_fn="xxh")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    p = buf.getvalue()
    assert p.count("Scan parquet") == 1, p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p, p
    assert "xxhash64" in p, p
    assert "conv(" not in p, p


def test_winnow_xxh_identical_docs_same_fingerprint(spark):
    """Identical normalized texts winnow to identical (pos, hash) sets
    under ANY hash family — the xxh lane must give them equal fp_sig and
    the unrelated doc a different one; density bounds hold per doc."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 6),
        (2, "The Quick Brown Fox! jumps over the lazy dog " * 6),
        (3, "completely different content about spark shuffles " * 6),
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in C.winnow_fingerprints(d, hash_fn="xxh").collect()}
    assert got[1].fp_sig == got[2].fp_sig  # normalization strips case/punct
    assert got[3].fp_sig != got[1].fp_sig
    for r in got.values():
        assert 1.0 / C._WINNOW_W <= r.sel_density <= 1.0


def _grams3_py(text: str):
    w = text.lower().split(" ")
    return {
        hashlib.md5(" ".join(w[i:i + 3]).encode()).hexdigest()
        for i in range(min(len(w) - 2, 4095))
    }


def test_decontaminate_bloom_matches_python(spark, sf_smoke):
    rows = {r.doc_id: r for r in C.decontaminate_bloom(spark, sf_smoke).collect()}
    docs = load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    bench = set()
    for d in docs:
        if d.doc_id % 97 == 0 and len(d.text.split(" ")) >= 3:
            bench |= _grams3_py(d.text)
    bits = {
        int(hashlib.md5(f"{gh}:{j}".encode()).hexdigest()[:12], 16) % C._BLOOM_M
        for gh in bench
        for j in range(C._BLOOM_K)
    }
    for d in docs:
        if d.doc_id % 97 == 0 or len(d.text.split(" ")) < 3:
            assert d.doc_id not in rows
            continue
        gset = _grams3_py(d.text)
        n_bloom = sum(
            1
            for gh in gset
            if all(
                int(hashlib.md5(f"{gh}:{j}".encode()).hexdigest()[:12], 16)
                % C._BLOOM_M
                in bits
                for j in range(C._BLOOM_K)
            )
        )
        n_exact = len(gset & bench)
        r = rows[d.doc_id]
        assert r.n_grams == len(gset), d.doc_id
        assert r.n_hits_bloom == n_bloom, d.doc_id
        assert r.n_hits_exact == n_exact, d.doc_id
        assert r.n_false_pos == n_bloom - n_exact, d.doc_id


def test_decontaminate_bloom_no_false_negatives(spark, sf_smoke):
    for r in C.decontaminate_bloom(spark, sf_smoke).collect():
        assert r.n_hits_exact <= r.n_hits_bloom
        assert (not r.contaminated) or r.bloom_flag


def test_crawl_frontier_budget_politeness_order(spark, sf_smoke):
    rows = C.crawl_frontier(spark, sf_smoke).collect()
    assert rows
    by_host: dict = {}
    for r in rows:
        assert r.doc_id % 7 != 0  # politeness gate
        assert 1 <= r.rk <= C._FRONTIER_BUDGET
        assert r.priority == r.host_docs * 10 - r.depth * 25 + r.doc_id % 50
        by_host.setdefault(r.source, []).append(r)
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1)), host
        pris = [(r.priority, -r.doc_id) for r in rs]
        assert pris == sorted(pris, reverse=True), host


def test_text_surprisal_matches_python(spark, sf_smoke):
    rows = {r.doc_id: r for r in C.text_surprisal(spark, sf_smoke).collect()}
    docs = load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    counts: dict = {}
    for d in docs:
        if d.text:
            for w in d.text.lower().split(" "):
                counts[w] = counts.get(w, 0) + 1
    n = sum(counts.values())
    for d in docs:
        if not d.text:
            assert d.doc_id not in rows
            continue
        toks = d.text.lower().split(" ")
        bits = sum((n // counts[w]).bit_length() - 1 for w in toks)
        r = rows[d.doc_id]
        assert r.n_tokens == len(toks), d.doc_id
        assert r.total_bits == bits, d.doc_id
        assert abs(r.bits_per_token - bits / len(toks)) <= 6e-7, d.doc_id


def test_text_surprisal_rare_scores_higher(spark, sf_smoke):
    # a doc's mean surprisal orders with its rare-token fraction by
    # construction of the signal; check the extremes are consistent
    srows = {r.doc_id: r.bits_per_token
             for r in C.text_surprisal(spark, sf_smoke).collect()}
    assert max(srows.values()) > min(srows.values())  # signal is non-flat
    for v in srows.values():
        assert v >= 0.0


def test_quality_logit_matches_python(spark, sf_smoke):
    rows = {r.doc_id: r for r in C.quality_logit(spark, sf_smoke).collect()}
    docs = load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    for d in docs:
        if not d.text:
            assert d.doc_id not in rows
            continue
        toks = d.text.split(" ")
        n_tok = len(toks)
        stop_cnt = sum(1 for w in d.text.lower().split(" ") if w in C._GOPHER_STOP)
        n_digit = sum(c.isdigit() for c in d.text)
        n_upper = sum("A" <= c <= "Z" for c in d.text)
        n_long = sum(len(w) > 12 for w in toks)
        length = len(d.text)
        stop_m = stop_cnt * 1000 // n_tok
        digit_m = n_digit * 1000 // length
        upper_m = n_upper * 1000 // length
        score = 6 * stop_m - 4 * digit_m - 3 * upper_m - 40 * n_long + n_tok
        r = rows[d.doc_id]
        assert (r.n_tok, r.stop_m, r.digit_m, r.upper_m, r.n_long) == (
            n_tok, stop_m, digit_m, upper_m, n_long,
        ), d.doc_id
        assert r.score == score, d.doc_id
        assert r.keep == (score >= C._QL_THRESH), d.doc_id


def test_quality_logit_splits_the_corpus(spark, sf_smoke):
    rows = C.quality_logit(spark, sf_smoke).collect()
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)  # the threshold is load-bearing


def _unigram_counts(texts):
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split(" "):
            counts[w] = counts.get(w, 0) + 1
    return counts


def test_sample_dsir_matches_python(spark, sf_smoke):
    docs = load(spark, sf_smoke, "documents").select(
        "doc_id", "text", "lang"
    ).collect()
    texts = [d.text for d in docs if d.text]
    raw = _unigram_counts(texts)
    tgt = _unigram_counts([d.text for d in docs if d.text and d.lang == "en"])
    n_raw = sum(raw.values())
    n_tgt = sum(tgt.values())
    v = len(raw)
    rows = {r.doc_id: r for r in C.sample_dsir(spark, sf_smoke).collect()}
    perdoc = {}
    for d in docs:
        if not d.text:
            assert d.doc_id not in rows
            continue
        toks = d.text.lower().split(" ")
        rb = sum((n_raw // raw[w]).bit_length() - 1 for w in toks)
        tb = sum(
            ((n_tgt + v) // (tgt.get(w, 0) + 1)).bit_length() - 1 for w in toks
        )
        r = rows[d.doc_id]
        assert (r.n_tokens, r.raw_bits, r.tgt_bits) == (len(toks), rb, tb), d.doc_id
        assert r.weight_bits == rb - tb, d.doc_id
        assert r.shard == d.doc_id % C._DSIR_SHARDS, d.doc_id
        perdoc.setdefault(r.shard, []).append((r.weight_bits, r.doc_id, r.rk, r.keep))
    # per-shard rank = position under (weight DESC, doc_id ASC); keep = top CAP
    for shard, entries in perdoc.items():
        entries.sort(key=lambda e: (-e[0], e[1]))
        for want_rk, (_, did, got_rk, keep) in enumerate(entries, start=1):
            assert got_rk == want_rk, (shard, did)
            assert keep == (want_rk <= C._DSIR_CAP), (shard, did)


def test_lm_bigram_matches_python(spark, sf_smoke):
    docs = load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    c12: dict[str, int] = {}
    c1: dict[str, int] = {}
    grams = {}
    for d in docs:
        if not d.text:
            continue
        a = d.text.lower().split(" ")
        bg = [f"{a[i]} {a[i+1]}" for i in range(len(a) - 1)]
        if not bg:
            continue
        grams[d.doc_id] = bg
        for b in bg:
            c12[b] = c12.get(b, 0) + 1
            c1[b.split(" ")[0]] = c1.get(b.split(" ")[0], 0) + 1
    rows = {r.doc_id: r for r in C.lm_bigram(spark, sf_smoke).collect()}
    assert set(rows) == set(grams)
    for did, bg in grams.items():
        bits = sum((c1[b.split(" ")[0]] // c12[b]).bit_length() - 1 for b in bg)
        r = rows[did]
        assert r.n_bigrams == len(bg), did
        assert r.total_bits == bits, did
        assert abs(r.bits_per_bigram - bits / len(bg)) <= 6e-7, did


def test_search_postings_matches_python(spark, sf_smoke):
    docs = load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    tf: dict[str, dict[int, int]] = {}
    pat = re.compile(r"^[a-z]+$")
    for d in docs:
        if not d.text:
            continue
        for w in d.text.lower().split(" "):
            if len(w) >= 3 and pat.match(w):
                tf.setdefault(w, {}).setdefault(d.doc_id, 0)
                tf[w][d.doc_id] += 1
    rows = {r.term: r for r in C.search_postings(spark, sf_smoke).collect()}
    assert set(rows) == set(tf)
    for w, per in tf.items():
        r = rows[w]
        assert r.df == len(per), w
        assert r.tf_total == sum(per.values()), w
        head = ",".join(str(i) for i in sorted(per)[: C._POSTINGS_HEAD])
        assert r.head == head, w


def test_graph_hostgraph_matches_python(spark, sf_smoke):
    docs = load(spark, sf_smoke, "documents").select("doc_id", "source").collect()
    edges: dict[tuple, int] = {}
    for d in docs:
        for k in range(3):
            dst = f"src{(d.doc_id + k * 3) % 20}"
            edges[(d.source, dst)] = edges.get((d.source, dst), 0) + 1
    rows = {(r.src_host, r.dst_host): r for r in C.graph_hostgraph(spark, sf_smoke).collect()}
    assert set(rows) == set(edges)
    for key, n in edges.items():
        assert rows[key].n_links == n, key
        assert rows[key].self_loop == (key[0] == key[1]), key
    assert any(r.self_loop for r in rows.values())  # self-loops exercised


def test_readability_matches_python_re(spark, sf_smoke):
    rows = {r.doc_id: r for r in C.text_readability(spark, sf_smoke).collect()}
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert len(rows) == len(docs)
    for did in list(docs)[:40]:
        t = docs[did] + ". Short sentence here" * (did % 5) + "."
        n_w = len(re.findall(C._RE_READ_WORD, t))
        n_sy = len(re.findall(C._RE_READ_SYL, t))
        n_se = len(re.findall(C._RE_READ_SENT, t))
        flesch = 206835 - (1015 * n_w) // n_se - (84600 * n_sy) // n_w
        r = rows[did]
        assert (r.n_words, r.n_syllables, r.n_sentences) == (n_w, n_sy, n_se)
        assert r.flesch_milli == flesch, did
        assert r.readable == (flesch >= 60000)


def test_normalize_matches_python(spark, sf_smoke):
    rows = {r.doc_id: r for r in C.text_normalize(spark, sf_smoke).collect()}
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .collect()
    }
    plant = [
        " “quoted” text",
        " — em–dash ‘x’",
        " wait… more",
        "\xa0nbsp\xa0run",
    ]
    import hashlib

    for did in list(docs)[:40]:
        t = docs[did][:80] + plant[did % 4]
        n_special = sum(t.count(c) for c, _ in C._NORM_PAIRS)
        norm = t
        for a, b in C._NORM_PAIRS:
            norm = norm.replace(a, b)
        r = rows[did]
        assert r.n_special == n_special, did
        assert r.norm_md5 == hashlib.md5(norm.encode()).hexdigest(), did
        # the normalized text is pure-ASCII by construction
        norm.encode("ascii")


def test_url_resolve_matches_python_urljoin(spark, sf_smoke):
    """Third implementation: every resolution class must agree with
    urllib's RFC 3986 resolver (fragments stripped on both sides)."""
    from urllib.parse import urldefrag, urljoin

    rows = {r.doc_id: r for r in C.url_resolve(spark, sf_smoke).collect()}
    for did, r in sorted(rows.items())[:60]:
        want = urldefrag(urljoin(r.base, r.href))[0]
        assert r.abs_url == want, (did, r.base, r.href, r.abs_url, want)


def test_text_dup_lines_matches_python(spark, sf_smoke):
    """Third implementation of the Gopher line-repetition fractions."""
    rows = {r.doc_id: r for r in C.text_dup_lines(spark, sf_smoke).collect()}
    for did, r in sorted(rows.items())[:40]:
        lines = [f"u{did} alpha line", f"u{did} beta line",
                 "subscribe to our newsletter today"]
        if did % 3 == 0:
            lines.append("subscribe to our newsletter today")
        if did % 5 == 0:
            lines.append(f"u{did} alpha line")
        n, nd = len(lines), len(dict.fromkeys(lines))
        tc = sum(map(len, lines))
        dc = sum(map(len, dict.fromkeys(lines)))
        assert (r.n_lines, r.n_dup_lines) == (n, n - nd), did
        assert r.dup_line_permille == (n - nd) * 1000 // n, did
        assert r.dup_char_permille == (tc - dc) * 1000 // tc, did


def test_text_dup_lines_is_narrow_jvm(spark, sf_smoke):
    p = (
        C.text_dup_lines(spark, sf_smoke)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p and "EvalPython" not in p, p


def test_url_resolve_property_differential_vs_urljoin(spark, sf_smoke):
    """Hypothesis differential: random relative references (segments,
    ./ and ../ mixes within the 4-level normalization bound, queries,
    fragments) must resolve exactly as urllib does."""
    from urllib.parse import urldefrag, urljoin

    from hypothesis import given, settings, strategies as st

    from caraspark.curation import resolve_url
    from pyspark.sql import functions as F

    seg = st.sampled_from(["a", "bb", "c.d", "x1", "img"])
    piece = st.one_of(seg, st.just("."), st.just(".."))

    @settings(max_examples=60, deadline=None)
    @given(
        # no empty segments: "//" inside a relative path is out of
        # contract (urllib itself deviates from RFC 3986 §5.2.4 there)
        st.lists(piece, min_size=0, max_size=4),
        st.sampled_from(["p.html", "p.html?q=1", "p#frag", "q2.txt"]),
        st.sampled_from(["https://h.example/d1/d2/page.html",
                         "https://h.example/",
                         "http://h2.example/a/b/c/d.html?base=1"]),
    )
    def check(pieces, tail, base):
        href = "/".join(pieces + [tail])
        # ../ depth beyond the engine's documented 4-pass bound is out of
        # contract; the strategy caps nesting at 4 by construction
        want = urldefrag(urljoin(base, href))[0]
        got = (
            spark.range(1)
            .select(resolve_url(F.lit(base), F.lit(href)).alias("u"))
            .collect()[0]["u"]
        )
        assert got == want, (base, href, got, want)

    check()


def test_robots_match_property_differential(spark):
    """Hypothesis differential for the longest-match/allow-wins verdict:
    random rule stacks (duplicate prefixes with conflicting polarity
    included) against random paths must agree with a direct Python
    implementation of the REP semantics."""
    from hypothesis import given, settings, strategies as st

    from caraspark.curation import robots_match

    prefix = st.sampled_from(["/", "/a", "/a/", "/a/b", "/a/bb", "/ab", "/b"])
    rule = st.tuples(prefix, st.booleans())
    path = st.sampled_from(
        ["/", "/a", "/a/b", "/a/bb/c", "/ab/x", "/b/y", "/c"]
    )

    @settings(max_examples=25, deadline=None)
    @given(st.lists(rule, min_size=1, max_size=6, unique=True),
           st.lists(path, min_size=1, max_size=4, unique=True))
    def check(rules, paths):
        urls = spark.createDataFrame(
            [(i, "h", p) for i, p in enumerate(paths)],
            "doc_id long, source string, path string",
        )
        rdf = spark.createDataFrame(
            [("h", pre, dis) for pre, dis in rules],
            "source string, prefix string, disallow boolean",
        )
        got = {
            (r.doc_id, r.path): (r.matched_prefix, r.allowed)
            for r in robots_match(urls, rdf).collect()
        }
        want = {}
        for i, p in enumerate(paths):
            matches = [(pre, dis) for pre, dis in rules if p.startswith(pre)]
            if not matches:
                continue
            # REP: longest wins; allow wins ties; deterministic final
            # tie-break on the prefix string (mirrors the struct max)
            pre, dis = max(
                matches, key=lambda m: (len(m[0]), not m[1], m[0])
            )
            want[(i, p)] = (pre, not dis)
        assert got == want, (rules, paths, got, want)

    check()


def test_assemble_series_edge_matrix(spark):
    """Pointer doubling: chain positions, lone/frontier heads,
    deterministic min-parent pick on contested next targets, and
    rel=next cycles resolving to NULL instead of looping."""
    rows = [("a0", "a1"), ("a1", "a2"), ("a2", "a3"), ("a3", None),
            ("b0", "b1"), ("b1", None), ("c", None),
            ("x", "y"), ("y", "x"),
            ("m1", "t"), ("m2", "t"), ("t", None),
            ("f", "outside-corpus")]
    df = spark.createDataFrame(rows, "url string, next_url string")
    got = {r.url: (r.series_id, r.pos) for r in C.assemble_series(df).collect()}
    assert got == {
        "a0": ("a0", 0), "a1": ("a0", 1), "a2": ("a0", 2), "a3": ("a0", 3),
        "b0": ("b0", 0), "b1": ("b0", 1),
        "c": ("c", 0),
        "f": ("f", 0),                      # next outside corpus: frontier
        "m1": ("m1", 0), "m2": ("m2", 0),   # contested target:
        "t": ("m1", 1),                     #   min parent wins
        "x": (None, None), "y": (None, None),  # cycle: never a head
    }


def test_parse_sitemap_edges(spark):
    """urlset vs sitemapindex routing, loc trimming, optional lastmod,
    loc-less entries ('' not NULL), entry order, and the outer-explode
    row for an empty sitemap (NULL pos — the doc stays visible)."""
    rows = [
        ("a", "<urlset><url><loc> https://x/1 </loc></url>"
              "<url><lastmod>2026-01-02</lastmod></url>"
              "<url><loc>https://x/3</loc>"
              "<lastmod> 2026-01-03 </lastmod></url></urlset>"),
        ("b", "<sitemapindex><sitemap><loc>https://x/sm1.xml</loc>"
              "</sitemap></sitemapindex>"),
        ("c", "<urlset></urlset>"),
    ]
    df = spark.createDataFrame(rows, "url string, xml string")
    got = [tuple(r) for r in
           C.parse_sitemap(df).orderBy("url", "pos").collect()]
    assert got == [
        ("a", 0, "url", "https://x/1", None),
        ("a", 1, "url", "", "2026-01-02"),
        ("a", 2, "url", "https://x/3", "2026-01-03"),
        ("b", 0, "sitemap", "https://x/sm1.xml", None),
        ("c", None, "url", None, None),
    ]


def test_parse_feed_edges(spark):
    """RSS vs Atom routing, CDATA title unwrap, attribute vs text links,
    missing-field defaults ('' title/link, NULL ts), and the outer row
    for an entry-less feed."""
    rows = [
        ("r", "<rss><channel><title>chan</title><link>https://c</link>"
              "<item><title><![CDATA[Hello & Co]]></title>"
              "<link> https://c/1 </link>"
              "<pubDate>Mon, 01 Aug 2026 00:00:00 GMT</pubDate></item>"
              "<item><link>https://c/2</link></item>"
              "</channel></rss>"),
        ("a", "<feed><title>site</title>"
              "<entry><title>First</title>"
              "<link rel='alternate' href='https://a/1'/>"
              "<updated>2026-08-01T00:00:00Z</updated></entry>"
              "<entry><title>NoLink</title></entry></feed>"),
        ("e", "<rss><channel><title>empty</title></channel></rss>"),
    ]
    df = spark.createDataFrame(rows, "url string, xml string")
    got = [tuple(r) for r in
           C.parse_feed(df).orderBy("url", "pos").collect()]
    assert got == [
        ("a", 0, "atom", "First", "https://a/1", "2026-08-01T00:00:00Z"),
        ("a", 1, "atom", "NoLink", "", None),
        ("e", None, "rss", None, None, None),
        ("r", 0, "rss", "Hello & Co", "https://c/1",
         "Mon, 01 Aug 2026 00:00:00 GMT"),
        ("r", 1, "rss", "", "https://c/2", None),
    ]


def _py_parse_feed(url, xml):
    """Independent reference for parse_feed's documented semantics (kind
    sniff, first-closing-tag blocks, CDATA unwrap, first-href atom link,
    ""-vs-NULL field contract)."""
    kind = "atom" if "<feed" in xml else "rss"
    pat = (r"(?s)<entry\b[^>]*>(.*?)</entry>" if kind == "atom"
           else r"(?s)<item\b[^>]*>(.*?)</item>")
    blocks = re.findall(pat, xml)
    if not blocks:
        return [(url, None, kind, None, None, None)]
    rows = []
    for pos, b in enumerate(blocks):
        m = re.search(r"(?s)<title[^>]*>(.*?)</title>", b)
        t = (m.group(1) if m else "").strip(" ")
        mc = re.match(r"(?s)^<!\[CDATA\[(.*)\]\]>$", t)
        if mc:
            t = mc.group(1).strip(" ")
        if kind == "atom":
            ml = re.search(r"<link\b[^>]*?href\s*=\s*[\"']([^\"']*)", b)
            link = ml.group(1) if ml else ""
            mt = re.search(r"(?s)<updated[^>]*>\s*(.*?)\s*</updated>", b)
        else:
            ml = re.search(r"(?s)<link[^>]*>(.*?)</link>", b)
            link = (ml.group(1) if ml else "").strip(" ")
            mt = re.search(r"(?s)<pubDate[^>]*>\s*(.*?)\s*</pubDate>", b)
        ts = mt.group(1) if mt else ""
        rows.append((url, pos, kind, t, link, ts or None))
    return rows


def test_parse_feed_property_differential(spark):
    """Hypothesis differential: random hostile feeds — CDATA shells,
    attribute-bearing tags, hrefless decoy links ahead of the real one,
    junk elements between fields, missing titles/links/stamps, both
    quote styles — must parse exactly as an independent Python
    implementation of the documented semantics says."""
    from hypothesis import given, settings, strategies as st

    title_st = st.one_of(
        st.none(),
        st.sampled_from(["T one", "x &amp; y", "  padded  ", "", "a]]x"]),
    )
    entry_st = st.fixed_dictionaries({
        "title": title_st,
        "cdata": st.booleans(),
        "tattr": st.booleans(),
        "link": st.one_of(st.none(),
                          st.sampled_from(["https://h/a", "/rel/1", ""])),
        "decoy": st.booleans(),
        "quote": st.sampled_from(['"', "'"]),
        "ts": st.one_of(st.none(),
                        st.sampled_from(["2026-08-01T00:00:00Z",
                                         "  padded ts  "])),
        "junk": st.sampled_from(["", "\n  ", "<guid>g</guid>",
                                 "plain text"]),
    })
    doc_st = st.tuples(st.sampled_from(["atom", "rss"]),
                       st.lists(entry_st, min_size=0, max_size=3))

    def render(kind, entries):
        out = []
        for e in entries:
            t = ""
            if e["title"] is not None:
                body = e["title"]
                if e["cdata"]:
                    body = f"<![CDATA[{body}]]>"
                attr = ' type="text"' if e["tattr"] else ""
                t = f"<title{attr}>{body}</title>"
            if kind == "atom":
                link = '<link rel="self"/>' if e["decoy"] else ""
                if e["link"] is not None:
                    q = e["quote"]
                    link += f"<link rel={q}alternate{q} href={q}{e['link']}{q}/>"
                ts = (f"<updated>{e['ts']}</updated>"
                      if e["ts"] is not None else "")
                out.append(f"<entry>{e['junk']}{t}{link}{ts}</entry>")
            else:
                link = (f"<link>{e['link']}</link>"
                        if e["link"] is not None else "")
                ts = (f"<pubDate>{e['ts']}</pubDate>"
                      if e["ts"] is not None else "")
                out.append(f"<item>{t}{e['junk']}{link}{ts}</item>")
        inner = "\n".join(out)
        if kind == "atom":
            return f'<feed xmlns="http://www.w3.org/2005/Atom">{inner}</feed>'
        return f"<rss><channel><title>ch</title>{inner}</channel></rss>"

    @settings(max_examples=20, deadline=None)
    @given(st.lists(doc_st, min_size=1, max_size=3))
    def check(docs):
        rows = [(str(i), render(k, es)) for i, (k, es) in enumerate(docs)]
        df = spark.createDataFrame(rows, "url string, xml string")
        got = sorted(
            tuple(r) for r in C.parse_feed(df).collect()
        )
        want = sorted(
            row for url, xml in rows for row in _py_parse_feed(url, xml)
        )
        assert got == want, (rows, got, want)

    check()


def _py_parse_sitemap(url, xml):
    """Independent reference for parse_sitemap's documented semantics."""
    kind = "sitemap" if "<sitemapindex" in xml else "url"
    pat = (r"(?s)<sitemap>(.*?)</sitemap>" if kind == "sitemap"
           else r"(?s)<url>(.*?)</url>")
    blocks = re.findall(pat, xml)
    if not blocks:
        return [(url, None, kind, None, None)]
    rows = []
    for pos, b in enumerate(blocks):
        ml = re.search(r"(?s)<loc>\s*(.*?)\s*</loc>", b)
        loc = ml.group(1) if ml else ""
        mm = re.search(r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", b)
        lm = mm.group(1) if mm else ""
        rows.append((url, pos, kind, loc, lm or None))
    return rows


def test_parse_sitemap_property_differential(spark):
    """Hypothesis differential for parse_sitemap: random urlset /
    sitemapindex docs with padded or missing <loc>, optional <lastmod>,
    decoy children (priority/changefreq) and inter-entry junk must
    agree with the independent Python reference."""
    from hypothesis import given, settings, strategies as st

    entry_st = st.fixed_dictionaries({
        "loc": st.one_of(st.none(),
                         st.sampled_from(["https://s/x", "  /pad  ", ""])),
        "lastmod": st.one_of(st.none(),
                             st.sampled_from(["2026-08-19",
                                              " 2026-01-01 "])),
        "junk": st.sampled_from(["", "<priority>0.5</priority>",
                                 "<changefreq>daily</changefreq>", "\n "]),
    })
    doc_st = st.tuples(st.sampled_from(["url", "sitemap"]),
                       st.lists(entry_st, min_size=0, max_size=3))

    def render(kind, entries):
        tag = "sitemap" if kind == "sitemap" else "url"
        root = "sitemapindex" if kind == "sitemap" else "urlset"
        out = []
        for e in entries:
            loc = (f"<loc>{e['loc']}</loc>" if e["loc"] is not None else "")
            lm = (f"<lastmod>{e['lastmod']}</lastmod>"
                  if e["lastmod"] is not None else "")
            out.append(f"<{tag}>{loc}{e['junk']}{lm}</{tag}>")
        return (f'<{root} xmlns="http://www.sitemaps.org/schemas/'
                f'sitemap/0.9">{"".join(out)}</{root}>')

    @settings(max_examples=20, deadline=None)
    @given(st.lists(doc_st, min_size=1, max_size=3))
    def check(docs):
        rows = [(str(i), render(k, es)) for i, (k, es) in enumerate(docs)]
        df = spark.createDataFrame(rows, "url string, xml string")
        got = sorted(tuple(r) for r in C.parse_sitemap(df).collect())
        want = sorted(
            row for url, xml in rows for row in _py_parse_sitemap(url, xml)
        )
        assert got == want, (rows, got, want)

    check()


def test_assemble_series_property_differential(spark):
    """Hypothesis differential: random next-edge functions (self-loops,
    cycles, contested targets, frontier edges to pages outside the
    corpus, None) must label every page exactly as a direct Python walk
    of the documented semantics — min-parent attach, head = no attached
    parent, cycle → NULL."""
    from hypothesis import given, settings, strategies as st

    pages = [f"p{i}" for i in range(6)]
    nxt = st.one_of(st.none(), st.sampled_from(pages + ["https://ext/x"]))

    @settings(max_examples=8, deadline=None)
    @given(st.tuples(*[nxt] * 6))
    def check(nexts):
        rows = list(zip(pages, nexts))
        df = spark.createDataFrame(rows, "url string, next_url string")
        got = {
            r.url: (r.series_id, r.pos)
            for r in C.assemble_series(df).collect()
        }
        # reference: attach v to min(u) over edges u->v with v a page
        par = {}
        for u, n in rows:
            if n in pages:
                par[n] = min(par[n], u) if n in par else u
        want = {}
        for p in pages:
            v, d, seen = p, 0, set()
            while v in par and v not in seen:
                seen.add(v)
                v, d = par[v], d + 1
            if v in seen:  # walked into a cycle: never reached a head
                want[p] = (None, None)
            else:
                want[p] = (v, d)
        assert got == want, (rows, got, want)

    check()


def test_resolve_redirects_edges(spark):
    """Chain, 2-cycle, crawl-exit, plain page, and a 404 whose Location
    must NOT be followed (only 3xx statuses are redirect edges)."""
    rows = [
        ("a", 301, "b"),      # head of a 2-hop chain
        ("b", 307, "c"),      # mid (307 pins the status set)
        ("c", 200, None),     # landing page
        ("d", 302, "e"),      # 2-cycle
        ("e", 308, "d"),
        ("f", 301, "ext"),    # target never fetched
        ("g", 200, None),     # plain page
        ("h", 404, "x"),      # non-3xx Location is not an edge
    ]
    df = spark.createDataFrame(
        rows, "url string, status int, location string"
    )
    got = {
        r.url: (r.final_url, r.hops, r.kind, r.final_in_crawl)
        for r in C.resolve_redirects(df, max_hops=4).collect()
    }
    assert got == {
        "a": ("c", 2, "resolved", True),
        "b": ("c", 1, "resolved", True),
        "c": ("c", 0, "ok", True),
        "d": ("d", 4, "unresolved", True),   # d->e->d->e->d
        "e": ("e", 4, "unresolved", True),
        "f": ("ext", 1, "resolved", False),
        "g": ("g", 0, "ok", True),
        "h": ("h", 0, "ok", True),
    }, got


def test_extract_pubdate_precedence(spark):
    """meta > time > url; full-timestamp meta takes the date prefix;
    silent pages stay double-NULL; a dateless path never fires."""
    meta = ('<meta property="article:published_time" '
            'content="2021-03-04T10:00:00Z">')
    ttag = '<time datetime="2019-08-09">then</time>'
    rows = [
        ("https://e/2015/06/p", meta + ttag),   # all three present
        ("https://e/2015/06/p", ttag),          # time beats url
        ("https://e/2015/06/p", "<p>x</p>"),    # url only
        ("https://e/post-9", "<p>x</p>"),       # silent
    ]
    df = spark.createDataFrame(rows, "url string, html_s string")
    got = [
        (r.pub_source, str(r.pub_date) if r.pub_date else None)
        for r in C.extract_pubdate(df).collect()
    ]
    assert got == [
        ("meta", "2021-03-04"),
        ("time", "2019-08-09"),
        ("url", "2015-06-01"),
        (None, None),
    ], got


def test_block_density_edges(spark):
    """Empty/tag-only blocks (permille guard divides by max(text,1)),
    multi-anchor sums, and the documented flat-text anchor limitation:
    markup INSIDE an anchor stops the [^<]* capture, so nested-tag
    anchor text counts 0 (density underestimates, never over)."""
    rows = [
        ("t", ""),                                  # empty
        ("u", "<div><br></div>"),                   # tags only
        ("v", '<a href="/a">ab</a><a href="/b">cde</a>'),
        ("w", '<a href="/x"><b>bold</b></a>rest'),  # nested-tag anchor
    ]
    df = spark.createDataFrame(rows, "id string, block_html string")
    got = {
        r.id: (r.text_chars, r.anchor_chars, r.link_permille,
               r.is_content)
        for r in C.block_density(df).collect()
    }
    assert got == {
        "t": (0, 0, 0, False),
        "u": (0, 0, 0, False),
        "v": (5, 5, 1000, False),
        "w": (8, 0, 0, False),   # 'boldrest' visible, anchor uncounted
    }, got


def test_classify_validators_edges(spark):
    """Empty-string ETag falls through like NULL; W/ marks weak; strong
    ETag beats a present Last-Modified; max-age=0 still extracts."""
    rows = [
        ('"abc"', "Mon, 01 Jan 2024 00:00:00 GMT", "max-age=0"),
        ('W/"abc"', None, None),
        ("", "Mon, 01 Jan 2024 00:00:00 GMT", "no-store"),
        ("", None, "public, max-age=600"),
    ]
    df = spark.createDataFrame(
        rows, "etag string, last_modified string, cache_control string"
    )
    got = [
        (r.validator, r.max_age, r.conditional_ok)
        for r in C.classify_validators(df).collect()
    ]
    assert got == [
        ("etag", 0, True),
        ("weak_etag", None, True),
        ("last_modified", None, True),
        ("none", 600, False),
    ], got


def test_sitemap_coverage_edges(spark):
    """Declared-only hosts appear via the outer join's host coalesce;
    crawled-only hosts get coverage 0 over a declared floor of 1; the
    permilles floor exactly."""
    crawled = spark.createDataFrame(
        [("u1", "a"), ("u2", "a"), ("u3", "a"), ("x1", "c")],
        "url string, host string",
    )
    declared = spark.createDataFrame(
        [("u1", "a"), ("u2", "a"), ("g1", "a"), ("d1", "b")],
        "url string, host string",
    )
    got = {
        r.host: (r.n_crawled, r.n_declared, r.n_both,
                 r.coverage_permille, r.orphan_permille)
        for r in C.sitemap_coverage(crawled, declared).collect()
    }
    assert got == {
        "a": (3, 3, 2, 666, 333),
        "b": (0, 1, 0, 0, 0),     # declared-only host
        "c": (1, 0, 0, 0, 1000),  # crawled-only host, no sitemap
    }, got


def test_seed_distance_edges(spark):
    """Min-merge across competing paths, horizon vs reachability, and
    a 2-cycle that must not inflate distances."""
    nodes = spark.createDataFrame(
        [(f"n{i}",) for i in range(6)], "host string"
    )
    edges = spark.createDataFrame(
        [("n0", "n1"), ("n1", "n2"), ("n2", "n1"),   # 2-cycle inside
         ("n0", "n3"), ("n3", "n4"), ("n1", "n4")],  # two routes to n4
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("n0",)], "host string")
    got = {
        r.host: r.dist
        for r in C.seed_distance(nodes, edges, seeds, max_hops=2)
        .collect()
    }
    assert got == {"n0": 0, "n1": 1, "n2": 2, "n3": 1, "n4": 2,
                   "n5": None}, got


def test_text_ttr_edges(spark):
    """Empty and whitespace-only texts divide by the 1-floor; NULL text
    yields 0 tokens (split of NULL → sizes coalesce through filter)."""
    df = spark.createDataFrame(
        [("", ), ("   ",), ("One one ONE",)], "text string"
    )
    got = [
        (r.n_tokens, r.n_types, r.ttr_permille)
        for r in C.text_ttr(df).collect()
    ]
    assert got == [(0, 0, 0), (0, 0, 0), (3, 1, 333)], got


def test_host_boilerplate_edges(spark):
    """min_docs guard (a 1-page host never flags even at 100%
    frequency), within-doc repeats count once, empty lines dropped."""
    rows = [
        ("a", 1, "footer\nfooter\n\nbody one"),   # repeat + empty line
        ("a", 2, "footer\nbody two"),
        ("a", 3, "footer\nbody three"),
        ("b", 9, "lonely\nlonely"),               # single-doc host
    ]
    df = spark.createDataFrame(rows, "host string, doc_id int, text string")
    got = {
        r.doc: (r.n_lines, r.n_boiler, r.boiler_permille)
        for r in C.host_boilerplate(df).collect()
    }
    assert got == {
        1: (2, 1, 500),   # footer flags (3/3 docs); unique body 333‰ < 500
        2: (2, 1, 500),
        3: (2, 1, 500),
        9: (1, 0, 0),     # 100% frequent but min_docs=2 blocks it
    }, got


def test_sitemap_delta_edges(spark):
    """Duplicates within a crawl collapse; unchanged urls are silent;
    urls in neither input can't exist by construction of the join."""
    prev = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",)], "url string"
    )
    cur = spark.createDataFrame([("b",), ("d",), ("d",)], "url string")
    got = {
        r.url: r.change for r in C.sitemap_delta(prev, cur).collect()
    }
    assert got == {"a": "removed", "c": "removed", "d": "added"}, got


def test_content_sniff_edges(spark):
    """Short/empty bodies fall to text; NULL declared type never
    mismatches; parameters after ';' are stripped case-insensitively."""
    rows = [
        (b"", None),
        (b"<", "TEXT/HTML; Charset=UTF-8"),
        (b"%PD", "application/pdf"),           # truncated magic
        (b"\xff\xd8\xff\xe0rest", "image/jpeg"),
    ]
    df = spark.createDataFrame(rows, "body binary, content_type string")
    got = [
        (r.sniffed, r.declared_kind, r.mismatch)
        for r in C.content_sniff(df).collect()
    ]
    assert got == [
        ("text", None, False),
        ("html", "html", False),
        ("text", "pdf", True),    # truncated magic ≠ declared pdf
        ("jpeg", "jpeg", False),
    ], got


def test_text_langseg_merges_runs_and_covers_all_langs(spark):
    """Per document: 8 planted paragraphs with boundary pattern
    [0,1],[2],[3],[4,5],[6],[7] → exactly 6 segments tiling 0..7 in
    order, two of length 2; across the corpus all six heuristic
    outcomes (en es de fr zh und) appear; adjacent segments never share
    a language (the merge actually merged)."""
    from caraspark.curation import text_langseg

    rows = text_langseg(spark, "/root/testdata/sf0.001").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    langs = set()
    for doc_id, segs in by_doc.items():
        segs.sort(key=lambda r: r.seg)
        assert [s.seg for s in segs] == list(range(6))
        assert [s.n_paras for s in segs] == [2, 1, 1, 2, 1, 1]
        assert segs[0].start_para == 0 and segs[-1].end_para == 7
        for a, b in zip(segs, segs[1:]):
            assert b.start_para == a.end_para + 1  # tiling, in order
            assert a.lang != b.lang  # merged runs: no adjacent equals
        langs.update(s.lang for s in segs)
    assert langs == {"en", "es", "de", "fr", "zh", "und"}


def test_triangles_match_python_bruteforce(spark, sf_smoke):
    from itertools import combinations

    rows = {
        r.node: r.n_triangles
        for r in C.graph_triangles(spark, sf_smoke).collect()
    }
    docs = load(spark, sf_smoke, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    nodes = {d.source for d in docs}
    und = set()
    for d in docs:
        v = f"src{(d.doc_id + d.n_chars) % 20}"
        if d.source != v and v in nodes:
            und.add(tuple(sorted((d.source, v))))
    want = {n: 0 for n in nodes}
    for x, y, z in combinations(sorted(nodes), 3):
        if (
            (x, y) in und and (y, z) in und
            and tuple(sorted((x, z))) in und
        ):
            want[x] += 1
            want[y] += 1
            want[z] += 1
    assert rows == want
    assert any(v > 0 for v in want.values()), "graph must close triangles"


def test_kneser_ney_matches_python(spark, sf_smoke):
    """Third implementation: integer KN micro-probabilities recomputed in
    plain Python; probabilities bounded and discount visible."""
    from collections import Counter, defaultdict

    rows = C.lm_kneser_ney(spark, sf_smoke).collect()
    texts = [
        r.text for r in load(spark, sf_smoke, "documents").collect()
    ]
    c12 = Counter()
    for t in texts:
        a = t.lower().split(" ")
        if len(a) < 2:
            continue
        for i in range(len(a) - 1):
            c12[(a[i], a[i + 1])] += 1
    c1, n1f, n1b = defaultdict(int), defaultdict(int), defaultdict(int)
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    T = len(c12)
    M = C._KN_MICRO
    assert len(rows) == T
    for r in rows:
        key = (r.w1, r.w2)
        assert r.c12 == c12[key] and r.c1 == c1[r.w1]
        assert r.n1_fwd == n1f[r.w1] and r.n1_back == n1b[r.w2]
        want = (M * (4 * c12[key] - 3)) // (4 * c1[r.w1]) + (
            (750000 * n1f[r.w1] // c1[r.w1]) * (M * n1b[r.w2] // T)
        ) // M
        assert r.p_micro == want
        assert 0 < r.p_micro <= M
    # the discount must bite: a singleton bigram's first term is ~1/(4c1),
    # strictly below its raw MLE count share
    single = [r for r in rows if r.c12 == 1]
    assert single
    for r in single[:20]:
        assert r.p_micro < M * r.c12 // r.c1 + M // 10


def test_mix_temperature_ordering_and_normalization(spark, sf_smoke):
    """Higher temperature flattens the mixture: the max language's share
    must shrink monotonically from T=1 to T=4; micro shares ~normalize."""
    rows = C.mix_temperature(spark, sf_smoke).collect()
    assert len(rows) >= 2
    for col in ("w_t1_micro", "w_t2_micro", "w_t4_micro"):
        s = sum(r[col] for r in rows)
        assert 1_000_000 - len(rows) < s <= 1_000_000
    top = max(rows, key=lambda r: r.n_tokens)
    assert top.w_t1_micro >= top.w_t2_micro >= top.w_t4_micro
    bot = min(rows, key=lambda r: r.n_tokens)
    assert bot.w_t1_micro <= bot.w_t2_micro <= bot.w_t4_micro


def test_skew_probe_flags_planted_hot_key(spark, sf_smoke):
    from caraspark.tables import load as L

    rows = C.skew_probe(spark, sf_smoke).collect()
    assert [r.k for r in rows] == [-1]  # exactly the planted key
    ev = L(spark, sf_smoke, "events").collect()
    n_hot = sum(1 for e in ev if e.user_id % 2 == 0)
    keys = {-1 if e.user_id % 2 == 0 else e.user_id for e in ev}
    mean = len(ev) // len(keys)
    hot_at = 4 * len(ev) // len(keys)
    r = rows[0]
    assert (r.n, r.mean_n) == (n_hot, mean)
    assert r.salt_factor == (n_hot + hot_at - 1) // hot_at > 1


def test_perceptron_learns_to_zero_mistakes(spark, sf_smoke):
    """The trajectory must strictly improve and reach 0 training
    mistakes on the separable planted labels — the op demonstrably
    LEARNS, not just aggregates; weights freeze once converged."""
    rows = sorted(
        C.quality_perceptron(spark, sf_smoke).collect(),
        key=lambda r: r.epoch,
    )
    assert [r.epoch for r in rows] == [1, 2, 3, 4]
    mis = [r.n_mis for r in rows]
    assert mis[0] > mis[1] >= mis[-1]
    assert mis[-1] == 0
    # converged: no update once nothing is misclassified
    if mis[2] == 0:
        assert (rows[2].w0, rows[2].w1, rows[2].w2, rows[2].w3) == (
            rows[3].w0, rows[3].w1, rows[3].w2, rows[3].w3,
        )


def test_perceptron_matches_python_trainer(spark, sf_smoke):
    """Third implementation: exact integer batch-perceptron recompute."""
    rows = sorted(
        C.quality_perceptron(spark, sf_smoke).collect(),
        key=lambda r: r.epoch,
    )
    docs = load(spark, sf_smoke, "documents").collect()
    feats = []
    for r in docs:
        if not r.text:
            continue
        t = r.text + (" 9z" * 30 if r.doc_id % 5 == 0 else "")
        y = -1 if r.doc_id % 5 == 0 else 1
        x = (
            1,
            min(len(t.split(" ")), 200),
            sum(c.isdigit() for c in t) * 1000 // len(t),
            min(len(t) // 10, 500),
        )
        feats.append((y, x))
    w = [0, 0, 0, 0]
    for ep in range(1, 5):
        mis = [(y, x) for y, x in feats if y * sum(a * b for a, b in zip(w, x)) <= 0]
        w = [wi + sum(y * x[i] for y, x in mis) for i, wi in enumerate(w)]
        r = rows[ep - 1]
        assert (r.n_mis, r.w0, r.w1, r.w2, r.w3) == (
            len(mis), w[0], w[1], w[2], w[3],
        ), ep


def test_naive_bayes_matches_python_and_separates(spark, sf_smoke):
    """Third implementation: exact integer NB recompute (whole-bit costs,
    Laplace smoothing, ham tiebreak) — confusion cells must be identical,
    and the planted spam must separate perfectly."""
    from collections import Counter, defaultdict

    got = {
        (r.label, r.pred): r.n_docs
        for r in C.quality_nb(spark, sf_smoke).collect()
    }
    docs = [
        (r.doc_id, r.text)
        for r in load(spark, sf_smoke, "documents").collect()
        if r.text
    ]
    cw = defaultdict(Counter)
    nd = Counter()
    planted = []
    for did, text in docs:
        lab = "spam" if did % 5 == 0 else "ham"
        t = text + (" 9z" * 30 if did % 5 == 0 else "")
        ws = t.split(" ")
        cw[lab].update(ws)
        nd[lab] += 1
        planted.append((lab, ws))
    vocab = set(cw["ham"]) | set(cw["spam"])
    v = len(vocab)
    nc = {c: sum(cw[c].values()) for c in ("ham", "spam")}
    ndocs = sum(nd.values())
    bits = lambda x: x.bit_length() - 1  # noqa: E731 — floor(log2(x))
    prior = {c: bits(ndocs // nd[c]) for c in ("ham", "spam")}
    want = Counter()
    for lab, ws in planted:
        cost = {
            c: prior[c]
            + sum(bits((nc[c] + v) // (cw[c][w] + 1)) for w in ws)
            for c in ("ham", "spam")
        }
        pred = "spam" if cost["spam"] < cost["ham"] else "ham"
        want[(lab, pred)] += 1
    assert got == dict(want)
    # the planted spam separates perfectly on this corpus
    assert ("spam", "ham") not in got and ("ham", "spam") not in got


def test_text_keywords_planted_unique_term(spark, sf_smoke):
    """A term that appears ONLY in one document (df=1, high tf) must be
    that document's rank-1 keyword; recompute the full top-k in Python."""
    from collections import Counter

    from pyspark.sql import functions as F

    from caraspark.curation import _KW_TOPK, text_keywords
    from caraspark.tables import load

    rows = (
        load(spark, sf_smoke, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
        .collect()
    )
    tf = {}
    df_counts = Counter()
    for r in rows:
        c = Counter(w for w in r.text.lower().split(" ") if w)
        tf[r.doc_id] = c
        df_counts.update(c.keys())
    expected = {}
    for doc_id, c in tf.items():
        ranked = sorted(
            ((t, n) for t, n in c.items()),
            key=lambda x: (-x[1] / df_counts[x[0]], x[0]),
        )[:_KW_TOPK]
        expected[doc_id] = [t for t, _ in ranked]
    got = {}
    for r in text_keywords(spark, sf_smoke).collect():
        got.setdefault(r.doc_id, {})[r.rk] = r.term
    assert set(got) == set(expected)
    for doc_id, terms in expected.items():
        assert [got[doc_id][i + 1] for i in range(len(terms))] == terms


def test_ngram_novelty_first_doc_fully_novel_and_bounded(spark, sf_smoke):
    from caraspark.curation import ngram_novelty

    rows = ngram_novelty(spark, sf_smoke).collect()
    assert rows
    by_id = {r.doc_id: r for r in rows}
    first = by_id[min(by_id)]
    # the earliest document invented every one of its bigrams
    assert first.n_novel == first.n_grams
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams
        assert abs(r.novel_frac - r.n_novel / r.n_grams) < 1e-12


def test_host_diversity_matches_python(spark, sf_smoke):
    from collections import Counter

    from caraspark.curation import host_diversity
    from caraspark.tables import load

    rows = (
        load(spark, sf_smoke, "documents")
        .select("lang", "source")
        .collect()
    )
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, Counter())[r.source] += 1
    got = {r.lang: r for r in host_diversity(spark, sf_smoke).collect()}
    assert set(got) == set(per_lang)
    for lang, hosts in per_lang.items():
        n = sum(hosts.values())
        ss = sum(v * v for v in hosts.values())
        g = got[lang]
        assert (g.n_docs, g.n_hosts, g.sum_sq) == (n, len(hosts), ss)
        assert abs(g.simpson - (1.0 - ss / (n * n))) < 1e-12


def test_quality_agreement_cells_sum_and_match_filters(spark, sf_smoke):
    """The confusion matrix must partition exactly the docs both filters
    scored, and each cell must equal a Python join of the two verdicts."""
    from collections import Counter

    from caraspark.curation import quality_agreement, quality_logit, text_gopher
    from caraspark.tables import load

    lg = {r.doc_id: r.keep for r in quality_logit(spark, sf_smoke).collect()}
    gp = {r.doc_id: r.keep for r in text_gopher(spark, sf_smoke).collect()}
    langs = {
        r.doc_id: r.lang
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    both = set(lg) & set(gp)
    want = Counter((langs[d], lg[d], gp[d]) for d in both)
    got = {
        (r.lang, r.keep_logit, r.keep_gopher): r.n_docs
        for r in quality_agreement(spark, sf_smoke).collect()
    }
    assert got == dict(want)
    assert sum(got.values()) == len(both)


def test_collocations_pmi_matches_python(spark, sf_smoke):
    """Recompute unigram/pair counts and the exact-rational PMI ranking
    in Python; every emitted row and rank must match."""
    from collections import Counter

    from caraspark.curation import (
        _PMI_MIN_PAIR,
        _PMI_TOPK,
        collocations_pmi,
    )
    from caraspark.tables import load

    rows = (
        load(spark, sf_smoke, "documents")
        .filter("length(text) > 0")
        .select("lang", "text")
        .collect()
    )
    uni, pairs = Counter(), Counter()
    for r in rows:
        ws = r.text.lower().split(" ")
        uni.update((r.lang, t) for t in ws)
        pairs.update((r.lang, a, b) for a, b in zip(ws, ws[1:]))
    tot = Counter()
    for (lang, _t), c in uni.items():
        tot[lang] += c
    expected = {}
    by_lang = {}
    for (lang, a, b), c_ab in pairs.items():
        if c_ab >= _PMI_MIN_PAIR:
            by_lang.setdefault(lang, []).append((a, b, c_ab))
    for lang, cands in by_lang.items():
        ranked = sorted(
            cands,
            key=lambda x: (
                -(x[2] * tot[lang]) / (uni[(lang, x[0])] * uni[(lang, x[1])]),
                x[0],
                x[1],
            ),
        )[:_PMI_TOPK]
        for rk, (a, b, c_ab) in enumerate(ranked, 1):
            expected[(lang, rk)] = (
                a, b, c_ab, uni[(lang, a)], uni[(lang, b)],
            )
    got = {
        (r.lang, r.rk): (r.a, r.b, r.c_ab, r.c_a, r.c_b)
        for r in collocations_pmi(spark, sf_smoke).collect()
    }
    assert got == expected


def test_url_templates_generalizes_and_counts(spark, sf_smoke):
    """Every template must contain {n} where the path had digits, fetch
    counts must sum to the corpus size, and a Python recompute of the
    census must match cell-for-cell."""
    import re
    from collections import defaultdict

    from caraspark.curation import url_templates
    from caraspark.tables import load

    rows = (
        load(spark, sf_smoke, "documents")
        .select("doc_id", "source")
        .collect()
    )
    cells = defaultdict(lambda: [0, set()])
    for r in rows:
        did = r.doc_id
        scheme = "http://" if did % 3 == 0 else "https://"
        www = "www." if did % 2 == 0 else ""
        tld = ".org" if did % 4 == 0 else ".com"
        q = f"?utm_source=feed&ref={did % 9}" if did % 5 == 0 else ""
        url = (
            f"{scheme}{www}{r.source}{tld}/a/b"
            + "/c" * (did % 3)
            + f"/page{did % 50}{q}"
        )
        path = re.sub(r"^www\.", "", re.match("^[a-z]+://([^?]+)", url).group(1))
        tpl = re.sub(r"[0-9]+", "{n}", path)
        c = cells[(r.source, tpl)]
        c[0] += 1
        c[1].add(path)
    got = {
        (r.host, r.template): (r.n_fetches, r.n_urls, r.url_ratio)
        for r in url_templates(spark, sf_smoke).collect()
    }
    assert set(got) == set(cells)
    for k, (n, paths) in cells.items():
        gf, gu, gr = got[k]
        assert (gf, gu) == (n, len(paths))
        assert abs(gr - len(paths) / n) < 1e-12
        assert "{n}" in k[1]
    assert sum(v[0] for v in got.values()) == len(rows)


def test_split_by_host_is_host_disjoint_and_total(spark, sf_smoke):
    """The leakage-safety contract: every host lands in exactly one
    split, every document is counted, and the census reproduces an
    independent Python recomputation of the md5 assignment."""
    import hashlib

    from caraspark.curation import split_by_host
    from caraspark.tables import load

    rows = (
        load(spark, sf_smoke, "documents")
        .select("lang", "source", "n_chars")
        .collect()
    )

    def assign(host: str) -> str:
        u = int(hashlib.md5(f"{host}:split".encode()).hexdigest()[:8], 16)
        if u < 3435973836:
            return "train"
        if u < 3865470566:
            return "val"
        return "test"

    exp = {}
    hosts = {}
    for r in rows:
        s = assign(r.source)
        hosts.setdefault(r.source, set()).add(s)
        key = (s, r.lang)
        d, h, c = exp.get(key, (0, set(), 0))
        exp[key] = (d + 1, h | {r.source}, c + r.n_chars)
    assert all(len(v) == 1 for v in hosts.values())  # host-disjoint
    got = {
        (r.split, r.lang): (r.n_docs, r.n_hosts, r.n_chars_total)
        for r in split_by_host(spark, sf_smoke).collect()
    }
    assert got == {
        k: (d, len(h), c) for k, (d, h, c) in exp.items()
    }
    assert sum(d for d, _, _ in got.values()) == len(rows)  # total


def test_bitext_mine_pairs_satisfy_gates(spark, sf_smoke):
    """Every emitted pair shares (host, slot), has distinct ordered
    languages, and passes the integer length-ratio gate; and NO passing
    pair is missed (recomputed in Python)."""
    from itertools import combinations

    from caraspark.curation import bitext_mine
    from caraspark.tables import load

    rows = (
        load(spark, sf_smoke, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .collect()
    )
    by_key = {}
    for r in rows:
        by_key.setdefault((r.source, r.doc_id % 50), []).append(r)
    exp = set()
    for (host, slot), docs in by_key.items():
        for x, y in combinations(docs, 2):
            a, b = (x, y) if x.lang < y.lang else (y, x)
            if a.lang == b.lang:
                continue
            if 2 * min(a.n_chars, b.n_chars) >= max(a.n_chars, b.n_chars):
                exp.add((host, slot, a.doc_id, b.doc_id))
    got = {
        (r.host, r.slot, r.doc_a, r.doc_b)
        for r in bitext_mine(spark, sf_smoke).collect()
    }
    assert got == exp and exp  # non-vacuous


def test_vocab_growth_cumulative_types_match_prefix_vocab(spark, sf_smoke):
    """cum_types at the last bucket equals the language's full distinct
    vocabulary, and cum_tokens equals its full token count — the Heaps
    curve must END at the totals."""
    from caraspark.curation import vocab_growth
    from caraspark.tables import load

    rows = (
        load(spark, sf_smoke, "documents")
        .filter("length(text) > 0")
        .select("lang", "text")
        .collect()
    )
    vocab, toks = {}, {}
    for r in rows:
        ws = r.text.lower().split(" ")
        vocab.setdefault(r.lang, set()).update(ws)
        toks[r.lang] = toks.get(r.lang, 0) + len(ws)
    last = {}
    for r in vocab_growth(spark, sf_smoke).collect():
        cur = last.get(r.lang)
        if cur is None or r.bucket > cur.bucket:
            last[r.lang] = r
    assert set(last) == set(vocab)
    for lang, r in last.items():
        assert r.cum_types == len(vocab[lang])
        assert r.cum_tokens == toks[lang]


def test_span_merge_matches_python_interval_union(spark, sf_smoke):
    """Merged interval count and coverage equal a Python reimplementation
    of the union of the same nine synthetic spans."""
    from caraspark.curation import span_merge
    from caraspark.tables import load

    rows = (
        load(spark, sf_smoke, "documents").select("doc_id", "n_chars").collect()
    )
    exp = {}
    for r in rows:
        spans = []
        for f in range(3):
            for k in range(3):
                s = (r.doc_id * (7 + f) + 13 * k) % r.n_chars
                e = min(s + 5 + (r.doc_id + f + k) % 20, r.n_chars)
                spans.append((s, e))
        spans.sort()
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        cov = sum(e - s for s, e in merged)
        exp[r.doc_id] = (len(merged), cov, r.n_chars - cov)
    got = {
        r.doc_id: (r.n_merged, r.covered_chars, r.kept_chars)
        for r in span_merge(spark, sf_smoke).collect()
    }
    assert got == exp


def test_graph_communities_two_parity_components(spark, sf_smoke):
    """The parity-preserving link recipe yields exactly two communities,
    labeled by each component's lexicographically smallest host."""
    from caraspark.curation import graph_communities

    got = {r.host: r.community for r in graph_communities(spark, sf_smoke).collect()}
    for host, comm in got.items():
        n = int(host[3:])
        assert comm == ("src0" if n % 2 == 0 else "src1"), (host, comm)


def test_pii_gazetteer_counts_and_redaction(spark, sf_smoke):
    """Every doc carries exactly the two spliced names (the synthetic
    vocabulary cannot collide with the gazetteer), and the redacted md5
    matches a Python re-derivation."""
    import hashlib
    import re

    from caraspark.curation import _GAZETTEER, pii_gazetteer
    from caraspark.tables import load

    rows = (
        load(spark, sf_smoke, "documents")
        .filter("length(text) > 0")
        .select("doc_id", "text")
        .collect()
    )
    pat = re.compile(r"\b(" + "|".join(_GAZETTEER) + r")\b")
    exp = {}
    for r in rows:
        t = (
            r.text
            + " reported by "
            + _GAZETTEER[r.doc_id % 8]
            + " and "
            + _GAZETTEER[(r.doc_id * 3 + 1) % 8]
        )
        exp[r.doc_id] = hashlib.md5(pat.sub("<NAME>", t).encode()).hexdigest()
    for r in pii_gazetteer(spark, sf_smoke).collect():
        assert (r.n_names, r.n_distinct_names) == (2, 2), r
        assert r.redacted_md5 == exp[r.doc_id]


def test_lm_kn_score_bits_match_python(spark, sf_smoke):
    """Per-doc bit totals equal a Python fold over the collected LM
    table — the integer log2 floor must agree bigram-by-bigram."""
    from caraspark.curation import _KN_MICRO, lm_kn_score, lm_kneser_ney
    from caraspark.tables import load

    lm = {
        (r.w1, r.w2): r.p_micro
        for r in lm_kneser_ney(spark, sf_smoke).collect()
    }
    texts = (
        load(spark, sf_smoke, "documents")
        .filter("size(split(lower(text), ' ')) >= 2")
        .select("doc_id", "text")
        .collect()
    )
    exp = {}
    for r in texts:
        a = r.text.lower().split(" ")
        bits = [
            (_KN_MICRO // max(lm[(a[i], a[i + 1])], 1)).bit_length() - 1
            for i in range(len(a) - 1)
        ]
        exp[r.doc_id] = (len(bits), sum(bits))
    got = {
        r.doc_id: (r.n_bigrams, r.total_bits, r.bits_per_bigram_micro)
        for r in lm_kn_score(spark, sf_smoke).collect()
    }
    assert set(got) == set(exp)
    for d, (n, tot) in exp.items():
        gn, gtot, gavg = got[d]
        assert (gn, gtot) == (n, tot)
        assert gavg == tot * _KN_MICRO // n


def test_cluster_zorder_buckets_are_small_rectangles(spark, sf_smoke):
    """The Morton guarantee: a run of 256 consecutive z-values maps into
    a 16x16 rectangle, so every bucket's per-dimension spread is < 16 —
    the data-skipping property the layout exists for."""
    from caraspark.curation import cluster_zorder

    rows = cluster_zorder(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 <= r.x_spread < 16, r
        assert 0 <= r.y_spread < 16, r
        assert r.min_x <= r.max_x and r.min_y <= r.max_y


def test_mirror_detect_matches_python_host_sets(spark, sf_smoke):
    """Host-pair overlaps equal a Python recomputation of the content-key
    sets, and the mirror gate is exactly J >= 2/3."""
    from itertools import combinations

    from caraspark.curation import mirror_detect
    from caraspark.tables import load

    keys = {}
    for r in load(spark, sf_smoke, "documents").select("doc_id", "source").collect():
        keys.setdefault(r.source, set()).add((r.doc_id * 7 // 13) % 30)
    exp = {}
    for a, b in combinations(sorted(keys), 2):
        i = len(keys[a] & keys[b])
        if i:
            u = len(keys[a] | keys[b])
            exp[(a, b)] = (i, len(keys[a]), len(keys[b]),
                           i * 1000 // u, 3 * i >= 2 * u)
    got = {
        (r.host_a, r.host_b): (r.n_shared, r.size_a, r.size_b,
                               r.jac_permille, r.is_mirror)
        for r in mirror_detect(spark, sf_smoke).collect()
    }
    assert got == exp and exp
    assert any(v[-1] for v in got.values())
    assert not all(v[-1] for v in got.values())


def test_corpus_datacard_consistency(spark, sf_smoke):
    """The card's totals must agree with the operators it composes:
    gopher_keep equals text_gopher's keep count per lang, kept_tokens <=
    n_tokens, and docs/hosts match direct aggregation."""
    from collections import Counter

    from caraspark.curation import corpus_datacard, text_gopher
    from caraspark.tables import load

    docs = (
        load(spark, sf_smoke, "documents")
        .filter("length(text) > 0")
        .select("doc_id", "lang", "source")
        .collect()
    )
    lang_of = {r.doc_id: r.lang for r in docs}
    n_docs = Counter(r.lang for r in docs)
    hosts = {}
    for r in docs:
        hosts.setdefault(r.lang, set()).add(r.source)
    keep = Counter(
        lang_of[r.doc_id]
        for r in text_gopher(spark, sf_smoke).collect()
        if r.keep and r.doc_id in lang_of
    )
    card = {r.lang: r for r in corpus_datacard(spark, sf_smoke).collect()}
    assert set(card) == set(n_docs)
    for lang, r in card.items():
        assert r.n_docs == n_docs[lang]
        assert r.n_hosts == len(hosts[lang])
        assert r.gopher_keep == keep.get(lang, 0)
        assert 0 <= r.kept_tokens <= r.n_tokens
        assert 0 < r.vocab_types <= r.n_tokens


def test_split_leakage_audit_reconciles_with_components(spark, sf_smoke):
    """Pair counts must reconcile with dedup_minhash's pair list tagged
    by the split_by_host assignment recomputed in Python."""
    import hashlib
    from collections import Counter

    from caraspark.curation import split_leakage_audit
    from caraspark.tables import load
    from caraspark.textops import dedup_minhash

    def assign(host):
        u = int(hashlib.md5(f"{host}:split".encode()).hexdigest()[:8], 16)
        return "train" if u < 3435973836 else ("val" if u < 3865470566 else "test")

    split = {
        r.doc_id: assign(r.source)
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", "source")
        .collect()
    }
    exp = Counter()
    for r in dedup_minhash(spark, sf_smoke).select("id_a", "id_b").collect():
        a, b = split[r.id_a], split[r.id_b]
        exp[(min(a, b), max(a, b), a != b)] += 1
    got = {
        (r.split_a, r.split_b, r.crosses): r.n_pairs
        for r in split_leakage_audit(spark, sf_smoke).collect()
    }
    assert got == dict(exp) and got


def test_budget_apportion_sums_exactly_to_budget(spark, sf_smoke):
    """Hamilton invariants: Σalloc == B, every alloc in {floor, floor+1},
    and extras go to the largest remainders."""
    from caraspark.curation import _CRAWL_BUDGET, budget_apportion

    rows = budget_apportion(spark, sf_smoke).collect()
    assert sum(r.alloc for r in rows) == _CRAWL_BUDGET
    total = sum(r.weight for r in rows)
    for r in rows:
        assert r.base_quota == r.weight * _CRAWL_BUDGET // total
        assert r.alloc - r.base_quota == r.extra in (0, 1)
    # extras must be exactly the top-k remainders (ties by host)
    rem = sorted(
        ((r.weight * _CRAWL_BUDGET) % total, r.host, r.extra) for r in rows
    )
    k = sum(r.extra for r in rows)
    got_extra = {h for _, h, e in rem if e}
    exp_extra = {h for _, h, _ in sorted(rem, key=lambda x: (-x[0], x[1]))[:k]}
    assert got_extra == exp_extra


def test_link_predict_excludes_edges_and_matches_python(spark, sf_smoke):
    """Predicted pairs are exactly the non-adjacent two-hop pairs, with
    RA = sum(1e6 // deg(witness)) recomputed in Python."""
    from itertools import combinations

    from caraspark.curation import link_predict
    from caraspark.tables import load

    rows = (
        load(spark, sf_smoke, "documents")
        .filter("doc_id % 11 = 0")
        .select("doc_id", "source")
        .collect()
    )
    edges = set()
    for r in rows:
        h = int(r.source[3:])
        t = (h + 2 * (r.doc_id % 9) + 2) % 20
        if t != h:
            sa, sb = f"src{h}", f"src{t}"
            # canonical order is STRING order, matching the operator's
            # least/greatest over host names
            edges.add((min(sa, sb), max(sa, sb)))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(n) for v, n in adj.items()}
    exp = {}
    for a, b in combinations(sorted(adj), 2):
        if (min(a, b), max(a, b)) in edges:
            continue
        common = adj[a] & adj[b]
        if common:
            exp[(min(a, b), max(a, b))] = (
                len(common),
                sum(1_000_000 // deg[v] for v in common),
            )
    got = {
        (r.host_a, r.host_b): (r.n_common, r.ra_micro)
        for r in link_predict(spark, sf_smoke).collect()
    }
    assert got == exp and exp


def test_curation_funnel_is_monotone_and_reconciles(spark, sf_smoke):
    """Stages shrink monotonically in docs AND tokens, stage 0 equals
    the textful corpus, and stage 1 equals text_gopher's keeps."""
    from caraspark.curation import curation_funnel, text_gopher
    from caraspark.tables import load

    n_all = (
        load(spark, sf_smoke, "documents").filter("length(text) > 0").count()
    )
    n_gopher = sum(
        1 for r in text_gopher(spark, sf_smoke).collect() if r.keep
    )
    f = {r.stage: r for r in curation_funnel(spark, sf_smoke).collect()}
    assert set(f) == {"0_all", "1_gopher", "2_blocklist", "3_dedup"}
    assert f["0_all"].n_docs == n_all
    assert f["1_gopher"].n_docs == n_gopher
    order = ["0_all", "1_gopher", "2_blocklist", "3_dedup"]
    for a, b in zip(order, order[1:]):
        assert f[a].n_docs >= f[b].n_docs
        assert f[a].n_tokens >= f[b].n_tokens
    assert f["3_dedup"].n_docs > 0


def test_host_gini_matches_python_and_bounds(spark, sf_smoke):
    from collections import Counter

    from caraspark.curation import host_gini
    from caraspark.tables import load

    counts = {}
    for r in load(spark, sf_smoke, "documents").select("lang", "source").collect():
        counts.setdefault(r.lang, Counter())[r.source] += 1
    got = {r.lang: r for r in host_gini(spark, sf_smoke).collect()}
    assert set(got) == set(counts)
    for lang, hosts in counts.items():
        xs = sorted(hosts.items(), key=lambda kv: (kv[1], kv[0]))
        n = len(xs)
        t = sum(v for _, v in xs)
        g = sum((2 * i - n - 1) * v for i, (_, v) in enumerate(xs, 1))
        r = got[lang]
        assert (r.n_hosts, r.n_docs) == (n, t)
        assert r.gini_permille == g * 1000 // (n * t)
        assert 0 <= r.gini_permille < 1000


def test_sample_pps_gate_matches_python(spark, sf_smoke):
    """Inclusion is exactly u32*max < chars*2^32, recomputed in Python."""
    import hashlib

    from caraspark.curation import sample_pps
    from caraspark.tables import load

    rows = (
        load(spark, sf_smoke, "documents").select("doc_id", "n_chars").collect()
    )
    mx = max(r.n_chars for r in rows)
    exp = set()
    for r in rows:
        u = int(hashlib.md5(f"{r.doc_id}:pps".encode()).hexdigest()[:8], 16)
        if u * mx < r.n_chars * 4294967296:
            exp.add(r.doc_id)
    got = {r.doc_id for r in sample_pps(spark, sf_smoke).collect()}
    assert got == exp and 0 < len(got) < len(rows)


def test_host_ppl_reconciles_with_doc_scores(spark, sf_smoke):
    from collections import defaultdict

    from caraspark.curation import host_ppl, lm_kn_score
    from caraspark.tables import load

    src = {
        r.doc_id: r.source
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", "source")
        .collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])
    for r in lm_kn_score(spark, sf_smoke).collect():
        e = agg[src[r.doc_id]]
        e[0] += 1
        e[1] += r.n_bigrams
        e[2] += r.total_bits
    got = {r.host: r for r in host_ppl(spark, sf_smoke).collect()}
    assert set(got) == set(agg)
    for h, (nd, nb, tb) in agg.items():
        r = got[h]
        assert (r.n_docs, r.n_bigrams, r.total_bits) == (nd, nb, tb)
        assert r.bits_per_bigram_micro == tb * 1_000_000 // nb


def test_postings_gapbits_compresses_dense_terms_more(spark, sf_smoke):
    """Gap bits beat raw 64-bit postings everywhere, and high-df terms
    compress strictly better (permille) than the rarest terms."""
    from caraspark.curation import postings_gapbits

    rows = postings_gapbits(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.gap_bits < r.raw_bits
        assert r.ratio_permille == r.gap_bits * 1000 // r.raw_bits
    dmax = max(r.df for r in rows)
    dmin = min(r.df for r in rows)
    dense = min(r.ratio_permille for r in rows if r.df == dmax)
    sparse = max(r.ratio_permille for r in rows if r.df == dmin)
    assert dense < sparse


def test_url_surt_collates_hierarchically(spark, sf_smoke):
    """SURT keys must sort host-hierarchically: every key for one
    registrable domain is a prefix-contiguous run in the sorted order
    (the property that lets a CDX range scan slice a crawl by domain),
    and scheme/www/slash/query variants collide (n_urls > 1 somewhere)."""
    from caraspark.curation import url_surt

    rows = url_surt(spark, sf_smoke).collect()
    keys = sorted(r.surt_key for r in rows)
    # host part = everything before ')': once sorted, each host's keys
    # form one contiguous block
    hosts = [k.split(")")[0] for k in keys]
    seen, prev = set(), None
    for h in hosts:
        if h != prev:
            assert h not in seen, f"host {h} split into two runs"
            seen.add(h)
            prev = h
    assert all(k.count(")") == 1 for k in keys)
    assert any(r.n_urls > 1 for r in rows)  # variants actually collide


def test_quality_calibration_monotone_trend(spark, sf_smoke):
    """The planted label is derived from doc_id, not the score, so exact
    monotonicity isn't guaranteed — but the diagram must be well-formed:
    10 (or fewer at tiny sf) buckets, mean score strictly increasing with
    bucket, permilles in range, and all docs accounted for."""
    from caraspark.curation import quality_calibration, quality_logit

    rows = sorted(
        quality_calibration(spark, sf_smoke).collect(),
        key=lambda r: r.bucket,
    )
    assert 1 <= len(rows) <= 10
    assert sum(r.n_docs for r in rows) == quality_logit(
        spark, sf_smoke
    ).count()
    means = [r.mean_score_milli for r in rows]
    assert means == sorted(means)
    for r in rows:
        assert 0 <= r.ham_permille <= 1000
        assert 0 <= r.bucket <= 9


def test_warc_revisit_plan_invariants(spark, sf_smoke):
    """Crawl 0 must be all full responses (no history to point at);
    every later crawl has both record types (change periods 1..3 plant
    churny and stable urls); and per crawl stored + saved == total
    payload bytes (a revisit stores the 30-byte pointer and saves the
    rest — nothing vanishes)."""
    from caraspark.curation import warc_revisit_plan
    from caraspark.tables import load
    import pyspark.sql.functions as F

    rows = {r.crawl: r for r in warc_revisit_plan(spark, sf_smoke).collect()}
    total_payload = (
        load(spark, sf_smoke, "documents")
        .filter(F.length("text") > 0)
        .agg(F.sum(F.length("text")))
        .collect()[0][0]
    )
    n_urls = rows[0].n_response
    assert rows[0].n_revisit == 0 and rows[0].saved_bytes == 0
    for c, r in rows.items():
        assert r.n_response + r.n_revisit == n_urls
        assert r.stored_bytes + r.saved_bytes == total_payload
        if c > 0:
            assert r.n_revisit > 0 and r.n_response > 0


def test_decontaminate_remove_consistent_with_detector(spark, sf_smoke):
    """The removal writer and the detector must agree: every doc the
    detector flags loses tokens, every unflagged doc passes through
    byte-identical (clean_md5 == md5 of its full lowercased token
    stream), counts stay within bounds, and both populations are
    non-empty (the op is not degenerate on this corpus)."""
    import hashlib

    import pyspark.sql.functions as F

    from caraspark.curation import decontaminate, decontaminate_remove
    from caraspark.tables import load

    flagged = {r.doc_id for r in decontaminate(spark, sf_smoke).collect()}
    out = {r.doc_id: r for r in decontaminate_remove(spark, sf_smoke).collect()}
    texts = {
        r.doc_id: r.text
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", F.lower("text").alias("text"))
        .collect()
        if r.doc_id in out
    }
    removed = {d for d, r in out.items() if r.n_removed > 0}
    untouched = set(out) - removed
    assert flagged == removed  # detector and writer agree exactly
    assert removed and untouched
    for d, r in out.items():
        assert 0 <= r.n_removed <= r.n_tokens
        if d in untouched:
            full = " ".join(texts[d].split(" "))
            assert r.clean_md5 == hashlib.md5(full.encode()).hexdigest()


def test_quality_threshold_sweep_monotone(spark, sf_smoke):
    """Raising the threshold can only shrink what's kept: n_kept,
    kept_tokens and ham-recall must be non-increasing in thresh; the
    lowest cut keeps everything (recall 1e6 ppm); precision stays in
    range and the extremes behave (empty keeps report 0)."""
    from caraspark.curation import quality_logit, quality_threshold_sweep

    rows = sorted(
        quality_threshold_sweep(spark, sf_smoke).collect(),
        key=lambda r: r.thresh,
    )
    assert len(rows) == 11
    total = quality_logit(spark, sf_smoke).count()
    assert rows[0].n_kept == total
    assert rows[0].ham_recall_ppm == 1_000_000
    for a, b in zip(rows, rows[1:]):
        assert b.n_kept <= a.n_kept
        assert b.kept_tokens <= a.kept_tokens
        assert b.ham_recall_ppm <= a.ham_recall_ppm
    for r in rows:
        assert 0 <= r.precision_ppm <= 1_000_000
