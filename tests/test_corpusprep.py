"""Round-7 corpus-prep wave 2: epoch-expansion invariants and
planted-novelty falsifiability. Cross-engine value parity is the
driver's oracle check; these pin the semantics at any tier."""

from __future__ import annotations

from skills_vectors_spark import sources
from skills_vectors_spark.operators import corpusprep


def test_mix_epochs_copy_counts_per_language(spark, sf_dir):
    rows = corpusprep.mix_epochs(spark, sf_dir).collect()
    base = {
        r.lang: r.n
        for r in sources.load(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    by_doc: dict = {}
    n_by_lang: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.epoch_idx)
        n_by_lang[r.lang] = n_by_lang.get(r.lang, 0) + 1
    # per-doc epoch indices are contiguous 1..n
    for doc, idxs in by_doc.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1)), doc
    for lang, e in corpusprep.EPOCH_TARGETS.items():
        if lang not in base:
            continue
        n = base[lang]
        lo, hi = int(e) * n, (int(e) + (e % 1 > 0)) * n
        got = n_by_lang.get(lang, 0)
        assert lo <= got <= hi, (lang, got, lo, hi)
        if e == int(e):  # integer epochs: exact
            assert got == int(e) * n, lang
    # deterministic
    again = corpusprep.mix_epochs(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_text_ngram_novelty_bounds_and_planted_extremes(spark, sf_dir):
    from unittest import mock

    rows = corpusprep.text_ngram_novelty(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0 and r.n_grams > 0, r
        assert r.doc_id % 2 == 1
    # planted: candidate 1 copies reference 0 verbatim -> novelty 0;
    # candidate 3 shares nothing -> novelty 1; candidate 5 is 4 tokens
    # (no 5-gram) -> absent from the output
    ref = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (0, ref),
            (1, ref),
            (3, "one two three four five six seven"),
            (5, "tiny doc no gram"),
        ],
        "doc_id long, text string",
    )
    with mock.patch.object(corpusprep.sources, "load", lambda *_a: df):
        got = {
            r.doc_id: r.novelty
            for r in corpusprep.text_ngram_novelty(spark, sf_dir).collect()
        }
    assert got == {1: 0.0, 3: 1.0}
