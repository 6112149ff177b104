"""Corpus statistics + sampling operators vs their DuckDB oracles, plus
an HLL accuracy probe on a synthetic high-cardinality vocabulary (the
testdata corpus has only ~31 distinct terms, which under-stresses the
sketch)."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con


def _norm(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    return sorted(tuple(map(str, r)) for r in df.itertuples(index=False))


def _check(ds, sql):
    got = ds.to_pandas()
    want = _con().execute(sql).df()
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    assert _norm(got) == _norm(want)


def _docs():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


class TestCorpusOracles:
    def test_tfidf(self, ray_session):
        from rogray import corpus

        _check(corpus.tfidf_top_terms(_docs()), corpus.tfidf_sql())

    def test_heavy_hitters(self, ray_session):
        from rogray import corpus

        _check(corpus.heavy_hitters(_docs()), corpus.heavy_hitters_sql())

    def test_source_distinct_terms(self, ray_session):
        from rogray import corpus

        _check(
            corpus.source_distinct_terms(_docs()),
            corpus.source_distinct_terms_sql(),
        )

    def test_pii_stats(self, ray_session):
        from rogray import textstats

        _check(textstats.pii_stats(_docs()), textstats.pii_stats_sql())

    def test_stratified_sample(self, ray_session):
        from rogray import sampling

        _check(sampling.stratified_sample(_docs()), sampling.stratified_sample_sql())


class TestUnigramLogprob:
    def test_matches_oracle(self, ray_session):
        from rogray import corpus

        _check(corpus.unigram_logprob(_docs()), corpus.unigram_logprob_sql())

    def test_rarer_terms_score_lower(self, ray_session):
        import ray.data as rd
        from rogray import corpus

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "source": ["s"] * 4,
                "text": ["common common common", "common common rare",
                         "common common common", "common common common"],
            }
        )
        out = (
            corpus.unigram_logprob(rd.from_pandas(docs))
            .to_pandas()
            .set_index("doc_id")
        )
        # doc 2 contains the corpus-unique term -> strictly lower total
        assert out.loc[2, "logprob_x1000"] < out.loc[1, "logprob_x1000"]
        assert (out["n_tokens"] == 3).all()


class TestBpeTokenCount:
    def test_matches_oracle(self, ray_session):
        from rogray import textstats

        _check(textstats.bpe_token_count(_docs()), textstats.bpe_token_count_sql())


class TestHll:
    def test_error_within_bound_at_high_cardinality(self, ray_session):
        import ray.data as rd
        from rogray import corpus

        rng = np.random.default_rng(7)
        # 3 sources with ~2k / ~10k / ~40k distinct terms
        rows = []
        for src, n_terms, n_docs in [("a", 2000, 200), ("b", 10000, 400), ("c", 40000, 800)]:
            for d in range(n_docs):
                terms = rng.integers(0, n_terms, size=120)
                rows.append(
                    {
                        "doc_id": len(rows),
                        "source": src,
                        "text": " ".join(f"w{src}{t}" for t in terms),
                    }
                )
        ds = rd.from_pandas(pd.DataFrame(rows)).repartition(8)
        est = (
            corpus.source_distinct_terms_hll(ds)
            .to_pandas()
            .set_index("source")["n_est"]
        )
        exact = (
            corpus.source_distinct_terms(
                rd.from_pandas(pd.DataFrame(rows)).repartition(8)
            )
            .to_pandas()
            .set_index("source")["n_distinct_terms"]
        )
        rel = ((est - exact).abs() / exact).max()
        assert rel <= 0.05, f"HLL rel error {rel}: est={dict(est)} exact={dict(exact)}"


class TestSamplingProperties:
    def test_rates_are_deterministic_and_plausible(self, ray_session):
        from rogray import sampling

        out = sampling.stratified_sample(_docs()).to_pandas()
        # re-run: identical decision set (hash-based, no RNG)
        again = sampling.stratified_sample(_docs()).to_pandas()
        assert _norm(out) == _norm(again)
        # each source's observed keep-rate within 4x band of its permille
        # (500 docs over 20 sources -> wide tolerance)
        for src, grp in out.groupby("source"):
            r = sampling.source_permille(src)
            assert grp["permille"].eq(r).all()


class TestBigramPMI:
    def test_matches_oracle(self, ray_session):
        import ray.data as rd

        from rogray import corpus

        ds = rd.read_parquet(f"{SF}/documents.parquet")
        got = corpus.bigram_pmi(ds).to_pandas()
        want = _con().execute(corpus.bigram_pmi_sql()).df()
        assert len(got) == len(want) == 50
        assert _norm(got) == _norm(want)

    def test_min_count_respected(self, ray_session):
        import ray.data as rd

        from rogray import corpus

        ds = rd.read_parquet(f"{SF}/documents.parquet")
        got = corpus.bigram_pmi(ds, min_count=20).to_pandas()
        assert (got["c_ab"] >= 20).all()


class TestInvertedIndex:
    def test_matches_oracle(self, ray_session):
        import ray.data as rd

        from rogray import corpus

        ds = rd.read_parquet(f"{SF}/documents.parquet")
        got = corpus.inverted_index_stats(ds).to_pandas()
        want = _con().execute(corpus.inverted_index_stats_sql()).df()
        assert len(got) == len(want)
        assert _norm(got) == _norm(want)

    def test_head_is_postings_prefix(self, ray_session):
        import ray.data as rd

        from rogray import corpus

        ds = rd.read_parquet(f"{SF}/documents.parquet")
        got = corpus.inverted_index_stats(ds).to_pandas()
        n_heads = got["head_docs"].str.split(",").map(len)
        assert (n_heads <= 3).all()
        assert (n_heads <= got["df"]).all()
