"""Report tabs + full wide-row parity between the Catalyst enrichment and
the pure-Python oracle (scores, dup flags, warnings, risk — per URL)."""

import pytest

from crawler_seo_spark.config import CrawlConfig
from crawler_seo_spark.engine import CrawlEngine
from crawler_seo_spark.oracle import run_oracle
from crawler_seo_spark.plans.enrich import enrich_results
from crawler_seo_spark.plans.reports import ALL_TABS, tab_resumo_executivo
from crawler_seo_spark.sources.synthetic_site import SEED_URL

WIDE_COLS = [
    "Title", "Title_Length", "Title_Status", "Title_Duplicado",
    "Meta_Description", "Description_Length", "Description_Status",
    "Description_Duplicada", "H1_Count", "H1_Text", "H1_Ausente",
    "H1_Multiple", "Hierarquia_Correta", "Headings_Problematicos_Total",
    "Headings_Vazios", "Headings_Ocultos", "Headings_Criticos",
    "Heading_Sequence_Completa", "Heading_Sequence_Valida",
    "Total_Problemas_Headings", "Metatags_Score", "Headings_Score",
    "Critical_Issues", "Warnings", "Has_Mixed_Content", "Mixed_Content_Count",
    "Critical_Mixed_Count", "Passive_Mixed_Count", "Canonical_URL",
    "Meta_Viewport", "Has_Open_Graph", "Risk_Level", "Risk_Score",
    "hsts_present", "csp_present", "x_frame_options",
    "x_content_type_options", "referrer_policy",
]


@pytest.fixture(scope="module")
def runs(spark, small_site, pages_df):
    cfg = CrawlConfig(seed_url=SEED_URL, max_urls=120, batch_size=25)
    oracle = run_oracle(small_site, cfg)
    state = CrawlEngine(spark, pages_df, cfg).run()
    wide = enrich_results(state.results).localCheckpoint(eager=True)
    return oracle, wide


def test_wide_rows_match_oracle(runs):
    oracle, wide = runs
    got = {r["URL"]: r for r in wide.collect()}
    assert len(got) == len(oracle.results)
    mismatches = []
    for row in oracle.results:
        g = got[row["URL"]]
        if "Title" not in row:  # non-analyzed page: base fields only
            assert g["Status_Code"] == row["Status_Code"]
            assert g["Warnings"] == row.get("Warnings", "")
            continue
        for col in WIDE_COLS:
            if g[col] != row[col]:
                mismatches.append((row["URL"], col, row[col], g[col]))
    assert not mismatches, mismatches[:10]


def test_all_tabs_run_nonempty_where_expected(runs):
    _, wide = runs
    counts = {}
    for name, fn in ALL_TABS.items():
        counts[name] = fn(wide).count()
    assert counts["analise_completa"] == 120
    # the synthetic site plants all of these problem classes
    for name in ("headings_problematicos", "headings_vazios",
                 "titles_duplicados", "descriptions_duplicadas",
                 "hierarquia_problemas", "mixed_content",
                 "gravidade_headings", "sequencia_headings"):
        assert counts[name] > 0, name
    assert counts["score_ranking"] <= 100


def test_resumo_matches_oracle_aggregates(runs):
    oracle, wide = runs
    resumo = {r["Metrica"]: r["Valor"]
              for r in tab_resumo_executivo(wide).collect()}
    analyzed = [r for r in oracle.results if "Title" in r]
    assert resumo["Total de URLs analisadas"] == len(oracle.results)
    assert resumo["Títulos duplicados"] == sum(
        1 for r in analyzed if r["Title_Duplicado"] == "SIM")
    assert resumo["URLs sem H1"] == sum(
        1 for r in analyzed if r.get("H1_Ausente") == "SIM")
    assert resumo["URLs com mixed content"] == sum(
        1 for r in analyzed if r.get("Has_Mixed_Content") == "SIM")
    assert resumo["Recursos críticos em mixed content"] == sum(
        r.get("Critical_Mixed_Count", 0) for r in analyzed)


def test_score_ranking_is_topk(runs):
    _, wide = runs
    from crawler_seo_spark.plans.reports import tab_score_ranking
    ranked = tab_score_ranking(wide, k=10).collect()
    scores = [r["Score"] for r in ranked]
    assert scores == sorted(scores, reverse=True)
    top = wide.orderBy(wide["Metatags_Score"].desc()).limit(10).collect()
    assert scores[0] == top[0]["Metatags_Score"]
