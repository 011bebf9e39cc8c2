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
    "Security_Headers", "Performance_Issues", "SEO_Status_Issues",
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
            # C21 status fields exist for every response (301s, non-HTML)
            assert g["SEO_Status_Issues"] == row["SEO_Status_Issues"]
            assert g["Performance_Issues"] == row["Performance_Issues"]
            assert dict(g["Security_Headers"]) == row["Security_Headers"]
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


def test_duplicates_report_crawl_order(runs):
    """A3 parity: duplicate-title url lists in CRAWL (insertion) order —
    the reference appends urls as pages are processed
    (metatags_analyzer.py:387-404); round 1 sorted them alphabetically."""
    oracle, wide = runs
    from crawler_seo_spark.plans.reports import tab_duplicates_report
    groups: dict[str, list[str]] = {}
    for r in oracle.results:  # oracle.results is in crawl order
        if r.get("Title"):
            groups.setdefault(r["Title"], []).append(r["URL"])
    expected = {t: urls for t, urls in groups.items() if len(urls) > 1}
    rows = tab_duplicates_report(wide).collect()
    got = {r["Title"]: list(r["urls"]) for r in rows}
    assert got == expected
    assert all(r["first_url"] == r["urls"][0] for r in rows)
    assert all(r["dup_count"] == len(r["urls"]) for r in rows)


def test_write_xlsx_workbook(runs, tmp_path):
    """S5 closure: one .xlsx with all 11 sheets, valid OOXML zip, autosized
    columns, data rows present."""
    import zipfile
    import xml.etree.ElementTree as ET
    _, wide = runs
    from crawler_seo_spark.plans.reports import ALL_TABS, write_xlsx
    path = str(tmp_path / "report.xlsx")
    write_xlsx(wide, path)
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert "[Content_Types].xml" in names
        assert "xl/workbook.xml" in names
        sheet_parts = [n for n in names if n.startswith("xl/worksheets/")]
        assert len(sheet_parts) == len(ALL_TABS)
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
        sheet_names = [s.get("name") for s in wb.iter(f"{ns}sheet")]
        assert sheet_names == list(ALL_TABS)
        # main tab: header row + 120 data rows, every XML part parses
        main = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = list(main.iter(f"{ns}row"))
        assert len(rows) == 121
        for part in sheet_parts:
            ET.fromstring(z.read(part))
        # conditional score formats (reference excel_generator.py:213-339):
        # dxf styles present, and every sheet with a score column carries
        # the >=80 / 50-79 / <50 cell rules + a 3-color scale on it
        styles = ET.fromstring(z.read("xl/styles.xml"))
        dxfs = styles.find(f"{ns}dxfs")
        assert dxfs is not None and len(dxfs) == 5
        with_rules = 0
        for idx, name in enumerate(sheet_names, start=1):
            sheet = ET.fromstring(z.read(f"xl/worksheets/sheet{idx}.xml"))
            hdr_cells = [t.text or "" for t in
                         list(sheet.iter(f"{ns}row"))[0].iter(f"{ns}t")]
            score_cols = [h for h in hdr_cells if "score" in h.lower()]
            cfs = sheet.findall(f"{ns}conditionalFormatting")
            if score_cols:
                assert len(cfs) >= len(score_cols), name
                kinds = [r.get("type") for cf in cfs
                         for r in cf.iter(f"{ns}cfRule")]
                assert kinds.count("cellIs") >= 3 * len(score_cols)
                assert "colorScale" in kinds
                with_rules += 1
        assert with_rules >= 5  # Score columns appear across most tabs


def test_write_report_counts_single_pass(runs, tmp_path):
    """write_report returns exact per-tab counts via observed metrics."""
    _, wide = runs
    from crawler_seo_spark.plans.reports import ALL_TABS, write_report
    counts = write_report(wide, str(tmp_path / "rep"))
    assert counts["analise_completa"] == 120
    spark = wide.sparkSession
    for name in ALL_TABS:
        on_disk = spark.read.parquet(str(tmp_path / "rep" / name)).count()
        assert counts[name] == on_disk, name


def test_security_headers_case_insensitive(spark, pages_df):
    """Live HTTP servers send lowercase header names (mandatory on HTTP/2);
    the C21 fields must match them like requests' case-insensitive dict —
    and emit canonical spellings in the output map."""
    import pyspark.sql.functions as F

    from crawler_seo_spark.config import CrawlConfig
    from crawler_seo_spark.engine import CrawlEngine
    cfg = CrawlConfig(seed_url=SEED_URL, max_urls=6, batch_size=6)
    state = CrawlEngine(spark, pages_df, cfg).run()
    lowered = state.results.withColumn(
        "headers", F.map_from_entries(F.transform(
            F.map_entries("headers"),
            lambda e: F.struct(F.lower(e["key"]).alias("key"),
                               e["value"].alias("value")))))
    w_orig = {r["URL"]: r for r in enrich_results(state.results).collect()}
    w_low = {r["URL"]: r for r in enrich_results(lowered).collect()}
    assert any(w_orig[u]["Security_Headers"] for u in w_orig)
    for u in w_orig:
        assert dict(w_low[u]["Security_Headers"]) \
            == dict(w_orig[u]["Security_Headers"])
        assert w_low[u]["hsts_present"] == w_orig[u]["hsts_present"]
        assert w_low[u]["Performance_Issues"] \
            == w_orig[u]["Performance_Issues"]
        assert w_low[u]["Risk_Score"] == w_orig[u]["Risk_Score"]


def test_case_colliding_headers_last_wins(spark, pages_df):
    """A raw/proxied header dict CAN contain two keys differing only by
    case; lowercasing must not blow up map_from_entries (default
    mapKeyDedupPolicy=EXCEPTION) — the later entry wins, like assignment
    into requests' CaseInsensitiveDict."""
    import pyspark.sql.functions as F

    from crawler_seo_spark.config import CrawlConfig
    from crawler_seo_spark.engine import CrawlEngine
    cfg = CrawlConfig(seed_url=SEED_URL, max_urls=3, batch_size=3)
    state = CrawlEngine(spark, pages_df, cfg).run()
    collided = state.results.withColumn(
        "headers",
        F.create_map(
            F.lit("X-Frame-Options"), F.lit("DENY"),
            F.lit("x-frame-options"), F.lit("SAMEORIGIN"),
            F.lit("Strict-Transport-Security"), F.lit("max-age=31536000")))
    rows = enrich_results(collided).collect()  # must not throw
    for r in rows:
        assert dict(r["Security_Headers"])["X-Frame-Options"] == "SAMEORIGIN"
        assert r["hsts_present"] is True


def test_xlsx_nonfinite_floats_empty_cells(tmp_path):
    """inf/-inf/NaN have no OOXML numeric form — they must become empty
    cells, never '<v>inf</v>' (corrupts the workbook for Excel readers)."""
    import zipfile
    import xml.etree.ElementTree as ET

    from crawler_seo_spark.plans.xlsx import write_workbook
    path = str(tmp_path / "inf.xlsx")
    write_workbook(path, [("t", ["a", "b"],
                           [(float("inf"), 1.5), (float("-inf"), float("nan"))])])
    with zipfile.ZipFile(path) as z:
        xml = z.read("xl/worksheets/sheet1.xml").decode()
        ET.fromstring(xml)
        assert "inf" not in xml and "nan" not in xml
        assert "1.5" in xml
