"""The 11 report tabs as Catalyst DataFrame queries (S5/F10/F11/A3/A7/O5).

Each function maps one Excel tab of the reference's report stage
(``reports/excel_generator.py:61-158`` and the ``_aba_*`` builders at
``:341-718``) to a DataFrame query over the enriched wide table produced by
:func:`crawler_seo_spark.plans.enrich.enrich_results`. Column naming is the
reference's semantic name without the emoji prefixes (presentation-only);
writing to xlsx is out of engine scope — each tab writes to parquet or any
Spark sink.

The reference builds every tab by ``df.iterrows()`` row loops in pandas;
here every tab is a pushdown-friendly select/filter/aggregate — the wide
table is scanned once per tab with column pruning, and the only shuffles
are the aggregations that genuinely need them (summary, duplicates report,
top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tab_analise_completa(wide: DataFrame) -> DataFrame:
    """Main tab: the full wide table ordered by crawl sequence."""
    return wide.orderBy("crawl_seq")


def tab_headings_problematicos(wide: DataFrame) -> DataFrame:
    """excel_generator.py:341-389 — one row per URL with heading problems."""
    probs = F.coalesce(
        F.col("headings_problematicos"),
        F.array().cast(
            "array<struct<descricao:string,tag:string,posicao:int,"
            "texto:string,motivos:array<string>,gravidade:string>>"))
    return (
        wide.filter(F.col("Headings_Problematicos_Total") > 0)
        .select(
            F.col("URL"),
            F.col("Headings_Problematicos_Total").alias("Total_Problemas"),
            F.col("Headings_Vazios").alias("Vazios"),
            F.col("Headings_Ocultos").alias("Ocultos"),
            F.col("Headings_Criticos").alias("CRITICOS"),
            F.greatest(
                F.lit(0),
                F.col("Headings_Problematicos_Total") - F.col("Headings_Criticos")
            ).alias("MEDIOS"),
            F.when(F.col("Headings_Criticos") > 0, "CRÍTICO").otherwise("MÉDIO")
             .alias("Gravidade_Geral"),
            F.array_join(F.transform(probs, lambda p: p["descricao"]), " | ")
             .alias("Detalhes"),
            F.array_join(
                F.array_sort(F.array_distinct(
                    F.flatten(F.transform(probs, lambda p: p["motivos"])))),
                ", ").alias("Motivos_Unicos"),
            F.col("H1_Count"),
            F.col("Hierarquia_Correta").alias("Hierarquia_OK"),
            F.col("Heading_Sequence_Completa").alias("Sequencia_Completa"),
            F.col("Heading_Sequence_Valida").alias("Sequencia_Valida"),
            F.col("Metatags_Score").alias("Score"),
        )
    )


def tab_headings_vazios(wide: DataFrame) -> DataFrame:
    """excel_generator.py:391-431 — one row per empty heading occurrence."""
    exploded = (
        wide.filter(F.col("Headings_Vazios") > 0)
        .select("URL", "Metatags_Score",
                F.explode("headings_problematicos").alias("p"))
        .filter(F.array_contains(F.col("p.motivos"), "Vazio"))
    )
    return exploded.select(
        F.col("URL"),
        F.upper(F.col("p.tag")).alias("Tag"),
        F.col("p.posicao").alias("Posicao"),
        F.when(F.upper(F.col("p.tag")) == "H1", "CRÍTICO").otherwise("MÉDIO")
         .alias("Gravidade"),
        F.col("p.descricao").alias("Descricao"),
        F.col("p.texto").alias("Texto"),
        F.col("Metatags_Score").alias("Score_Pagina"),
    )


def tab_sequencia_headings(wide: DataFrame) -> DataFrame:
    """excel_generator.py:433-466 — complete vs valid sequences + counts."""
    total = F.col("H1_Count") + F.col("Total_Problemas_Headings")
    return wide.select(
        F.col("URL"),
        F.col("Heading_Sequence_Completa").alias("Sequencia_Completa"),
        F.col("Heading_Sequence_Valida").alias("Sequencia_Valida"),
        F.col("H1_Count").alias("H1s"),
        F.col("Headings_Problematicos_Total").alias("Problematicos"),
        F.col("Hierarquia_Correta").alias("Hierarquia_OK"),
        F.col("Total_Problemas_Headings").alias("Total_Problemas"),
        F.array_join(F.coalesce(F.col("problemas_hierarquia"),
                                F.array().cast("array<string>")), " | ")
         .alias("Problemas_Hierarquia"),
        F.col("Metatags_Score").alias("Score"),
        total.alias("Total_Headings"),
        (total - F.col("Headings_Problematicos_Total")).alias("Headings_Validos"),
    )


def tab_gravidade_headings(wide: DataFrame) -> DataFrame:
    """excel_generator.py:468-492 — F10 filter: criticals OR problematics."""
    return (
        wide.filter((F.col("Headings_Criticos") > 0)
                    | (F.col("Headings_Problematicos_Total") > 0))
        .select(F.col("URL"),
                F.col("Headings_Criticos").alias("CRITICOS"),
                F.col("Headings_Problematicos_Total").alias("Total_Problematicos"),
                F.col("H1_Count").alias("H1s"),
                F.col("H1_Multiple").alias("H1_Multiplo"),
                F.col("Metatags_Score").alias("Score"))
    )


def tab_titles_duplicados(wide: DataFrame) -> DataFrame:
    """excel_generator.py:511-529 — F10 filter Title_Duplicado == SIM."""
    return (wide.filter(F.col("Title_Duplicado") == "SIM")
            .select(F.col("URL"), F.col("Title").alias("Titulo"),
                    F.col("Title_Length").alias("Tamanho"),
                    F.col("Metatags_Score").alias("Score")))


def tab_descriptions_duplicadas(wide: DataFrame) -> DataFrame:
    """excel_generator.py:531-549."""
    return (wide.filter(F.col("Description_Duplicada") == "SIM")
            .select(F.col("URL"), F.col("Meta_Description").alias("Description"),
                    F.col("Description_Length").alias("Tamanho"),
                    F.col("Metatags_Score").alias("Score")))


def tab_hierarquia_problemas(wide: DataFrame) -> DataFrame:
    """excel_generator.py:551-580 — F10 filter Hierarquia_Correta == NÃO."""
    return (wide.filter(F.col("Hierarquia_Correta") == "NÃO")
            .select(F.col("URL"), F.col("H1_Count").alias("H1s"),
                    F.col("H1_Text").alias("Texto_H1"),
                    F.col("Hierarquia_Correta").alias("Hierarquia_OK"),
                    F.col("Heading_Sequence_Completa").alias("Sequencia_Completa"),
                    F.col("Heading_Sequence_Valida").alias("Sequencia_Valida"),
                    F.col("Total_Problemas_Headings").alias("Total_Problemas"),
                    F.col("Metatags_Score").alias("Score")))


def tab_score_ranking(wide: DataFrame, k: int = 100) -> DataFrame:
    """excel_generator.py:582-609 — O5 top-k (plans as TakeOrderedAndProject).

    Tie-break by URL for determinism (pandas ``nlargest`` keeps input order;
    input order is crawl_seq, so (score DESC, crawl_seq ASC) reproduces it —
    we expose that exact ordering).
    """
    return (wide.orderBy(F.desc("Metatags_Score"), F.asc("crawl_seq")).limit(k)
            .select(F.col("URL"), F.col("Metatags_Score").alias("Score"),
                    F.col("Title").alias("Titulo"),
                    F.col("H1_Count").alias("H1s"),
                    F.col("Title_Status").alias("Status_Titulo"),
                    F.col("Description_Status").alias("Status_Description"),
                    F.col("Hierarquia_Correta").alias("Hierarquia_OK")))


def tab_resumo_executivo(wide: DataFrame) -> DataFrame:
    """excel_generator.py:611-672 — A7: one aggregation pass with
    conditional sums (the reference does 10 pandas passes)."""
    agg = wide.agg(
        F.count("*").alias("total_urls"),
        F.sum(F.when(F.col("Critical_Issues") != "", 1).otherwise(0))
         .alias("criticos"),
        F.sum(F.when(F.col("H1_Ausente") == "SIM", 1).otherwise(0))
         .alias("sem_h1"),
        F.sum(F.when(F.col("Title_Duplicado") == "SIM", 1).otherwise(0))
         .alias("titles_dup"),
        F.sum(F.when(F.col("Description_Duplicada") == "SIM", 1).otherwise(0))
         .alias("descs_dup"),
        F.sum(F.when(F.col("Headings_Problematicos_Total") > 0, 1).otherwise(0))
         .alias("headings_prob"),
        F.sum(F.when(F.col("Has_Mixed_Content") == "SIM", 1).otherwise(0))
         .alias("mixed"),
        F.sum("Critical_Mixed_Count").alias("mixed_criticos"),
        F.sum("Passive_Mixed_Count").alias("mixed_passivos"),
        F.round(F.avg("Metatags_Score"), 1).alias("score_medio"),
    ).collect()[0]
    spark = wide.sparkSession
    rows = [
        ("Total de URLs analisadas", float(agg["total_urls"])),
        ("URLs com problemas críticos", float(agg["criticos"])),
        ("URLs sem H1", float(agg["sem_h1"])),
        ("Títulos duplicados", float(agg["titles_dup"])),
        ("Descriptions duplicadas", float(agg["descs_dup"])),
        ("URLs com headings problemáticos", float(agg["headings_prob"])),
        ("URLs com mixed content", float(agg["mixed"])),
        ("Recursos críticos em mixed content", float(agg["mixed_criticos"])),
        ("Recursos passivos em mixed content", float(agg["mixed_passivos"])),
    ]
    risk = (wide.groupBy("Risk_Level").count()
            .orderBy(F.desc("count"), "Risk_Level").collect())
    rows += [(f"URLs risco {r['Risk_Level']}", float(r["count"])) for r in risk]
    rows.append(("Score médio geral", float(agg["score_medio"])))
    return spark.createDataFrame(rows, "Metrica string, Valor double")


def tab_mixed_content(wide: DataFrame) -> DataFrame:
    """excel_generator.py:674-718 — F10 filter Has_Mixed_Content == SIM."""
    return (wide.filter(F.col("Has_Mixed_Content") == "SIM")
            .select(F.col("URL"),
                    F.col("Has_Mixed_Content").alias("Tem_Mixed_Content"),
                    F.col("Mixed_Content_Count").alias("Quantidade"),
                    F.col("Critical_Mixed_Count").alias("Criticos"),
                    F.col("Passive_Mixed_Count").alias("Passivos"),
                    F.col("Risk_Level").alias("Nivel_de_Risco"),
                    F.col("Metatags_Score").alias("Score")))


def tab_duplicates_report(wide: DataFrame) -> DataFrame:
    """A3 (metatags_analyzer.py:387-404): title → url list where count > 1.

    The reference appends urls in INSERTION (crawl) order; ``collect_list``
    preserves no order, so collect (crawl_seq, URL) structs, sort by seq,
    project the urls — deterministic AND reference-ordered. ``first_url``
    is the crawl-order first occurrence (the reference's canonical url)."""
    ordered = F.transform(
        F.array_sort(F.collect_list(
            F.struct(F.col("crawl_seq").alias("seq"),
                     F.col("URL").alias("url")))),
        lambda s: s["url"])
    return (wide.filter(F.col("Title") != "")
            .groupBy("Title")
            .agg(F.count("*").alias("dup_count"),
                 ordered.alias("urls"))
            .filter(F.col("dup_count") > 1)
            .withColumn("first_url", F.element_at("urls", 1))
            .select("Title", "dup_count", "first_url", "urls"))


ALL_TABS = {
    "analise_completa": tab_analise_completa,
    "headings_problematicos": tab_headings_problematicos,
    "headings_vazios": tab_headings_vazios,
    "sequencia_headings": tab_sequencia_headings,
    "gravidade_headings": tab_gravidade_headings,
    "titles_duplicados": tab_titles_duplicados,
    "descriptions_duplicadas": tab_descriptions_duplicadas,
    "hierarquia_problemas": tab_hierarquia_problemas,
    "score_ranking": tab_score_ranking,
    "resumo_executivo": tab_resumo_executivo,
    "mixed_content": tab_mixed_content,
}


def write_report(wide: DataFrame, out_dir: str) -> dict[str, int]:
    """Materialize every tab to parquet. Returns row counts per tab.

    The count rides the write as an observed metric — each tab's query runs
    exactly ONCE (round 1 ran ``write`` then ``count()``, recomputing every
    tab twice)."""
    from pyspark.sql import Observation
    counts = {}
    for name, fn in ALL_TABS.items():
        obs = Observation()
        df = fn(wide).observe(obs, F.count(F.lit(1)).alias("n"))
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}")
        counts[name] = int(obs.get["n"])
    return counts


def write_xlsx(wide: DataFrame, path: str, max_rows: int = 100_000) -> str:
    """S5 closure: ONE formatted .xlsx workbook, one sheet per tab
    (reference deliverable — reports/excel_generator.py:18-211: sheet per
    tab, auto-sized columns). Driver-side presentation sink over the tab
    DataFrames; the main tab is capped at ``max_rows`` (the parquet sink is
    the full-data path). Arrays/structs are rendered with the display joins
    already applied by the tab queries; any residual array renders as
    ``" | "``-joined text (reference display convention)."""
    from .xlsx import write_workbook
    sheets = []
    for name, fn in ALL_TABS.items():
        df = fn(wide).limit(max_rows)
        cols = []
        for f_ in df.schema.fields:
            c = F.col(f_.name)
            if f_.dataType.typeName() == "array":
                element = f_.dataType.elementType.typeName()
                c = (F.array_join(c, " | ") if element == "string"
                     else F.array_join(F.transform(
                         c, lambda x: x.cast("string")), " | "))
            elif f_.dataType.typeName() in ("struct", "map"):
                c = c.cast("string")
            cols.append(c.alias(f_.name))
        pdf = df.select(*cols).toPandas()
        rows = [tuple(None if v != v and isinstance(v, float) else v
                      for v in rec)
                for rec in pdf.itertuples(index=False, name=None)]
        sheets.append((name, list(pdf.columns), rows))
    write_workbook(path, sheets)
    return path
