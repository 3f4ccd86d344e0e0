"""Deterministic doubles for the reference's LLM-backed operators.

The reference routes, grades, and classifies with LLM calls; every one of
those operators has a *data-flow contract* that is independent of the model:
fixed output domain, validation, and a fallback. Here each contract is
implemented as a deterministic rule over the same inputs — the shape the
engine's tests need (SURVEY.md §7.4-2: every LLM-touching operator gets a
deterministic test double behind the same signature) while real adapters can
replace the scoring expression without touching the plan.

All of these are pure column expressions — no UDFs, fully codegen'd, and
SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Keyword sets for the routing/classification doubles. The reference's demo
# corpus text is keyword-shaped, so containment is a meaningful signal.
SQL_HINTS = ("sum", "count", "total", "group")
VEC_HINTS = ("similar", "search", "find", "query")


def _contains_any(col, words) -> F.Column:
    out = F.lit(False)
    for w in words:
        out = out | F.lower(col).contains(w)
    return out


def query_classification(t: dict[str, DataFrame]) -> DataFrame:
    """D11: query classification (runtime/langgraph/multi_tool.py:108-120) —
    the LLM emits one of {nl2sql, vecsearch, both} with "both" as the
    failure fallback. Double: keyword containment with the same domain and
    fallback."""
    docs = t["documents"]
    sql_hit = _contains_any(F.col("text"), SQL_HINTS)
    vec_hit = _contains_any(F.col("text"), VEC_HINTS)
    route = (
        F.when(sql_hit & vec_hit, "both")
        .when(sql_hit, "nl2sql")
        .when(vec_hit, "vecsearch")
        .otherwise("both")  # default on classification failure
    )
    return docs.select("doc_id", route.alias("route"))


def grade_blanking(t: dict[str, DataFrame], query_terms=("join", "merge")) -> DataFrame:
    """D7: relevance grading (mcp/tools/vs_grade.py:27-99) — binary yes/no
    over retrieved docs; on "no" the doc set is blanked
    (runtime/langgraph/session.py:173-176). Double: term containment; the
    blanking `when(grade == 'no', '')` is the operator's real contract."""
    docs = t["documents"]
    relevant = _contains_any(F.col("text"), query_terms)
    grade = F.when(relevant, "yes").otherwise("no")
    return docs.select(
        "doc_id",
        grade.alias("grade"),
        F.when(grade == "yes", F.col("text")).otherwise(F.lit("")).alias("graded_text"),
    )


def semantic_routing(t: dict[str, DataFrame], query_terms=("window", "stream")) -> DataFrame:
    """D5: semantic store selection (mcp/tools/vs_retriever.py:53-127) — the
    LLM picks ≤3 relevant stores from catalog descriptions, validated
    against the catalog, falling back to the first store. Double: rank
    stores by how many of their docs mention the query terms, keep top 3.
    The fallback is structural: with zero hits everywhere the name-ordered
    ranking still yields the first store. Effectively partition pruning by
    semantics (SURVEY.md §4-O3): only the selected stores enter the scan."""
    docs = t["documents"]
    hit = _contains_any(F.col("text"), query_terms)
    scores = docs.groupBy("source").agg(
        F.count(F.when(hit, 1)).alias("hits"), F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.orderBy(F.desc("hits"), F.asc("source"))
    return (
        scores.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("source", "hits", "n_docs", "rnk")
    )


def qa_generation(t: dict[str, DataFrame]) -> DataFrame:
    """D9: Q&A testset generation (testbed/generation.py:66-109 — chunk the
    corpus, generate a question per chunk with topic metadata). Double: the
    chunking is the reference's real 512/10%-overlap split; the "LLM" is a
    template over (source, chunk idx); reference_answer is the chunk head.
    Output matches the QARecord shape (testbed/schemas.py:35-54)."""
    from ..functions.text import chunk_text

    docs = t["documents"]
    chunks = chunk_text(
        docs.select("doc_id", "text"), "text", "doc_id", 512, 51
    ).join(docs.select("doc_id", "lang", "source"), "doc_id")
    return chunks.select(
        F.col("chunk_id").alias("qa_id"),
        F.concat(
            F.lit("What does "),
            F.col("source"),
            F.lit(" passage "),
            F.element_at(F.split("chunk_id", "_"), -1),
            F.lit(" describe?"),
        ).alias("question"),
        F.substring("chunk_text", 1, 50).alias("reference_answer"),
        F.col("lang").alias("topic"),
    )


def answer_synthesis(t: dict[str, DataFrame], query_terms=("join", "merge")) -> DataFrame:
    """D10+D11 composition: combined-route answer synthesis
    (runtime/langgraph/multi_tool.py:73-139) — when the relevance grade says
    "no" the SQL answer stands alone; otherwise the two answers are merged
    through the synthesis template. Answers are deterministic projections of
    the doc; the *branching contract* is the operator."""
    docs = t["documents"]
    relevant = _contains_any(F.col("text"), query_terms)
    sql_answer = F.concat(F.lit("sql:"), F.upper(F.substring("text", 1, 20)))
    search_answer = F.concat(F.lit("vs:"), F.substring("text", 21, 20))
    synthesized = F.when(
        relevant, F.concat(sql_answer, F.lit(" | "), search_answer)
    ).otherwise(sql_answer)
    return docs.select(
        "doc_id",
        F.when(relevant, "synthesized").otherwise("sql_only").alias("route"),
        synthesized.alias("answer"),
    )


def fenced_json_extract(t: dict[str, DataFrame]) -> DataFrame:
    """F15: fenced-JSON extraction (vs_retriever.py:106-111 strips ```json
    fences from LLM output before parsing). The fenced payload is
    reconstructed from `props` so the regex does real work."""
    ev = t["events"]
    fenced = F.concat(F.lit("```json "), F.col("props"), F.lit(" ```"))
    return ev.select(
        "event_id",
        F.regexp_extract(fenced, r"```json\s*(\{.*\})\s*```", 1).alias("payload"),
        F.get_json_object(
            F.regexp_extract(fenced, r"```json\s*(\{.*\})\s*```", 1), "$.k"
        ).cast("int").alias("k"),
    )


def single_line_guard(t: dict[str, DataFrame]) -> DataFrame:
    """F16/D6: rephrase output guard (mcp/tools/vs_rephrase.py:35-45) — a
    multi-line rephrase is rejected and the original question kept. The
    candidate "rephrase" is synthesized deterministically: every third doc
    produces an (invalid) two-line candidate."""
    docs = t["documents"]
    candidate = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.substring("text", 1, 20), F.lit("\n"), F.substring("text", 21, 20)),
    ).otherwise(F.upper(F.substring("text", 1, 40)))
    guarded = F.when(candidate.contains("\n"), F.col("text")).otherwise(candidate)
    return docs.select(
        "doc_id",
        candidate.contains("\n").alias("rejected"),
        guarded.alias("question"),
    )
