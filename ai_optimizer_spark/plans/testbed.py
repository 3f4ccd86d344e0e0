"""Testbed evaluation pipeline — SURVEY.md §3.3 composed end to end.

Reference lifecycle (api/v1/endpoints/testbed.py:283-347): load testset →
collect an answer per question through the chat path → LLM-judge each
(testbed/metrics.py:43-120) → aggregate overall/by-topic correctness +
failures → persist. Here:

  * testset generation  = operators/llm_doubles.qa_generation (D9)
  * answer collection   = a caller-supplied answer function; the default
    answers from a vector-store flow (the evaluation *composes* the query
    engine, exactly like the reference's §3.1 loop)
  * judging             = a pandas_udf (D8's shape: the judge is pluggable,
    the default is a deterministic token-overlap rule)
  * aggregation         = one grouping-sets-style pass (A7/A8) + failures
    filter (A9)

Scale shape: answers and judgments are row-parallel pandas UDFs over the
testset DataFrame — a 10M-question evaluation runs as one distributed
pass, unlike the reference's sequential driver loop (testbed.py:470-482).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

JUDGE_OVERLAP_THRESHOLD = 0.5


def judge_correctness(
    answers: DataFrame,
    answer_col: str = "agent_answer",
    reference_col: str = "reference_answer",
) -> DataFrame:
    """D8: per-QA correctness via a pandas_udf judge. The deterministic
    double marks an answer correct when ≥ half the reference's tokens
    appear in it — the same strict-parse / boolean-out contract as the
    reference's CustomCorrectnessMetric (metrics.py:74-120), so a real
    LLM judge drops in by swapping the UDF body."""

    @F.pandas_udf(BooleanType())
    def _judge(batches: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for ans, ref in batches:
            out = []
            for a, r in zip(ans.fillna(""), ref.fillna("")):
                ref_toks = set(r.split())
                got = set(a.split())
                out.append(
                    bool(ref_toks)
                    and len(ref_toks & got) / len(ref_toks) >= JUDGE_OVERLAP_THRESHOLD
                )
            yield pd.Series(out)

    return answers.withColumn("correctness", _judge(F.col(answer_col), F.col(reference_col)))


def evaluation_report(judged: DataFrame, topic_col: str = "topic") -> DataFrame:
    """A7+A8: overall + per-topic mean correctness in one union'd pass
    (testbed.py:312-345 report.correctness / correctness_by_topic)."""
    by_topic = judged.groupBy(
        F.lit("by_topic").alias("scope"), F.col(topic_col).alias("topic")
    ).agg(
        F.round(F.avg(F.col("correctness").cast("double")), 4).alias("correctness"),
        F.count(F.lit(1)).alias("n"),
    )
    overall = judged.groupBy(
        F.lit("overall").alias("scope"), F.lit("all").alias("topic")
    ).agg(
        F.round(F.avg(F.col("correctness").cast("double")), 4).alias("correctness"),
        F.count(F.lit(1)).alias("n"),
    )
    return by_topic.unionByName(overall)


def evaluation_failures(judged: DataFrame) -> DataFrame:
    """A9: the failure set (testbed.py:346 report.failures)."""
    return judged.filter(~F.col("correctness"))


def evaluate_testset(
    testset: DataFrame,
    answers: DataFrame,
    qa_id_col: str = "qa_id",
) -> tuple[DataFrame, DataFrame]:
    """§3.3 tail: join collected answers onto the testset, judge, report.
    Returns (report, failures). `answers` must carry (qa_id, agent_answer)."""
    judged = judge_correctness(testset.join(answers, qa_id_col))
    return evaluation_report(judged), evaluation_failures(judged)
