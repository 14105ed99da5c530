"""Data-quality expectations — the dbt-tests / Delta-Live-Tables
"expectations" surface: declare rules over a relation, get back a
per-rule violation report in ONE aggregate pass, or split the relation
into passing/violating rows for quarantine pipelines.

Rules (each a plain tuple, data not code, so reports are loggable and
rule sets can live in graph.yml parameters):

- ``("not_null", col)``
- ``("unique", col)`` or ``("unique", (col1, col2))`` — duplicate-key
  participation, reported as ``rows − distinct keys``
- ``("accepted_values", col, [v1, v2, ...])`` — NULL is a violation
  (declare ``not_null`` separately if that is the intent: a rule that
  silently passes NULLs hides the most common data bug)
- ``("in_range", col, lo, hi)`` — inclusive bounds; NULL violates
- ``("matches", col, regex)`` — Java/RE2-compatible pattern; NULL
  violates

Relationship to the WRITE-TIME gate: managed stores already enforce
arbitrary SQL row predicates per batch (``TableStore.configure(
expectations={name: sql}, expectations_mode='record'|'fail'|'drop')``,
violation counts recorded in version metadata). This module is the
RELATION-level complement — typed rules instead of raw SQL, the
``unique`` kind (not expressible as a row predicate), the one-pass
multi-rule report, and the quarantine split for pipelines that route
bad rows instead of dropping them.

Scale shape: :func:`expectation_report` compiles every rule into one
aggregate expression over a SINGLE scan (``unique`` adds a
``count_distinct`` in the same aggregate — an expand pass, scope wide
tables accordingly), then unpivots the one result row driver-side
(bounded: one output row per rule). :func:`enforce_expectations` is a
pure projection filter — ``unique`` rules are report-only there (row-
level dup blame needs a shuffle; run exact_dedup for that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expectation_report", "enforce_expectations"]

Rule = tuple


def _rule_name(rule: Rule) -> str:
    kind = rule[0]
    col = rule[1] if isinstance(rule[1], str) else ",".join(rule[1])
    return f"{kind}({col})"


def _row_violates(rule: Rule) -> Column:
    """Boolean column: this ROW violates the rule (row-level kinds only)."""
    kind = rule[0]
    if kind == "not_null":
        return F.col(rule[1]).isNull()
    if kind == "accepted_values":
        c = F.col(rule[1])
        return c.isNull() | ~c.isin(*rule[2])
    if kind == "in_range":
        c = F.col(rule[1])
        return c.isNull() | (c < rule[2]) | (c > rule[3])
    if kind == "matches":
        c = F.col(rule[1])
        return c.isNull() | ~c.rlike(rule[2])
    raise ValueError(f"unknown row-level expectation kind: {kind!r}")


def expectation_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Per-rule violation report: one output row per rule —
    ``(rule, kind, n_rows, n_violations)`` — from ONE aggregate pass
    over the relation. ``n_rows`` repeats the scanned row count so the
    report is self-contained in logs."""
    if not rules:
        raise ValueError("no expectations given")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, rule in enumerate(rules):
        if rule[0] == "unique":
            cols = [rule[1]] if isinstance(rule[1], str) else list(rule[1])
            key = F.struct(*[F.col(c) for c in cols])
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(key))
                .cast("long")
                .alias(f"__v{i}")
            )
        else:
            aggs.append(
                F.sum(_row_violates(rule).cast("long"))
                .cast("long")
                .alias(f"__v{i}")
            )
    one = df.agg(*aggs)
    # unpivot the single result row into one row per rule: a bounded
    # stack() projection, no second scan. Rule/kind labels are embedded
    # in a selectExpr string — escape quotes so a column name containing
    # one cannot break (or inject into) the expression.
    esc = lambda t: t.replace("'", "''")
    pairs = ", ".join(
        f"'{esc(_rule_name(r))}', '{esc(r[0])}', __v{i}"
        for i, r in enumerate(rules)
    )
    return one.selectExpr(
        f"stack({len(rules)}, {pairs}) as (rule, kind, n_violations)",
        "__n as n_rows",
    ).select("rule", "kind", "n_rows", F.coalesce("n_violations", F.lit(0)).alias("n_violations"))


def enforce_expectations(
    df: DataFrame, rules: list[Rule], mode: str = "drop"
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` on the ROW-LEVEL rules: returns ``(passing,
    violating)`` where ``violating`` carries a ``failed_rules`` column
    naming every rule the row broke (comma-joined, stable rule order) —
    the quarantine shape. ``mode='drop'`` is the only mode: callers
    decide what to do with each side (write, count, fail the job).
    ``unique`` rules are rejected here — duplicate blame is not a
    row-local predicate; use :func:`expectation_report` or
    ``exact_dedup``."""
    if mode != "drop":
        raise ValueError("enforce_expectations supports mode='drop' only")
    row_rules = [r for r in rules if r[0] != "unique"]
    if len(row_rules) != len(rules):
        raise ValueError(
            "unique expectations are report-only; remove them from "
            "enforce_expectations (use expectation_report / exact_dedup)"
        )
    if not row_rules:
        raise ValueError("no row-level expectations given")
    failed = F.concat_ws(
        ",",
        F.filter(
            F.array(
                *[
                    F.when(_row_violates(r), F.lit(_rule_name(r)))
                    for r in row_rules
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    tagged = df.withColumn("failed_rules", failed)
    passing = tagged.filter(F.col("failed_rules") == "").drop("failed_rules")
    violating = tagged.filter(F.col("failed_rules") != "")
    return passing, violating
