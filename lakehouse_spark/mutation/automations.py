"""Automation scheduling over the keyed table store (SURVEY.md §2.11
CR1-CR4).

The reference registers cron/interval/once triggers, records executions to
an append-only log, and maintains last/next execution timestamps on the
automation document (automation_scheduler.py:93-153,336-521,
automations/manager.py:258-306 — read, not copied).

Engine shape: `automations` and `executions` are TableStore tables; the
scheduler *evaluation* is a Spark job (vectorized next-fire UDF over the
whole table — CR2), firing due rows is a driver loop handed to an external
orchestrator, and each run appends one execution record and MERGEs the
automation row (CR3). All clock inputs are injected for determinism.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_spark.functions.cron import next_execution_udf
from lakehouse_spark.mutation.store import TableStore


def with_next_execution(automations: DataFrame, now: datetime) -> DataFrame:
    """CR2: recompute next_execution for every enabled automation in one
    vectorized pass (Arrow-batched pandas UDF over croniter-free cron math).
    Disabled rows keep next_execution NULL — the reference unschedules
    them."""
    udf = next_execution_udf(now)
    return automations.withColumn(
        "next_execution",
        F.when(
            F.col("enabled"), udf(F.col("schedule_type"), F.col("schedule_value"))
        ).otherwise(F.lit(None).cast("timestamp")),
    )


def due_automations(automations: DataFrame, now: datetime) -> DataFrame:
    """CR1 trigger scan: enabled rows whose next_execution has arrived.
    Pure filter — pushed to the scan, so a 10M-automation table stays
    cheap."""
    ts = now.astimezone(timezone.utc).replace(tzinfo=None)
    return automations.filter(
        F.col("enabled")
        & F.col("next_execution").isNotNull()
        & (F.col("next_execution") <= F.lit(ts))
    )


def record_execution(
    automations_store: TableStore,
    executions_store: TableStore,
    execution_row: DataFrame,
    now: datetime,
) -> None:
    """CR3: append the execution record, then MERGE last_execution +
    recomputed next_execution onto the fired automation rows — the
    reference's two-file write, as two table commits."""
    executions_store.append(execution_row)
    fired_ids = execution_row.select(
        F.col("automation_id").alias("id")
    ).distinct()
    ts = now.astimezone(timezone.utc).replace(tzinfo=None)
    base = automations_store.read()
    updated = (
        base.join(fired_ids, "id", "left_semi")
        .withColumn("last_execution", F.lit(ts))
    )
    automations_store.upsert(with_next_execution(updated, now))


def execution_history(
    executions: DataFrame, automation_id: str, offset: int = 0, limit: int = 50
) -> DataFrame:
    """CR4/J6/O2: one automation's executions, newest first, paged on a
    total order (executed_at desc, id desc tie-break)."""
    from lakehouse_spark.operators import sorts

    hist = executions.filter(F.col("automation_id") == automation_id)
    return sorts.page(
        hist, [F.desc("executed_at"), F.desc("id")], offset, limit
    )
