"""Join operators (SURVEY.md §2.3, J1-J10).

Every reference join is an equi join or an iterative hierarchy walk; Spark
gets physical strategy (broadcast vs sort-merge vs shuffled-hash) from
Catalyst + AQE. Our job here is to give the optimizer the right hints:

- **Broadcast the small side explicitly** for dimension joins: at 100 TB the
  fact side never moves, only the dim ships to executors.
- **Semi/anti joins** for existence checks — never a join+distinct, which
  would shuffle the big side twice.
- Recursive closure lives in :mod:`lakehouse_spark.plans.closure` (Spark 4
  recursive CTE with an iterative-join fallback).

Provenance: index semi-join fetch ← sessions/manager.py:383-406; parent→child
self-join ← manager.py:404; FK lookup ← automation_scheduler.py:379-390;
history join ← routers/automations.py:583-604; union+re-sort ←
routers/sessions.py:1376-1384.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_fetch(full: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """J1: the reference's "filter the lightweight index, then load full rows
    by id" becomes a left-semi join; broadcast the (small, filtered) key set
    so the fact table is filtered in place with zero shuffle."""
    return full.join(F.broadcast(keys.select(key).distinct()), key, "left_semi")


def children_of(df: DataFrame, parent_col: str, id_col: str) -> DataFrame:
    """J2: parent→children self-join (subsessions of a session)."""
    parents = df.select(F.col(id_col).alias("__pid"))
    return df.join(
        F.broadcast(parents), F.col(parent_col) == F.col("__pid"), "left_semi"
    )


def fk_lookup(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, how: str = "left"
) -> DataFrame:
    """J5: FK lookup join with an explicit broadcast of the dimension."""
    return fact.join(F.broadcast(dim), fact[fact_key] == dim[dim_key], how)


def history(
    parent: DataFrame, log: DataFrame, key: str, order_col: str
) -> DataFrame:
    """J6: 1:N history join, newest-first (automation → executions)."""
    return parent.join(log, key, "inner").orderBy(F.desc(order_col))


def union_resort(a: DataFrame, b: DataFrame, order_col: str) -> DataFrame:
    """J7: concat two logs and re-establish a global time order."""
    return a.unionByName(b, allowMissingColumns=True).orderBy(order_col)


def anti(df: DataFrame, visited: DataFrame, key: str) -> DataFrame:
    """D4/J4 building block: drop rows whose key already appears in
    ``visited`` (BFS visited-set, cascade-delete candidates)."""
    return df.join(visited.select(key).distinct(), key, "left_anti")
