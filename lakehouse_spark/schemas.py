"""Explicit schemas for every logical table — nothing is schema-inferred.

Two families:

1. **Driver test tables** (`/root/testdata/sf*/ *.parquet`, TESTDATA.md):
   TPC-H-ish star schema + generic ``events`` + ``documents``/``embeddings``.
   Parquet carries its own schema; these StructTypes document the contract
   and are asserted in tests.

2. **Reference-shaped tables** (SURVEY.md §1.2): the payneio/lakehouse data
   model — sessions, transcript messages, trace events, automations,
   executions, directories. Provenance for each is cited from the reference
   (read, not copied): e.g. sessions ← amplifier_library/models/sessions.py:45-70,
   trace events ← amplifierd/services/trace_aggregator.py:82-97 and
   models/trace.py:15-55.

These are used by the JSONL sources (PERMISSIVE mode needs an explicit
schema to route malformed lines to ``_corrupt_record``) and by the streaming
readers (Structured Streaming requires a user-supplied schema).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# 1. Driver test tables (TESTDATA.md)
# ---------------------------------------------------------------------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),  # JSON document string
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

TESTDATA_TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# 2. Reference-shaped tables (SURVEY.md §1.2)
# ---------------------------------------------------------------------------

# sessions ← amplifier_library/models/sessions.py:45-70 (read for parity).
SESSION = StructType(
    [
        StructField("session_id", StringType(), False),
        StructField("name", StringType()),
        StructField("parent_session_id", StringType()),
        StructField("amplified_dir", StringType()),
        StructField("status", StringType()),  # created|active|completed|failed|terminated
        StructField("created_at", TimestampType()),
        StructField("started_at", TimestampType()),
        StructField("ended_at", TimestampType()),
        StructField("profile_name", StringType()),
        StructField("message_count", IntegerType()),
        StructField("agent_invocations", IntegerType()),
        StructField("token_usage", LongType()),
        StructField("error_message", StringType()),
        StructField("error_details", MapType(StringType(), StringType())),
        StructField("is_unread", BooleanType()),
        StructField("last_read_at", TimestampType()),
        StructField("encounter_seq", LongType()),
    ]
)

# transcript messages ← amplifier_library/models/sessions.py:73-84.
MESSAGE = StructType(
    [
        StructField("session_id", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("role", StringType()),
        StructField("content", StringType()),
        StructField("agent", StringType()),
        StructField("token_count", IntegerType()),
        StructField("encounter_seq", LongType()),
    ]
)

# trace events ← amplifierd trace_aggregator.py:82-97 consumption shape and
# hooks/__init__.py:15-26 event-name inventory. `ts` stays a STRING here:
# the reference parses ISO-8601 tz-aware strings and maps unparseable values
# to epoch 0 (trace_aggregator.py:24-38); we reproduce that in functions.scalar.
TRACE_RESULT = StructType(
    [
        StructField("success", BooleanType()),
        StructField("output", StringType()),
        StructField(
            "error", StructType([StructField("message", StringType())])
        ),
    ]
)

TRACE_EVENT_DATA = StructType(
    [
        StructField("prompt", StringType()),
        StructField("tool_name", StringType()),
        StructField("tool_input", MapType(StringType(), StringType())),
        StructField("parallel_group_id", StringType()),
        StructField("delta", StringType()),
        StructField("result", TRACE_RESULT),
    ]
)

TRACE_EVENT = StructType(
    [
        StructField("session_id", StringType()),
        StructField("ts", StringType()),
        StructField("lvl", StringType()),
        StructField("event", StringType()),
        StructField("data", TRACE_EVENT_DATA),
        StructField("encounter_seq", LongType()),
    ]
)

# Derived turn shape ← amplifierd models/trace.py:15-55.
TRACE_TOOL = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("parallel_group_id", StringType()),
        StructField("status", StringType()),  # running|completed|error
        StructField("start_time", LongType()),
        StructField("end_time", LongType()),
        StructField("duration", DoubleType()),
        StructField("result", StringType()),
        StructField("error", StringType()),
        StructField("is_sub_agent", BooleanType()),
        StructField("sub_agent_name", StringType()),
        StructField("child_session_id", StringType()),
    ]
)

TRACE_THINKING = StructType(
    [
        StructField("start_time", LongType()),
        StructField("content", StringType()),
    ]
)

TRACE_TURN = StructType(
    [
        StructField("session_id", StringType()),
        StructField("turn_id", LongType()),
        StructField("user_message", StringType()),
        StructField("status", StringType()),  # active|completed
        StructField("start_time", LongType()),
        StructField("end_time", LongType()),
        StructField("tools", ArrayType(TRACE_TOOL)),
        StructField("thinking", ArrayType(TRACE_THINKING)),
    ]
)

# automations ← amplifier_library/models/automations.py:65-100.
AUTOMATION = StructType(
    [
        StructField("id", StringType(), False),
        StructField("project_id", StringType()),
        StructField("name", StringType()),
        StructField("message", StringType()),
        StructField("schedule_type", StringType()),  # cron|interval|once
        StructField("schedule_value", StringType()),
        StructField("enabled", BooleanType()),
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
        StructField("last_execution", TimestampType()),
        StructField("next_execution", TimestampType()),
        StructField("encounter_seq", LongType()),
    ]
)

# executions ← amplifier_library/models/automations.py:103-116.
EXECUTION = StructType(
    [
        StructField("id", StringType(), False),
        StructField("automation_id", StringType()),
        StructField("session_id", StringType()),
        StructField("executed_at", TimestampType()),
        StructField("status", StringType()),  # success|failed
        StructField("error", StringType()),
        StructField("encounter_seq", LongType()),
    ]
)

# directories ← amplifierd services/amplified_directory_service.py:239-298.
DIRECTORY = StructType(
    [
        StructField("relative_path", StringType(), False),
        StructField("default_profile", StringType()),
        StructField("metadata", MapType(StringType(), StringType())),
        StructField("agents_content", StringType()),
        StructField("is_amplified", BooleanType()),
        StructField("encounter_seq", LongType()),
    ]
)

# multimodal assets: opaque binary payload + typed metadata (engine addition
# for training-data pipelines; see operators/multimodal.py).
from pyspark.sql.types import BinaryType  # noqa: E402

MEDIA_ASSET = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("kind", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)
