"""Round-3 hardening (verdict item 7): property-test cron_next's scan logic
against an independent day-first reference implementation, pin the Vixie
edge cases (n/step, dow=7, names, zero step), and golden-test lang_id's
script-precedence chain on mixed-script documents.

Reference semantics: the reference delegates cron math to
APScheduler/croniter (automation_scheduler.py:233-334) and language handling
to external models; neither library ships in this container, so these tests
anchor our evaluators to Vixie/POSIX cron rules and fixed goldens instead.
"""

from __future__ import annotations

from datetime import datetime, time as dtime, timedelta

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_spark.functions.cron import cron_next, parse_cron

# ---------------------------------------------------------------------------
# cron: unit pins for the subtle field grammar
# ---------------------------------------------------------------------------


def test_vixie_value_with_step_means_value_to_max():
    # Vixie cron: '5/15' in the minute field = '5-59/15', not just minute 5.
    minutes = parse_cron("5/15 * * * *")[0]
    assert minutes == {5, 20, 35, 50}


def test_dow_seven_is_sunday():
    dows = parse_cron("0 0 * * 7")[4]
    assert dows == {0}
    # ... and inside a range: FRI-7 = {5, 6, 0}
    assert parse_cron("0 0 * * 5-7")[4] == {5, 6, 0}


def test_month_and_dow_names():
    _, _, _, months, dows = parse_cron("0 0 * jan,jul mon-fri")
    assert months == {1, 7}
    assert dows == {1, 2, 3, 4, 5}


def test_zero_step_raises_value_error_not_zerodivision():
    # A ZeroDivisionError would escape next_execution's except clause and
    # kill the whole vectorized batch; it must surface as ValueError.
    with pytest.raises(ValueError):
        parse_cron("*/0 * * * *")


def test_posix_dom_dow_or_rule():
    # Both restricted → fire on EITHER (POSIX). 2026-08-13 is a Thursday.
    # dom=15 (Saturday) and dow=4 (Thursday): next fire after Wed Aug 12
    # must be Thursday Aug 13, not Saturday Aug 15.
    got = cron_next("0 12 15 * 4", datetime(2026, 8, 12, 13, 0))
    assert got == datetime(2026, 8, 13, 12, 0)
    # Only dom restricted → dow is a wildcard, dom binds: Aug 15.
    got = cron_next("0 12 15 * *", datetime(2026, 8, 12, 13, 0))
    assert got == datetime(2026, 8, 15, 12, 0)


def test_leap_day_cron():
    got = cron_next("0 0 29 2 *", datetime(2026, 1, 1))
    assert got == datetime(2028, 2, 29, 0, 0)


# ---------------------------------------------------------------------------
# cron: property test vs an independent day-first evaluator
# ---------------------------------------------------------------------------


def _ref_next(expr: str, after: datetime) -> datetime | None:
    """Independent re-implementation: enumerate days first, then (hour,
    minute) pairs from the parsed sets — a different control structure from
    cron_next's minute-scan-with-jumps, so a bug in either scan shows up as
    a disagreement."""
    mins, hrs, doms, months, dows = parse_cron(expr)
    dom_star = doms == set(range(1, 32))
    dow_star = dows == set(range(0, 7))
    t = (after + timedelta(minutes=1)).replace(second=0, microsecond=0)
    for day_offset in range(0, 4 * 366):
        d = t.date() + timedelta(days=day_offset)
        if d.month not in months:
            continue
        dom_ok = d.day in doms
        dow_ok = (d.isoweekday() % 7) in dows
        day_ok = (
            (dom_ok or dow_ok)
            if (not dom_star and not dow_star)
            else (dom_ok and dow_ok)
        )
        if not day_ok:
            continue
        for h in sorted(hrs):
            for m in sorted(mins):
                cand = datetime.combine(d, dtime(h, m))
                if cand >= t:
                    return cand
    return None


@settings(max_examples=120, deadline=None)
@given(
    minute=st.sampled_from(["*", "0", "7", "*/5", "59", "7,20-40/3", "50/4"]),
    hour=st.sampled_from(["*", "3", "1-4", "*/6", "23"]),
    dom=st.sampled_from(["*", "1", "31", "10-20", "*/9"]),
    month=st.sampled_from(["*", "2", "6-8", "1,12"]),
    dow=st.sampled_from(["*", "1", "mon-fri", "0,6", "7", "5-7"]),
    after=st.datetimes(
        min_value=datetime(2024, 1, 1), max_value=datetime(2027, 12, 31)
    ),
)
def test_cron_next_matches_independent_evaluator(
    minute, hour, dom, month, dow, after
):
    expr = f"{minute} {hour} {dom} {month} {dow}"
    expected = _ref_next(expr, after)
    if expected is None:
        with pytest.raises(ValueError):
            cron_next(expr, after)
        return
    got = cron_next(expr, after)
    assert got == expected, f"{expr!r} after {after}"
    # Soundness: the result really matches every field under the POSIX rule.
    mins, hrs, doms, months, dows = parse_cron(expr)
    assert got > after
    assert got.minute in mins and got.hour in hrs and got.month in months
    dom_star = doms == set(range(1, 32))
    dow_star = dows == set(range(0, 7))
    dom_ok = got.day in doms
    dow_ok = (got.isoweekday() % 7) in dows
    assert (
        (dom_ok or dow_ok)
        if (not dom_star and not dow_star)
        else (dom_ok and dow_ok)
    )


# ---------------------------------------------------------------------------
# lang_id: script-precedence goldens on mixed-script documents
# ---------------------------------------------------------------------------

_GOLDEN = [
    ("the cat and the dog is in the house for fun", "en"),
    ("der hund und die katze ist nicht hier", "de"),
    ("el perro y el gato que en la casa", "es"),
    ("こんにちは世界", "ja"),  # kana + kanji → ja, NOT zh (kana checked first)
    ("世界和平万岁", "zh"),  # han only → zh
    ("안녕하세요 세계", "ko"),
    ("привет мир как дела", "ru"),
    ("مرحبا بالعالم", "ar"),
    ("नमस्ते दुनिया", "hi"),
    ("γεια σου κόσμε", "el"),
    ("zzz qqq xxx blorp", "und"),
    # script beats Latin markers even when marker density is high:
    ("the the the こんにちは", "ja"),
    # mixed non-Latin scripts resolve by chain order (ja before ru):
    ("こんにちは привет", "ja"),
    # han + cyrillic → zh (zh before ru in the chain):
    ("世界 привет мир", "zh"),
    # hangul + han → ko (ko before zh):
    ("안녕 世界", "ko"),
]


def test_lang_id_mixed_script_goldens(spark):
    from pyspark.sql import functions as F

    from lakehouse_spark.operators.text import lang_id

    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(_GOLDEN)], "id long, body string"
    )
    got = {
        r["id"]: r["lang"]
        for r in df.select("id", lang_id("body").alias("lang")).collect()
    }
    for i, (text, want) in enumerate(_GOLDEN):
        assert got[i] == want, f"{text!r}: got {got[i]}, want {want}"


# ---------------------------------------------------------------------------
# new curation operators: edge cases
# ---------------------------------------------------------------------------


def test_repetition_score_edges(spark):
    from lakehouse_spark.operators.text import repetition_score

    df = spark.createDataFrame(
        [
            (1, "a b"),  # < 3 words → no 3-grams → NULL
            (2, "a b c"),  # exactly one 3-gram → 0.0
            (3, "x y z x y z x y z"),  # 7 grams, 3 distinct → 4/7
            (4, "one two three four five"),  # all distinct → 0.0
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["rep"]
        for r in df.select("id", repetition_score("text").alias("rep")).collect()
    }
    assert got[1] is None
    assert got[2] == 0.0
    assert got[3] == round(1 - 3 / 7, 6)
    assert got[4] == 0.0


def test_stratified_sample_deterministic_and_bounded(spark):
    from lakehouse_spark.io import load_table
    from lakehouse_spark.operators.text import stratified_sample

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "lang", "doc_id"
    )
    a = stratified_sample(docs, "lang", "doc_id", 7).collect()
    b = stratified_sample(docs, "lang", "doc_id", 7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    per = {}
    for r in a:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    assert all(v <= 7 for v in per.values())
    assert len(per) == 5  # every stratum represented


def test_decontaminate_flags_exact_and_not_clean(spark):
    from lakehouse_spark.operators.text import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains bench gram
            (2, "one two three four five six"),  # clean
            (3, "x alpha beta gamma delta epsilon y"),  # bench gram mid-doc
            (4, "too short"),  # < n words → clean by definition
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, bench, "doc_id", "text", n=5).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: False}
